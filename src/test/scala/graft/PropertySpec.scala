package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.functions.{Hashing, TextAnalysis}
import graft.ingest.Ingest

/** ScalaCheck invariants (SURVEY §5: property tests for codecs and key
  * assignment). Runs against the shared local session. */
object PropertySpec extends Properties("graft") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
  private val doc = Gen.listOfN(12, word).map(_.mkString(" "))

  property("withScalableKey assigns exactly 1..n") =
    forAll(Gen.choose(0, 120), Gen.choose(1, 8)) { (n, parts) =>
      val df = spark.range(n.toLong).toDF("v").repartition(parts)
      val keys = Ingest.withScalableKey(df).select("key").as[Long].collect().sorted
      keys.toSeq == (1L to n.toLong)
    }

  // nlabel drawn from the proto2 uint32 domain — datum.proto declares it
  // uint32, and numericDatum now enforces the same bound the Python
  // encoder does (values >= 2^32 are a byte-compat break, not a datum).
  property("ProtoDatum encode/decode round-trips arbitrary numeric datums") =
    forAll(Gen.choose(0L, Long.MaxValue),
           Gen.listOf(Gen.chooseNum(Float.MinValue, Float.MaxValue)),
           Gen.option(Gen.choose(0L, 0xffffffffL))) { (key, data, nlabel) =>
      import graft.functions.ProtoDatum
      val bytes = ProtoDatum.numericDatum(key, data, nlabel)
      val d = ProtoDatum.decode(bytes)
      val n = d.numeric.get
      n.identifier == key.toString &&
        n.size.map(_.dim).contains(1L) &&
        java.util.Arrays.equals(n.data, ProtoDatum.floatBytes(data)) &&
        d.classs.flatMap(_.nlabel) == nlabel &&
        d.classs.forall(_.identifier == key.toString)
    }

  property("numericDatum rejects nlabel outside the proto2 uint32 domain") =
    forAll(Gen.oneOf(Gen.choose(Long.MinValue, -1L),
                     Gen.choose(0x100000000L, Long.MaxValue))) { bad =>
      import graft.functions.ProtoDatum
      scala.util.Try(ProtoDatum.numericDatum(1L, Seq(1.0f), Some(bad))).isFailure
    }

  // The LMDB-migration recipe (SURVEY §1.1): the reference stores keys as
  // decimal STRINGS, so an LMDB cursor yields values in lexicographic key
  // order ("0","1","10","100","11",…), not numeric. A migrating reader must
  // therefore re-key each value from the identifier INSIDE the decoded
  // Datum — never from cursor position. This property simulates exactly
  // that stream shape and proves the embedded identifier recovers the
  // original numeric keys bit-exactly, for corpora large enough that the
  // two orders genuinely diverge (n > 10).
  property("LMDB lexicographic stream re-keys numerically via the datum identifier") =
    forAll(Gen.choose(11, 150)) { n =>
      import graft.functions.ProtoDatum
      val original = (0 until n).map { i =>
        i.toLong -> Seq(i.toFloat, -i.toFloat)
      }.toMap
      // the simulated LMDB cursor: values sorted by str(key) byte order
      val lmdbStream = original.toSeq
        .map { case (k, v) => (k.toString, ProtoDatum.numericDatum(k, v, Some(k % 7))) }
        .sortBy(_._1)
      val cursorKeys = lmdbStream.map(_._1.toLong)
      // migration read path: decode each value, re-key from the identifier
      val rekeyed = lmdbStream.map { case (_, bytes) =>
        val d = ProtoDatum.decode(bytes)
        val key = d.numeric.get.identifier.toLong
        key -> d
      }.toMap
      cursorKeys != cursorKeys.sorted && // the orders really diverge
        rekeyed.keySet == original.keySet &&
        rekeyed.forall { case (k, d) =>
          java.util.Arrays.equals(d.numeric.get.data, ProtoDatum.floatBytes(original(k))) &&
            d.classs.flatMap(_.nlabel).contains(k % 7) &&
            d.classs.get.identifier == k.toString
        }
    }

  property("decode fails loudly on truncated datums, never reads garbage") =
    forAll(Gen.choose(0L, 0xffffffffL),
           Gen.listOfN(4, Gen.chooseNum(-10.0f, 10.0f))) { (key, data) =>
      import graft.functions.ProtoDatum
      val bytes = ProtoDatum.numericDatum(key, data, Some(3L))
      // every strict prefix either still parses to a well-formed partial
      // message boundary or raises MalformedDatumException — no index
      // errors, no silent misparse of truncated length-delimited fields
      (1 until bytes.length).forall { cut =>
        scala.util.Try(ProtoDatum.decode(bytes.take(cut))) match {
          case scala.util.Success(_) => true
          case scala.util.Failure(_: ProtoDatum.MalformedDatumException) => true
          case scala.util.Failure(_) => false
        }
      }
    }

  property("trigramHits equals the array-intersect trigram score") =
    forAll(Gen.oneOf(
      Gen.listOfN(10, word).map(_.mkString(" ")),
      Gen.alphaNumStr.map(_.take(40)),
      Gen.const(""), Gen.const("th"))) { text =>
      val df = Seq(Tuple1(text)).toDF("text")
      val profiles = Seq(TextAnalysis.TriEn, TextAnalysis.TriDe)
      profiles.forall { p =>
        val fast = df.select(TextAnalysis.trigramHits(
          TextAnalysis.paddedLower(col("text")), p)).as[Long].collect().head
        val slow = df.select(TextAnalysis.trigramScore(
          TextAnalysis.charTrigrams(col("text")), p)).as[Long].collect().head
        fast == slow
      }
    }

  property("minhash signature is elementwise monotone under union") =
    forAll(doc, doc) { (a, b) =>
      val df = Seq((1L, a), (2L, a + " " + b)).toDF("id", "text")
      val toks = TextAnalysis.tokens(col("text"))
      val sigs = df.select(col("id"),
          Hashing.minhashSig(array_distinct(toks), 16).as("sig"))
        .as[(Long, Seq[Long])].collect().toMap
      // shingles(1) ⊆ shingles(2) ⇒ sig(2) <= sig(1) elementwise
      sigs(1L).zip(sigs(2L)).forall { case (s1, s2) => s2 <= s1 }
    }

  property("simhash of a single-element hash array is the hash's low 60 bits") =
    forAll(Gen.choose(0L, (1L << 60) - 1)) { h =>
      val fp = Seq(Tuple1(Seq(h))).toDF("hs")
        .select(graft.expressions.Sketches.simhash60(col("hs")))
        .as[Long].collect().head
      fp == (h & ((1L << 60) - 1))
    }

  property("fingerprints are a subset of all 8-gram hashes") =
    forAll(doc) { text =>
      val df = Seq(Tuple1(text)).toDF("text")
      val fps = df.select(TextAnalysis.fingerprints(col("text")))
        .as[Seq[Long]].collect().head.toSet
      val all = (1 to math.max(text.length - 7, 1)).map { i =>
        graft.expressions.Sketches.md5PrefixLong(
          text.substring(i - 1, math.min(i + 7, text.length)), 15)
      }.toSet
      fps.subsetOf(all) && fps.forall(_ % 16 == 0)
    }

  property("DotProductExpr is bit-identical to the declarative ordered fold") =
    forAll(Gen.listOfN(16, Gen.chooseNum(-10.0, 10.0))) { xs =>
      val df = Seq((xs.toArray, xs.reverse.toArray)).toDF("a", "b")
      val fast = df.select(graft.expressions.Sketches.dotProduct(col("a"), col("b")))
        .as[Double].collect().head
      val slow = df.selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, p) -> acc + p)")
        .as[Double].collect().head
      java.lang.Double.doubleToRawLongBits(fast) == java.lang.Double.doubleToRawLongBits(slow)
    }

  property("Md5PrefixArrayExpr matches per-element h60/h28 hashing") =
    forAll(Gen.listOfN(5, word)) { ws =>
      val df = Seq(Tuple1(ws)).toDF("ss")
      def arr(hex: Int) = df.select(
        graft.expressions.Sketches.md5PrefixArray(col("ss"), hex)).as[Seq[Long]].collect().head
      val h60s = df.select(transform(col("ss"), s => Hashing.h60(s))).as[Seq[Long]].collect().head
      val h28s = df.select(transform(col("ss"), s => Hashing.h28(s))).as[Seq[Long]].collect().head
      arr(15) == h60s && arr(7) == h28s
    }

  property("exact dedup partitions the corpus: sum of copies = row count") =
    forAll(Gen.listOfN(10, doc)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = graft.operators.Dedup.exactDedup(df, "doc_id", "text")
      out.agg(sum("n_copies")).as[Long].collect().head == texts.size
    }

  property("chunks tile the token stream: stride-aligned starts, exact reconstruction") =
    forAll(Gen.choose(1, 40), Gen.choose(1, 6), Gen.choose(0, 5)) { (nTok, stride, over) =>
      val chunk = stride + over
      val text = (0 until nTok).map(i => s"w$i").mkString(" ")
      val df = Seq((7L, text)).toDF("doc_id", "text")
      val rows = graft.operators.TrainPrep
        .chunks(df, "doc_id", "text", chunk = chunk, stride = stride)
        .select("chunk_id", "start_tok", "n_tok", "chunk_text")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1)
      val startsOk = rows.map(_._2).toSeq == rows.indices.map(_.toLong * stride)
      val coverOk = rows.map(r => r._2 until (r._2 + r._3))
        .foldLeft(Set.empty[Long])(_ ++ _) == (0L until nTok.toLong).toSet
      val textOk = rows.forall { case (_, start, n, ct) =>
        ct == (start until start + n).map(i => s"w$i").mkString(" ")
      }
      startsOk && coverOk && textOk
    }

  // pieces mix precomposed, decomposed, bare combining marks, and ASCII —
  // the codegen'd expression must agree with java.text.Normalizer and be
  // idempotent on every composition
  private val nfcPiece = Gen.oneOf(
    "a", " ", "é", "ñ", "é", "̈x", "abc", "́")
  property("NfcNormalizeExpr equals java.text.Normalizer and is idempotent") =
    forAll(Gen.listOfN(6, nfcPiece)) { parts =>
      val s = parts.mkString
      val once = Seq(Tuple1(s)).toDF("t")
        .select(graft.expressions.NfcNormalizeExpr.nfc(col("t")).as("n"))
      val got = once.as[String].collect().head
      val want = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      val twice = once.select(graft.expressions.NfcNormalizeExpr.nfc(col("n")))
        .as[String].collect().head
      got == want && twice == got
    }

  property("Robust.medians selects the exact lower median per group") =
    forAll(Gen.choose(1, 40), Gen.choose(1, 3)) { (n, groups) =>
      val gen = new scala.util.Random(n * 31 + groups) // deterministic per case
      val rows = for {
        g <- 0 until groups
        _ <- 0 until n
      } yield (s"g$g", math.floor(gen.nextDouble() * 20) / 4.0) // duplicates likely
      val df = spark.createDataFrame(rows).toDF("g", "v")
      val got = graft.operators.Robust.medians(df, "g", "v")
        .select("g", "med", "n").collect()
        .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
      (0 until groups).forall { g =>
        val vs = rows.filter(_._1 == s"g$g").map(_._2).sorted
        val expect = vs((vs.size + 1) / 2 - 1) // lower median, 1-based (n+1) div 2
        got(s"g$g") == ((expect, vs.size.toLong))
      }
    }

  // grid blocking must find EXACTLY the brute-force pair set for any point
  // cloud and radius — completeness (3×3 neighborhood suffices at cell
  // side = r) and uniqueness (one offset per pair) in one property
  property("spatial distanceJoin == brute force on random point clouds") =
    forAll(Gen.choose(1L, 500L),
           Gen.listOf(Gen.zip(Gen.choose(0L, 2000L), Gen.choose(0L, 2000L)))) {
      (r: Long, pts: List[(Long, Long)]) =>
      val withIds: Seq[(Long, Long, Long)] = pts.distinct.zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x, y) }
      val df = spark.createDataFrame(withIds).toDF("id", "x", "y")
      val got = graft.operators.Spatial.distanceJoin(df, r)
        .collect().map(w => (w.getLong(0), w.getLong(1), w.getLong(2))).toSet
      val want = (for {
        a <- withIds; b <- withIds if a._1 < b._1
        d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
        if d2 <= r * r
      } yield (a._1, b._1, d2)).toSet
      got == want
    }

  // the two Bradley-Terry execution tiers must be bit-interchangeable on
  // any duel multiset (same floor-division fixed point)
  property("Bradley-Terry driver tier == distributed tier") =
    forAll(Gen.listOf(Gen.zip(Gen.oneOf("a", "b", "c", "d"),
      Gen.oneOf("a", "b", "c", "d"), Gen.choose(1L, 9L)))) {
      raw: List[(String, String, Long)] =>
      val duels = raw.filter { case (w, l, _) => w != l }
      duels.isEmpty || {
        val df = spark.createDataFrame(duels).toDF("winner", "loser", "w")
        def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
          .map(w => (w.getString(0), w.getLong(1), w.getLong(2), w.getLong(3)))
          .toSeq
        rows(graft.operators.Preference.ratings(df, iters = 2)) ==
          rows(graft.operators.Preference.ratingsDistributed(df, iters = 2))
      }
    }

  // census identities: Σ class sizes = n_rows; rows_violating counts rows,
  // never classes; k=1 can never be violated
  property("k-anonymity census identities") =
    forAll(Gen.listOf(Gen.zip(Gen.oneOf("x", "y", "z"), Gen.oneOf("1", "2")))) {
      rows: List[(String, String)] =>
      rows.isEmpty || {
        val df = spark.createDataFrame(rows).toDF("q1", "q2")
        def census(k: Long) = {
          val w = graft.operators.Anonymize
            .kAnonymityCensus(df, Seq("q1", "q2"), k).collect().head
          (w.getLong(0), w.getLong(1), w.getLong(2), w.getLong(3), w.getBoolean(4))
        }
        val (nRows, nClasses, minSz, viol, anon) = census(2L)
        val k1 = census(1L)
        nRows == rows.length.toLong && nClasses >= 1 && minSz >= 1 &&
          viol >= 0 && viol <= nRows && anon == (viol == 0L) &&
          k1._4 == 0L && k1._5
      }
    }

}

/** WAV decode equivalence: the direct RIFF fast path must be
  * indistinguishable from the javax.sound general path on every
  * canonical 16-bit PCM container the JDK writer can produce. */
object WavPathPropertySpec extends Properties("graft.wav") {
  import org.scalacheck.Prop.propBoolean

  private def wavBytes(rate: Float, channels: Int, samples: Array[Short]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, (samples.length / channels).toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  property("fast RIFF path == javax path on canonical PCM16 WAV") =
    forAll(Gen.oneOf(8000f, 16000f, 44100f), Gen.choose(1, 2),
      Gen.nonEmptyListOf(Gen.choose(Short.MinValue, Short.MaxValue))) { (rate, ch, vals) =>
      val samples = (vals ++ vals.take(vals.length % ch)).toArray // frame-align
      val bytes = wavBytes(rate, ch, samples)
      val fast = graft.operators.Multimodal.parseCanonicalWav(bytes)
      val general = graft.operators.Multimodal.decodeAudioJavax(bytes)
      (fast.nonEmpty :| "fast path recognizes the container") &&
        (general.nonEmpty :| "javax recognizes the container") && {
          val (fr, fc, fs) = fast.get
          val (gr, gc, gs) = general.get
          (fr == gr && fc == gc) :| s"format: ($fr,$fc) vs ($gr,$gc)" &&
            (fs.toSeq == gs.toSeq) :| "identical samples"
        }
    }

  property("fast path rejects non-RIFF and truncated payloads (falls to general)") =
    forAll(Gen.nonEmptyListOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
      val arr = bs.toArray
      // must never throw; None is the only acceptable failure mode
      graft.operators.Multimodal.parseCanonicalWav(arr) match {
        case None => true
        case Some((r, c, s)) => r > 0 && c > 0 && s != null
      }
    }

  // ---- berry.proto layer DSL codec (B1) -----------------------------------
  private val berryName = Gen.oneOf("a", "img", "layer_1", "x9", "long_layer_name")
  private val berryOptF = Gen.option(Gen.choose(-8f, 8f))
  private val berryOptU = Gen.option(Gen.choose(0L, 4294967295L)) // full uint32 domain
  private val berryLayer: Gen[graft.functions.Berry.LayerParameter] = {
    import graft.functions.Berry._
    for {
      tpe <- Gen.oneOf("data", "convolution2d", "dense", "dropout", "maxpooling2d", "custom_ext")
      ins <- Gen.listOf(berryName)
      name <- Gen.option(berryName)
      data <- Gen.option(Gen.nonEmptyListOf(Gen.choose(0L, 4294967295L)).map(d =>
        DataParameter(Size(d))))
      conv <- Gen.option(for {
        nf <- Gen.choose(0L, 4294967295L); kx <- Gen.choose(0L, 300L); ky <- Gen.choose(0L, 300L)
        sx <- berryOptU; sy <- berryOptU
        pad <- Gen.option(Gen.oneOf("same", "valid", "weird"))
        act <- Gen.option(Gen.oneOf("relu", "sigmoid"))
        init <- Gen.option(Gen.oneOf("uniform", "gaussian"))
        w <- berryOptF; b <- berryOptF
      } yield Convolution2DParameter(nf, kx, ky, sx, sy, pad, act, init, w, b))
      dense <- Gen.option(for {
        u <- Gen.choose(0L, 4294967295L)
        act <- Gen.option(Gen.oneOf("relu", "sigmoid"))
        init <- Gen.option(Gen.oneOf("uniform", "gaussian"))
        w <- berryOptF; b <- berryOptF
      } yield DenseParameter(u, act, init, w, b))
      pool <- Gen.option(for {
        kx <- Gen.choose(0L, 300L); ky <- Gen.choose(0L, 300L)
        sx <- berryOptU; sy <- berryOptU
        pad <- Gen.option(Gen.oneOf("same", "valid"))
      } yield MaxPooling2DParameter(kx, ky, sx, sy, pad))
      drop <- Gen.option(berryOptF.map(DropoutParameter(_)))
    } yield LayerParameter(tpe, ins, name, data, conv, dense, pool, drop)
  }

  property("Berry layer/network encode∘decode = id over the full field domain") =
    forAll(Gen.listOfN(6, berryLayer)) { layers =>
      import graft.functions.Berry
      val net = Berry.Network(layers)
      Berry.decodeNetwork(Berry.encodeNetwork(net)) == net &&
        layers.forall(l => Berry.decodeLayer(Berry.encodeLayer(l)) == l)
    }

  property("Berry decode is total on junk: loud IAE or a parsed layer, never a crash") =
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
      try { graft.functions.Berry.decodeLayer(bs.toArray); true }
      catch { case _: IllegalArgumentException => true }
    }
}
