package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.MimoTrainer
import graft.ml.MimoTrainer.Batch

/** M1 gate: the deterministic JVM twin of the reference's Keras MIMO
  * trainer (`tests/keras_mimo.py`). Learnability on a synthetic target,
  * bit determinism across runs, MIMO head dimensioning, featurizer
  * totality (labels, images, structs, ragged vectors), and the
  * steps_per_epoch/generator contract. */
class MimoTrainerSpec extends AnyFunSuite {

  /** Deterministic LCG so the spec needs no global RNG state. */
  private def lcg(seed: Long): Iterator[Double] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)
      .map(s => ((s >>> 11).toDouble / (1L << 53).toDouble))

  /** Batches for y = sigmoid(w*. x + b*) on 4-dim inputs. */
  private def syntheticBatches(n: Int, batch: Int, seed: Long): (Vector[Batch], Long) = {
    val rnd = lcg(seed)
    val wStar = Array(1.5, -2.0, 0.7, 0.3); val bStar = -0.2
    val rows = Vector.fill(n) {
      val x = Array.fill(4)((rnd.next() * 2 - 1).toFloat)
      val z = x.zip(wStar).map { case (xi, wi) => xi * wi }.sum + bStar
      val y = (1.0 / (1.0 + math.exp(-z))).toFloat
      (x, y)
    }
    val nBatches = n / batch
    val batches = (0 until nBatches).toVector.map { bi =>
      val slice = rows.slice(bi * batch, (bi + 1) * batch)
      (Map[String, IndexedSeq[Any]]("x" -> slice.map(_._1: Any).toIndexedSeq),
        Map[String, IndexedSeq[Any]]("y" -> slice.map(r => (r._2: Any)).toIndexedSeq))
    }
    (batches, nBatches.toLong)
  }

  test("learns a sigmoid-linear target: loss falls by >10x and is monotone-ish") {
    val (batches, steps) = syntheticBatches(n = 256, batch = 32, seed = 7L)
    val epochs = 60
    val gen = Iterator.continually(batches).flatten // infinite generator
    val t = new MimoTrainer(Seq("x"), Seq("y"), epochs = epochs, lr = 0.05)
    val report = t.fit(gen, steps)
    assert(report.epochLosses.length == epochs)
    assert(report.nSteps == steps * epochs)
    assert(report.inDim == 4 && report.outDims == Seq(1))
    val first = report.epochLosses.head
    val last = report.epochLosses.last
    assert(last < first / 10.0, s"loss did not learn: $first -> $last")
    assert(report.epochLosses.forall(l => java.lang.Double.isFinite(l)))
    // prediction sanity on the probe batch
    val x0 = t.featurizeInputs(batches.head._1, 0)
    val pred = t.predictRaw(x0)(0)(0)
    val target = batches.head._2("y")(0).asInstanceOf[Float].toDouble
    assert(math.abs(pred - target) < 0.12, s"pred $pred vs target $target")
  }

  test("bit-deterministic: two fits over the same stream give identical loss curves") {
    val (batches, steps) = syntheticBatches(n = 128, batch = 16, seed = 11L)
    def run() = new MimoTrainer(Seq("x"), Seq("y"), epochs = 5)
      .fit(Iterator.continually(batches).flatten, steps).epochLosses
    assert(run() == run())
  }

  test("MIMO: two inputs concatenate, two heads size independently") {
    val rnd = lcg(3L)
    val n = 64; val bs = 16
    val rows = Vector.fill(n)((
      Array.fill(3)(rnd.next().toFloat),
      Array.fill(2)(rnd.next().toFloat),
      Array.fill(4)(rnd.next().toFloat),
      rnd.next().toFloat))
    val batches = (0 until n / bs).toVector.map { bi =>
      val s = rows.slice(bi * bs, (bi + 1) * bs)
      (Map[String, IndexedSeq[Any]](
        "a" -> s.map(_._1: Any).toIndexedSeq,
        "b" -> s.map(_._2: Any).toIndexedSeq),
        Map[String, IndexedSeq[Any]](
          "u" -> s.map(_._3: Any).toIndexedSeq,
          "v" -> s.map(r => (r._4: Any)).toIndexedSeq))
    }
    val t = new MimoTrainer(Seq("a", "b"), Seq("u", "v"), epochs = 2)
    val report = t.fit(Iterator.continually(batches).flatten, (n / bs).toLong)
    assert(report.inDim == 5)          // 3 + 2 concatenated
    assert(report.outDims == Seq(4, 1)) // one Dense(prod(shape)) per output
    assert(report.epochLosses.forall(java.lang.Double.isFinite(_)))
  }

  test("featurizer totality: string labels, undecodable binary, structs, ragged vectors") {
    import org.apache.spark.sql.Row
    val ins: Map[String, IndexedSeq[Any]] = Map(
      "vec" -> IndexedSeq(Array(1f, 2f), Array(9f), Array(3f, 4f, 5f)), // ragged: pad/truncate
      "bin" -> IndexedSeq(Array[Byte](1, 2, 3), Array[Byte](4), null),  // undecodable binary
      "path" -> IndexedSeq("a/b.png", "c/d.png", "e/f.png"),            // input string: no feature
      "rec" -> IndexedSeq(Row("p1", 1.0), Row("p2", 2.0), Row("p3", 3.0))) // struct: string skipped
    val outs: Map[String, IndexedSeq[Any]] = Map(
      "label" -> IndexedSeq("cat", "dog", "cat"))
    val batch: Batch = (ins, outs)
    val t = new MimoTrainer(Seq("vec", "bin", "path", "rec"), Seq("label"), epochs = 3)
    val report = t.fit(Iterator.continually(batch), 1L)
    // dims: vec=2 (probe), bin=3 (probe bytes), path=0, rec= 0(str)+1(num) = 1
    assert(report.inDim == 6)
    assert(report.outDims == Seq(1))
    assert(report.epochLosses.forall(java.lang.Double.isFinite(_)))
    // label dict is first-seen deterministic: cat=0, dog=1 — loss must be
    // computable (no NaN) with targets {0, 1}
    val x = t.featurizeInputs(ins, 1)
    assert(x.length == 6)
    assert(x(0) == 9f && x(1) == 0f) // short vec padded
  }

  test("decodable image input featurizes as pixels at the probe grid") {
    // a real 2x2 PNG via ImageIO
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val ins: Map[String, IndexedSeq[Any]] = Map("img" -> IndexedSeq(png, png))
    val outs: Map[String, IndexedSeq[Any]] = Map("y" -> IndexedSeq(1f, 0f))
    val t = new MimoTrainer(Seq("img"), Seq("y"), epochs = 1)
    val report = t.fit(Iterator.continually((ins, outs)), 1L)
    assert(report.inDim == 2 * 2 * 3)
    val x = t.featurizeInputs(ins, 0)
    assert(x(0) == 1f && x(1) == 0f && x(2) == 0f)    // red pixel
    assert(x(9) == 1f && x(10) == 1f && x(11) == 1f)  // white pixel
  }

  test("generator contract: exhausted stream and bad steps fail loudly") {
    val (batches, steps) = syntheticBatches(n = 32, batch = 16, seed = 5L)
    val t = new MimoTrainer(Seq("x"), Seq("y"), epochs = 3)
    val e = intercept[IllegalStateException] {
      t.fit(batches.iterator, steps) // finite: 2 batches, needs 6
    }
    assert(e.getMessage.contains("exhausted"))
    intercept[IllegalArgumentException] {
      new MimoTrainer(Seq("x"), Seq("y"), epochs = 1).fit(batches.iterator, 0L)
    }
    intercept[IllegalArgumentException] { new MimoTrainer(Seq("x"), Seq("y"), epochs = 0) }
    intercept[IllegalArgumentException] { new MimoTrainer(Nil, Seq("y"), epochs = 1) }
  }

  test("forward/backward/Adam match the closed-form single-step math exactly") {
    // 1-dim input, 1-dim output, batch of one row: after ONE Adam step
    // every quantity is closed-form. Glorot init is seeded and public:
    // limit = sqrt(6/(fanIn+fanOut)), w0 = (2u-1)*limit from
    // java.util.Random(seed + head), b0 = 0. At t=1 Adam's bias
    // correction makes m_hat = g and v_hat = g^2, so the update is
    // exactly lr * g / (|g| + eps). A drift anywhere — sigmoid, the
    // 2/(B*M) MSE scale, gradient accumulation, moment update, bias
    // correction — moves the prediction.
    val x = 0.75f; val y = 0.2f
    val seed = 9L; val lr = 0.001; val eps = 1e-7
    val batch: Batch = (
      Map("x" -> IndexedSeq[Any](x)), Map("y" -> IndexedSeq[Any](y)))
    val t = new MimoTrainer(Seq("x"), Seq("y"), epochs = 1, seed = seed,
      lr = lr, eps = eps)
    t.fit(Iterator.single(batch), 1L)

    val limit = math.sqrt(6.0 / (1 + 1))
    val rng = new java.util.Random(seed)
    val w0 = (rng.nextDouble() * 2 - 1) * limit
    val b0 = 0.0
    val a0 = 1.0 / (1.0 + math.exp(-(w0 * x + b0)))
    val dz = 2.0 * (a0 - y) * a0 * (1.0 - a0) // scale 2/(B*M) with B=M=1
    val gW = dz * x; val gB = dz
    val w1 = w0 - lr * gW / (math.abs(gW) + eps)
    val b1 = b0 - lr * gB / (math.abs(gB) + eps)
    val expected = 1.0 / (1.0 + math.exp(-(w1 * x + b1)))

    val pred = t.predictRaw(t.featurizeInputs(batch._1, 0))(0)(0)
    assert(math.abs(pred - expected) < 1e-12, s"pred $pred vs closed-form $expected")
  }

  test("missing declared column fails loudly at the probe") {
    val ins: Map[String, IndexedSeq[Any]] = Map("x" -> IndexedSeq(1f))
    val outs: Map[String, IndexedSeq[Any]] = Map("y" -> IndexedSeq(1f))
    val t = new MimoTrainer(Seq("x", "ghost"), Seq("y"), epochs = 1)
    val e = intercept[IllegalArgumentException] {
      t.fit(Iterator.continually((ins, outs)), 1L)
    }
    assert(e.getMessage.contains("ghost"))
  }
}
