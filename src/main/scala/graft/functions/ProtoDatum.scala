package graft.functions

import java.io.ByteArrayOutputStream

/** Byte-compatible proto2 writer/reader for the reference's `Datum`
  * messages (`/root/reference/datum.proto:3-48`, encode lineage
  * `/root/reference/serialize.py:269-340`) — the one reference-computed
  * artifact a migrating consumer may still need bit-for-bit (E1 in
  * SURVEY §2.1). Hand-rolled against the PUBLIC protobuf wire format
  * (varint keys `(field<<3)|wire`, length-delimited submessages,
  * little-endian 32-bit floats); no protobuf runtime dependency.
  *
  * Byte equality with the Python encoder holds because proto2 serializes
  * present fields in FIELD-NUMBER order and every field here is scalar or
  * a nested message — both writers emit the identical canonical order.
  * Reference semantics reproduced exactly:
  *  - identifier is `str(key)`;
  *  - numeric/text data is the float32 little-endian array bytes
  *    (`np.asarray(data, dtype='float32').tobytes()`, serialize.py:305);
  *  - `size.dim` is hardcoded 1 (serialize.py:303);
  *  - a labeled row folds its Class message INTO the same Datum
  *    (serialize.py:285-291, 310-315) — label and data share the message.
  *
  * The reference's LMDB sink is replaced by columnar storage (SURVEY
  * ruling W1/W2): datums ride a `binary` column in parquet.
  */
object ProtoDatum {

  // ---- message model (field numbers from datum.proto) -------------------
  final case class Size(dim: Long = 1L)
  final case class Numeric(identifier: String, size: Option[Size],
                           data: Array[Byte])
  final case class ImgData(identifier: String, channels: Option[Long],
                           height: Option[Long], width: Option[Long],
                           data: Option[Array[Byte]],
                           floatData: Seq[Float] = Nil,
                           encoded: Option[Boolean] = None)
  final case class ClassMsg(identifier: String, slabel: Option[String],
                            nlabel: Option[Long],
                            multilabel: Option[Array[Byte]] = None)
  final case class Datum(numeric: Option[Numeric] = None,
                         imgdata: Option[ImgData] = None,
                         classs: Option[ClassMsg] = None)

  // ---- wire-format primitives: shared writer layer ([[ProtoWire]]) ------
  import ProtoWire.{writeVarintField, writeFloatField, writeLen}

  /** float32 little-endian array bytes — `np.float32(...).tobytes()`. */
  def floatBytes(fs: Seq[Float]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(fs.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fs.foreach(bb.putFloat)
    bb.array()
  }

  // ---- encoders (fields in number order, as python does) ----------------
  private def encodeSize(m: Size): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeVarintField(out, 1, m.dim)
    out.toByteArray
  }
  private def encodeNumeric(m: Numeric): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeLen(out, 1, m.identifier.getBytes("UTF-8"))
    m.size.foreach(s => writeLen(out, 2, encodeSize(s)))
    writeLen(out, 3, m.data)
    out.toByteArray
  }
  private def encodeImg(m: ImgData): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeLen(out, 1, m.identifier.getBytes("UTF-8"))
    m.channels.foreach(writeVarintField(out, 2, _))
    m.height.foreach(writeVarintField(out, 3, _))
    m.width.foreach(writeVarintField(out, 4, _))
    m.data.foreach(writeLen(out, 5, _))
    m.floatData.foreach(writeFloatField(out, 6, _)) // proto2 default: unpacked
    m.encoded.foreach(b => writeVarintField(out, 7, if (b) 1L else 0L))
    out.toByteArray
  }
  private def encodeClass(m: ClassMsg): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeLen(out, 1, m.identifier.getBytes("UTF-8"))
    m.slabel.foreach(s => writeLen(out, 2, s.getBytes("UTF-8")))
    m.nlabel.foreach(writeVarintField(out, 3, _))
    m.multilabel.foreach(writeLen(out, 4, _))
    out.toByteArray
  }

  /** Serialized Datum — byte-equal to the reference's
    * `datum.SerializeToString()`. */
  def encode(d: Datum): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    d.numeric.foreach(m => writeLen(out, 10, encodeNumeric(m)))
    d.imgdata.foreach(m => writeLen(out, 11, encodeImg(m)))
    d.classs.foreach(m => writeLen(out, 13, encodeClass(m)))
    out.toByteArray
  }

  /** datum.proto declares these fields proto2 uint32; the Python encoder
    * rejects values outside [0, 2^32). Enforce the same domain here so a
    * value we encode is always one the reference could have produced —
    * silently emitting a 64-bit varint would break byte compatibility. */
  private def requireUint32(name: String, v: Long): Unit =
    require(v >= 0L && v <= 0xffffffffL,
      s"$name=$v outside proto2 uint32 domain [0, 2^32)")

  /** The reference's NumericDatum/TextDatum shape (serialize.py:296-340):
    * identifier = str(key), dim = 1, float32 data; optional integer label
    * folded in as Class(nlabel). */
  def numericDatum(key: Long, data: Seq[Float], nlabel: Option[Long]): Array[Byte] = {
    nlabel.foreach(requireUint32("nlabel", _))
    encode(Datum(
      numeric = Some(Numeric(key.toString, Some(Size(1L)), floatBytes(data))),
      classs = nlabel.map(n => ClassMsg(key.toString, None, Some(n)))))
  }

  /** The reference's ImageDatum shape (serialize.py:269-291): HWC dims,
    * float32 pixel bytes, optional string label folded in. */
  def imageDatum(key: Long, channels: Int, height: Int, width: Int,
                 data: Seq[Float], slabel: Option[String]): Array[Byte] = {
    requireUint32("channels", channels.toLong)
    requireUint32("height", height.toLong)
    requireUint32("width", width.toLong)
    encode(Datum(
      imgdata = Some(ImgData(key.toString, Some(channels.toLong),
        Some(height.toLong), Some(width.toLong), Some(floatBytes(data)))),
      classs = slabel.map(s => ClassMsg(key.toString, Some(s), None))))
  }

  /** DataFrame-level export: every row becomes (key, datum: binary) with
    * the reference's labeled-NumericDatum bytes. Map-only (mapPartitions,
    * no shuffle) — write the result with `Tables.save` partitioned however
    * the consumer shards; this replaces the reference's LMDB write loop
    * (serialize.py:342-387) with columnar storage. */
  def numericDatums(df: org.apache.spark.sql.DataFrame, keyCol: String,
                    vecCol: String, labelCol: Option[String]): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{assert_true, col, concat, expr, lit}
    // Loud NULL guard BEFORE the typed encoder: a NULL key/vector/label
    // would otherwise die mid-export in the non-nullable tuple encoder
    // ("Null value appeared in non-nullable field") with no hint of which
    // row — the codec's MalformedDatumException discipline, applied to
    // the DataFrame entry point. A predicate survives column pruning.
    def guarded(sel: org.apache.spark.sql.DataFrame, cols: Seq[String]) =
      sel.filter(assert_true(
        cols.map(c => col(c).isNotNull).reduce(_ && _) &&
          !expr(s"exists(`$vecCol`, x -> x IS NULL)"),
        concat(lit(s"numericDatums: NULL $keyCol/$vecCol" +
          labelCol.fold("")("/" + _) + " in export row key="),
          col(keyCol).cast("string"))).isNull)
    labelCol match {
      case Some(lc) =>
        guarded(df.select(col(keyCol).cast("long").as(keyCol),
            col(vecCol).cast("array<float>").as(vecCol),
            col(lc).cast("long").as(lc)), Seq(keyCol, vecCol, lc))
          .as[(Long, Seq[Float], Long)]
          .mapPartitions(_.map { case (k, v, l) => (k, numericDatum(k, v, Some(l))) })
          .toDF("key", "datum")
      case None =>
        guarded(df.select(col(keyCol).cast("long").as(keyCol),
            col(vecCol).cast("array<float>").as(vecCol)), Seq(keyCol, vecCol))
          .as[(Long, Seq[Float])]
          .mapPartitions(_.map { case (k, v) => (k, numericDatum(k, v, None)) })
          .toDF("key", "datum")
    }
  }

  /** Raised when `decode` meets bytes that are not a well-formed Datum —
    * truncated varint, length field running past the buffer, or a known
    * field carrying the wrong wire type. The migration read path prefers a
    * loud, named failure over an ArrayIndexOutOfBoundsException (or worse,
    * silently misparsed garbage) on a corrupt LMDB value. */
  final class MalformedDatumException(msg: String)
    extends IllegalArgumentException(s"malformed datum: $msg")

  // ---- decoder (round-trip gate + LMDB-migration read path) -------------
  // Every read is bounds-checked against `until`: externally produced bytes
  // (the LMDB migration path) must fail loudly, never read out of the slice.
  private final class Reader(bytes: Array[Byte], from: Int, until: Int) {
    var pos: Int = from
    def hasMore: Boolean = pos < until
    def varint(): Long = {
      var shift = 0; var v = 0L
      var more = true
      while (more) {
        if (pos >= until) throw new MalformedDatumException(
          s"truncated varint at offset $pos")
        if (shift > 63) throw new MalformedDatumException(
          s"varint longer than 10 bytes at offset $pos")
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift; shift += 7; more = (b & 0x80) != 0
      }
      v
    }
    def lenDelimited(): (Int, Int) = {
      val n = varint()
      val s = pos
      if (n < 0 || n > until - s) throw new MalformedDatumException(
        s"length $n at offset $s overruns buffer end $until")
      pos += n.toInt; (s, s + n.toInt)
    }
    def slice(s: Int, e: Int): Array[Byte] = java.util.Arrays.copyOfRange(bytes, s, e)
    def float32(): Float = {
      if (until - pos < 4) throw new MalformedDatumException(
        s"truncated float32 at offset $pos")
      val bits = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
        ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
      pos += 4
      java.lang.Float.intBitsToFloat(bits)
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 =>
        if (until - pos < 8) throw new MalformedDatumException(
          s"truncated fixed64 at offset $pos")
        pos += 8
      case 2 => lenDelimited(); ()
      case 5 =>
        if (until - pos < 4) throw new MalformedDatumException(
          s"truncated fixed32 at offset $pos")
        pos += 4
      case w => throw new MalformedDatumException(s"wire type $w unsupported")
    }
    /** Known field: enforce the wire type declared in datum.proto. A
      * varint-typed byte stream must not be misparsed as length-delimited. */
    def expectWire(field: Int, got: Int, want: Int): Unit =
      if (got != want) throw new MalformedDatumException(
        s"field $field has wire type $got, expected $want")
  }

  def decode(bytes: Array[Byte]): Datum = {
    val r = new Reader(bytes, 0, bytes.length)
    var d = Datum()
    while (r.hasMore) {
      val key = r.varint(); val field = key >>> 3; val wire = (key & 7).toInt
      // field number kept as Long: a corrupt varint encoding 2^32+10
      // would alias onto field 10 under .toInt and be MISPARSED as the
      // Numeric submessage instead of skipped
      field match {
        case 10L => r.expectWire(10, wire, 2); val (s, e) = r.lenDelimited(); d = d.copy(numeric = Some(decodeNumeric(bytes, s, e)))
        case 11L => r.expectWire(11, wire, 2); val (s, e) = r.lenDelimited(); d = d.copy(imgdata = Some(decodeImg(bytes, s, e)))
        case 13L => r.expectWire(13, wire, 2); val (s, e) = r.lenDelimited(); d = d.copy(classs = Some(decodeClass(bytes, s, e)))
        case _ => r.skip(wire)
      }
    }
    d
  }
  private def decodeNumeric(bytes: Array[Byte], from: Int, until: Int): Numeric = {
    val r = new Reader(bytes, from, until)
    var id = ""; var size: Option[Size] = None; var data = Array.empty[Byte]
    while (r.hasMore) {
      val key = r.varint()
      (key >>> 3, (key & 7).toInt) match {
        case (1L, w) => r.expectWire(1, w, 2); val (s, e) = r.lenDelimited(); id = new String(r.slice(s, e), "UTF-8")
        case (2L, w) =>
          r.expectWire(2, w, 2)
          val (s, e) = r.lenDelimited(); val rr = new Reader(bytes, s, e)
          var dim = 1L
          while (rr.hasMore) {
            val k2 = rr.varint()
            if ((k2 >>> 3) == 1L) { rr.expectWire(1, (k2 & 7).toInt, 0); dim = rr.varint() }
            else rr.skip((k2 & 7).toInt)
          }
          size = Some(Size(dim))
        case (3L, w) => r.expectWire(3, w, 2); val (s, e) = r.lenDelimited(); data = r.slice(s, e)
        case (_, w) => r.skip(w)
      }
    }
    Numeric(id, size, data)
  }
  private def decodeImg(bytes: Array[Byte], from: Int, until: Int): ImgData = {
    val r = new Reader(bytes, from, until)
    var m = ImgData("", None, None, None, None)
    val floats = scala.collection.mutable.ArrayBuffer.empty[Float]
    while (r.hasMore) {
      val key = r.varint()
      (key >>> 3, (key & 7).toInt) match {
        case (1L, w) => r.expectWire(1, w, 2); val (s, e) = r.lenDelimited(); m = m.copy(identifier = new String(r.slice(s, e), "UTF-8"))
        case (2L, w) => r.expectWire(2, w, 0); m = m.copy(channels = Some(r.varint()))
        case (3L, w) => r.expectWire(3, w, 0); m = m.copy(height = Some(r.varint()))
        case (4L, w) => r.expectWire(4, w, 0); m = m.copy(width = Some(r.varint()))
        case (5L, w) => r.expectWire(5, w, 2); val (s, e) = r.lenDelimited(); m = m.copy(data = Some(r.slice(s, e)))
        case (6L, 5) => floats += r.float32()
        case (6L, 2) => // packed encoding also legal on the read path
          val (s, e) = r.lenDelimited(); val rr = new Reader(bytes, s, e)
          while (rr.hasMore) floats += rr.float32()
        case (6L, w) => throw new MalformedDatumException(s"field 6 has wire type $w, expected 5 or 2")
        case (7L, w) => r.expectWire(7, w, 0); m = m.copy(encoded = Some(r.varint() != 0L))
        case (_, w) => r.skip(w)
      }
    }
    m.copy(floatData = floats.toSeq)
  }
  private def decodeClass(bytes: Array[Byte], from: Int, until: Int): ClassMsg = {
    val r = new Reader(bytes, from, until)
    var m = ClassMsg("", None, None)
    while (r.hasMore) {
      val key = r.varint()
      (key >>> 3, (key & 7).toInt) match {
        case (1L, w) => r.expectWire(1, w, 2); val (s, e) = r.lenDelimited(); m = m.copy(identifier = new String(r.slice(s, e), "UTF-8"))
        case (2L, w) => r.expectWire(2, w, 2); val (s, e) = r.lenDelimited(); m = m.copy(slabel = Some(new String(r.slice(s, e), "UTF-8")))
        case (3L, w) => r.expectWire(3, w, 0); m = m.copy(nlabel = Some(r.varint()))
        case (4L, w) => r.expectWire(4, w, 2); val (s, e) = r.lenDelimited(); m = m.copy(multilabel = Some(r.slice(s, e)))
        case (_, w) => r.skip(w)
      }
    }
    m
  }
}
