package graft.functions

import java.io.ByteArrayOutputStream

/** Byte-compatible proto2 codec + typed model for the reference's layer
  * DSL (`/root/reference/berry.proto:1-65`, B1 in SURVEY §2.1) — the
  * five-layer-type network-configuration language (`data`,
  * `convolution2d`, `dense`, `dropout`, `maxpooling2d`).
  *
  * The reference never compiles or imports this proto (`Makefile:2-3`
  * builds only `datum.proto`), so there is no reference runtime to match;
  * what a migrating user needs is (a) the WIRE surface — read/write
  * configs other tools produced with protoc — and (b) a VALIDATED typed
  * graph with deterministic shape/parameter inference, so a config can be
  * checked before a training run is scheduled. Both are provided here.
  *
  * Wire compatibility follows the same hand-rolled proto2 rules as
  * [[ProtoDatum]] (varint keys `(field<<3)|wire`, length-delimited
  * submessages, little-endian float32, repeated scalars UNPACKED as
  * proto2 requires); fields serialize in number order, unknown fields are
  * skipped on decode (proto2 forward compatibility), missing `required`
  * fields fail loudly.
  *
  * Inference semantics are the PUBLIC Keras conventions, because the
  * DSL's only consumer in the reference codebase is a Keras trainer
  * (`tests/keras_mimo.py`): `same`/`valid` padding, MaxPooling2D stride
  * defaulting to its pool size, Dense mapping the LAST axis, multi-input
  * layers concatenated on the last axis (`tests/keras_mimo.py:45`).
  */
object Berry {

  // ---- message model (field numbers from berry.proto) --------------------
  final case class Size(dim: Seq[Long])
  final case class DataParameter(size: Size)
  final case class Convolution2DParameter(
      numFilters: Long, kernelSizeX: Long, kernelSizeY: Long,
      strideX: Option[Long] = None, strideY: Option[Long] = None,
      pad: Option[String] = None, activation: Option[String] = None,
      init: Option[String] = None, wStddev: Option[Float] = None,
      bVal: Option[Float] = None)
  final case class MaxPooling2DParameter(
      kernelSizeX: Long, kernelSizeY: Long,
      strideX: Option[Long] = None, strideY: Option[Long] = None,
      pad: Option[String] = None)
  final case class DenseParameter(
      numUnits: Long, activation: Option[String] = None,
      init: Option[String] = None, wStddev: Option[Float] = None,
      bVal: Option[Float] = None)
  final case class DropoutParameter(keepProb: Option[Float] = None) {
    /** proto2 `[default = 0.5]` (`berry.proto:63`). */
    def keepProbOrDefault: Float = keepProb.getOrElse(0.5f)
  }
  final case class LayerParameter(
      layerType: String,                      // required string type = 1
      input: Seq[String] = Nil,               // repeated string input = 2
      name: Option[String] = None,            // optional string name = 3
      dataParam: Option[DataParameter] = None,              // = 100
      convolution2dParam: Option[Convolution2DParameter] = None, // = 101
      denseParam: Option[DenseParameter] = None,            // = 102
      maxpooling2dParam: Option[MaxPooling2DParameter] = None,   // = 103
      dropoutParam: Option[DropoutParameter] = None)        // = 104

  /** A network is the repeated-LayerParameter stream protoc would write
    * for a file of concatenated messages: each layer length-prefixed. */
  final case class Network(layers: Seq[LayerParameter])

  // ---- wire-format primitives: shared writer layer ([[ProtoWire]]) --------
  import ProtoWire.{writeVarint, writeLen, writeString, writeVarintField, writeFloatField}

  // ---- encoders (fields in number order) ----------------------------------
  private def encodeSize(m: Size): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    m.dim.foreach(writeVarintField(out, 1, _)) // proto2 repeated uint32: unpacked
    out.toByteArray
  }
  private def encodeData(m: DataParameter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeLen(out, 1, encodeSize(m.size))
    out.toByteArray
  }
  private def encodeConv(m: Convolution2DParameter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeVarintField(out, 1, m.numFilters)
    writeVarintField(out, 2, m.kernelSizeX)
    writeVarintField(out, 3, m.kernelSizeY)
    m.strideX.foreach(writeVarintField(out, 4, _))
    m.strideY.foreach(writeVarintField(out, 5, _))
    m.pad.foreach(writeString(out, 6, _))
    m.activation.foreach(writeString(out, 7, _))
    m.init.foreach(writeString(out, 8, _))
    m.wStddev.foreach(writeFloatField(out, 9, _))
    m.bVal.foreach(writeFloatField(out, 10, _))
    out.toByteArray
  }
  private def encodePool(m: MaxPooling2DParameter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeVarintField(out, 1, m.kernelSizeX)
    writeVarintField(out, 2, m.kernelSizeY)
    m.strideX.foreach(writeVarintField(out, 3, _))
    m.strideY.foreach(writeVarintField(out, 4, _))
    m.pad.foreach(writeString(out, 5, _))
    out.toByteArray
  }
  private def encodeDense(m: DenseParameter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeVarintField(out, 1, m.numUnits)
    m.activation.foreach(writeString(out, 2, _))
    m.init.foreach(writeString(out, 3, _))
    m.wStddev.foreach(writeFloatField(out, 4, _))
    m.bVal.foreach(writeFloatField(out, 5, _))
    out.toByteArray
  }
  private def encodeDropout(m: DropoutParameter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    m.keepProb.foreach(writeFloatField(out, 1, _))
    out.toByteArray
  }

  /** Encode one LayerParameter message body (no outer length prefix). */
  def encodeLayer(m: LayerParameter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeString(out, 1, m.layerType)
    m.input.foreach(writeString(out, 2, _))
    m.name.foreach(writeString(out, 3, _))
    m.dataParam.foreach(p => writeLen(out, 100, encodeData(p)))
    m.convolution2dParam.foreach(p => writeLen(out, 101, encodeConv(p)))
    m.denseParam.foreach(p => writeLen(out, 102, encodeDense(p)))
    m.maxpooling2dParam.foreach(p => writeLen(out, 103, encodePool(p)))
    m.dropoutParam.foreach(p => writeLen(out, 104, encodeDropout(p)))
    out.toByteArray
  }

  /** Encode a network as a length-delimited message stream (the
    * `writeDelimitedTo` framing protoc-generated runtimes use for
    * repeated top-level messages in one file). */
  def encodeNetwork(n: Network): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    n.layers.foreach { l => val b = encodeLayer(l); writeVarint(out, b.length); out.write(b) }
    out.toByteArray
  }

  // ---- decoder ------------------------------------------------------------
  private final class Reader(bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        if (pos >= end) throw new IllegalArgumentException("berry: truncated varint")
        if (shift > 63) throw new IllegalArgumentException("berry: varint overflow")
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      v
    }
    def readBytes(n: Int): Array[Byte] = {
      // n > end - pos (not pos + n > end): a hostile length near 2^31
      // would overflow the sum and slip past the bound into a raw AIOOBE
      if (n < 0 || n > end - pos) throw new IllegalArgumentException("berry: truncated field")
      val r = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; r
    }
    def readLenField(): Array[Byte] = {
      val n = readVarint()
      // a > 32-bit length varint must not truncate through toInt into a
      // small positive span that silently mis-frames the rest of the buffer
      if (n < 0 || n > Int.MaxValue)
        throw new IllegalArgumentException(s"berry: invalid field length $n")
      readBytes(n.toInt)
    }
    def readFloat(): Float = {
      val b = readBytes(4)
      java.lang.Float.intBitsToFloat(
        (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24))
    }
    /** Skip an unknown field of the given wire type (proto2 rule). */
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint(); ()
      case 1 => readBytes(8); ()
      case 2 => readLenField(); ()
      case 5 => readBytes(4); ()
      case w => throw new IllegalArgumentException(s"berry: unsupported wire type $w")
    }
  }
  private def fields(bytes: Array[Byte])(f: (Int, Int, Reader) => Boolean): Unit = {
    val r = new Reader(bytes, 0, bytes.length)
    while (r.hasMore) {
      val key = r.readVarint()
      val fieldL = key >>> 3
      // proto2 field numbers are 1..2^29-1; without the range check a
      // corrupt tag like ((2^32+1)<<3)|2 truncates through toInt to
      // field 1 and its payload is ACCEPTED as the required type string
      // instead of rejected — a fabricated layer, not a loud failure
      if (fieldL < 1 || fieldL > 536870911L)
        throw new IllegalArgumentException(s"berry: invalid field number $fieldL")
      val field = fieldL.toInt; val wire = (key & 7).toInt
      if (!f(field, wire, r)) r.skip(wire)
    }
  }
  private def str(b: Array[Byte]) = new String(b, "UTF-8")

  private def decodeSize(bytes: Array[Byte]): Size = {
    val dims = Seq.newBuilder[Long]
    fields(bytes) {
      case (1, 0, r) => dims += r.readVarint(); true
      case (1, 2, r) =>
        // packed encoding also accepted on read (parsers must accept both)
        val packed = r.readLenField()
        val pr = new Reader(packed, 0, packed.length)
        while (pr.hasMore) dims += pr.readVarint()
        true
      case _ => false
    }
    Size(dims.result())
  }
  private def decodeData(bytes: Array[Byte]): DataParameter = {
    var size: Option[Size] = None
    fields(bytes) {
      case (1, 2, r) => size = Some(decodeSize(r.readLenField())); true
      case _ => false
    }
    DataParameter(size.getOrElse(
      throw new IllegalArgumentException("berry: DataParameter missing required size")))
  }
  private def decodeConv(bytes: Array[Byte]): Convolution2DParameter = {
    var nf, kx, ky: Option[Long] = None
    var sx, sy: Option[Long] = None
    var pad, act, init: Option[String] = None
    var w, b: Option[Float] = None
    fields(bytes) {
      case (1, 0, r)  => nf = Some(r.readVarint()); true
      case (2, 0, r)  => kx = Some(r.readVarint()); true
      case (3, 0, r)  => ky = Some(r.readVarint()); true
      case (4, 0, r)  => sx = Some(r.readVarint()); true
      case (5, 0, r)  => sy = Some(r.readVarint()); true
      case (6, 2, r)  => pad = Some(str(r.readLenField())); true
      case (7, 2, r)  => act = Some(str(r.readLenField())); true
      case (8, 2, r)  => init = Some(str(r.readLenField())); true
      case (9, 5, r)  => w = Some(r.readFloat()); true
      case (10, 5, r) => b = Some(r.readFloat()); true
      case _ => false
    }
    def req(o: Option[Long], f: String) = o.getOrElse(
      throw new IllegalArgumentException(s"berry: Convolution2DParameter missing required $f"))
    Convolution2DParameter(req(nf, "num_filters"), req(kx, "kernel_size_x"),
      req(ky, "kernel_size_y"), sx, sy, pad, act, init, w, b)
  }
  private def decodePool(bytes: Array[Byte]): MaxPooling2DParameter = {
    var kx, ky, sx, sy: Option[Long] = None
    var pad: Option[String] = None
    fields(bytes) {
      case (1, 0, r) => kx = Some(r.readVarint()); true
      case (2, 0, r) => ky = Some(r.readVarint()); true
      case (3, 0, r) => sx = Some(r.readVarint()); true
      case (4, 0, r) => sy = Some(r.readVarint()); true
      case (5, 2, r) => pad = Some(str(r.readLenField())); true
      case _ => false
    }
    def req(o: Option[Long], f: String) = o.getOrElse(
      throw new IllegalArgumentException(s"berry: MaxPooling2DParameter missing required $f"))
    MaxPooling2DParameter(req(kx, "kernel_size_x"), req(ky, "kernel_size_y"), sx, sy, pad)
  }
  private def decodeDense(bytes: Array[Byte]): DenseParameter = {
    var units: Option[Long] = None
    var act, init: Option[String] = None
    var w, b: Option[Float] = None
    fields(bytes) {
      case (1, 0, r) => units = Some(r.readVarint()); true
      case (2, 2, r) => act = Some(str(r.readLenField())); true
      case (3, 2, r) => init = Some(str(r.readLenField())); true
      case (4, 5, r) => w = Some(r.readFloat()); true
      case (5, 5, r) => b = Some(r.readFloat()); true
      case _ => false
    }
    DenseParameter(units.getOrElse(
      throw new IllegalArgumentException("berry: DenseParameter missing required num_units")),
      act, init, w, b)
  }
  private def decodeDropout(bytes: Array[Byte]): DropoutParameter = {
    var kp: Option[Float] = None
    fields(bytes) {
      case (1, 5, r) => kp = Some(r.readFloat()); true
      case _ => false
    }
    DropoutParameter(kp)
  }

  /** Decode one LayerParameter message body. */
  def decodeLayer(bytes: Array[Byte]): LayerParameter = {
    var tpe: Option[String] = None
    val inputs = Seq.newBuilder[String]
    var name: Option[String] = None
    var data: Option[DataParameter] = None
    var conv: Option[Convolution2DParameter] = None
    var dense: Option[DenseParameter] = None
    var pool: Option[MaxPooling2DParameter] = None
    var drop: Option[DropoutParameter] = None
    fields(bytes) {
      case (1, 2, r)   => tpe = Some(str(r.readLenField())); true
      case (2, 2, r)   => inputs += str(r.readLenField()); true
      case (3, 2, r)   => name = Some(str(r.readLenField())); true
      case (100, 2, r) => data = Some(decodeData(r.readLenField())); true
      case (101, 2, r) => conv = Some(decodeConv(r.readLenField())); true
      case (102, 2, r) => dense = Some(decodeDense(r.readLenField())); true
      case (103, 2, r) => pool = Some(decodePool(r.readLenField())); true
      case (104, 2, r) => drop = Some(decodeDropout(r.readLenField())); true
      case _ => false
    }
    LayerParameter(tpe.getOrElse(
      throw new IllegalArgumentException("berry: LayerParameter missing required type")),
      inputs.result(), name, data, conv, dense, pool, drop)
  }

  /** Decode a length-delimited LayerParameter stream. */
  def decodeNetwork(bytes: Array[Byte]): Network = {
    val r = new Reader(bytes, 0, bytes.length)
    val layers = Seq.newBuilder[LayerParameter]
    while (r.hasMore) layers += decodeLayer(r.readLenField())
    Network(layers.result())
  }

  // ---- typed graph: validation + shape/parameter inference -----------------
  /** One validated layer with its inferred output shape and trainable
    * parameter count. */
  final case class InferredLayer(name: String, layerType: String,
                                 inputs: Seq[String], outputShape: Seq[Long],
                                 nParams: Long)

  private val knownTypes =
    Set("data", "convolution2d", "dense", "dropout", "maxpooling2d")

  /** Validate the network DAG and infer every layer's output shape and
    * parameter count, in topological order. Fails loudly on: unknown
    * layer type, a layer missing its type-specific parameter block,
    * duplicate names, unresolved inputs, cycles, a `data` layer WITH
    * inputs or a non-`data` layer WITHOUT inputs, and rank mismatches
    * (conv/pool need rank-3 input; kernels larger than the image under
    * `valid` padding). */
  def infer(n: Network): Seq[InferredLayer] = {
    val named = n.layers.zipWithIndex.map { case (l, i) =>
      (l.name.getOrElse(s"${l.layerType}_$i"), l)
    }
    val dupes = named.groupBy(_._1).filter(_._2.sizeIs > 1).keys
    if (dupes.nonEmpty)
      throw new IllegalArgumentException(s"berry: duplicate layer names: ${dupes.mkString(", ")}")
    val byName = named.toMap

    named.foreach { case (nm, l) =>
      if (!knownTypes.contains(l.layerType))
        throw new IllegalArgumentException(s"berry: layer $nm has unknown type '${l.layerType}'")
      if (l.layerType == "data" && l.input.nonEmpty)
        throw new IllegalArgumentException(s"berry: data layer $nm must not have inputs")
      if (l.layerType != "data" && l.input.isEmpty)
        throw new IllegalArgumentException(s"berry: layer $nm has no inputs")
      l.input.foreach { in =>
        if (!byName.contains(in))
          throw new IllegalArgumentException(s"berry: layer $nm input '$in' does not exist")
      }
    }

    // topological order with cycle detection (iterative DFS, WHITE/GRAY/BLACK)
    val color = scala.collection.mutable.Map(named.map(_._1 -> 0): _*)
    val order = Seq.newBuilder[String]
    def visit(start: String): Unit = {
      val stack = scala.collection.mutable.Stack((start, false))
      while (stack.nonEmpty) {
        val (nm, done) = stack.pop()
        if (done) { color(nm) = 2; order += nm }
        else if (color(nm) == 1)
          throw new IllegalArgumentException(s"berry: cycle through layer $nm")
        else if (color(nm) == 0) {
          color(nm) = 1
          stack.push((nm, true))
          byName(nm).input.foreach { in =>
            if (color(in) == 1) throw new IllegalArgumentException(s"berry: cycle through layer $in")
            if (color(in) == 0) stack.push((in, false))
          }
        }
      }
    }
    named.foreach { case (nm, _) => if (color(nm) == 0) visit(nm) }

    val shapes = scala.collection.mutable.Map.empty[String, Seq[Long]]
    val out = Seq.newBuilder[InferredLayer]

    def concatInputs(nm: String, ins: Seq[String]): Seq[Long] = {
      // multi-input: concatenate on the last axis (keras_mimo.py:45)
      val ss = ins.map(shapes)
      val lead = ss.head.dropRight(1)
      if (!ss.forall(_.dropRight(1) == lead))
        throw new IllegalArgumentException(
          s"berry: layer $nm concat inputs disagree on leading dims: ${ss.mkString(" vs ")}")
      lead :+ ss.map(_.last).sum
    }
    def positive(nm: String, what: String, v: Long): Long = {
      // uint32 wire values admit 0, which would div-by-zero the stride
      // arithmetic or declare an empty kernel/head silently
      if (v < 1) throw new IllegalArgumentException(s"berry: layer $nm $what must be >= 1, got $v")
      v
    }
    def spatial(nm: String, in: Long, k: Long, s: Long, pad: Option[String]): Long = {
      positive(nm, "kernel size", k); positive(nm, "stride", s)
      pad.map(_.toLowerCase) match {
        case Some("same") => (in + s - 1) / s
        case None | Some("valid") =>
          if (k > in) throw new IllegalArgumentException(
            s"berry: layer $nm kernel $k exceeds input extent $in under valid padding")
          (in - k) / s + 1
        case Some(other) =>
          throw new IllegalArgumentException(s"berry: layer $nm unknown padding '$other'")
      }
    }

    order.result().foreach { nm =>
      val l = byName(nm)
      def missing(block: String) = new IllegalArgumentException(
        s"berry: ${l.layerType} layer $nm missing $block")
      val (shape, params): (Seq[Long], Long) = l.layerType match {
        case "data" =>
          val p = l.dataParam.getOrElse(throw missing("data_param"))
          if (p.size.dim.isEmpty)
            throw new IllegalArgumentException(s"berry: data layer $nm has empty size")
          p.size.dim.foreach(positive(nm, "size dim", _)) // 0-extent data is degenerate
          (p.size.dim, 0L)
        case "convolution2d" =>
          val p = l.convolution2dParam.getOrElse(throw missing("convolution2d_param"))
          val in = concatInputs(nm, l.input)
          if (in.length != 3) throw new IllegalArgumentException(
            s"berry: conv layer $nm needs rank-3 input (h,w,c), got rank ${in.length}")
          val Seq(h, w, c) = in
          positive(nm, "num_filters", p.numFilters)
          val sx = p.strideX.getOrElse(1L); val sy = p.strideY.getOrElse(1L)
          val oh = spatial(nm, h, p.kernelSizeY, sy, p.pad)
          val ow = spatial(nm, w, p.kernelSizeX, sx, p.pad)
          (Seq(oh, ow, p.numFilters),
            p.kernelSizeX * p.kernelSizeY * c * p.numFilters + p.numFilters)
        case "maxpooling2d" =>
          val p = l.maxpooling2dParam.getOrElse(throw missing("maxpooling2d_param"))
          val in = concatInputs(nm, l.input)
          if (in.length != 3) throw new IllegalArgumentException(
            s"berry: pool layer $nm needs rank-3 input (h,w,c), got rank ${in.length}")
          val Seq(h, w, c) = in
          // Keras MaxPooling2D: stride defaults to the pool size
          val sx = p.strideX.getOrElse(p.kernelSizeX)
          val sy = p.strideY.getOrElse(p.kernelSizeY)
          (Seq(spatial(nm, h, p.kernelSizeY, sy, p.pad),
            spatial(nm, w, p.kernelSizeX, sx, p.pad), c), 0L)
        case "dense" =>
          val p = l.denseParam.getOrElse(throw missing("dense_param"))
          positive(nm, "num_units", p.numUnits)
          val in = concatInputs(nm, l.input)
          // Keras Dense maps the LAST axis; leading dims pass through
          (in.dropRight(1) :+ p.numUnits, in.last * p.numUnits + p.numUnits)
        case "dropout" =>
          val p = l.dropoutParam.getOrElse(DropoutParameter())
          val kp = p.keepProbOrDefault
          if (kp <= 0f || kp > 1f) throw new IllegalArgumentException(
            s"berry: dropout layer $nm keep_prob $kp outside (0, 1]")
          (concatInputs(nm, l.input), 0L)
      }
      shapes(nm) = shape
      out += InferredLayer(nm, l.layerType, l.input, shape, params)
    }
    out.result()
  }

  /** Total trainable parameters of a validated network. */
  def totalParams(n: Network): Long = infer(n).map(_.nParams).sum
}
