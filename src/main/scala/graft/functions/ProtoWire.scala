package graft.functions

import java.io.ByteArrayOutputStream

/** Shared proto2 WIRE-WRITER primitives (PUBLIC protobuf wire format:
  * varint keys `(field<<3)|wire`, length-delimited submessages,
  * little-endian fixed32 floats) — the one byte-level layer both
  * hand-rolled codecs ([[ProtoDatum]], [[Berry]]) must agree on, so a
  * hardening or bug fix here lands exactly once.
  *
  * The READERS deliberately stay per-codec: ProtoDatum's is slice-based
  * (zero-copy over LMDB-migration payloads) and fails with its
  * contract-named `MalformedDatumException`; Berry's is copy-based over
  * small config messages and fails with `IllegalArgumentException`.
  * Both are independently spec-hardened (alias-proof field numbers,
  * overflow-proof lengths, truncation checks); unifying them would
  * rewrite two working, differently-shaped read paths for symmetry.
  */
private[functions] object ProtoWire {

  def tag(field: Int, wire: Int): Int = (field << 3) | wire

  def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  def writeLen(out: ByteArrayOutputStream, field: Int, bytes: Array[Byte]): Unit = {
    writeVarint(out, tag(field, 2)); writeVarint(out, bytes.length); out.write(bytes)
  }

  def writeString(out: ByteArrayOutputStream, field: Int, s: String): Unit =
    writeLen(out, field, s.getBytes("UTF-8"))

  def writeVarintField(out: ByteArrayOutputStream, field: Int, v: Long): Unit = {
    writeVarint(out, tag(field, 0)); writeVarint(out, v)
  }

  def writeFloatField(out: ByteArrayOutputStream, field: Int, f: Float): Unit = {
    writeVarint(out, tag(field, 5))
    val bits = java.lang.Float.floatToIntBits(f)
    out.write(bits & 0xff); out.write((bits >> 8) & 0xff)
    out.write((bits >> 16) & 0xff); out.write((bits >> 24) & 0xff)
  }
}
