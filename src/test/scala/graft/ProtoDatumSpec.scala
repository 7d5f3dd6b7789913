package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ProtoDatum
import graft.functions.ProtoDatum._

/** Byte-level gate for the E1 Datum export: golden wire-format vectors
  * computed BY HAND from the public proto2 spec (varint keys, LE floats),
  * independent of the encoder under test, plus encode∘decode=id. */
class ProtoDatumSpec extends AnyFunSuite {

  private def hex(bs: Array[Byte]): String =
    bs.map(b => f"${b & 0xff}%02x").mkString

  test("numeric datum matches the hand-computed reference bytes") {
    // Datum{ numeric{ identifier="7" size{dim=1} data=[1.5f,-2.0f] }
    //        classs{ identifier="7" nlabel=3 } }   (serialize.py:296-315)
    //
    // numeric submsg:
    //   0a 01 37            field 1 (identifier) len 1 "7"
    //   12 02 08 01         field 2 (size): submsg {08 01} = dim 1
    //   1a 08 + 8 bytes     field 3 (data): 1.5f = 0000c03f LE,
    //                                      -2.0f = 000000c0 LE
    // class submsg:
    //   0a 01 37            field 1 (identifier)
    //   18 03               field 3 (nlabel) varint 3
    // datum:
    //   52 11 <numeric>     field 10, len 17
    //   6a 05 <class>       field 13, len 5
    val expected =
      "5211" + "0a0137" + "12020801" + "1a08" + "0000c03f" + "000000c0" +
      "6a05" + "0a0137" + "1803"
    assert(hex(numericDatum(7L, Seq(1.5f, -2.0f), Some(3L))) == expected)
  }

  test("unlabeled numeric datum omits the class message") {
    val expected = "520d" + "0a0131" + "12020801" + "1a04" + "0000803f" // 1.0f
    assert(hex(numericDatum(1L, Seq(1.0f), None)) == expected)
  }

  test("image datum matches the hand-computed reference bytes") {
    // Datum{ imgdata{ identifier="42" channels=3 height=1 width=1
    //                 data=[0.5f] } classs{ identifier="42" slabel="cat" } }
    // imgdata submsg:
    //   0a 02 34 32       identifier "42"
    //   10 03             channels 3
    //   18 01             height 1
    //   20 01             width 1
    //   2a 04 0000003f    data: 0.5f LE
    // class submsg:
    //   0a 02 34 32       identifier "42"
    //   12 03 63 61 74    slabel "cat"
    val expected =
      "5a10" + "0a023432" + "1003" + "1801" + "2001" + "2a04" + "0000003f" +
      "6a09" + "0a023432" + "1203636174"
    assert(hex(imageDatum(42L, 3, 1, 1, Seq(0.5f), Some("cat"))) == expected)
  }

  test("varint lengths >127 use the two-byte encoding") {
    val data = Seq.fill(64)(1.0f) // 256 data bytes -> len varint 0x80 0x02
    val bytes = numericDatum(123L, data, None)
    val d = decode(bytes)
    assert(d.numeric.get.data.length == 256)
    // data field header inside numeric: 1a <0x80 0x02>
    val s = hex(bytes)
    assert(s.contains("1a8002"))
  }

  test("encode then decode is the identity on the reference shapes") {
    val cases = Seq(
      Datum(numeric = Some(Numeric("9", Some(Size(1)), floatBytes(Seq(0f, -0f, Float.MinPositiveValue))))),
      Datum(numeric = Some(Numeric("10", Some(Size(1)), floatBytes(Seq(3.14f)))),
        classs = Some(ClassMsg("10", None, Some(0L)))),
      Datum(imgdata = Some(ImgData("11", Some(3), Some(2), Some(2),
          Some(floatBytes(Seq.tabulate(12)(_.toFloat))), Nil, Some(true))),
        classs = Some(ClassMsg("11", Some("dog"), None))),
      Datum(imgdata = Some(ImgData("12", None, None, None, None,
        Seq(1f, 2f, 3f), None))))
    cases.foreach { d =>
      val rt = decode(encode(d))
      // Array[Byte] equality is reference-based; compare via hex
      def norm(x: Datum): String = x.copy(
        numeric = x.numeric.map(n => n.copy(data = null)),
        imgdata = x.imgdata.map(i => i.copy(data = None))).toString +
        x.numeric.map(n => hex(n.data)).getOrElse("") +
        x.imgdata.flatMap(_.data).map(hex).getOrElse("")
      assert(norm(rt) == norm(d))
    }
  }

  test("float bytes match numpy float32 tobytes") {
    // numpy: np.asarray([1.5, -2.0], dtype='float32').tobytes().hex()
    //        = '0000c03f000000c0' (little-endian IEEE754)
    assert(hex(floatBytes(Seq(1.5f, -2.0f))) == "0000c03f000000c0")
  }
}
