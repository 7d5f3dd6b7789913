package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Berry
import graft.functions.Berry._

/** B1 gate: the berry.proto layer DSL (`/root/reference/berry.proto`).
  * Golden wire vectors hand-computed from the public proto2 spec
  * (independent of the encoder under test), encode∘decode=id, proto2
  * decode rules (unknown-field skip, packed-repeated acceptance,
  * missing-required loud failure), and the typed graph layer:
  * validation errors + Keras-convention shape/param inference. */
class BerrySpec extends AnyFunSuite {

  private def hex(bs: Array[Byte]): String = bs.map(b => f"${b & 0xff}%02x").mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // ---- golden wire vectors -------------------------------------------------
  // data layer: type="data" name="img" data_param.size.dim=[224,224,3]
  //   0a 04 "data"                    field 1 type
  //   1a 03 "img"                     field 3 name
  //   a2 06 0a                        field 100 ((100<<3)|2 = 802 = varint a2 06), len 10
  //     0a 08                         DataParameter field 1 (size), len 8
  //       08 e0 01 08 e0 01 08 03     Size.dim unpacked: 224, 224, 3
  private val goldenData = "0a04646174611a03696d67a2060a0a0808e00108e0010803"

  // conv layer: type="convolution2d" input=["img"] name="c1"
  //   conv{num_filters=8 kx=3 ky=3 pad="same" activation="relu" W_stddev=0.1f}
  //   aa 06 = field 101; 4d = field 9 wire 5; cdcccc3d = 0.1f LE
  private val goldenConv =
    "0a0d636f6e766f6c7574696f6e32641203696d671a026331" +
      "aa0617080810031803320473616d653a0472656c754dcdcccc3d"

  // dropout layer with an EMPTY param block (keep_prob defaults to 0.5)
  //   c2 06 = field 104; len 0
  private val goldenDropout = "0a0764726f706f7574120263311a026472c20600"

  test("data layer encodes to the hand-computed bytes and round-trips") {
    val l = LayerParameter("data", name = Some("img"),
      dataParam = Some(DataParameter(Size(Seq(224L, 224L, 3L)))))
    assert(hex(Berry.encodeLayer(l)) == goldenData)
    assert(Berry.decodeLayer(unhex(goldenData)) == l)
  }

  test("conv layer encodes to the hand-computed bytes and round-trips") {
    val l = LayerParameter("convolution2d", input = Seq("img"), name = Some("c1"),
      convolution2dParam = Some(Convolution2DParameter(8, 3, 3,
        pad = Some("same"), activation = Some("relu"), wStddev = Some(0.1f))))
    assert(hex(Berry.encodeLayer(l)) == goldenConv)
    assert(Berry.decodeLayer(unhex(goldenConv)) == l)
  }

  test("dropout layer with empty param block round-trips; keep_prob default 0.5") {
    val l = LayerParameter("dropout", input = Seq("c1"), name = Some("dr"),
      dropoutParam = Some(DropoutParameter()))
    assert(hex(Berry.encodeLayer(l)) == goldenDropout)
    val dec = Berry.decodeLayer(unhex(goldenDropout))
    assert(dec == l)
    assert(dec.dropoutParam.get.keepProbOrDefault == 0.5f)
  }

  test("network stream: length-delimited concatenation round-trips") {
    val net = Network(Seq(
      LayerParameter("data", name = Some("img"),
        dataParam = Some(DataParameter(Size(Seq(224L, 224L, 3L))))),
      LayerParameter("convolution2d", input = Seq("img"), name = Some("c1"),
        convolution2dParam = Some(Convolution2DParameter(8, 3, 3,
          pad = Some("same"), activation = Some("relu"), wStddev = Some(0.1f)))),
      LayerParameter("dropout", input = Seq("c1"), name = Some("dr"),
        dropoutParam = Some(DropoutParameter()))))
    val bytes = Berry.encodeNetwork(net)
    assert(hex(bytes) ==
      "18" + goldenData + "32" + goldenConv + "14" + goldenDropout)
    assert(Berry.decodeNetwork(bytes) == net)
  }

  test("full-field round-trip: every optional present on every layer type") {
    val net = Network(Seq(
      LayerParameter("data", name = Some("in"),
        dataParam = Some(DataParameter(Size(Seq(28L, 28L, 1L))))),
      LayerParameter("convolution2d", Seq("in"), Some("conv"),
        convolution2dParam = Some(Convolution2DParameter(16, 5, 5, Some(2L), Some(2L),
          Some("valid"), Some("relu"), Some("gaussian"), Some(0.05f), Some(0.1f)))),
      LayerParameter("maxpooling2d", Seq("conv"), Some("pool"),
        maxpooling2dParam = Some(MaxPooling2DParameter(2, 2, Some(2L), Some(2L), Some("valid")))),
      LayerParameter("dense", Seq("pool"), Some("fc"),
        denseParam = Some(DenseParameter(10, Some("sigmoid"), Some("uniform"), Some(0.01f), Some(0f)))),
      LayerParameter("dropout", Seq("fc"), Some("drop"),
        dropoutParam = Some(DropoutParameter(Some(0.8f))))))
    assert(Berry.decodeNetwork(Berry.encodeNetwork(net)) == net)
  }

  // ---- proto2 decode rules --------------------------------------------------
  test("unknown fields are skipped (forward compatibility)") {
    // golden data layer + unknown field 50 varint (90 03 = tag (50<<3)|0, value 7)
    //                   + unknown field 51 len-delim (9a 03 02 ff ff)
    val withUnknown = unhex(goldenData + "900307" + "9a0302ffff")
    val dec = Berry.decodeLayer(withUnknown)
    assert(dec.layerType == "data" && dec.dataParam.get.size.dim == Seq(224L, 224L, 3L))
  }

  test("packed repeated Size.dim is accepted on read") {
    // packed payload of [224,224,3] is e0 01 e0 01 03 (5 bytes), carried
    // as field 1 wire 2: header 0a 05
    val packedSize = "0a05" + "e001e00103"
    val dataParam = "0a07" + packedSize // field 1, len 7
    val layer = "0a0464617461" + "a20609" + dataParam
    val dec = Berry.decodeLayer(unhex(layer))
    assert(dec.dataParam.get.size.dim == Seq(224L, 224L, 3L))
  }

  test("missing required fields fail loudly") {
    // LayerParameter with no type
    val noType = intercept[IllegalArgumentException] {
      Berry.decodeLayer(unhex("1a03696d67"))
    }
    assert(noType.getMessage.contains("missing required type"))
    // Convolution2DParameter missing kernel_size_y: conv block with only fields 1,2
    val e = intercept[IllegalArgumentException] {
      Berry.decodeLayer(unhex("0a0d636f6e766f6c7574696f6e3264" + "aa0604" + "08081003"))
    }
    assert(e.getMessage.contains("kernel_size_y"))
  }

  test("truncated payloads fail loudly, never over-read") {
    val full = unhex(goldenConv)
    for (cut <- Seq(1, 5, full.length / 2, full.length - 1)) {
      intercept[IllegalArgumentException] {
        Berry.decodeLayer(java.util.Arrays.copyOfRange(full, 0, cut))
      }
    }
  }

  test("zero data dims are rejected; truncating field numbers cannot fabricate fields") {
    intercept[IllegalArgumentException] {
      Berry.infer(Network(Seq(LayerParameter("data", name = Some("d"),
        dataParam = Some(DataParameter(Size(Seq(0L, 4L, 3L))))))))
    }
    // tag varint ((2^32+1)<<3)|2 = 34359738378: without the field-range
    // check it truncates through toInt to field 1 wire 2 and the
    // following bytes are ACCEPTED as the required type string
    val buf = {
      val out = new java.io.ByteArrayOutputStream()
      var v = 34359738378L
      while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
      out.write(4); out.write('f'); out.write('a'); out.write('k'); out.write('e')
      out.toByteArray
    }
    val e = intercept[IllegalArgumentException] { Berry.decodeLayer(buf) }
    assert(e.getMessage.contains("invalid field number"))
    // field 0 is equally illegal in proto2
    intercept[IllegalArgumentException] { Berry.decodeLayer(unhex("020461626364")) }
  }

  test("hostile length varints fail loudly (overflow-proof bounds)") {
    // field 1 (type) with declared length 2^31 - 5: pos + n would
    // overflow a naive sum check
    intercept[IllegalArgumentException] {
      Berry.decodeLayer(unhex("0a" + "fbffffff07"))
    }
    // declared length 2^32 + 4: toInt truncation must not silently
    // re-frame it as a 4-byte field
    intercept[IllegalArgumentException] {
      Berry.decodeLayer(unhex("0a" + "8480808010" + "64617461"))
    }
  }

  // ---- typed graph: inference ------------------------------------------------
  private def conv(in: String, nm: String, filters: Long, k: Long,
                   pad: Option[String] = None, stride: Option[Long] = None) =
    LayerParameter("convolution2d", Seq(in), Some(nm),
      convolution2dParam = Some(Convolution2DParameter(filters, k, k,
        strideX = stride, strideY = stride, pad = pad)))

  test("shape inference: data → conv(same) → pool → conv(valid) → dense") {
    val net = Network(Seq(
      LayerParameter("data", name = Some("img"),
        dataParam = Some(DataParameter(Size(Seq(28L, 28L, 3L))))),
      conv("img", "c1", 8, 3, pad = Some("same")),
      LayerParameter("maxpooling2d", Seq("c1"), Some("p1"),
        maxpooling2dParam = Some(MaxPooling2DParameter(2, 2))), // stride defaults to pool size
      conv("p1", "c2", 16, 3), // valid: (14-3)/1+1 = 12
      LayerParameter("dense", Seq("c2"), Some("fc"),
        denseParam = Some(DenseParameter(10)))))
    val inf = Berry.infer(net).map(l => l.name -> l).toMap
    assert(inf("img").outputShape == Seq(28L, 28L, 3L))
    assert(inf("c1").outputShape == Seq(28L, 28L, 8L))
    assert(inf("c1").nParams == 3L * 3 * 3 * 8 + 8)
    assert(inf("p1").outputShape == Seq(14L, 14L, 8L))
    assert(inf("p1").nParams == 0L)
    assert(inf("c2").outputShape == Seq(12L, 12L, 16L))
    assert(inf("c2").nParams == 3L * 3 * 8 * 16 + 16)
    // Keras Dense maps the last axis; leading dims pass through
    assert(inf("fc").outputShape == Seq(12L, 12L, 10L))
    assert(inf("fc").nParams == 16L * 10 + 10)
    assert(Berry.totalParams(net) ==
      inf.values.map(_.nParams).sum)
  }

  test("strided conv with same padding: ceil division") {
    val net = Network(Seq(
      LayerParameter("data", name = Some("img"),
        dataParam = Some(DataParameter(Size(Seq(7L, 7L, 1L))))),
      conv("img", "c", 4, 3, pad = Some("same"), stride = Some(2L))))
    assert(Berry.infer(net).last.outputShape == Seq(4L, 4L, 4L)) // ceil(7/2)=4
  }

  test("multi-input layers concatenate on the last axis (keras_mimo.py:45)") {
    val net = Network(Seq(
      LayerParameter("data", name = Some("a"),
        dataParam = Some(DataParameter(Size(Seq(8L, 8L, 3L))))),
      LayerParameter("data", name = Some("b"),
        dataParam = Some(DataParameter(Size(Seq(8L, 8L, 5L))))),
      conv("a", "unused", 2, 1), // keep a single-input layer in the mix
      LayerParameter("dense", Seq("a", "b"), Some("fc"),
        denseParam = Some(DenseParameter(7)))))
    val inf = Berry.infer(net).map(l => l.name -> l).toMap
    assert(inf("fc").outputShape == Seq(8L, 8L, 7L))
    assert(inf("fc").nParams == 8L * 7 + 7) // concat c-dim 3+5=8
  }

  test("validation failures are loud and specific") {
    def data(nm: String) = LayerParameter("data", name = Some(nm),
      dataParam = Some(DataParameter(Size(Seq(4L, 4L, 1L)))))
    // unknown type
    assert(intercept[IllegalArgumentException] {
      Berry.infer(Network(Seq(data("d"), LayerParameter("flatten", Seq("d"), Some("f")))))
    }.getMessage.contains("unknown type"))
    // unresolved input
    assert(intercept[IllegalArgumentException] {
      Berry.infer(Network(Seq(data("d"), conv("ghost", "c", 2, 1))))
    }.getMessage.contains("does not exist"))
    // duplicate names
    assert(intercept[IllegalArgumentException] {
      Berry.infer(Network(Seq(data("d"), data("d"))))
    }.getMessage.contains("duplicate"))
    // cycle
    assert(intercept[IllegalArgumentException] {
      Berry.infer(Network(Seq(
        LayerParameter("dense", Seq("b"), Some("a"),
          denseParam = Some(DenseParameter(2))),
        LayerParameter("dense", Seq("a"), Some("b"),
          denseParam = Some(DenseParameter(2))))))
    }.getMessage.contains("cycle"))
    // data layer with inputs
    assert(intercept[IllegalArgumentException] {
      Berry.infer(Network(Seq(data("d"),
        LayerParameter("data", Seq("d"), Some("d2"),
          dataParam = Some(DataParameter(Size(Seq(1L))))))))
    }.getMessage.contains("must not have inputs"))
    // non-data layer without inputs
    assert(intercept[IllegalArgumentException] {
      Berry.infer(Network(Seq(LayerParameter("dense", Nil, Some("fc"),
        denseParam = Some(DenseParameter(2))))))
    }.getMessage.contains("no inputs"))
    // missing param block
    assert(intercept[IllegalArgumentException] {
      Berry.infer(Network(Seq(data("d"),
        LayerParameter("convolution2d", Seq("d"), Some("c")))))
    }.getMessage.contains("missing convolution2d_param"))
    // kernel larger than image under valid padding
    assert(intercept[IllegalArgumentException] {
      Berry.infer(Network(Seq(data("d"), conv("d", "c", 2, 9))))
    }.getMessage.contains("exceeds input extent"))
    // conv on non-rank-3 input
    assert(intercept[IllegalArgumentException] {
      Berry.infer(Network(Seq(
        LayerParameter("data", name = Some("v"),
          dataParam = Some(DataParameter(Size(Seq(16L))))),
        conv("v", "c", 2, 1))))
    }.getMessage.contains("rank-3"))
    // dropout keep_prob outside (0,1]
    assert(intercept[IllegalArgumentException] {
      Berry.infer(Network(Seq(data("d"),
        LayerParameter("dropout", Seq("d"), Some("dr"),
          dropoutParam = Some(DropoutParameter(Some(0f)))))))
    }.getMessage.contains("keep_prob"))
    // zero stride (encodable as uint32) must not div-by-zero
    assert(intercept[IllegalArgumentException] {
      Berry.infer(Network(Seq(data("d"), conv("d", "c", 2, 1, stride = Some(0L)))))
    }.getMessage.contains("stride"))
    // zero filters / units / kernel are loud domain errors
    assert(intercept[IllegalArgumentException] {
      Berry.infer(Network(Seq(data("d"), conv("d", "c", 0, 1))))
    }.getMessage.contains("num_filters"))
    assert(intercept[IllegalArgumentException] {
      Berry.infer(Network(Seq(data("d"),
        LayerParameter("dense", Seq("d"), Some("fc"),
          denseParam = Some(DenseParameter(0))))))
    }.getMessage.contains("num_units"))
    assert(intercept[IllegalArgumentException] {
      Berry.infer(Network(Seq(data("d"), conv("d", "c", 2, 0))))
    }.getMessage.contains("kernel size"))
  }

  test("declaration order need not be topological; inference follows the DAG") {
    val net = Network(Seq(
      LayerParameter("dense", Seq("d"), Some("fc"),
        denseParam = Some(DenseParameter(3))),
      LayerParameter("data", name = Some("d"),
        dataParam = Some(DataParameter(Size(Seq(5L)))))))
    val inf = Berry.infer(net)
    assert(inf.map(_.name) == Seq("d", "fc"))
    assert(inf.last.outputShape == Seq(3L))
  }
}
