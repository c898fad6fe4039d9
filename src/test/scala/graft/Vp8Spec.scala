package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Vp8Codec

/** Lossy WebP (VP8 key frame) decoder: luma output verified
  * byte-exact against libwebp's own Y plane on goldens the REFERENCE
  * encoder produced (tools/gen_vp8_goldens.py — default config, so
  * segmentation, coefficient-probability updates and the normal loop
  * filter are all on the verified path), plus the hostile-input
  * posture. */
class Vp8Spec extends AnyFunSuite {

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
    new String(resource("manifest_lossy.txt"), "UTF-8").linesIterator
      .filter(_.nonEmpty).map { l =>
        val p = l.split(" "); (p(0), p(1).toInt, p(2).toInt)
      }.toSeq

  test("decodes every libwebp lossy golden luma-exactly") {
    assert(goldens.size >= 12, "lossy golden corpus went missing")
    goldens.foreach { case (name, w, h) =>
      val got = Vp8Codec.decodeLuma(resource(s"$name.webp"))
      assert(got.isDefined, s"$name must decode")
      val (dw, dh, y) = got.get
      assert((dw, dh) === (w, h), name)
      val exp = resource(s"$name.y")
      assert(exp.length === w * h, s"$name golden luma size")
      val diffs = (0 until w * h).iterator
        .filter(i => y(i) != exp(i)).take(5).toList
      val n = (0 until w * h).count(i => y(i) != exp(i))
      assert(diffs.isEmpty, s"$name: $n/${w * h} bytes differ, first at " +
        diffs.map(i => s"(${i % w},${i / w}) got=${y(i) & 0xff} exp=${exp(i) & 0xff}")
          .mkString(", "))
    }
  }

  test("lossy fixture population: planted twins at Hamming 0, background floor wide") {
    // the committed corpus behind multimodal_dedup_webp_lossy: 20
    // bases + 10 requantized twins; the oracle's frozen pairs assume
    // planted Hamming 0 and a background floor far above the <=4 gate
    def fixture(i: Int): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/vp8fixtures/f$i.webp")
      assert(in != null, s"missing fixture f$i.webp")
      try in.readAllBytes() finally in.close()
    }
    val hashes = (0 until 30).map { i =>
      val (w, h, y) = Vp8Codec.decodeLuma(fixture(i)).get
      i -> graft.operators.Multimodal.dHash64Luma(y, w, h)
    }.toMap
    (0 until 10).foreach { i =>
      assert(java.lang.Long.bitCount(hashes(i) ^ hashes(i + 20)) === 0,
        s"planted twin $i/$i+20 must survive requantization at Hamming 0")
    }
    val background = for {
      a <- 0 until 30; b <- (a + 1) until 30 if b != a + 20 || a >= 10
    } yield java.lang.Long.bitCount(hashes(a) ^ hashes(b))
    assert(background.min >= 15,
      s"background floor collapsed: min Hamming ${background.min}")
  }

  test("webm fixture population: EBML walk + VP8 decode, planted twins at Hamming 0, floor wide") {
    import graft.operators.{Multimodal, WebmCodec}
    // the committed corpus behind multimodal_dedup_webm: 10 bases,
    // 10 q55 requants, 5 fps-2x duplications; the oracle's frozen
    // pairs assume tHash Hamming 0 and a background floor (measured
    // 23 at generation) far above the <=4 gate
    def fixture(i: Int): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/webmfixtures/c$i.webm")
      assert(in != null, s"missing fixture c$i.webm")
      try in.readAllBytes() finally in.close()
    }
    val hashes = (0 until 25).map { i =>
      val (w, h, frames) = WebmCodec.keyFrames(fixture(i)).get
      assert(w === 64 && h === 64)
      assert(frames.length === (if (i >= 20) 130 else 65),
        s"clip $i frame count")
      val lumas = frames.map { f =>
        val (fw, fh, y) = Vp8Codec.decodeFrameLuma(f).get
        assert(fw === w && fh === h)
        y
      }
      i -> Multimodal.tHash64(lumas)
    }.toMap
    val planted = (0 until 10).map(i => (i, i + 10)) ++
      (0 until 5).flatMap(i => Seq((i, i + 20), (i + 10, i + 20)))
    planted.foreach { case (a, b) =>
      assert(java.lang.Long.bitCount(hashes(a) ^ hashes(b)) === 0,
        s"planted twin $a/$b must survive at Hamming 0")
    }
    val plantedSet = planted.map { case (a, b) => (a.min(b), a.max(b)) }.toSet
    val background = for {
      a <- 0 until 25; b <- (a + 1) until 25 if !plantedSet((a, b))
    } yield java.lang.Long.bitCount(hashes(a) ^ hashes(b))
    assert(background.min >= 15,
      s"background floor collapsed: min Hamming ${background.min}")
  }

  test("webm hostile input: truncation, lacing, bad sizes, garbage — reject, never throw") {
    import graft.operators.WebmCodec
    def fixture(i: Int): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/webmfixtures/c$i.webm")
      try in.readAllBytes() finally in.close()
    }
    val good = fixture(0)
    assert(WebmCodec.keyFrames(good).isDefined)
    // truncation at every 97th byte: parse must reject, never throw
    var cut = 4
    while (cut < good.length - 1) {
      assert(WebmCodec.keyFrames(java.util.Arrays.copyOf(good, cut)).isEmpty,
        s"truncation at $cut must reject")
      cut += 97
    }
    // garbage and non-EBML magic
    assert(WebmCodec.keyFrames(Array[Byte]()).isEmpty)
    assert(WebmCodec.keyFrames(Array.fill[Byte](64)(0x5A)).isEmpty)
    // flip the lacing bits on the first SimpleBlock: laced video must
    // reject rather than hash a subset of frames. The first block's
    // flags byte follows the block header: find the first SimpleBlock
    // id byte 0xA3 whose frame payload parses today, then set 0x06.
    val laced = good.clone()
    var i = 4 // the EBML magic itself ends in 0xA3 — scan past it
    var done = false
    while (i < laced.length && !done) {
      if ((laced(i) & 0xff) == 0xA3) {
        // id(1) + size varint; flags sits 3 bytes into the payload
        val sizeLen = Integer.numberOfLeadingZeros(laced(i + 1) & 0xff) - 23
        val flagsAt = i + 1 + sizeLen + 3
        if (flagsAt < laced.length) {
          laced(flagsAt) = (laced(flagsAt) | 0x06).toByte
          done = true
        }
      }
      i += 1
    }
    assert(done, "fixture must contain a SimpleBlock")
    assert(WebmCodec.keyFrames(laced).isEmpty, "laced video must reject")
  }

  test("hostile input: truncation, corruption, lossless files, garbage — reject, never throw") {
    val good = resource("vp8_blobs.webp")
    assert(Vp8Codec.decodeLuma(good).isDefined)
    // every truncation point must reject cleanly or decode (partition
    // zero-padding is spec behavior for the last bytes, so very-late
    // truncations may still reconstruct) — never throw
    (0 until good.length by 7).foreach { k =>
      Vp8Codec.decodeLuma(good.take(k)) // must not throw
    }
    // flip each header byte: reject-or-decode, never throw
    (0 until math.min(good.length, 64)).foreach { i =>
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x55).toByte
      Vp8Codec.decodeLuma(bad)
    }
    // a LOSSLESS file has no VP8 chunk
    assert(Vp8Codec.decodeLuma(resource("col.webp")).isEmpty)
    assert(Vp8Codec.decodeLuma(Array.fill(100)(0x42.toByte)).isEmpty)
    assert(Vp8Codec.decodeLuma(Array.empty[Byte]).isEmpty)
  }
}
