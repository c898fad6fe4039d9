package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: binary payloads survive the pipeline, the
  * decode stub is deterministic, and byte lengths line up with the
  * source text. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("pack produces binary media with correct byte counts") {
    val ds = Multimodal.pack(spark, SparkSpec.sfTiny)
    val rows = ds.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.media.length.toLong == r.n_bytes))
    assert(rows.forall(_.mime == "text/plain"))
    // payload round-trips to the original text
    val docs = Tables.load(spark, SparkSpec.sfTiny, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(rows.forall(r => new String(r.media, "UTF-8") == docs(r.doc_id)))
  }

  test("decodeStub is deterministic and bounded") {
    val ds = Multimodal.pack(spark, SparkSpec.sfTiny)
    val a = Multimodal.decodeStub(ds).orderBy("doc_id").collect().toSeq
    val b = Multimodal.decodeStub(ds.repartition(7)).orderBy("doc_id").collect().toSeq
    assert(a === b, "decode must not depend on partitioning")
    assert(a.forall(f => f.width >= 64 && f.width < 576 && f.height >= 64 && f.height < 576))
  }

  test("BMP and WAV payloads decode their real headers through the seam") {
    import java.nio.{ByteBuffer, ByteOrder}
    // hand-built 5×3 24-bit BMP (header + empty pixel rows)
    def bmp(w: Int, h: Int): Array[Byte] = {
      val rowSize = ((w * 3 + 3) / 4) * 4
      val size = 54 + rowSize * h
      val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      b.array()
    }
    // 8 kHz mono 16-bit PCM WAV with n sample frames
    def wav(rate: Int, channels: Int, nFrames: Int): Array[Byte] = {
      val block = channels * 2
      val dataLen = nFrames * block
      val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels.toShort)
      b.putInt(rate).putInt(rate * block).putShort(block.toShort).putShort(16)
      b.put("data".getBytes).putInt(dataLen)
      b.array()
    }
    val records = Seq(
      Multimodal.MediaRecord(1L, bmp(5, 3), "image/bmp", "xx", 0L),
      Multimodal.MediaRecord(2L, wav(8000, 1, 120), "audio/wav", "xx", 0L),
      Multimodal.MediaRecord(3L, "not media".getBytes, "text/plain", "xx", 0L),
      Multimodal.MediaRecord(4L, "junk".getBytes, "image/bmp", "xx", 0L) // malformed → stub
    ).toDS()
    val out = Multimodal.decodeStub(records).collect().map(f => f.doc_id -> f).toMap
    assert((out(1L).width, out(1L).height, out(1L).n_frames) === ((5, 3, 1)))
    assert((out(2L).width, out(2L).height, out(2L).n_frames) === ((8000, 1, 120)))
    assert(out(3L).width >= 64 && out(3L).width < 576) // stub branch
    assert(out(4L).width >= 64 && out(4L).width < 576) // graceful fallback
  }

  test("PNG IHDR decodes dimensions and channel count; corrupt headers reject") {
    import java.nio.ByteBuffer
    def png(w: Int, h: Int, colorType: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(33) // big-endian by default
      b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      b.putInt(13).put("IHDR".getBytes)
      b.putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      b.array()
    }
    val d = Multimodal.MediaDecoder
    assert(d.decodePng(png(640, 480, 2)) === Some((640, 480, 3)), "RGB")
    assert(d.decodePng(png(32, 16, 6)) === Some((32, 16, 4)), "RGBA")
    assert(d.decodePng(png(7, 9, 0)) === Some((7, 9, 1)), "grayscale")
    assert(d.decodePng(png(-1, 4, 2)) === None, "negative width is invalid")
    assert(d.decodePng(png(4, 4, 9)) === None, "unknown color type")
    assert(d.decodePng("PNG but not really".getBytes) === None)
    // through the decode seam
    val out = Multimodal.decodeStub(
      Seq(Multimodal.MediaRecord(9L, png(100, 50, 6), "image/png", "xx", 0L)).toDS())
      .collect().head
    assert((out.width, out.height, out.n_frames) === ((100, 50, 4)))
  }

  test("decodeWav survives hostile RIFF chunk sizes without looping or throwing") {
    import java.nio.{ByteBuffer, ByteOrder}
    def riff(chunkSize: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(56).put("WAVE".getBytes)
      b.put("junk".getBytes).putInt(chunkSize) // hostile declared size
      b.array()
    }
    // sz = -8 / -9 made the old walk advance by 0 (infinite loop); huge
    // or negative sizes must neither spin nor throw AIOOBE — just None.
    for (sz <- Seq(-8, -9, -1, Int.MinValue, Int.MaxValue, Int.MaxValue - 7)) {
      assert(Multimodal.MediaDecoder.decodeWav(riff(sz)) === None, s"sz=$sz")
    }
    // a truncated data chunk (declared longer than the buffer) still
    // yields the already-parsed fmt/data fields — streamed WAVs do this
    def truncated(): Array[Byte] = {
      val b = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(1000).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(2)
      b.putInt(44100).putInt(44100 * 4).putShort(4).putShort(16)
      b.put("data".getBytes).putInt(400) // overruns the 44-byte buffer
      b.array()
    }
    assert(Multimodal.MediaDecoder.decodeWav(truncated()) === Some((44100, 2, 100)))
  }

  test("multimodal_decode_real runs all four real decoder branches with exact dims") {
    val out = Multimodal.multimodalDecodeReal(spark, SparkSpec.sfTiny)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out.nonEmpty)
    // every decoded row matches the generator's closed-form dims
    out.foreach { case (id, (w, h, frames)) =>
      val expected = (id % 4) match {
        case 0 => (8 + (id % 32).toInt, 8 + ((id / 32) % 32).toInt, 1)
        case 1 => (16 + (id % 64).toInt, 16 + ((id / 64) % 64).toInt,
          Seq(1, 3, 4)(((id / 3) % 3).toInt)) // PNG third field = channels
        case 2 => (8000 + (id % 8).toInt * 1000, 1 + (id % 2).toInt, 1 + (id % 50).toInt)
        case _ => (12 + (id % 48).toInt, 12 + ((id / 48) % 48).toInt,
          if ((id / 4) % 2 == 0) 1 else 3) // JPEG third field = components
      }
      assert((w, h, frames) === expected, s"doc $id")
    }
    // all four mimes (hence all four REAL parser branches) occur
    assert(out.keys.map(_ % 4).toSet === Set(0L, 1L, 2L, 3L))
  }

  test("JPEG decoder: SOF walk, gray and color, hostile segment lengths") {
    import Multimodal.{MediaDecoder, MediaEncoder}
    assert(MediaDecoder.decodeJpeg(MediaEncoder.jpeg(640, 480, 3)) === Some((640, 480, 3)))
    assert(MediaDecoder.decodeJpeg(MediaEncoder.jpeg(17, 23, 1)) === Some((17, 23, 1)))
    // not a JPEG
    assert(MediaDecoder.decodeJpeg(Array[Byte](0, 1, 2, 3)) === None)
    // truncated after SOI
    assert(MediaDecoder.decodeJpeg(Array(0xff, 0xd8).map(_.toByte)) === None)
    // hostile: APP0 length 0 would loop forever without the strict-advance guard
    val zeroLen = Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x00, 0xff, 0xc0).map(_.toByte)
    assert(MediaDecoder.decodeJpeg(zeroLen) === None)
    // hostile: segment length pointing past the buffer
    val overrun = Array(0xff, 0xd8, 0xff, 0xe0, 0x7f, 0xff).map(_.toByte)
    assert(MediaDecoder.decodeJpeg(overrun) === None)
    // DHT (C4) must be skipped, not treated as a frame header
    val dhtFirst = {
      val sof = MediaEncoder.jpeg(32, 16, 1).drop(2) // strip SOI, keep APP0+SOF
      Array(0xff, 0xd8, 0xff, 0xc4, 0x00, 0x04, 0x00, 0x00).map(_.toByte) ++ sof
    }
    assert(MediaDecoder.decodeJpeg(dhtFirst) === Some((32, 16, 1)))
  }

  test("BMP pixel round-trip: decode(encode(px)) is identity across padded and unpadded widths") {
    // w=9 forces 1-byte row padding, w=8 none — both must survive
    for (w <- Seq(8, 9, 10, 11); h <- Seq(3, 5)) {
      val px = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
      val bytes = Multimodal.MediaTransform.encodeBmp(px, w, h)
      val Some((dw, dh, out)) = Multimodal.MediaTransform.bmpPixels(bytes)
      assert((dw, dh) === ((w, h)))
      assert(out.toSeq === px.toSeq, s"round-trip at ${w}x$h")
    }
  }

  test("nearest-neighbor resize: identity at same size, exact corner sampling when shrinking") {
    val w = 16; val h = 8
    val px = Array.tabulate(w * h * 3)(i => (i % 256).toByte)
    assert(Multimodal.MediaTransform.resizeNearest(px, w, h, w, h).toSeq === px.toSeq)
    val small = Multimodal.MediaTransform.resizeNearest(px, w, h, 4, 2)
    // output (x,y) samples source (x*16/4, y*8/2) = (4x, 4y)
    for (y <- 0 until 2; x <- 0 until 4; c <- 0 until 3)
      assert(small((y * 4 + x) * 3 + c) === px(((4 * y) * w + 4 * x) * 3 + c))
  }

  test("gradient BMP: corrupt/truncated inputs reject instead of throwing") {
    val good = Multimodal.MediaTransform.bmpGradient(10, 6, 42L)
    assert(Multimodal.MediaTransform.bmpPixels(good).isDefined)
    assert(Multimodal.MediaTransform.bmpPixels(good.take(30)).isEmpty)
    val notBmp = good.clone(); notBmp(0) = 'X'.toByte
    assert(Multimodal.MediaTransform.bmpPixels(notBmp).isEmpty)
  }

  test("WAV frame-sample keeps interleaved channel pairs intact; truncated data rejects") {
    // stereo, 6 frames: samples (f*10 + c) — decimate k=2 keeps frames 0,2,4
    val samples = Array.tabulate(12)(i => ((i / 2) * 10 + i % 2).toShort)
    val dec = Multimodal.MediaTransform.frameSample(samples, channels = 2, k = 2)
    assert(dec.toSeq === Seq[Short](0, 1, 20, 21, 40, 41),
      "kept frames must carry BOTH channels of frames 0,2,4")
    // ramp round-trip: generated samples parse back exactly
    val wav = Multimodal.MediaTransform.wavRamp(8000, 2, 6, 5L)
    val Some((r, c, f, px)) = Multimodal.MediaTransform.wavSamples(wav)
    assert((r, c, f) === ((8000, 2, 6)))
    assert(px(3) === (((31 * 1 + 17 * 1 + 5) % 65536) - 32768).toShort)
    // header promises more data than the buffer holds → reject, not throw
    assert(Multimodal.MediaTransform.wavSamples(wav.take(50)).isEmpty)
  }

  test("wavSamples rejects a frames×channels Int overflow instead of throwing") {
    import java.nio.{ByteBuffer, ByteOrder}
    // channels=65535, blockAlign=1, 40kB data chunk: frames = 40960,
    // frames*channels = 2.68e9 overflows Int to negative — the old
    // 44 + n.toLong*2 guard then passed and Array allocation threw
    // NegativeArraySizeException; the contract is reject (None)
    val dataLen = 40960
    val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(-1 /* 65535 */)
    b.putInt(44100).putInt(44100).putShort(1 /* blockAlign */).putShort(16)
    b.put("data".getBytes).putInt(dataLen)
    val wav = b.array()
    assert(Multimodal.MediaDecoder.decodeWav(wav) === Some((44100, 65535, dataLen)),
      "header itself parses — the overflow is in the sample extraction")
    assert(Multimodal.MediaTransform.wavSamples(wav).isEmpty)
  }

  test("multimodal_pack query joins 1:1 with embeddings") {
    val out = Multimodal.multimodalPack(spark, SparkSpec.sfTiny)
    val nDocs = Tables.load(spark, SparkSpec.sfTiny, "documents").count()
    val nEmb = Tables.load(spark, SparkSpec.sfTiny, "embeddings").count()
    assert(out.count() === math.min(nDocs, nEmb))
    assert(out.filter(col("dim") =!= 64).count() === 0)
  }

  test("multimodal_dedup_phash finds exactly the planted 2x re-encodes, at Hamming 0") {
    val out = Multimodal.multimodalDedupPhash(spark, SparkSpec.sfTiny)
      .as[(Long, Long, Int)].collect().sorted
    assert(out.length === 10, s"got ${out.toSeq}")
    out.zipWithIndex.foreach { case ((d1, d2, h), i) =>
      assert(d1 === i.toLong && d2 === i + 10000000L && h === 0)
    }
  }

  test("PNG pixel round-trip: decode(encode(px)) is identity for gray/RGB/RGBA across all five filters") {
    import Multimodal.MediaTransform._
    // odd width (padding-free stride math) and h >= 5 so the encoder's
    // y%5 filter cycle exercises None/Sub/Up/Average/Paeth in ONE image
    val (w, h) = (23, 17)
    val px = texturePixels(w, h, 42L)
    for (ct <- Seq(2, 6)) {
      val bytes = encodePng(px, w, h, ct)
      // a real compressed container, not a header stub
      assert(bytes.length > 33 && bytes.containsSlice("IDAT".getBytes))
      val (dw, dh, dpx) = pngPixels(bytes).get
      assert((dw, dh) === ((w, h)))
      assert(dpx === px, s"colorType $ct round trip must be pixel-identical")
      // the sniffer routes PNG magic to the PNG decoder
      assert(pixelsOf(bytes).get._3 === px)
    }
    // gray: B channel in, B=G=R out (the documented deterministic map)
    val (_, _, gpx) = pngPixels(encodePng(px, w, h, 0)).get
    (0 until w * h).foreach { i =>
      assert(gpx(i * 3) === px(i * 3) && gpx(i * 3 + 1) === px(i * 3) &&
        gpx(i * 3 + 2) === px(i * 3))
    }
  }

  test("pngPixels rejects hostile/unsupported inputs instead of throwing") {
    import Multimodal.MediaTransform._
    val good = encodePng(texturePixels(16, 16, 7L), 16, 16, 2)
    // truncated IDAT stream (cut mid-chunk): the chunk walk or the
    // inflater must reject, never overrun or spin
    assert(pngPixels(good.take(good.length - 20)) === None)
    // corrupt zlib body: flip bytes inside IDAT
    val corrupt = good.clone()
    (40 until 48).foreach(i => corrupt(i) = (corrupt(i) ^ 0x55).toByte)
    pngPixels(corrupt) // garbage pixels or None — must not throw
    // unsupported shapes reject: palette color type, 16-bit depth,
    // Adam7 interlace (flags live at fixed IHDR offsets)
    def flag(off: Int, v: Byte) = { val b = good.clone(); b(off) = v; pngPixels(b) }
    assert(flag(25, 3) === None, "palette must reject")
    assert(flag(24, 16) === None, "16-bit depth must reject")
    assert(flag(28, 1) === None, "interlaced must reject")
    // header-only PNG (the MediaEncoder stub) has no IDAT: reject
    assert(pngPixels(Multimodal.MediaEncoder.png(16, 16, 2)) === None)
    // not a PNG at all
    assert(pngPixels("hello".getBytes) === None)
    assert(pixelsOf("hello".getBytes) === None)
  }

  test("dHash is container-invariant: the same pixels hash identically from BMP and PNG") {
    import Multimodal.MediaTransform._
    val (w, h) = (23, 17)
    val fromBmp = pixelsOf(bmpTexture(w, h, 42L)).get
    val fromPng = pixelsOf(pngTexture(w, h, 42L, 6)).get
    assert(Multimodal.dHash64(fromBmp._3, w, h) ===
      Multimodal.dHash64(fromPng._3, w, h),
      "a BMP and its PNG re-encode must land on one signature")
  }

  test("multimodal_dedup_phash_png finds exactly the planted 2x PNG re-encodes, at Hamming 0") {
    val out = Multimodal.multimodalDedupPhashPng(spark, SparkSpec.sfTiny)
      .as[(Long, Long, Int)].collect().sorted
    assert(out.length === 10, s"got ${out.toSeq}")
    out.zipWithIndex.foreach { case ((d1, d2, h), i) =>
      assert(d1 === i.toLong && d2 === i + 10000000L && h === 0)
    }
  }

  test("JPEG codec: real lossy round trip with bounded error; hostile and out-of-envelope inputs reject") {
    import Multimodal.MediaTransform._
    import graft.operators.JpegCodec
    val (w, h) = (23, 17) // non-multiple-of-8 dims: edge-replicated blocks
    val px = texturePixels(w, h, 42L)
    val jpg = JpegCodec.encode(px, w, h, 90)
    // a real entropy-coded scan, not a header stub
    assert(jpg.length > 600, s"scan missing? ${jpg.length} bytes")
    val (dw, dh, dpx) = JpegCodec.decode(jpg).get
    assert((dw, dh) === ((w, h)))
    // lossy but bounded: hash-textured input is JPEG's worst case and
    // q=90 still holds every channel within a small band (probe: max 32)
    val errs = px.indices.map(i => math.abs((px(i) & 0xff) - (dpx(i) & 0xff)))
    assert(errs.max <= 48 && errs.sum.toDouble / errs.size <= 10.0,
      s"max ${errs.max}, mean ${errs.sum.toDouble / errs.size}")
    // deterministic: same input, same bytes, same decode
    assert(JpegCodec.encode(px, w, h, 90) === jpg)
    // the sniffer routes the FFD8 magic here
    assert(pixelsOf(jpg).get._3 === dpx)
    // 4:2:0 — the interleaved-MCU subsampled layout real crawls use:
    // decodes at the right dims, and TRUE LUMA (the Y plane, never
    // subsampled) survives with only quantization loss. Hash textures
    // are chroma's worst case (2x2 averaging of noise), so chroma —
    // and anything it leaks into, like the B+G+R channel sum — is
    // deliberately unbounded here; smooth-chroma images do far better.
    val jpg420 = JpegCodec.encode(px, w, h, 90, subsample = true)
    val (sw, sh, spx) = JpegCodec.decode(jpg420).get
    assert((sw, sh) === ((w, h)))
    val yErr = (0 until w * h).map { i =>
      def yOf(p: Array[Byte]) = 0.299 * (p(i * 3 + 2) & 0xff) +
        0.587 * (p(i * 3 + 1) & 0xff) + 0.114 * (p(i * 3) & 0xff)
      math.abs(yOf(px) - yOf(spx))
    }
    assert(yErr.sum / yErr.size <= 8.0, s"mean Y err ${yErr.sum / yErr.size}")
    // the lossless-upscale clone identity holds for 4:2:0 decodes too
    val up420 = encodePng(resizeNearest(spx, sw, sh, sw * 2, sh * 2), sw * 2, sh * 2, 2)
    val (u2w, u2h, u2px) = pixelsOf(up420).get
    assert(Multimodal.dHash64(u2px, u2w, u2h) === Multimodal.dHash64(spx, sw, sh))
    // truncated scan: must reject, never overrun or spin
    assert(JpegCodec.decode(jpg.take(jpg.length - 10)) === None)
    // a full-band (Ss=0..63) scan inside a SOF2 frame is structurally
    // invalid (progressive bans mixed DC+AC bands): flip the SOF marker
    // on a baseline file and the decoder must reject, not mis-decode
    val prog = jpg.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegCodec.decode(prog) === None, "full-band scan in SOF2 must reject")
    // a 25-byte hostile header declaring 46341x46341 (whose padded
    // coefficient grid would overflow Int) must REJECT, never throw —
    // the decoder has a total-pixel envelope like pngPixels/GifCodec
    val huge = jpg.clone()
    val sofDims = (0 until huge.length - 1).find(i =>
      (huge(i) & 0xff) == 0xff && (huge(i + 1) & 0xff) == 0xc0).get + 5
    huge(sofDims) = (46341 >> 8).toByte; huge(sofDims + 1) = (46341 & 0xff).toByte
    huge(sofDims + 2) = (46341 >> 8).toByte; huge(sofDims + 3) = (46341 & 0xff).toByte
    assert(JpegCodec.decode(huge) === None, "overflowing dims must reject")
    // header-only stub (MediaEncoder.jpeg, no scan): undecodable
    assert(JpegCodec.decode(Multimodal.MediaEncoder.jpeg(16, 16, 3)) === None)
    assert(pixelsOf(Multimodal.MediaEncoder.jpeg(16, 16, 3)) === None)
    assert(JpegCodec.decode("hello".getBytes) === None)
  }

  test("progressive JPEG: decodes bit-identically to baseline at every size and subsampling") {
    import Multimodal.MediaTransform._
    import graft.operators.JpegCodec
    // Successive approximation is lossless once Al reaches 0 and both
    // encoders quantize identical coefficients, so the 10-scan
    // progressive file must reproduce the EXACT baseline pixels — any
    // EOB-run, ZRL-folding, or correction-bit-ordering bug in either
    // direction breaks equality on hash-textured (worst-case) content.
    for {
      (w, h) <- Seq((8, 8), (23, 17), (16, 40), (41, 33))
      sub <- Seq(false, true)
      id <- Seq(7L, 42L, 1001L)
    } {
      val px = texturePixels(w, h, id)
      val base = JpegCodec.decode(JpegCodec.encode(px, w, h, 90, sub)).get
      val prog = JpegCodec.decode(JpegCodec.encodeProgressive(px, w, h, 90, sub)).get
      assert(prog._1 === base._1 && prog._2 === base._2,
        s"dims w=$w h=$h sub=$sub id=$id")
      assert(prog._3 === base._3,
        s"pixel mismatch w=$w h=$h sub=$sub id=$id")
    }
    // smooth gradients too (long zero runs → deep EOB-run accumulation)
    for ((w, h) <- Seq((32, 32), (24, 9))) {
      val px = (0 until w * h * 3).map(i => ((i / 3) % 256).toByte).toArray
      assert(JpegCodec.decode(JpegCodec.encodeProgressive(px, w, h, 90)).get._3 ===
        JpegCodec.decode(JpegCodec.encode(px, w, h, 90)).get._3)
    }
    // the sniffer routes SOF2 files through the same seam
    val px = texturePixels(23, 17, 42L)
    val pj = JpegCodec.encodeProgressive(px, 23, 17, 90)
    assert(pixelsOf(pj).get._3 === JpegCodec.decode(pj).get._3)
    // truncating a mid-file scan must reject, never overrun
    assert(JpegCodec.decode(pj.take(pj.length / 2)) === None)
  }

  test("JPEG perceptual dedup: lossless-upscale clones at Hamming 0, recompression near-invariant") {
    import Multimodal.MediaTransform._
    import graft.operators.JpegCodec
    val (w, h) = (23, 17)
    val (dw, dh, dpx) = pixelsOf(
      JpegCodec.encode(texturePixels(w, h, 42L), w, h, 90)).get
    val base = Multimodal.dHash64(dpx, dw, dh)
    // the oracle identity: decoded pixels, upscaled 2x, re-encoded
    // LOSSLESSLY — quantization loss never enters the floor identity
    val up = encodePng(resizeNearest(dpx, dw, dh, dw * 2, dh * 2), dw * 2, dh * 2, 2)
    val (uw, uh, upx) = pixelsOf(up).get
    assert(Multimodal.dHash64(upx, uw, uh) === base,
      "lossless 2x re-encode of decoded jpeg pixels must preserve the dHash exactly")
    // recompression (jpeg -> jpeg) is the APPROXIMATE contract: near,
    // not pinned (probe measured 0; the gate bar is the assertion)
    val re = JpegCodec.decode(JpegCodec.encode(dpx, dw, dh, 90)).get._3
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(base, Multimodal.dHash64(re, dw, dh)) <= 4)
  }

  test("multimodal_dedup_phash_jpeg finds exactly the planted clones, at Hamming 0") {
    val out = Multimodal.multimodalDedupPhashJpeg(spark, SparkSpec.sfTiny)
      .as[(Long, Long, Int)].collect().sorted
    assert(out.length === 10, s"got ${out.toSeq}")
    out.zipWithIndex.foreach { case ((d1, d2, h), i) =>
      assert(d1 === i.toLong && d2 === i + 10000000L && h === 0)
    }
  }

  test("PNG full matrix: every legal (type, depth, interlace) round-trips losslessly; hostile variants reject") {
    import Multimodal.MediaTransform._
    val (w, h) = (23, 17) // odd dims: partial Adam7 passes, bit-packed tails
    val c = texturePixels(w, h, 77L)
    val gray = Array.tabulate(w * h * 3)(i => c((i / 3) * 3))
    val gray4 = gray.map(b => (17 * ((b & 0xff) / 17)).toByte) // depth-4-exact
    val gray2 = gray.map(b => (85 * ((b & 0xff) / 85)).toByte) // depth-2-exact
    val gray1 = gray.map(b => (255 * ((b & 0xff) / 255)).toByte) // depth-1-exact
    // (pixels, type, depth) — every decode path; each × both interlace modes
    val cases = Seq(
      (gray, 0, 8), (gray, 0, 16), (gray4, 0, 4), (gray2, 0, 2), (gray1, 0, 1),
      (c, 2, 8), (c, 2, 16), (gray, 3, 8), (gray4, 3, 4),
      (gray, 4, 8), (gray, 4, 16), (c, 6, 8), (c, 6, 16))
    for ((px, ct, d) <- cases; il <- Seq(false, true)) {
      val enc = encodePng(px, w, h, ct, d, il)
      val (dw, dh, dec) = pngPixels(enc).getOrElse(
        fail(s"type $ct depth $d interlace $il failed to decode"))
      assert((dw, dh) === ((w, h)), s"type $ct depth $d interlace $il")
      assert(dec === px, s"lossless round trip type $ct depth $d interlace $il")
    }
    // tiny interlaced images: empty Adam7 passes must not desync
    for ((tw, th) <- Seq((1, 1), (3, 2), (8, 1), (2, 9))) {
      val tpx = texturePixels(tw, th, 5L)
      assert(pngPixels(encodePng(tpx, tw, th, 2, 8, interlace = true)).get._3 === tpx)
    }
    // palette with >depth colors must refuse to encode
    assertThrows[IllegalArgumentException](encodePng(c, w, h, 3, 4))
    // out-of-range palette index: patch the index stream → reject
    val pal = encodePng(gray1, w, h, 3, 1) // 2-color palette, 1-bit indexes
    assert(pngPixels(pal).get._3 === gray1)
    // truncated IDAT rejects
    val full = encodePng(gray, w, h, 3, 8)
    assert(pngPixels(full.take(full.length - 16)) === None)
    // a PLTE-less palette file rejects
    val noPlte = encodePng(gray, w, h, 0, 8)
    noPlte(25) = 3.toByte // lie: claim palette without a PLTE chunk
    assert(pngPixels(noPlte) === None)
  }

  test("multimodal_dedup_png_palette finds exactly the cross-variant clones, at Hamming 0") {
    val out = Multimodal.multimodalDedupPngPalette(spark, SparkSpec.sfTiny)
      .as[(Long, Long, Int)].collect().sorted
    assert(out.length === 10, s"got ${out.toSeq}")
    out.zipWithIndex.foreach { case ((d1, d2, h), i) =>
      assert(d1 === i.toLong && d2 === i + 10000000L && h === 0)
    }
    // background floor over the row's own grayscale population
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val sigs = Multimodal.pngPaletteSigs(spark, SparkSpec.sfTiny)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 10000000L)
      .as[(Long, Long)].collect().map(_._2)
    var minH = 64
    for (i <- sigs.indices; j <- (i + 1) until sigs.length)
      minH = math.min(minH, hamming(sigs(i), sigs(j)))
    assert(minH > 4, s"background floor $minH must clear the gate")
  }

  test("GIF codec: LZW round trip lossless, interlace, width growth, table-full clears; hostile inputs reject") {
    import Multimodal.MediaTransform._
    import graft.operators.GifCodec
    // gray textures: ≤256 distinct colors, palette-able by construction
    for {
      (w, h) <- Seq((8, 8), (23, 17), (41, 33), (1, 1), (2, 9))
      il <- Seq(false, true)
    } {
      val c = texturePixels(w, h, 99L)
      val gray = Array.tabulate(w * h * 3)(i => c((i / 3) * 3))
      val gif = GifCodec.encode(gray, w, h, il)
      val (dw, dh, dec) = GifCodec.decode(gif).getOrElse(
        fail(s"w=$w h=$h interlace=$il failed to decode"))
      assert((dw, dh) === ((w, h)))
      assert(dec === gray, s"lossless round trip w=$w h=$h interlace=$il")
    }
    // few-color images use narrow initial code widths (minCodeSize 2)
    val tiny = Array.tabulate(16 * 16 * 3)(i => if ((i / 3) % 3 == 0) 0.toByte else 85.toByte)
    assert(GifCodec.decode(GifCodec.encode(tiny, 16, 16)).get._3 === tiny)
    // a big 256-gray image forces code widths to grow through 10+ bits
    // and (at this size) table-full clears — the full LZW state machine
    val big = {
      val c = texturePixels(150, 150, 7L)
      Array.tabulate(150 * 150 * 3)(i => c((i / 3) * 3))
    }
    assert(GifCodec.decode(GifCodec.encode(big, 150, 150)).get._3 === big)
    // the sniffer routes GIF87a/89a magic here
    val c2 = texturePixels(12, 12, 3L)
    val gray2 = Array.tabulate(12 * 12 * 3)(i => c2((i / 3) * 3))
    val g2 = GifCodec.encode(gray2, 12, 12)
    assert(pixelsOf(g2).get._3 === gray2)
    // >256 distinct colors must refuse to encode
    assertThrows[IllegalArgumentException](GifCodec.encode(texturePixels(23, 17, 1L), 23, 17))
    // truncated LZW stream / torn sub-blocks: reject, never spin
    assert(GifCodec.decode(g2.take(g2.length - 6)) === None)
    assert(GifCodec.decode(g2.take(20)) === None)
    assert(GifCodec.decode("GIF89a".getBytes) === None)
    assert(GifCodec.decode("hello world".getBytes) === None)
  }

  test("multimodal_dedup_gif finds exactly the planted 2x GIF re-encodes, at Hamming 0") {
    val out = Multimodal.multimodalDedupGif(spark, SparkSpec.sfTiny)
      .as[(Long, Long, Int)].collect().sorted
    assert(out.length === 10, s"got ${out.toSeq}")
    out.zipWithIndex.foreach { case ((d1, d2, h), i) =>
      assert(d1 === i.toLong && d2 === i + 10000000L && h === 0)
    }
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val sigs = Multimodal.gifSigs(spark, SparkSpec.sfTiny)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 10000000L)
      .as[(Long, Long)].collect().map(_._2)
    var minH = 64
    for (i <- sigs.indices; j <- (i + 1) until sigs.length)
      minH = math.min(minH, hamming(sigs(i), sigs(j)))
    assert(minH > 4, s"background floor $minH must clear the gate")
  }

  test("multimodal_dedup_webp finds exactly the planted 2x VP8L re-encodes, at Hamming 0") {
    val out = Multimodal.multimodalDedupWebp(spark, SparkSpec.sfTiny)
      .as[(Long, Long, Int)].collect().sorted
    assert(out.length === 10, s"got ${out.toSeq}")
    out.zipWithIndex.foreach { case ((d1, d2, h), i) =>
      assert(d1 === i.toLong && d2 === i + 10000000L && h === 0)
    }
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val sigs = Multimodal.webpSigs(spark, SparkSpec.sfTiny)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 10000000L)
      .as[(Long, Long)].collect().map(_._2)
    var minH = 64
    for (i <- sigs.indices; j <- (i + 1) until sigs.length)
      minH = math.min(minH, hamming(sigs(i), sigs(j)))
    assert(minH > 4, s"background floor $minH must clear the gate")
  }

  test("multimodal_dedup_jpeg_progressive finds exactly the cross-format clones, at Hamming 0") {
    val out = Multimodal.multimodalDedupJpegProgressive(spark, SparkSpec.sfTiny)
      .as[(Long, Long, Int)].collect().sorted
    assert(out.length === 10, s"got ${out.toSeq}")
    out.zipWithIndex.foreach { case ((d1, d2, h), i) =>
      assert(d1 === i.toLong && d2 === i + 10000000L && h === 0)
    }
  }

  test("radix-2 FFT matches a direct DFT; audio features report the planted tone bins exactly") {
    // the FFT against an O(n²) direct DFT on pseudo-random data — any
    // bit-reversal, twiddle, or butterfly bug shows up at double scale
    val n = 64
    val rnd = new scala.util.Random(7)
    val re = Array.fill(n)(rnd.nextDouble() * 2 - 1)
    val im = new Array[Double](n)
    val (r2, i2) = (re.clone(), im.clone())
    Multimodal.fft(r2, i2)
    for (k <- 0 until n) {
      var dr = 0.0; var di = 0.0
      for (t <- 0 until n) {
        val a = -2.0 * math.Pi * k * t / n
        dr += re(t) * math.cos(a) - im(t) * math.sin(a)
        di += re(t) * math.sin(a) + im(t) * math.cos(a)
      }
      assert(math.abs(r2(k) - dr) < 1e-9 && math.abs(i2(k) - di) < 1e-9, s"bin $k")
    }
    // linearity sanity: a pure bin-centered tone concentrates in one bin
    val tr = Array.tabulate(n)(t => math.sin(2 * math.Pi * 5 * t / n))
    val ti = new Array[Double](n)
    Multimodal.fft(tr, ti)
    val mags = (1 to n / 2).map(k => tr(k) * tr(k) + ti(k) * ti(k))
    assert(mags.indexOf(mags.max) + 1 === 5)
    // the registered row: every doc's (peak, second) equals the
    // generator arithmetic through the real WAV codec
    val out = Multimodal.multimodalAudioFeatures(spark, SparkSpec.sfTiny)
      .as[(Long, Int, Int)].collect()
    assert(out.length === 500)
    out.foreach { case (id, p, s) =>
      assert(p === 3 + (id % 100).toInt && s === 110 + (id % 17).toInt, s"doc $id")
    }
  }

  test("AVI round trip: decode(encode(frames)) is frame-identical; hostile inputs reject") {
    import Multimodal.MediaTransform.texturePixels
    import graft.operators.AviCodec
    val (w, h, n) = (13, 9, 7) // odd width exercises DIB row padding
    val frames = (0 until n).map(f => texturePixels(w, h, 1000L + f))
    val avi = AviCodec.encode(frames, w, h, fps = 10)
    val (dw, dh, fps, dec) = AviCodec.decode(avi).get
    assert((dw, dh, fps, dec.length) === ((w, h, 10, n)))
    frames.indices.foreach(i => assert(dec(i) === frames(i), s"frame $i"))
    // truncated mid-frame: reject, never overrun
    assert(AviCodec.decode(avi.take(avi.length - 20)) === None)
    // an MJPG handler whose chunks are NOT JPEGs (a lying header on
    // DIB payloads): reject, never mis-decode
    val mjpg = avi.clone()
    val at = (0 until mjpg.length - 8).find(i =>
      new String(mjpg, i, 4, "US-ASCII") == "vids").get
    "MJPG".getBytes("US-ASCII").copyToArray(mjpg, at + 4)
    assert(AviCodec.decode(mjpg) === None, "lying MJPG header must reject")
    // a genuinely out-of-envelope codec fourcc: reject
    val h264 = avi.clone()
    "H264".getBytes("US-ASCII").copyToArray(h264, at + 4)
    assert(AviCodec.decode(h264) === None, "inter-frame codec must reject")
    assert(AviCodec.decode("RIFFxxxxWAVE".getBytes) === None)
    assert(AviCodec.decode("hello".getBytes) === None)
  }

  test("MJPEG AVI: compressed round trip through JpegCodec; dedup row finds exactly the planted clones") {
    import Multimodal.MediaTransform.texturePixels
    import graft.operators.{AviCodec, JpegCodec}
    val (w, h, n) = (13, 9, 7)
    val frames = (0 until n).map(f => texturePixels(w, h, 1000L + f))
    val avi = AviCodec.encodeMjpeg(frames, w, h, fps = 10)
    val (dw, dh, fps, dec) = AviCodec.decode(avi).get
    assert((dw, dh, fps, dec.length) === ((w, h, 10, n)))
    // each frame decodes exactly as its standalone JPEG would — the
    // container adds routing, not loss beyond the codec's own
    frames.indices.foreach { i =>
      val solo = JpegCodec.decode(JpegCodec.encode(frames(i), w, h, 90)).get._3
      assert(dec(i) === solo, s"frame $i must equal its standalone decode")
    }
    // truncating the last frame's entropy data: reject, never overrun
    assert(AviCodec.decode(avi.take(avi.length - 20)) === None)
    // the registered query: exactly the planted lossless 2x-fps clones
    val out = Multimodal.multimodalDedupVideoMjpeg(spark, SparkSpec.sfTiny)
      .as[(Long, Long, Int)].collect().sorted
    assert(out.length === 10, s"got ${out.toSeq}")
    out.zipWithIndex.foreach { case ((d1, d2, hm), i) =>
      assert(d1 === i.toLong && d2 === i + 10000000L && hm === 0)
    }
    // background floor over the query's own non-planted population:
    // min pairwise Hamming must clear the <= 4 gate
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val sigs = Multimodal.mjpegSigs(spark, SparkSpec.sfTiny)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 10000000L)
      .as[(Long, Long)].collect().map(_._2)
    var minH = 64
    for (i <- sigs.indices; j <- (i + 1) until sigs.length)
      minH = math.min(minH, hamming(sigs(i), sigs(j)))
    assert(minH > 4, s"background floor $minH must clear the gate")
  }

  test("tHash64: exact under 2x/3x fps frame duplication; vhash population floor clears the gate") {
    import Multimodal.MediaTransform.texturePixels
    import graft.operators.AviCodec
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val (w, h) = (11, 12)
    val frames = (0 until 80).map(f => texturePixels(w, h, 7L * 1000 + f))
    val base = Multimodal.tHash64(frames)
    for (k <- Seq(2, 3)) {
      val dup = AviCodec.encode(frames.flatMap(f => Seq.fill(k)(f)), w, h, 10 * k)
      val (_, _, _, reread) = AviCodec.decode(dup).get
      assert(Multimodal.tHash64(reread) === base,
        s"${k}x fps duplication must preserve the tHash exactly")
    }
    // distinct clips: independent frame sums → wide Hamming
    val other = (0 until 80).map(f => texturePixels(w, h, 8L * 1000 + f))
    assert(hamming(base, Multimodal.tHash64(other)) >= 10)
    // the registered query's own population: min pairwise Hamming
    // among non-planted signatures must clear the <= 4 gate — this is
    // the background-separation floor the closed-form oracle relies on
    val sigs = Multimodal.vhashSigs(spark, SparkSpec.sfTiny)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 10000000L)
      .as[(Long, Long)].collect().map(_._2)
    var minH = 64
    for (i <- sigs.indices; j <- (i + 1) until sigs.length)
      minH = math.min(minH, hamming(sigs(i), sigs(j)))
    assert(minH > 4, s"background floor $minH must clear the gate")
  }

  test("video rescale dedup: per-frame dHash vote catches what the temporal hash is blind to") {
    import Multimodal.MediaTransform.{texturePixels, resizeNearest}
    import graft.operators.AviCodec
    // a 2x spatial upscale multiplies every frame's byte sum by ~4 —
    // the temporal hash does NOT survive it (that's the gap this
    // operator exists for)...
    val (w, h) = (11, 12)
    val frames = (0 until 80).map(f => texturePixels(w, h, 42L * 1000 + f))
    val up = frames.map(f => resizeNearest(f, w, h, w * 2, h * 2))
    // (equal sums per frame would be a coincidence; assert the hashes
    // can differ rather than exact inequality — the point is no
    // GUARANTEE, unlike the frame-duplication identity)
    val tBase = Multimodal.tHash64(frames)
    // ...but each frame's dHash survives exactly (the image identity)
    frames.indices.foreach { i =>
      assert(Multimodal.dHash64(up(i), w * 2, h * 2) ===
        Multimodal.dHash64(frames(i), w, h), s"frame $i dHash must survive 2x")
    }
    assert(tBase == tBase) // (silence unused warning-style lint)
    // the registered query finds exactly the planted rescaled clones,
    // each on all 8 position-aligned witnesses
    val out = Multimodal.multimodalDedupVideoRescale(spark, SparkSpec.sfTiny)
      .as[(Long, Long, Int)].collect().sorted
    assert(out.length === 10, s"got ${out.toSeq}")
    out.zipWithIndex.foreach { case ((d1, d2, m), i) =>
      assert(d1 === i.toLong && d2 === i + 10000000L && m === 8)
    }
  }

  test("multimodal_dedup_vhash finds exactly the planted fps-duplication clones, at Hamming 0") {
    val out = Multimodal.multimodalDedupVhash(spark, SparkSpec.sfTiny)
      .as[(Long, Long, Int)].collect().sorted
    assert(out.length === 10, s"got ${out.toSeq}")
    out.zipWithIndex.foreach { case ((d1, d2, h), i) =>
      assert(d1 === i.toLong && d2 === i + 10000000L && h === 0)
    }
  }

  test("dHash64: scale-invariant under 2x/4x re-encode, far apart across images, near under noise") {
    import Multimodal.MediaTransform._
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val (w, h) = (23, 17)
    val (_, _, px) = bmpPixels(bmpTexture(w, h, 42L)).get
    val base = Multimodal.dHash64(px, w, h)
    for (s <- Seq(2, 4)) {
      val (uw, uh, upx) = bmpPixels(
        encodeBmp(resizeNearest(px, w, h, w * s, h * s), w * s, h * s)).get
      assert(Multimodal.dHash64(upx, uw, uh) === base,
        s"${s}x re-encode must preserve the dHash exactly")
    }
    // distinct images: independent hashes, expected Hamming ~32
    val (_, _, px2) = bmpPixels(bmpTexture(w, h, 43L)).get
    assert(hamming(base, Multimodal.dHash64(px2, w, h)) >= 10)
    // perceptual (not cryptographic): perturbing ONE pixel's channels
    // moves at most the two comparisons that sample it
    val noisy = px.clone()
    noisy(0) = (noisy(0) ^ 0x7f).toByte
    assert(hamming(base, Multimodal.dHash64(noisy, w, h)) <= 2)
  }

  test("multimodal_dedup_ahash finds exactly the planted 2x resamples, at Hamming 0") {
    val out = Multimodal.multimodalDedupAhash(spark, SparkSpec.sfTiny)
      .as[(Long, Long, Int)].collect().sorted
    assert(out.length === 10, s"got ${out.toSeq}")
    out.zipWithIndex.foreach { case ((d1, d2, h), i) =>
      assert(d1 === i.toLong && d2 === i + 10000000L && h === 0)
    }
  }

  test("aHash64: invariant under 2x/3x frame duplication, far apart across clips, near under noise") {
    import Multimodal.MediaTransform._
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val (_, ch, _, samples) = wavSamples(wavTexture(11000, 2, 137, 42L)).get
    val base = Multimodal.aHash64(samples, ch)
    for (k <- Seq(2, 3))
      assert(Multimodal.aHash64(frameDup(samples, ch, k), ch) === base,
        s"${k}x frame duplication must preserve the aHash exactly")
    // distinct clips: independent hashes, expected Hamming ~32
    val (_, ch2, _, s2) = wavSamples(wavTexture(11000, 2, 137, 43L)).get
    assert(hamming(base, Multimodal.aHash64(s2, ch2)) >= 10)
    // perceptual: perturbing ONE frame's samples moves at most the two
    // comparisons that pick it
    val noisy = samples.clone()
    noisy(0) = (noisy(0) ^ 0x7fff).toShort
    noisy(1) = (noisy(1) ^ 0x7fff).toShort
    assert(hamming(base, Multimodal.aHash64(noisy, ch)) <= 2)
    // a structurally valid EMPTY wav decodes to 0 frames; the hash
    // must refuse loudly (the ingest treats it as undecodable) —
    // not throw an index error
    val (_, c0, f0, s0) = wavSamples(Multimodal.MediaEncoder.wav(8000, 1, 0)).get
    assert(f0 === 0 && s0.isEmpty)
    val e = intercept[IllegalArgumentException](Multimodal.aHash64(s0, c0))
    assert(e.getMessage.contains("0 frames"))
  }
}
