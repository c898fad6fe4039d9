package graft.operators

/** JPEG codec, pure JVM — the perceptual-dedup tier's path into the
  * web's dominant image format. Everything here follows the public
  * ITU-T T.81 spec (Annex K tables, Annex F sequential flow, Annex G
  * progressive flow): 8-bit DCT, Huffman entropy coding, JFIF YCbCr.
  *
  * Scope is deliberate:
  *  - DECODE ([[decode]]): baseline sequential (SOF0) AND progressive
  *    (SOF2) — spectral selection, successive approximation, EOB runs
  *    — 8-bit, 1 component (gray) or 3 components with sampling
  *    factors 1–2 (4:4:4, 4:2:2, 4:4:0 and the 4:2:0 that dominates
  *    real crawls), interleaved and per-component scans, nearest-
  *    neighbor chroma upsample, optional restart intervals. The
  *    decoder is coefficient-buffered (scans accumulate into
  *    per-component grids; one dequantize+IDCT pass at EOI), so the
  *    two frame types share every code path below the scan layer.
  *    Arithmetic coding, 12-bit, hierarchical, exotic sampling
  *    ratios, and >3 components REJECT (None) — never mis-decode.
  *    The same hostile-input posture as the other decoders: lengths
  *    are bounds-checked, streams must terminate, malformed
  *    Huffman/marker structure returns None, never throws.
  *  - ENCODE ([[encode]] baseline, [[encodeProgressive]] the 10-scan
  *    libjpeg script): 4:4:4 or 4:2:0 with the Annex K example
  *    quantization tables (scaled by `quality`, the libjpeg formula) —
  *    the fixture generator side of the seam, so the decoder is
  *    exercised by real entropy-coded scans (subsampled interleaved
  *    MCUs, EOB-run accumulation, correction-bit buffering) rather
  *    than hand-packed stubs. Both encoders quantize identical
  *    coefficients, so their decodes are BIT-IDENTICAL — the
  *    closed-form identity behind `multimodal_dedup_jpeg_progressive`.
  *
  * JPEG is LOSSY, so decode(encode(px)) ≈ px, never ==. The planted-
  * clone dedup oracle stays CLOSED-FORM anyway: the clone pipeline is
  * decode(jpeg) → 2× nearest-neighbor upscale → LOSSLESS re-encode
  * (PNG), and the dHash floor identity ⌊⌊2a⌋/2⌋=⌊a⌋ operates on the
  * DECODED pixels — whatever quantization did to them — so each
  * planted pair sits at exactly Hamming 0 while the codec loss never
  * enters the identity. (A JPEG→JPEG re-encode, by contrast, would
  * re-quantize and flip near-tie comparisons — that is the usual
  * perceptual-hash "approximate under recompression" contract, spec-
  * measured but not oracle-pinned.)
  *
  * Both transforms use the textbook O(64²)-per-block double-precision
  * DCT — deterministic across JVMs (strictfp-free double ops on fixed
  * inputs), and fixture images are small; a production decode path
  * would swap in a fast integer IDCT behind the same seam. */
object JpegCodec {

  // ---- Annex K example quantization tables (natural order) ----
  private val QLum = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private val QChrom = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Zigzag scan order: position k in the scan reads natural index
    * Zigzag(k). */
  private val Zigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ---- Annex K typical Huffman tables: (bits per length 1..16, values) ----
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).toArray
  private val DcChromBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromVals = (0 to 11).toArray
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  private val AcChromBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical Huffman code assignment from a (bits, vals) pair:
    * value → (code, length). */
  private def buildCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len)) {
        out += vals(k) -> ((code, len))
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.result()
  }

  /** Decode-side canonical table in flat-array form: codes of length
    * l occupy [first(l), first(l)+count(l)) with values at
    * index(l)+offset. The per-BIT lookup in the entropy loop is two
    * int compares instead of a boxed tuple-Map probe — the Huffman
    * walk dominates multi-frame (MJPEG) decode, and this is ~10× on
    * that path with identical results. */
  private final class HuffDec(bits: Array[Int], vals: Array[Int]) {
    val first = new Array[Int](17)
    val index = new Array[Int](17)
    val count = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        first(l) = code; index(l) = k; count(l) = bits(l)
        code += bits(l); k += bits(l)
        code <<= 1
        l += 1
      }
    }
  }
  private def buildDecode(bits: Array[Int], vals: Array[Int]): HuffDec =
    new HuffDec(bits, vals)

  private val CosTable: Array[Double] = {
    val t = new Array[Double](8 * 8) // t(x*8+u) = cos((2x+1)uπ/16)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16)
    t
  }
  private def cNorm(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2) else 1.0

  private def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += block(y * 8 + x) * CosTable(x * 8 + v) * CosTable(y * 8 + u)
            x += 1
          }
          y += 1
        }
        out(u * 8 + v) = 0.25 * cNorm(u) * cNorm(v) * s
        v += 1
      }
      u += 1
    }
    out
  }

  private def idct(coef: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            s += cNorm(u) * cNorm(v) * coef(u * 8 + v) *
              CosTable(x * 8 + v) * CosTable(y * 8 + u)
            v += 1
          }
          u += 1
        }
        out(y * 8 + x) = 0.25 * s
        x += 1
      }
      y += 1
    }
    out
  }

  /** Annex K table scaled by the libjpeg quality formula, clamped to
    * [1, 255] (8-bit DQT). */
  private def scaledQ(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(b => math.max(1, math.min(255, (b * scale + 50) / 100)))
  }

  private class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nbits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def finish(): Array[Byte] = {
      while (nbits != 0) write(1, 1) // pad with 1s
      out.toByteArray
    }
  }

  private def magnitude(v: Int): (Int, Int) = { // (size, extra bits)
    val a = math.abs(v)
    var s = 0
    while ((a >> s) != 0) s += 1
    (s, if (v >= 0) v else v + (1 << s) - 1)
  }

  /** Encode one 8×8 block of `plane` at block coords (bx, by): FDCT,
    * quantize, DC-differential + AC run-length Huffman. Returns the
    * new DC predictor. */
  private def encodeBlock(plane: Array[Double], planeW: Int, bx: Int, by: Int,
                          tq: Array[Int], ti: Int, dcPredIn: Int,
                          dcCodes: Array[Map[Int, (Int, Int)]],
                          acCodes: Array[Map[Int, (Int, Int)]],
                          bits: BitWriter): Int = {
    val block = new Array[Double](64)
    var i = 0
    while (i < 64) {
      block(i) = plane((by * 8 + i / 8) * planeW + bx * 8 + i % 8) - 128.0
      i += 1
    }
    val coef = fdct(block)
    val quant = new Array[Int](64)
    i = 0
    while (i < 64) { quant(i) = math.round(coef(i) / tq(i)).toInt; i += 1 }
    val diff = quant(0) - dcPredIn
    val (ds, dbits) = magnitude(diff)
    val (dcode, dlen) = dcCodes(ti)(ds)
    bits.write(dcode, dlen)
    if (ds > 0) bits.write(dbits, ds)
    var run = 0
    var k = 1
    while (k < 64) {
      val v = quant(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run >= 16) {
          val (zc, zl) = acCodes(ti)(0xf0); bits.write(zc, zl); run -= 16
        }
        val (s, extra) = magnitude(v)
        val (c, l) = acCodes(ti)((run << 4) | s)
        bits.write(c, l)
        bits.write(extra, s)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (c, l) = acCodes(ti)(0x00); bits.write(c, l) } // EOB
    quant(0)
  }

  /** Encode top-down BGR triples as a baseline JFIF JPEG — 4:4:4 by
    * default, or 4:2:0 (`subsample = true`, 2×2-averaged chroma — the
    * layout that dominates real crawls, so the decoder's interleaved-
    * MCU path is exercised by fixtures shaped like actual web JPEGs). */
  def encode(px: Array[Byte], w: Int, h: Int, quality: Int = 90,
             subsample: Boolean = false): Array[Byte] = {
    val qY = scaledQ(QLum, quality)
    val qC = scaledQ(QChrom, quality)
    val (hY, vY) = if (subsample) (2, 2) else (1, 1)
    val mcusX = (w + 8 * hY - 1) / (8 * hY); val mcusY = (h + 8 * vY - 1) / (8 * vY)
    val (planes, planeW) = prepPlanes(px, w, h, hY, vY)
    val dcCodes = Array(buildCodes(DcLumBits, DcLumVals),
      buildCodes(DcChromBits, DcChromVals))
    val acCodes = Array(buildCodes(AcLumBits, AcLumVals),
      buildCodes(AcChromBits, AcChromVals))
    val bits = new BitWriter
    val dcPred = new Array[Int](3)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        // Y blocks: vY×hY in raster order, then one Cb, one Cr
        var i = 0
        while (i < vY) {
          var j = 0
          while (j < hY) {
            dcPred(0) = encodeBlock(planes(0), planeW(0),
              mx * hY + j, my * vY + i, qY, 0, dcPred(0), dcCodes, acCodes, bits)
            j += 1
          }
          i += 1
        }
        var comp = 1
        while (comp < 3) {
          dcPred(comp) = encodeBlock(planes(comp), planeW(comp),
            mx, my, qC, 1, dcPred(comp), dcCodes, acCodes, bits)
          comp += 1
        }
        mx += 1
      }
      my += 1
    }
    val scan = bits.finish()

    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m); out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      out.write(body)
    }
    val hvY = (hY << 4) | vY
    marker(0xd8) // SOI
    seg(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, (Array(0) ++ Zigzag.map(qY(_))).map(_.toByte))       // DQT 0 (zigzag order)
    seg(0xdb, (Array(1) ++ Zigzag.map(qC(_))).map(_.toByte))       // DQT 1
    seg(0xc0, (Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 3) ++  // SOF0
      Array(1, hvY, 0, 2, 0x11, 1, 3, 0x11, 1)).map(_.toByte))
    def dht(clazz: Int, id: Int, b: Array[Int], v: Array[Int]): Unit =
      seg(0xc4, (Array((clazz << 4) | id) ++ b.drop(1) ++ v).map(_.toByte))
    dht(0, 0, DcLumBits, DcLumVals); dht(1, 0, AcLumBits, AcLumVals)
    dht(0, 1, DcChromBits, DcChromVals); dht(1, 1, AcChromBits, AcChromVals)
    seg(0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0).map(_.toByte)) // SOS
    out.write(scan)
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Full-MCU edge-replicated planar YCbCr prep shared by the baseline
    * and progressive encoders: BGR triples → (Y, Cb, Cr) planes (chroma
    * 2×2-averaged when hY=vY=2) and their widths. Pure — extracting it
    * changes no encoded byte. */
  private def prepPlanes(px: Array[Byte], w: Int, h: Int, hY: Int, vY: Int)
      : (Array[Array[Double]], Array[Int]) = {
    val mcuW = 8 * hY; val mcuH = 8 * vY
    val mcusX = (w + mcuW - 1) / mcuW; val mcusY = (h + mcuH - 1) / mcuH
    val fw = mcusX * mcuW; val fh = mcusY * mcuH
    val full = Array.ofDim[Double](3, fw * fh)
    var y = 0
    while (y < fh) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < fw) {
        val sx = math.min(x, w - 1)
        val o = (sy * w + sx) * 3
        val b = px(o) & 0xff; val g = px(o + 1) & 0xff; val r = px(o + 2) & 0xff
        val i = y * fw + x
        full(0)(i) = 0.299 * r + 0.587 * g + 0.114 * b
        full(1)(i) = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        full(2)(i) = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        x += 1
      }
      y += 1
    }
    val subsample = hY == 2
    val cw = if (subsample) fw / 2 else fw
    val planes = Array(full(0),
      if (subsample) downsample2(full(1), fw, fh) else full(1),
      if (subsample) downsample2(full(2), fw, fh) else full(2))
    (planes, Array(fw, cw, cw))
  }

  /** 2×2 box average — the standard chroma downsample. Input dims are
    * even (MCU-padded). */
  private def downsample2(p: Array[Double], w: Int, h: Int): Array[Double] = {
    val out = new Array[Double]((w / 2) * (h / 2))
    var y = 0
    while (y < h / 2) {
      var x = 0
      while (x < w / 2) {
        out(y * (w / 2) + x) = 0.25 * (p(2 * y * w + 2 * x) + p(2 * y * w + 2 * x + 1) +
          p((2 * y + 1) * w + 2 * x) + p((2 * y + 1) * w + 2 * x + 1))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Progressive AC Huffman table for the fixture encoder: every
    * (run, size) symbol with size ≤ 13 — which covers all EOBn and ZRL
    * codes (size 0) and any magnitude a q≥1 quantizer can produce — at
    * a flat 8-bit code length. 224 of 256 slots is a valid canonical
    * prefix code; wasteful on purpose, fixtures optimize for exercising
    * decoder paths, not compression. */
  private val FlatAcBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 224, 0, 0, 0, 0, 0, 0, 0, 0)
  private val FlatAcVals = (for { r <- 0 to 15; s <- 0 to 13 } yield (r << 4) | s).toArray

  /** Encode top-down BGR triples as a PROGRESSIVE (SOF2) JFIF JPEG —
    * libjpeg's default 10-scan script: interleaved DC first at Al=1,
    * split-band AC first passes (luma 1–5 then 6–63 at Al=2, chroma
    * 1–63 at Al=1), a DC refinement, then AC successive-approximation
    * refinements down to Al=0, so a decoder must get EOB runs, ZRL
    * folding, and correction-bit ordering right to reproduce the image.
    * The quantized coefficients are EXACTLY the baseline [[encode]]'s
    * (same plane prep via [[prepPlanes]], same FDCT, same rounding) and
    * successive approximation is lossless once Al reaches 0, so the
    * progressive and baseline encodings of the same pixels decode
    * BIT-IDENTICALLY — the closed-form identity the
    * `multimodal_dedup_jpeg_progressive` oracle row rides. */
  def encodeProgressive(px: Array[Byte], w: Int, h: Int, quality: Int = 90,
                        subsample: Boolean = false): Array[Byte] = {
    val qY = scaledQ(QLum, quality); val qC = scaledQ(QChrom, quality)
    val (hY, vY) = if (subsample) (2, 2) else (1, 1)
    val mcusX = (w + 8 * hY - 1) / (8 * hY); val mcusY = (h + 8 * vY - 1) / (8 * vY)
    val (planes, planeW) = prepPlanes(px, w, h, hY, vY)
    val compH = Array(hY, 1, 1); val compV = Array(vY, 1, 1)
    val blocksW = Array.tabulate(3)(c => mcusX * compH(c))
    val blocksH = Array.tabulate(3)(c => mcusY * compV(c))
    // quantize every padded block up front (natural-order ints): the
    // same values the baseline encoder streams, held for multi-scan use
    val coefs = Array.tabulate(3) { c =>
      val tq = if (c == 0) qY else qC
      val cf = new Array[Int](blocksW(c) * blocksH(c) * 64)
      var by = 0
      while (by < blocksH(c)) {
        var bx = 0
        while (bx < blocksW(c)) {
          val block = new Array[Double](64)
          var i = 0
          while (i < 64) {
            block(i) = planes(c)((by * 8 + i / 8) * planeW(c) + bx * 8 + i % 8) - 128.0
            i += 1
          }
          val f = fdct(block)
          val base = (by * blocksW(c) + bx) * 64
          i = 0
          while (i < 64) { cf(base + i) = math.round(f(i) / tq(i)).toInt; i += 1 }
          bx += 1
        }
        by += 1
      }
      cf
    }
    val dcCodes = Array(buildCodes(DcLumBits, DcLumVals),
      buildCodes(DcChromBits, DcChromVals))
    val acCodes = buildCodes(FlatAcBits, FlatAcVals)
    // the T.81 scan grids: padded MCU grid for interleaved DC scans,
    // the component's own (unpadded) block grid for single-comp scans
    def compBlocksW(c: Int) = ((w * compH(c) + hY - 1) / hY + 7) / 8
    def compBlocksH(c: Int) = ((h * compV(c) + vY - 1) / vY + 7) / 8
    def iterate(comps: Array[Int], f: (Int, Int, Int) => Unit): Unit =
      if (comps.length > 1) {
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            comps.foreach { ci =>
              var i = 0
              while (i < compV(ci)) {
                var j = 0
                while (j < compH(ci)) { f(ci, mx * compH(ci) + j, my * compV(ci) + i); j += 1 }
                i += 1
              }
            }
            mx += 1
          }
          my += 1
        }
      } else {
        val ci = comps(0)
        var by = 0
        while (by < compBlocksH(ci)) {
          var bx = 0
          while (bx < compBlocksW(ci)) { f(ci, bx, by); bx += 1 }
          by += 1
        }
      }

    def scanBytes(comps: Array[Int], ss: Int, se: Int, ah: Int, al: Int): Array[Byte] = {
      val bits = new BitWriter
      if (ss == 0 && ah == 0) {
        // DC first pass: Huffman-coded diffs of the point-transformed DC
        val dcPred = new Array[Int](3)
        iterate(comps, (ci, bx, by) => {
          val v = coefs(ci)((by * blocksW(ci) + bx) * 64) >> al
          val diff = v - dcPred(ci); dcPred(ci) = v
          val (s, extra) = magnitude(diff)
          val (c2, l2) = dcCodes(if (ci == 0) 0 else 1)(s)
          bits.write(c2, l2)
          if (s > 0) bits.write(extra, s)
        })
      } else if (ss == 0) {
        // DC refinement: one raw bit per block, no Huffman coding
        iterate(comps, (ci, bx, by) =>
          bits.write((coefs(ci)((by * blocksW(ci) + bx) * 64) >> al) & 1, 1))
      } else if (ah == 0) {
        // AC first pass over one component's band: run/size symbols
        // with EOBn accumulation across blocks (jcphuff.c AC_first)
        val ci = comps(0)
        var eobrun = 0
        def flushEob(): Unit = if (eobrun > 0) {
          val nb = 31 - Integer.numberOfLeadingZeros(eobrun)
          val (c2, l2) = acCodes(nb << 4); bits.write(c2, l2)
          if (nb > 0) bits.write(eobrun & ((1 << nb) - 1), nb)
          eobrun = 0
        }
        iterate(comps, (_, bx, by) => {
          val base = (by * blocksW(ci) + bx) * 64
          var r = 0
          var k = ss
          while (k <= se) {
            val v0 = coefs(ci)(base + Zigzag(k))
            // T.81 AC point transform: magnitude shift (truncate to 0)
            val v = if (v0 < 0) -((-v0) >> al) else v0 >> al
            if (v == 0) r += 1
            else {
              flushEob()
              while (r > 15) { val (zc, zl) = acCodes(0xf0); bits.write(zc, zl); r -= 16 }
              val (s, extra) = magnitude(v)
              val (c2, l2) = acCodes((r << 4) | s)
              bits.write(c2, l2); bits.write(extra, s)
              r = 0
            }
            k += 1
          }
          if (r > 0) { eobrun += 1; if (eobrun == 0x7fff) flushEob() }
        })
        flushEob()
      } else {
        // AC refinement: newly-nonzero symbols + buffered correction
        // bits for history coefficients (jcphuff.c AC_refine — the
        // correction bits for coefficients under a pending EOB run ride
        // AFTER the EOBn symbol, in block order)
        val ci = comps(0)
        var eobrun = 0
        val beBits = scala.collection.mutable.ArrayBuffer.empty[Int]
        def flushEob(): Unit = if (eobrun > 0) {
          val nb = 31 - Integer.numberOfLeadingZeros(eobrun)
          val (c2, l2) = acCodes(nb << 4); bits.write(c2, l2)
          if (nb > 0) bits.write(eobrun & ((1 << nb) - 1), nb)
          eobrun = 0
          beBits.foreach(b => bits.write(b, 1)); beBits.clear()
        }
        iterate(comps, (_, bx, by) => {
          val base = (by * blocksW(ci) + bx) * 64
          val absv = new Array[Int](64)
          var eob = ss - 1 // index of the last newly-nonzero coefficient
          var k = ss
          while (k <= se) {
            val a = math.abs(coefs(ci)(base + Zigzag(k))) >> al
            absv(k) = a
            if (a == 1) eob = k
            k += 1
          }
          var r = 0
          val brBits = scala.collection.mutable.ArrayBuffer.empty[Int]
          k = ss
          while (k <= se) {
            val temp = absv(k)
            if (temp == 0) r += 1
            else {
              // ZRLs only when they can't fold into a later EOB
              while (r > 15 && k <= eob) {
                flushEob()
                val (zc, zl) = acCodes(0xf0); bits.write(zc, zl)
                r -= 16
                brBits.foreach(b => bits.write(b, 1)); brBits.clear()
              }
              if (temp > 1) brBits += (temp & 1) // history coef: correction bit
              else {
                flushEob()
                val (c2, l2) = acCodes((r << 4) | 1); bits.write(c2, l2)
                bits.write(if (coefs(ci)(base + Zigzag(k)) < 0) 0 else 1, 1)
                brBits.foreach(b => bits.write(b, 1)); brBits.clear()
                r = 0
              }
            }
            k += 1
          }
          if (r > 0 || brBits.nonEmpty) {
            eobrun += 1
            beBits ++= brBits
            if (eobrun == 0x7fff || beBits.length > 900) flushEob()
          }
        })
        flushEob()
      }
      bits.finish()
    }

    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m); out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      out.write(body)
    }
    marker(0xd8)
    seg(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, (Array(0) ++ Zigzag.map(qY(_))).map(_.toByte))
    seg(0xdb, (Array(1) ++ Zigzag.map(qC(_))).map(_.toByte))
    val hvY = (hY << 4) | vY
    seg(0xc2, (Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 3) ++ // SOF2
      Array(1, hvY, 0, 2, 0x11, 1, 3, 0x11, 1)).map(_.toByte))
    def dht(clazz: Int, id: Int, b: Array[Int], v: Array[Int]): Unit =
      seg(0xc4, (Array((clazz << 4) | id) ++ b.drop(1) ++ v).map(_.toByte))
    dht(0, 0, DcLumBits, DcLumVals); dht(0, 1, DcChromBits, DcChromVals)
    dht(1, 0, FlatAcBits, FlatAcVals)
    val script = Array(
      (Array(0, 1, 2), 0, 0, 0, 1),
      (Array(0), 1, 5, 0, 2),
      (Array(1), 1, 63, 0, 1),
      (Array(2), 1, 63, 0, 1),
      (Array(0), 6, 63, 0, 2),
      (Array(0, 1, 2), 0, 0, 1, 0),
      (Array(0), 1, 63, 2, 1),
      (Array(1), 1, 63, 1, 0),
      (Array(2), 1, 63, 1, 0),
      (Array(0), 1, 63, 1, 0))
    script.foreach { case (comps, ss, se, ah, al) =>
      val hdr = Array(comps.length) ++
        comps.flatMap(ci => Array(ci + 1, ((if (ci == 0) 0 else 1) << 4) | 0)) ++
        Array(ss, se, (ah << 4) | al)
      seg(0xda, hdr.map(_.toByte))
      out.write(scanBytes(comps, ss, se, ah, al))
    }
    marker(0xd9)
    out.toByteArray
  }

  private class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var bad = false
    /** Align to the next byte and step over an expected RSTn marker. */
    def restart(): Boolean = {
      acc = 0; nbits = 0
      if (pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff) {
        val m = bytes(pos + 1) & 0xff
        if (m >= 0xd0 && m <= 0xd7) { pos += 2; return true }
      }
      false
    }
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= bytes.length) { bad = true; return 0 }
        var b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= bytes.length) { bad = true; return 0 }
          val nxt = bytes(pos) & 0xff
          if (nxt == 0x00) pos += 1 // stuffed
          else { bad = true; return 0 } // a real marker mid-entropy
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode a baseline (SOF0) or progressive (SOF2) JPEG to top-down
    * BGR triples (gray expands to B=G=R). Coefficient-buffered: every
    * scan — sequential full-band (interleaved or per-component), DC
    * first/refine, AC spectral-selection first passes and successive-
    * approximation refinements with EOB runs (T.81 G.2, the layout
    * real crawl JPEGs are saved in) — accumulates into per-component
    * quantized-coefficient grids, and one dequantize+IDCT pass at EOI
    * produces pixels, so baseline output is bit-identical to the former
    * single-pass decode (same values, same math, deferred). None on
    * anything outside the supported envelope (8-bit Huffman, 1 or 3
    * components, sampling factors 1–2) or any malformed structure —
    * reject, never mis-decode; lengths are bounds-checked and entropy
    * streams must terminate. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[HuffDec](4)
    val acT = new Array[HuffDec](4)
    var w = 0; var h = 0
    var nComp = 0
    var progressive = false
    var compId: Array[Int] = null
    var compQ: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var hmax = 0; var vmax = 0; var mcusX = 0; var mcusY = 0
    var blocksW: Array[Int] = null // padded block-grid width per component
    var coefs: Array[Array[Int]] = null // natural-order quantized coefficients
    var restartInterval = 0
    var sawScan = false
    val dcPred = new Array[Int](4)
    var eobrun = 0
    def be16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)

    /** Entropy-decode one scan starting at `start`; returns the offset
      * of the next marker after the entropy bytes, or -1 on corruption. */
    def decodeScan(scomp: Array[Int], sdc: Array[Int], sac: Array[Int],
                   ss: Int, se: Int, ah: Int, al: Int, start: Int): Int = {
      val ns = scomp.length
      val dcBand = ss == 0 && se == 0
      val fullBand = ss == 0 && se == 63
      if (progressive) {
        // progressive scans carry either the DC band or one AC band,
        // never both; AC bands are single-component (T.81 B.2.3)
        if (ss == 0 && !dcBand) return -1
        if (ss > 0 && (ns != 1 || se < ss || se > 63)) return -1
        if (ah > 13 || al > 13) return -1
      } else {
        if (!fullBand || ah != 0 || al != 0) return -1
      }
      var i = 0
      while (i < ns) {
        // DC refinement is raw bits — no Huffman table needed
        if ((dcBand || fullBand) && ah == 0 && dcT(sdc(i)) == null) return -1
        if ((ss > 0 || fullBand) && acT(sac(i)) == null) return -1
        i += 1
      }
      val reader = new BitReader(bytes, start)
      java.util.Arrays.fill(dcPred, 0)
      eobrun = 0
      def huffDecode(t: HuffDec): Int = {
        var code = 0
        var len = 0
        while (len < 16) {
          code = (code << 1) | reader.bit()
          len += 1
          val off = code - t.first(len)
          if (off >= 0 && off < t.count(len)) return t.values(t.index(len) + off)
          if (reader.bad) return -1
        }
        -1
      }
      def fullBlock(si: Int, bx: Int, by: Int): Boolean = {
        val ci = scomp(si)
        val cf = coefs(ci)
        val base = (by * blocksW(ci) + bx) * 64
        val s = huffDecode(dcT(sdc(si)))
        if (s < 0 || s > 11 || reader.bad) return false
        dcPred(ci) += extend(reader.bits(s), s)
        cf(base) = dcPred(ci)
        var k = 1
        while (k < 64) {
          val rs = huffDecode(acT(sac(si)))
          if (rs < 0 || reader.bad) return false
          if (rs == 0x00) k = 64 // EOB
          else if (rs == 0xf0) k += 16 // ZRL
          else {
            k += (rs >> 4)
            if (k > 63) return false
            val sz = rs & 0xf
            cf(base + Zigzag(k)) = extend(reader.bits(sz), sz)
            k += 1
          }
        }
        !reader.bad
      }
      def dcFirst(si: Int, bx: Int, by: Int): Boolean = {
        val ci = scomp(si)
        val s = huffDecode(dcT(sdc(si)))
        if (s < 0 || s > 11 || reader.bad) return false
        dcPred(ci) += extend(reader.bits(s), s)
        coefs(ci)((by * blocksW(ci) + bx) * 64) = dcPred(ci) << al
        !reader.bad
      }
      def dcRefine(si: Int, bx: Int, by: Int): Boolean = {
        val ci = scomp(si)
        if (reader.bit() == 1)
          coefs(ci)((by * blocksW(ci) + bx) * 64) |= (1 << al)
        !reader.bad
      }
      def acFirst(si: Int, bx: Int, by: Int): Boolean = {
        if (eobrun > 0) { eobrun -= 1; return true } // block inside an EOB run
        val ci = scomp(si)
        val cf = coefs(ci)
        val base = (by * blocksW(ci) + bx) * 64
        var k = ss
        while (k <= se) {
          val rs = huffDecode(acT(sac(si)))
          if (rs < 0 || reader.bad) return false
          val r = rs >> 4; val sz = rs & 15
          if (sz == 0) {
            if (r == 15) k += 16 // ZRL
            else { // EOBn: this block plus (run-1) more end here
              eobrun = (1 << r) - 1
              if (r > 0) eobrun += reader.bits(r)
              k = se + 1
            }
          } else {
            k += r
            if (k > se) return false
            cf(base + Zigzag(k)) = extend(reader.bits(sz), sz) << al
            k += 1
          }
        }
        !reader.bad
      }
      // jdphuff.c decode_mcu_AC_refine: newly-nonzero symbols interleave
      // with correction bits for already-nonzero coefficients; blocks
      // covered by an EOB run still consume correction bits
      def acRefine(si: Int, bx: Int, by: Int): Boolean = {
        val ci = scomp(si)
        val cf = coefs(ci)
        val base = (by * blocksW(ci) + bx) * 64
        val p1 = 1 << al; val m1 = -(1 << al)
        var k = ss
        if (eobrun == 0) {
          var outer = true
          while (outer && k <= se) {
            val rs = huffDecode(acT(sac(si)))
            if (rs < 0 || reader.bad) return false
            var r = rs >> 4
            var s = 0
            if ((rs & 15) != 0) {
              if ((rs & 15) != 1) return false // refinement admits only size 1
              s = if (reader.bit() == 1) p1 else m1
            } else if (r != 15) {
              eobrun = 1 << r
              if (r > 0) eobrun += reader.bits(r)
              outer = false // rest of this block joins the EOB-run tail below
            }
            if (outer) {
              // advance over r zero-history coefs, appending correction
              // bits to nonzero-history ones along the way
              var inner = true
              while (inner && k <= se) {
                val z = base + Zigzag(k)
                if (cf(z) != 0) {
                  if (reader.bit() == 1 && (cf(z) & p1) == 0)
                    cf(z) += (if (cf(z) >= 0) p1 else m1)
                  k += 1
                } else {
                  r -= 1
                  if (r < 0) inner = false // the target zero position: land here
                  else k += 1
                }
              }
              if (s != 0) {
                if (k > se) return false // run past the band: corrupt
                cf(base + Zigzag(k)) = s
              }
              k += 1
            }
            if (reader.bad) return false
          }
        }
        if (eobrun > 0) {
          while (k <= se) { // correction bits under the EOB run
            val z = base + Zigzag(k)
            if (cf(z) != 0) {
              if (reader.bit() == 1 && (cf(z) & p1) == 0)
                cf(z) += (if (cf(z) >= 0) p1 else m1)
            }
            k += 1
          }
          eobrun -= 1
        }
        !reader.bad
      }
      def blockOf(si: Int, bx: Int, by: Int): Boolean =
        if (fullBand) fullBlock(si, bx, by)
        else if (dcBand) { if (ah == 0) dcFirst(si, bx, by) else dcRefine(si, bx, by) }
        else { if (ah == 0) acFirst(si, bx, by) else acRefine(si, bx, by) }
      if (ns > 1) {
        // interleaved: the frame MCU grid, v×h blocks per component
        val nMcu = mcusX * mcusY
        var mcu = 0
        while (mcu < nMcu) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            if (!reader.restart()) return -1
            java.util.Arrays.fill(dcPred, 0); eobrun = 0
          }
          val mx = mcu % mcusX; val my = mcu / mcusX
          var si = 0
          while (si < ns) {
            val ci = scomp(si)
            var bi = 0
            while (bi < compV(ci)) {
              var bj = 0
              while (bj < compH(ci)) {
                if (!blockOf(si, mx * compH(ci) + bj, my * compV(ci) + bi))
                  return -1
                bj += 1
              }
              bi += 1
            }
            si += 1
          }
          mcu += 1
        }
      } else {
        // non-interleaved: the component's own (unpadded) block grid;
        // restart intervals count blocks, not frame MCUs
        val ci = scomp(0)
        val bw = ((w * compH(ci) + hmax - 1) / hmax + 7) / 8
        val bh = ((h * compV(ci) + vmax - 1) / vmax + 7) / 8
        val nB = bw * bh
        var b = 0
        while (b < nB) {
          if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
            if (!reader.restart()) return -1
            java.util.Arrays.fill(dcPred, 0); eobrun = 0
          }
          if (!blockOf(0, b % bw, b / bw)) return -1
          b += 1
        }
      }
      if (reader.bad) return -1
      // step to the next marker: skip pad bits, stuffed bytes, stray
      // RSTs and 0xff fill
      var p = reader.pos
      while (p + 1 < bytes.length) {
        if ((bytes(p) & 0xff) == 0xff) {
          val m2 = bytes(p + 1) & 0xff
          if (m2 == 0x00 || (m2 >= 0xd0 && m2 <= 0xd7)) p += 2
          else if (m2 == 0xff) p += 1
          else return p
        } else p += 1
      }
      -1
    }

    // ---- marker walk until EOI (hostile-length posture) ----
    var off = 2
    var eoi = false
    while (!eoi) {
      if (off + 2 > bytes.length) return None
      if ((bytes(off) & 0xff) != 0xff) return None
      val m = bytes(off + 1) & 0xff
      if (m == 0xff) off += 1 // fill byte before a marker
      else if (m == 0xd9) eoi = true
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) off += 2 // TEM / stray RST
      else {
        if (off + 4 > bytes.length) return None
        val len = be16(off + 2)
        val next = off + 2 + len
        if (len < 2 || next <= off || next > bytes.length) return None
        val body = off + 4
        var scanEnd = -1
        m match {
          case 0xdb => // DQT: one or more tables per segment
            var p = body
            while (p < next) {
              if (p >= bytes.length) return None
              val pq = (bytes(p) >> 4) & 0xf
              val tq = bytes(p) & 0xf
              if (pq != 0 || tq > 3 || p + 65 > next) return None // 8-bit only
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(Zigzag(k)) = bytes(p + 1 + k) & 0xff; k += 1 }
              qt(tq) = t
              p += 65
            }
          case 0xc4 => // DHT: one or more tables per segment
            var p = body
            while (p < next) {
              val tc = (bytes(p) >> 4) & 0xf
              val th = bytes(p) & 0xf
              if (tc > 1 || th > 3 || p + 17 > next) return None
              val b = new Array[Int](17)
              var total = 0
              var k = 1
              while (k <= 16) { b(k) = bytes(p + k) & 0xff; total += b(k); k += 1 }
              if (p + 17 + total > next) return None
              val v = Array.tabulate(total)(i => bytes(p + 17 + i) & 0xff)
              if (tc == 0) dcT(th) = buildDecode(b, v) else acT(th) = buildDecode(b, v)
              p += 17 + total
            }
          case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
            if (w != 0) return None // one frame per stream
            progressive = m == 0xc2
            if ((bytes(body) & 0xff) != 8) return None // 8-bit only
            h = be16(body + 1); w = be16(body + 3)
            nComp = bytes(body + 5) & 0xff
            // total-pixel cap (the pngPixels/GifCodec posture): a
            // 25-byte header must not command multi-GB coefficient
            // grids, and the padded grid arithmetic below must never
            // overflow Int — 2^26 pixels (8k×8k) is the envelope
            if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26) ||
                (nComp != 1 && nComp != 3)) return None
            if (body + 6 + nComp * 3 > next) return None
            compId = new Array[Int](nComp)
            compQ = new Array[Int](nComp)
            compH = new Array[Int](nComp); compV = new Array[Int](nComp)
            var c = 0
            while (c < nComp) {
              compId(c) = bytes(body + 6 + c * 3) & 0xff
              val hv = bytes(body + 6 + c * 3 + 1) & 0xff
              compH(c) = (hv >> 4) & 0xf; compV(c) = hv & 0xf
              // sampling factors 1–2 cover 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0
              // — the layouts real crawls are made of; exotic ratios
              // reject rather than risk a wrong upsample
              if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2)
                return None
              compQ(c) = bytes(body + 6 + c * 3 + 2) & 0xff
              c += 1
            }
            if (nComp == 1) { compH(0) = 1; compV(0) = 1 } // single-comp: no subsampling
            hmax = compH.max; vmax = compV.max
            mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            blocksW = Array.tabulate(nComp)(c2 => mcusX * compH(c2))
            coefs = Array.tabulate(nComp)(c2 =>
              new Array[Int](blocksW(c2) * mcusY * compV(c2) * 64))
          case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // extended/lossless/arithmetic: out of envelope
          case 0xdd => // DRI
            restartInterval = be16(body)
          case 0xda => // SOS
            if (w == 0) return None // scan before frame
            val ns = bytes(body) & 0xff
            if (ns < 1 || ns > 4 || body + 4 + ns * 2 > next) return None
            val scomp = new Array[Int](ns)
            val sdc = new Array[Int](ns); val sac = new Array[Int](ns)
            var c = 0
            while (c < ns) {
              val cs = bytes(body + 1 + c * 2) & 0xff
              val idx = compId.indexOf(cs)
              if (idx < 0) return None
              scomp(c) = idx
              sdc(c) = (bytes(body + 2 + c * 2) >> 4) & 0xf
              sac(c) = bytes(body + 2 + c * 2) & 0xf
              if (sdc(c) > 3 || sac(c) > 3) return None
              c += 1
            }
            val ss = bytes(body + 1 + ns * 2) & 0xff
            val se = bytes(body + 2 + ns * 2) & 0xff
            val ahal = bytes(body + 3 + ns * 2) & 0xff
            scanEnd = decodeScan(scomp, sdc, sac, ss, se,
              (ahal >> 4) & 0xf, ahal & 0xf, next)
            if (scanEnd < 0) return None
            sawScan = true
          case _ => // APPn/COM/DNL/...: skip
        }
        off = if (m == 0xda) scanEnd else next
      }
    }
    if (!sawScan) return None
    var c = 0
    while (c < nComp) {
      if (compQ(c) > 3 || qt(compQ(c)) == null) return None
      c += 1
    }
    // ---- dequantize + IDCT every padded block into planar output ----
    val planeW = blocksW.map(_ * 8)
    val planes = Array.tabulate(nComp)(c2 =>
      new Array[Double](planeW(c2) * mcusY * compV(c2) * 8))
    c = 0
    while (c < nComp) {
      val q = qt(compQ(c))
      val cf = coefs(c)
      val bw = blocksW(c)
      val nB = bw * mcusY * compV(c)
      var b = 0
      while (b < nB) {
        val dq = new Array[Double](64)
        var i = 0
        while (i < 64) { dq(i) = cf(b * 64 + i).toDouble * q(i); i += 1 }
        val block = idct(dq)
        val bx = b % bw; val by = b / bw
        i = 0
        while (i < 64) {
          planes(c)((by * 8 + i / 8) * planeW(c) + bx * 8 + i % 8) =
            block(i) + 128.0
          i += 1
        }
        b += 1
      }
      c += 1
    }
    // ---- upsample (nearest) + color convert to the BGR convention ----
    def clamp(v: Double): Int = math.max(0, math.min(255, math.round(v).toInt))
    def sample(c2: Int, x: Int, yy: Int): Double =
      planes(c2)((yy * compV(c2) / vmax) * planeW(c2) + (x * compH(c2) / hmax))
    val px = new Array[Byte](w * h * 3)
    var yy = 0
    while (yy < h) {
      var x = 0
      while (x < w) {
        val o = (yy * w + x) * 3
        if (nComp == 1) {
          val g = clamp(sample(0, x, yy)).toByte
          px(o) = g; px(o + 1) = g; px(o + 2) = g
        } else {
          val yv = sample(0, x, yy)
          val cb = sample(1, x, yy) - 128.0
          val cr = sample(2, x, yy) - 128.0
          px(o) = clamp(yv + 1.772 * cb).toByte
          px(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr).toByte
          px(o + 2) = clamp(yv + 1.402 * cr).toByte
        }
        x += 1
      }
      yy += 1
    }
    Some((w, h, px))
  }
}
