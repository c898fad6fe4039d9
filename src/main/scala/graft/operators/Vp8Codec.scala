package graft.operators

/** Lossy WebP: a from-scratch VP8 KEY-FRAME decoder (RFC 6386),
  * LUMA-only output — closing the blind spot the round-14 boundary
  * paragraph documented (most `.webp` bytes actually served are lossy
  * VP8, and perceptual dedup hashes need only luma anyway: dHash /
  * aHash grayscale on (y,y,y) is y for any weighting).
  *
  * Scope and posture:
  *  - Key frames only (every lossy WebP still image IS one VP8 key
  *    frame — RIFF "VP8 " chunk); anything else → None, never a
  *    guess. Same reject-never-mis-decode contract as [[WebpCodec]],
  *    [[JpegCodec]] and the rest of the codec tier: hostile input is
  *    quarantined by the caller, not thrown at executors.
  *  - The FULL bitstream is parsed — boolean arithmetic decoder,
  *    segmentation, loop-filter deltas, coefficient-probability
  *    updates, token decoding for luma AND chroma (the entropy stream
  *    is sequential; chroma tokens must be consumed to stay in sync)
  *    — but only luma is dequantized, predicted (16x16 DC/V/H/TM and
  *    all ten 4x4 B_PRED modes), inverse-transformed (WHT + DCT) and
  *    loop-filtered (normal and simple filters).
  *  - Verified pixel-exact against libwebp's own Y-plane output on
  *    the committed golden corpus (tools/gen_vp8_goldens.py): VP8
  *    reconstruction is bit-exact by spec construction, so a single
  *    wrong table entry, edge pixel, or filter threshold shows up as
  *    a byte mismatch, not a "looks fine".
  *
  * Constant tables come from [[Vp8Tables]] (RFC 6386 §11/13/14,
  * machine-transcribed — see tools/extract_vp8_tables.py).
  */
private[graft] object Vp8Codec {

  // ------------------------------------------------------------------
  // boolean arithmetic decoder (RFC 6386 §7)
  // ------------------------------------------------------------------

  private final class BoolDecoder(data: Array[Byte], start: Int, end: Int) {
    private var value = 0
    private var range = 255
    private var bitCount = 0
    private var pos = start
    private var padded = 0 // zero bytes consumed past `end`
    var bad = false // severely truncated stream

    // init: two bytes big-endian
    value = (nextByte() << 8) | nextByte()

    private def nextByte(): Int =
      if (pos < end) { val b = data(pos) & 0xff; pos += 1; b }
      else { padded += 1; if (padded > 8) bad = true; 0 }

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) { ret = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) { bitCount = 0; value |= nextByte() }
      }
      ret
    }

    def flag(): Int = bool(128)

    /** n-bit unsigned literal, MSB first (RFC L(n)). */
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }

    /** L(n) then a sign flag. */
    def signedLiteral(n: Int): Int = {
      val v = literal(n)
      if (flag() == 1) -v else v
    }

    /** Walk a tree (positive entries = next node index, entries ≤ 0 =
      * leaf −value), starting at node index `startIdx`. */
    def tree(t: Array[Int], probs: Array[Int], probOff: Int, startIdx: Int = 0): Int = {
      var i = startIdx
      do {
        i = t(i + bool(probs(probOff + (i >> 1))))
      } while (i > 0)
      -i
    }
  }

  // ------------------------------------------------------------------
  // trees and small tables (RFC 6386 §8.2, §11, §13)
  // ------------------------------------------------------------------

  // intra modes: DC=0 V=1 H=2 TM=3 B_PRED=4; 4x4 ids follow the
  // EXTRACTED kfBModeProbs table's context indexing (libwebp's enum,
  // which lists the modes in the tree's leaf order): DC=0 TM=1 VE=2
  // HE=3 RD=4 VR=5 LD=6 VL=7 HD=8 HU=9. The bit-pattern → mode
  // mapping below is the RFC's; only the numeric ids are the table's.
  private val KfYModeTree = Array(-4, 2, 4, 6, -0, -1, -2, -3)
  private val KfYModeProbs = Array(145, 156, 163, 128)
  private val UvModeTree = Array(-0, 2, -1, 4, -2, -3)
  private val KfUvModeProbs = Array(142, 114, 183)
  private val BModeTree = Array(
    -0, 2, // B_DC   "0"
    -1, 4, // B_TM   "10"
    -2, 6, // B_VE   "110"
    8, 12,
    -3, 10, // B_HE  "11100"
    -4, -5, // B_RD "111010", B_VR "111011"
    -6, 14, // B_LD  "111100"
    -7, 16, // B_VL  "1111010"
    -8, -9) // B_HD "1111110", B_HU "1111111"
  private val SegmentTree = Array(2, 4, -0, -1, -2, -3)

  // token tree: leaves are token ids (EOB=11, literal 0..4 = 0..4,
  // cat1..6 = 5..10); "start at node 2" skips EOB after a zero run
  private val TokenTree = Array(
    -11, 2, // EOB
    -0, 4,
    -1, 6,
    8, 12,
    -2, 10,
    -3, -4,
    14, 16,
    -5, -6, // cat1, cat2
    18, 20,
    -7, -8, // cat3, cat4
    -9, -10) // cat5, cat6
  private val CatBase = Array(5, 7, 11, 19, 35, 67)
  private val CatProbs: Array[Array[Int]] = Array(
    Array(159),
    Array(165, 145),
    Array(173, 148, 140),
    Array(176, 155, 140, 135),
    Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
  private val CoeffBands = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
  private val Zigzag = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  private def clampQ(i: Int): Int = if (i < 0) 0 else if (i > 127) 127 else i

  // ------------------------------------------------------------------
  // entry points
  // ------------------------------------------------------------------

  /** RIFF walk → VP8 key-frame luma. Returns (width, height, w*h luma
    * bytes) or None. Rejects VP8X files carrying an ALPH chunk (the
    * alpha plane would change what the image shows — decode nothing
    * rather than half of it). */
  def decodeLuma(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val chunk = findVp8Chunk(bytes)
    if (chunk == null) None else decodeFrameLuma(chunk)
  }

  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def findVp8Chunk(b: Array[Byte]): Array[Byte] = {
    def tag(off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (b.length < 20 || tag(0) != "RIFF" || tag(8) != "WEBP") return null
    var off = 12
    var vp8: Array[Byte] = null
    while (off + 8 <= b.length) {
      val t = tag(off)
      val len = le32(b, off + 4)
      if (len < 0 || off + 8 + len > b.length) return null
      if (t == "ALPH") return null // luma-only decode must not drop alpha silently
      if (t == "VP8 " && vp8 == null)
        vp8 = java.util.Arrays.copyOfRange(b, off + 8, (off + 8 + len).toInt)
      off += 8 + len.toInt + (len.toInt & 1)
    }
    vp8
  }

  /** Decode one VP8 key frame to its luma plane. */
  private[graft] def decodeFrameLuma(d: Array[Byte]): Option[(Int, Int, Array[Byte])] = try {
    if (d.length < 10) return None
    val tag0 = (d(0) & 0xff) | ((d(1) & 0xff) << 8) | ((d(2) & 0xff) << 16)
    val keyFrame = (tag0 & 1) == 0
    val version = (tag0 >> 1) & 7
    val firstPartSize = tag0 >> 5
    if (!keyFrame || version > 3) return None
    if ((d(3) & 0xff) != 0x9d || (d(4) & 0xff) != 0x01 || (d(5) & 0xff) != 0x2a) return None
    val w = ((d(6) & 0xff) | ((d(7) & 0xff) << 8)) & 0x3fff
    val h = ((d(8) & 0xff) | ((d(9) & 0xff) << 8)) & 0x3fff
    if (w == 0 || h == 0 || w.toLong * h > 16384L * 16384L) return None
    val part0End = 10 + firstPartSize
    if (part0End > d.length) return None
    val bd = new BoolDecoder(d, 10, part0End)

    bd.literal(1) // color space (key frame: must be 0, but tolerate)
    bd.literal(1) // clamping type

    // --- segmentation -------------------------------------------------
    var segmentEnabled = false
    var updateSegMap = false
    var segAbs = false
    val segQ = new Array[Int](4)
    val segLf = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    if (bd.flag() == 1) {
      segmentEnabled = true
      updateSegMap = bd.flag() == 1
      val updateData = bd.flag() == 1
      if (updateData) {
        segAbs = bd.flag() == 1
        var i = 0
        while (i < 4) { if (bd.flag() == 1) segQ(i) = bd.signedLiteral(7); i += 1 }
        i = 0
        while (i < 4) { if (bd.flag() == 1) segLf(i) = bd.signedLiteral(6); i += 1 }
      }
      if (updateSegMap) {
        var i = 0
        while (i < 3) { if (bd.flag() == 1) segTreeProbs(i) = bd.literal(8); i += 1 }
      }
    }

    // --- loop filter ---------------------------------------------------
    val simpleFilter = bd.literal(1) == 1
    val filterLevel = bd.literal(6)
    val sharpness = bd.literal(3)
    var lfDeltaEnabled = false
    val refLfDelta = new Array[Int](4)
    val modeLfDelta = new Array[Int](4)
    if (bd.flag() == 1) {
      lfDeltaEnabled = true
      if (bd.flag() == 1) {
        var i = 0
        while (i < 4) { if (bd.flag() == 1) refLfDelta(i) = bd.signedLiteral(6); i += 1 }
        i = 0
        while (i < 4) { if (bd.flag() == 1) modeLfDelta(i) = bd.signedLiteral(6); i += 1 }
      }
    }

    // --- residual partitions -------------------------------------------
    val nParts = 1 << bd.literal(2)
    val sizesAt = part0End
    val partsDataAt = sizesAt + 3 * (nParts - 1)
    if (partsDataAt > d.length) return None
    val partStart = new Array[Int](nParts)
    val partEnd = new Array[Int](nParts)
    var cursor = partsDataAt
    var pi = 0
    while (pi < nParts) {
      val size =
        if (pi + 1 < nParts) {
          val o = sizesAt + 3 * pi
          (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8) | ((d(o + 2) & 0xff) << 16)
        } else d.length - cursor
      if (size < 0 || cursor + size > d.length) return None
      partStart(pi) = cursor
      partEnd(pi) = cursor + size
      cursor += size
      pi += 1
    }
    val parts = Array.tabulate(nParts)(i => new BoolDecoder(d, partStart(i), partEnd(i)))

    // --- quantizers -----------------------------------------------------
    val yAcQi = bd.literal(7)
    def qDelta(): Int = if (bd.flag() == 1) bd.signedLiteral(4) else 0
    val yDcDelta = qDelta()
    val y2DcDelta = qDelta()
    val y2AcDelta = qDelta()
    qDelta() // uv dc (parsed; chroma not reconstructed)
    qDelta() // uv ac
    // per-segment luma quantizers
    val nSeg = if (segmentEnabled) 4 else 1
    val qY1Dc = new Array[Int](nSeg)
    val qY1Ac = new Array[Int](nSeg)
    val qY2Dc = new Array[Int](nSeg)
    val qY2Ac = new Array[Int](nSeg)
    var s = 0
    while (s < nSeg) {
      val base =
        if (!segmentEnabled) yAcQi
        else if (segAbs) segQ(s)
        else yAcQi + segQ(s)
      val qi = clampQ(base)
      qY1Dc(s) = Vp8Tables.dcQLookup(clampQ(qi + yDcDelta))
      qY1Ac(s) = Vp8Tables.acQLookup(qi)
      qY2Dc(s) = Vp8Tables.dcQLookup(clampQ(qi + y2DcDelta)) * 2
      qY2Ac(s) = { val v = Vp8Tables.acQLookup(clampQ(qi + y2AcDelta)) * 155 / 100; if (v < 8) 8 else v }
      s += 1
    }

    // --- coefficient probability updates --------------------------------
    bd.literal(1) // refresh entropy probs (key frame: always acts as 1)
    val coeffProbs = Vp8Tables.coeffProbs.clone()
    var idx = 0
    while (idx < 1056) {
      if (bd.bool(Vp8Tables.coeffUpdateProbs(idx)) == 1)
        coeffProbs(idx) = bd.literal(8)
      idx += 1
    }
    val skipEnabled = bd.literal(1) == 1
    val probSkipFalse = if (skipEnabled) bd.literal(8) else 0

    // --- per-macroblock decode -------------------------------------------
    val mbW = (w + 15) >> 4
    val mbH = (h + 15) >> 4
    val planeW = mbW << 4
    val planeH = mbH << 4
    val luma = new Array[Byte](planeW * planeH)

    // nonzero contexts
    val topNzY = new Array[Boolean](mbW * 4)
    val topNzU = new Array[Boolean](mbW * 2)
    val topNzV = new Array[Boolean](mbW * 2)
    val topNzY2 = new Array[Boolean](mbW)
    val leftNzY = new Array[Boolean](4)
    val leftNzU = new Array[Boolean](2)
    val leftNzV = new Array[Boolean](2)
    var leftNzY2 = false

    // sub-mode context rows (libwebp numbering; non-B_PRED MBs
    // contribute their 16x16 mode's 4x4 analogue: DC→B_DC, V→B_VE,
    // H→B_HE, TM→B_TM)
    val ymodeToB = Array(0, 2, 3, 1)
    val topBModes = new Array[Int](mbW * 4) // B_DC off-frame
    val leftBModes = new Array[Int](4)

    // loop-filter metadata per MB
    val mbSegment = new Array[Int](mbW * mbH)
    val mbIsB = new Array[Boolean](mbW * mbH)
    val mbHasCoeffs = new Array[Boolean](mbW * mbH)

    val coeffs = new Array[Int](16) // natural order, one 4x4 block
    val dcBuf = new Array[Int](16) // WHT output
    val subModes = new Array[Int](16)

    /** Decode one token block. Returns a 2-bit status: bit 0 set iff any
      * token was consumed past the start index (the reference decoders'
      * `nz > first` — this, NOT the decoded values, feeds the neighbor
      * nonzero CONTEXT, because a spec-legal block of all zero tokens
      * still advances the entropy context); bit 1 set iff any decoded
      * coefficient VALUE is nonzero (feeds the idct/filter decisions).
      * `acOnly`: coefficients start at index 1 (luma when Y2 present).
      * Dequantized values land in `coeffs` (natural order); when
      * `dequantDc`/`dequantAc` are 0 the block is parse-only. */
    def decodeBlock(part: BoolDecoder, typ: Int, ctx0: Int, acOnly: Boolean,
                    dequantDc: Int, dequantAc: Int): Int = {
      java.util.Arrays.fill(coeffs, 0)
      var n = if (acOnly) 1 else 0
      val nFirst = n
      var ctx = ctx0
      var nz = false
      var startIdx = 0 // first token may be EOB
      var done = false
      while (!done && n < 16) {
        val band = CoeffBands(n)
        val probOff = ((typ * 8 + band) * 3 + ctx) * 11
        val tok = part.tree(TokenTree, coeffProbs, probOff, startIdx)
        if (tok == 11) done = true // EOB
        else if (tok == 0) {
          // zero: next token cannot be EOB
          startIdx = 2
          ctx = 0
          n += 1
        } else {
          var v =
            if (tok <= 4) tok
            else {
              val cat = tok - 5
              val probs = CatProbs(cat)
              var extra = 0
              var i = 0
              while (i < probs.length) { extra = (extra << 1) | part.bool(probs(i)); i += 1 }
              CatBase(cat) + extra
            }
          ctx = if (v == 1) 1 else 2
          if (part.flag() == 1) v = -v
          val pos = Zigzag(n)
          coeffs(pos) = v * (if (pos == 0) dequantDc else dequantAc)
          nz = true
          startIdx = 0
          n += 1
        }
      }
      (if (n > nFirst) 1 else 0) | (if (nz) 2 else 0)
    }

    /** 4x4 inverse DCT + add into luma at (bx, by) pixel coords. */
    def idctAdd(bx: Int, by: Int): Unit = {
      val tmp = new Array[Int](16)
      var i = 0
      while (i < 4) {
        val i0 = coeffs(i); val i1 = coeffs(i + 4); val i2 = coeffs(i + 8); val i3 = coeffs(i + 12)
        val a1 = i0 + i2
        val b1 = i0 - i2
        val t1 = (i1 * 35468) >> 16
        val t2 = i3 + ((i3 * 20091) >> 16)
        val c1 = t1 - t2
        val t3 = i1 + ((i1 * 20091) >> 16)
        val t4 = (i3 * 35468) >> 16
        val d1 = t3 + t4
        tmp(i) = a1 + d1; tmp(i + 12) = a1 - d1
        tmp(i + 4) = b1 + c1; tmp(i + 8) = b1 - c1
        i += 1
      }
      i = 0
      while (i < 4) {
        val r = i * 4
        val i0 = tmp(r); val i1 = tmp(r + 1); val i2 = tmp(r + 2); val i3 = tmp(r + 3)
        val a1 = i0 + i2
        val b1 = i0 - i2
        val t1 = (i1 * 35468) >> 16
        val t2 = i3 + ((i3 * 20091) >> 16)
        val c1 = t1 - t2
        val t3 = i1 + ((i1 * 20091) >> 16)
        val t4 = (i3 * 35468) >> 16
        val d1 = t3 + t4
        val base = (by + i) * planeW + bx
        def st(o: Int, v: Int): Unit = {
          val p = (luma(base + o) & 0xff) + ((v + 4) >> 3)
          luma(base + o) = (if (p < 0) 0 else if (p > 255) 255 else p).toByte
        }
        st(0, a1 + d1); st(3, a1 - d1); st(1, b1 + c1); st(2, b1 - c1)
        i += 1
      }
    }

    /** Inverse WHT: coeffs (y2 block) → 16 luma DC values in dcBuf. */
    def iwht(): Unit = {
      val tmp = new Array[Int](16)
      var i = 0
      while (i < 4) {
        val a1 = coeffs(i) + coeffs(i + 12)
        val b1 = coeffs(i + 4) + coeffs(i + 8)
        val c1 = coeffs(i + 4) - coeffs(i + 8)
        val d1 = coeffs(i) - coeffs(i + 12)
        tmp(i) = a1 + b1; tmp(i + 4) = c1 + d1
        tmp(i + 8) = a1 - b1; tmp(i + 12) = d1 - c1
        i += 1
      }
      i = 0
      while (i < 4) {
        val r = i * 4
        val a1 = tmp(r) + tmp(r + 3)
        val b1 = tmp(r + 1) + tmp(r + 2)
        val c1 = tmp(r + 1) - tmp(r + 2)
        val d1 = tmp(r) - tmp(r + 3)
        dcBuf(r) = (a1 + b1 + 3) >> 3
        dcBuf(r + 1) = (c1 + d1 + 3) >> 3
        dcBuf(r + 2) = (a1 - b1 + 3) >> 3
        dcBuf(r + 3) = (d1 - c1 + 3) >> 3
        i += 1
      }
    }

    // prediction helpers: read reconstructed neighbors with VP8's
    // off-frame conventions (above = 127, left = 129)
    def pix(x: Int, y: Int): Int =
      if (y < 0) 127
      else if (x < 0) 129
      else luma(y * planeW + x) & 0xff
    def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

    /** Above pixel for B_PRED, with the VP8 above-right rules: within
      * the frame's top row everything above is 127; the above-right of
      * the rightmost subblock column uses the ABOVE MB ROW's pixels
      * (never in-MB reconstruction), clamped to the plane's last
      * column beyond the right edge. `mbTopY` is the current MB's top
      * pixel row. */
    def abovePix(x: Int, y: Int, mbTopY: Int, mbRightX: Int): Int = {
      if (y < 0) 127
      else if (x < mbRightX) pix(x, y)
      else {
        // above-right beyond the current MB: always from the row
        // above the MB (reconstruction order makes in-MB pixels at
        // that column unavailable), edge-clamped
        val yy = mbTopY - 1
        if (yy < 0) 127
        else {
          val xx = if (x >= planeW) planeW - 1 else x
          luma(yy * planeW + xx) & 0xff
        }
      }
    }

    def predict16(mbX: Int, mbY: Int, mode: Int): Unit = {
      val x0 = mbX << 4
      val y0 = mbY << 4
      mode match {
        case 0 => // DC
          var sum = 0
          var n = 0
          if (mbY > 0) { var i = 0; while (i < 16) { sum += pix(x0 + i, y0 - 1); i += 1 }; n += 16 }
          if (mbX > 0) { var i = 0; while (i < 16) { sum += pix(x0 - 1, y0 + i); i += 1 }; n += 16 }
          val dc = if (n == 0) 128 else (sum + (n >> 1)) / n
          var y = 0
          while (y < 16) {
            java.util.Arrays.fill(luma, (y0 + y) * planeW + x0, (y0 + y) * planeW + x0 + 16, dc.toByte)
            y += 1
          }
        case 1 => // V
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) { luma((y0 + y) * planeW + x0 + x) = pix(x0 + x, y0 - 1).toByte; x += 1 }
            y += 1
          }
        case 2 => // H
          var y = 0
          while (y < 16) {
            val v = pix(x0 - 1, y0 + y).toByte
            java.util.Arrays.fill(luma, (y0 + y) * planeW + x0, (y0 + y) * planeW + x0 + 16, v)
            y += 1
          }
        case _ => // TM
          val tl = pix(x0 - 1, y0 - 1)
          var y = 0
          while (y < 16) {
            val l = pix(x0 - 1, y0 + y)
            var x = 0
            while (x < 16) {
              luma((y0 + y) * planeW + x0 + x) = clamp255(l + pix(x0 + x, y0 - 1) - tl).toByte
              x += 1
            }
            y += 1
          }
      }
    }

    /** One 4x4 B_PRED subblock prediction at pixel (x0, y0). */
    def predict4(x0: Int, y0: Int, mode: Int, mbTopY: Int, mbRightX: Int): Unit = {
      // neighbor fetch — A[-1..7] above (incl. above-left and 4
      // above-right), L[0..3] left
      val A = new Array[Int](9) // A(0) = above-left, A(1..8) = above row
      A(0) = if (y0 == 0) 127 else if (x0 == 0) 129 else pix(x0 - 1, y0 - 1)
      var i = 0
      while (i < 8) { A(i + 1) = abovePix(x0 + i, y0 - 1, mbTopY, mbRightX); i += 1 }
      val L = new Array[Int](4)
      i = 0
      while (i < 4) { L(i) = pix(x0 - 1, y0 + i); i += 1 }
      def set(x: Int, y: Int, v: Int): Unit = luma((y0 + y) * planeW + x0 + x) = v.toByte
      def avg3(a: Int, b: Int, c: Int): Int = (a + 2 * b + c + 2) >> 2
      def avg2(a: Int, b: Int): Int = (a + b + 1) >> 1
      mode match {
        case 0 => // B_DC
          var sum = 4
          i = 0
          while (i < 4) { sum += A(1 + i) + L(i); i += 1 }
          val dc = sum >> 3
          var y = 0
          while (y < 4) { var x = 0; while (x < 4) { set(x, y, dc); x += 1 }; y += 1 }
        case 1 => // B_TM
          val tl = A(0)
          var y = 0
          while (y < 4) {
            var x = 0
            while (x < 4) { set(x, y, clamp255(L(y) + A(1 + x) - tl)); x += 1 }
            y += 1
          }
        case 2 => // B_VE: 3-tap smoothed above
          val p = Array(
            avg3(A(0), A(1), A(2)), avg3(A(1), A(2), A(3)),
            avg3(A(2), A(3), A(4)), avg3(A(3), A(4), A(5)))
          var y = 0
          while (y < 4) { var x = 0; while (x < 4) { set(x, y, p(x)); x += 1 }; y += 1 }
        case 3 => // B_HE
          val p = Array(
            avg3(A(0), L(0), L(1)), avg3(L(0), L(1), L(2)),
            avg3(L(1), L(2), L(3)), avg3(L(2), L(3), L(3)))
          var y = 0
          while (y < 4) { var x = 0; while (x < 4) { set(x, y, p(y)); x += 1 }; y += 1 }
        case 6 => // B_LD (down-left)
          def a(k: Int) = A(1 + k)
          set(0, 0, avg3(a(0), a(1), a(2)))
          set(1, 0, avg3(a(1), a(2), a(3))); set(0, 1, avg3(a(1), a(2), a(3)))
          set(2, 0, avg3(a(2), a(3), a(4))); set(1, 1, avg3(a(2), a(3), a(4))); set(0, 2, avg3(a(2), a(3), a(4)))
          set(3, 0, avg3(a(3), a(4), a(5))); set(2, 1, avg3(a(3), a(4), a(5))); set(1, 2, avg3(a(3), a(4), a(5))); set(0, 3, avg3(a(3), a(4), a(5)))
          set(3, 1, avg3(a(4), a(5), a(6))); set(2, 2, avg3(a(4), a(5), a(6))); set(1, 3, avg3(a(4), a(5), a(6)))
          set(3, 2, avg3(a(5), a(6), a(7))); set(2, 3, avg3(a(5), a(6), a(7)))
          set(3, 3, avg3(a(6), a(7), a(7)))
        case 4 => // B_RD (down-right)
          val e = Array(L(3), L(2), L(1), L(0), A(0), A(1), A(2), A(3), A(4))
          var y = 0
          while (y < 4) {
            var x = 0
            while (x < 4) {
              val k = 3 - y + x
              set(x, y, avg3(e(k), e(k + 1), e(k + 2)))
              x += 1
            }
            y += 1
          }
        case 5 => // B_VR
          set(0, 0, avg2(A(0), A(1))); set(1, 0, avg2(A(1), A(2)))
          set(2, 0, avg2(A(2), A(3))); set(3, 0, avg2(A(3), A(4)))
          set(0, 1, avg3(L(0), A(0), A(1))); set(1, 1, avg3(A(0), A(1), A(2)))
          set(2, 1, avg3(A(1), A(2), A(3))); set(3, 1, avg3(A(2), A(3), A(4)))
          set(0, 2, avg3(L(1), L(0), A(0)))
          set(1, 2, avg2(A(0), A(1))); set(2, 2, avg2(A(1), A(2))); set(3, 2, avg2(A(2), A(3)))
          set(0, 3, avg3(L(2), L(1), L(0)))
          set(1, 3, avg3(L(0), A(0), A(1))); set(2, 3, avg3(A(0), A(1), A(2))); set(3, 3, avg3(A(1), A(2), A(3)))
        case 7 => // B_VL
          def a(k: Int) = A(1 + k)
          set(0, 0, avg2(a(0), a(1))); set(1, 0, avg2(a(1), a(2)))
          set(2, 0, avg2(a(2), a(3))); set(3, 0, avg2(a(3), a(4)))
          set(0, 1, avg3(a(0), a(1), a(2))); set(1, 1, avg3(a(1), a(2), a(3)))
          set(2, 1, avg3(a(2), a(3), a(4))); set(3, 1, avg3(a(3), a(4), a(5)))
          set(0, 2, avg2(a(1), a(2))); set(1, 2, avg2(a(2), a(3))); set(2, 2, avg2(a(3), a(4)))
          set(0, 3, avg3(a(1), a(2), a(3))); set(1, 3, avg3(a(2), a(3), a(4))); set(2, 3, avg3(a(3), a(4), a(5)))
          set(3, 2, avg3(a(4), a(5), a(6)))
          set(3, 3, avg3(a(5), a(6), a(7)))
        case 8 => // B_HD
          set(0, 0, avg2(L(0), A(0))); set(1, 0, avg3(L(0), A(0), A(1)))
          set(2, 0, avg3(A(0), A(1), A(2))); set(3, 0, avg3(A(1), A(2), A(3)))
          set(0, 1, avg2(L(1), L(0))); set(1, 1, avg3(L(1), L(0), A(0)))
          set(2, 1, avg2(L(0), A(0))); set(3, 1, avg3(L(0), A(0), A(1)))
          set(0, 2, avg2(L(2), L(1))); set(1, 2, avg3(L(2), L(1), L(0)))
          set(2, 2, avg2(L(1), L(0))); set(3, 2, avg3(L(1), L(0), A(0)))
          set(0, 3, avg2(L(3), L(2))); set(1, 3, avg3(L(3), L(2), L(1)))
          set(2, 3, avg2(L(2), L(1))); set(3, 3, avg3(L(2), L(1), L(0)))
        case _ => // B_HU
          set(0, 0, avg2(L(0), L(1))); set(1, 0, avg3(L(0), L(1), L(2)))
          set(2, 0, avg2(L(1), L(2))); set(3, 0, avg3(L(1), L(2), L(3)))
          set(0, 1, avg2(L(1), L(2))); set(1, 1, avg3(L(1), L(2), L(3)))
          set(2, 1, avg2(L(2), L(3))); set(3, 1, avg3(L(2), L(3), L(3)))
          set(0, 2, avg2(L(2), L(3))); set(1, 2, avg3(L(2), L(3), L(3)))
          set(2, 2, L(3)); set(3, 2, L(3))
          set(0, 3, L(3)); set(1, 3, L(3)); set(2, 3, L(3)); set(3, 3, L(3))
      }
    }

    var mbY = 0
    while (mbY < mbH) {
      java.util.Arrays.fill(leftNzY, false)
      java.util.Arrays.fill(leftNzU, false)
      java.util.Arrays.fill(leftNzV, false)
      leftNzY2 = false
      java.util.Arrays.fill(leftBModes, 0)
      val part = parts(mbY % nParts)
      var mbX = 0
      while (mbX < mbW) {
        val mbIdx = mbY * mbW + mbX
        val segment = if (segmentEnabled && updateSegMap) bd.tree(SegmentTree, segTreeProbs, 0)
                      else 0
        mbSegment(mbIdx) = segment
        val skip = if (skipEnabled) bd.bool(probSkipFalse) == 1 else false
        val yMode = bd.tree(KfYModeTree, KfYModeProbs, 0)
        val isB = yMode == 4
        mbIsB(mbIdx) = isB
        if (isB) {
          var sb = 0
          while (sb < 16) {
            val sx = sb & 3
            val sy = sb >> 2
            val above = if (sy == 0) topBModes(mbX * 4 + sx) else subModes(sb - 4)
            val left = if (sx == 0) leftBModes(sy) else subModes(sb - 1)
            subModes(sb) = bd.tree(BModeTree, Vp8Tables.kfBModeProbs,
              (above * 10 + left) * 9)
            sb += 1
          }
          var i = 0
          while (i < 4) {
            topBModes(mbX * 4 + i) = subModes(12 + i)
            leftBModes(i) = subModes(i * 4 + 3)
            i += 1
          }
        } else {
          val b = ymodeToB(yMode)
          var i = 0
          while (i < 4) { topBModes(mbX * 4 + i) = b; leftBModes(i) = b; i += 1 }
        }
        bd.tree(UvModeTree, KfUvModeProbs, 0) // uv mode (chroma skipped)
        if (bd.bad) return None

        // ---- residuals ----
        val x0 = mbX << 4
        val y0 = mbY << 4
        var anyNz = false
        if (skip) {
          java.util.Arrays.fill(leftNzY, false)
          java.util.Arrays.fill(leftNzU, false)
          java.util.Arrays.fill(leftNzV, false)
          var i = 0
          while (i < 4) { topNzY(mbX * 4 + i) = false; i += 1 }
          topNzU(mbX * 2) = false; topNzU(mbX * 2 + 1) = false
          topNzV(mbX * 2) = false; topNzV(mbX * 2 + 1) = false
          if (!isB) { leftNzY2 = false; topNzY2(mbX) = false }
          // prediction still runs; residual is zero
          if (!isB) predict16(mbX, mbY, yMode)
          else {
            var sb = 0
            while (sb < 16) {
              predict4(x0 + ((sb & 3) << 2), y0 + ((sb >> 2) << 2), subModes(sb),
                y0, x0 + 16)
              sb += 1
            }
          }
        } else {
          val sg = if (segmentEnabled) segment else 0
          var hasY2 = false
          if (!isB) {
            // Y2 (WHT) block: token type 1
            hasY2 = true
            val ctx = (if (topNzY2(mbX)) 1 else 0) + (if (leftNzY2) 1 else 0)
            val st = decodeBlock(part, 1, ctx, acOnly = false, qY2Dc(sg), qY2Ac(sg))
            val consumed = (st & 1) != 0
            topNzY2(mbX) = consumed
            leftNzY2 = consumed
            anyNz ||= (st & 2) != 0
            iwht()
            predict16(mbX, mbY, yMode)
          }
          // 16 luma blocks: type 0 (with Y2) or 3 (B_PRED)
          val typ = if (hasY2) 0 else 3
          var sb = 0
          while (sb < 16) {
            val sx = sb & 3
            val sy = sb >> 2
            val bx = x0 + (sx << 2)
            val by = y0 + (sy << 2)
            val ctx = (if (topNzY(mbX * 4 + sx)) 1 else 0) + (if (leftNzY(sy)) 1 else 0)
            if (isB) predict4(bx, by, subModes(sb), y0, x0 + 16)
            val st = decodeBlock(part, typ, ctx, acOnly = hasY2, qY1Dc(sg), qY1Ac(sg))
            val nzVal = (st & 2) != 0
            if (hasY2) coeffs(0) = dcBuf(sb)
            // a DC-only block from the WHT still needs the transform
            if (nzVal || (hasY2 && coeffs(0) != 0)) idctAdd(bx, by)
            val consumed = (st & 1) != 0
            topNzY(mbX * 4 + sx) = consumed
            leftNzY(sy) = consumed
            anyNz ||= nzVal
            sb += 1
          }
          // chroma blocks: parse-only (type 2), context maintained
          var pl = 0
          while (pl < 2) {
            val topNz = if (pl == 0) topNzU else topNzV
            val leftNz = if (pl == 0) leftNzU else leftNzV
            var cb = 0
            while (cb < 4) {
              val cx = cb & 1
              val cy = cb >> 1
              val ctx = (if (topNz(mbX * 2 + cx)) 1 else 0) + (if (leftNz(cy)) 1 else 0)
              val st = decodeBlock(part, 2, ctx, acOnly = false, 0, 0)
              val consumed = (st & 1) != 0
              topNz(mbX * 2 + cx) = consumed
              leftNz(cy) = consumed
              anyNz ||= (st & 2) != 0
              cb += 1
            }
            pl += 1
          }
          if (part.bad) return None
        }
        mbHasCoeffs(mbIdx) = anyNz
        mbX += 1
      }
      mbY += 1
    }

    // ---- loop filter (luma) --------------------------------------------
    if (filterLevel > 0) {
      def clampS(v: Int): Int = if (v < -128) -128 else if (v > 127) 127 else v
      // per-segment base level
      val segLevel = new Array[Int](nSeg)
      var i = 0
      while (i < nSeg) {
        val base =
          if (!segmentEnabled) filterLevel
          else if (segAbs) segLf(i)
          else filterLevel + segLf(i)
        segLevel(i) = if (base < 0) 0 else if (base > 63) 63 else base
        i += 1
      }
      def mbLevel(idx: Int): Int = {
        var l = segLevel(mbSegment(idx))
        if (lfDeltaEnabled) {
          l += refLfDelta(0) // key frame: intra reference
          if (mbIsB(idx)) l += modeLfDelta(0)
        }
        if (l < 0) 0 else if (l > 63) 63 else l
      }

      def filterRow(off: Int, step: Int, interior: Int, edge: Int, hevT: Int,
                    mbEdge: Boolean): Unit = {
        val p3 = luma(off - 4 * step) & 0xff
        val p2 = luma(off - 3 * step) & 0xff
        val p1 = luma(off - 2 * step) & 0xff
        val p0 = luma(off - step) & 0xff
        val q0 = luma(off) & 0xff
        val q1 = luma(off + step) & 0xff
        val q2 = luma(off + 2 * step) & 0xff
        val q3 = luma(off + 3 * step) & 0xff
        def ad(a: Int, b: Int): Int = if (a > b) a - b else b - a
        val mask = ad(p0, q0) * 2 + ad(p1, q1) / 2 <= edge &&
          ad(p3, p2) <= interior && ad(p2, p1) <= interior &&
          ad(p1, p0) <= interior && ad(q1, q0) <= interior &&
          ad(q2, q1) <= interior && ad(q3, q2) <= interior
        if (!mask) return
        val hev = ad(p1, p0) > hevT || ad(q1, q0) > hevT
        val sp1 = p1 - 128; val sp0 = p0 - 128
        val sq0 = q0 - 128; val sq1 = q1 - 128
        if (!mbEdge || hev) {
          // common (subblock) filter; outer taps iff hev
          val a0 = clampS((if (hev) clampS(sp1 - sq1) else 0) + 3 * (sq0 - sp0))
          val f1 = clampS(a0 + 4) >> 3
          val f2 = clampS(a0 + 3) >> 3
          luma(off) = (clampS(sq0 - f1) + 128).toByte
          luma(off - step) = (clampS(sp0 + f2) + 128).toByte
          if (!hev) {
            val a1 = (f1 + 1) >> 1
            luma(off + step) = (clampS(sq1 - a1) + 128).toByte
            luma(off - 2 * step) = (clampS(sp1 + a1) + 128).toByte
          }
        } else {
          // mb-edge wide filter (no hev)
          val sp2 = p2 - 128; val sq2 = q2 - 128
          val wfull = clampS(clampS(sp1 - sq1) + 3 * (sq0 - sp0))
          val a27 = clampS((27 * wfull + 63) >> 7)
          luma(off) = (clampS(sq0 - a27) + 128).toByte
          luma(off - step) = (clampS(sp0 + a27) + 128).toByte
          val a18 = clampS((18 * wfull + 63) >> 7)
          luma(off + step) = (clampS(sq1 - a18) + 128).toByte
          luma(off - 2 * step) = (clampS(sp1 + a18) + 128).toByte
          val a9 = clampS((9 * wfull + 63) >> 7)
          luma(off + 2 * step) = (clampS(sq2 - a9) + 128).toByte
          luma(off - 3 * step) = (clampS(sp2 + a9) + 128).toByte
        }
      }

      def filterRowSimple(off: Int, step: Int, edge: Int): Unit = {
        val p1 = luma(off - 2 * step) & 0xff
        val p0 = luma(off - step) & 0xff
        val q0 = luma(off) & 0xff
        val q1 = luma(off + step) & 0xff
        def ad(a: Int, b: Int): Int = if (a > b) a - b else b - a
        if (ad(p0, q0) * 2 + ad(p1, q1) / 2 > edge) return
        val sp1 = p1 - 128; val sp0 = p0 - 128
        val sq0 = q0 - 128; val sq1 = q1 - 128
        val a0 = clampS(clampS(sp1 - sq1) + 3 * (sq0 - sp0))
        val f1 = clampS(a0 + 4) >> 3
        val f2 = clampS(a0 + 3) >> 3
        luma(off) = (clampS(sq0 - f1) + 128).toByte
        luma(off - step) = (clampS(sp0 + f2) + 128).toByte
      }

      mbY = 0
      while (mbY < mbH) {
        var mbX = 0
        while (mbX < mbW) {
          val idx = mbY * mbW + mbX
          val level = mbLevel(idx)
          if (level > 0) {
            var interior = level
            if (sharpness > 0) {
              interior >>= (if (sharpness > 4) 2 else 1)
              if (interior > 9 - sharpness) interior = 9 - sharpness
            }
            if (interior < 1) interior = 1
            val hevT = if (level >= 40) 2 else if (level >= 15) 1 else 0
            val mbE = (level + 2) * 2 + interior
            val sbE = level * 2 + interior
            val x0 = mbX << 4
            val y0 = mbY << 4
            val inner = mbHasCoeffs(idx) || mbIsB(idx)
            if (!simpleFilter) {
              if (mbX > 0) {
                var y = 0
                while (y < 16) { filterRow((y0 + y) * planeW + x0, 1, interior, mbE, hevT, mbEdge = true); y += 1 }
              }
              if (inner) {
                var c = 4
                while (c < 16) {
                  var y = 0
                  while (y < 16) { filterRow((y0 + y) * planeW + x0 + c, 1, interior, sbE, hevT, mbEdge = false); y += 1 }
                  c += 4
                }
              }
              if (mbY > 0) {
                var x = 0
                while (x < 16) { filterRow(y0 * planeW + x0 + x, planeW, interior, mbE, hevT, mbEdge = true); x += 1 }
              }
              if (inner) {
                var r = 4
                while (r < 16) {
                  var x = 0
                  while (x < 16) { filterRow((y0 + r) * planeW + x0 + x, planeW, interior, sbE, hevT, mbEdge = false); x += 1 }
                  r += 4
                }
              }
            } else {
              if (mbX > 0) {
                var y = 0
                while (y < 16) { filterRowSimple((y0 + y) * planeW + x0, 1, mbE); y += 1 }
              }
              if (inner) {
                var c = 4
                while (c < 16) {
                  var y = 0
                  while (y < 16) { filterRowSimple((y0 + y) * planeW + x0 + c, 1, sbE); y += 1 }
                  c += 4
                }
              }
              if (mbY > 0) {
                var x = 0
                while (x < 16) { filterRowSimple(y0 * planeW + x0 + x, planeW, mbE); x += 1 }
              }
              if (inner) {
                var r = 4
                while (r < 16) {
                  var x = 0
                  while (x < 16) { filterRowSimple((y0 + r) * planeW + x0 + x, planeW, sbE); x += 1 }
                  r += 4
                }
              }
            }
          }
          mbX += 1
        }
        mbY += 1
      }
    }

    // crop to w x h
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      System.arraycopy(luma, y * planeW, out, y * w, w)
      y += 1
    }
    Some((w, h, out))
  } catch {
    case _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None
  }
}
