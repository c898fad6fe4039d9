package graft.operators

/** Pure-JVM WebP **lossless** (VP8L) codec — decoder for the full
  * bitstream spec, encoder for the fixture subset.
  *
  * WebP is the web's #2 image format; without it the perceptual-dedup
  * tier silently misses WebP near-dups (the round-13 coverage gap).
  * The LOSSLESS half of the format (VP8L) is pure entropy coding over
  * ARGB — no DSP — so a from-scratch JVM decode is feasible and exact.
  * Implemented from the public "WebP Lossless Bitstream Specification"
  * (RFC 9649 §3–§5):
  *
  *   - RIFF container walk (`WEBP` form, `VP8L` chunk; `VP8X`
  *     extended files are walked to their `VP8L` chunk).
  *   - LSB-first bit reading; canonical prefix codes in both forms
  *     (simple 1/2-symbol codes and code-length-coded codes with the
  *     19-symbol code-length code, repeat codes 16/17/18, and the
  *     optional max_symbol cut-off).
  *   - Color cache (multiplicative hash 0x1e35a7bd, 1–11 bits).
  *   - Meta prefix images (per-tile entropy-code groups).
  *   - LZ77 backward references with the 120-entry 2-D "plane code"
  *     short-distance map (see [[planeCodes]]).
  *   - All four transforms, inverted in reverse bitstream order:
  *     PREDICTOR (14 spatial modes per tile), COLOR (per-tile
  *     cross-channel deltas), SUBTRACT_GREEN, COLOR_INDEXING
  *     (palette, including sub-byte pixel bundling at ≤16 colors).
  *
  * Untrusted-media posture (the repo contract shared with
  * [[JpegCodec]]/[[GifCodec]]/PNG): every length is bounds-checked,
  * dimensions and allocations are capped, prefix codes must be
  * exactly complete (Kraft sum), back-references must stay inside the
  * already-decoded prefix, palette indexes inside the palette, and
  * ANY malformation returns None — quarantine, never throw, never
  * mis-decode. Lossy `VP8 ` chunks are rejected by construction (a
  * DCT decode is a different project; rejecting beats mis-decoding).
  *
  * The encoder emits a deliberately small legal subset — no
  * transforms (or SUBTRACT_GREEN on request), no cache, no LZ77, one
  * prefix group with fixed 8-bit literal codes — enough to write any
  * RGB image losslessly. Spec-compliance of the DECODER is tested
  * against golden files produced by the reference libwebp encoder
  * (`src/test/resources/webp/`), whose output exercises predictors,
  * color transforms, palettes, caches and plane-coded LZ77 — the
  * decoder is NOT merely the inverse of this encoder.
  */
object WebpCodec {

  // ------------------------------------------------------------------
  // bit I/O — VP8L packs bits LSB-first within bytes
  // ------------------------------------------------------------------

  private final class BitReader(data: Array[Byte]) {
    private val nBits: Long = data.length.toLong * 8
    private var pos: Long = 0
    var overrun = false
    def bit(): Int = {
      if (pos >= nBits) { overrun = true; 0 }
      else {
        val b = (data((pos >> 3).toInt) >> (pos & 7).toInt) & 1
        pos += 1; b
      }
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nCur = 0
    def bit(b: Int): Unit = {
      cur |= (b & 1) << nCur
      nCur += 1
      if (nCur == 8) { out.write(cur); cur = 0; nCur = 0 }
    }
    def bits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { bit((v >> i) & 1); i += 1 }
    }
    /** Prefix-code bits go most-significant-first (tree walk order). */
    def code(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { bit((v >> i) & 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (nCur > 0) { out.write(cur); cur = 0; nCur = 0 }
      out.toByteArray
    }
  }

  // ------------------------------------------------------------------
  // canonical prefix codes
  // ------------------------------------------------------------------

  /** A decoded prefix code: either a zero-bit single symbol or a
    * canonical code walked bit-by-bit via per-length first-code
    * offsets (max code length 15 per the spec). */
  private final class PrefixCode(val single: Int, // ≥ 0 ⇒ 0-bit code
                                 val counts: Array[Int],
                                 val firstCodes: Array[Int],
                                 val offsets: Array[Int],
                                 val sorted: Array[Int]) {
    def read(br: BitReader): Int = {
      if (single >= 0) return single
      var codeV = 0; var len = 0
      while (len < 15) {
        codeV = (codeV << 1) | br.bit()
        len += 1
        val d = codeV - firstCodes(len)
        if (d >= 0 && d < counts(len)) return sorted(offsets(len) + d)
      }
      -1 // malformed stream
    }
  }

  /** Build a canonical code from per-symbol lengths. Exactly one
    * nonzero length ⇒ 0-bit code; otherwise the Kraft sum must be
    * exactly 1 (complete code) or the bitstream is corrupt. */
  private def buildCode(lengths: Array[Int]): PrefixCode = {
    var nz = 0; var singleSym = -1
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) != 0) { nz += 1; singleSym = i }
      if (lengths(i) < 0 || lengths(i) > 15) return null
      i += 1
    }
    if (nz == 0) return null
    if (nz == 1) return new PrefixCode(singleSym, null, null, null, null)
    val counts = new Array[Int](16)
    lengths.foreach(l => if (l > 0) counts(l) += 1)
    var kraft = 0L // in units of 2^-15
    var len = 1
    while (len <= 15) { kraft += counts(len).toLong << (15 - len); len += 1 }
    if (kraft != (1L << 15)) return null
    val firstCodes = new Array[Int](16)
    val offsets = new Array[Int](16)
    var codeV = 0; var off = 0
    len = 1
    while (len <= 15) {
      codeV = (codeV + (if (len > 1) counts(len - 1) else 0)) << 1
      firstCodes(len) = codeV
      offsets(len) = off
      off += counts(len)
      len += 1
    }
    val sorted = new Array[Int](off)
    val fill = offsets.clone()
    i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) { sorted(fill(lengths(i))) = i; fill(lengths(i)) += 1 }
      i += 1
    }
    new PrefixCode(-1, counts, firstCodes, offsets, sorted)
  }

  /** Canonical code assignments for the fixture encoder (same
    * construction the decoder inverts). Returns per-symbol codes. */
  private def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val counts = new Array[Int](16)
    lengths.foreach(l => if (l > 0) counts(l) += 1)
    val next = new Array[Int](16)
    var codeV = 0
    var len = 1
    while (len <= 15) {
      codeV = (codeV + (if (len > 1) counts(len - 1) else 0)) << 1
      next(len) = codeV
      len += 1
    }
    val codes = new Array[Int](lengths.length)
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) { codes(i) = next(lengths(i)); next(lengths(i)) += 1 }
      i += 1
    }
    codes
  }

  /** RFC 9649's fixed transmission order for the 19 code-length-code
    * lengths. NOTE the repeat code 16 sits between 5 and 6 — a
    * tail-position transcription error here mis-keys every stream
    * that transmits a length for any symbol past 5 (found by
    * differential probing against libwebp; the golden corpus pins
    * it). */
  private val kCodeLengthOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code (simple or code-length-coded) for an
    * alphabet of `alphabetSize` symbols. Null on malformation. */
  private def readPrefixCode(br: BitReader, alphabetSize: Int): PrefixCode = {
    if (alphabetSize <= 0) return null
    if (br.bit() == 1) { // simple code: 1 or 2 symbols
      val numSymbols = br.bit() + 1
      val first8 = br.bit()
      val s0 = br.bits(if (first8 == 1) 8 else 1)
      val lengths = new Array[Int](alphabetSize)
      if (s0 >= alphabetSize) return null
      if (numSymbols == 1) {
        lengths(s0) = 1 // buildCode's single-symbol path makes it 0-bit
        if (br.overrun) null else buildCode(lengths)
      } else {
        val s1 = br.bits(8)
        if (s1 >= alphabetSize || s1 == s0) return null
        // RFC 9649 assigns bit 0 to the FIRST-TRANSMITTED symbol, not the
        // numerically lower one — canonical construction would silently
        // swap the two when s0 > s1 (libwebp's encoder always sorts, so
        // goldens can't catch it). Build the 1-bit code in transmission
        // order directly: read() walks sorted(codeV - firstCode) so
        // sorted=(s0,s1) maps bit 0 -> s0, bit 1 -> s1.
        if (br.overrun) return null
        val counts = new Array[Int](16); counts(1) = 2
        new PrefixCode(-1, counts, new Array[Int](16), new Array[Int](16),
                       Array(s0, s1))
      }
    } else {
      val numLenCodes = 4 + br.bits(4)
      if (numLenCodes > 19) return null
      val clcl = new Array[Int](19)
      var i = 0
      while (i < numLenCodes) { clcl(kCodeLengthOrder(i)) = br.bits(3); i += 1 }
      if (br.overrun) return null
      val clCode = buildCode(clcl)
      if (clCode == null) return null
      // optional cap: symbols at and past max_symbol stay length 0
      var maxSymbol =
        if (br.bit() == 1) {
          val lengthNBits = 2 + 2 * br.bits(3)
          2 + br.bits(lengthNBits)
        } else alphabetSize
      val lengths = new Array[Int](alphabetSize)
      var symbol = 0
      var prevLen = 8 // spec DEFAULT_CODE_LENGTH
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clCode.read(br)
        if (cl < 0 || br.overrun) return null
        if (cl < 16) {
          lengths(symbol) = cl; symbol += 1
          if (cl != 0) prevLen = cl
        } else {
          val (extraBits, offset, usePrev) = cl match {
            case 16 => (2, 3, true)
            case 17 => (3, 3, false)
            case 18 => (7, 11, false)
            case _  => return null
          }
          val repeat = br.bits(extraBits) + offset
          if (symbol + repeat > alphabetSize) return null
          val fillLen = if (usePrev) prevLen else 0
          var r = 0
          while (r < repeat) { lengths(symbol) = fillLen; symbol += 1; r += 1 }
        }
      }
      if (br.overrun) null else buildCode(lengths)
    }
  }

  // ------------------------------------------------------------------
  // LZ77 plane codes
  // ------------------------------------------------------------------

  /** The 120 short-distance codes of RFC 9649 §4.2.2: the closest
    * (dx, dy) offsets in the 8-neighborhood above the current pixel,
    * ordered by Euclidean distance, nearer ROW first on ties, positive
    * dx before negative. Generated rather than transcribed — the rule
    * IS the table (validated against reference-libwebp-encoded golden
    * files in WebpSpec, whose back-references exercise it). */
  private[graft] val planeCodes: Array[(Int, Int)] = {
    val cands = for {
      y <- 0 to 8
      x <- -8 to 8
      if y > 0 || x > 0
    } yield (x, y)
    cands.sortBy { case (x, y) => (x * x + y * y, -y, if (x > 0) 0 else 1) }
      .take(120).toArray
  }

  private def copyLengthOrDistance(br: BitReader, code: Int): Int = {
    if (code < 4) code + 1
    else {
      val extraBits = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extraBits
      offset + br.bits(extraBits) + 1
    }
  }

  // ------------------------------------------------------------------
  // entropy-coded image (the recursive core)
  // ------------------------------------------------------------------

  private val MaxPixels = 1 << 26 // 64 MPix ≈ 256 MB ARGB: allocation cap

  /** One group of the five prefix codes (green+length+cache, red,
    * blue, alpha, distance). */
  private final class Group(val green: PrefixCode, val red: PrefixCode,
                            val blue: PrefixCode, val alpha: PrefixCode,
                            val dist: PrefixCode)

  /** Decode one entropy-coded ARGB image of w×h. `level0` enables
    * transforms and meta prefix images (spec: only the top-level
    * image has them). Returns (pixels, transforms in read order) or
    * null. Transforms are NOT applied here — [[decode]] inverts them
    * in reverse order at the top level. */
  private def decodeImageStream(br: BitReader, w0: Int, h0: Int, level0: Boolean,
                                depth: Int): (Array[Int], Int, List[Transform]) = {
    if (depth > 3) return null // aux images never nest further
    var w = w0
    val h = h0
    var transforms: List[Transform] = Nil
    if (level0) {
      var seen = Set.empty[Int]
      while (br.bit() == 1) {
        val ttype = br.bits(2)
        if (seen(ttype) || br.overrun) return null
        seen += ttype
        val t = ttype match {
          case 0 => // PREDICTOR
            val bits = br.bits(3) + 2
            val sub = decodeImageStream(br, subSample(w, bits), subSample(h, bits), level0 = false, depth + 1)
            if (sub == null) return null
            Predictor(bits, w, sub._1)
          case 1 => // COLOR
            val bits = br.bits(3) + 2
            val sub = decodeImageStream(br, subSample(w, bits), subSample(h, bits), level0 = false, depth + 1)
            if (sub == null) return null
            ColorXform(bits, w, sub._1)
          case 2 => // SUBTRACT_GREEN
            SubtractGreen
          case 3 => // COLOR_INDEXING
            val numColors = br.bits(8) + 1
            val bits =
              if (numColors > 16) 0 else if (numColors > 4) 1
              else if (numColors > 2) 2 else 3
            val sub = decodeImageStream(br, numColors, 1, level0 = false, depth + 1)
            if (sub == null) return null
            // palette entries arrive delta-coded per channel
            val pal = sub._1
            var i = 1
            while (i < pal.length) {
              pal(i) = addPixels(pal(i), pal(i - 1)); i += 1
            }
            val t0 = ColorIndexing(bits, w, pal)
            w = subSample(w, bits) // subsequent reads see the packed width
            t0
        }
        transforms ::= t // reversed == inverse application order
      }
    }
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return null
    // color cache (any level)
    val cacheBits = if (br.bit() == 1) br.bits(4) else 0
    if (cacheBits > 11) return null
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    // meta prefix image (level 0 only)
    var metaBits = 0
    var metaImage: Array[Int] = null
    var numGroups = 1
    if (level0 && br.bit() == 1) {
      metaBits = br.bits(3) + 2
      val sub = decodeImageStream(br, subSample(w, metaBits), subSample(h, metaBits), level0 = false, depth + 1)
      if (sub == null) return null
      metaImage = sub._1
      var maxIdx = 0
      metaImage.foreach { px =>
        val idx = (px >> 8) & 0xffff
        if (idx > maxIdx) maxIdx = idx
      }
      numGroups = maxIdx + 1
      // The 16-bit meta index legally allows up to 65536 entropy groups,
      // but a group is only reachable if some meta TILE references it, so
      // the tile count ceil(w/2^bits)*ceil(h/2^bits) bounds the groups any
      // real encoder emits. A flat 65536 cap let a crafted ~1 MB stream
      // force 65k×5 PrefixCode allocations off a tiny declared image;
      // capping proportionally to the declared extent keeps every
      // encoder-producible stream decodable (reject-never-mis-decode:
      // sparse hostile indexes are REJECTED, not mis-read).
      val tiles = subSample(w, metaBits).toLong * subSample(h, metaBits)
      if (numGroups > 65536 || numGroups > tiles) return null // hostile meta image
    }
    val groups = new Array[Group](numGroups)
    var g = 0
    while (g < numGroups) {
      val green = readPrefixCode(br, 256 + 24 + cacheSize)
      val red = readPrefixCode(br, 256)
      val blue = readPrefixCode(br, 256)
      val alpha = readPrefixCode(br, 256)
      val dist = readPrefixCode(br, 40)
      if (green == null || red == null || blue == null || alpha == null || dist == null)
        return null
      groups(g) = new Group(green, red, blue, alpha, dist)
      g += 1
    }
    // main pixel loop
    val n = w * h
    val px = new Array[Int](n)
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    def cacheInsert(argb: Int): Unit =
      if (cache != null) cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
    val metaW = if (metaImage != null) subSample(w, metaBits) else 0
    var pos = 0
    var group = groups(0)
    var lastMetaTile = -1
    while (pos < n) {
      if (metaImage != null) {
        val x = pos % w; val y = pos / w
        val tile = (y >> metaBits) * metaW + (x >> metaBits)
        if (tile != lastMetaTile) {
          lastMetaTile = tile
          val idx = (metaImage(tile) >> 8) & 0xffff
          group = groups(idx)
        }
      }
      val s = group.green.read(br)
      if (s < 0 || br.overrun) return null
      if (s < 256) { // literal
        val r = group.red.read(br)
        val b = group.blue.read(br)
        val a = group.alpha.read(br)
        if (r < 0 || b < 0 || a < 0 || br.overrun) return null
        val argb = (a << 24) | (r << 16) | (s << 8) | b
        px(pos) = argb
        cacheInsert(argb)
        pos += 1
      } else if (s < 256 + 24) { // LZ77 back-reference
        val length = copyLengthOrDistance(br, s - 256)
        val distSym = group.dist.read(br)
        if (distSym < 0 || br.overrun) return null
        val distCode = copyLengthOrDistance(br, distSym)
        val dist0 =
          if (distCode > 120) distCode - 120
          else {
            // dist = dx + dy·width: (1,0) is the left neighbor, (0,1)
            // the pixel above, (-1,1) above-right (RFC 9649 §4.2.2)
            val (dx, dy) = planeCodes(distCode - 1)
            val d = dy * w + dx
            if (d < 1) 1 else d
          }
        if (dist0 > pos || pos + length > n) return null
        var i = 0
        while (i < length) {
          val v = px(pos - dist0)
          px(pos) = v
          cacheInsert(v)
          pos += 1; i += 1
        }
        lastMetaTile = -1 // x moved: force group re-lookup
      } else { // color cache hit
        if (cache == null) return null
        val idx = s - 256 - 24
        if (idx >= cacheSize) return null
        px(pos) = cache(idx)
        pos += 1
      }
    }
    if (br.overrun) null else (px, w, transforms)
  }

  private def subSample(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  /** Per-channel byte-wise addition (palette delta decode, predictor
    * inverse). */
  private def addPixels(a: Int, b: Int): Int = {
    val aa = ((a >>> 24) + (b >>> 24)) & 0xff
    val rr = (((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff
    val gg = (((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff
    val bb = ((a & 0xff) + (b & 0xff)) & 0xff
    (aa << 24) | (rr << 16) | (gg << 8) | bb
  }

  // ------------------------------------------------------------------
  // transforms (inverse application)
  // ------------------------------------------------------------------

  private sealed trait Transform
  private final case class Predictor(bits: Int, xsize: Int, tiles: Array[Int]) extends Transform
  private final case class ColorXform(bits: Int, xsize: Int, tiles: Array[Int]) extends Transform
  private case object SubtractGreen extends Transform
  private final case class ColorIndexing(bits: Int, xsize: Int, palette: Array[Int]) extends Transform

  private def average2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(a: Int, b: Int, c: Int): Int = {
    def ch(sh: Int) = clamp255(((a >>> sh) & 0xff) + ((b >>> sh) & 0xff) - ((c >>> sh) & 0xff))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampAddSubtractHalf(a: Int, b: Int): Int = {
    // a is Average2(L, T), b is TL, per spec mode 13
    def ch(sh: Int) = {
      val av = (a >>> sh) & 0xff; val bv = (b >>> sh) & 0xff
      clamp255(av + (av - bv) / 2)
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def select(t: Int, l: Int, tl: Int): Int = {
    def ch(p: Int, sh: Int) = (p >>> sh) & 0xff
    val pa = // |(L + T - TL) - T| summed over channels
      math.abs(ch(l, 24) + ch(t, 24) - ch(tl, 24) - ch(t, 24)) +
      math.abs(ch(l, 16) + ch(t, 16) - ch(tl, 16) - ch(t, 16)) +
      math.abs(ch(l, 8) + ch(t, 8) - ch(tl, 8) - ch(t, 8)) +
      math.abs(ch(l, 0) + ch(t, 0) - ch(tl, 0) - ch(t, 0))
    val pb =
      math.abs(ch(l, 24) + ch(t, 24) - ch(tl, 24) - ch(l, 24)) +
      math.abs(ch(l, 16) + ch(t, 16) - ch(tl, 16) - ch(l, 16)) +
      math.abs(ch(l, 8) + ch(t, 8) - ch(tl, 8) - ch(l, 8)) +
      math.abs(ch(l, 0) + ch(t, 0) - ch(tl, 0) - ch(l, 0))
    if (pa <= pb) t else l
  }

  /** Invert the predictor transform in place (scan order — each pixel
    * only needs already-reconstructed neighbors). */
  private def inversePredictor(px: Array[Int], w: Int, h: Int, t: Predictor): Boolean = {
    val tw = subSample(w, t.bits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pos = y * w + x
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(pos - 1) // top row: L
          else if (x == 0) px(pos - w) // left column: T
          else {
            val tileIdx = (y >> t.bits) * tw + (x >> t.bits)
            if (tileIdx >= t.tiles.length) return false
            val mode = (t.tiles(tileIdx) >> 8) & 0xff
            val l = px(pos - 1); val top = px(pos - w)
            val tl = px(pos - w - 1)
            // TR in the 1-D layout: for the last column this reads the
            // FIRST pixel of the CURRENT row — exactly the spec's
            // wrap-around rule, no special case needed
            val trSafe = px(pos - w + 1)
            mode match {
              case 0  => 0xff000000
              case 1  => l
              case 2  => top
              case 3  => trSafe
              case 4  => tl
              case 5  => average2(average2(l, trSafe), top)
              case 6  => average2(l, tl)
              case 7  => average2(l, top)
              case 8  => average2(tl, top)
              case 9  => average2(top, trSafe)
              case 10 => average2(average2(l, tl), average2(top, trSafe))
              case 11 => select(top, l, tl)
              case 12 => clampAddSubtractFull(l, top, tl)
              case 13 => clampAddSubtractHalf(average2(l, top), tl)
              case _  => return false
            }
          }
        px(pos) = addPixels(px(pos), pred)
        x += 1
      }
      y += 1
    }
    true
  }

  private def colorTransformDelta(t: Int, c: Int): Int =
    (t.toByte.toInt * c.toByte.toInt) >> 5

  private def inverseColor(px: Array[Int], w: Int, h: Int, t: ColorXform): Boolean = {
    val tw = subSample(w, t.bits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val tileIdx = (y >> t.bits) * tw + (x >> t.bits)
        if (tileIdx >= t.tiles.length) return false
        val cte = t.tiles(tileIdx)
        val g2r = cte & 0xff
        val g2b = (cte >> 8) & 0xff
        val r2b = (cte >> 16) & 0xff
        val v = px(y * w + x)
        val g = (v >> 8) & 0xff
        var r = (v >> 16) & 0xff
        var b = v & 0xff
        r = (r + colorTransformDelta(g2r, g)) & 0xff
        b = (b + colorTransformDelta(g2b, g)) & 0xff
        b = (b + colorTransformDelta(r2b, r)) & 0xff
        px(y * w + x) = (v & 0xff00ff00) | (r << 16) | b
        x += 1
      }
      y += 1
    }
    true
  }

  private def inverseSubtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val v = px(i)
      val g = (v >> 8) & 0xff
      val r = (((v >> 16) & 0xff) + g) & 0xff
      val b = ((v & 0xff) + g) & 0xff
      px(i) = (v & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  /** Un-bundle + palette-lookup: input is the packed image (width
    * subSample(xsize, bits)), output the full-width indexed colors. */
  private def inverseColorIndexing(px: Array[Int], w: Int, h: Int,
                                   t: ColorIndexing): Array[Int] = {
    val fullW = t.xsize
    val packedW = subSample(fullW, t.bits)
    if (w != packedW) return null
    val out = new Array[Int](fullW * h)
    val bpp = 8 >> t.bits // bits per packed index
    val mask = (1 << bpp) - 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < fullW) {
        val packed = px(y * w + (x >> t.bits))
        val green = (packed >> 8) & 0xff
        val shift = (x & ((1 << t.bits) - 1)) * bpp
        val idx = (green >> shift) & mask
        if (idx >= t.palette.length) return null // OOR index: corrupt
        out(y * fullW + x) = t.palette(idx)
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // container + entry points
  // ------------------------------------------------------------------

  /** Decode a WebP lossless file to top-down unpadded BGR triples —
    * the [[Multimodal.MediaTransform.pixelsOf]] convention (alpha
    * dropped). None for lossy `VP8 ` payloads, any malformation, or
    * any non-WebP input. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val vp8l = findVp8lChunk(bytes)
    if (vp8l == null) return None
    decodeVp8l(vp8l) match {
      case Some((w, h, argb)) =>
        val out = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          val v = argb(i)
          out(i * 3) = (v & 0xff).toByte            // B
          out(i * 3 + 1) = ((v >> 8) & 0xff).toByte // G
          out(i * 3 + 2) = ((v >> 16) & 0xff).toByte // R
          i += 1
        }
        Some((w, h, out))
      case None => None
    }
  }

  /** Walk the RIFF container to the `VP8L` chunk payload (also inside
    * `VP8X` extended files, whose chunk list is flat). Null when the
    * container is malformed or holds only lossy/animation payloads. */
  private def findVp8lChunk(b: Array[Byte]): Array[Byte] = {
    def tag(off: Int): String =
      if (off + 4 <= b.length) new String(b, off, 4, "US-ASCII") else ""
    def le32(off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    if (b.length < 20 || tag(0) != "RIFF" || tag(8) != "WEBP") return null
    var off = 12L
    while (off + 8 <= b.length) {
      val ctag = tag(off.toInt)
      val len = le32(off.toInt + 4)
      if (len < 0 || off + 8 + len > b.length) return null
      if (ctag == "VP8L")
        return java.util.Arrays.copyOfRange(b, off.toInt + 8, (off + 8 + len).toInt)
      off += 8 + len + (len & 1) // chunks are 2-byte aligned
    }
    null
  }

  /** Decode a raw VP8L payload to (w, h, ARGB ints). */
  private[operators] def decodeVp8l(data: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (data.length < 5 || (data(0) & 0xff) != 0x2f) return None
    val br = new BitReader(java.util.Arrays.copyOfRange(data, 1, data.length))
    val w = br.bits(14) + 1
    val h = br.bits(14) + 1
    br.bit() // alpha hint (informational)
    if (br.bits(3) != 0) return None // version must be 0
    if (w.toLong * h > MaxPixels) return None
    val res = decodeImageStream(br, w, h, level0 = true, depth = 0)
    if (res == null) return None
    var (px, curW, transforms) = res
    var width = curW
    // invert in reverse bitstream order (transforms list is already
    // reversed by construction)
    var ts = transforms
    while (ts.nonEmpty) {
      ts.head match {
        case t: Predictor =>
          if (width != t.xsize || px.length != width * h) return None
          if (!inversePredictor(px, width, h, t)) return None
        case t: ColorXform =>
          if (width != t.xsize || px.length != width * h) return None
          if (!inverseColor(px, width, h, t)) return None
        case SubtractGreen =>
          inverseSubtractGreen(px)
        case t: ColorIndexing =>
          val out = inverseColorIndexing(px, width, h, t)
          if (out == null) return None
          px = out
          width = t.xsize
      }
      ts = ts.tail
    }
    if (width != w || px.length != w * h) return None
    Some((w, h, px))
  }

  // ------------------------------------------------------------------
  // fixture encoder
  // ------------------------------------------------------------------

  /** Encode top-down BGR triples as a REAL lossless WebP (VP8L): one
    * prefix group, fixed complete 8-bit literal codes for G/R/B, a
    * zero-bit single-symbol alpha (0xff) and distance code, no LZ77,
    * no cache. ~1 byte per channel — large but exactly lossless, and
    * every decoder (including libwebp) reads it. `subtractGreen`
    * additionally routes the stream through the SUBTRACT_GREEN
    * transform, putting the transform bit on fixture paths. */
  def encode(bgr: Array[Byte], w: Int, h: Int, subtractGreen: Boolean = false): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 16384 && h <= 16384 && bgr.length == w * h * 3)
    val bw = new BitWriter
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bit(0) // no alpha
    bw.bits(0, 3) // version
    if (subtractGreen) {
      bw.bit(1) // a transform follows
      bw.bits(2, 2) // SUBTRACT_GREEN
    }
    bw.bit(0) // no more transforms
    bw.bit(0) // no color cache
    bw.bit(0) // no meta prefix image
    // green: 280-symbol alphabet, literals 0..255 at length 8 (complete)
    writeLiteralLengths(bw, tailZeros = 24)
    // red, blue: 256-symbol alphabet, all at length 8 (complete)
    writeLiteralLengths(bw, tailZeros = 0)
    writeLiteralLengths(bw, tailZeros = 0)
    // alpha: simple code, single symbol 255 (zero bits per pixel)
    bw.bit(1); bw.bit(0); bw.bit(1); bw.bits(255, 8)
    // distance: simple code, single symbol 0 (never referenced)
    bw.bit(1); bw.bit(0); bw.bit(0); bw.bits(0, 1)
    // pixels: canonical all-8 codes ⇒ code(v) == v, MSB-first
    var i = 0
    val n = w * h
    while (i < n) {
      val b = bgr(i * 3) & 0xff
      val g = bgr(i * 3 + 1) & 0xff
      val r0 = bgr(i * 3 + 2) & 0xff
      val (gg, rr, bb) =
        if (subtractGreen) (g, (r0 - g) & 0xff, (b - g) & 0xff)
        else (g, r0, b)
      bw.code(gg, 8); bw.code(rr, 8); bw.code(bb, 8)
      i += 1
    }
    val payload = bw.toBytes
    val vp8l = new Array[Byte](1 + payload.length)
    vp8l(0) = 0x2f
    System.arraycopy(payload, 0, vp8l, 1, payload.length)
    riffContainer(vp8l)
  }

  /** Transmit 256 length-8 codes (+ `tailZeros` trailing zero-length
    * symbols) through the code-length code: a 2-symbol {8, 18} tree
    * (1 bit each), 256 × "8", then one repeat-zeros as needed. */
  private def writeLiteralLengths(bw: BitWriter, tailZeros: Int): Unit = {
    bw.bit(0) // not a simple code
    // code-length-code lengths in kCodeLengthOrder: symbol 18 at
    // index 1 and symbol 8 at index 11 get length 1 ⇒ num_codes = 12
    bw.bits(12 - 4, 4)
    val lens = Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1)
    lens.foreach(l => bw.bits(l, 3))
    bw.bit(0) // no max_symbol cap
    // canonical over {8, 18}: code(8) = 0, code(18) = 1
    var i = 0
    while (i < 256) { bw.bit(0); i += 1 }
    if (tailZeros > 0) {
      // symbol 18: 11-138 zeros via 7 extra bits
      require(tailZeros >= 11 && tailZeros <= 138)
      bw.bit(1); bw.bits(tailZeros - 11, 7)
    }
  }

  private def riffContainer(vp8l: Array[Byte]): Array[Byte] = {
    val padded = vp8l.length + (vp8l.length & 1)
    val out = java.nio.ByteBuffer.allocate(20 + padded)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(12 + padded - 4 + 4)
    out.put("WEBP".getBytes("US-ASCII"))
    out.put("VP8L".getBytes("US-ASCII")).putInt(vp8l.length)
    out.put(vp8l)
    out.array()
  }
}
