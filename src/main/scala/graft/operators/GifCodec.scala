package graft.operators

/** GIF codec, pure JVM — the web's other ubiquitous palette format
  * (icons, charts, memes; every crawl is full of it). Follows the
  * public GIF89a specification: logical screen descriptor, global and
  * local color tables, variable-width LZW with clear/EOI codes packed
  * LSB-first into ≤255-byte sub-blocks, and the 4-pass row interlace.
  * The width-change counters follow giflib's exact convention (the
  * code counter bumps on every code READ, not per table entry), so the
  * decoder interoperates with real-world encoders, and the fixture
  * encoder mirrors it.
  *
  * Scope:
  *  - DECODE ([[decode]]): the FIRST image of a GIF87a/89a stream —
  *    global or local palette, interlaced or sequential, frame offsets
  *    composed onto a black canvas, extensions skipped (transparency
  *    is dropped like every alpha channel in this tier). Animations
  *    are a sequence of frames; perceptual dedup hashes the still
  *    (first) image, the same posture as thumbnails everywhere.
  *  - ENCODE ([[encode]]): single image, global palette built in
  *    first-seen color order (≤256 distinct — the fixture contract),
  *    REAL LZW compression (dictionary growth, width changes, 4095
  *    table-full clears), optional interlace. GIF is LOSSLESS for
  *    palette-able pixels, so decode(encode(px)) == px — the identity
  *    the planted-clone oracle rides.
  *
  * Untrusted-media posture (the decodeWav contract): sub-block chains
  * and LZW streams are bounds-checked and must terminate, dimensions
  * are capped, any malformed structure or out-of-range code returns
  * None, never throws. */
object GifCodec {

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Encode top-down BGR triples as a single-image GIF89a. Requires
    * ≤ 256 distinct colors (throw otherwise — fixture contract). */
  def encode(px: Array[Byte], w: Int, h: Int, interlace: Boolean = false): Array[Byte] = {
    // palette in first-seen order
    val palIdx = scala.collection.mutable.LinkedHashMap.empty[(Byte, Byte, Byte), Int]
    var j = 0
    while (j < w * h) {
      val k = (px(j * 3), px(j * 3 + 1), px(j * 3 + 2))
      if (!palIdx.contains(k)) palIdx(k) = palIdx.size
      j += 1
    }
    require(palIdx.size <= 256, s"${palIdx.size} distinct colors exceed a GIF palette")
    // GCT size is a power of two ≥ 2; minCodeSize ≥ 2 per the spec
    var gctBits = 1
    while ((1 << gctBits) < palIdx.size) gctBits += 1
    val minCodeSize = math.max(2, gctBits)
    val indexes = new Array[Int](w * h)
    j = 0
    while (j < w * h) {
      indexes(j) = palIdx((px(j * 3), px(j * 3 + 1), px(j * 3 + 2)))
      j += 1
    }
    // row order: sequential, or the 4-pass interlace the decoder undoes
    val rows: Array[Int] =
      if (!interlace) Array.range(0, h)
      else (Array.range(0, h, 8) ++ (4 until h by 8) ++
        (2 until h by 4) ++ (1 until h by 2))
    val stream = new Array[Int](w * h)
    var si = 0
    rows.foreach { y =>
      var x = 0
      while (x < w) { stream(si) = indexes(y * w + x); si += 1; x += 1 }
    }
    // ---- LZW compress (giflib counter convention) ----
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val packed = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nbits = 0
    var bits = minCodeSize + 1
    var maxCode1 = 1 << bits
    var runningCode = eoi + 1
    def put(code: Int): Unit = { // LSB-first packing
      acc |= code.toLong << nbits; nbits += bits
      while (nbits >= 8) { packed.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
    }
    def emit(code: Int): Unit = { // normal code: post-emit width check
      put(code)
      if (runningCode >= maxCode1 && bits < 12) { bits += 1; maxCode1 = 1 << bits }
    }
    val table = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    put(clear)
    var cur = stream(0)
    var i = 1
    while (i < stream.length) {
      val k = stream(i)
      table.get((cur, k)) match {
        case Some(c) => cur = c
        case None =>
          emit(cur)
          if (runningCode >= 4095) { // table full: clear and restart
            put(clear)
            table.clear()
            runningCode = eoi + 1
            bits = minCodeSize + 1
            maxCode1 = 1 << bits
          } else {
            table((cur, k)) = runningCode
            runningCode += 1
          }
          cur = k
      }
      i += 1
    }
    emit(cur)
    emit(eoi)
    while (nbits > 0) { packed.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
    // ---- container ----
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(w); w16(h)
    out.write(0x80 | ((gctBits - 1) & 7)) // GCT present, size 2^gctBits
    out.write(0); out.write(0) // bg index, aspect
    val pal = palIdx.keys.toArray
    var pi = 0
    while (pi < (1 << gctBits)) { // palette padded to the declared size
      if (pi < pal.length) {
        out.write(pal(pi)._3 & 0xff); out.write(pal(pi)._2 & 0xff); out.write(pal(pi)._1 & 0xff)
      } else { out.write(0); out.write(0); out.write(0) }
      pi += 1
    }
    out.write(0x2c) // image descriptor
    w16(0); w16(0); w16(w); w16(h)
    out.write(if (interlace) 0x40 else 0x00)
    out.write(minCodeSize)
    val data = packed.toByteArray
    var o2 = 0
    while (o2 < data.length) { // ≤255-byte sub-blocks
      val n = math.min(255, data.length - o2)
      out.write(n); out.write(data, o2, n)
      o2 += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decode the first image of a GIF to (w, h, top-down BGR triples)
    * on the logical-screen canvas. None on malformed structure. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 13) return None
    val hdr = new String(bytes, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    val w = le16(bytes, 6); val h = le16(bytes, 8)
    if (w <= 0 || h <= 0 || w > 65536 || h > 65536 ||
        w.toLong * h * 3 > (1L << 30)) return None
    val flags = bytes(10) & 0xff
    var off = 13L
    var gct: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      if (off + 3L * n > bytes.length) return None
      gct = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + 3L * n).toInt)
      off += 3L * n
    }
    /** Skip a sub-block chain, returning the offset past its 0 byte. */
    def skipSubBlocks(start: Long): Long = {
      var p = start
      while (p < bytes.length) {
        val n = bytes(p.toInt) & 0xff
        if (n == 0) return p + 1
        p += 1 + n
      }
      -1
    }
    while (off + 1 <= bytes.length) {
      (bytes(off.toInt) & 0xff) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension: label byte + sub-block chain
          if (off + 2 > bytes.length) return None
          val p = skipSubBlocks(off + 2)
          if (p < 0) return None
          off = p
        case 0x2c => // image descriptor — the frame we decode
          if (off + 10 > bytes.length) return None
          val left = le16(bytes, off.toInt + 1); val top = le16(bytes, off.toInt + 3)
          val iw = le16(bytes, off.toInt + 5); val ih = le16(bytes, off.toInt + 7)
          val iflags = bytes(off.toInt + 9) & 0xff
          if (iw <= 0 || ih <= 0 || left + iw > w || top + ih > h) return None
          var p = off + 10
          var pal = gct
          if ((iflags & 0x80) != 0) { // local color table wins
            val n = 2 << (iflags & 7)
            if (p + 3L * n > bytes.length) return None
            pal = java.util.Arrays.copyOfRange(bytes, p.toInt, (p + 3L * n).toInt)
            p += 3L * n
          }
          if (pal == null) return None
          if (p + 1 > bytes.length) return None
          val minCodeSize = bytes(p.toInt) & 0xff
          if (minCodeSize < 2 || minCodeSize > 11) return None
          p += 1
          // concatenate the LZW sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var q = p
          var done = false
          while (!done) {
            if (q >= bytes.length) return None
            val n = bytes(q.toInt) & 0xff
            if (n == 0) { done = true; q += 1 }
            else {
              if (q + 1 + n > bytes.length) return None
              data.write(bytes, q.toInt + 1, n)
              q += 1 + n
            }
          }
          // ---- LZW decompress (giflib counter convention) ----
          val lzw = data.toByteArray
          val clear = 1 << minCodeSize
          val eoi = clear + 1
          var bits = minCodeSize + 1
          var maxCode1 = 1 << bits
          var runningCode = eoi + 1
          var acc = 0L; var nbits = 0; var bp = 0
          var bad = false
          def read(): Int = {
            while (nbits < bits) {
              if (bp >= lzw.length) { bad = true; return eoi }
              acc |= (lzw(bp) & 0xffL) << nbits; bp += 1; nbits += 8
            }
            val c = (acc & ((1L << bits) - 1)).toInt
            acc >>>= bits; nbits -= bits
            // giflib convention: the counter bumps on every READ, so
            // the width change lands one code earlier than a per-entry
            // counter would — matching real-world encoders
            runningCode += 1
            if (runningCode > maxCode1 && bits < 12) { maxCode1 <<= 1; bits += 1 }
            c
          }
          // per-slot expansion bookkeeping: prefix chain plus first
          // char and length, so entries write forward without a stack
          val prefix = new Array[Int](4096)
          val suffix = new Array[Byte](4096)
          val firstC = new Array[Byte](4096)
          val lenOf = new Array[Int](4096)
          var nextSlot = clear + 2
          var prev = -1
          val idx = new Array[Int](iw * ih)
          var outN = 0
          /** Write expansion of table/literal code `c` (length `n`)
            * backwards into idx ending at outN+n-1. */
          def expand(c0: Int, n: Int): Boolean = {
            if (outN + n > idx.length) return false // frame overrun
            var p2 = outN + n - 1
            var cc = c0
            var guard = 0
            while (cc >= clear + 2 && guard < 4096) {
              idx(p2) = suffix(cc) & 0xff; p2 -= 1
              cc = prefix(cc); guard += 1
            }
            if (cc >= clear || cc < 0 || p2 != outN) return false
            idx(p2) = cc
            outN += n
            true
          }
          while (outN < idx.length && !bad) {
            val code = read()
            if (bad) return None
            if (code == eoi) return None // stream ended before the frame filled
            else if (code == clear) {
              nextSlot = clear + 2
              prev = -1
              runningCode = eoi + 1
              bits = minCodeSize + 1
              maxCode1 = 1 << bits
            } else if (prev < 0) {
              if (code >= clear) return None // first code must be a literal
              idx(outN) = code; outN += 1
              prev = code
            } else {
              val prevLen = if (prev < clear) 1 else lenOf(prev)
              val prevFirst = if (prev < clear) prev else firstC(prev) & 0xff
              var curFirst = 0
              if (code < clear) { // literal
                if (outN >= idx.length) return None
                idx(outN) = code; outN += 1
                curFirst = code
              } else if (code < nextSlot && code >= clear + 2) {
                if (!expand(code, lenOf(code))) return None
                curFirst = firstC(code) & 0xff
              } else if (code == nextSlot) { // KwKwK: prev + first(prev)
                if (outN + prevLen + 1 > idx.length) return None
                if (!expand(prev, prevLen)) return None
                idx(outN) = prevFirst; outN += 1
                curFirst = prevFirst
              } else return None // out-of-range code
              if (nextSlot < 4096) { // record entry (one behind encoder)
                prefix(nextSlot) = prev
                suffix(nextSlot) = curFirst.toByte
                firstC(nextSlot) = prevFirst.toByte
                lenOf(nextSlot) = prevLen + 1
                nextSlot += 1
              }
              prev = code
            }
          }
          if (outN < idx.length) return None
          // ---- compose: deinterlace + palette lookup onto the canvas ----
          val px = new Array[Byte](w * h * 3)
          val rows: Array[Int] =
            if ((iflags & 0x40) == 0) Array.range(0, ih)
            else (Array.range(0, ih, 8) ++ (4 until ih by 8) ++
              (2 until ih by 4) ++ (1 until ih by 2))
          val nPal = pal.length / 3
          var r = 0
          while (r < ih) {
            val y = rows(r)
            var x = 0
            while (x < iw) {
              val ci = idx(r * iw + x)
              if (ci >= nPal) return None
              val o = ((top + y) * w + (left + x)) * 3
              px(o) = pal(ci * 3 + 2); px(o + 1) = pal(ci * 3 + 1); px(o + 2) = pal(ci * 3)
              x += 1
            }
            r += 1
          }
          return Some((w, h, px))
        case _ => return None // unknown top-level block
      }
    }
    None
  }
}
