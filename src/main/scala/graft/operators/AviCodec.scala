package graft.operators

/** Minimal AVI (RIFF) container codec for UNCOMPRESSED 24-bit video —
  * the video leg of the multimodal tier, pure JVM per the public
  * AVI/RIFF layout (the same chunk discipline as the WAV walk:
  * RIFF('AVI ') → LIST(hdrl){avih, LIST(strl){strh,strf}} →
  * LIST(movi){'00db' DIB frames}).
  *
  * Scope: encode and decode raw 'DIB ' video — each frame a
  * bottom-up, 4-byte-padded 24-bit pixel block, exactly a BMP body
  * without its file header. Compressed codecs (MJPEG, H.264)
  * REJECT (None): per-frame byte work belongs behind the same
  * `mapInPandas`-shaped seam as the rest of the media tier, and an
  * uncompressed container is the honest pure-JVM envelope. Decode
  * walks untrusted chunk lists defensively (Long offsets, strict
  * advance, bounds; truncated frame payloads reject, never throw). */
object AviCodec {

  private def tag(b: Array[Byte], o: Int): String =
    if (o + 4 <= b.length) new String(b, o, 4, "US-ASCII") else ""
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Encode top-down BGR frames as an uncompressed AVI: w, h, fps,
    * frames (each w*h*3 bytes). Frames are stored bottom-up with
    * 4-byte row padding (the DIB convention — same byte layout the
    * BMP sink writes). */
  def encode(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val frameBytes = rowSize * h
    import java.nio.{ByteBuffer, ByteOrder}
    def dib(px: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](frameBytes)
      var y = 0
      while (y < h) {
        System.arraycopy(px, y * w * 3, out, (h - 1 - y) * rowSize, w * 3)
        y += 1
      }
      out
    }
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(frameBytes).array()
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .put("vids".getBytes("US-ASCII")).put("DIB ".getBytes("US-ASCII"))
      .putInt(0).putInt(0).putInt(0)
      .putInt(1).putInt(fps) // dwScale=1, dwRate=fps → fps frames/sec
      .putInt(0).putInt(frames.length).putInt(frameBytes)
      .putInt(-1).putInt(0).array()
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(if (fps > 0) 1000000 / fps else 0).putInt(frameBytes * fps)
      .putInt(0).putInt(0).putInt(frames.length).putInt(0)
      .putInt(1).putInt(frameBytes).putInt(w).putInt(h).array()
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      b.array()
    }
    def list(listType: String, bodies: Array[Byte]*): Array[Byte] = {
      val inner = bodies.map(_.length).sum
      val b = ByteBuffer.allocate(12 + inner).order(ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes("US-ASCII")).putInt(4 + inner)
        .put(listType.getBytes("US-ASCII"))
      bodies.foreach(b.put)
      b.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih),
      list("strl", chunk("strh", strh), chunk("strf", strf)))
    val movi = list("movi", frames.map(f => chunk("00db", dib(f))): _*)
    val inner = 4 + hdrl.length + movi.length
    val out = ByteBuffer.allocate(8 + inner).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(inner)
      .put("AVI ".getBytes("US-ASCII")).put(hdrl).put(movi)
    out.array()
  }

  /** Decode an uncompressed-DIB AVI to (w, h, fps, top-down BGR
    * frames). None on compressed streams, malformed chunk structure,
    * or frame payloads shorter than the header promises. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Seq[Array[Byte]])] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ")
      return None
    var w = 0; var h = 0; var fps = 0
    var compressed = false
    val frames = Seq.newBuilder[Array[Byte]]
    // recursive defensive walk: a LIST descends, a chunk is consumed;
    // offsets advance in Long and must strictly increase within bounds
    def walk(start: Long, end: Long): Boolean = {
      var off = start
      while (off + 8 <= end) {
        val id = tag(bytes, off.toInt)
        val sz = le32(bytes, off.toInt + 4)
        if (sz < 0) return false
        val next = off + 8L + sz + (sz & 1)
        if (next <= off || next > end) return false
        id match {
          case "LIST" =>
            if (sz < 4) return false
            if (!walk(off + 12L, off + 8L + sz)) return false
          case "strh" =>
            if (off + 8 + 36 <= end && tag(bytes, off.toInt + 8) == "vids") {
              val handler = tag(bytes, off.toInt + 12)
              // raw streams carry 'DIB ' or a zero fourcc; anything
              // else is a compressed codec — out of envelope
              if (handler != "DIB " && le32(bytes, off.toInt + 12) != 0)
                compressed = true
              val scale = le32(bytes, off.toInt + 28)
              val rate = le32(bytes, off.toInt + 32)
              if (scale > 0 && rate > 0) fps = rate / scale
            }
          case "strf" =>
            if (w == 0 && sz >= 40) {
              w = le32(bytes, off.toInt + 12)
              h = math.abs(le32(bytes, off.toInt + 16))
              val bpp = (bytes(off.toInt + 22) & 0xff) | ((bytes(off.toInt + 23) & 0xff) << 8)
              val comp = le32(bytes, off.toInt + 24)
              if (bpp != 24 || comp != 0) compressed = true
            }
          case "00db" | "00dc" =>
            // raw DIB frame (00dc with a DIB handler is still raw)
            frames += java.util.Arrays.copyOfRange(bytes, off.toInt + 8,
              (off + 8 + sz).toInt)
          case _ => // avih/idx1/junk: header fields we re-derive or skip
        }
        off = next
      }
      true
    }
    if (!walk(12L, bytes.length.toLong)) return None
    if (compressed || w <= 0 || h <= 0 || w > 65536 || h > 65536) return None
    val rowSize = ((w.toLong * 3 + 3) / 4) * 4
    if (rowSize * h > Int.MaxValue) return None
    val out = frames.result().map { dib =>
      if (dib.length < rowSize * h) return None // truncated frame
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        System.arraycopy(dib, ((h - 1 - y) * rowSize).toInt, px, y * w * 3, w * 3)
        y += 1
      }
      px
    }
    if (out.isEmpty) None else Some((w, h, fps, out))
  }
}
