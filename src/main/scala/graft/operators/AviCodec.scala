package graft.operators

/** Minimal AVI (RIFF) container codec — the video leg of the
  * multimodal tier, pure JVM per the public AVI/RIFF layout (the same
  * chunk discipline as the WAV walk: RIFF('AVI ') →
  * LIST(hdrl){avih, LIST(strl){strh,strf}} → LIST(movi){frames}).
  *
  * Scope: two video stream formats —
  *  - raw 'DIB ' ([[encode]]): each frame a bottom-up, 4-byte-padded
  *    24-bit pixel block, exactly a BMP body without its file header;
  *  - MJPEG ([[encodeMjpeg]]): each '00dc' chunk a complete JPEG
  *    picture decoded through [[JpegCodec]] — the first COMPRESSED
  *    video format in the dedup tier's envelope (Motion JPEG is what
  *    web-era capture pipelines and many surveillance crawls emit).
  * Other codecs (H.264, VP9 fourccs) REJECT (None): an entropy-coded
  * inter-frame decoder is out of the pure-JVM envelope, and clips
  * fall to the admit-don't-index rule. Decode walks untrusted chunk
  * lists defensively (Long offsets, strict advance, bounds; truncated
  * or dimension-contradicting frame payloads reject, never throw). */
object AviCodec {

  private def tag(b: Array[Byte], o: Int): String =
    if (o + 4 <= b.length) new String(b, o, 4, "US-ASCII") else ""
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** 'MJPG' as the little-endian fourcc integer strf carries. */
  private val MjpgFourcc =
    'M'.toInt | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)

  import java.nio.{ByteBuffer, ByteOrder}
  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + body.length + (body.length & 1))
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
    b.array()
  }
  private def list(listType: String, bodies: Array[Byte]*): Array[Byte] = {
    val inner = bodies.map(_.length).sum
    val b = ByteBuffer.allocate(12 + inner).order(ByteOrder.LITTLE_ENDIAN)
    b.put("LIST".getBytes("US-ASCII")).putInt(4 + inner)
      .put(listType.getBytes("US-ASCII"))
    bodies.foreach(b.put)
    b.array()
  }

  /** Shared RIFF assembly: headers + movi around pre-built frame
    * chunk bodies. `biCompression` 0 = raw DIB, 'MJPG' = Motion JPEG. */
  private def container(handler: String, biCompression: Int, w: Int, h: Int,
                        fps: Int, bufSize: Int, frameId: String,
                        frameBodies: Seq[Array[Byte]]): Array[Byte] = {
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(biCompression).putInt(bufSize).array()
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .put("vids".getBytes("US-ASCII")).put(handler.getBytes("US-ASCII"))
      .putInt(0).putInt(0).putInt(0)
      .putInt(1).putInt(fps) // dwScale=1, dwRate=fps → fps frames/sec
      .putInt(0).putInt(frameBodies.length).putInt(bufSize)
      .putInt(-1).putInt(0).array()
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(if (fps > 0) 1000000 / fps else 0).putInt(bufSize * fps)
      .putInt(0).putInt(0).putInt(frameBodies.length).putInt(0)
      .putInt(1).putInt(bufSize).putInt(w).putInt(h).array()
    val hdrl = list("hdrl", chunk("avih", avih),
      list("strl", chunk("strh", strh), chunk("strf", strf)))
    val movi = list("movi", frameBodies.map(f => chunk(frameId, f)): _*)
    val inner = 4 + hdrl.length + movi.length
    val out = ByteBuffer.allocate(8 + inner).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(inner)
      .put("AVI ".getBytes("US-ASCII")).put(hdrl).put(movi)
    out.array()
  }

  /** Encode top-down BGR frames as an uncompressed AVI: w, h, fps,
    * frames (each w*h*3 bytes). Frames are stored bottom-up with
    * 4-byte row padding (the DIB convention — same byte layout the
    * BMP sink writes). */
  def encode(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val frameBytes = rowSize * h
    def dib(px: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](frameBytes)
      var y = 0
      while (y < h) {
        System.arraycopy(px, y * w * 3, out, (h - 1 - y) * rowSize, w * 3)
        y += 1
      }
      out
    }
    container("DIB ", 0, w, h, fps, frameBytes, "00db", frames.map(dib))
  }

  /** Encode top-down BGR frames as a MOTION-JPEG AVI: each frame a
    * complete [[JpegCodec.encode]] picture in a '00dc' chunk, handler
    * and biCompression 'MJPG' — the fixture side of the compressed-
    * video seam, real per-frame DCT entropy coding in a real
    * container. */
  def encodeMjpeg(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int,
                  quality: Int = 90): Array[Byte] = {
    val jpegs = frames.map(f => JpegCodec.encode(f, w, h, quality))
    val bufSize = if (jpegs.isEmpty) 0 else jpegs.map(_.length).max
    container("MJPG", MjpgFourcc, w, h, fps, bufSize, "00dc", jpegs)
  }

  /** Decode an uncompressed-DIB or Motion-JPEG AVI to (w, h, fps,
    * top-down BGR frames). None on any other codec, malformed chunk
    * structure, frame payloads shorter than the header promises, or
    * MJPEG pictures whose decode fails or contradicts the stream
    * dimensions. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Seq[Array[Byte]])] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ")
      return None
    var w = 0; var h = 0; var fps = 0
    var compressed = false
    var mjpeg = false
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
              // raw streams carry 'DIB ' or a zero fourcc; MJPG routes
              // through JpegCodec; anything else is out of envelope
              if (handler == "MJPG") mjpeg = true
              else if (handler != "DIB " && le32(bytes, off.toInt + 12) != 0)
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
              if (comp == MjpgFourcc) mjpeg = true
              else if (bpp != 24 || comp != 0) compressed = true
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
    val out: Seq[Array[Byte]] =
      if (mjpeg) {
        // each chunk is a complete JPEG picture; its decoded dims must
        // agree with the stream header, or the file is lying
        frames.result().map { pic =>
          JpegCodec.decode(pic) match {
            case Some((dw, dh, px)) if dw == w && dh == h => px
            case _ => return None
          }
        }
      } else {
        val rowSize = ((w.toLong * 3 + 3) / 4) * 4
        if (rowSize * h > Int.MaxValue) return None
        frames.result().map { dib =>
          if (dib.length < rowSize * h) return None // truncated frame
          val px = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            System.arraycopy(dib, ((h - 1 - y) * rowSize).toInt, px, y * w * 3, w * 3)
            y += 1
          }
          px
        }
      }
    if (out.isEmpty) None else Some((w, h, fps, out))
  }
}
