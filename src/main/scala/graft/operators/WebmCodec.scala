package graft.operators

/** Minimal WebM (Matroska/EBML) container walk — just enough to hand
  * [[Vp8Codec]] the VP8 key frames a perceptual video hash needs.
  * WebM is VP8's NATIVE container (the lossy-web video format the
  * AVI tier doesn't cover), and the codec work already exists; this
  * is only the framing: EBML varint ids/sizes (RFC 8794), Segment →
  * Tracks → the V_VP8 TrackEntry (number, width, height), Segment →
  * Clusters → SimpleBlocks, keyframe-flagged payloads out.
  *
  * House hostile-input posture — reject, never mis-decode:
  *  - every id/size read is bounds-checked against its PARENT's
  *    extent; any overrun, reserved varint, or size past the parent
  *    rejects the whole file (None), never a partial frame list;
  *  - unknown-size elements (streaming muxers) are accepted only for
  *    the top-level Segment (walk to EOF — its true extent); an
  *    unknown-size Cluster would force guessing child boundaries, so
  *    it rejects;
  *  - LACED SimpleBlocks on the video track reject: skipping them
  *    would silently hash a subset of the frames — a wrong signature,
  *    not a degraded one. (Video muxers lace audio, not video; none
  *    of the fixture corpus laces.)
  *
  * Coverage boundary, stated not hidden: only SimpleBlock frames are
  * collected (the WebM form every mainstream muxer emits for VP8);
  * BlockGroup/Block framing and non-key frames are SKIPPED — the
  * signature is defined over key frames, which is the sampling a
  * temporal hash wants anyway ([[Multimodal.tHash64]]).
  */
private[graft] object WebmCodec {

  private final val IdEbml = 0x1A45DFA3L
  private final val IdSegment = 0x18538067L
  private final val IdTracks = 0x1654AE6BL
  private final val IdTrackEntry = 0xAEL
  private final val IdTrackNumber = 0xD7L
  private final val IdCodecId = 0x86L
  private final val IdVideo = 0xE0L
  private final val IdPixelWidth = 0xB0L
  private final val IdPixelHeight = 0xBAL
  private final val IdCluster = 0x1F43B675L
  private final val IdSimpleBlock = 0xA3L

  /** (width, height, key-frame payloads in stream order), or None. */
  def keyFrames(b: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] = try {
    val cur = new Cursor(b, 0, b.length)
    // EBML header first, per spec
    val (id0, end0) = cur.element() match {
      case null => return None
      case e => e
    }
    if (id0 != IdEbml || end0 == -1L) return None
    cur.pos = end0.toInt
    val (id1, end1raw) = cur.element() match {
      case null => return None
      case e => e
    }
    if (id1 != IdSegment) return None
    // unknown-size Segment: its extent is the rest of the stream
    val end1 = if (end1raw == -1L) b.length else end1raw.toInt
    if (end1 > b.length) return None

    var trackNum = -1L
    var w = 0
    var h = 0
    val frames = Seq.newBuilder[Array[Byte]]
    val seg = new Cursor(b, cur.pos, end1)
    while (seg.pos < seg.end) {
      val e = seg.element()
      if (e == null) return None
      val (id, endRaw) = e
      if (endRaw == -1L) return None // unknown size below Segment: reject
      val end = endRaw.toInt
      id match {
        case IdTracks =>
          val t = new Cursor(b, seg.pos, end)
          while (t.pos < t.end) {
            val te = t.element()
            if (te == null || te._2 == -1L) return None
            if (te._1 == IdTrackEntry) {
              var num = -1L
              var codec = ""
              var tw = 0
              var th = 0
              val entry = new Cursor(b, t.pos, te._2.toInt)
              while (entry.pos < entry.end) {
                val ce = entry.element()
                if (ce == null || ce._2 == -1L) return None
                ce._1 match {
                  case IdTrackNumber => num = entry.uint(ce._2.toInt)
                  case IdCodecId =>
                    codec = new String(b, entry.pos, ce._2.toInt - entry.pos,
                      java.nio.charset.StandardCharsets.US_ASCII)
                  case IdVideo =>
                    val v = new Cursor(b, entry.pos, ce._2.toInt)
                    while (v.pos < v.end) {
                      val ve = v.element()
                      if (ve == null || ve._2 == -1L) return None
                      ve._1 match {
                        case IdPixelWidth => tw = v.uint(ve._2.toInt).toInt
                        case IdPixelHeight => th = v.uint(ve._2.toInt).toInt
                        case _ =>
                      }
                      v.pos = ve._2.toInt
                    }
                  case _ =>
                }
                entry.pos = ce._2.toInt
              }
              if (codec == "V_VP8" && num > 0) { trackNum = num; w = tw; h = th }
            }
            t.pos = te._2.toInt
          }
        case IdCluster =>
          val c = new Cursor(b, seg.pos, end)
          while (c.pos < c.end) {
            val be = c.element()
            if (be == null || be._2 == -1L) return None
            if (be._1 == IdSimpleBlock) {
              val blockEnd = be._2.toInt
              val blk = new Cursor(b, c.pos, blockEnd)
              val tn = blk.vintValue()
              if (tn == -1L) return None
              if (tn == trackNum) {
                if (blk.pos + 3 > blockEnd) return None
                val flags = b(blk.pos + 2) & 0xff
                if ((flags & 0x06) != 0) return None // laced video: reject
                if ((flags & 0x80) != 0)
                  frames += java.util.Arrays.copyOfRange(b, blk.pos + 3, blockEnd)
              }
            }
            c.pos = be._2.toInt
          }
        case _ =>
      }
      seg.pos = end
    }
    if (trackNum > 0 && w > 0 && h > 0) {
      val fs = frames.result()
      if (fs.nonEmpty) Some((w, h, fs)) else None
    } else None
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Bounds-checked reader over `[pos, end)` of one parent's extent. */
  private final class Cursor(val b: Array[Byte], var pos: Int, val end: Int) {

    /** EBML element id (marker bits KEPT, per spec) + its payload end
      * offset, advancing `pos` to the payload start. Payload end -1 =
      * declared unknown size. Null on any malformation. */
    def element(): (Long, Long) = {
      val id = readVint(keepMarker = true)
      if (id == -1L) return null
      val size = readVint(keepMarker = false)
      if (size == -2L) return null
      if (size == -1L) (id, -1L) // unknown size: caller decides
      else if (size > end - pos) null
      else (id, pos.toLong + size)
    }

    /** Block-local track-number varint (marker stripped); -1 on error. */
    def vintValue(): Long = {
      val v = readVint(keepMarker = false)
      if (v < 0) -1L else v
    }

    /** Big-endian unsigned integer payload ending at `to`. */
    def uint(to: Int): Long = {
      var v = 0L
      var i = pos
      if (to - pos > 8) return -1L
      while (i < to) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
      v
    }

    /** One EBML varint at `pos`. keepMarker: element ids keep the
      * length-marker bit (that's how the registry writes them); sizes
      * strip it. Returns -1 for an all-ones size (unknown), -2/-1 for
      * malformed depending on mode. */
    private def readVint(keepMarker: Boolean): Long = {
      if (pos >= end) return if (keepMarker) -1L else -2L
      val fb = b(pos) & 0xff
      val len =
        if ((fb & 0x80) != 0) 1
        else if ((fb & 0x40) != 0) 2
        else if ((fb & 0x20) != 0) 3
        else if ((fb & 0x10) != 0) 4
        else if ((fb & 0x08) != 0) 5
        else if ((fb & 0x04) != 0) 6
        else if ((fb & 0x02) != 0) 7
        else if ((fb & 0x01) != 0) 8
        else return if (keepMarker) -1L else -2L
      if (pos + len > end) return if (keepMarker) -1L else -2L
      if (keepMarker && len > 4) return -1L // ids are at most 4 bytes
      var v = if (keepMarker) fb.toLong else (fb & ((1 << (8 - len)) - 1)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (b(pos + i) & 0xffL); i += 1 }
      pos += len
      if (!keepMarker) {
        // all data bits set = declared unknown size
        val allOnes = (1L << (7 * len)) - 1
        if (v == allOnes) return { -1L }
      }
      v
    }
  }
}
