package graft.tools

import graft.operators.{JpegCodec, Multimodal}
import Multimodal.MediaTransform

/** Measurement probe for the baseline JPEG codec (the GateProbe
  * pattern: measure the floors a gate depends on, don't assume them):
  * round-trip error at the fixture quality, the planted-clone Hamming
  * (must be 0 — the clone re-encodes DECODED pixels losslessly, so
  * the floor identity applies), the JPEG→JPEG recompression Hamming
  * (the approximate contract, NOT oracle-pinned), and the background
  * min pairwise Hamming across the fixture population (must clear the
  * ≤ 4 gate with margin). */
object JpegProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(300)
    val (w, h) = (23, 17)
    val px = MediaTransform.texturePixels(w, h, 42L)
    val jpg = JpegCodec.encode(px, w, h, 90)
    val (dw, dh, dpx) = JpegCodec.decode(jpg).get
    require(dw == w && dh == h)
    val errs = px.indices.map(i => math.abs((px(i) & 0xff) - (dpx(i) & 0xff)))
    val base = Multimodal.dHash64(dpx, dw, dh)
    val up = MediaTransform.encodePng(
      MediaTransform.resizeNearest(dpx, dw, dh, dw * 2, dh * 2), dw * 2, dh * 2, 2)
    val (uw, uh, upx) = MediaTransform.pixelsOf(up).get
    val planted = java.lang.Long.bitCount(base ^ Multimodal.dHash64(upx, uw, uh))
    val re = JpegCodec.decode(JpegCodec.encode(dpx, dw, dh, 90)).get._3
    val recomp = java.lang.Long.bitCount(base ^ Multimodal.dHash64(re, dw, dh))
    // the fixture population mix: every third id 4:2:0, the rest 4:4:4
    val sigs = (10 until 10 + n).map { id =>
      val ww = 8 + (id % 32); val hh = 8 + ((id / 32) % 32)
      val (a, b, c) = JpegCodec.decode(
        JpegCodec.encode(MediaTransform.texturePixels(ww, hh, id.toLong), ww, hh, 90,
          subsample = id % 3 == 0)).get
      Multimodal.dHash64(c, a, b)
    }
    var minH = 64
    for (i <- sigs.indices; j <- (i + 1) until sigs.size)
      minH = math.min(minH, java.lang.Long.bitCount(sigs(i) ^ sigs(j)))
    // 4:2:0: luma error matches 4:4:4 (Y is never subsampled); dHash
    // luminance = B+G+R moves with chroma, so measure its drift too
    val sub = JpegCodec.decode(JpegCodec.encode(px, w, h, 90, subsample = true)).get._3
    val subErr = px.indices.map(i => math.abs((px(i) & 0xff) - (sub(i) & 0xff)))
    val subHam = java.lang.Long.bitCount(
      Multimodal.dHash64(dpx, dw, dh) ^ Multimodal.dHash64(sub, dw, dh))
    println(s"""{"bytes":${jpg.length},"max_err":${errs.max},""" +
      s""""mean_err":${f"${errs.sum.toDouble / errs.size}%.2f"},""" +
      s""""planted_hamming":$planted,"recompress_hamming":$recomp,""" +
      s""""background_min_hamming":$minH,"n":$n,""" +
      s""""sub420_max_err":${subErr.max},"sub420_vs_444_hamming":$subHam}""")
  }
}
