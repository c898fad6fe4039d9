package graft.tools

/** Bulk differential check for the VP8 luma decoder: reads a dir of
  * (name.webp, name.y) pairs + manifest.txt rows "name w h" (produced
  * by tools/gen_vp8_sweep.py — hundreds of randomized images straight
  * from libwebp) and verifies byte-exact luma on every one. The
  * committed Vp8Spec goldens pin the repo forever; this tool is the
  * WIDE sweep that runs when the decoder changes.
  *
  * Usage: runMain graft.tools.Vp8GoldenCheck <dir>
  */
object Vp8GoldenCheck {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args.headOption.getOrElse("target/vp8sweep"))
    val manifest = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "manifest.txt").toPath), "UTF-8")
    var pass = 0
    var fail = 0
    manifest.linesIterator.filter(_.nonEmpty).foreach { line =>
      val p = line.split(" ")
      val (name, w, h) = (p(0), p(1).toInt, p(2).toInt)
      val webp = java.nio.file.Files.readAllBytes(new java.io.File(dir, name + ".webp").toPath)
      val exp = java.nio.file.Files.readAllBytes(new java.io.File(dir, name + ".y").toPath)
      graft.operators.Vp8Codec.decodeLuma(webp) match {
        case Some((dw, dh, y)) if dw == w && dh == h =>
          val bad = (0 until w * h).iterator.filter(i => y(i) != exp(i)).take(3).toList
          if (bad.isEmpty) pass += 1
          else {
            fail += 1
            println(s"FAIL $name ${w}x$h: first diffs " + bad.map(i =>
              s"(${i % w},${i / w}) got=${y(i) & 0xff} exp=${exp(i) & 0xff}").mkString(", "))
          }
        case Some((dw, dh, _)) =>
          fail += 1; println(s"FAIL $name: size $dw x $dh, want $w x $h")
        case None =>
          fail += 1; println(s"FAIL $name: decoder returned None")
      }
    }
    println(s"[vp8sweep] $pass pass, $fail fail")
    if (fail > 0) sys.exit(1)
  }
}
