package graft

import graft.operators.{Vp8Codec, WebpCodec}

/** Scratch dev harness: decode a .webp's VP8 chunk and print Y/U/V
  * sha256 + hex for comparison against scripts/vp8_probe.py. */
object Vp8Check {
  def sha(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  def main(args: Array[String]): Unit = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0)))
    val vp8 = WebpCodec.chunks(bytes).find(_._1 == "VP8 ")
      .getOrElse(sys.error("no VP8 chunk"))
    val (_, off, sz) = vp8
    val yuv = Vp8Codec.decodeToYuv(bytes, off, sz)
    println(s"dims ${yuv.width}x${yuv.height}")
    println("Y sha256 " + sha(yuv.y))
    println("U sha256 " + sha(yuv.u))
    println("V sha256 " + sha(yuv.v))
    if (args.length > 1 && args(1) == "--dump") {
      println("Y " + yuv.y.map(x => f"${x & 0xff}%02x").mkString)
      println("U " + yuv.u.map(x => f"${x & 0xff}%02x").mkString)
      println("V " + yuv.v.map(x => f"${x & 0xff}%02x").mkString)
    }
  }
}
