package graft

import graft.operators.{Vp8Codec, WebpCodec}

/** Scratch dev harness: decode a .webp's VP8 chunk and print Y/U/V
  * sha256 + hex for comparison against scripts/vp8_probe.py. */
object Vp8Check {
  def sha(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  def main(args: Array[String]): Unit = {
    if (args(0) == "--fixture") {
      // emit fixture id to file, then self-check closed form
      val id = args(1).toLong
      val w = args(2).toInt
      val bytes = WebpCodec.encodeLossyWebp(id, w, 16)
      java.nio.file.Files.write(java.nio.file.Paths.get(args(3)), bytes)
      val yuv = Vp8Codec.decodeToYuv(bytes,
        WebpCodec.chunks(bytes).find(_._1 == "VP8 ").get._2,
        WebpCodec.chunks(bytes).find(_._1 == "VP8 ").get._3)
      val levels = Vp8Codec.lossyLevels(id, w / 16)
      val got = (0 until w / 16).map(i => yuv.y(i * 16) & 0xff)
      println(s"closed-form levels: ${levels.mkString(",")}")
      println(s"decoded   levels: ${got.mkString(",")}")
      val flat = (0 until w / 16).forall { i =>
        (0 until 16).forall(r => (0 until 16).forall(c =>
          (yuv.y(r * w + i * 16 + c) & 0xff) == levels(i)))
      }
      val chroma = yuv.u.forall(b => (b & 0xff) == 128) &&
        yuv.v.forall(b => (b & 0xff) == 128)
      println(s"flat-match: $flat  chroma128: $chroma")
      println("Y sha256 " + sha(yuv.y))
      println("U sha256 " + sha(yuv.u))
      println("V sha256 " + sha(yuv.v))
      return
    }
    if (args(0) == "--full") {
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(1)))
      val r = WebpCodec.decode(bytes)
      println(s"full ${r.width}x${r.height} ch=${r.channels}")
      println("RGBA sha256 " + sha(r.pixels))
      return
    }
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
