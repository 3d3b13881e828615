package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Brotli
import graft.tools.BrotliCtxExtract

/** Brotli decoder pins. The embedded fixtures are reference-encoder
  * output (Node.js zlib's bundled brotli, BROTLI_PARAM_QUALITY as
  * named) captured once; the `reference encoder sweep` test re-runs
  * the full cross-check live whenever `node` is on PATH. */
class BrotliSpec extends AnyFunSuite {

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val t1 = "the quick brown fox jumps over the lazy dog. " * 40
  private val t2 = "key agg row scan slow fast table value part hash " * 100
  private val t5 = "abcdefgh" * 3
  /** JS `(i * 2654435761 >>> 13) & 0xff` (ToUint32 then shift). */
  private val t3: Array[Byte] = Array.tabulate(5000)(i =>
    ((((i.toLong * 2654435761L) & 0xFFFFFFFFL) >>> 13) & 0xff).toByte)

  private val t1q1 = unhex(
    "8b83030080aaaaaaeaff74e5c3498ff76d175d76d8807b700b371c0807a4e160cc19629d4ea32d2f2344a75360e822ac5c0768eb8e449df87f506499f1231d06")
  private val t2q1 = unhex(
    "8b91090080aaaaaaeaff74a5f39555415415c004541554c44cc1e0002e7ea5891477d860cc3382fac77ed43b675da26a12be2e4d91a48a1b9ffc35b64e321483e955050003")
  private val t5q5 = unhex("1b170000c401c780b83ef40987a09cee")
  private val t1q11 = unhex(
    "1b0707888c946ee622d083a5ba905e13148d807c430b830d387048206f24bf41a715ce66c7e34485a560239c4aab3f4c0a0c")
  private val t3q11 = unhex(
    "1b8713f0af0bb873bd002f5ce18e0c6ce49edf6db9a1d2babdcb6363770a38f64d407b8e1c9c9742b830fae230bdd5003680cf7ff0b1b1f1a641a4620cbabb8f3c23ca1d88c77dc80a197477fc6703d3a840645df4dcecc92884796a45f95cbf03185a23e07f767e6dfbffa7dcf66a013170673fa065c20d5a8908f4f738b1e7d28f7a85291ede79d12854988c9a3022feebe659ea385b0de524031ec1caa4c56e99a0c4f155aa6d5e9d8e4b5a833ee3c695cded856272dadfa5f575f706a9d952e509ed433b7cb01baeb2ba6943ec67000fcbb7a95ff998c685d0e984becdef98a67987f8f2e2b8f6999ce7f544e40ed21478772debf3c65447793dfcde5eb7f74b98494a0ed0fff0c930570f4c8129011686eca9e88c5a0fe0caa0b35080955e8106101ae16865421c8ab9f254406384ac099e9e8d81ec2cbc7220b019492c2b144fa17c95ad0466842ca86dba728893475dc294512b9ad9302bae714817c2958101361cb4af08b7887b2462fadab1c28193ce292f45a62596ad6cc841c24e6a85c8a44fa1ec95aa5c04ed264e4722575285239b960c8d02065b41dad118575fb11e92f592bd95cf95ab3c857a6a2c8e3842c14fa567706e935f7928451db552afd1b25a8fd3ca43bb5e5e9dd7b29a1e7bbdf47cdecb2a7df67a79745ecbf274f47a6979decb0ae9eaf5e2ed97dff37d69d7ebe571be2fadf77ae1a6f01e")

  test("reference q1 text stream decodes exactly") {
    assert(new String(Brotli.decode(t1q1), UTF_8) == t1)
    assert(new String(Brotli.decode(t2q1), UTF_8) == t2)
  }

  test("reference q5 stream: distance ring short codes (initial 4,11,15,16 order)") {
    assert(new String(Brotli.decode(t5q5), UTF_8) == t5)
  }

  test("reference q11 high-entropy stream: complex codes + context modeling") {
    assert(java.util.Arrays.equals(Brotli.decode(t3q11), t3))
  }

  test("static-dictionary reference throws the NAMED fence exception") {
    val e = intercept[Brotli.DictionaryReferenceException] {
      Brotli.decode(t1q11)
    }
    assert(e.getMessage.contains("static-dictionary"))
  }

  test("stored encoder round-trips with the closed-form size") {
    for (n <- Seq(0, 1, 100, 65535, 65536, 65537, 200000)) {
      val raw = Array.tabulate(n)(i => (i * 31 + 7).toByte)
      val enc = Brotli.encodeStored(raw)
      val want = 3 * ((n + 65535) / 65536) + n + 1
      assert(enc.length == want, s"n=$n: ${enc.length} != $want")
      assert(java.util.Arrays.equals(Brotli.decode(enc), raw), s"n=$n round trip")
    }
  }

  test("probe streams decode to the context ids of our own tables") {
    // BrotliCtxExtract's crafted streams (the ones the reference
    // decoder derived BrotliContext from — node-validated when the
    // tables were extracted): our decoder replays them and must emit
    // exactly the context ids our embedded tables produce, pinning the
    // whole context plumbing (identity map, 64 trees, modes) without
    // an external decoder.
    for ((mode, name) <- Seq((0, "lsb6"), (2, "utf8"), (3, "signed"))) {
      val out = Brotli.decode(BrotliCtxExtract.buildProbeStream(mode))
      assert(out.length == 512 + 1533, s"$name length")
      for (b <- 0 until 256) {
        assert((out(2 * b) & 0xff) == b && out(2 * b + 1) == 0, s"$name pattern $b")
      }
      def ctx(p1: Int, p2: Int): Int = mode match {
        case 0 => p1 & 0x3f
        case 2 => graft.operators.BrotliContext.lut0(p1) | graft.operators.BrotliContext.lut1(p2)
        case _ => (graft.operators.BrotliContext.lut2(p1) << 3) | graft.operators.BrotliContext.lut2(p2)
      }
      for (j <- 0 until 511) {
        val (p2, p1) = if (j % 2 == 0) (j / 2, 0) else (0, j / 2 + 1)
        assert((out(512 + 2 + 3 * j) & 0xff) == ctx(p1, p2), s"$name probe $j")
      }
    }
  }

  test("truncations and garbage fail loudly") {
    intercept[IllegalArgumentException](Brotli.decode(Array[Byte]()))
    intercept[IllegalArgumentException](Brotli.decode(t1q1.take(10)))
    // oversized-output guard
    intercept[IllegalArgumentException](Brotli.decode(t2q1, maxOut = 16))
  }

  test("reference encoder sweep (live when node is available)") {
    val node = new java.io.File("/usr/bin/node").exists() ||
      sys.env.getOrElse("PATH", "").split(':').exists(p => new java.io.File(p, "node").exists())
    assume(node, "node not on PATH; embedded fixtures above still cover the pins")
    val dir = java.nio.file.Files.createTempDirectory("brotli_sweep")
    val raws = Seq(
      ("text", t2.getBytes(UTF_8)),
      ("entropy", t3),
      ("runs", ("ab" * 4000).getBytes(UTF_8)))
    for ((name, raw) <- raws)
      java.nio.file.Files.write(dir.resolve(s"$name.raw"), raw)
    val script =
      """const z = require('zlib'), fs = require('fs');
        |const dir = process.argv[2];
        |for (const name of ['text', 'entropy', 'runs']) {
        |  const raw = fs.readFileSync(dir + '/' + name + '.raw');
        |  for (const q of [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]) {
        |    const c = z.brotliCompressSync(raw, {params: {[z.constants.BROTLI_PARAM_QUALITY]: q}});
        |    fs.writeFileSync(dir + '/' + name + '_q' + q + '.br', c);
        |  }
        |}""".stripMargin
    java.nio.file.Files.write(dir.resolve("gen.js"), script.getBytes(UTF_8))
    val rc = new ProcessBuilder("node", dir.resolve("gen.js").toString, dir.toString)
      .inheritIO().start().waitFor()
    assert(rc == 0, "node fixture generation failed")
    var matched = 0
    var fenced = 0
    for ((name, raw) <- raws; q <- 0 to 11) {
      val br = java.nio.file.Files.readAllBytes(dir.resolve(s"${name}_q$q.br"))
      try {
        assert(java.util.Arrays.equals(Brotli.decode(br), raw), s"$name q$q content")
        matched += 1
      } catch {
        case _: Brotli.DictionaryReferenceException => fenced += 1
      }
    }
    info(s"sweep: $matched matched, $fenced dictionary-fenced of 36")
    assert(matched >= 20, s"too few decodable streams: $matched")
    // every quality 0-2 stream must decode (fast paths never emit
    // dictionary references)
    for ((name, raw) <- raws; q <- 0 to 2) {
      val br = java.nio.file.Files.readAllBytes(dir.resolve(s"${name}_q$q.br"))
      assert(java.util.Arrays.equals(Brotli.decode(br), raw), s"$name q$q")
    }
  }
}
