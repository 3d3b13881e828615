package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Seeded scalacheck-driven laws for the round-10 codec/curation tier
  * (same harness style as [[PropertySpec]]): identity round-trips on
  * adversarial byte shapes, idempotence, totality, and agreement with
  * brute-force references. */
class CodecPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Byte-array generator biased toward compression-relevant shapes:
    * uniform noise, low-entropy runs, and ASCII-ish text. */
  private val bytesGen: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(0, 3000)
    kind <- Gen.chooseNum(0, 2)
    bytes <- kind match {
      case 0 => Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
      case 1 => // runs
        Gen.listOfN(math.max(1, n / 20),
          Gen.zip(Gen.chooseNum(0, 255), Gen.chooseNum(1, 40)))
          .map(_.flatMap { case (b, k) => List.fill(k)(b.toByte) })
      case _ => Gen.listOfN(n, Gen.chooseNum(32, 126).map(_.toByte))
    }
  } yield bytes.toArray

  test("gzip/bzip2/xz: decode∘encode is identity on adversarial byte shapes") {
    for (seed <- 1L to 12L) {
      val raw = sample(bytesGen, seed)
      assert(Gzip.gunzip(Gzip.gzip(raw)).sameElements(raw), s"gzip seed=$seed n=${raw.length}")
      assert(Gzip.gunzip(Gzip.gzip(raw, stored = true)).sameElements(raw), s"gzs seed=$seed")
      assert(Bzip2.decode(Bzip2.encode(raw)).sameElements(raw), s"bz2 seed=$seed n=${raw.length}")
      assert(Xz.decode(Xz.encode(raw)).sameElements(raw), s"xz seed=$seed n=${raw.length}")
    }
  }

  test("Decompress.auto inverts every encoder and tags it correctly") {
    for (seed <- 1L to 6L) {
      val raw = sample(bytesGen, seed * 31)
      for ((fmt, enc) <- Seq[(String, Array[Byte] => Array[Byte])](
          ("gzip", b => Gzip.gzip(b)), ("bzip2", Bzip2.encode), ("xz", Xz.encode))) {
        val (got, out) = Decompress.auto(enc(raw))
        assert(got == fmt && out.sameElements(raw), s"$fmt seed=$seed")
      }
    }
  }

  test("mojibake repair is idempotent and inverts garbling of ASCII text") {
    val textGen = Gen.listOfN(80, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '.', ',', '!'))).map(_.mkString)
    for (seed <- 1L to 10L) {
      val clean = "é—" + sample(textGen, seed) // guaranteed non-ASCII head
      val garbled = new String(clean.getBytes(UTF_8), ISO_8859_1)
      assert(Mojibake.fix(garbled) == clean, s"seed=$seed")
      val once = Mojibake.fix(garbled)
      assert(Mojibake.fix(once) == once, s"idempotence seed=$seed")
    }
  }

  test("htmlToText and wikitextToPlain are total and whitespace-normal on junk") {
    val junkGen = Gen.listOfN(200, Gen.oneOf(
      'a', 'b', '<', '>', '[', ']', '{', '}', '|', '=', '&', '#', ';', '\'',
      '"', '/', '!', '-', ' ', '\n', '\t')).map(_.mkString)
    for (seed <- 1L to 15L) {
      val junk = sample(junkGen, seed)
      val h = WebArchive.htmlToText(junk)
      val w = WikiDump.wikitextToPlain(junk)
      // no throw, and collapsed whitespace: never two spaces, no tabs/newlines
      for (s <- Seq(h, w)) {
        assert(!s.contains("  ") && !s.contains('\n') && !s.contains('\t'),
          s"seed=$seed got '$s'")
        assert(s == s.trim, s"seed=$seed untrimmed")
      }
    }
  }

  test("robots matcher degenerates to startsWith for wildcard-free patterns") {
    val pathGen = Gen.listOfN(12, Gen.oneOf('a', 'b', '/', '.')).map("/" + _.mkString)
    for (seed <- 1L to 20L) {
      val p = sample(pathGen, seed)
      val pat = sample(pathGen, seed + 1000).take(1 + (seed % 6).toInt)
      assert(Robots.matches(pat, p) == p.startsWith(pat), s"pat=$pat path=$p")
    }
  }

  test("tar roundtrip on random entry sets") {
    val entryGen = for {
      k <- Gen.chooseNum(0, 6)
      es <- Gen.listOfN(k, for {
        nameLen <- Gen.chooseNum(1, 40)
        name <- Gen.listOfN(nameLen, Gen.alphaNumChar).map(_.mkString)
        data <- bytesGen
      } yield TarCodec.Entry(name, data))
    } yield es
    for (seed <- 1L to 8L) {
      val es = sample(entryGen, seed)
      val back = TarCodec.decode(TarCodec.encode(es))
      assert(back.map(_.name) == es.map(_.name), s"seed=$seed names")
      back.zip(es).foreach { case (b, e) =>
        assert(b.data.sameElements(e.data), s"seed=$seed data")
      }
    }
  }

  test("BPE applyMerge is a fixpoint (applying the same rule twice changes nothing)") {
    val symsGen = Gen.listOfN(30, Gen.oneOf("a", "b", "ab", "c")).map(_.toArray)
    for (seed <- 1L to 15L) {
      val syms = sample(symsGen, seed)
      val once = Bpe.applyMerge(syms, "a", "b")
      assert(Bpe.applyMerge(once, "a", "b").toSeq == once.toSeq, s"seed=$seed")
      // and no adjacent (a,b) remains
      assert(!once.toSeq.sliding(2).exists(p => p.length == 2 && p(0) == "a" && p(1) == "b"))
    }
  }

  test("KMV sketch equals the brute k smallest distinct values") {
    val hashGen = Gen.listOfN(300, Gen.chooseNum(0L, 500L))
    for (seed <- 1L to 10L) {
      val hs = sample(hashGen, seed)
      val agg = new graft.functions.KmvAgg(16)
      val sketch = hs.foldLeft(agg.zero)(agg.reduce).toSeq
      assert(sketch == hs.distinct.sorted.take(16), s"seed=$seed")
    }
  }

  test("PDF extract inverts encode for paren/backslash-laden text") {
    val tGen = Gen.listOfN(60, Gen.frequency(
      6 -> Gen.alphaNumChar, 1 -> Gen.oneOf('(', ')', '\\'), 1 -> Gen.const(' ')))
      .map(cs => { val s = cs.mkString.trim; if (s.isEmpty) "x" else s })
    for (seed <- 1L to 10L) {
      val t = sample(tGen, seed)
      // PDF literal strings preserve interior whitespace verbatim;
      // extractText only trims the run edges
      assert(PdfCodec.extractText(PdfCodec.encode(t, None, flate = seed % 2 == 0)) == t,
        s"seed=$seed t='$t'")
    }
  }
}
