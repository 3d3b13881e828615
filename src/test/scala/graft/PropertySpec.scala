package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, Reductions}

/** Property tests over scalacheck-generated data (SURVEY §5): results
  * must be invariant to partitioning (the reference's chunk-boundary
  * header bug is the cautionary tale, core.py:254-255 + io.py:17-18),
  * and pandas skipna semantics must hold for arbitrary null patterns.
  *
  * Generators are driven with fixed seeds (deterministic CI) — the
  * scalatest/scalacheck bridge isn't on the offline classpath, so this
  * drives `Gen` directly.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val dataGen: Gen[List[Option[Double]]] =
    Gen.listOfN(60, Gen.option(Gen.chooseNum(-1e6, 1e6).map(v => math.rint(v) / 4)))

  test("sum/count/mean/min/max match Scala references for any null pattern") {
    for (seed <- 1L to 8L) {
      val xs = sample(dataGen, seed)
      val present = xs.flatten
      val df = xs.map(o => Tuple1(o.map(Double.box).orNull)).toDF("x")
        .select(col("x").cast("double").as("x"))
      val r = df.agg(
        coalesce(sum("x"), lit(0.0)).as("s"),
        count(col("x")).as("c"),
        avg("x").as("m"),
        min("x").as("mn"),
        max("x").as("mx")).collect()(0)
      assert(math.abs(r.getDouble(0) - present.sum) < 1e-6, s"seed=$seed sum")
      assert(r.getLong(1) == present.size, s"seed=$seed count")
      if (present.nonEmpty) {
        assert(math.abs(r.getDouble(2) - present.sum / present.size) < 1e-6, s"seed=$seed mean")
        assert(r.getDouble(3) == present.min && r.getDouble(4) == present.max, s"seed=$seed minmax")
      } else {
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4), s"seed=$seed empties")
      }
    }
  }

  test("every reduction is invariant under repartition(n)") {
    for (seed <- 1L to 4L) {
      val xs = sample(dataGen, seed)
      val df = xs.map(o => Tuple1(o.map(Double.box).orNull)).toDF("x")
        .select(col("x").cast("double").as("x"))
      val reference = Reductions.count0(df.repartition(1), Seq("x")).collect()(0)
      val refSum = Reductions.sum0(df.repartition(1), Seq("x")).collect()(0)
      val refProd = Reductions.prod0(
        df.repartition(1).select((abs(col("x")) / 1e6 + 0.5).as("x")), Seq("x"))
        .collect()(0).getDouble(0)
      for (n <- Seq(3, 8, 17)) {
        val d = df.repartition(n)
        assert(Reductions.count0(d, Seq("x")).collect()(0) == reference, s"seed=$seed n=$n count")
        assert(Reductions.sum0(d, Seq("x")).collect()(0) == refSum ||
          math.abs(Reductions.sum0(d, Seq("x")).collect()(0).getDouble(0) -
            refSum.getDouble(0)) < 1e-6, s"seed=$seed n=$n sum")
        val p = Reductions.prod0(
          d.select((abs(col("x")) / 1e6 + 0.5).as("x")), Seq("x")).collect()(0).getDouble(0)
        assert(math.abs(p - refProd) <= math.abs(refProd) * 1e-12, s"seed=$seed n=$n prod")
      }
    }
  }

  test("min_count: sum is null iff non-null count < min_count") {
    for (seed <- 10L to 14L) {
      val xs = sample(dataGen, seed)
      val present = xs.flatten.size
      val df = xs.map(o => Tuple1(o.map(Double.box).orNull)).toDF("x")
        .select(col("x").cast("double").as("x"))
      for (mc <- Seq(0, present, present + 1)) {
        val r = Reductions.sum0(df, Seq("x"), minCount = mc).collect()(0)
        if (mc > present) assert(r.isNullAt(0), s"seed=$seed mc=$mc")
        else assert(!r.isNullAt(0), s"seed=$seed mc=$mc")
      }
    }
  }

  private val wordGen: Gen[String] =
    Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
  private val textGen: Gen[String] =
    Gen.chooseNum(3, 40).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  test("jaccard properties: self=1, symmetric, in [0,1]") {
    for (seed <- 1L to 6L) {
      val a = sample(textGen, seed)
      val b = sample(textGen, seed + 100)
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        Dedup.jaccard(Dedup.shingles(col("a")), Dedup.shingles(col("a"))).as("self"),
        Dedup.jaccard(Dedup.shingles(col("a")), Dedup.shingles(col("b"))).as("ab"),
        Dedup.jaccard(Dedup.shingles(col("b")), Dedup.shingles(col("a"))).as("ba"))
        .collect()(0)
      assert(r.getDouble(0) == 1.0, s"seed=$seed self")
      assert(r.getDouble(1) == r.getDouble(2), s"seed=$seed symmetry")
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0, s"seed=$seed range")
    }
  }

  test("minhash: identical texts always collide; signature length is k") {
    for (seed <- 1L to 6L) {
      val t = sample(textGen, seed)
      val df = Seq((1L, t), (2L, t)).toDF("id", "text")
      val sigs = df.select(
        graft.functions.MinHashSignature.minhash(Dedup.shingles(col("text")), 96).as("sig"))
        .collect()
      assert(sigs(0).getSeq[Long](0) == sigs(1).getSeq[Long](0), s"seed=$seed equal")
      assert(sigs(0).getSeq[Long](0).length == 96, s"seed=$seed length")
    }
  }

  test("mergeAsof matches a naive per-row scan on random data (both directions)") {
    import graft.operators.AsofJoin
    val tsGen = Gen.listOfN(30, Gen.chooseNum(0L, 1000L))
    for (seed <- 1L to 6L; dir <- Seq("backward", "forward")) {
      val lTs = sample(tsGen, seed).distinct
      val rTs = sample(tsGen, seed + 100).distinct
      val key = "k"
      val left = lTs.map(t => (key, new java.sql.Timestamp(t * 1000), t)).toDF("by", "ts", "lv")
      val right = rTs.map(t => (key, new java.sql.Timestamp(t * 1000), t * 10)).toDF("by", "ts", "rv")
      val got = AsofJoin.mergeAsof(left, right, on = "ts", by = "by",
          valueCols = Seq("rv"), direction = dir)
        .orderBy("lv").collect()
        .map(r => r.getLong(2) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      val want = lTs.map { t =>
        val cands = if (dir == "backward") rTs.filter(_ <= t) else rTs.filter(_ >= t)
        val best = if (dir == "backward") cands.sorted.lastOption else cands.sorted.headOption
        t -> best.map(_ * 10)
      }.toMap
      assert(got == want, s"seed=$seed dir=$dir")
    }
  }

  test("LSH candidate pairs are invariant under repartition(n)") {
    val docs = (1 to 40).map { i =>
      val base = (1 to 40).map(t => s"tok${(i * 7 + t) % 13}").mkString(" ")
      (i.toLong, if (i % 2 == 0) base else base + " extra tail tokens here")
    }.toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      Dedup.lshCandidatePairs(df, "doc_id", "text", 64, 16, 3, 7L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p1 = pairs(docs.repartition(1))
    val p7 = pairs(docs.repartition(7))
    assert(p1 == p7)
    assert(p1.nonEmpty)
  }

  test("decontamination law: kept ∪ flagged partitions train; flags match brute truth") {
    import graft.operators.Contamination
    for (seed <- 1L to 4L) {
      val vocab = 8 + (seed % 5).toInt // small vocab → organic collisions
      val docs = (1 to 30).map { i =>
        (i.toLong, (1 to 20).map(t => s"w${(i * 3 + t * seed) % vocab}").mkString(" "))
      }.toDF("doc_id", "text")
      val eval_ = docs.where(col("doc_id") % 5 === 0).select(col("text"))
      val n = 4
      val flagged = Contamination.contaminatedIds(docs, "doc_id", "text", eval_, "text", n)
        .collect().map(_.getLong(0)).toSet
      val kept = Contamination.decontaminate(docs, "doc_id", "text", eval_, "text", n)
        .collect().map(_.getLong(0)).toSet
      assert((flagged & kept).isEmpty, s"seed=$seed")
      assert((flagged | kept) == (1L to 30L).toSet, s"seed=$seed")
      // brute-force ground truth via local n-gram sets
      def grams(t: String) = t.toLowerCase.split("\\s+").toSeq
        .sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
      val local = docs.collect().map(r => r.getLong(0) -> grams(r.getString(1))).toMap
      val evGrams = eval_.collect().flatMap(r => grams(r.getString(0))).toSet
      val truth = local.filter(_._2.exists(evGrams)).keySet
      assert(flagged == truth, s"seed=$seed")
    }
  }

  test("int8 law: |x - decode(encode(x))| <= scale/2 elementwise; verdicts never null") {
    import graft.operators.Quantization
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0).map(v => math.rint(v * 8) / 8))
    for (seed <- 1L to 8L) {
      val v = sample(vecGen, seed)
      val df = Seq(Tuple1(v)).toDF("v")
      val enc = Quantization.int8Encode(col("v")).map { case (n, c) => c.as(n) }
      val r = df.select(col("v") +: enc: _*)
        .select(col("v"), col("scale"),
          Quantization.int8Decode(col("codes"), col("scale")).as("d"))
        .collect()(0)
      val scale = r.getDouble(1)
      val dec = r.getSeq[Double](2)
      // half-up rounding puts every element within half a quantization
      // step of the original (exact for the all-zero vector)
      v.zip(dec).foreach { case (x, y) =>
        assert(math.abs(x - y) <= scale / 2 + 1e-12, s"seed=$seed x=$x y=$y scale=$scale")
      }
    }
  }

  test("gopher/c4 verdicts are total: never null on arbitrary unicode junk") {
    import graft.operators.TextOps
    val junkGen = Gen.listOfN(40,
      Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.oneOf("\n", "\t", " ", "…", "##", "...", "{", "é∆ ")))
      .map(_.mkString(" "))
    for (seed <- 1L to 10L) {
      val t = sample(junkGen, seed)
      val df = Seq(Tuple1(t)).toDF("t")
      val r = df.select(
        TextOps.gopherKeep(col("t")).as("g"),
        TextOps.c4Clean(col("t")).toMap.apply("keep_doc").as("c")).collect()(0)
      assert(!r.isNullAt(0) && !r.isNullAt(1), s"seed=$seed text=${t.take(60)}")
    }
  }

  test("bm25 law: no query hits → score 0; adding a hit term strictly increases it") {
    import graft.operators.TextOps
    val docs = Seq((1L, "x y z"), (2L, "x q y"), (3L, "p q r")).toDF("id", "t")
    val base = TextOps.bm25Score(docs, "id", "t", Seq("absent"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(base.values.forall(_ == 0.0))
    val one = TextOps.bm25Score(docs, "id", "t", Seq("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val two = TextOps.bm25Score(docs, "id", "t", Seq("q", "p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(one(1L) == 0.0 && one(2L) > 0 && one(3L) > 0)
    assert(two(3L) > one(3L)) // doc 3 gains the 'p' term
    assert(two(2L) == one(2L)) // doc 2 has no 'p': unchanged
  }

  test("chunking law: dropping each chunk's overlap prefix reconstructs the doc") {
    import graft.operators.Pipeline
    val lenGen = Gen.chooseNum(1, 400)
    for (seed <- 1L to 8L) {
      val n = sample(lenGen, seed)
      val maxTokens = 40
      val overlap = (seed % maxTokens).toInt // 1..8 — any overlap < maxTokens
      val text = (1 to n).map(i => s"w$i").mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val chunks = Pipeline.chunkDocuments(df, "doc_id", "text", maxTokens, overlap)
        .orderBy("chunk_idx").collect().map(_.getString(2).split(" ").toSeq)
      // chunk 0 whole, later chunks minus their overlap prefix, concatenated
      val rebuilt = chunks.head ++ chunks.tail.flatMap(_.drop(overlap))
      assert(rebuilt == text.split(" ").toSeq, s"seed=$seed n=$n overlap=$overlap")
      // every chunk except possibly the last is exactly maxTokens long
      chunks.dropRight(1).foreach(c => assert(c.length == maxTokens, s"seed=$seed"))
    }
  }

  test("url canonicalize laws: idempotent, fragment-free, lowercase authority") {
    import graft.operators.UrlOps
    val urlGen = for {
      sch <- Gen.oneOf("http", "HTTP", "https", "HTTPS", "ftp")
      user <- Gen.oneOf("", "u:p@")
      host <- Gen.oneOf("Example.COM", "sub.ex.org", "LOCALHOST", "a.b.co.uk")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/A/b", "/x%20y")
      query <- Gen.oneOf("", "?id=1", "?utm_source=x", "?utm_a=1&id=2",
        "?id=2&gclid=z", "?utm_a=1&utm_b=2", "?myutm=1&fbclid=q&id=3")
      frag <- Gen.oneOf("", "#f", "#Sec One")
    } yield s"$sch://$user$host$port$path$query$frag"
    val urls = (1L to 40L).map(sample(urlGen, _)).distinct
    val df = urls.map(Tuple1(_)).toDF("u")
    val rows = df.select(col("u"),
      UrlOps.canonicalize(col("u")).as("c1"),
      UrlOps.canonicalize(UrlOps.canonicalize(col("u"))).as("c2"),
      UrlOps.host(col("u")).as("h")).collect()
    for (r <- rows) {
      val (u, c1, c2, h) = (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
      assert(c1 == c2, s"not idempotent: $u -> $c1 -> $c2")
      assert(!c1.contains("#"), s"fragment survived: $u -> $c1")
      assert(!c1.contains("@"), s"userinfo survived: $u -> $c1")
      assert(h == h.toLowerCase, s"host not lowercased: $u")
      assert(c1.startsWith(u.takeWhile(_ != ':').toLowerCase + "://"), s"$u -> $c1")
      // no tracking param survives as a whole param name
      for (bad <- Seq("utm_source", "utm_a", "utm_b", "gclid", "fbclid"))
        assert(!c1.matches(s".*[?&]$bad=.*"), s"tracking survived: $u -> $c1")
    }
  }

  test("dedupLines law: the output is a fixpoint (second pass drops nothing)") {
    import graft.operators.Dedup
    val lineGen = Gen.listOfN(5, Gen.oneOf(
      Gen.oneOf("SHARED banner", "shared banner  ", "All Rights Reserved", ""),
      Gen.alphaNumStr.map("uniq " + _.take(10))))
    val docs = (1L to 20L).map { i =>
      (i, sample(lineGen, i).mkString("\n") + s"\ntail $i")
    }
    val df = docs.toDF("doc_id", "text")
    val once = Dedup.dedupLines(df, "doc_id", "text", minDocs = 2)
      .select("doc_id", "text").localCheckpoint(true)
    val twice = Dedup.dedupLines(once, "doc_id", "text", minDocs = 2)
    assert(twice.agg(sum("n_lines_dropped")).collect()(0).getLong(0) == 0L)
    // and no non-blank normalized line is left in >= 2 docs
    val texts = once.collect().map(r => r.getLong(0) -> r.getString(1))
    val freq = texts.flatMap { case (id, t) =>
      t.split("\n").map(_.trim.toLowerCase).filter(_.nonEmpty).distinct.map(_ -> id)
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.size }
    assert(freq.values.forall(_ < 2), freq.filter(_._2 >= 2).toString)
  }

  test("GIF gradient encode → decode is the identity for arbitrary dims and layouts") {
    val dimGen = for {
      id <- Gen.chooseNum(0L, 1000000L)
      w <- Gen.chooseNum(1, 70)
      h <- Gen.chooseNum(1, 70)
      il <- Gen.oneOf(true, false)
    } yield (id, w, h, il)
    for (seed <- 1L to 12L) {
      val (id, w, h, il) = sample(dimGen, seed)
      val r = graft.operators.GifCodec.decode(
        graft.operators.GifCodec.encodeGradient(id, w, h, il))
      assert(r.width == w && r.height == h, s"seed=$seed")
      var ok = true
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((id + x * 7L + y * 13L) % 256).toInt
        val o = (y * w + x) * 3
        ok &&= (r.pixels(o) & 0xff) == v && (r.pixels(o + 1) & 0xff) == v &&
          (r.pixels(o + 2) & 0xff) == v
      }
      assert(ok, s"seed=$seed ${w}x$h interlaced=$il")
    }
  }

  test("media-metadata codecs: parse∘encode is the identity over arbitrary valid specs") {
    import graft.operators.{EbmlMeta, FlacMeta, Mp3Meta, OggMeta}
    val specGen = for {
      samples <- Gen.chooseNum(0L, (1L << 35) - 1)
      rate <- Gen.oneOf(8000, 16000, 22050, 32000, 44100, 48000, 96000)
      ch <- Gen.chooseNum(1, 8)
      bps <- Gen.oneOf(8, 12, 16, 20, 24, 32)
      ms <- Gen.chooseNum(0L, 86400000L)
      w <- Gen.chooseNum(1, 0xffff)
      h <- Gen.chooseNum(1, 0xffff)
      frames <- Gen.chooseNum(1, 12)
      bi <- Gen.chooseNum(1, 14)
      si <- Gen.chooseNum(0, 2)
      db <- Gen.chooseNum(1, 255)
    } yield (samples, rate, ch, bps, ms, w, h, frames, bi, si, db)
    for (seed <- 1L to 32L) {
      val (samples, rate, ch, bps, ms, w, h, frames, bi, si, db) =
        sample(specGen, seed)
      val f = FlacMeta.parse(FlacMeta.encode(samples, rate, ch, bps))
      assert(f.totalSamples == samples && f.sampleRate == rate &&
        f.channels == ch && f.bitsPerSample == bps &&
        f.durationMs == samples * 1000 / rate, s"seed=$seed flac")
      val e = EbmlMeta.parse(EbmlMeta.encode(ms, w, h))
      assert(e.durationMs == ms && e.width == w && e.height == h, s"seed=$seed ebml")
      val m = Mp3Meta.parse(Mp3Meta.encode(frames, bi, si))
      assert(m.nFrames == frames && !m.vbr, s"seed=$seed mp3")
      val chO = (ch - 1) % 8 + 1
      val o = OggMeta.parse(OggMeta.encode(samples, chO, preSkip = ms.toInt & 0xffff,
        inputSampleRate = rate.toLong, dataBytes = db))
      assert(o.channels == chO && o.durationMs == samples * 1000 / 48000 &&
        o.nPages == 2, s"seed=$seed opus")
      // round-10 codecs: AAC/ADTS, M4A, Vorbis-in-Ogg
      val srIdxA = si * 4 + (frames % 4) // 0..11 of the 13 legal indexes
      val ccA = (ch - 1) % 7 + 1
      val a = graft.operators.AacMeta.parse(
        graft.operators.AacMeta.encode(frames, srIdxA, ccA, payloadBytes = db))
      assert(a.nFrames == frames && a.profile == 1 && !a.vbr &&
        a.channels == (if (ccA == 7) 8 else ccA), s"seed=$seed aac")
      val m4 = graft.operators.Mp4Meta.parseAudio(
        graft.operators.Mp4Meta.encodeM4a(ms, rate min 0xffff, chO))
      assert(m4.durationMs == ms && m4.sampleRate == (rate min 0xffff) &&
        m4.channels == chO && m4.codec == "mp4a", s"seed=$seed m4a")
      val v = OggMeta.parseAudio(
        OggMeta.encodeVorbis(samples, chO, rate.toLong, dataBytes = db))
      assert(v.codec == "vorbis" && v.channels == chO &&
        v.sampleRate == rate.toLong &&
        v.durationMs == samples * 1000 / rate, s"seed=$seed vorbis")
    }
  }

  test("mu-law companding: idempotent quantization, bounded error, sign-symmetric") {
    import graft.operators.WavCodec.{linearToUlaw, ulawToLinear}
    val sGen = Gen.chooseNum(-32768, 32767)
    for (seed <- 1L to 64L) {
      val s = sample(sGen, seed)
      val q = ulawToLinear(linearToUlaw(s))
      // idempotent: re-quantizing a quantized value is the identity
      assert(ulawToLinear(linearToUlaw(q)) == q, s"seed=$seed s=$s")
      // error bounded by the ladder's largest step (segment 7: 1024)
      assert(math.abs(q - s) <= 1024, s"seed=$seed s=$s q=$q")
      // sign symmetry away from the clip region (|−s| = |s| there)
      if (s != -32768)
        assert(ulawToLinear(linearToUlaw(-s)) == -q, s"seed=$seed s=$s")
    }
  }

  test("codec law: every round-11 codec round-trips arbitrary byte arrays") {
    import graft.operators.{Lz4, Snappy, ZipCodec}
    // three byte regimes scalacheck reaches rarely by accident: short
    // random, long low-entropy (match-heavy), long high-entropy
    val byteGen: Gen[Array[Byte]] = Gen.oneOf(
      Gen.chooseNum(0, 40).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)),
      Gen.chooseNum(100, 90000).flatMap(n =>
        Gen.chooseNum(1, 5).map(k =>
          Array.tabulate(n)(i => ((i / k) % 7 + 65).toByte))),
      Gen.chooseNum(100, 90000).flatMap(n =>
        Gen.chooseNum(1, 1 << 30).map(s =>
          Array.tabulate(n)(i => ((i * s + (i >> 3) * 2654435761L) >>> 13).toByte))))
    for (seed <- 1L to 40L) {
      val raw = sample(byteGen, seed)
      assert(Lz4.decode(Lz4.encode(raw)).sameElements(raw), s"lz4 seed=$seed n=${raw.length}")
      assert(Snappy.uncompress(Snappy.compress(raw)).sameElements(raw),
        s"snappy-block seed=$seed n=${raw.length}")
      assert(Snappy.decodeFramed(Snappy.encodeFramed(raw)).sameElements(raw),
        s"snappy-framed seed=$seed n=${raw.length}")
      val zipBack = ZipCodec.decode(ZipCodec.encode(Seq(ZipCodec.Entry("e", raw))))
      assert(zipBack.length == 1 && zipBack.head.data.sameElements(raw),
        s"zip seed=$seed n=${raw.length}")
      val rec = graft.sources.AvroCodec.AvRecord("R", Vector(
        graft.sources.AvroCodec.AvField("b", graft.sources.AvroCodec.ABytes)))
      val (_, rows) = graft.sources.AvroCodec.decode(
        graft.sources.AvroCodec.encode(rec, Seq(Seq[Any](raw)), "deflate"))
      assert(rows.head.head.asInstanceOf[Array[Byte]].sameElements(raw),
        s"avro seed=$seed n=${raw.length}")
    }
  }
}
