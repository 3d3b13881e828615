package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{ParquetFooter, ParquetPages, ParquetWriter}

/** The hand parquet WRITER against Spark's own reader (independent
  * implementation, parquet-mr underneath) and the repo's own hand
  * readers — the three-way cross-check for spec-conformant output. */
class ParquetWriterSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(name).toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  private def sample(n: Int) =
    spark.range(n.toLong).selectExpr(
      "id AS k",                                                   // required long
      "IF(id % 7 = 0, CAST(NULL AS BIGINT), id * 3) AS n",         // nullable long
      "CAST(id % 1000 AS INT) AS i",                               // int
      "CAST(id AS DOUBLE) / 8 AS d",                               // double
      "IF(id % 5 = 0, CAST(NULL AS STRING), concat('s', id % 97)) AS s", // nullable string
      "id % 3 = 0 AS f")                                           // boolean

  for ((codecName, codec) <- Seq(("uncompressed", 0), ("snappy", 1))) {
    test(s"Spark's own reader reads our files byte-exact ($codecName)") {
      val out = tmpDir(s"pqw_$codecName")
      val df = sample(30000)
      ParquetWriter.writeDir(df.repartition(3), out, codec = codec, pageRows = 4096)
      val back = spark.read.parquet(out)
      assert(back.schema.map(f => (f.name, f.dataType)) ==
        df.schema.map(f => (f.name, f.dataType)))
      val a = df.orderBy("k").collect()
      val b = back.orderBy("k").collect()
      assert(b.length == 30000)
      a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
        assert(x == y, s"row $i ($codecName)")
      }
    }
  }

  test("our own footer + page readers complete the three-way check") {
    val out = tmpDir("pqw_three")
    ParquetWriter.writeDir(sample(20000).coalesce(1), out, pageRows = 2048)
    val (path, len) = ParquetFooter.listDataFiles(spark, out).head
    val conf = new org.apache.hadoop.conf.Configuration()
    val fm = ParquetFooter.readFooter(conf, path, len)
    assert(fm.numRows == 20000)
    assert(fm.schema.head.numChildren.contains(6))
    assert(fm.schema.map(_.name) ==
      Seq("graft_schema", "k", "n", "i", "d", "s", "f"))
    val hand = ParquetPages.scanTwoColumns(spark, out, "k", "n")
      .orderBy("row_idx").collect()
    assert(hand.length == 20000)
    hand.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(2) == i.toLong, s"k at $i")
      if (i % 7 == 0) assert(r.isNullAt(5), s"null n at $i")
      else assert(r.getLong(5) == i.toLong * 3, s"n at $i")
    }
  }

  test("multiple row groups split correctly and read back whole") {
    val out = tmpDir("pqw_rg")
    val df = sample(15000).coalesce(1)
    val specs = df.schema.fields.map(fd => ParquetWriter.ColSpec(fd.name,
      fd.dataType match {
        case org.apache.spark.sql.types.BooleanType => 0
        case org.apache.spark.sql.types.IntegerType => 1
        case org.apache.spark.sql.types.LongType => 2
        case org.apache.spark.sql.types.DoubleType => 5
        case _ => 6
      }, fd.nullable)).toSeq
    val rows = df.collect()
    val cols: Seq[(ParquetWriter.ColSpec, Array[Any])] =
      specs.zipWithIndex.map { case (sp, c) =>
        sp -> rows.map(r => if (r.isNullAt(c)) null else r.get(c))
      }.toSeq
    val bytes = ParquetWriter.writeBytes(cols, rows.length,
      pageRows = 1000, rowGroupRows = 4000)
    java.nio.file.Files.write(java.nio.file.Paths.get(out, "f.parquet"), bytes)
    val fm = ParquetFooter.parseFile(bytes)
    assert(fm.rowGroups.size == 4) // 4000+4000+4000+3000
    assert(fm.rowGroups.map(_.numRows) == Seq(4000L, 4000L, 4000L, 3000L))
    val back = spark.read.parquet(out).orderBy("k").collect()
    assert(back.length == 15000)
    assert(back(14999).getLong(0) == 14999L)
  }

  test("written stats feed the repo's own prune census (and match Spark's view)") {
    val out = tmpDir("pqw_stats")
    // range-partitioned by k so per-file min/max spans are disjoint
    ParquetWriter.writeDir(sample(40000).repartitionByRange(4, col("k")), out)
    val stats = ParquetFooter.columnStats(spark, out)
      .where(col("column_path") === "k").collect()
    assert(stats.length == 4)
    stats.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("min_long")) && !r.isNullAt(r.fieldIndex("max_long")))
      assert(r.getAs[Long]("min_long") <= r.getAs[Long]("max_long"))
    }
    // null counts on the optional column are exact
    val nstats = ParquetFooter.columnStats(spark, out)
      .where(col("column_path") === "n")
      .agg(sum("null_count")).head.getLong(0)
    assert(nstats == (0 until 40000).count(_ % 7 == 0).toLong)
    // prune census: a narrow k window must skip 3 of 4 files
    val census = ParquetFooter.pruneCensus(spark, out, "k", 100L, 200L).collect()
    assert(census.count(_.getAs[Boolean]("skipped")) == 3, census.mkString("\n"))
    // the surviving file scans all of its rows (range split is
    // sample-approximate, so assert structure, not an exact 10k)
    val kept = census.filter(!_.getAs[Boolean]("skipped"))
    assert(kept.length == 1)
    assert(kept.head.getAs[Long]("rows_scanned") == kept.head.getAs[Long]("rg_num_rows"))
    assert(kept.head.getAs[Long]("rows_scanned") >= 101L)
    // Spark's own reader agrees with the planned window
    assert(spark.read.parquet(out).where(col("k").between(100, 200)).count() == 101L)
  }

  test("DuckDB reads our files too (third independent reader; live when python3+duckdb present)") {
    val probe = new ProcessBuilder("python3", "-c", "import duckdb").start()
    assume(probe.waitFor() == 0, "python3/duckdb not available")
    val out = tmpDir("pqw_duck")
    ParquetWriter.writeDir(sample(12000).coalesce(1), out, codec = 1, pageRows = 2048)
    val script =
      s"""import duckdb, json
         |r = duckdb.sql("SELECT count(*), sum(k), sum(n), count(s), sum(CASE WHEN f THEN 1 ELSE 0 END), round(sum(d), 2) FROM '$out/*.parquet'").fetchone()
         |print(json.dumps([str(x) for x in r]))""".stripMargin
    val p = new ProcessBuilder("python3", "-c", script).start()
    val outStr = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).trim
    val err = new String(p.getErrorStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(p.waitFor() == 0, s"duckdb failed: $err")
    val n = 12000
    val sumK = (0 until n).map(_.toLong).sum
    val sumN = (0 until n).filter(_ % 7 != 0).map(_ * 3L).sum
    val cntS = (0 until n).count(_ % 5 != 0)
    val cntF = (0 until n).count(_ % 3 == 0)
    val sumD = BigDecimal((0 until n).map(_ / 8.0).sum).setScale(2,
      BigDecimal.RoundingMode.HALF_EVEN)
    val got = outStr.stripPrefix("[").stripSuffix("]")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
    assert(got(0) == n.toString, s"count: $outStr")
    assert(got(1) == sumK.toString, s"sum k: $outStr")
    assert(got(2) == sumN.toString, s"sum n: $outStr")
    assert(got(3) == cntS.toString, s"count s: $outStr")
    assert(got(4) == cntF.toString, s"count f: $outStr")
    assert(BigDecimal(got(5)) == sumD, s"sum d: $outStr")
  }

  test("LIST columns round-trip through Spark's reader AND our own list scanner") {
    val out = tmpDir("pqw_list")
    val df = spark.range(8000).selectExpr("id AS k",
      """CASE WHEN id % 11 = 0 THEN CAST(NULL AS ARRAY<STRING>)
        |     WHEN id % 7 = 0 THEN array()
        |     WHEN id % 5 = 0 THEN array(concat('x', id), CAST(NULL AS STRING), 'tail')
        |     ELSE array(concat('a', id), concat('b', id % 19))
        |END AS xs""".stripMargin,
      "sequence(CAST(0 AS BIGINT), id % 3) AS ns")
    ParquetWriter.writeDir(df.coalesce(1), out, pageRows = 1024)
    // Spark's own reader
    val back = spark.read.parquet(out).orderBy("k").collect()
    val want = df.orderBy("k").collect()
    assert(back.length == 8000)
    want.zip(back).zipWithIndex.foreach { case ((w, g), i) =>
      assert(w == g, s"row $i")
    }
    // our own Dremel list scanner reads the same file
    val hand = graft.sources.ParquetPages.scanListColumn(spark, out, "xs")
      .orderBy("row_idx").collect()
    want.zipWithIndex.foreach { case (row, i) =>
      val g = hand(i)
      if (row.isNullAt(1)) assert(g.getLong(2) == -1L, s"null list at $i")
      else {
        val xs = row.getSeq[String](1)
        assert(g.getLong(2) == xs.length.toLong, s"n_elems at $i")
        assert(g.getSeq[String](3) == xs, s"elems at $i")
      }
    }
  }

  test("loud contracts: nulls in a REQUIRED column, bad codec, bad type") {
    val spec = ParquetWriter.ColSpec("x", 2, optional = false)
    intercept[IllegalArgumentException] {
      ParquetWriter.writeBytes(Seq((spec, Array[Any](1L, null))), 2)
    }
    intercept[IllegalArgumentException] {
      ParquetWriter.writeBytes(Seq((spec, Array[Any](1L))), 1, codec = 6)
    }
    intercept[IllegalArgumentException] { ParquetWriter.ColSpec("x", 3, true) }
  }
}
