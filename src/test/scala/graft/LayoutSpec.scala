package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: golden values") {
    // x=3 (011), y=5 (101) at 3 bits: positions x->0,2,4 y->1,3,5
    // bit0=x0=1 bit1=y0=1 bit2=x1=1 bit3=y1=0 bit4=x2=0 bit5=y2=1
    // = 0b100111 = 39
    val df = Seq((3, 5), (0, 0), (7, 7), (4, 1)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 3).as("z"))
    assert(df.as[Long].collect().toSeq == Seq(39L, 0L, 63L, 18L))
    // (4,1): x=100 y=001 -> bit1=y0=1, bit4=x2=1 -> 18
  }

  test("zValue is monotone on each axis with the other fixed") {
    val rows = for (x <- 0 until 16) yield (x, 9)
    val zs = rows.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 4).as("z"))
      .as[Long].collect()
    assert(zs.toSeq == zs.sorted.toSeq)
  }

  test("zorderBy clusters: 2-D neighbors land in the same partition range") {
    val df = (0 until 1024).map(i => (i, i % 32, i / 32)).toDF("id", "x", "y")
    val z = Layout.zorderBy(df, col("x"), col("y"), bits = 5)
    // the z column is the Morton key and the frame is sorted by it
    // within partitions; per-partition min/max ranges must not overlap
    // (range partitioning) — that is what prunes files at scale
    val parts = z.select(col("z"))
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSeq))
      .collect().filter(_.nonEmpty)
    parts.foreach(p => assert(p == p.sorted))
    val ranges = parts.map(p => (p.min, p.max)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, max1), (min2, _)) => assert(max1 <= min2)
      case _ =>
    }
  }

  test("hilbertD is a bijection with unit steps — the defining curve property") {
    for (bits <- 2 to 5) {
      val n = 1 << bits
      val byD = (for (x <- 0 until n; y <- 0 until n)
        yield Layout.hilbertD(x.toLong, y.toLong, bits) -> ((x, y))).toMap
      assert(byD.keySet === (0 until n * n).map(_.toLong).toSet,
        s"bits=$bits not bijective")
      (0L until (n * n - 1).toLong).foreach { d =>
        val (x1, y1) = byD(d)
        val (x2, y2) = byD(d + 1)
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
          s"bits=$bits: d=$d -> ($x1,$y1) then ($x2,$y2) not adjacent")
      }
    }
  }

  test("hilbertValue Column matches the scalar mirror on the full grid") {
    val bits = 5
    val n = 1 << bits
    val df = (0 until n * n).map(i => (i % n, i / n)).toDF("x", "y")
    val got = df.select(col("x"), col("y"),
      Layout.hilbertValue(col("x"), col("y"), bits).as("h")).collect()
    got.foreach { r =>
      assert(r.getLong(2) ===
        Layout.hilbertD(r.getInt(0).toLong, r.getInt(1).toLong, bits))
    }
  }

  test("hilbert beats z-order locality: total walk jump is exactly cells - 1") {
    val bits = 4
    val n = 1 << bits
    val cells = (for (x <- 0 until n; y <- 0 until n) yield (x, y))
    def totalJump(key: (Int, Int) => Long): Long =
      cells.sortBy { case (x, y) => key(x, y) }.sliding(2).map {
        case Seq((x1, y1), (x2, y2)) =>
          (math.abs(x1 - x2) + math.abs(y1 - y2)).toLong
        case _ => 0L
      }.sum
    val hJump = totalJump((x, y) => Layout.hilbertD(x.toLong, y.toLong, bits))
    // z-order via the Column expression on a local frame
    val zMap = (for (x <- 0 until n; y <- 0 until n) yield (x, y)).toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), bits).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val zJump = totalJump((x, y) => zMap((x, y)))
    assert(hJump === (n * n - 1).toLong, s"hilbert walk jump $hJump")
    assert(zJump > hJump, s"z-order jump $zJump must exceed hilbert $hJump")
  }

  test("hilbertBy range-partitions with non-overlapping key ranges") {
    val df = (0 until 1024).map(i => (i, i % 32, i / 32)).toDF("id", "x", "y")
    val h = Layout.hilbertBy(df, col("x"), col("y"), bits = 5)
    val parts = h.select(col("h"))
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSeq))
      .collect().filter(_.nonEmpty)
    parts.foreach(p => assert(p == p.sorted))
    val ranges = parts.map(p => (p.min, p.max)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, max1), (min2, _)) => assert(max1 <= min2)
      case _ =>
    }
  }

  test("hilbertValue loud contract on bits") {
    intercept[IllegalArgumentException] {
      Layout.hilbertValue(col("x"), col("y"), 32)
    }
    intercept[IllegalArgumentException] {
      Layout.hilbertValue(col("x"), col("y"), 0)
    }
  }

  test("hilbertValue interpreted eval matches codegen on a parquet-backed frame") {
    // parquet scan => whole-stage codegen path; local collect of the
    // same rows through a filter that disables codegen would be
    // version-fragile, so instead pin codegen-vs-scalar at a bits
    // level the old unrolled form could not reach (bits = 16)
    val bits = 16
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select((col("doc_id") % (1L << bits)).as("x"),
        ((col("doc_id") * 37) % (1L << bits)).as("y"))
    val got = docs.select(col("x"), col("y"),
      Layout.hilbertValue(col("x"), col("y"), bits).as("h")).collect()
    got.foreach { r =>
      assert(r.getLong(2) === Layout.hilbertD(r.getLong(0), r.getLong(1), bits))
    }
  }
}
