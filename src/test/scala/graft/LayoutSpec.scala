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
}
