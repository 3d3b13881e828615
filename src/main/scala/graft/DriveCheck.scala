package graft
import org.apache.spark.sql.functions._
import graft.functions.SimHash64.simhash
object DriveCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("drive-check", "local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val base = docs.where(size(split(col("text"), " ")) >= 30).select(col("doc_id"), col("text"))
    val pert = base.select(col("doc_id"),
      array_join(slice(split(col("text"), " "), lit(1), size(split(col("text"), " ")) - 5), " ").as("text2"))
    val h = base.join(pert, "doc_id")
      .select(col("doc_id"), simhash(col("text"), 42L).as("h1"), simhash(col("text2"), 42L).as("h2"))
      .select(col("doc_id"), bit_count(col("h1").bitwiseXOR(col("h2"))).as("ham"),
        col("h1"), col("h2"))
    println("=== MARKER hamming distribution ===")
    h.groupBy("ham").count().orderBy("ham").show(70)
    // of those with ham <= 6: how many share a 16-bit chunk?
    val chunkMatch = h.select(col("doc_id"), col("ham"),
      (0 until 4).map(j => (shiftrightunsigned(col("h1"), j*16).bitwiseAND(lit(0xffffL)) ===
        shiftrightunsigned(col("h2"), j*16).bitwiseAND(lit(0xffffL))).cast("int")).reduce(_ + _).as("nchunks"))
    println("=== MARKER ham<=6 but no chunk match ===")
    chunkMatch.where(col("ham") <= 6 && col("nchunks") === 0).agg(count(lit(1))).show()
    println("=== MARKER ham>6 ===")
    chunkMatch.where(col("ham") > 6).agg(count(lit(1))).show()
  }
}
