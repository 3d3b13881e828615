package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharEntropy, CosineSimilarity, MinHashBands, MinHashSignature,
  NfcNormalize, SimHash64, TextMinHashBands, WordNGrams, ProductAgg}

/** Registers graft's native expressions in the SQL function registry so
  * `spark.sql("SELECT cosine_similarity(a, b) ...")` works — installed
  * via `spark.sql.extensions=graft.GraftExtensions`
  * ([[GraftSession.builder]] sets it). The Column-API entry points in
  * `graft.functions.*` remain the typed route; this is the SQL surface.
  *
  * Integer literal arguments (numHashes, n, seed) are required to be
  * foldable — they parameterize the expression instance itself.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case lit if lit.foldable =>
      lit.eval(null) match {
        case i: Int => i
        case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
        case l: Long =>
          // silent l.toInt truncation would accept e.g. seed 5000000000
          // as 705032704 — wrong results instead of an error
          throw new IllegalArgumentException(s"$name out of Int range: $l")
        case other =>
          throw new IllegalArgumentException(s"$name must be an integer literal, got $other")
      }
    case _ =>
      throw new IllegalArgumentException(s"$name must be a literal")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity(a, b) takes 2 arguments")
        CosineSimilarity(args(0), args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => args.length match {
        case 1 => MinHashSignature(args(0), 128, 42L)
        case 2 => MinHashSignature(args(0), intArg(args(1), "numHashes"), 42L)
        case 3 => MinHashSignature(args(0), intArg(args(1), "numHashes"),
          intArg(args(2), "seed").toLong)
        case _ => throw new IllegalArgumentException(
          "minhash_signature(shingles[, numHashes[, seed]])")
      }))

    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 2, "simhash64(tokens[, seed])")
        SimHash64(args(0), if (args.length == 2) intArg(args(1), "seed").toLong else 42L)
      }))

    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 2, "word_ngrams(text[, n])")
        WordNGrams(args(0), if (args.length == 2) intArg(args(1), "n") else 3)
      }))

    ext.injectFunction((
      FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "minhash_bands(shingles, numHashes, bands)")
        MinHashBands(args(0), intArg(args(1), "numHashes"), intArg(args(2), "bands"), 42L)
      }))

    ext.injectFunction((
      FunctionIdentifier("text_minhash_bands"),
      new ExpressionInfo(classOf[TextMinHashBands].getName, "text_minhash_bands"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "text_minhash_bands(text, n, numHashes, bands)")
        TextMinHashBands(args(0), intArg(args(1), "n"),
          intArg(args(2), "numHashes"), intArg(args(3), "bands"), 42L)
      }))

    ext.injectFunction((
      FunctionIdentifier("product_agg"),
      new ExpressionInfo(classOf[ProductAgg].getName, "product_agg"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "product_agg(col) takes 1 argument")
        ProductAgg(args(0)).toAggregateExpression()
      }))

    ext.injectFunction((
      FunctionIdentifier("char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "char_entropy"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "char_entropy(text) takes 1 argument")
        CharEntropy(args(0))
      }))

    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize(text) takes 1 argument")
        NfcNormalize(args(0))
      }))
  }
}
