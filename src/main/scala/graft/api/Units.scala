package graft.api

/** Config-string helpers (reference capability: dataframe/utils.py:246-316
  * `parse_bytes`). Spark's own conf layer has an equivalent
  * (`JavaUtils.byteStringAsBytes`) but with DIFFERENT semantics — Spark
  * treats "1m" as binary 2²⁰ where this table is decimal SI with
  * explicit `KiB`-style binary units — so the reference's table is
  * mirrored exactly rather than delegated. */
object Units {

  private val byteSizes: Map[String, Double] = {
    val base = Map(
      "kb" -> 1e3, "mb" -> 1e6, "gb" -> 1e9, "tb" -> 1e12, "pb" -> 1e15,
      "kib" -> math.pow(2, 10), "mib" -> math.pow(2, 20),
      "gib" -> math.pow(2, 30), "tib" -> math.pow(2, 40),
      "pib" -> math.pow(2, 50),
      "b" -> 1.0, "" -> 1.0)
    // single-letter decimal aliases (k, m, g, t, p) and binary aliases
    // without the trailing b (ki, mi, gi, ti, pi) — same derivation the
    // reference applies to its table
    base ++
      base.collect { case (k, v) if k.nonEmpty && !k.contains("i") => k.take(1) -> v } ++
      base.collect { case (k, v) if k.contains("i") => k.dropRight(1) -> v }
  }

  /** "128MB" → 128000000, "1KiB" → 1024, "5.4 kB" → 5400, "1e6" →
    * 1000000, "MB" → 1000000 (bare unit = 1 of it), "100" → 100.
    * Unknown units throw. */
  def parseBytes(s: String): Long = {
    val compact0 = s.replace(" ", "")
    val compact = if (compact0.exists(_.isDigit)) compact0 else "1" + compact0
    // split at the last non-letter character: numeric prefix + unit
    val idx = compact.lastIndexWhere(!_.isLetter) + 1
    val (prefix, suffix) = compact.splitAt(idx)
    val n =
      try prefix.toDouble
      catch {
        case e: NumberFormatException =>
          throw new IllegalArgumentException(
            s"Could not interpret '$prefix' as a number", e)
      }
    val mult = byteSizes.getOrElse(suffix.toLowerCase,
      throw new IllegalArgumentException(
        s"Could not interpret '$suffix' as a byte unit"))
    (n * mult).toLong
  }
}
