package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Encoding repair for crawl text: detect and undo mojibake — UTF-8
  * bytes that were mis-decoded as Latin-1/Windows-1252 somewhere in a
  * pipeline ("café" arriving as "cafÃ©") — the ftfy-class cleanup
  * step every large text-curation stack runs before anything else
  * (wrong-encoding docs poison dedup keys, language ID and tokenizer
  * training alike).
  *
  * Deterministic spec:
  *  1. map every char of the candidate back to a byte: code points
  *     ≤ 0xFF map to themselves (the Latin-1 view); the 27 printable
  *     Windows-1252 specials in U+2013…U+2122 map to 0x80–0x9F (the
  *     CP1252 view — both wrong decodings occur in the wild); any
  *     other char means the string was NOT mojibake → return as-is;
  *  2. if the byte string is VALID UTF-8 (hand-rolled RFC 3629
  *     validator: overlongs, surrogates, > U+10FFFF all rejected) AND
  *     contains at least one multibyte sequence, decode it and
  *     recurse — double-encoded text repairs in two rounds (bounded
  *     at [[MaxRounds]]);
  *  3. otherwise return unchanged. Plain ASCII never changes; correct
  *     non-ASCII text never changes (its Latin-1 byte view is not
  *     valid UTF-8 in practice — e.g. `é` followed by a space fails
  *     the continuation check).
  *
  * Row-local, no state, no shuffle.
  */
object Mojibake {

  /** Repair-round bound: real double-encoding exists, triple is
    * vanishingly rare; the bound also guarantees termination on
    * adversarial fixpoint-free inputs (each round strictly shrinks
    * the string, so this is belt-and-braces). */
  val MaxRounds = 3

  /** Windows-1252 0x80–0x9F printable specials (public code page
    * layout); 0x81, 0x8D, 0x8F, 0x90, 0x9D are undefined in CP1252
    * and stay unmapped. */
  private val Cp1252Reverse: Map[Char, Byte] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8a, '‹' -> 0x8b, 'Œ' -> 0x8c,
    'Ž' -> 0x8e, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9a, '›' -> 0x9b,
    'œ' -> 0x9c, 'ž' -> 0x9e, 'Ÿ' -> 0x9f
  ).map { case (c, b) => c -> b.toByte }

  /** RFC 3629 UTF-8 validation + multibyte detection in one pass:
    * returns 1 if valid with ≥1 multibyte sequence, 0 if valid pure
    * ASCII, -1 if invalid. Overlong forms, surrogates (U+D800–DFFF)
    * and code points above U+10FFFF are invalid. */
  private[graft] def utf8Class(b: Array[Byte]): Int = {
    var i = 0
    var multi = false
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return -1 // continuation byte or overlong lead
      else if (c < 0xe0) { // 2-byte: U+0080..U+07FF
        if (i + 1 >= b.length || (b(i + 1) & 0xc0) != 0x80) return -1
        multi = true; i += 2
      } else if (c < 0xf0) { // 3-byte: U+0800..U+FFFF minus surrogates
        if (i + 2 >= b.length || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80) return -1
        val cp = ((c & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f)
        if (cp < 0x800 || (cp >= 0xd800 && cp <= 0xdfff)) return -1
        multi = true; i += 3
      } else if (c < 0xf5) { // 4-byte: U+10000..U+10FFFF
        if (i + 3 >= b.length || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80 || (b(i + 3) & 0xc0) != 0x80) return -1
        val cp = ((c & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
          ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f)
        if (cp < 0x10000 || cp > 0x10ffff) return -1
        multi = true; i += 4
      } else return -1 // 0xf5..0xff never appear in UTF-8
    }
    if (multi) 1 else 0
  }

  /** The byte string whose wrong decoding `s` would be — or null if
    * `s` contains chars neither Latin-1 nor CP1252-special (then it
    * cannot be mojibake). */
  private def reverseDecode(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c <= 0xff) out(i) = c.toByte
      else Cp1252Reverse.get(c) match {
        case Some(b) => out(i) = b
        case None => return null
      }
      i += 1
    }
    out
  }

  /** (repaired string, rounds applied). */
  def fixWithRounds(s: String): (String, Int) = {
    var cur = s
    var rounds = 0
    var go = true
    while (go && rounds < MaxRounds) {
      val bytes = reverseDecode(cur)
      if (bytes == null || utf8Class(bytes) != 1) go = false
      else {
        cur = new String(bytes, UTF_8)
        rounds += 1
      }
    }
    (cur, rounds)
  }

  /** Repair a string (identity when it is not mojibake). */
  def fix(s: String): String = fixWithRounds(s)._1

  /** docs(idCol, textCol) → (idCol, rounds, fixed): repair every doc,
    * reporting how many decode rounds applied (0 = already clean).
    * Row-local mapPartitions. */
  def repair(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val (fixed, rounds) = fixWithRounds(Option(text).getOrElse(""))
        (id, rounds, fixed)
      })
      .toDF(idCol, "rounds", "fixed")
  }
}
