package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Shared low-level hashing/tokenization helpers for the native text
  * expressions. ONE definition of each so the cross-expression
  * consistency contracts (same hash family, same tokenization) cannot
  * silently desynchronize.
  */
private[functions] object Hashing {

  /** FNV-1a 64-bit offset basis / prime (public-domain hash). */
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** k affine-coefficient pairs from SplitMix64 (Steele et al.,
    * "Fast Splittable Pseudorandom Number Generators", OOPSLA'14);
    * `a` forced odd => bijective mod 2^64. */
  def splitMixCoefs(seed: Long, k: Int): (Array[Long], Array[Long]) = {
    var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (Array.fill(k)(next() | 1L), Array.fill(k)(next()))
  }

  /** Fold a minhash signature into `bands` 64-bit band hashes (FNV-1a
    * over each band's row bytes, seeded per band). */
  def bandFold(mins: Array[Long], numHashes: Int, bands: Int): Array[Long] = {
    val r = numHashes / bands
    val out = new Array[Long](bands)
    var bnd = 0
    while (bnd < bands) {
      var h = FnvOffset ^ (bnd * 0x9e3779b97f4a7c15L)
      var idx = bnd * r
      val end = idx + r
      while (idx < end) {
        val v = mins(idx)
        var byte = 0
        while (byte < 8) {
          h ^= (v >>> (byte * 8)) & 0xffL
          h *= FnvPrime
          byte += 1
        }
        idx += 1
      }
      out(bnd) = h
      bnd += 1
    }
    out
  }

  /** `Character.isWhitespace` restricted to ASCII — the byte fast path
    * must agree with the canonical Unicode tokenization
    * ([[WordNGrams]]) on every ASCII input: space, \t \n \x0B \f \r,
    * and the FS/GS/RS/US separators 0x1C-0x1F. */
  def isAsciiSpace(b: Byte): Boolean =
    b == ' ' || (b >= '\t' && b <= '\r') || (b >= 28 && b <= 31)

  /** True iff every byte is ASCII (no UTF-8 multi-byte sequences), in
    * which case the byte fast path is semantically exact. */
  def isAscii(bytes: Array[Byte]): Boolean = {
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) return false
      i += 1
    }
    true
  }

  /** FNV-1a over a token's bytes with on-the-fly ASCII lowercase. */
  def fnv1aAsciiLower(bytes: Array[Byte], from: Int, until: Int, seed: Long): Long = {
    var h = FnvOffset ^ seed
    var i = from
    while (i < until) {
      var b = bytes(i) & 0xff
      if (b >= 'A' && b <= 'Z') b += 32
      h ^= b
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Canonical (Unicode) tokenization matching [[WordNGrams]]: full
    * lowercase then `Character.isWhitespace` splits; each token hashed
    * FNV-1a over its UTF-8 bytes. Used as the non-ASCII fallback of the
    * byte fast paths — for ASCII input both produce identical hashes. */
  def tokenHashesUnicode(text: UTF8String, seed: Long): Array[Long] = {
    val s = text.toLowerCase.toString
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) {
        val bytes = s.substring(start, i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var h = FnvOffset ^ seed
        var j = 0
        while (j < bytes.length) {
          h ^= (bytes(j) & 0xffL)
          h *= FnvPrime
          j += 1
        }
        out += h
      }
    }
    out.toArray
  }
}
