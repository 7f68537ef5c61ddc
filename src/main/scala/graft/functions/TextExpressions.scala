package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Text hashing expressions for large-scale dedup (north-star extension;
 * see BASELINE.json `north_star`). All hashes are deterministic (seeded
 * splitmix64 parameter generation) so signatures are reproducible across
 * runs and executors — a hard requirement for dedup joins at 100 TB.
 *
 * Codegen: each expression participates in whole-stage codegen via
 * `UnarySelfRefCodegen` — the generated pipeline calls the expression's
 * primitive-typed eval loop directly instead of breaking the codegen
 * span the way CodegenFallback does.
 */
object HashUtil {
  /** splitmix64 — public-domain mixing function (Steele et al.). */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit string hash (FNV-1a over UTF-8 bytes, then mixed). */
  def hashString(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }
}

/**
 * MinHash signature over a string array (shingles/tokens): for each of
 * (Broder, "On the resemblance and containment of documents", 1997.)
 * `numHashes` seeded hash functions, the minimum hash over the set.
 * Returns `array<bigint>` of length `numHashes`. One pass over the
 * tokens (O(tokens · k)); signatures are then banded for LSH bucketing
 * in `graft.operators.Dedup`.
 */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long = 42L)
    extends UnaryExpression with UnarySelfRefCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  // Per-hash-function mixing constants derived from the seed.
  private lazy val seeds: Array[Long] = {
    val out = new Array[Long](numHashes)
    var s = seed
    var i = 0
    while (i < numHashes) { s = HashUtil.mix64(s); out(i) = s; i += 1 }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill[Long](numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = HashUtil.hashString(arr.getUTF8String(i), 0L)
        var k = 0
        while (k < numHashes) {
          val h = HashUtil.mix64(base ^ seeds(k))
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    if (n == 0) null else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Word n-gram shingles in one pass: lowercase, whitespace-split, emit
 * "w1 w2 … wn" strings. Returns `array<string>`; texts with fewer than
 * `n` words yield a single shingle of all words; blank text yields null.
 *
 * A built-in composition (split + transform(sequence, slice, concat_ws))
 * computes the same thing but pays ~20µs per element in interpreted
 * higher-order-function machinery — this expression measured ~50× faster
 * on the documents fixture.
 */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with UnarySelfRefCodegen {
  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString
      .toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (words.length == 0) return null
    if (words.length <= n) {
      return new GenericArrayData(Array[Any](UTF8String.fromString(words.mkString(" "))))
    }
    val out = new Array[Any](words.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Banded MinHash LSH buckets in one pass: computes the `numHashes` MinHash
 * signature AND collapses it into `bands` bucket hashes (mixing the band
 * index with the band's minima). Returns `array<bigint>` of length `bands`
 * — element i is the LSH bucket key for band i.
 *
 * One expression instead of signature + per-band slice/hash projections:
 * Catalyst's projection collapse would otherwise substitute the signature
 * expression into every band expression and recompute the full signature
 * `bands` times per row.
 */
case class MinHashBuckets(child: Expression, numHashes: Int, bands: Int, seed: Long = 42L)
    extends UnaryExpression with UnarySelfRefCodegen {
  require(numHashes % bands == 0, "numHashes must be divisible by bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private val rowsPerBand = numHashes / bands

  private lazy val seeds: Array[Long] = {
    val out = new Array[Long](numHashes)
    var s = seed
    var i = 0
    while (i < numHashes) { s = HashUtil.mix64(s); out(i) = s; i += 1 }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill[Long](numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = HashUtil.hashString(arr.getUTF8String(i), 0L)
        var k = 0
        while (k < numHashes) {
          val h = HashUtil.mix64(base ^ seeds(k))
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    val buckets = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = HashUtil.mix64(seed ^ b)
      var r = 0
      while (r < rowsPerBand) {
        h = HashUtil.mix64(h ^ mins(b * rowsPerBand + r))
        r += 1
      }
      buckets(b) = h
      b += 1
    }
    new GenericArrayData(buckets)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * 64-bit SimHash over a string array: weighted bit-vote of per-token
 * 64-bit hashes; near-duplicate texts land within small Hamming distance.
 * (Charikar, "Similarity estimation techniques from rounding algorithms",
 * STOC 2002; used for web-scale dedup in Manku et al., WWW 2007.)
 */
case class SimHash64(child: Expression, seed: Long = 42L)
    extends UnaryExpression with UnarySelfRefCodegen {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashUtil.hashString(arr.getUTF8String(i), seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Single-pass character/token counts over a text column:
 * `struct<len, n_tokens, n_nonspace, n_punct, n_digit>`. One scan of the
 * string replaces four separate regex passes (two `regexp_replace` + a
 * `split` + a `trim`) whose trees Catalyst additionally re-evaluates per
 * consumer in filter context (no subexpression elimination inside filter
 * conditions) — measured ~6× on the qualityFilter predicate at sf0.1.
 *
 * Semantics replicate the built-in compositions EXACTLY (spec-enforced,
 * TextFunctionsSpec):
 *  - `len` = `length(text)` (code-point count);
 *  - `n_tokens` = `size(split(trim(text), "\\s+", -1))` with the
 *    `length(trim(text)) == 0 → 0` guard: Spark `trim` strips SPACES
 *    only, and Java split keeps a leading/trailing empty piece when the
 *    trimmed text starts/ends with non-space whitespace;
 *  - `n_nonspace` = `length(regexp_replace(trim(text), "\\s+", ""))`
 *    (count of non-`\s` characters);
 *  - `n_punct` / `n_digit` = characters matching Java regex
 *    `[\p{Punct}]` (the 32 ASCII punctuation chars) / `[0-9]`.
 */
case class TextCounts(child: Expression)
    extends UnaryExpression with UnarySelfRefCodegen {

  override def dataType: DataType = StructType(Seq(
    StructField("len", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_nonspace", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable

  @inline private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def isAsciiPunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') || (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val len = u.numChars()
    val s = u.toString
    var punct = 0; var digit = 0; var nonspace = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!isJavaWs(c)) nonspace += 1
      if (isAsciiPunct(c)) punct += 1
      if (c >= '0' && c <= '9') digit += 1
      i += 1
    }
    // space-trim bounds (Spark trim strips ' ' only)
    var from = 0
    var until = s.length
    while (from < until && s.charAt(from) == ' ') from += 1
    while (until > from && s.charAt(until - 1) == ' ') until -= 1
    val nTokens =
      if (from == until) 0
      else {
        // pieces of split("\s+", -1): non-ws runs, plus an empty piece on
        // each side whose boundary char is (non-space) whitespace
        var runs = 0
        var inRun = false
        var j = from
        while (j < until) {
          val ws = isJavaWs(s.charAt(j))
          if (!ws && !inRun) { runs += 1; inRun = true }
          else if (ws) inRun = false
          j += 1
        }
        runs + (if (isJavaWs(s.charAt(from))) 1 else 0) +
          (if (isJavaWs(s.charAt(until - 1))) 1 else 0)
      }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](len, nTokens, nonspace, punct, digit))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Single-pass heuristic language ID: lowercase + whitespace-tokenize
 * once, mark distinct stopword hits per language in a bitmask (word
 * lists are ≤ 32 entries), popcount, argmax with ties to the first
 * alphabetical language; zero hits → "und". Replaces a 6-way
 * `array_intersect` + struct `array_max` composition whose interpreted
 * set-building dominated the text-pipeline profile (~0.2 ms/row).
 * Languages and word lists arrive via the constructor so
 * `graft.operators.TextAnalysis.stopwords` stays the single source of
 * truth shared with the DuckDB oracle generator.
 */
case class LangIdHeuristic(child: Expression, langStopwords: Seq[(String, Seq[String])])
    extends UnaryExpression with UnarySelfRefCodegen {
  require(langStopwords.nonEmpty && langStopwords.forall(_._2.size <= 32))

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  // sorted language order = tie-break order
  @transient private lazy val langs: Array[String] =
    langStopwords.map(_._1).sorted.toArray
  @transient private lazy val und: UTF8String = UTF8String.fromString("und")
  @transient private lazy val langUtf8: Array[UTF8String] =
    langs.map(UTF8String.fromString)
  /** token → packed (langIdx << 5 | wordIdx) hits */
  @transient private lazy val lookup: java.util.HashMap[String, Array[Int]] = {
    val byLang = langStopwords.toMap
    val m = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
    for (li <- langs.indices; (w, wi) <- byLang(langs(li)).zipWithIndex) {
      val k = w.toLowerCase(java.util.Locale.ROOT)
      val b = m.computeIfAbsent(k, _ => scala.collection.mutable.ArrayBuffer.empty[Int])
      b += ((li << 5) | wi)
    }
    val out = new java.util.HashMap[String, Array[Int]](m.size * 2)
    m.forEach((k, v) => out.put(k, v.toArray))
    out
  }

  @inline private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    // matches split(lower(trim(text)), "\s+") + per-lang distinct
    // intersect counts: empty/ws-only pieces never hit a stopword, so
    // only non-ws runs need lookups
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val masks = new Array[Int](langs.length)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isJavaWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isJavaWs(s.charAt(i))) i += 1
      if (i > start) {
        val hit = lookup.get(s.substring(start, i))
        if (hit != null) {
          var k = 0
          while (k < hit.length) {
            masks(hit(k) >>> 5) |= 1 << (hit(k) & 31)
            k += 1
          }
        }
      }
    }
    var best = -1
    var bestHits = 0
    var li = 0
    while (li < masks.length) {
      val h = java.lang.Integer.bitCount(masks(li))
      if (h > bestHits) { bestHits = h; best = li }
      li += 1
    }
    if (best < 0) und else langUtf8(best)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Maximum multiplicity of any element in a string array (the "top
 * n-gram count" of the Gopher repetition rules). One hash-map pass per
 * row — the groupBy-per-document alternative shuffles every n-gram of
 * the corpus, and a higher-order-function formulation pays interpreted
 * per-element cost. Null/empty arrays → 0.
 */
case class ArrayTopCount(child: Expression)
    extends UnaryExpression with UnarySelfRefCodegen {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val k = arr.getUTF8String(i)
        val c = counts.merge(k, 1, (a, b) => a + b)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hamming distance between two 64-bit hashes (for SimHash near-dup). */
case class HammingDistance64(left: Expression, right: Expression)
    extends BinaryExpression with BinarySelfRefCodegen {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Long.bitCount(l.asInstanceOf[Long] ^ r.asInstanceOf[Long])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * Rolling-hash document fingerprint (winnowing-lite; Schleimer, Wilkerson
 * & Aiken, "Winnowing: local algorithms for document fingerprinting",
 * SIGMOD 2003): hashes every
 * character k-gram with a Rabin-Karp rolling hash and returns the
 * minimum — a content-defined 64-bit fingerprint stable under
 * formatting-preserving edits elsewhere in the document.
 */
case class RollingHashFingerprint(child: Expression, k: Int = 16)
    extends UnaryExpression with UnarySelfRefCodegen {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private val Base = 1000003L

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.length == 0) return null
    if (bytes.length <= k) return HashUtil.mix64(simpleHash(bytes, 0, bytes.length))
    // precompute Base^(k-1)
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    var minMixed = HashUtil.mix64(h)
    i = k
    while (i < bytes.length) {
      h = (h - (bytes(i - k) & 0xffL) * pow) * Base + (bytes(i) & 0xffL)
      val m = HashUtil.mix64(h)
      if (m < minMixed) minMixed = m
      i += 1
    }
    minMixed
  }

  private def simpleHash(b: Array[Byte], from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) { h = h * Base + (b(i) & 0xffL); i += 1 }
    h
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
