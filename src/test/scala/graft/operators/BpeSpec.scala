package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training: pair statistics, the iterative
  * merge loop, and segmentation under a vocabulary — all hand-computed
  * on tiny fixtures so every count is checkable by eye. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("pairCounts: char bigrams within words, every occurrence counted") {
    val docs = Seq((1L, "aba ab"), (2L, "ba")).toDF("doc_id", "text")
    val m = Bpe.pairCounts(docs, "text").collect()
      .map(r => (r.getString(0) + r.getString(1), r.getLong(2))).toMap
    // "aba" → ab, ba; "ab" → ab; "ba" → ba
    assert(m == Map("ab" -> 2L, "ba" -> 2L))
  }

  test("pairCounts under merges: pairs reflect the merged symbolization") {
    val docs = Seq((1L, "abab")).toDF("doc_id", "text")
    // merge (a,b) → symbols [ab, ab]; the only adjacent pair is (ab, ab)
    val m = Bpe.pairCounts(docs, "text", Seq(("a", "b"))).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(m == Map(("ab", "ab") -> 1L))
  }

  test("trainMerges: most frequent pair first, deterministic ties, minCount stops") {
    val docs = Seq(
      (1L, "the the the then"),
      (2L, "ten ten")).toDF("doc_id", "text")
    // char pairs: th ×4, he ×3, en ×3 (then, ten, ten), te ×2, hen... count:
    //  the×3: th,he ×3 ; then: th,he,en ; ten×2: te,en ×2
    //  → th=4, he=4, en=3, te=2
    val merges = Bpe.trainMerges(docs, "text", k = 2)
    // tie th/he at 4 breaks by (pair_a, pair_b) ascending → (h,e) first
    assert(merges.head == ("h", "e"))
    assert(merges == Seq(("h", "e"), ("t", "he")))
    // high minCount stops before k merges
    assert(Bpe.trainMerges(docs, "text", k = 5, minCount = 100L).isEmpty)
  }

  test("encode: leftmost non-overlapping fuse, rank priority, word boundaries") {
    val docs = Seq((1L, "aaa banana")).toDF("doc_id", "text")
    val toks = docs.select(Bpe.encode(col("text"), Seq(("a", "a"), ("a", "n"))).as("t"))
      .as[Seq[String]].head()
    // "aaa" with merge (a,a): leftmost pair fuses first → [aa, a]
    // "banana": (a,n)×2 → b,an,an,a ; no (a,a) adjacency remains
    assert(toks == Seq("aa", "a", "b", "an", "an", "a"))
  }

  test("encode round-trip: concatenated symbols rebuild each word; empty merges = chars") {
    val docs = Seq((1L, "Hello  World"), (2L, "")).toDF("doc_id", "text")
    val chars = docs.select(col("doc_id"), Bpe.encode(col("text"), Nil).as("t"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect()
    assert(chars(0)._2.mkString == "helloworld") // lowercased, whitespace dropped
    assert(chars(1)._2.isEmpty)
  }

  test("trained merges reduce the corpus symbol count monotonically") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
    val none = Bpe.vocabStats(docs, "doc_id", "text", Nil).head()
    val merges = Bpe.trainMerges(docs, "text", k = 4)
    assert(merges.size == 4)
    val after = Bpe.vocabStats(docs, "doc_id", "text", merges).head()
    assert(after.getAs[Long]("total_symbols") < none.getAs[Long]("total_symbols"))
    assert(after.getAs[Long]("n_docs") == none.getAs[Long]("n_docs"))
  }
}
