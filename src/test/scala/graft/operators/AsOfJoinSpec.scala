package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  // trades (left) as-of quotes (right) — the canonical as-of example
  lazy val trades = Seq(
    (1L, "A", ts(1), 100.0),
    (2L, "A", ts(5), 101.0),
    (3L, "B", ts(3), 50.0),
    (4L, "B", ts(10), 51.0),
    (5L, "C", ts(2), 9.0) // no quote for C
  ).toDF("trade_id", "sym", "t_ts", "t_price")

  lazy val quotes = Seq(
    ("A", ts(0), 99.5),
    ("A", ts(4), 100.5),
    ("A", ts(6), 101.5), // after trade 2 - must not attach
    ("B", ts(3), 49.9) // same timestamp as trade 3 - attaches
  ).toDF("sym", "q_ts", "q_price")

  test("attaches the latest quote at or before each trade") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t_ts", "q_ts")
      .orderBy("trade_id").collect()
    val prices = out.map(r => r.getLong(0) -> (if (r.isNullAt(4)) null else r.getDouble(4))).toMap
    assert(prices(1L) == 99.5)  // quote at :00
    assert(prices(2L) == 100.5) // quote at :04, not :06
    assert(prices(3L) == 49.9)  // equal-timestamp quote attaches
    assert(prices(4L) == 49.9)  // stale but unbounded tolerance
    assert(prices(5L) == null)  // no quote for C
  }

  test("tolerance nulls out stale matches") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t_ts", "q_ts",
      toleranceMs = 2 * 60 * 1000)
    val prices = out.orderBy("trade_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) null else r.getDouble(4))).toMap
    assert(prices(2L) == 100.5) // 1 minute old - within tolerance
    assert(prices(4L) == null)  // 7 minutes old - nulled
  }

  test("keeps every left row and only left+attached columns") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t_ts", "q_ts")
    assert(out.count() == 5)
    assert(out.columns.toSeq == Seq("trade_id", "sym", "t_ts", "t_price", "q_price"))
  }

  test("plans one shuffle on the key (window exchange), no nested loop") {
    val plan = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t_ts", "q_ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}

class IvfSpec extends SparkSpec {
  lazy val embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("IVF top-k finds the query itself and ranks by cosine") {
    import org.apache.spark.sql.functions.col
    val q = embeddings.where(col("vec_id") === 3).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val idx = Similarity.ivfIndex(embeddings, "vec_id", "embedding", nlist = 8)
    assert(idx.centroids.length == 8)
    val top = Similarity.ivfTopK(idx, q, k = 5, nprobe = 2).collect()
    assert(top(0).getLong(0) == 3L)
    assert(math.abs(top(0).getDouble(1) - 1.0) < 1e-9)
    val cosines = top.map(_.getDouble(1))
    assert(cosines.sameElements(cosines.sortBy(-_.toDouble)))
  }

  test("ivfIndex survives NULL embedding rows (skipped, not NPE)") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // r11 ADVICE: a single null embedding crashed the training-sample
    // collect and the assignment mapPartitions; both now filter nulls
    val withNulls = embeddings.withColumn("embedding",
      when(col("vec_id") % 7 === 0, lit(null)).otherwise(col("embedding")))
    val q = embeddings.where(col("vec_id") === 11).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val idx = Similarity.ivfIndex(withNulls, "vec_id", "embedding", nlist = 4)
    val ivf = Similarity.ivfTopK(idx, q, k = 5, nprobe = 4).collect().map(_.getLong(0)).toSeq
    val brute = Similarity.topK(withNulls, "vec_id", "embedding", q, 5).collect().map(_.getLong(0)).toSeq
    assert(ivf == brute)
    assert(!ivf.exists(_ % 7 == 0), "nulled ids must not be indexed")
  }

  test("IVF with full probe matches brute force top-k") {
    import org.apache.spark.sql.functions.col
    val q = embeddings.where(col("vec_id") === 11).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val idx = Similarity.ivfIndex(embeddings, "vec_id", "embedding", nlist = 4)
    val ivf = Similarity.ivfTopK(idx, q, k = 5, nprobe = 4).collect().map(_.getLong(0)).toSeq
    val brute = Similarity.topK(embeddings, "vec_id", "embedding", q, 5).collect().map(_.getLong(0)).toSeq
    assert(ivf == brute) // probing all cells == exact
  }

  test("multi-assignment replicates each vector into its nearest cells, results stay deduped") {
    import org.apache.spark.sql.functions.col
    val q = embeddings.where(col("vec_id") === 11).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val idx = Similarity.ivfIndex(embeddings, "vec_id", "embedding", nlist = 4, assignReplicas = 2)
    val n = embeddings.count()
    assert(idx.assigned.count() == 2 * n) // exactly 2 cells per vector
    assert(idx.assigned.select("id").distinct().count() == n)
    // full probe still equals brute force, with no duplicate ids in the top-k
    val ivf = Similarity.ivfTopK(idx, q, k = 5, nprobe = 4).collect().map(_.getLong(0)).toSeq
    val brute = Similarity.topK(embeddings, "vec_id", "embedding", q, 5).collect().map(_.getLong(0)).toSeq
    assert(ivf == brute && ivf.distinct == ivf)
  }
}

class SketchSpec extends SparkSpec {
  import graft.catalog.Profiler

  lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("sketch stats: one-pass HLL distincts + approx quantiles") {
    val stats = Profiler.sketchStats(li, Seq("l_quantity", "l_extendedprice"))
    val (dQty, pQty) = stats("l_quantity")
    assert(dQty >= 45 && dQty <= 55) // ~50 distinct integer quantities
    assert(pQty.length == 3 && pQty(0) <= pQty(1) && pQty(1) <= pQty(2))
  }

  test("heavy hitters surface frequent values") {
    val hh = Profiler.heavyHitters(li, Seq("l_returnflag"), support = 0.2)
    assert(hh("l_returnflag").nonEmpty)
  }
}
