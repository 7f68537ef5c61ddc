package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** recall@k / MRR metrics over hand-computable rankings. */
class RetrievalMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("perQuery: recall, first-hit MRR, and zero-metric queries by hand") {
    // q1: gold {a,b,c}; predictions hit a@2, c@5          -> recall 2/3, rr 1/2
    // q2: gold {x};     predictions hit x@1               -> recall 1,   rr 1
    // q3: gold {y,z};   predictions hit nothing           -> recall 0,   rr 0
    // q4: gold {w};     query absent from predictions     -> recall 0,   rr 0
    val pred = Seq(
      ("q1", "m", 1L), ("q1", "a", 2L), ("q1", "n", 3L), ("q1", "o", 4L), ("q1", "c", 5L),
      ("q2", "x", 1L), ("q2", "p", 2L),
      ("q3", "u", 1L), ("q3", "v", 2L)).toDF("query_id", "id", "rank")
    val gold = Seq(
      ("q1", "a"), ("q1", "b"), ("q1", "c"),
      ("q2", "x"), ("q3", "y"), ("q3", "z"), ("q4", "w")).toDF("query_id", "id")
    val r = RetrievalMetrics.perQuery(pred, "query_id", "id", "rank",
        gold, "query_id", "id", k = 10)
      .orderBy("query_id").collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4))).toMap
    assert(r("q1") == ((3L, 2L, 0.666667, 0.5)))
    assert(r("q2") == ((1L, 1L, 1.0, 1.0)))
    assert(r("q3") == ((2L, 0L, 0.0, 0.0)))
    assert(r("q4") == ((1L, 0L, 0.0, 0.0)))
  }

  test("perQuery honors the k cutoff: hits past k do not count") {
    val pred = Seq(("q", "a", 3L), ("q", "b", 7L)).toDF("query_id", "id", "rank")
    val gold = Seq(("q", "a"), ("q", "b")).toDF("query_id", "id")
    val r5 = RetrievalMetrics.perQuery(pred, "query_id", "id", "rank",
      gold, "query_id", "id", k = 5).collect()(0)
    assert(r5.getLong(2) == 1L && r5.getDouble(3) == 0.5)
    val r10 = RetrievalMetrics.perQuery(pred, "query_id", "id", "rank",
      gold, "query_id", "id", k = 10).collect()(0)
    assert(r10.getLong(2) == 2L && r10.getDouble(3) == 1.0)
    // MRR uses the first relevant rank regardless of later hits
    assert(r10.getDouble(4) == math.floor(1.0 / 3 * 1e6) / 1e6 ||
      r10.getDouble(4) == 0.333333)
  }

  test("summary: unweighted macro averages") {
    val pq = Seq(
      ("q1", 2L, 1L, 0.5, 1.0),
      ("q2", 1L, 0L, 0.0, 0.0),
      ("q3", 1L, 1L, 1.0, 0.25))
      .toDF("query_id", "n_gold", "n_hit", "recall", "rr")
    val s = RetrievalMetrics.summary(pq).collect()(0)
    assert(s.getLong(0) == 3L)
    assert(s.getDouble(1) == 0.5)
    assert(math.abs(s.getDouble(2) - 0.416667) < 1e-6)
  }
}
