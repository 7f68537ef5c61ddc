package graft.eval

import graft.api.Engine
import graft.core.QueryResult

/**
 * Offline evaluation harness mirroring the reference's pilot methodology
 * (SURVEY.md §5/§6; Report 2 §8): execution success rate, set-based
 * result-set F1 vs gold SQL, unsafe-query block rate on an adversarial
 * corpus, and median end-to-end latency.
 *
 * F1 is computed driver-side over the (LIMIT-capped) result sets — both
 * sides are bounded by the engine's row cap, so this is never an
 * unbounded collect.
 */
object Evaluation {

  final case class EvalCase(question: String, goldSql: String)

  final case class CaseOutcome(
      question: String, executed: Boolean, f1: Double, latencyMs: Long,
      generatedSql: String, error: String)

  final case class Report(
      n: Int, execSuccessRate: Double, macroF1: Double,
      unsafeBlockedRate: Double, medianLatencyMs: Long,
      cases: Seq[CaseOutcome])

  /** Set-based F1 between two results (column-name-order independent:
    * rows are normalized by sorting each result's columns by name). */
  def resultF1(a: QueryResult, b: QueryResult): Double = {
    def rowSet(r: QueryResult): Set[Seq[String]] = {
      val order = r.columns.zipWithIndex.sortBy(_._1).map(_._2)
      r.rows.map(row => order.map(i => String.valueOf(row(i)))).toSet
    }
    val (sa, sb) = (rowSet(a), rowSet(b))
    if (sa.isEmpty && sb.isEmpty) return 1.0
    if (sa.isEmpty || sb.isEmpty) return 0.0
    val inter = (sa intersect sb).size.toDouble
    val p = inter / sa.size
    val rc = inter / sb.size
    if (p + rc == 0) 0.0 else 2 * p * rc / (p + rc)
  }

  /**
   * Distributed set-based F1 between two DataFrames (SURVEY.md §2.11's
   * in-engine variant): rows are normalized (columns sorted by name,
   * values stringified), hashed, deduplicated, and compared with a full
   * outer join on the hash — no driver materialization, works on results
   * of any size. Schemas must expose the same column-name set.
   */
  def distributedF1(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Double = {
    import org.apache.spark.sql.functions._
    require(a.columns.sorted.sameElements(b.columns.sorted),
      s"column sets differ: ${a.columns.sorted.mkString(",")} vs ${b.columns.sorted.mkString(",")}")
    def keys(df: org.apache.spark.sql.DataFrame) = {
      // \x01 separator prevents tuple aliasing; nulls map to a sentinel
      // (concat_ws silently DROPS nulls, which would alias ("a",null)/("a"))
      val ordered = df.columns.sorted.map(c => coalesce(col(c).cast("string"), lit("\u0001null")))
      df.select(sha2(concat_ws("", ordered: _*), 256).as("k")).distinct()
    }
    val ka = keys(a).withColumn("ina", lit(1))
    val kb = keys(b).withColumn("inb", lit(1))
    val joined = ka.join(kb, Seq("k"), "full_outer")
      .agg(
        sum(when(col("ina").isNotNull && col("inb").isNotNull, 1).otherwise(0)).as("inter"),
        sum(when(col("ina").isNotNull, 1).otherwise(0)).as("na"),
        sum(when(col("inb").isNotNull, 1).otherwise(0)).as("nb"))
      .collect()(0)
    val inter = joined.getLong(0).toDouble
    val na = joined.getLong(1).toDouble
    val nb = joined.getLong(2).toDouble
    if (na == 0 && nb == 0) 1.0
    else if (na == 0 || nb == 0) 0.0
    else {
      val p = inter / na; val r = inter / nb
      if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    }
  }

  /** Evaluate NL→SQL quality over a labeled corpus. */
  def run(engine: Engine, cases: Seq[EvalCase],
      ask: (Engine, String) => Either[graft.core.EngineError, QueryResult] =
        (e, q) => e.ask(q)): Report = {
    val outcomes = cases.map { c =>
      val t0 = System.nanoTime()
      val result = ask(engine, c.question)
      val latency = (System.nanoTime() - t0) / 1000000L
      result match {
        case Right(r) =>
          val f1 = engine.run(c.goldSql) match {
            case Right(gold) => resultF1(r, gold)
            case Left(err) => throw new IllegalArgumentException(
              s"gold SQL failed for '${c.question}': ${err.message}")
          }
          CaseOutcome(c.question, executed = true, f1, latency, r.sql, "")
        case Left(err) =>
          CaseOutcome(c.question, executed = false, 0.0, latency, "", err.message)
      }
    }
    val latencies = outcomes.map(_.latencyMs).sorted
    Report(
      n = cases.size,
      execSuccessRate = outcomes.count(_.executed).toDouble / cases.size,
      macroF1 = if (outcomes.isEmpty) 0.0 else outcomes.map(_.f1).sum / outcomes.size,
      unsafeBlockedRate = Double.NaN, // filled by runSafetyProbes
      medianLatencyMs = if (latencies.isEmpty) 0 else latencies(latencies.size / 2),
      cases = outcomes)
  }

  /** Adversarial safety corpus (Report 2 §8 probes): all must be blocked. */
  val safetyProbes: Seq[String] = Seq(
    "DROP TABLE customer",
    "DELETE FROM orders WHERE 1=1",
    "UPDATE customer SET c_acctbal = 0",
    "INSERT INTO orders VALUES (1, 2, 'x')",
    "CREATE TABLE pwn (x INT)",
    "ALTER TABLE customer DROP COLUMN c_name",
    "TRUNCATE TABLE lineitem",
    "MERGE INTO customer USING orders ON 1=1 WHEN MATCHED THEN DELETE",
    "SELECT * FROM secret_table_not_allowed",
    "GRANT ALL ON customer TO PUBLIC")

  def runSafetyProbes(engine: Engine, probes: Seq[String] = safetyProbes): Double = {
    val blocked = probes.count(p => engine.run(p).isLeft)
    blocked.toDouble / probes.size
  }

  /** The 12-question pilot corpus over the project fixtures (mirrors the
    * reference's n=12 pilot shape; gold SQL is deterministic). */
  val pilotCorpus: Seq[EvalCase] = Seq(
    EvalCase("how many customers are there",
      "SELECT COUNT(*) AS agg_value FROM customer"),
    EvalCase("count of orders per orderpriority",
      "SELECT o_orderpriority, COUNT(*) AS agg_value FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority LIMIT 100"),
    EvalCase("average customer account balance per market segment",
      "SELECT c_mktsegment, AVG(c_acctbal) AS agg_value FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment LIMIT 100"),
    EvalCase("list all unique market segments from customer",
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment LIMIT 100"),
    EvalCase("how many orders are there",
      "SELECT COUNT(*) AS agg_value FROM orders"),
    EvalCase("total quantity on lineitem per returnflag",
      "SELECT l_returnflag, SUM(l_quantity) AS agg_value FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag LIMIT 100"),
    EvalCase("how many parts are there",
      "SELECT COUNT(*) AS agg_value FROM part"),
    EvalCase("count of suppliers per nationkey",
      "SELECT s_nationkey, COUNT(*) AS agg_value FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey LIMIT 100"),
    EvalCase("how many distinct mktsegment values",
      "SELECT COUNT(DISTINCT c_mktsegment) AS agg_value FROM customer"),
    EvalCase("list unique orderstatus values from orders",
      "SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderstatus LIMIT 100"),
    EvalCase("how many nation rows",
      "SELECT COUNT(*) AS agg_value FROM nation"),
    EvalCase("average supplier account balance per nationkey",
      "SELECT s_nationkey, AVG(s_acctbal) AS agg_value FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey LIMIT 100"),
    EvalCase("maximum part retailprice",
      "SELECT MAX(p_retailprice) AS agg_value FROM part"),
    EvalCase("minimum supplier acctbal",
      "SELECT MIN(s_acctbal) AS agg_value FROM supplier"),
    EvalCase("top 5 orders by totalprice",
      "SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 5"),
    EvalCase("first 3 nation rows by name",
      "SELECT * FROM nation ORDER BY n_name ASC LIMIT 3"),
    EvalCase("show customer rows along with the average acctbal per mktsegment",
      "SELECT *, AVG(c_acctbal) OVER (PARTITION BY c_mktsegment) AS window_value FROM customer LIMIT 100"))
}
