package graft.exec

import java.util.concurrent.{Executors, TimeUnit, TimeoutException => JTimeoutException}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.core._
import graft.safety.Validator
import graft.safety.Validator.Validated

/**
 * Execution layer: cost gate + timed, LIMIT-capped, read-only execution
 * (V9/V10 in SURVEY.md §2.8; ref `app/ai/nl2sql.py:332-374`,
 * `app/routes_ai.py:277-306`).
 *
 * Scale notes: the only distributed step is the Spark action itself; the
 * driver never materializes more than the injected LIMIT (default 100,
 * hard ceiling `maxRows` 500 — ref README.md:113-118). The cost gate reads
 * optimizer statistics off the already-built plan — no extra cluster
 * round-trip (unlike the reference's separate EXPLAIN connection).
 */
object Executor {

  /** Governance defaults (ref: routes_ai.py:134-135, README.md:113-118,
    * routes_ai.py:281-285). */
  val DefaultLimit = 100
  val MaxRows = 500
  val DefaultTimeoutMs = 5000L
  val ExplainGateRows = 100000L

  /** Build the capped DataFrame for validated SQL: execute the validated
    * text and inject `limit(n)` when the plan had no top-level LIMIT —
    * semantics of the reference's AST rewrite (nl2sql.py:299-306). */
  def frame(spark: SparkSession, v: Validated, limit: Int = DefaultLimit): DataFrame = {
    val df = spark.sql(v.sql)
    if (v.needsLimit) df.limit(math.min(limit, MaxRows)) else df
  }

  /**
   * EXPLAIN cost gate (V9, ref routes_ai.py:277-285): reject when the
   * optimizer's estimated output cardinality exceeds `maxEstimatedRows`.
   * Uses Catalyst plan statistics (rowCount when CBO/row-count stats are
   * available, else a sizeInBytes-derived estimate) instead of the
   * reference's Postgres `EXPLAIN … rows=` regex.
   */
  def costGate(df: DataFrame, maxEstimatedRows: Long = ExplainGateRows): Either[EngineError, Unit] = {
    val stats = df.queryExecution.optimizedPlan.stats
    val estRows: BigInt = stats.rowCount.getOrElse {
      // Conservative fallback: assume ~32 bytes/row when only sizeInBytes
      // is known (parquet views without ANALYZE).
      val width = math.max(32, df.schema.fields.length * 16)
      stats.sizeInBytes / width
    }
    if (estRows > BigInt(maxEstimatedRows))
      Left(PlanTooLargeError(s"Plan too large: estimated rows $estRows > $maxEstimatedRows"))
    else Right(())
  }

  /** Timed collect with job-group cancellation — the Spark analogue of
    * `SET LOCAL statement_timeout` (V10, ref nl2sql.py:332-342). */
  def collectWithTimeout(spark: SparkSession, df: DataFrame, timeoutMs: Long): Either[EngineError, Array[Row]] = {
    val group = s"graft-exec-${System.nanoTime()}"
    val pool = Executors.newSingleThreadExecutor()
    try {
      val fut = pool.submit(new java.util.concurrent.Callable[Array[Row]] {
        override def call(): Array[Row] = {
          spark.sparkContext.setJobGroup(group, "graft timed execution", interruptOnCancel = true)
          try df.collect() finally spark.sparkContext.clearJobGroup()
        }
      })
      try Right(fut.get(timeoutMs, TimeUnit.MILLISECONDS))
      catch {
        case _: JTimeoutException =>
          spark.sparkContext.cancelJobGroup(group)
          fut.cancel(true)
          Left(TimeoutError(s"Execution exceeded ${timeoutMs}ms"))
        case e: java.util.concurrent.ExecutionException =>
          Left(ExecutionError(Option(e.getCause).getOrElse(e).getMessage.take(1000)))
      }
    } finally pool.shutdownNow()
  }

  /** JSON-safe coercion at the sink (ref nl2sql.py:325-330): Decimal →
    * double, temporal → ISO-8601 string, nested → a *JSON document
    * string* (the reference's `json.dumps` contract for nested values,
    * nl2mongo.py:220-222). String quoting/escaping is shared with the
    * response envelope (`Responses.jsonValue`) so a nested text value
    * containing `,`/`]`/`"` can never corrupt the payload. */
  def jsonSafe(v: Any): Any = v match {
    case null => null
    case d: java.math.BigDecimal => d.doubleValue()
    case d: scala.math.BigDecimal => d.doubleValue
    case d: java.sql.Date => d.toString
    case t: java.sql.Timestamp => t.toInstant.toString
    case t: java.time.Instant => t.toString
    case d: java.time.LocalDate => d.toString
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case _: collection.Seq[_] | _: collection.Map[_, _] | _: Row => nestedJson(v)
    case other => other
  }

  /** Render a nested value as a valid JSON document (json.dumps shape:
    * `", "` / `": "` separators, properly quoted strings). */
  private def nestedJson(v: Any): String = v match {
    case s: collection.Seq[_] => s.map(nestedJson).mkString("[", ", ", "]")
    case m: collection.Map[_, _] =>
      m.map { case (k, x) => graft.api.Responses.jsonString(String.valueOf(k)) + ": " + nestedJson(x) }
        .mkString("{", ", ", "}")
    case r: Row => r.toSeq.map(nestedJson).mkString("[", ", ", "]")
    case other => graft.api.Responses.jsonValue(jsonSafe(other))
  }

  /** Full guarded execution: cost gate → timed collect → JSON-safe rows +
    * explain capture (the reference's `/ai/run` tail — main.py:298-331). */
  def run(
      spark: SparkSession,
      v: Validated,
      limit: Int = DefaultLimit,
      timeoutMs: Long = DefaultTimeoutMs): Either[EngineError, QueryResult] =
    // Planning itself can throw (analysis errors, ANSI cast failures
    // surfacing through constant folding in the cost gate's optimized
    // plan) — the always-answer contract (V13) requires an error
    // envelope, never an exception, so the whole pipeline is guarded.
    try {
      val df = frame(spark, v, limit)
      for {
        // Second layer on the RESOLVED plan (r15 ADVICE high+medium):
        // before round 16 nothing on the default path ever consulted
        // the resolved-expression guard — exactly what let `try_reflect`
        // (a registry alias the parse-time NAME denylist didn't know)
        // run end-to-end. The scan is applied DIRECTLY to this query's
        // analyzed plan rather than by toggling spark.graft.readOnly
        // around execution: the conf is session-global, so a per-query
        // set/restore races with concurrent work on a shared session
        // (another thread's legitimate write failing inside the window,
        // or an overlapping run restoring the flag away mid-analysis).
        // The direct check is per-query, race-free, and independent of
        // whether GraftExtensions is registered; sessions that want the
        // analyzer-rule layer on EVERYTHING (not just engine queries)
        // still opt in via the conf.
        _ <- graft.plans.ReadOnlyGuard
               .firstOffenseDeep(df.queryExecution.analyzed)
               .map(what => SqlSafetyError(
                 s"Statically un-vettable construct: $what is not allowed"))
               .toLeft(())
        _ <- costGate(df)
        rows <- collectWithTimeout(spark, df, timeoutMs)
      } yield QueryResult(
        sql = v.sql,
        columns = df.columns.toSeq,
        rows = rows.toSeq.map(_.toSeq.map(jsonSafe)),
        rowcount = rows.length,
        explain = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
    } catch {
      case scala.util.control.NonFatal(e) =>
        Left(ExecutionError(Option(e.getMessage).getOrElse(e.getClass.getName).take(1000)))
    }

  /** Validate + execute raw SQL in one call. */
  def runSql(
      spark: SparkSession,
      sql: String,
      allowedTables: Set[String],
      limit: Int = DefaultLimit,
      timeoutMs: Long = DefaultTimeoutMs): Either[EngineError, QueryResult] =
    Validator.validate(spark, sql, allowedTables).flatMap(run(spark, _, limit, timeoutMs))
}
