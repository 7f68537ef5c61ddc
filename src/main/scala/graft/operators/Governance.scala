package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Privacy-governance audits for training-data release: k-anonymity and
 * l-diversity over quasi-identifier columns, plus the standard
 * remediation (suppression of under-sized equivalence classes).
 *
 * Re-expresses the public definitions — k-anonymity (Sweeney,
 * "k-Anonymity: a model for protecting privacy", IJUFKS 2002) and
 * l-diversity (Machanavajjhala et al., "l-Diversity: privacy beyond
 * k-anonymity", ICDE 2006) — as Spark aggregation plans. The
 * reference's closest surface is its per-column profiling pass
 * (`app/schema/crawler.py:244-246`), which measures distributions but
 * has no release-gate semantics; PII string redaction is the sibling
 * operator (`PiiRedaction`), this one governs RE-IDENTIFICATION risk
 * from column combinations that survive redaction.
 *
 * Scale design: every audit lowers to ONE hash aggregation over the
 * quasi-identifier key (map-side partial combine, |classes|-sized
 * state, never |rows|). Suppression is the aggregation plus a
 * key-partitioned join back to the corpus — no broadcast hint, so AQE
 * broadcasts the violating-class frame only when it actually fits
 * (the lesson of `Sampling.leakageSafeSplit`: at web scale the
 * violation set can be corpus-sized, and a forced broadcast would OOM
 * exactly where the operator matters).
 */
object Governance {

  /** Equivalence classes over the quasi-identifier columns with their
   * sizes — the frame every other audit derives from. One shuffle. */
  def equivalenceClasses(df: DataFrame, quasiCols: Seq[String]): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1L)).as("class_size"))

  /** Classes smaller than `k` — each is a re-identification risk: an
   * attacker who knows a subject's quasi-identifiers narrows them to
   * fewer than k candidate rows. */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame =
    equivalenceClasses(df, quasiCols).where(col("class_size") < k)

  /** One-row release-gate report: the dataset's achieved anonymity
   * (min class size), how many classes violate `k`, and how many rows
   * they expose. Driver cost is one collected row. */
  def kAnonymityStats(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame =
    equivalenceClasses(df, quasiCols).agg(
      sum(col("class_size")).as("n_rows"),
      count(lit(1L)).as("n_classes"),
      min(col("class_size")).as("anonymity_k"),
      sum(when(col("class_size") < k, 1L).otherwise(0L)).as("violating_classes"),
      sum(when(col("class_size") < k, col("class_size")).otherwise(0L)).as("exposed_rows"))
      .select(col("n_rows"), col("n_classes"), col("anonymity_k"),
        col("violating_classes"), col("exposed_rows"),
        round(col("exposed_rows").cast("double") / col("n_rows"), 6).as("exposed_rate"),
        (col("anonymity_k") >= k).as("pass"))

  /** Classes whose NON-NULL distinct `sensitiveCol` count is below `l`
   * — k-anonymity alone fails when everyone in a class shares the same
   * sensitive value (the homogeneity attack l-diversity exists for).
   * NULL sensitive values carry no disclosure, so they do not count
   * toward diversity (matching COUNT(DISTINCT)'s null semantics). */
  def lDiversityViolations(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1L)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("distinct_sensitive"))
      .where(col("distinct_sensitive") < l)

  /** t-closeness audit (Li, Li & Venkatasubramanian, "t-Closeness:
   * privacy beyond k-anonymity and l-diversity", ICDE 2007): a class
   * is t-close when the distance between its sensitive-value
   * distribution and the GLOBAL distribution is at most t — the
   * skewness/similarity attacks l-diversity misses. For a categorical
   * sensitive attribute the distance is total variation:
   * TVD_g = (1/2) * Σ_v |c_gv/n_g − c_v/N|.
   *
   * EXACT INTEGER arithmetic (round-13 rule: no doubles on a hashed
   * surface): multiplying through by n_g*N,
   *   TVD_g = Σ_v |c_gv*N − c_v*n_g| / (2*n_g*N)
   * and the absent-value tail (v in the global domain but not the
   * class, where c_gv = 0) telescopes to n_g*(N − Σ_present c_v) — so
   * NO class×domain cross join is needed: one pass over the observed
   * (class, value) cells joined to the |domain|-sized global counts.
   * The report carries the integer numerator `tvd_num` (class size and
   * N reconstruct the denominator 2*n_g*N) and the gate compares
   * cross-multiplied integers: violating ⇔ tvd_num*tDen > 2*n_g*N*tNum.
   *
   * Scale: the first aggregation is the only |rows|-sized pass; the
   * (class × observed-value) frame and the global-domain frame are
   * aggregate-sized. The domain join carries NO forced broadcast —
   * AQE broadcasts it when it is small (the intended use: a sensitive
   * attribute's domain is small by definition) and degrades to a
   * shuffle join when a caller passes an unbanded high-cardinality
   * column, instead of OOMing the driver (round-14 ADVICE). Only the
   * 1-row total frame keeps an explicit hint. Exactness bound: the
   * largest integer term is c_v·n_g ≤ N², so the arithmetic is exact
   * while N < ~3·10^9 rows per audit scope — beyond that, audit per
   * shard/snapshot (which a 100 TB release gate does anyway) or widen
   * to DecimalType. NULL sensitive values
   * form their own category (GROUP BY groups nulls identically in
   * Spark and the oracle), unlike l-diversity where NULL carries no
   * disclosure — here the FREQUENCY of null itself can skew. */
  def tClosenessStats(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, tNum: Long, tDen: Long): DataFrame = {
    require(tNum > 0 && tDen > 0, "threshold t must be a positive fraction")
    val qc = quasiCols.map(col)
    // per-(class, value) cells — the single corpus-sized aggregation
    val cells = df.groupBy(qc :+ col(sensitiveCol).as("__v"): _*)
      .agg(count(lit(1L)).as("__c_gv"))
    // global per-value counts and the corpus total (domain-sized)
    val global = df.groupBy(col(sensitiveCol).as("__v"))
      .agg(count(lit(1L)).as("__c_v"))
    val total = df.agg(count(lit(1L)).as("__n"))
    // class sizes via a window over the aggregate-sized cells frame
    // (partitioned by the quasi key — never a single-partition window).
    // NULL-SAFE join: a NULL sensitive category is a real cell on both
    // frames, and a plain equi-join would silently drop it (and its
    // count from n_g) — the oracle mirrors with IS NOT DISTINCT FROM.
    val ng = org.apache.spark.sql.expressions.Window.partitionBy(qc: _*)
    val joined = cells
      .join(global.withColumnRenamed("__v", "__gv"),
        col("__v") <=> col("__gv"))
      .drop("__gv")
      .crossJoin(broadcast(total))
      .withColumn("__n_g", sum(col("__c_gv")).over(ng))
    joined.groupBy(qc: _*)
      .agg(
        max(col("__n_g")).as("class_size"),
        max(col("__n")).as("__n"),
        // present-value term of the numerator
        sum(abs(col("__c_gv") * col("__n") - col("__c_v") * col("__n_g")))
          .as("__a"),
        sum(col("__c_v")).as("__cpres"))
      .select(qc ++ Seq(
        col("class_size"),
        (col("__a") + col("class_size") * (col("__n") - col("__cpres")))
          .as("tvd_num"),
        ((col("__a") + col("class_size") * (col("__n") - col("__cpres")))
          * tDen > lit(2L) * col("class_size") * col("__n") * tNum)
          .as("violating")): _*)
  }

  /** Ordered t-closeness (the same ICDE 2007 paper's metric for an
   * ORDERED sensitive attribute): distance is the earth-mover's
   * distance with unit ground distance between adjacent categories,
   *   EMD_g = (1/(m−1)) Σ_{i<m} |Σ_{j≤i} (p_g(v_j) − p(v_j))|
   * — a class whose mass sits FAR from the global mass scores high
   * even when the supports barely overlap (where TVD saturates).
   *
   * Exact integers again: with diff_j = c_gv_j·N − c_v_j·n_g, the
   * cumulative Σ_{j≤i} diff_j telescopes to 0 at i = m (both sides
   * total n_g·N), so summing |cum| over the WHOLE domain equals the
   * i<m sum and EMD_g = emd_num / (n_g·N·(m−1)). Unlike the nominal
   * variant the cumulative needs the value's POSITION, so absent
   * cells matter mid-stream: the frame is the |classes|×|domain| grid
   * — classes-sized times a small constant (an ordered sensitive
   * domain is small by definition), built from a broadcast cross join,
   * never |rows|×anything. Because the grid is INTRINSIC to the EMD
   * (unlike the nominal variant there is no shuffle-join fallback that
   * keeps the algorithm sane on a huge domain), the domain cardinality
   * is guarded up front: more than `maxDomain` distinct values fails
   * with an actionable error — band/bucket the attribute first —
   * instead of OOMing an executor (round-14 ADVICE). The guard job
   * also yields N and m, inlined as literals so the main plan drops
   * the 1-row totals cross join. The per-class running sum is a window over
   * m rows partitioned by the quasi key. Same exactness bound as the
   * nominal variant: |cum| ≤ n_g·N ≤ N², exact while N < ~3·10^9 rows
   * per audit scope.
   *
   * NULL sensitive values are EXCLUDED (filtered before counting):
   * an ordered attribute gives null no position, and Spark and SQL
   * engines disagree on default NULL sort placement — the nominal
   * variant is the right tool when null frequency itself matters. */
  def tClosenessOrderedStats(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, tNum: Long, tDen: Long,
      maxDomain: Long = 10000L): DataFrame = {
    require(tNum > 0 && tDen > 0, "threshold t must be a positive fraction")
    val qc = quasiCols.map(col)
    val base = df.where(col(sensitiveCol).isNotNull)
    val cells = base.groupBy(qc :+ col(sensitiveCol).as("__v"): _*)
      .agg(count(lit(1L)).as("__c_gv"))
    val classes = cells.groupBy(qc: _*).agg(sum(col("__c_gv")).as("__n_g"))
    val domain = base.groupBy(col(sensitiveCol).as("__v"))
      .agg(count(lit(1L)).as("__c_v"))
    // domain-cardinality guard (one aggregate-sized job, run eagerly):
    // the |classes|×|domain| grid below is only sane for a SMALL
    // ordered domain — fail actionably before building it
    val totalsRow = base.agg(count(lit(1L)).as("__n"),
      countDistinct(col(sensitiveCol)).as("__m")).collect()(0)
    val (n, m) = (totalsRow.getLong(0), totalsRow.getLong(1))
    require(m <= maxDomain,
      s"ordered t-closeness needs a small sensitive domain: '$sensitiveCol' " +
        s"has $m distinct values (max $maxDomain). Band or bucket the " +
        "attribute first (e.g. quantileCuts), or raise maxDomain deliberately.")
    val grid = classes
      .crossJoin(broadcast(domain))
      .withColumn("__n", lit(n)).withColumn("__m", lit(m))
    val cellsR = cells.select(
      quasiCols.map(c => col(c).as(s"__cq_$c")) ++
        Seq(col("__v").as("__cv"), col("__c_gv")): _*)
    val onGrid = quasiCols.map(c => col(c) <=> col(s"__cq_$c"))
      .reduce(_ && _) && col("__v") === col("__cv")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qc: _*).orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(cellsR, onGrid, "left")
      .withColumn("__diff",
        coalesce(col("__c_gv"), lit(0L)) * col("__n") - col("__c_v") * col("__n_g"))
      .withColumn("__cum", sum(col("__diff")).over(w))
      .groupBy(qc: _*)
      .agg(
        max(col("__n_g")).as("class_size"),
        max(col("__n")).as("__n"),
        max(col("__m")).as("__m"),
        sum(abs(col("__cum"))).as("emd_num"))
      .select(qc ++ Seq(
        col("class_size"),
        col("emd_num"),
        (col("emd_num") * tDen >
          col("class_size") * col("__n") * (col("__m") - 1) * tNum)
          .as("violating")): _*)
  }

  /** Suppression remediation: drop every row belonging to a class
   * smaller than `k`. The surviving frame is k-anonymous over
   * `quasiCols` by construction. Left-anti join on the quasi key —
   * key-partitioned, AQE decides broadcast. NULL-safe equality so a
   * violating class keyed by NULL quasi values is suppressed too
   * (GROUP BY groups nulls; a plain equi-join would leak them back). */
  def suppressBelowK(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    val violating = kAnonymityViolations(df, quasiCols, k)
      .select(quasiCols.map(c => col(c).as(s"__viol_$c")): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"__viol_$c")).reduce(_ && _)
    df.join(violating, cond, "left_anti")
  }
}
