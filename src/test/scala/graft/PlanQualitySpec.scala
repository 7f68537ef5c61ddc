package graft

import org.apache.spark.sql.execution.FormattedMode

/**
 * Plan-shape invariants for the declared queries — the 100 TB design
 * checks from the project brief: filters and projections must reach the
 * parquet scan, dimension joins must broadcast, top-k must not full-sort,
 * aggregations must have a map-side partial phase.
 */
class PlanQualitySpec extends SparkSpec {

  def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution
      .explainString(FormattedMode)

  test("driver smoke contract: entry() answers with rows on the sf0.001 fixture") {
    // the driver's first check each round — pin it in-suite so a
    // regression surfaces here before the round gate does
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("filters and column pruning are pushed to the parquet scan (d03)") {
    val p = plan("d03_filter_and")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(l_quantity,30.0)"), p.take(1500))
    // only the 4 referenced columns are read, not all 11
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_discount:double>"), p.take(1500))
  }

  test("FK joins to dimension tables broadcast the small side (d07, d08)") {
    assert(plan("d07_join_fk").contains("BroadcastHashJoin"))
    val p8 = plan("d08_join_chain")
    assert(p8.contains("BroadcastHashJoin"))
    assert(!p8.contains("SortMergeJoin"), "dim chain must not sort-merge")
  }

  test("TPC-H shapes: Q1 partial-aggregates one scan; Q3/Q5 broadcast dims, never cartesian (d40-d42)") {
    val p1 = plan("d40_tpch_q1")
    assert(p1.contains("partial_"), "Q1 must map-side combine")
    assert(!p1.contains("Join"), "Q1 is a single-table scan-aggregate")
    // at fixture scale AQE broadcasts every join side (q3: 4 BHJ,
    // q5: 10 incl. reused exchanges, 0 SMJ); at real scale the
    // lineitem-orders spine would sort-merge — the pin is only
    // "dims broadcast, nothing degenerates to all-pairs"
    Seq(plan("d41_tpch_q3"), plan("d42_tpch_q5")).foreach { p =>
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
      assert(p.contains("BroadcastHashJoin"), "dimension sides must broadcast")
    }
  }

  test("TPC-H decorrelation shapes: Q4/Q13/Q16/Q18/Q21 plan semi/anti/outer joins, never nested loops (d45-d49)") {
    // the round-15 planner-shape suite: every subquery must decorrelate
    // to a hash join (RewritePredicateSubquery), nothing may degenerate
    // to a CartesianProduct or BroadcastNestedLoopJoin even with the
    // non-equi residuals (Q4's lateness conjunct, Q21's suppkey <>)
    val p4 = plan("d45_tpch_q4")
    assert(p4.contains("LeftSemi"), "Q4 EXISTS must decorrelate to a semi join: " + p4.take(1500))
    val p13 = plan("d46_tpch_q13")
    assert(p13.contains("LeftOuter"), "Q13 must keep the outer join: " + p13.take(1500))
    assert("HashAggregate".r.findAllIn(p13).size >= 4,
      "Q13 needs both aggregate levels (per-customer, then count-of-counts) with partials")
    val p16 = plan("d47_tpch_q16")
    assert(p16.contains("LeftAnti"), "Q16 NOT IN must plan an anti join: " + p16.take(1500))
    val p18 = plan("d48_tpch_q18")
    assert(p18.contains("LeftSemi"), "Q18 IN-over-HAVING must plan a semi join: " + p18.take(1500))
    val p21 = plan("d49_tpch_q21")
    assert(p21.contains("LeftSemi") && p21.contains("LeftAnti"),
      "Q21 needs the EXISTS/NOT-EXISTS semi+anti pair: " + p21.take(2000))
    Seq(p4, p13, p16, p18, p21).foreach { p =>
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        "no nested loops in the TPC-H suite: " + p.take(2000))
    }
  }

  test("TPC-H correlated-scalar shapes: Q2/Q11/Q15/Q17/Q20/Q22 decorrelate to joined aggregates (d50-d55)") {
    // DecorrelateInnerQuery territory: every correlated scalar (Q2's
    // per-part MIN, Q17's per-part AVG, Q20's per-part windowed SUM
    // inside a HAVING) must become an aggregate JOINED back on the
    // correlation key — never a per-row nested-loop re-execution
    val plans = Seq("d50_tpch_q2", "d51_tpch_q11", "d52_tpch_q15",
      "d53_tpch_q17", "d54_tpch_q20", "d55_tpch_q22").map(n => n -> plan(n))
    plans.foreach { case (n, p) =>
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$n must not nested-loop: " + p.take(2000))
    }
    val byName = plans.toMap
    // Q17: the correlated AVG is an aggregate on the BUILD side of the
    // join, with map-side partials
    val p17 = byName("d53_tpch_q17")
    assert("HashAggregate".r.findAllIn(p17).size >= 4, p17.take(2000))
    // Q22: the NOT EXISTS half still plans as an anti join
    assert(byName("d55_tpch_q22").contains("LeftAnti"))
    // Q20: IN over the grouped subquery stays a semi join
    assert(byName("d54_tpch_q20").contains("LeftSemi"))
  }

  test("TPC-H suite completion: Q6-Q19 shapes plan hash joins with pushed filters (d56-d63)") {
    // Q6 is the no-join scan-aggregate: partials, pushed range filters
    val p6 = plan("d56_tpch_q6")
    assert(!p6.contains("Join") && p6.contains("partial_"), p6.take(1500))
    assert(p6.contains("PushedFilters:") && p6.contains("GreaterThanOrEqual(l_shipdate"), p6.take(1500))
    // Q19's OR-of-ANDs spans both join sides — the planner must keep
    // the p_partkey equi-conjunct joinable and evaluate the
    // disjunction as a residual, never degrade to all-pairs
    val p19 = plan("d63_tpch_q19")
    assert(p19.contains("BroadcastHashJoin") || p19.contains("SortMergeJoin"), p19.take(1500))
    // the whole batch: zero nested loops, dims broadcast somewhere
    Seq("d57_tpch_q7", "d58_tpch_q8", "d59_tpch_q9", "d60_tpch_q10",
      "d61_tpch_q12", "d62_tpch_q14", "d63_tpch_q19").foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$n must not nested-loop: " + p.take(2000))
      assert(p.contains("BroadcastHashJoin"), s"$n should broadcast its dims")
    }
  }

  test("ORDER BY + LIMIT plans as TakeOrderedAndProject, not a full sort (d15, d03)") {
    assert(plan("d15_topn").contains("TakeOrderedAndProject"))
    assert(plan("d03_filter_and").contains("TakeOrderedAndProject"))
  }

  test("group-by aggregations have a map-side partial phase (d10)") {
    val p = plan("d10_groupby_sum_avg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expect partial + final HashAggregate")
  }

  test("IN-subquery plans as a semi join, not a nested loop (d18)") {
    val p = plan("d18_in_subquery")
    assert(p.contains("LeftSemi"), p.take(1500))
  }

  test("anti-join query plans as LeftAnti (d30)") {
    assert(plan("d30_anti_join").contains("LeftAnti"))
  }

  test("brute-force ANN top-k is a single scan + TakeOrderedAndProject (x_ann_topk)") {
    val p = plan("x_ann_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("SortMergeJoin") && !p.contains("Exchange hashpartitioning"),
      "query-vector join must broadcast, ranking must not shuffle: " + p.take(1500))
  }

  test("k-bounded global rank has NO single-partition WindowExec (d14)") {
    val p = plan("d14_window_rank")
    assert(!p.contains("Window"), "global rank must not plan a WindowExec: " + p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("grouped top-k: window hash-partitions on the group and WindowGroupLimit bounds per-group state (x_grouped_topk)") {
    val p = plan("x_grouped_topk")
    assert(p.contains("Window"), p.take(1500))
    // the partitioned window shuffles ON THE GROUP KEY — never a
    // global single-partition sort
    assert(raw"hashpartitioning\(lang".r.findFirstIn(p).isDefined,
      "window must partition by lang: " + p.take(1500))
    // rank-limit pushdown prunes every partition to its top k BEFORE
    // the final window (partial + final), so per-group state is
    // bounded by k regardless of group skew — the 100 TB property
    assert(p.contains("WindowGroupLimit"), "rank pushdown must fire: " + p.take(1500))
  }

  test("BoundedRankPrefilter bounds the window input on the SQL path (W2 rewrite)") {
    graft.sources.Sources.register(spark, sfDir)
    val df = spark.sql(Queries.extensionOracles("d14_window_rank"))
    val opt = df.queryExecution.optimizedPlan.toString
    // the rule (registered via GraftExtensions) must inject Limit+Sort
    // BELOW the window, so WindowExec sees ≤ 10 rows, not the table
    assert(opt.contains("GlobalLimit 10"), opt.take(2000))
    assert(opt.indexOf("Window") < opt.indexOf("GlobalLimit 10"), opt.take(2000))
    import spark.implicits._
    val ranked = df.as[(Long, String, Int)].collect()
    assert(ranked.length == 10 && ranked.map(_._3).toSeq == (1 to 10))
  }

  test("LSH dedup and near-dup plans never go all-pairs (no cartesian/nested-loop joins)") {
    for (q <- Seq("x_dedup_minhash", "x_dedup_simhash", "x_cosine_neardup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q must stay bucket-local: " + p.take(1200))
    }
  }

  test("multimodal feature extraction is shuffle-free up to the final top-k (x_multimodal_features)") {
    val p = plan("x_multimodal_features")
    assert(!p.contains("Exchange hashpartitioning"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("IVF probe ranks candidates without a join or full sort (x_ann_ivf)") {
    val p = plan("x_ann_ivf")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("whole-stage codegen covers the scan-filter-project pipeline (d03)") {
    // FormattedMode marks codegen'd operators with "[codegen id : N]"
    assert(plan("d03_filter_and").contains("[codegen id :"))
  }

  // ---- round-4 training-pipeline operators ----

  test("quality filter is one narrow filter over the scan — no shuffle, no join (x_quality_filter)") {
    val p = plan("x_quality_filter")
    assert(!p.contains("Exchange hashpartitioning"), p.take(1500))
    assert(!p.contains("Join"), "quality filter must not join: " + p.take(1500))
  }

  test("stratified sampling is a narrow filter — no shuffle before the final top-k (x_stratified_sample)") {
    val p = plan("x_stratified_sample")
    assert(!p.contains("Exchange hashpartitioning"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("decontamination broadcasts the benchmark shingle set — corpus side never sort-merges (x_decontam)") {
    val p = plan("x_decontam")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "eval set must broadcast: " + p.take(1500))
  }

  test("corpus vocabulary aggregates with a partial phase and top-k without a full sort (x_vocab_top)") {
    val p = plan("x_vocab_top")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expect partial + final HashAggregate")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("PII redaction is a pure projection — no shuffle before the final top-k (x_pii_redact)") {
    val p = plan("x_pii_redact")
    assert(!p.contains("Exchange hashpartitioning"), p.take(1500))
  }

  // ---- round-4b corpus-statistics operators ----

  test("duplicated-span stats never generate pairs (no cartesian/nested-loop) (x_span_dup)") {
    val p = plan("x_span_dup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "span stats must stay count-only: " + p.take(1200))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expect partial + final HashAggregate")
  }

  test("TF-IDF keywords: doc-count joins as broadcast, window partitioned by doc (x_tfidf_top)") {
    val p = plan("x_tfidf_top")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the single-row doc count must broadcast: " + p.take(1500))
    assert(p.contains("Window"), p.take(1500))
    // the window is per-document, never a global single partition
    assert(!p.contains("Window: No Partition Defined"), p.take(1500))
  }

  test("nearest-centroid assignment broadcasts centroids and aggregates the argmax (x_cluster_assign)") {
    val p = plan("x_cluster_assign")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the centroid fan-out must be a broadcast cross join: " + p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(!p.contains("Window"), "argmax must be an aggregation, not a window sort: " + p.take(1500))
    // max(struct) cannot use HashAggregate (struct is not a mutable
    // buffer type) — what matters at scale is that a PARTIAL phase
    // collapses the centroid fan-out before the shuffle
    assert("SortAggregate|HashAggregate".r.findAllIn(p).size >= 2,
      "expect partial + final aggregate phases: " + p.take(1500))
  }

  test("k-NN join broadcasts the query set; the window partitions by query (x_knn_join)") {
    val p = plan("x_knn_join")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the query fan-out must be a broadcast cross join: " + p.take(1500))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("Window"), p.take(1500))
    assert(!p.contains("Window: No Partition Defined"), p.take(1500))
  }

  test("URL extraction is a narrow explode — no shuffle before the final top-k (x_url_extract)") {
    val p = plan("x_url_extract")
    assert(!p.contains("Exchange hashpartitioning"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("exact percentiles aggregate with a partial phase (x_percentiles)") {
    val p = plan("x_percentiles")
    assert(p.contains("ObjectHashAggregate") || "HashAggregate".r.findAllIn(p).size >= 2,
      "expect partial + final aggregation: " + p.take(1500))
  }

  test("SemDeDup: centroids broadcast; pair generation never cartesian (x_semdedup)") {
    val p = plan("x_semdedup")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the centroid fan-out must be a broadcast cross join: " + p.take(2000))
    assert(!p.contains("CartesianProduct"),
      "within-cluster pairs must join on the cluster key, never all-pairs: " + p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("bigram perplexity: no global window; LM and score joins are keyed (x_perplexity)") {
    val p = plan("x_perplexity")
    assert(!p.contains("Window"),
      "context totals must be a groupBy + join, not a window: " + p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("contamination attribution broadcasts the eval postings (x_decontam_report)") {
    val p = plan("x_decontam_report")
    assert(p.contains("BroadcastHashJoin"),
      "the eval posting list must broadcast: " + p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("BM25: df and corpus stats broadcast; ranking is TakeOrderedAndProject (x_bm25)") {
    val p = plan("x_bm25")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "df/stats sides must broadcast: " + p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("k-means step: M-step aggregates with a partial phase; centroids never sort-merge (x_kmeans_step)") {
    val p = plan("x_kmeans_step")
    // partial+final aggregation: the posexplode fan-out compresses
    // map-side, so the shuffle carries cluster×dim partials
    assert(p.contains("partial_avg") || p.contains("partial avg")
      || (p.contains("HashAggregate") && p.contains("avg")), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("IVF-pruned k-NN join: cell equi-join, bounded-heap top-k, no window sort (x_knn_join_ivf)") {
    val p = plan("x_knn_join_ivf")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("ObjectHashAggregate"),
      "per-query top-k must be the bounded-heap aggregate: " + p.take(2000))
  }

  test("batch IVF-PQ k-NN join: cell equi-join, ADC on stored-shape codes, bounded-heap top-k (x_knn_join_ivfpq)") {
    val p = plan("x_knn_join_ivfpq")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // each (query, code) pair scores in m table lookups — the two-arg
    // ADC expression must rank, never a per-pair full distance
    assert(p.contains("pqadclookup"), p.take(2000))
    assert(p.contains("ObjectHashAggregate"),
      "per-query candidate cut and final top-k must be the bounded heap: " + p.take(2000))
  }

  test("persisted IVF-PQ search: no query-time encode anywhere in the plan (x_pq_persisted)") {
    val p = plan("x_pq_persisted")
    // expressions render by nodeName: PqEncode → pqencode
    assert(!p.contains("pqencode"),
      "ranking must read stored codes, never re-encode floats: " + p.take(2000))
    assert(p.contains("pqadcdistance"), p.take(2000))
    // the codes parquet is PARTITIONED BY CELL (writeIndex), so the
    // probed-cell filter prunes whole partitions — stronger than
    // row-group PushedFilters
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("cell"), "probed cells must partition-prune: " + p.take(3000))
  }

  test("leakage-safe split broadcasts the duplicate-group side; the split rule adds no shuffle (x_leakage_split)") {
    val p = plan("x_leakage_split")
    assert(p.contains("BroadcastHashJoin"),
      "the groups side (duplicate members only) must broadcast: " + p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("corpus-path probe operators run native expressions, not Scala UDFs") {
    // bloom screen, IVF cell probes and the streaming overlap filter all
    // replaced their closure UDFs with codegen-bridged expressions —
    // a ScalaUDF in these plans would re-box every array element
    // a ScalaUDF prints as "UDF(...)" (or its name) in explain output
    for (name <- Seq("x_bloom_decontam", "x_knn_join_ivf", "x_decontam")) {
      val p = plan(name)
      assert(!p.contains("ScalaUDF") && !p.contains("UDF("), s"$name plan contains a ScalaUDF")
    }
  }

  test("BPE pair counting: partial aggregation, bounded top-k, one codegen span (x_bpe_pairs)") {
    val p = plan("x_bpe_pairs")
    // the pair multiset collapses map-side before the exchange
    assert(p.contains("HashAggregate") && p.contains("partial_count"),
      "pair counts must partially aggregate before the shuffle: " + p.take(2500))
    // top-40 is a bounded order, never a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    // the segmentation expression bridges codegen — no closure UDF
    assert(!p.contains("ScalaUDF") && !p.contains("UDF("), p.take(2000))
    // only the text column leaves the scan
    val rs = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(rs.contains("text") && !rs.contains("doc_id"), rs)
  }

  test("relative-date filter pushes an implied raw-nanos bound to the events scan (x_relative_date)") {
    val p = plan("x_relative_date")
    // ts is DERIVED from the raw nanos column (Sources.register), so the
    // exact cutoff cannot push down — the NanosTimestampPushdown rule
    // conjoins an implied bound on the raw column, which CAN
    assert(p.contains("GreaterThanOrEqual(ts,"),
      "implied raw-nanos bound missing from PushedFilters: " + p.take(3000))
    // and the exact derived-timestamp predicate still filters post-scan
    assert(p.contains("2024-01-21"), p.take(3000))
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("ROLLUP/CUBE/GROUPING SETS are one Expand over one scan, partial+final (d35-d37)") {
    for (name <- Seq("d35_rollup", "d36_cube", "d37_grouping_sets")) {
      val p = plan(name)
      assert(p.contains("Expand"), s"$name: multi-level agg must plan as Expand: " + p.take(1500))
      // one scan feeds every grouping level — never a scan per level
      // (FormattedMode prints each node twice: tree + detail section)
      assert("Scan parquet".r.findAllIn(p).size <= 2, s"$name: " + p.take(1500))
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$name: expect partial + final HashAggregate")
    }
  }

  test("distribution windows share one per-nation WindowExec — no global sort (d38)") {
    val p = plan("d38_ntile")
    // ntile/percent_rank/cume_dist over the same spec collapse into ONE
    // Window node partitioned by nation (tree + detail = 2 prints)
    assert("Window\\b".r.findAllIn(p).size <= 2, p.take(2000))
    assert(p.contains("c_nationkey"), p.take(2000))
  }

  test("pivot is one grouped pass — no distinct-scan for columns, no second shuffle (x_pivot)") {
    val p = plan("x_pivot")
    assert("Scan parquet".r.findAllIn(p).size <= 2, p.take(1500))
    assert("Exchange".r.findAllIn(p).size <= 2,
      "explicit value list must keep pivot to the single groupBy shuffle: " + p.take(2000))
  }

  test("hopping window expands to 2 assignments per row, one grouped pass (x_sliding_window)") {
    val p = plan("x_sliding_window")
    // window() lowers to Expand (size/slide = 2 rows per event), then
    // ONE partial+final aggregate — no join, no per-window scans
    assert(p.contains("Expand"), p.take(2000))
    assert("Scan parquet".r.findAllIn(p).size <= 2, p.take(1500))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("gap-fill joins the bounded grid broadcast — corpus side is one grouped pass (x_gap_fill)") {
    val p = plan("x_gap_fill")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "bounded hourly frame must broadcast: " + p.take(2000))
  }

  test("MV refresh: extreme recompute is a broadcast LEFT SEMI probe; deltas have map-side partials (x_mv_refresh)") {
    val p = plan("x_mv_refresh")
    // the affected-keys probe of the current table must not shuffle it
    assert(p.contains("LeftSemi"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "delta frames + merge expect partial+final aggregates: " + p.take(3000))
  }

  test("salted skew join stays a hash equi-join — no nested-loop, no corpus window (x_skew_join)") {
    val p = plan("x_skew_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("entity resolution: blocked equi-join (no cartesian), per-left window, no ScalaUDF (x_entity_match)") {
    val p = plan("x_entity_match")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("ScalaUDF"), "Jaro-Winkler must be the native expression")
  }

  test("leakage-safe split: group-map join carries NO broadcast hint; the planner still broadcasts it when it fits") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
    val groups = docs.where(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("id"), (col("doc_id") % 13).as("group_id"))
    val df = graft.operators.Sampling.leakageSafeSplit(
      docs, "doc_id", groups, Seq("train" -> 0.8, "test" -> 0.2))
    // at web-scale dup rates the group map is corpus-sized: a FORCED
    // broadcast hint would OOM exactly where the operator matters, so
    // the choice is left to stats/AQE (ProbeForceScale pins the
    // shuffle-join fallback above the broadcast threshold)
    assert(!df.queryExecution.optimizedPlan.toString.contains("ResolvedHint"),
      df.queryExecution.optimizedPlan.toString.take(1500))
    df.count() // materialize so AQE finalizes the join strategy
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("PageRank runs ONE job per iteration — the dangling-mass scalar is folded in, not a separate action (x_pagerank)") {
    val sc = spark.sparkContext
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"))
      .toDF("src", "dst")
    // AQE splits one action into per-stage jobs, which would swamp the
    // count being pinned (actions, not stages) — disable it here only
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.addSparkListener(listener)
    try {
      // threshold 0 forces the DISTRIBUTED loop (the small-graph driver
      // path would trivially pass; this pins the 100 TB path's shape)
      graft.operators.Graphs.pageRank(edges, iterations = 3, smallGraphThreshold = 0L)
      // listener events are async; give the bus a moment to drain
      Thread.sleep(500)
    } finally {
      sc.removeSparkListener(listener)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
    // setup = nodes.count + edge-count threshold check + initial-rank
    // checkpoint; each iteration = ONE checkpoint action plus its
    // in-plan broadcast submissions (dangling scalar, small join
    // sides — measured 16/3 iterations on this fixture). The pre-fix
    // form with a separate driver-side dangling head() per iteration
    // measures >= 24 here; the bound sits between the two so a
    // reverted fold-in fails the pin.
    assert(jobs.get() <= 20,
      s"pageRank(3 iters) launched ${jobs.get()} jobs — dangling mass must fold into the iteration job")
  }

  test("vocab divergence aggregates with a partial phase; divergent-tokens top-k never full-sorts (x_vocab_divergence, x_divergent_tokens)") {
    // the vocabulary histogram must collapse map-side (partial + final
    // HashAggregate) so the shuffle is vocab-sized, never corpus-sized
    val pd = plan("x_vocab_divergence")
    assert("HashAggregate".r.findAllIn(pd).size >= 2, pd.take(1500))
    val pt = plan("x_divergent_tokens")
    assert(pt.contains("TakeOrderedAndProject"), pt.take(1500))
    assert(!pt.contains("CartesianProduct") ||
      pt.contains("BroadcastNestedLoopJoin"), // the 1-row totals frame
      pt.take(1500))
  }

  test("quantile cut is one |strata|-sized percentile pass; the threshold join broadcasts via AQE (x_quantile_cut)") {
    val df = SparkEntry.queries("x_quantile_cut")(spark, sfDir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "AQE should broadcast the per-stratum threshold frame:\n" + p.take(2000))
    assert(!p.contains("WindowExec"), "no per-stratum window sort:\n" + p.take(2000))
  }

  test("anomaly stats frames broadcast at fixture scale via AQE, not a forced hint (x_anomaly_zscore, x_anomaly_mad)") {
    // The operators carry NO broadcast() hint (a caller keying at user
    // grain must degrade to a shuffle join, not OOM — the r10
    // leakageSafeSplit lesson); this pins that AQE still broadcasts the
    // |keys|-sized stats frames when they fit, so the common case keeps
    // its narrow second pass.
    for (name <- Seq("x_anomaly_zscore", "x_anomaly_mad")) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count() // materialize so AQE finalizes the adaptive plan
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        s"$name: AQE should broadcast the per-key stats frame:\n" + p.take(2000))
    }
  }

  /** r15 verdict #5 — the AQE-vs-manual-salting A/B, plan half. The
    * measured half lives in ProbeSkewAB at 150M rows on PRODUCTION
    * thresholds: unsplit straggler 42.9s → AQE runtime split 8.0s
    * (5.4×, plan carries SortMergeJoin(skew=true)) → Skew.saltedJoin
    * 19.2s (beats the straggler, loses to the split: 8-way build
    * replication is pure overhead once AQE splits for free). Two
    * hard-won caveats the probe surfaced, recorded for the next reader:
    * (a) skew detection reads COMPRESSED shuffle bytes — an
    * identical-key hot partition with cyclic payloads LZ4s under the
    * 256 MB threshold and AQE sees NO skew (the manual operator is the
    * fallback exactly there, and on AQE-less streaming joins);
    * (b) for sum-decomposable aggregates map-side partial aggregation
    * already collapses the hot key (plain 1.2s vs salted 0.8s), so
    * saltedAggregate's real value is non-decomposable/large-state aggs.
    * This test pins (1) at spec scale with proportionally lowered
    * byte thresholds — the detection RULE, not the toy sizes. */
  test("AQE splits a planted hot key on the plain shuffle join (skew=true in the final plan)") {
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128k",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 3/4 of rows on the hot key; payload hash-derived so the codec
      // cannot fold the hot partition under the threshold (caveat (a))
      val probe = spark.range(800000).select(
        when(pmod(col("id"), lit(4)) =!= 0, lit(1L))
          .otherwise(pmod(hash(col("id")), lit(100000L)) + 2L).as("k"),
        (hash(col("id"), lit(7)).cast("double") / 1000.0).as("q"))
      val build = spark.range(100002).select(
        col("id").as("k"), (col("id") % 97).as("nk"))
      val joined = probe.join(build, "k").groupBy("nk")
        .agg(count(lit(1)).as("n"), round(sum("q"), 2).as("s"))
      val rows = joined.collect()
      assert(rows.length == 97)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        "OptimizeSkewedJoin must split the planted hot partition:\n" + p.take(2500))
      // the reader prints "skewed" or "coalesced and skewed"
      assert(p.linesIterator.exists(l => l.contains("AQEShuffleRead") && l.contains("skewed")),
        "the skewed-side reader must be marked:\n" + p.take(2500))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
