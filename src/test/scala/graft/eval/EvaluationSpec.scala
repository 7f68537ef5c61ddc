package graft.eval

import graft.SparkSpec
import graft.api.Engine
import graft.core.QueryResult

class EvaluationSpec extends SparkSpec {

  lazy val engine: Engine = Engine.forFixtures(spark, sfDir)

  test("resultF1: identical sets 1.0, disjoint 0.0, column order irrelevant") {
    def qr(cols: Seq[String], rows: Seq[Seq[Any]]) =
      QueryResult("", cols, rows, rows.size, "")
    val a = qr(Seq("x", "y"), Seq(Seq(1, "a"), Seq(2, "b")))
    val same = qr(Seq("y", "x"), Seq(Seq("a", 1), Seq("b", 2)))
    val half = qr(Seq("x", "y"), Seq(Seq(1, "a"), Seq(9, "z")))
    val disjoint = qr(Seq("x", "y"), Seq(Seq(7, "q")))
    assert(Evaluation.resultF1(a, a) == 1.0)
    assert(Evaluation.resultF1(a, same) == 1.0)
    assert(Evaluation.resultF1(a, disjoint) == 0.0)
    assert(Evaluation.resultF1(a, half) == 0.5)
  }

  test("pilot corpus meets the reference targets offline (exec >= 80%, unsafe = 0)") {
    val report = Evaluation.run(engine, Evaluation.pilotCorpus)
    info(f"exec=${report.execSuccessRate}%.2f macroF1=${report.macroF1}%.2f medianMs=${report.medianLatencyMs}")
    report.cases.foreach(c => info(f"  f1=${c.f1}%.2f ${c.question} -> ${c.generatedSql.take(70)}"))
    // reference targets: >=80% execution success (Report 2 §2), 0 unsafe
    assert(report.execSuccessRate >= 0.8)
    // template-only path (no LLM) currently scores 1.00; the reference's
    // pilot WITH an LLM was 0.72 — keep a regression floor at 0.9
    assert(report.macroF1 >= 0.9)
    assert(report.cases.forall(_.latencyMs < 30000))
  }

  test("all safety probes are blocked (the reference pilot's 10 plus the two traversal-bypass classes)") {
    assert(Evaluation.safetyProbes.size == 12)
    assert(Evaluation.runSafetyProbes(engine) == 1.0)
  }

  test("school corpus (2nd schema): >= 30 cases across schemas, per-intent breakdown, headroom visible") {
    val schoolEngine = new Engine(spark, SchoolFixture.register(spark), SchoolFixture.fks)
    val report = Evaluation.run(schoolEngine, Evaluation.schoolCorpus)
    info(f"school exec=${report.execSuccessRate}%.2f macroF1=${report.macroF1}%.2f")
    report.byIntent.toSeq.sortBy(_._1).foreach { case (intent, s) =>
      info(f"  intent=$intent%-14s n=${s.n} exec=${s.execRate}%.2f f1=${s.macroF1}%.2f")
    }
    report.cases.filter(_.f1 < 1.0).foreach(c =>
      info(f"  headroom: f1=${c.f1}%.2f '${c.question}' -> ${c.generatedSql.take(60)}"))
    // corpus breadth: two schemas, >= 30 labeled cases total
    assert(Evaluation.pilotCorpus.size + Evaluation.schoolCorpus.size >= 30)
    assert(report.byIntent.keySet.size >= 7, report.byIntent.keySet)
    // the demo-script surface must be answered correctly (round 4 adds
    // BETWEEN / OR→IN / HAVING, round 4b adds LIKE-prefix / anti-join
    // count / nth-distinct-value to the held list)...
    for (intent <- Seq("filter_and", "filter_count", "agg_topn", "join", "join_agg",
        "groupby_agg", "filter_between", "filter_or", "having",
        "filter_like", "anti_join", "nth_value",
        "join3_filter", "nested_having_count", "agg_of_agg",
        "groupwise_argmax", "having_scalar", "ratio_agg",
        "correlated_filter", "percentile_agg", "bottom_n",
        "avg_count_per", "filtered_having", "having_extreme",
        "deviation_having", "range_argmax", "grouped_argmax2",
        "division", "nth_aggregate", "conditional_share",
        "trend_compare", "group_share", "co_occurrence",
        "universal_filter", "pair_cooccurrence", "self_relative",
        "attr_division", "variability_argmin", "group_self_share",
        "relative_division", "group_topk_members", "deviation_argmax",
        "monotonic_trend", "pair_argmax", "universal_self_relative",
        "join_group_argmax", "range_having", "trend_argmax",
        "division_by_example", "filtered_popularity", "argmax_attr_filter",
        "pair_argmin_agg", "agg_vs_median", "set_equality",
        "entity_argmax_attr", "trend_share", "reverse_attr_division",
        "joined_pair_argmax", "count_vs_avg_count", "joined_conditional_share",
        "joined_ratio_argmax", "universal_comparison", "filtered_median",
        "joined_distinct_argmax", "percentile_rank_filter",
        "nested_group_deviation",
        "count_vs_example", "dim_range_argmax", "universal_other_relative",
        "avg_of_range", "universal_group_agg", "trend_argmax_entity",
        "median_count_per", "universal_rank", "minimax_argmax",
        "correlation", "stddev_vs_avg", "group_self_beat_share",
        "joined_distinct_topn", "filtered_period_argmax", "topk_share",
        "argmin_attribution", "count_increasing_periods",
        "comparative_cohort_count", "trend_argmax_attr", "min_count_per",
        "share_entity_extreme", "ranked_group_share", "range_of_group_aggs",
        "self_relative_dim", "superlative_adj_argmax",
        "conjunctive_trend_count", "median_entity_argmax",
        "adjacent_period_pair", "exclusive_attr", "share_groups_lacking",
        "attr_coverage_count", "recent_k_average", "category_majority",
        "cross_group_stability_argmin", "running_period_total",
        "strict_improvement_streak", "attr_pair_argmin",
        "universal_group_self_count", "banded_share",
        "group_inner_range_argmax", "floor_over_periods",
        "avg_of_group_shares", "entity_agg_correlation",
        "cross_level_universal", "nth_trend_argmax",
        "qualifying_count_by_attr", "group_median_argmax",
        "cross_category_margin", "universal_group_trend",
        "named_entity_rank", "percent_change", "group_concentration",
        "joined_distinct_having", "period_balance_argmin",
        "category_attr_range_argmax", "max_tie_count",
        "share_personal_best", "top2_gap", "best_course_membership_share",
        "longest_improvement_streak", "universal_vs_group",
        "grouped_avg_count_per", "dept_popular_median",
        "joined_dim_range_argmax", "cohort_attr_argmin",
        "cohort_attr_aggregate", "count_trend_share",
        "distribution_balance_argmin", "max_group_range",
        "popular_membership_share", "category_share_vs_global",
        "last_period_avg", "period_agg_range_argmin",
        "named_pair_overlap_count", "group_trend_argmax",
        "filtered_division", "median_mean_gap", "cohort_relative_avg",
        "value_universal_count", "bottomk_agg_avg",
        "two_dim_attr_agg_argmin", "count_threshold_entities",
        "median_of_group_aggs", "named_neighbor_entities",
        "fact_distribution_balance", "near_group_avg_share",
        "max_period_gap", "avg_period_span", "freq_rank_nth",
        "joined_cond_share_argmax", "avg_rank_of_subset",
        "unique_value_count", "skewness_argmax", "harmonic_mean_groups",
        "joined_distinct_exact", "period_distinct_argmax",
        "trend_rank_list", "nth_entity_attr", "filtered_anti_count",
        "group_count_balance_argmin", "pair_overlap_argmax",
        "cumulative_distinct", "distribution_pct", "avg_rank_spacing",
        "named_value_self_relative", "yoy_median_change",
        "quartile_cohort_count", "trimmed_mean", "filtered_mode",
        "iqr", "median_exceeds_mean_share", "direction_changes",
        "variance_explained", "rank_set_difference",
        "weighted_group_median", "gini_enrollment",
        "subset_containment_count", "universal_threshold_count",
        "category_entropy", "avg_shared_membership",
        "cohort_gap_filter", "named_dominance",
        "percentile_of_group_aggs", "above_median_count",
        "profile_similarity_argmin", "top_decile_threshold",
        "rank_trend_share", "zscore_band_share", "jaccard_pair_argmax",
        "multi_top_rank_count", "hardest_course_avg",
        "universal_argmax_attr", "yoy_delta_argmax",
        "cohort_agg_range_argmax", "above_avg_multi_count",
        "dual_cohort_coverage", "course_streak_argmax",
        "extreme_same_group_share", "group_size_performance_corr",
        "qualified_attr_argmin", "consecutive_gap_avg",
        "cohort_popular_course", "floor_above_avg_count",
        "avg_distinct_per_group", "named_overlap_argmax",
        "size_filtered_avg", "cohort_sum_share", "grade_domain_span",
        "value_ratio", "best_course_distribution", "unique_argmax_count",
        "top2_count_gap", "category_self_compare", "avg_entity_share",
        "cohort_group_argmin", "all_years_improving_count",
        "avg_avg_group_size", "disjoint_pair_count",
        "self_band_universal", "named_group_avg_rank",
        "exclusive_value_count", "cohort_share_argmax",
        "first_period_count", "enrollment_trend_argmax",
        "floor_threshold_share", "dept_median_enrollment",
        "popularity_extremes_gap", "cohort_count_compare_count",
        "avg_entity_median", "near_max_membership_count",
        "top2_gap_mode", "avg_group_attr_max",
        "full_coverage_period_count", "above_avg_count_argmax",
        "avg_max_median_gap", "period_entropy_argmax",
        "division_with_negation", "iqr_trimmed_entity_mean",
        "cohort_avg_membership", "argmax_entity_distinct_count",
        "max_cell_range", "empty_cell_count", "entity_min_mode",
        "entity_last_period_avg", "dept_distribution_similarity",
        "cohort_topk_members", "yoy_active_delta",
        "entity_slope_argmax", "dept_top_student_share",
        "dual_extreme_holders", "attr_top2_margin_argmax",
        "trend_threshold_entities", "group_extreme_period_share",
        "rank_proximity_pairs", "avg_pairwise_corr",
        "period_trend_argmax_list", "overage_total",
        "timed_pair_argmax", "attr_value_peak_period",
        "sole_cohort_rep", "trimmed_range", "modal_cohort_share",
        "avg_pairwise_gap", "cross_rank_universal", "entity_sum_gini",
        "twohop_diversity_argmax", "group_iqr_band_share",
        "band_membership_argmax", "period_cohort_share_list",
        "ranked_agg_max_gap", "course_subset_count",
        "period_pair_overlap_argmax", "removal_impact_count",
        "group_entropy_argmax", "value_run_length",
        "best_dept_distribution", "conditional_cohort_prob",
        "cohort_jaccard_avg", "value_attr_range_argmax",
        "cross_cohort_avg_overlap", "group_cv_argmax",
        "exact_overlap_pair_count", "best_matches_popular_share",
        "pareto_count", "median_attr_range", "nearest_avg_attr"))
      assert(report.byIntent(intent).macroF1 == 1.0, s"$intent regressed: ${report.byIntent(intent)}")
    // ...while the deliberate-headroom cases keep the metric unsaturated
    assert(report.macroF1 < 1.0, "corpus saturated - add harder cases")
    // the engine must answer everything (always-answer envelope) even
    // where generation is imperfect...
    assert(report.execSuccessRate >= 0.8)
    // ...and the simple intents must stay correct
    for (intent <- Seq("count", "distinct", "minmax"))
      assert(report.byIntent(intent).macroF1 == 1.0, s"$intent regressed: ${report.byIntent(intent)}")
    // safety holds on the second schema too
    assert(Evaluation.runSafetyProbes(schoolEngine) == 1.0)
  }

  test("distributed F1 agrees with the driver-side F1 and scales without collect") {
    graft.sources.Sources.register(spark, sfDir)
    val a = spark.table("customer").select("c_custkey", "c_mktsegment")
    val b = spark.table("customer").select("c_mktsegment", "c_custkey") // column order differs
    assert(Evaluation.distributedF1(a, b) == 1.0)
    val half = spark.table("customer").where(org.apache.spark.sql.functions.col("c_custkey") % 2 === 0)
      .select("c_custkey", "c_mktsegment")
    val f1 = Evaluation.distributedF1(a, half)
    val expected = { val na = a.count().toDouble; val nb = half.count().toDouble
      2 * nb / (na + nb) } // subset: precision nb/nb=1... inter=nb, p=nb/na? no: p=inter/na, r=inter/nb=1
    assert(math.abs(f1 - expected) < 1e-9)
    // mismatched schemas are rejected loudly
    intercept[IllegalArgumentException] {
      Evaluation.distributedF1(a, spark.table("orders").select("o_orderkey", "o_orderstatus"))
    }
  }
}
