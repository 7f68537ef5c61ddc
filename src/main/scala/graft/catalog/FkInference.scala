package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.FkEdge

/**
 * Data-driven FK inference via Theta-sketch containment — the catalog
 * complement to the metadata crawl ([[Profiler.crawl]] /
 * `sources/Jdbc.scala` `DatabaseMetaData` edges, mirroring the
 * reference's crawler `app/schema/crawler.py:116-139`): when a source
 * exposes NO declared constraints (parquet lakes never do), candidate
 * FK edges are inferred from the data itself.
 *
 * The 100 TB shape: testing "child ⊆ parent" by joining every key-column
 * pair is quadratic in tables and rescans the corpus per pair. Instead,
 * ONE pass per table builds a Theta sketch per key-ish column
 * (`theta_sketch_agg` — partial+final ObjectHashAggregate, sketch bytes
 * on the shuffle); all pairwise set algebra then runs on the sketch
 * rows — kilobytes per column, independent of corpus size. Theta
 * sketches (unlike HLL) support intersection, which is exactly the
 * containment numerator.
 *
 * An edge (child → parent) is emitted when
 *  - containment: est|child ∩ parent| / est|child| ≥ `minContainment`
 *    (every child value appears among parent values), and
 *  - key-ness: est|parent distinct| ≥ `minParentUnique` · parent rows
 *    (the parent column is unique enough to be a key — this is what
 *    rejects the REVERSED direction of a real FK, whose "parent" side
 *    is the many side).
 *
 * Sketch estimates are exact below the sketch's nominal entries (4096)
 * and ~±2% above, so thresholds at 0.95 are robust; emitted edges are
 * CANDIDATES for the catalog to confirm (value-range coincidences — two
 * unrelated 0-based id spaces — legitimately pass containment; the
 * reference's crawler has the same property for name-based guesses).
 */
object FkInference {

  /** Columns considered join-key candidates: id/key-named. */
  private[catalog] def keyishCols(df: DataFrame): Seq[String] =
    df.columns.filter { c =>
      val l = c.toLowerCase
      l == "id" || l.endsWith("_id") || l.endsWith("key")
    }.toSeq

  /**
   * One pass per table: a Theta sketch + row count per key-ish column,
   * unpivoted to (table, column, n_rows, theta) rows. The per-table
   * frames are tiny (one row before unpivot) and union into the
   * cross-table candidate pool.
   */
  def columnSketches(spark: SparkSession, tables: Seq[String]): DataFrame = {
    val perTable = tables.flatMap { t =>
      val df = spark.table(t)
      val cols = keyishCols(df)
      if (cols.isEmpty) None
      else {
        val aggs = count(lit(1)).as("__n") +:
          cols.map(c => theta_sketch_agg(col(c).cast("string")).as(s"__t_$c"))
        val one = df.agg(aggs.head, aggs.tail: _*)
        val unpivoted = cols.map(c => one.select(
          lit(t).as("table"), lit(c).as("column"), col("__n").as("n_rows"),
          col(s"__t_$c").as("theta")))
        Some(unpivoted.reduce(_ unionAll _))
      }
    }
    perTable.reduce(_ unionAll _)
  }

  /**
   * All candidate edges between DIFFERENT tables, with containment and
   * parent-uniqueness scores: a self-join of the sketch rows (columns²
   * rows of kilobyte sketches — trivially small) with the set algebra
   * in native theta expressions.
   */
  def candidateEdges(sketches: DataFrame): DataFrame = {
    val child = sketches.select(col("table").as("child_table"),
      col("column").as("child_column"), col("theta").as("__tc"))
    val parent = sketches.select(col("table").as("parent_table"),
      col("column").as("parent_column"), col("n_rows").as("__pn"),
      col("theta").as("__tp"))
    child.crossJoin(parent)
      .where(col("child_table") =!= col("parent_table"))
      .select(col("child_table"), col("child_column"),
        col("parent_table"), col("parent_column"),
        (theta_sketch_estimate(theta_intersection(col("__tc"), col("__tp"))).cast("double") /
          greatest(theta_sketch_estimate(col("__tc")).cast("double"), lit(1.0)))
          .as("containment"),
        (theta_sketch_estimate(col("__tp")).cast("double") /
          greatest(col("__pn").cast("double"), lit(1.0)))
          .as("parent_unique_ratio"))
  }

  /** Thresholded inference: [[candidateEdges]] filtered to plausible
    * FK edges, as catalog [[FkEdge]]s (driver-side: columns² candidates,
    * already far below any collect guard). */
  def inferFks(spark: SparkSession, tables: Seq[String],
      minContainment: Double = 0.95,
      minParentUnique: Double = 0.95): Seq[(FkEdge, Double)] =
    candidateEdges(columnSketches(spark, tables))
      .where(col("containment") >= minContainment &&
        col("parent_unique_ratio") >= minParentUnique)
      .orderBy(col("child_table"), col("child_column"),
        col("parent_table"), col("parent_column"))
      .collect()
      .map(r => (FkEdge(r.getString(0), r.getString(1), r.getString(2), r.getString(3)),
        r.getDouble(4)))
      .toSeq
}
