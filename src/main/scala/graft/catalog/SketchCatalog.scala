package graft.catalog

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/**
 * Approx-tolerant query serving from mergeable sketch indexes: the
 * round-9 sketch block (`operators/Sketches.scala`) built HLL/KLL
 * indexes as operators; this catalog ROUTES engine questions to them.
 *
 * The reference has no approximate path — every distinct count is an
 * exact scan (`app/schema/crawler.py:244-246`) and every NL question
 * re-reads the corpus (`app/models/inference.py:151-213`). At 100 TB
 * that is the wrong trade for "roughly how many distinct users":
 * the index is built in ONE corpus pass (partial sketches merge
 * map-side, only sketch bytes cross the shuffle), persisted at
 * |partition keys| × ~KB, and every question after that merges a few
 * thousand sketch rows — corpus-size-independent (the round-9 scaling
 * probe measured exponent ≤ 0.05 for sketch rollups).
 *
 * Routing contract (mirrors the template layer's no-fabrication bar):
 * an APPROXIMATE route is served ONLY when (a) the question carries an
 * explicit approximation marker ("roughly", "approximately", "about",
 * "ballpark") — exact questions never silently degrade to estimates —
 * and (b) exactly ONE registered index matches the value word, and the
 * optional "per G" word resolves to one of that index's partition
 * columns. The stream-DRIFT route needs no marker (its answer is exact
 * over the folded state) but must name exactly one registered monitor.
 * Anything else returns None and the engine's exact generation path
 * proceeds unchanged (V14 always-answer).
 *
 * Accuracy carried by the index (enforced end-to-end by the
 * `x_serve_distinct` / `x_serve_quantile` oracle rows): HLL lgK=12 →
 * ±5% contract on distinct counts; KLL k=200 → ±3 rank-point contract
 * on quantiles.
 */
final class SketchCatalog(spark: SparkSession) {

  /** A registered sketch index: the sketch frame is persisted and
    * materialized at registration (the one corpus pass), so every
    * routed query plans over the in-memory index relation only. */
  final case class Entry(table: String, valueCol: String,
      partCols: Seq[String], index: DataFrame)

  private val hll = TrieMap.empty[(String, String), Entry]
  private val kll = TrieMap.empty[(String, String), Entry]

  /** A cohort (Theta) index: one sketch per cohort value, so set
    * algebra (intersection/union/difference) between cohorts answers
    * "did both A and B" without a corpus self-join. `keys` caches the
    * cohort domain (|cohorts| strings, read once from the index) for
    * the routing no-fabrication check: a question naming a cohort the
    * index doesn't carry is never served. */
  final case class CohortEntry(table: String, cohortCol: String,
      valueCol: String, index: DataFrame, keys: Set[String])

  private val theta = TrieMap.empty[(String, String), CohortEntry]
  private val cms = TrieMap.empty[(String, String), Entry]

  /** A registered streaming vocabulary-drift monitor
    * ([[graft.streaming.Streams.VocabDriftMaintainer]]): the fixed
    * reference corpus is reduced to its (token, count) histogram ONCE
    * at registration and persisted — every routed question then folds
    * vocab-sized frames against the maintainer's live driver state,
    * never re-scanning the reference corpus. Unlike the sketch routes
    * the answer is EXACT over the documents folded so far, so no
    * approximation marker is required — the no-fabrication bar is the
    * NAME: the question must name exactly one registered monitor. */
  final case class DriftEntry(name: String,
      maintainer: graft.streaming.Streams.VocabDriftMaintainer,
      refHist: DataFrame)

  private val drift = TrieMap.empty[String, DriftEntry]

  /** Release a replaced entry's persisted frame UNLESS any STILL-
    * REGISTERED entry shares its logical plan: Spark's cache is
    * PLAN-keyed, so a sameResult twin's persist() was a no-op on the
    * shared cache entry — unpersisting the old frame there would
    * uncache the live registration and silently turn every routed
    * answer back into a corpus pass (round-13 self-review #2). The
    * check scans ALL kinds' registries, not just the same-key
    * successor: two entries registered under DIFFERENT keys can share
    * one plan (e.g. two drift monitors over one reference frame), and
    * replacing one must not demote the other (round-13 advice). The
    * replacing entry is already in its registry when this runs, so the
    * idempotent same-key case is covered by the same scan. */
  private def releaseReplaced(oldFrame: DataFrame): Unit = {
    val oldPlan = oldFrame.queryExecution.analyzed
    val live = (hll.values ++ kll.values ++ cms.values).map(_.index) ++
      theta.values.map(_.index) ++ drift.values.map(_.refHist)
    if (!live.exists(_.queryExecution.analyzed.sameResult(oldPlan)))
      oldFrame.unpersist(blocking = false)
  }

  /** Register a live drift monitor under `name` with its fixed
    * reference corpus (one histogram pass, persisted). */
  def registerDrift(name: String,
      maintainer: graft.streaming.Streams.VocabDriftMaintainer,
      reference: DataFrame, refTextCol: String): DriftEntry = {
    val hist = graft.operators.TextAnalysis
      .vocabHist(reference, refTextCol).persist()
    hist.count() // the single reference-corpus pass happens HERE
    val e = DriftEntry(name, maintainer, hist)
    drift.put(name, e).foreach(o => releaseReplaced(o.refHist))
    e
  }

  /** Build + persist a distinct-count (HLL) index over
    * `table.valueCol`, partitioned by `partCols`. */
  def indexDistinct(table: String, valueCol: String, partCols: Seq[String],
      lgK: Int = 12): Entry = {
    val idx = Sketches.hllIndex(spark.table(table), partCols, valueCol, lgK).persist()
    idx.count() // materialize: the single corpus pass happens HERE
    val e = Entry(table, valueCol, partCols, idx)
    hll.put((table, valueCol), e).foreach(o => releaseReplaced(o.index))
    e
  }

  /** Build + persist a quantile (KLL) index over numeric
    * `table.numCol`, partitioned by `partCols`. */
  def indexQuantiles(table: String, numCol: String, partCols: Seq[String],
      k: Int = 200): Entry = {
    val idx = Sketches.kllIndex(spark.table(table), partCols, numCol, k).persist()
    idx.count()
    val e = Entry(table, numCol, partCols, idx)
    kll.put((table, numCol), e).foreach(o => releaseReplaced(o.index))
    e
  }

  /** Build + persist a frequency (Count-Min) index over
    * `table.valueCol`, partitioned by `partCols`. CMS error is
    * one-sided: estimate ≥ true count, ≤ true + ε·N at the configured
    * confidence — and a key the corpus never held estimates ≈ 0, so
    * frequency routing needs no cached key domain. */
  def indexFrequencies(table: String, valueCol: String, partCols: Seq[String],
      eps: Double = 0.001, confidence: Double = 0.99): Entry = {
    val idx = Sketches.cmsIndex(spark.table(table), partCols, valueCol,
      eps, confidence).persist()
    idx.count()
    val e = Entry(table, valueCol, partCols, idx)
    cms.put((table, valueCol), e).foreach(o => releaseReplaced(o.index))
    e
  }

  /** Build + persist a cohort (Theta) index over `table`: one sketch
    * of distinct `valueCol`s per `cohortCol` value. */
  def indexCohorts(table: String, cohortCol: String, valueCol: String): CohortEntry = {
    val idx = Sketches.thetaCohorts(spark.table(table), cohortCol, valueCol).persist()
    val keys = idx.select(col(cohortCol).cast("string")).collect().map(_.getString(0)).toSet
    val e = CohortEntry(table, cohortCol, valueCol, idx, keys)
    theta.put((table, cohortCol), e).foreach(o => releaseReplaced(o.index))
    e
  }

  /** Adopt an EXTERNALLY-built distinct-count index frame — e.g.
    * stream-maintained daily rows
    * ([[graft.streaming.Streams.distinctSketchStream]]) unioned with
    * batch history: HLL_8 union is lossless, so the adopted frame
    * serves identically to a single batch pass (StreamsSpec pins the
    * byte-compatibility). The frame must carry `partCols` + an `hll`
    * column. */
  def adoptDistinct(table: String, valueCol: String, partCols: Seq[String],
      index: DataFrame): Entry = {
    val idx = index.persist()
    idx.count()
    val e = Entry(table, valueCol, partCols, idx)
    hll.put((table, valueCol), e).foreach(o => releaseReplaced(o.index))
    e
  }

  /** [[adoptDistinct]] for a quantile (KLL) index frame (`kll` column). */
  def adoptQuantiles(table: String, valueCol: String, partCols: Seq[String],
      index: DataFrame): Entry = {
    val idx = index.persist()
    idx.count()
    val e = Entry(table, valueCol, partCols, idx)
    kll.put((table, valueCol), e).foreach(o => releaseReplaced(o.index))
    e
  }

  /** Release persisted index frames (test hygiene). */
  def clear(): Unit = {
    (hll.values ++ kll.values ++ cms.values).foreach(_.index.unpersist())
    theta.values.foreach(_.index.unpersist())
    drift.values.foreach(_.refHist.unpersist())
    hll.clear(); kll.clear(); theta.clear(); cms.clear(); drift.clear()
  }

  def registered: Seq[Entry] = (hll.values ++ kll.values ++ cms.values).toSeq

  // ------------------------------------------------------- persistence

  /** Persist every registered index as parquet (sketches are plain
    * binary columns) plus a JSON manifest — the production lifecycle:
    * BUILD at ingest (the one corpus pass), [[save]], then [[load]] in
    * any later session and serve without ever touching the corpus
    * again. Layout: `<path>/<kind>/<table>__<col>/` + `manifest.json`. */
  def save(path: String): Unit = {
    def dir(kind: String, t: String, c: String) = s"$path/$kind/${t}__$c"
    hll.values.foreach(e => e.index.write.mode("overwrite")
      .parquet(dir("hll", e.table, e.valueCol)))
    kll.values.foreach(e => e.index.write.mode("overwrite")
      .parquet(dir("kll", e.table, e.valueCol)))
    cms.values.foreach(e => e.index.write.mode("overwrite")
      .parquet(dir("cms", e.table, e.valueCol)))
    theta.values.foreach(e => e.index.write.mode("overwrite")
      .parquet(dir("theta", e.table, e.cohortCol)))
    def entryJson(kind: String, t: String, vc: String, parts: Seq[String]) =
      s"""{"kind": "$kind", "table": "$t", "col": "$vc", """ +
        s""""partCols": ${parts.map("\"" + _ + "\"").mkString("[", ",", "]")}}"""
    val entries =
      hll.values.map(e => entryJson("hll", e.table, e.valueCol, e.partCols)) ++
        kll.values.map(e => entryJson("kll", e.table, e.valueCol, e.partCols)) ++
        cms.values.map(e => entryJson("cms", e.table, e.valueCol, e.partCols)) ++
        theta.values.map(e => entryJson("theta", e.table, e.cohortCol, Seq(e.valueCol)))
    val manifest = entries.mkString("[", ",\n ", "]")
    val p = new org.apache.hadoop.fs.Path(path, "manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
  }

  /** Load a [[save]]d catalog: reads each index parquet, persists and
    * re-registers it. The manifest is engine-written (fixed shape) —
    * parsed with a small regex reader like the IVF-PQ sidecar. */
  def load(path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, "manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val entryRe = ("""\{"kind": "(\w+)", "table": "([^"]+)", "col": "([^"]+)", """ +
      """"partCols": \[([^\]]*)\]\}""").r
    entryRe.findAllMatchIn(text).foreach { m =>
      val (kind, t, c) = (m.group(1), m.group(2), m.group(3))
      val parts = m.group(4).split(',').map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSeq
      val idx = spark.read.parquet(s"$path/$kind/${t}__$c").persist()
      idx.count()
      kind match {
        // same replaced-entry release discipline as the register/adopt
        // sites (a reload must not leak the previous session's frames,
        // nor uncache a sameResult twin)
        case "hll" => hll.put((t, c), Entry(t, c, parts, idx))
          .foreach(o => releaseReplaced(o.index))
        case "kll" => kll.put((t, c), Entry(t, c, parts, idx))
          .foreach(o => releaseReplaced(o.index))
        case "cms" => cms.put((t, c), Entry(t, c, parts, idx))
          .foreach(o => releaseReplaced(o.index))
        case "theta" =>
          val keys = idx.select(col(c).cast("string")).collect()
            .map(_.getString(0)).toSet
          theta.put((t, c), CohortEntry(t, c, parts.headOption.getOrElse(""), idx, keys))
            .foreach(o => releaseReplaced(o.index))
      }
    }
  }

  // "roughly how many users did both purchase and click" — cohort
  // intersection via Theta set algebra
  private val bothRe =
    (raw"(?i)\b(?:roughly|approximately|about|approx\.?|ballpark)\s+how\s+many\s+" +
      raw"(?:distinct\s+|unique\s+)?([a-z_][a-z0-9_]*)\s+" +
      raw"(?:did|do|saw|have|had|with)\s+both\s+" +
      raw"([A-Za-z0-9_-]+)\s+and\s+([A-Za-z0-9_-]+)\b").r

  private val markerRe =
    raw"(?i)\b(?:roughly|approximately|about|approx\.?|ballpark)\b".r

  // "how different is the crawl from the reference corpus?" /
  // "how far has the crawl drifted from the reference?" — the
  // stream-drift monitor's divergence row
  private val driftRe =
    (raw"(?i)\bhow\s+(?:different|divergent|far)\s+(?:is|has)\s+" +
      raw"(?:the\s+|today's\s+|this\s+)?([a-z_][a-z0-9_]*)\b" +
      raw".*\bfrom\b").r

  // "which tokens drive the drift in the crawl?" — the attribution half
  private val driftTokensRe =
    (raw"(?i)\b(?:which|what)\s+tokens?\s+(?:drive|dominate|explain)\s+" +
      raw"(?:the\s+)?(?:drift|divergence)\s+(?:in|of|for)\s+" +
      raw"(?:the\s+|today's\s+|this\s+)?([a-z_][a-z0-9_]*)\b").r

  private def driftMatch(word: String): Option[DriftEntry] =
    // EXACT name equality, not fuzzy: the drift route is marker-less
    // (its answer is exact), so the name is the ONLY gate — a fuzzy
    // substring bar (nameScore's partialRatio scores "data" vs
    // "database" at 100) would serve a monitor for a question about an
    // unrelated entity, a confidently wrong answer on the plain ask()
    // path (round-13 self-review)
    drift.values.filter(_.name.equalsIgnoreCase(word)).toSeq match {
      case Seq(one) => Some(one) // exactly one monitor — no fabrication
      case _ => None
    }

  // "roughly how many times did purchase occur" — frequency probe
  // against the merged Count-Min sketch
  private val freqRe =
    (raw"(?i)\b(?:roughly|approximately|about|approx\.?|ballpark)\s+how\s+" +
      raw"(?:many\s+times|often)\s+(?:did|does|do|was|were|has|have)\s+" +
      raw"([A-Za-z0-9_-]+)\s+(?:occur(?:red)?|appear(?:ed)?|happen(?:ed)?)\b").r

  // "roughly how many distinct users per event_type"
  private val distinctRe =
    (raw"(?i)\b(?:roughly|approximately|about|approx\.?|ballpark)\s+how\s+many\s+" +
      raw"(?:distinct|unique|different)\s+([a-z_][a-z0-9_]*)\b" +
      raw"(?:.*?\bper\s+([a-z_][a-z0-9_]*))?").r

  // "roughly the median value per event_type",
  // "approximately the 95th percentile of value"
  private val quantileRe =
    (raw"(?i)\b(?:roughly|approximately|about|approx\.?|ballpark)\s+the\s+" +
      raw"(median|\d{1,2}(?:th|st|nd|rd)\s+percentile)\s+(?:of\s+)?" +
      raw"([a-z_][a-z0-9_]*)\b(?:.*?\bper\s+([a-z_][a-z0-9_]*))?").r

  private def strongMatch(word: String, entries: Iterable[Entry]): Option[Entry] =
    entries.filter(e => graft.link.Fuzzy.nameScore(e.valueCol, word) >= 100).toSeq match {
      case Seq(one) => Some(one) // exactly one index — the no-fabrication bar
      case _ => None
    }

  private def groupCols(e: Entry, perWord: Option[String]): Option[Seq[String]] =
    perWord match {
      case None => Some(Seq.empty)
      case Some(w) =>
        e.partCols.filter(p => graft.link.Fuzzy.nameScore(p, w) >= 100) match {
          case Seq(one) => Some(Seq(one))
          case _ => None // "per" word not covered by this index's keys
        }
    }

  /** Route an approximation-marked question to a sketch-served frame.
    * None ⇒ not approx-marked / no unambiguous index ⇒ caller falls
    * through to exact generation. The returned plan reads ONLY the
    * persisted index (asserted by EngineSpec).
    *
    * `requireMarker = false` is the EXPLICIT-API form (`Engine
    * .askApprox`): the caller's method choice IS the approximation
    * consent, so a marker-less question routes too — the index-match
    * and no-fabrication rules are unchanged. */
  def route(question: String, requireMarker: Boolean = true): Option[DataFrame] = {
    // stream-drift monitor FIRST, and independent of the approximation
    // marker: its answer is exact over the folded state (the marker
    // gate exists so exact questions never silently degrade to
    // estimates — drift questions name the monitor explicitly)
    val dTok = driftTokensRe.findFirstMatchIn(question)
    if (dTok.isDefined) {
      val served = dTok.flatMap(m => driftMatch(m.group(1)))
        .map(e => e.maintainer.topDivergentFromHist(e.refHist))
      if (served.isDefined) return served
      // an unmatched monitor name falls through to the later routes —
      // same contract as the divergence branch below (round-13 advice:
      // an early None here blocked every subsequent route)
    }
    val dDiv = driftRe.findFirstMatchIn(question)
    if (dDiv.isDefined) {
      val served = dDiv.flatMap(m => driftMatch(m.group(1)))
        .map(e => e.maintainer.divergenceFromHist(e.refHist))
      if (served.isDefined) return served
      // an unmatched name falls through to the sketch routes / exact path
    }
    if (!requireMarker && !markerRe.findFirstIn(question).isDefined)
      return route("roughly " + question, requireMarker = true)
    // cohort intersection FIRST: its phrasing also matches distinctRe's
    // prefix, and serving a global distinct estimate for a "both A and
    // B" question would be wrong — if no cohort index covers it, the
    // question falls to the exact path, never to the HLL route
    val both = bothRe.findFirstMatchIn(question)
    if (both.isDefined) return both.flatMap { m =>
      val (a, b) = (m.group(2), m.group(3))
      theta.values.filter(e =>
        graft.link.Fuzzy.nameScore(e.valueCol, m.group(1)) >= 100 &&
          e.keys.contains(a) && e.keys.contains(b)).toSeq match {
        case Seq(e) => Some(
          Sketches.thetaOverlap(e.index, e.cohortCol, a, b)
            .select(col("est_both"), col("est_either"), col("jaccard")))
        case _ => None
      }
    }
    // frequency probe: serve only when exactly ONE CMS index is
    // registered (the key is a data value, not a schema word, so index
    // choice cannot disambiguate by name — two indexes decline)
    val freq = freqRe.findFirstMatchIn(question)
    if (freq.isDefined) return freq.flatMap { m =>
      cms.values.toSeq match {
        case Seq(e) =>
          val merged = Sketches.cmsMerge(e.index, Seq.empty)
          val key = spark.createDataFrame(
            java.util.List.of(org.apache.spark.sql.Row(m.group(1))),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("key",
                org.apache.spark.sql.types.StringType))))
          Some(Sketches.cmsCounts(merged, key, "key"))
        case _ => None
      }
    }
    distinctRe.findFirstMatchIn(question).flatMap { m =>
      for {
        e <- strongMatch(m.group(1), hll.values)
        gs <- groupCols(e, Option(m.group(2)))
      } yield {
        val est = Sketches.hllEstimate(e.index, gs)
        if (gs.isEmpty) est else est.orderBy(gs.map(col): _*)
      }
    }.orElse(quantileRe.findFirstMatchIn(question).flatMap { m =>
      val prob = m.group(1).toLowerCase match {
        case "median" => 0.5
        case p => p.takeWhile(_.isDigit).toInt / 100.0
      }
      for {
        e <- strongMatch(m.group(2), kll.values)
        gs <- groupCols(e, Option(m.group(3)))
      } yield {
        val q = Sketches.kllQuantiles(e.index, gs, Seq(prob))
        if (gs.isEmpty) q else q.orderBy(gs.map(col): _*)
      }
    })
  }
}
