package graft.safety

import graft.SparkSpec

/**
 * Grammar-driven parse-surface fuzzer (round-16 verdict #2): three
 * hand-picked adversarial waves (r14 `InsertIntoDir`/`EXECUTE
 * IMMEDIATE`, r15 `IDENTIFIER()`/`reflect`, r16 parameter markers/TVFs)
 * each found REAL validator escapes, so hand-picking is demonstrably
 * not exhausting the space. This spec ENUMERATES it instead: every
 * side-effecting/non-SELECT core from the waves' seed families, pushed
 * through compositions of the Spark-4 grammar productions an attacker
 * can wrap a statement in (comments, case, whitespace, hints, CTEs,
 * `EXECUTE IMMEDIATE` quoting incl. nested, `BEGIN…END` scripting,
 * `EXPLAIN`, trailing-statement smuggling, subquery/LATERAL/UNION/pipe
 * embedding, `VALUES` relations and lambda bodies as expression
 * carriers) — ≥5k generated statements, every one asserted DENIED.
 *
 * Denial layers:
 *  - layer 1 (always): [[Validator.validate]] must return Left —
 *    a `ParseError` counts (an unparseable mutation cannot run);
 *  - layer 2 (write/command/reflection seeds): when the statement
 *    ANALYZES (tables resolve, no parse failure), the resolved-plan
 *    scan [[graft.plans.ReadOnlyGuard.firstOffenseDeep]] must flag it
 *    too — the r15 `try_reflect` lesson: the name denylist alone is a
 *    list to chase, the resolved-expression layer is the backstop.
 *    Layer 2 is asserted only for the families it CLAIMS (Commands,
 *    InsertIntoDir, JVM reflection); allow-list and substitution-hole
 *    families (forbidden tables, markers, IDENTIFIER, TVFs) are layer-1
 *    checks by design.
 *
 * Everything is DETERMINISTIC (no RNG): the statement set is a pure
 * enumeration, so a failure names a reproducible statement and the
 * count never drifts between runs.
 */
class ParseSurfaceFuzzSpec extends SparkSpec {

  private val allowed =
    Set("customer", "orders", "lineitem", "part", "supplier", "nation", "region")

  /** Seed = (core statement, layer-2 family?). Layer-2 families are the
    * ones ReadOnlyGuard claims: writes/commands (resolve to `Command` /
    * `InsertIntoDir` nodes) and JVM reflection (resolves to
    * `CallMethodViaReflection`). */
  private final case class Seed(sql: String, guard2: Boolean)

  private val writeSeeds = Seq(
    "DROP TABLE customer",
    "DELETE FROM orders WHERE o_orderkey = 1",
    "UPDATE customer SET c_acctbal = 0",
    "INSERT INTO orders VALUES (1)",
    "INSERT OVERWRITE DIRECTORY '/tmp/exfil' SELECT * FROM customer",
    "CREATE TABLE evil (x INT)",
    "CREATE OR REPLACE VIEW v AS SELECT * FROM customer",
    "CREATE TEMPORARY VIEW v AS SELECT * FROM customer",
    "ALTER TABLE customer ADD COLUMN hacked INT",
    "TRUNCATE TABLE lineitem",
    "MERGE INTO customer USING orders ON c_custkey = o_custkey WHEN MATCHED THEN DELETE",
    "DROP VIEW customer",
    "CREATE FUNCTION f AS 'evil.Cls'",
    "CREATE DATABASE evil"
  ).map(Seed(_, guard2 = true))

  private val commandSeeds = Seq(
    "SET spark.sql.shuffle.partitions=1",
    "SET VAR gv = 'supplier'",
    "DECLARE VARIABLE gv STRING DEFAULT 'supplier'",
    "CACHE TABLE t AS SELECT * FROM customer",
    "UNCACHE TABLE customer",
    "ADD JAR 'file:///tmp/evil.jar'",
    "ADD FILE '/etc/passwd'",
    "LIST JAR",
    "REFRESH TABLE customer",
    "ANALYZE TABLE customer COMPUTE STATISTICS",
    "MSCK REPAIR TABLE customer",
    "SHOW TABLES",
    "DESCRIBE TABLE customer",
    "USE somedb",
    "RESET"
  ).map(Seed(_, guard2 = true))

  private val reflectionSeeds = Seq(
    "SELECT reflect('java.lang.System', 'getenv', 'HOME') AS v FROM nation LIMIT 1",
    "SELECT try_reflect('java.lang.System', 'getenv', 'PATH') AS v FROM nation LIMIT 1",
    "SELECT java_method('java.lang.System', 'getProperty', 'user.dir') AS v FROM nation LIMIT 1",
    // expression-carrier productions: VALUES relation and lambda body
    "SELECT * FROM VALUES (reflect('java.lang.System', 'getenv', 'X')) AS t(a)",
    "SELECT transform(array('HOME'), x -> reflect('java.lang.System', 'getenv', x)) AS v FROM nation LIMIT 1",
    "SELECT filter(array(1), x -> x > length(reflect('java.lang.System', 'getenv', 'X'))) AS v FROM nation LIMIT 1"
  ).map(Seed(_, guard2 = true))

  private val substitutionSeeds = Seq(
    // dynamic names, markers, unknown TVFs, file relations, forbidden
    // and impersonated tables — layer-1 (allow-list / class-denial)
    // families by design
    "SELECT * FROM IDENTIFIER('sup' || 'plier') LIMIT 5",
    "SELECT IDENTIFIER('c_name') FROM customer LIMIT 5",
    "SELECT :p AS v FROM nation LIMIT 1",
    "SELECT ? AS v FROM nation LIMIT 1",
    "SELECT * FROM VALUES (:p) AS t(a)",
    "SELECT filter(array(1), x -> x > :p) AS v FROM nation LIMIT 1",
    "SELECT * FROM sql_keywords() LIMIT 5",
    "SELECT * FROM some_tvf(TABLE(customer)) LIMIT 5",
    "SELECT * FROM text.`/etc/passwd` LIMIT 3",
    "SELECT * FROM secret_tbl LIMIT 5",
    "SELECT * FROM spark_catalog.default.customer LIMIT 5"
  ).map(Seed(_, guard2 = false))

  private val seeds = writeSeeds ++ commandSeeds ++ reflectionSeeds ++ substitutionSeeds

  /** Mutators = grammar productions. `selectOnly` productions need a
    * query-shaped core (embedding a bare `DROP` in a subquery is just a
    * parse error — still asserted denied, but the interesting
    * composition is smuggling query-shaped escapes through relation
    * positions). Every mutator must PRESERVE the statement's
    * side-effecting/escaping nature — none may reduce a seed to a
    * benign read. */
  private final case class Mut(name: String, selectOnly: Boolean,
      apply: String => String)

  private def q(sql: String): String = sql.replace("'", "''")

  private val mutators = Seq(
    Mut("block-comment", selectOnly = false, s => s"/* audit ok */ $s"),
    Mut("trail-comment", selectOnly = false, s => s"$s -- reviewed"),
    Mut("inline-comment", selectOnly = false, s => s.replaceFirst(" ", " /*x*/ ")),
    Mut("upper-case", selectOnly = false, _.toUpperCase),
    Mut("lower-case", selectOnly = false, _.toLowerCase),
    Mut("newline-ws", selectOnly = false, _.replace(" ", "\n")),
    Mut("tab-ws", selectOnly = false, _.replace(" ", "\t ")),
    Mut("trailing-smuggle", selectOnly = false, s => s"SELECT 1; $s"),
    Mut("lead-smuggle", selectOnly = false, s => s"$s; SELECT 1"),
    Mut("cte-wrap", selectOnly = false, s => s"WITH d AS ($s) SELECT 1"),
    Mut("execute-immediate", selectOnly = false,
      s => s"EXECUTE IMMEDIATE '${q(s)}'"),
    Mut("execute-immediate-nested", selectOnly = false,
      s => s"EXECUTE IMMEDIATE '${q(s"EXECUTE IMMEDIATE '${q(s)}'")}'"),
    Mut("begin-end", selectOnly = false, s => s"BEGIN $s; END"),
    Mut("explain-wrap", selectOnly = false, s => s"EXPLAIN $s"),
    Mut("hint-inject", selectOnly = true,
      _.replaceFirst("(?i)^SELECT ", "SELECT /*+ REPARTITION(2) */ ")),
    Mut("subquery-embed", selectOnly = true,
      s => s"SELECT c_name FROM customer WHERE c_custkey IN ($s)"),
    Mut("scalar-embed", selectOnly = true,
      s => s"SELECT c_name FROM customer WHERE c_name = ($s)"),
    Mut("exists-embed", selectOnly = true,
      s => s"SELECT c_name FROM customer WHERE EXISTS ($s)"),
    Mut("lateral-embed", selectOnly = true,
      s => s"SELECT * FROM nation, LATERAL ($s)"),
    Mut("union-embed", selectOnly = true,
      s => s"($s) UNION ALL ($s)"),
    Mut("pipe-embed", selectOnly = true,
      s => s"FROM customer |> WHERE EXISTS ($s) |> SELECT c_name"),
    Mut("cte-select-wrap", selectOnly = true,
      s => s"WITH g AS ($s) SELECT * FROM g"),
    // round-18 unicode-obfuscation wave: whitespace look-alikes
    // (NBSP, ideographic space), zero-width injection into the lead
    // keyword, and backtick-quoting of the referenced identifiers.
    // Either the lexer rejects the statement (ParseError = denied) or
    // it normalizes to the same statement (denied by the original
    // class/allow-list check) — a mutant surviving BOTH ways would be
    // a real lexer-level bypass
    Mut("nbsp-ws", selectOnly = false, _.replace(" ", " ")),
    Mut("ideographic-ws", selectOnly = false, _.replace(" ", "　 ")),
    Mut("zwsp-keyword", selectOnly = false, s => s.patch(2, "​", 0)),
    Mut("backtick-idents", selectOnly = false,
      _.replaceAll(raw"\b(customer|orders|lineitem|supplier|secret_tbl)\b", "`$1`"))
  )

  private def isSelectShaped(sql: String): Boolean =
    sql.toUpperCase.startsWith("SELECT")

  /** The full deterministic enumeration: every seed × every applicable
    * single production × every applicable ordered production PAIR. */
  private lazy val statements: Seq[(String, Seed, String)] = {
    def applicable(s: String) = mutators.filter(m => !m.selectOnly || isSelectShaped(s))
    seeds.flatMap { seed =>
      val singles = applicable(seed.sql).map(m =>
        (m.name, seed, m.apply(seed.sql)))
      val pairs = for {
        m1 <- applicable(seed.sql)
        once = m1.apply(seed.sql)
        m2 <- applicable(once)
        if m2.name != m1.name
      } yield (s"${m1.name}+${m2.name}", seed, m2.apply(once))
      (("identity", seed, seed.sql) +: singles) ++ pairs
    }
  }

  test("fuzz corpus is at least 5k statements (the verdict's bar)") {
    info(s"fuzz corpus: ${statements.size} deterministic statements")
    assert(statements.size >= 5000, s"only ${statements.size} generated")
  }

  test("layer 1: every fuzzed side-effecting/escaping statement is denied") {
    val passed = statements.filter { case (_, _, sql) =>
      Validator.validate(spark, sql, allowed).isRight
    }
    assert(passed.isEmpty,
      s"${passed.size} fuzzed statements PASSED validation, e.g.:\n" +
        passed.take(5).map { case (prod, seed, sql) =>
          s"  [$prod] seed='${seed.sql.take(60)}' sql='${sql.take(160)}'"
        }.mkString("\n"))
  }

  test("layer 2: analyzable write/command/reflection mutants are flagged on the resolved plan") {
    // fixture views so relations resolve. CRITICAL split (the finding
    // this fuzzer's first run produced): EXECUTE IMMEDIATE and SQL
    // scripting EXECUTE their payload during analysis — the probe
    // watched `.analyzed` change a session conf and attempt an ADD JAR
    // — so those are asserted on the PARSED plan (the only pre-damage
    // surface, now also what ReadOnlyParserGuard denies) and are never
    // analyzed here. Everything else analyzes lazily (QueryExecution
    // .analyzed does not execute plain Commands) and must be flagged on
    // the resolved plan.
    graft.sources.Sources.register(spark, sfDir)
    def analysisExecutes(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      plan.collectFirst {
        case _: org.apache.spark.sql.catalyst.analysis.UnresolvedExecuteImmediate => true
        case _: org.apache.spark.sql.catalyst.plans.logical.CompoundBody => true
      }.nonEmpty
    var analyzed = 0
    var parseFlagged = 0
    val missed = statements.filter(_._2.guard2).flatMap { case (prod, seed, sql) =>
      val parsedOpt =
        try Some(spark.sessionState.sqlParser.parsePlan(sql))
        catch { case scala.util.control.NonFatal(_) => None } // unparseable: layer 1 already denied it
      parsedOpt.flatMap { parsed =>
        if (analysisExecutes(parsed)) {
          parseFlagged += 1
          if (graft.plans.ReadOnlyGuard.firstOffenseDeep(parsed).isEmpty)
            Some((prod, seed, sql)) else None
        } else {
          val resolvedOpt =
            try Some(spark.sessionState.executePlan(parsed).analyzed)
            catch { case scala.util.control.NonFatal(_) => None } // unresolvable: cannot run
          resolvedOpt.flatMap { plan =>
            analyzed += 1
            if (graft.plans.ReadOnlyGuard.firstOffenseDeep(plan).isEmpty)
              Some((prod, seed, sql))
            else None
          }
        }
      }
    }
    assert(missed.isEmpty,
      s"${missed.size} analyzable mutants NOT flagged by the resolved-plan guard, e.g.:\n" +
        missed.take(5).map { case (prod, seed, sql) =>
          s"  [$prod] seed='${seed.sql.take(60)}' sql='${sql.take(160)}'"
        }.mkString("\n"))
    // neither branch of the layer-2 assertion may be vacuous
    assert(analyzed >= 500, s"only $analyzed mutants analyzed — layer-2 pass is vacuous")
    assert(parseFlagged >= 100,
      s"only $parseFlagged analysis-executing mutants seen — the EXECUTE IMMEDIATE/scripting branch is vacuous")
  }

  test("entry-point wave: no alternate parser entry reaches analysis with an analysis-executing node") {
    // Round-18 wave (r17 verdict #6): ParseSurfaceFuzzSpec proved
    // parsePlan is guarded; this wave pins the OTHER public parser
    // entries (parseQuery, parseExpression) and nested occurrences.
    // For every analysis-executing mutant in the corpus (EXECUTE
    // IMMEDIATE / BEGIN…END in any composition), each entry must
    // either REJECT it at the grammar or return a tree with no
    // analysis-executing node — there is no third outcome in which an
    // unguarded tree reaches the analyzer.
    val parser = spark.sessionState.sqlParser
    def analysisExecutes(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      plan.collectFirst {
        case _: org.apache.spark.sql.catalyst.analysis.UnresolvedExecuteImmediate => true
        case _: org.apache.spark.sql.catalyst.plans.logical.CompoundBody => true
      }.nonEmpty
    val execish = statements.filter { case (prod, _, sql) =>
      prod.contains("execute-immediate") || prod.contains("begin-end") ||
        sql.toUpperCase.contains("EXECUTE IMMEDIATE") || sql.toUpperCase.startsWith("BEGIN")
    }
    assert(execish.size >= 1000, s"only ${execish.size} analysis-executing mutants — wave is vacuous")
    var rejected = 0
    var cleanTrees = 0
    val leaked = execish.flatMap { case (prod, seed, sql) =>
      Seq("parseQuery" -> (() => parser.parseQuery(sql)),
        "parseExpression" -> (() => parser.parseExpression(s"EXISTS ($sql)").asInstanceOf[Any])
      ).flatMap { case (entry, f) =>
        try {
          f() match {
            case p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =>
              if (analysisExecutes(p)) Some((entry, prod, seed, sql))
              else { cleanTrees += 1; None }
            case e: org.apache.spark.sql.catalyst.expressions.Expression =>
              val bad = e.collectFirst {
                case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression
                  if analysisExecutes(s.plan) => true
              }.nonEmpty
              if (bad) Some((entry, prod, seed, sql)) else { cleanTrees += 1; None }
            case _ => None
          }
        } catch { case scala.util.control.NonFatal(_) => rejected += 1; None }
      }
    }
    info(s"entry-point wave: ${execish.size} mutants × 2 entries — $rejected grammar-rejected, $cleanTrees clean trees, ${leaked.size} leaked")
    assert(leaked.isEmpty,
      s"${leaked.size} analysis-executing trees reached an alternate parser entry, e.g.:\n" +
        leaked.take(5).map { case (entry, prod, seed, sql) =>
          s"  [$entry/$prod] seed='${seed.sql.take(50)}' sql='${sql.take(140)}'"
        }.mkString("\n"))
    assert(rejected >= 1000, s"only $rejected grammar rejections — the negative branch is vacuous")
  }

  test("nested carriers: the parse guard denies analysis-executing nodes BELOW the root, at every guarded entry") {
    // `BEGIN EXECUTE IMMEDIATE '…'; END` roots at CompoundBody with the
    // UnresolvedExecuteImmediate a child SingleStatement — a top-level
    // node match happens to catch the root, but the guard must deny on
    // the NESTED node too (deep scan), so a future grammar production
    // re-rooting these constructs cannot reopen the seam.
    spark.conf.set("spark.graft.readOnly", "true")
    try {
      Seq(
        "BEGIN EXECUTE IMMEDIATE 'SET spark.sql.shuffle.partitions=13'; END",
        "BEGIN BEGIN SET spark.sql.shuffle.partitions=13; END; END",
        "EXECUTE IMMEDIATE 'EXECUTE IMMEDIATE ''SET spark.sql.shuffle.partitions=13'''",
        "BEGIN SELECT 1; EXECUTE IMMEDIATE 'ADD JAR ''/tmp/evil.jar'''; END"
      ).foreach { sql =>
        val e = intercept[Exception](spark.sessionState.sqlParser.parsePlan(sql))
        assert(e.getMessage.contains("read-only session"), s"$sql → ${e.getMessage.take(150)}")
      }
      // nesting INSIDE query positions is a grammar error at every
      // entry — pinned so a Spark upgrade that starts accepting them
      // fails loudly here instead of silently widening the surface
      Seq(
        "WITH d AS (EXECUTE IMMEDIATE 'SELECT 1') SELECT 1",
        "SELECT * FROM (EXECUTE IMMEDIATE 'SELECT 1')",
        "SELECT (EXECUTE IMMEDIATE 'SELECT 1') AS v",
        "SELECT 1 WHERE EXISTS (BEGIN SELECT 1; END)"
      ).foreach { sql =>
        intercept[Exception](spark.sessionState.sqlParser.parsePlan(sql))
        intercept[Exception](spark.sessionState.sqlParser.parseQuery(sql))
      }
    } finally spark.conf.unset("spark.graft.readOnly")
  }

  test("read-only session denies EXECUTE IMMEDIATE and scripting AT PARSE — before analysis can execute the payload") {
    // the hole the fuzzer found: with only the analyzer check rule, this
    // statement's SET had already executed by the time the rule fired
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.graft.readOnly", "true")
    try {
      Seq(
        "EXECUTE IMMEDIATE 'SET spark.sql.shuffle.partitions=13'",
        "EXECUTE IMMEDIATE 'ADD JAR \\'/tmp/nonexistent_evil.jar\\''",
        "BEGIN SET spark.sql.shuffle.partitions=13; END",
        "BEGIN SELECT 1; END"
      ).foreach { sql =>
        val e = intercept[Exception](spark.sql(sql))
        assert(e.getMessage.contains("read-only session"), s"$sql → ${e.getMessage.take(150)}")
      }
      assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
        "payload executed before the guard fired — the parse-time layer is not engaged")
    } finally spark.conf.unset("spark.graft.readOnly")
  }
}
