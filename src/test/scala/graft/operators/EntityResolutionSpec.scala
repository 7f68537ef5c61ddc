package graft.operators

import graft.SparkSpec
import graft.functions.JaroWinklerSimilarity.{jaro, jaroWinkler}
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("Jaro-Winkler matches the published constants and DuckDB's conventions") {
    assert(math.abs(jaroWinkler("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jaroWinkler("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jaroWinkler("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-12)
    assert(math.abs(jaroWinkler("duane", "dwayne") - 0.84) < 1e-12)
    // boost threshold: no prefix bonus at jaro <= 0.7 (DuckDB semantics)
    assert(jaroWinkler("abcdefgh", "abzzzzzz") == jaro("abcdefgh", "abzzzzzz"))
    // empty-string conventions: 0 even for empty==empty (DuckDB semantics)
    assert(jaroWinkler("", "") == 0.0)
    assert(jaroWinkler("abc", "") == 0.0)
    assert(jaroWinkler("same", "same") == 1.0)
    // window of 0: adjacent transposition with no in-window match
    assert(jaro("ab", "ba") == 0.0)
  }

  test("the expression scores pairs inside the plan (no ScalaUDF) and handles nulls") {
    val df = Seq(("martha", Option("marhta")), ("x", Option.empty[String]))
      .toDF("a", "b")
      .select(graft.functions.jaro_winkler(col("a"), col("b")).as("sim"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(rows(1).isNullAt(0))
    assert(!df.queryExecution.executedPlan.toString.contains("ScalaUDF"))
  }

  test("resolve links perturbed records to their source and ranks the true match first") {
    val left = Seq((1L, "lavender chiffon"), (2L, "goldenrod spring"),
      (3L, "midnight azure")).toDF("id", "name")
    // perturbed copies (vowels dropped here and there) + one unrelated
    val right = Seq((11L, "lavendr chiffon"), (12L, "goldnrod spring"),
      (13L, "midnght azure"), (14L, "zzz totally different")).toDF("id", "name")
    val got = EntityResolution.resolve(left, "id", "name", right, "id", "name",
      threshold = 0.9, topPerLeft = 1)
      .select("l_id", "r_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 11L, 2L -> 12L, 3L -> 13L), got.toString)
  }

  test("oversized blocks are dropped on both sides (bounded worst case), smaller blocks survive") {
    val left = ((1 to 50).map(i => (i.toLong, s"aa common $i")) :+
      (99L, "unique name")).toDF("id", "name")
    val right = ((1 to 50).map(i => (1000L + i, s"aa common $i")) :+
      (999L, "unique name")).toDF("id", "name")
    val pairs = EntityResolution.candidatePairs(left, "id", "name",
      right, "id", "name", maxBlockSize = 10)
    // the 50-member 'aa' block is dropped entirely; the 'un' block stays
    assert(pairs.count() == 1)
    assert(pairs.select("l_id", "r_id").as[(Long, Long)].collect().head == ((99L, 999L)))
  }

  test("candidate generation is a blocked equi-join — never cartesian; ranking windows per left id") {
    val left = (1L to 200L).map(i => (i, s"name $i")).toDF("id", "name")
    val right = (1L to 200L).map(i => (i + 1000, s"name $i")).toDF("id", "name")
    val df = EntityResolution.resolve(left, "id", "name", right, "id", "name",
      threshold = 0.8, topPerLeft = 2)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    assert(p.contains("Window"), p.take(2000))
    // every left record keeps at most topPerLeft matches
    val maxPerLeft = df.groupBy("l_id").count().agg(max("count")).head().getLong(0)
    assert(maxPerLeft <= 2)
  }
}
