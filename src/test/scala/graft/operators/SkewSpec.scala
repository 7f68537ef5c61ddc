package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows, 90% on one hot key
  lazy val skewed = spark.range(10000)
    .select(when($"id" % 10 === 0, $"id" % 5).otherwise(lit(999L)).as("k"),
      ($"id" % 100).cast("double").as("v"))

  test("salted aggregate equals the plain aggregate") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum"), min("v").as("min"),
        max("v").as("max"), avg("v").as("avg"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Skew.saltedAggregate(skewed, "k", "v")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (cnt, sum, mn, mx)) =>
      val (pc, ps, pmn, pmx) = plain(k)
      assert(cnt == pc && math.abs(sum - ps) < 1e-6 && mn == pmn && mx == pmx, s"key $k")
    }
  }

  test("salted join equals the plain join") {
    val build = spark.range(1000).select($"id".as("k"), concat(lit("n"), $"id").as("name"))
      .union(Seq((999L, "hot")).toDF("k", "name"))
      .dropDuplicates("k")
    val plain = skewed.join(build, "k").count()
    val salted = Skew.saltedJoin(skewed, build, "k").count()
    assert(salted == plain)
  }

  test("skew profile surfaces the hot key") {
    val top = Skew.keySkewProfile(skewed, "k", 1).collect()(0)
    assert(top.getLong(0) == 999L)
    assert(top.getAs[Double]("share") > 0.8)
  }
}

class BucketingSpec extends SparkSpec {
  import graft.sources.Bucketing

  test("bucketed co-located join plans without a shuffle exchange") {
    graft.sources.Sources.register(spark, sfDir)
    Bucketing.writeBucketed(spark.table("orders"), "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(
      spark.table("lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 8)
    // disable broadcast so the join would otherwise shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      assert(Bucketing.joinIsShuffleFree(spark, "orders_b", "lineitem_b", "o_orderkey"))
      val n = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey").count()
      assert(n == graft.sources.Sources.table(spark, sfDir, "lineitem").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
