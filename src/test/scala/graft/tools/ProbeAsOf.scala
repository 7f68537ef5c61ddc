package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeAsOf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, "/root/testdata/sf0.001")
    // as-of join on REAL fixture data: each event attaches the latest
    // prior event value of the same user
    val ev = spark.table("events").select(col("user_id"), col("ts"), col("value"), col("event_id"))
    val prior = ev.select(col("user_id"), col("ts").as("p_ts"), col("value").as("p_value"))
    val joined = graft.operators.AsOfJoin.asOf(ev, prior, Seq("user_id"), "ts", "p_ts")
    val n = joined.count()
    val nonNull = joined.where(col("p_value").isNotNull).count()
    println(s"PROBE asof_events => rows=$n with_match=$nonNull (match includes self at equal ts)")
    // sanity: p_value at equal ts == own value for the earliest event per user? earliest has itself as match
    val check = joined.where(col("p_value").isNull).count()
    println(s"PROBE asof_nulls => $check (expect 0: equal-ts self-match)")
    // IVF on fixture embeddings
    val e = spark.table("embeddings")
    val q = e.where(col("vec_id") === 42).select("embedding").collect()(0).getSeq[Float](0).toArray
    val idx = graft.operators.Similarity.ivfIndex(e, "vec_id", "embedding", nlist = 8)
    val top = graft.operators.Similarity.ivfTopK(idx, q, 5, nprobe = 2).collect()
    println(s"PROBE ivf => top=${top.map(r => r.getLong(0) + ":" + f"${r.getDouble(1)}%.3f").mkString(", ")}")
    val sk = graft.catalog.Profiler.sketchStats(spark.table("lineitem"), Seq("l_extendedprice"))
    println(s"PROBE sketch => ${sk("l_extendedprice")}")
    spark.stop()
  }
}
