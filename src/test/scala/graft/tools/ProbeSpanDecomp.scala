package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeSpanDecomp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nDocs = 2000000L
    val unique = concat_ws(" ", (1 to 20).map(k =>
      concat(lit(s"u${k}_"), col("id").cast("string"))): _*)
    val docs = spark.range(0, nDocs).select(col("id").as("doc_id"),
      concat(unique, when(pmod(col("id"), lit(2L)) === 0,
        lit(" please accept all cookies to continue")).otherwise(lit("")))
        .as("text")).persist()
    docs.count()
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"DECOMP $label => ${(System.nanoTime()-t0)/1e9}%.1fs n=$n")
    }
    val toks = filter(split(trim(col("text")), "\\s+"), x => length(x) > 0)
    val base = docs.select(col("doc_id"), toks.as("__t")).withColumn("__nt", size(col("__t")))
    t("tokenize_only")(base.select(sum(col("__nt"))).collect()(0).getLong(0))
    val spans = base.where(col("__nt") >= 3)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("__nt") - 3),
          i => xxhash64(slice(col("__t"), i + 1, lit(3))))).as(Seq("pos", "span")))
    t("spans_narrow")(spans.select(count(lit(1))).collect()(0).getLong(0))
    val shared = spans.groupBy("span").agg(countDistinct(col("doc_id")).as("d"))
      .where(col("d") >= 2).select("span")
    t("shared_agg")(shared.count())
    val coveredPerDoc = spans.join(shared, "span")
      .groupBy(col("doc_id")).agg(collect_set(col("pos")).as("__starts"))
    t("covered_per_doc")(coveredPerDoc.count())
    t("full_op")(graft.operators.Dedup.removeDuplicatedSpans(docs, "doc_id", "text").count())
    spark.stop()
  }
}
