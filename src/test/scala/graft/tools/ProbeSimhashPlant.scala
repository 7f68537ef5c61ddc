package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object ProbeSimhashPlant {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, "/root/testdata/sf0.01")
    val docs = spark.table("documents").select("doc_id", "text")
    val planted = docs.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" zqxwv")).as("text"))
    val all = docs.union(planted)
    val sh = Dedup.withSimhash(all, "doc_id", "text")
    val nt = docs.select(col("doc_id"), size(split(lower(trim(col("text"))), "\\s+")).as("n_tok"))
    val pairs = sh.as("a").join(sh.as("b"), col("b.doc_id") === col("a.doc_id") + 100000)
      .select(col("a.doc_id").as("doc_id"), graft.functions.hamming64(col("a.simhash"), col("b.simhash")).as("ham"))
      .join(nt, "doc_id")
    println("PROBE max ham by token bucket:")
    pairs.groupBy((floor(col("n_tok") / 25) * 25).as("tok_bucket"))
      .agg(max("ham").as("max_ham"), count(lit(1)).as("n")).orderBy("tok_bucket")
      .collect().foreach(r => println(s"PROBE toks>=${r.get(0)} max_ham=${r.get(1)} n=${r.get(2)}"))
    // distribution of doc lengths
    println("PROBE doc count by n_tok>=40: " + nt.where(col("n_tok") >= 40).count())
    val pairs40 = pairs.where(col("n_tok") >= 40)
    println("PROBE max ham for n_tok>=40: " + pairs40.agg(max("ham")).collect()(0).get(0) + " n=" + pairs40.count())
    spark.stop()
  }
}
