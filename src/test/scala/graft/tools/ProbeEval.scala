package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeEval {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val eng = graft.api.Engine.forFixtures(spark, "/root/testdata/sf0.001")
    def show(q: String): Unit = eng.ask(q) match {
      case Right(r) => println(s"PROBE ask [$q] => ${r.sql.take(95)}")
      case Left(e) => println(s"PROBE ask [$q] => ERR ${e.kind}")
    }
    show("total quantity on lineitem per returnflag")
    show("how many distinct mktsegment values")
    show("average customer account balance per market segment")
    show("maximum part retailprice")
    show("how many parts are there")
    show("count per unknown_column_zzz")  // nonsense grouping phrase
    show("per")                            // degenerate: just the keyword
    // full evaluation report
    val rep = graft.eval.Evaluation.run(eng, graft.eval.Evaluation.pilotCorpus)
    println(f"PROBE eval => exec=${rep.execSuccessRate}%.2f f1=${rep.macroF1}%.2f medianMs=${rep.medianLatencyMs}")
    println(f"PROBE safety => blocked=${graft.eval.Evaluation.runSafetyProbes(eng)}%.2f")
    // skew utilities on real fixture data
    val li = spark.table("lineitem")
    val plain = li.groupBy("l_returnflag").agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = graft.operators.Skew.saltedAggregate(li, "l_returnflag", "l_quantity")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    println(s"PROBE skew => equal=${plain.keySet == salted.keySet && plain.forall { case (k, (c, s)) => salted(k)._1 == c && math.abs(salted(k)._2 - s) < 1e-6 }}")
    // bucketing shuffle-free join
    graft.sources.Bucketing.writeBucketed(spark.table("orders"), "po_b", "o_orderkey", 4)
    graft.sources.Bucketing.writeBucketed(spark.table("lineitem").withColumnRenamed("l_orderkey", "o_orderkey"), "pl_b", "o_orderkey", 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    println(s"PROBE bucketing => shuffleFree=${graft.sources.Bucketing.joinIsShuffleFree(spark, "po_b", "pl_b", "o_orderkey")}")
    spark.sql("DROP TABLE IF EXISTS po_b"); spark.sql("DROP TABLE IF EXISTS pl_b")
    spark.stop()
  }
}
