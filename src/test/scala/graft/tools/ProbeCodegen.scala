package graft.tools

import org.apache.spark.sql.SparkSession

/** Detector for silent whole-stage/expression codegen fallbacks: runs
  * every SparkEntry query with CODEGEN_ONLY factory mode so a generated
  * class that fails janino compilation surfaces as a query error instead
  * of an interpreted-mode fallback buried in stderr. */
object ProbeCodegen {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val r =
        try { fn(spark, sfDir).count(); "ok" }
        catch { case e: Throwable =>
          val root = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).toSeq.last
          "FAIL " + root.getClass.getSimpleName + ": " + String.valueOf(root.getMessage).take(200)
        }
      println(s"PROBE $name => $r")
    }
    spark.stop()
  }
}
