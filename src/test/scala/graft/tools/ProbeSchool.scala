package graft.tools
import org.apache.spark.sql.SparkSession
import graft.api.Engine
import graft.eval.SchoolFixture
object ProbeSchool {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val engine = new Engine(spark, SchoolFixture.register(spark), SchoolFixture.fks)
    for (q <- Seq("average score per course_id", "top 5 courses by average score",
        "student names with their scores", "course names with average score per course")) {
      val nl = engine.nl2sql(q)
      println(s"PROBE q='$q' -> $nl")
      engine.ask(q) match {
        case Right(r) => println(s"PROBE   ok sql=${r.sql}")
        case Left(e) => println(s"PROBE   ERR ${e.kind}: ${e.message.take(200)}")
      }
    }
    spark.stop()
  }
}
