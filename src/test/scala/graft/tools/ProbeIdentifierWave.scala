package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-15 second adversarial scout: IDENTIFIER() dynamic names,
  * reflect/java_method invocation, and file-path relations — does the
  * validator see what executes? */
object ProbeIdentifierWave {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, "/root/testdata/sf0.001")
    val allowed = Set("customer", "orders", "nation")
    val cases = Seq(
      "identifier_static" -> "SELECT * FROM IDENTIFIER('nation') LIMIT 5",
      "identifier_concat" -> "SELECT * FROM IDENTIFIER('nat' || 'ion') LIMIT 5",
      "identifier_forbidden" -> "SELECT * FROM IDENTIFIER('sup' || 'plier') LIMIT 5",
      "reflect_env" -> "SELECT reflect('java.lang.System', 'getenv', 'HOME') AS v FROM nation LIMIT 1",
      "java_method" -> "SELECT java_method('java.lang.System', 'getProperty', 'user.dir') AS v FROM nation LIMIT 1",
      "file_relation" -> "SELECT * FROM parquet.`/root/testdata/sf0.001/supplier.parquet` LIMIT 5",
      "text_file_relation" -> "SELECT * FROM text.`/etc/hostname` LIMIT 5")
    cases.foreach { case (name, sql) =>
      val v = graft.safety.Validator.validate(spark, sql, allowed)
      val verdict = v.fold(e => "DENY " + e.message.take(100), _ => "ALLOW")
      println(s"PROBE $name validate=$verdict")
      if (verdict == "ALLOW") {
        // what would actually run if the executor admitted it?
        try {
          val rows = spark.sql(sql).collect()
          println(s"PROBE $name EXECUTED rows=${rows.length} first=${rows.headOption.map(_.toString.take(120))}")
        } catch { case e: Throwable =>
          println(s"PROBE $name exec-fail ${e.getMessage.linesIterator.take(1).mkString.take(150)}")
        }
      }
    }
    spark.stop()
  }
}
