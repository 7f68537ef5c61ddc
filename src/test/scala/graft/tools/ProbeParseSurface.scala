package graft.tools

import org.apache.spark.sql.SparkSession

/** Adversarial parse-surface scout (r15 verdict #7): for each Spark-4
  * surface the denylist might not know, print what the validator AND a
  * raw execution currently do. */
object ProbeParseSurface {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = graft.sources.Sources.register(spark, "/root/testdata/sf0.001").toSet
    val probes = Seq(
      "declare" -> "DECLARE VARIABLE gv STRING DEFAULT 'supplier'",
      "set_var" -> "SET VAR gv = 'supplier'",
      "set_conf" -> "SET spark.sql.ansi.enabled=false",
      "tvf_range" -> "SELECT * FROM range(5)",
      "tvf_explode" -> "SELECT * FROM explode(array(1,2,3))",
      "tvf_inline" -> "SELECT * FROM inline(array(struct(1, 'a')))",
      "file_rel" -> "SELECT * FROM parquet.`/root/testdata/sf0.001/supplier.parquet` LIMIT 3",
      "file_rel_json" -> "SELECT * FROM json.`/etc/hostname` LIMIT 3",
      "text_rel" -> "SELECT * FROM text.`/etc/passwd` LIMIT 3",
      "param_named" -> "SELECT :p AS v FROM nation LIMIT 1",
      "param_pos" -> "SELECT ? AS v FROM nation LIMIT 1",
      "exec_imm_var" -> "EXECUTE IMMEDIATE 'SELECT 1'",
      "session_var_read" -> "SELECT session_user() FROM nation LIMIT 1",
      "udf_register" -> "SELECT java_method('java.lang.Thread', 'sleep', 100L) FROM nation LIMIT 1",
      "lateral_file" -> "SELECT n_name FROM nation, LATERAL (SELECT * FROM parquet.`/root/testdata/sf0.001/supplier.parquet` LIMIT 1)",
      "with_file" -> "WITH g AS (SELECT * FROM parquet.`/root/testdata/sf0.001/supplier.parquet`) SELECT * FROM g LIMIT 3"
    )
    probes.foreach { case (label, sql) =>
      val v = graft.safety.Validator.validate(spark, sql, tables)
      val vres = v.fold(e => s"DENIED(${e.kind}: ${e.message.take(80)})", _ => "VALIDATED")
      val r = graft.exec.Executor.runSql(spark, sql, tables)
      val rres = r.fold(e => s"DENIED(${e.kind}: ${e.message.take(80)})",
        q => s"EXECUTED rows=${q.rowcount} first=${q.rows.headOption.map(_.take(3)).getOrElse(Nil)}")
      println(s"PROBE $label => validate: $vres | run: $rres")
    }
    spark.stop()
  }
}
