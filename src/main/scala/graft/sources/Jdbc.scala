package graft.sources

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.FkEdge

/**
 * Live JDBC source path (S1/S4 in SURVEY.md §2.1): the reference's first
 * interaction is "connect to my database" — URL or discrete env parts,
 * connection test, then a deep schema crawl with PK/FK reflection
 * (ref `app/main.py:62-146`, `app/db.py:5-12`,
 * `app/schema/crawler.py:142-194`).
 *
 * Spark side: every table reflected from `DatabaseMetaData` registers as
 * a temp view over `spark.read.format("jdbc")`, so the engine's whole
 * validate → limit → execute path runs against a real database through
 * Spark's JDBC relation (predicate pushdown into the remote DB included).
 * The crawler half reads `java.sql.DatabaseMetaData` directly — the JDBC
 * analogue of SQLAlchemy's `inspect(engine)` — instead of the parquet
 * registry's FK sidecar.
 *
 * Scale notes: `partitionColumn`/`numPartitions` options split large
 * tables into parallel range reads ([[JdbcSource.registerPartitioned]]);
 * an unpartitioned JDBC read is a single-task scan and is only
 * appropriate for dimension-sized tables.
 */
object JdbcSource {

  /** Discrete connection parts (the reference's `parts` payload —
    * DB_DRIVER/DB_HOST/DB_PORT/DB_NAME/DB_USER/DB_PASSWORD,
    * `app/main.py:104-127`). */
  final case class ConnParts(
      driver: String, host: String = "localhost", port: Option[Int] = None,
      database: String = "", user: Option[String] = None, password: Option[String] = None) {
    def url: String = {
      val p = port.map(":" + _).getOrElse("")
      driver match {
        case d if d.startsWith("jdbc:derby") || d == "derby" => s"jdbc:derby:$database"
        case d if d.contains("sqlite") => s"jdbc:sqlite:$database"
        case d => s"jdbc:$d://$host$p/$database"
      }
    }
  }

  /** Connection test (S2; ref `app/main.py:171-207` /connect/test):
    * opens a connection and checks validity. Left = human-readable
    * failure, like the reference's `{ok: false, error}` envelope. */
  def testConnection(url: String, props: java.util.Properties = new java.util.Properties()): Either[String, String] =
    try {
      val conn = DriverManager.getConnection(url, props)
      try {
        val meta = conn.getMetaData
        Right(s"${meta.getDatabaseProductName} ${meta.getDatabaseProductVersion}")
      } finally conn.close()
    } catch { case e: Exception => Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(500)) }

  /** One reflected column (crawler.py ColumnInfo). */
  final case class JdbcColumn(name: String, typeName: String, nullable: Boolean,
      isPrimaryKey: Boolean, isForeignKey: Boolean)

  /** One reflected table (crawler.py TableInfo). */
  final case class JdbcTable(name: String, columns: Seq[JdbcColumn],
      primaryKey: Seq[String], indexes: Seq[String])

  /** Deep-crawl result (crawler.py SchemaMetadata). */
  final case class JdbcSchema(tables: Seq[JdbcTable], relationships: Seq[FkEdge])

  /**
   * Deep schema crawl over `java.sql.DatabaseMetaData` (S4): tables,
   * columns with types/nullability, PK constraint columns, imported-key
   * FK edges, index names — the same inventory the reference's
   * `crawl_schema` builds from SQLAlchemy reflection
   * (`app/schema/crawler.py:142-194`).
   */
  def crawl(url: String, props: java.util.Properties = new java.util.Properties(),
      schemaPattern: String = null): JdbcSchema = {
    val conn = DriverManager.getConnection(url, props)
    try crawl(conn, schemaPattern) finally conn.close()
  }

  def crawl(conn: Connection, schemaPattern: String): JdbcSchema = {
    val meta = conn.getMetaData
    val tableNames = collectRs(meta.getTables(null, schemaPattern, "%", Array("TABLE")))(
      _.getString("TABLE_NAME"))
    val fks = scala.collection.mutable.ArrayBuffer.empty[FkEdge]
    val tables = tableNames.map { t =>
      val pk = collectRs(meta.getPrimaryKeys(null, schemaPattern, t))(_.getString("COLUMN_NAME"))
      val imported = collectRs(meta.getImportedKeys(null, schemaPattern, t)) { rs =>
        FkEdge(t.toLowerCase, rs.getString("FKCOLUMN_NAME").toLowerCase,
          rs.getString("PKTABLE_NAME").toLowerCase, rs.getString("PKCOLUMN_NAME").toLowerCase)
      }
      fks ++= imported
      val fkCols = imported.map(_.fromColumn).toSet
      val cols = collectRs(meta.getColumns(null, schemaPattern, t, "%")) { rs =>
        val name = rs.getString("COLUMN_NAME")
        JdbcColumn(name, rs.getString("TYPE_NAME"),
          rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls,
          pk.contains(name), fkCols.contains(name.toLowerCase))
      }
      val idx = collectRs(meta.getIndexInfo(null, schemaPattern, t, false, true))(
        _.getString("INDEX_NAME")).filter(_ != null).distinct
      JdbcTable(t.toLowerCase, cols, pk, idx)
    }
    JdbcSchema(tables, fks.toSeq)
  }

  private def collectRs[A](rs: java.sql.ResultSet)(f: java.sql.ResultSet => A): Seq[A] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[A]
    try { while (rs.next()) buf += f(rs) } finally rs.close()
    buf.toSeq
  }

  /** Lazy JDBC-backed DataFrame for one table. */
  def table(spark: SparkSession, url: String, tableName: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", tableName)
      .options(options)
      .load()

  /** Range-partitioned parallel read for fact-sized tables: each of
    * `numPartitions` tasks reads one slice of `partitionColumn`. */
  def registerPartitioned(spark: SparkSession, url: String, tableName: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, viewName: String = null): DataFrame = {
    val df = table(spark, url, tableName, Map(
      "partitionColumn" -> partitionColumn,
      "lowerBound" -> lowerBound.toString,
      "upperBound" -> upperBound.toString,
      "numPartitions" -> numPartitions.toString))
    df.createOrReplaceTempView(Option(viewName).getOrElse(tableName.toLowerCase))
    df
  }

  /**
   * Crawl + register: reflect every table through DatabaseMetaData and
   * expose each as a lowercase temp view over a Spark JDBC relation.
   * Returns the crawled schema (the engine uses its `relationships`
   * instead of the parquet FK sidecar). Mirrors the reference's connect →
   * crawl → ready flow (`app/routes_ai.py:28-89`).
   */
  def registerJdbc(spark: SparkSession, url: String,
      schemaPattern: String = null): JdbcSchema = {
    val schema = crawl(url, schemaPattern = schemaPattern)
    schema.tables.foreach { t =>
      table(spark, url, quoted(t.name, schemaPattern)).createOrReplaceTempView(t.name)
    }
    schema
  }

  private def quoted(tableName: String, schemaPattern: String): String = {
    val t = "\"" + tableName.toUpperCase + "\""
    Option(schemaPattern).map(s => "\"" + s + "\"." + t).getOrElse(t)
  }
}
