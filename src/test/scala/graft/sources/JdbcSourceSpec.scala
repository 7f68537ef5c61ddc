package graft.sources

import java.sql.DriverManager

import graft.SparkSpec
import graft.core.FkEdge
import graft.exec.Executor
import graft.safety.Validator

/**
 * Live JDBC path (S1/S4) against embedded Derby — a real database in the
 * test JVM, so `spark.read.format("jdbc")`, the connection test, and the
 * `DatabaseMetaData` PK/FK crawl are exercised for real (the reference's
 * connect → crawl → query flow, `app/main.py:62-146`,
 * `app/schema/crawler.py:142-194`).
 */
class JdbcSourceSpec extends SparkSpec {

  private lazy val dbDir = {
    System.setProperty("derby.system.home", System.getProperty("java.io.tmpdir"))
    java.nio.file.Files.createTempDirectory("graft-derby").toString + "/db"
  }
  private lazy val url = s"jdbc:derby:$dbDir;create=true"

  /** Create the 4-table FK chain and load rows from the parquet fixture. */
  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE REGION (R_REGIONKEY BIGINT NOT NULL PRIMARY KEY, R_NAME VARCHAR(64))")
      st.execute("CREATE TABLE NATION (N_NATIONKEY BIGINT NOT NULL PRIMARY KEY, N_NAME VARCHAR(64), " +
        "N_REGIONKEY BIGINT REFERENCES REGION(R_REGIONKEY))")
      st.execute("CREATE TABLE CUSTOMER (C_CUSTKEY BIGINT NOT NULL PRIMARY KEY, C_NAME VARCHAR(64), " +
        "C_NATIONKEY BIGINT REFERENCES NATION(N_NATIONKEY), C_ACCTBAL DOUBLE, C_MKTSEGMENT VARCHAR(32))")
      st.execute("CREATE TABLE ORDERS (O_ORDERKEY BIGINT NOT NULL PRIMARY KEY, " +
        "O_CUSTKEY BIGINT REFERENCES CUSTOMER(C_CUSTKEY), O_TOTALPRICE DOUBLE)")
      st.close()

      def load(sql: String, rows: Seq[Seq[Any]]): Unit = {
        val ps = conn.prepareStatement(sql)
        rows.foreach { r =>
          r.zipWithIndex.foreach { case (v, i) => ps.setObject(i + 1, v) }
          ps.addBatch()
        }
        ps.executeBatch()
        ps.close()
      }
      Sources.register(spark, sfDir)
      load("INSERT INTO REGION VALUES (?, ?)",
        spark.table("region").select("r_regionkey", "r_name").collect().map(_.toSeq).toSeq)
      load("INSERT INTO NATION VALUES (?, ?, ?)",
        spark.table("nation").select("n_nationkey", "n_name", "n_regionkey").collect().map(_.toSeq).toSeq)
      load("INSERT INTO CUSTOMER VALUES (?, ?, ?, ?, ?)",
        spark.table("customer").select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
          .collect().map(_.toSeq).toSeq)
      load("INSERT INTO ORDERS VALUES (?, ?, ?)",
        spark.table("orders").select("o_orderkey", "o_custkey", "o_totalprice")
          .collect().map(_.toSeq).toSeq)
    } finally conn.close()
  }

  /** Restore the parquet-backed temp views (the JDBC registry overwrites
    * the shared session's view names). */
  private def restoreParquetViews(): Unit =
    Sources.fixtureTables.foreach { name =>
      Sources.table(spark, sfDir, name).createOrReplaceTempView(name)
    }

  test("connection test succeeds against a live database and fails for a bad URL (S2)") {
    seeded
    val ok = JdbcSource.testConnection(url)
    assert(ok.isRight && ok.toOption.get.toLowerCase.contains("derby"), ok)
    assert(JdbcSource.testConnection("jdbc:derby:/nonexistent/nope").isLeft)
  }

  test("DatabaseMetaData crawl reflects tables, PKs and FK edges from the DB, not the sidecar (S4)") {
    seeded
    val schema = JdbcSource.crawl(url)
    val byName = schema.tables.map(t => t.name -> t).toMap
    assert(byName.keySet == Set("region", "nation", "customer", "orders"))
    assert(byName("customer").primaryKey == Seq("C_CUSTKEY"))
    val fks = schema.relationships.toSet
    assert(fks == Set(
      FkEdge("nation", "n_regionkey", "region", "r_regionkey"),
      FkEdge("customer", "c_nationkey", "nation", "n_nationkey"),
      FkEdge("orders", "o_custkey", "customer", "c_custkey")), fks)
    val custCols = byName("customer").columns.map(c => c.name -> c).toMap
    assert(custCols("C_CUSTKEY").isPrimaryKey && !custCols("C_CUSTKEY").nullable)
    assert(custCols("C_NATIONKEY").isForeignKey)
    assert(custCols("C_ACCTBAL").typeName == "DOUBLE")
    // PK indexes surface in the index inventory
    assert(byName("orders").indexes.nonEmpty)
  }

  test("d07_join_fk runs end-to-end through the engine against JDBC-registered views (S1)") {
    seeded
    try {
      val schema = JdbcSource.registerJdbc(spark, url)
      val tables = schema.tables.map(_.name).toSet
      val sql = graft.Queries.byName("d07_join_fk")
      val result = Validator.validate(spark, sql, tables) match {
        case Right(v) => Executor.frame(spark, v, limit = Executor.DefaultLimit).collect()
        case Left(e) => fail(s"validation failed: $e")
      }
      // same rows as the parquet-backed path
      restoreParquetViews()
      val expected = Validator.validate(spark, sql, tables).toOption
        .map(v => Executor.frame(spark, v, limit = Executor.DefaultLimit).collect()).get
      assert(result.length == expected.length && result.length == 100)
      assert(result.map(_.toSeq.toList).toList == expected.map(_.toSeq.toList).toList)
    } finally restoreParquetViews()
  }

  test("Engine.forJdbc answers an NL question end-to-end from the live database") {
    seeded
    try {
      val engine = graft.api.Engine.forJdbc(spark, url)
      // FK graph comes from the crawl, tables from the reflection — the
      // reference's connect -> crawl -> ask flow on a real database
      assert(engine.fks.nonEmpty && engine.tables.toSet ==
        Set("region", "nation", "customer", "orders"))
      val r = engine.ask("how many customers are there")
      val qr = r.toOption.get
      assert(qr.rowcount == 1)
      assert(qr.rows.head.head.toString.toLong == spark.table("customer").count())
    } finally restoreParquetViews()
  }

  test("partitioned JDBC read splits the scan into parallel range tasks") {
    seeded
    try {
      val df = JdbcSource.registerPartitioned(spark, url, "\"ORDERS\"",
        partitionColumn = "O_ORDERKEY", lowerBound = 0L, upperBound = 10000L,
        numPartitions = 4, viewName = "orders_part")
      assert(df.rdd.getNumPartitions == 4)
      assert(df.count() == spark.table("orders").count())
    } finally restoreParquetViews()
  }
}
