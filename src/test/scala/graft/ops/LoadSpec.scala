package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LoadSpec extends SparkSpec {
  import spark.implicits._

  test("compaction shrinks file count and preserves data") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val src = (1 to 10000).map(i => (i.toLong, s"row$i"))
      .toDF("id", "payload")
    src.repartition(32).write.parquet(dir)
    def files = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 32)
    val n = Load.compact(spark, dir, targetRows = 1000000)
    assert(n == 10000)
    assert(files == 1)
    val back = spark.read.parquet(dir)
    assert(back.count() == 10000)
    assert(back.agg(sum("id")).as[Long].head() == 10000L * 10001 / 2)
  }

  test("incremental append: strictly-past-watermark rows only, idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("incr").toString + "/t"
    val batch1 = Seq((1L, "2026-01-01 00:00:00"), (2L, "2026-01-02 00:00:00"))
      .toDF("id", "wm").withColumn("wm", col("wm").cast("timestamp"))
    val wm1 = Load.incrementalAppend(batch1, dir, "wm", None)
    assert(wm1.contains("2026-01-02 00:00:00"))
    // re-run same batch with the watermark: nothing appended
    Load.incrementalAppend(batch1, dir, "wm", wm1)
    assert(spark.read.parquet(dir).count() == 2)
    // later rows append; equal-to-watermark rows do not duplicate
    val batch2 = Seq((2L, "2026-01-02 00:00:00"), (3L, "2026-01-03 00:00:00"))
      .toDF("id", "wm").withColumn("wm", col("wm").cast("timestamp"))
    val wm2 = Load.incrementalAppend(batch2, dir, "wm", wm1)
    assert(wm2.contains("2026-01-03 00:00:00"))
    assert(spark.read.parquet(dir).orderBy("id").select("id")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L))
  }

  test("write-audit-publish keeps the previous data when the audit fails") {
    val dir = java.nio.file.Files.createTempDirectory("wap").toString + "/t"
    val good = Seq((1L, "a"), (2L, "b")).toDF("pk", "v")
    Load.writeAuditPublish(spark, good, dir, Seq("pk"), 2L)
    assert(spark.read.parquet(dir).count() == 2)
    // dup PKs fail the audit; the published table must be unchanged
    val bad = Seq((9L, "x"), (9L, "y")).toDF("pk", "v")
    assertThrows[DataQualityException] {
      Load.writeAuditPublish(spark, bad, dir, Seq("pk"), 2L)
    }
    assert(spark.read.parquet(dir).orderBy("pk").select("pk")
      .as[Long].collect().toSeq == Seq(1L, 2L))
    assert(!new java.io.File(dir + "_staging").exists())
  }

  test("jdbc full refresh: transactional DELETE+INSERT round trip with validation") {
    val url = "jdbc:derby:memory:graft_load_spec;create=true"
    val ddl = "CREATE TABLE products_dim (product_id BIGINT, name VARCHAR(64), " +
      "price DOUBLE, active BOOLEAN)"
    val v1 = Seq((1L, "a", 10.0, true), (2L, "b", 20.0, false))
      .toDF("product_id", "name", "price", "active")
    assert(Load.jdbcFullRefresh(v1, url, "products_dim", Some(ddl)) == 2L)
    Load.jdbcValidateLoaded(url, "products_dim", Seq("product_id"), 2L)
    // full refresh replaces, never appends
    val v2 = Seq((3L, "c", 30.0, true)).toDF("product_id", "name", "price", "active")
    assert(Load.jdbcFullRefresh(v2, url, "products_dim") == 1L)
    Load.jdbcValidateLoaded(url, "products_dim", Seq("product_id"), 1L)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery("SELECT product_id FROM products_dim")
      rs.next()
      assert(rs.getLong(1) == 3L)
      assert(!rs.next())
    } finally conn.close()
    // count mismatch -> DataQualityException (post-load gate parity)
    assertThrows[DataQualityException] {
      Load.jdbcValidateLoaded(url, "products_dim", Seq("product_id"), 99L)
    }
  }

  test("jdbc full refresh rolls back on failure, keeping the old rows") {
    val url = "jdbc:derby:memory:graft_load_rb;create=true"
    val ddl = "CREATE TABLE t (pk BIGINT NOT NULL PRIMARY KEY, v VARCHAR(8))"
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("pk", "v")
    Load.jdbcFullRefresh(v1, url, "t", Some(ddl))
    // duplicate PK violates the table constraint mid-transaction; the
    // DELETE must roll back with it
    val bad = Seq((9L, "x"), (9L, "y")).toDF("pk", "v")
    assertThrows[Throwable] { Load.jdbcFullRefresh(bad, url, "t") }
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery("SELECT count(*) FROM t")
      rs.next()
      assert(rs.getLong(1) == 2L, "old rows must survive a failed refresh")
    } finally conn.close()
  }

  test("jdbc full refresh refuses an over-cap frame and leaves the table intact") {
    val url = "jdbc:derby:memory:graft_load_cap;create=true"
    val ddl = "CREATE TABLE t (pk BIGINT, v VARCHAR(8))"
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("pk", "v")
    Load.jdbcFullRefresh(v1, url, "t", Some(ddl))
    // a 3-row frame against maxRows=2 must fail the contract check
    // BEFORE any JDBC work — the existing rows survive (no DELETE ran)
    val big = Seq((3L, "c"), (4L, "d"), (5L, "e")).toDF("pk", "v")
    val ex = intercept[IllegalArgumentException] {
      Load.jdbcFullRefresh(big, url, "t", maxRows = 2)
    }
    assert(ex.getMessage.contains("writeAuditPublish"))
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery("SELECT count(*), min(pk), max(pk) FROM t")
      rs.next()
      assert(rs.getLong(1) == 2L, "old rows must survive a refused refresh")
      assert(rs.getLong(2) == 1L && rs.getLong(3) == 2L)
    } finally conn.close()
    // degenerate caps fail loudly instead of overflowing into limit()
    intercept[IllegalArgumentException] {
      Load.jdbcFullRefresh(v1, url, "t", maxRows = 0)
    }
    // Int.MaxValue means "uncapped", not limit(Int.MinValue)
    assert(Load.jdbcFullRefresh(v1, url, "t", maxRows = Int.MaxValue) == 2L)
  }

  test("rotating text logger rotates at the size cap and keeps N backups") {
    val dir = java.nio.file.Files.createTempDirectory("rotlog").toString
    val lg = new graft.control.RotatingTextLogger(dir, maxBytes = 500,
      backupCount = 2)
    (1 to 40).foreach(i => lg.info("rid", "p", "m", s"message number $i"))
    val base = java.nio.file.Paths.get(dir, "etl_logs.log")
    assert(java.nio.file.Files.exists(base))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "etl_logs.log.1")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "etl_logs.log.2")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "etl_logs.log.3")), "backupCount respected")
    // line format parity: ts | LEVEL | module | pipeline | run_id | msg
    val line = java.nio.file.Files.readAllLines(base).get(0)
    assert(line.matches(
      """\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3} \| INFO \| m \| p \| rid \| message number \d+"""))
  }

  test("type normalize formats timestamps as ISO strings") {
    val df = Seq(("a", "2026-01-09 12:34:56"))
      .toDF("k", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val out = Load.typeNormalize(df)
    assert(out.schema("ts").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(out.select("ts").as[String].head() == "2026-01-09T12:34:56")
  }
}
