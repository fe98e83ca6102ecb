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

  test("type normalize formats timestamps as ISO strings") {
    val df = Seq(("a", "2026-01-09 12:34:56"))
      .toDF("k", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val out = Load.typeNormalize(df)
    assert(out.schema("ts").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(out.select("ts").as[String].head() == "2026-01-09T12:34:56")
  }
}
