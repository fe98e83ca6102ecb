package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def scratch = Bucketing.scratchRoot(spark)

  test("writeBucketed lays out one file per bucket") {
    val df = (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(13) // deliberately mismatched upstream parallelism
    Bucketing.writeBucketed(df, "graft_bkt_spec_files", "k", 4,
      s"$scratch/graft_bkt_spec_files")
    graft.ext.Scratch.reclaimOnExit(scratch)
    val files = new java.io.File(s"$scratch/graft_bkt_spec_files")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4,
      s"expected 1 file per bucket, got ${files.map(_.getName).toSeq}")
    assert(spark.table("graft_bkt_spec_files").count() == 1000)
  }

  test("colocated join is exchange-free and equals the shuffled join") {
    val left = (0 until 500).map(i => (i.toLong, s"p${i % 5}"))
      .toDF("lk", "attr")
    val right = (0 until 2000).map(i => (i.toLong % 500, i.toDouble))
      .toDF("rk", "amt")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // explicit file: URI — the staging path is a Hadoop path, not a
      // driver-local java.io.File, so a cluster can point it at hdfs:/s3a:
      val joined = Bucketing.colocatedJoin(left, right, "lk", "rk", 4,
        s"file:$scratch")
      val plan = joined.queryExecution.executedPlan.toString
      // the whole point: both sides arrive pre-hashed, no exchange.
      // Spark's ShuffleExchangeExec prints as "Exchange hashpartitioning"
      // — broadcast is disabled above, so any "Exchange" is a shuffle
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a co-located equi-join:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"scan is not bucket-aware:\n$plan")
      val got = joined.groupBy("attr").agg(
        count(lit(1)).as("n"),
        sum(col("amt")).cast("long").as("s"))
        .as[(String, Long, Long)].collect().toSet
      val want = left.join(right, col("lk") === col("rk"))
        .groupBy("attr").agg(count(lit(1)).as("n"),
          sum(col("amt")).cast("long").as("s"))
        .as[(String, Long, Long)].collect().toSet
      assert(got == want, "bucketed join changed the join's values")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("sequential colocated joins on the same keys do not clobber each other") {
    val l1 = Seq((1L, "a"), (2L, "b")).toDF("lk", "attr")
    val r1 = Seq((1L, 10.0), (2L, 20.0)).toDF("rk", "amt")
    val j1 = Bucketing.colocatedJoin(l1, r1, "lk", "rk", 2, s"file:$scratch")
    // second call, SAME key names and bucket count, DIFFERENT data —
    // must not overwrite the first call's staging under j1's feet
    val l2 = Seq((7L, "z")).toDF("lk", "attr")
    val r2 = Seq((7L, 70.0)).toDF("rk", "amt")
    val j2 = Bucketing.colocatedJoin(l2, r2, "lk", "rk", 2, s"file:$scratch")
    // consume the FIRST join lazily only now — before the fix this read
    // the second call's staging tables
    assert(j1.select("attr", "amt").as[(String, Double)].collect().toSet ==
      Set(("a", 10.0), ("b", 20.0)))
    assert(j2.select("attr", "amt").as[(String, Double)].collect().toSet ==
      Set(("z", 70.0)))
  }

  test("colocatedJoin refuses identical key names") {
    val df = Seq((1L, "a")).toDF("k", "attr")
    val e = intercept[IllegalArgumentException] {
      Bucketing.colocatedJoin(df, df.select(col("k"), lit(1.0).as("amt")),
        "k", "k", 2, s"file:$scratch")
    }
    assert(e.getMessage.contains("distinct key names"))
  }
}
