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
      val joined = Bucketing.colocatedJoin(left, right, "lk", "rk", 4, scratch)
      val plan = joined.queryExecution.executedPlan.toString
      // the whole point: both sides arrive pre-hashed, no exchange
      assert(!plan.contains("ShuffleExchange"),
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
}
