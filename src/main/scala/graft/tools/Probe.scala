package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Scratch probe main for cross-engine determinism experiments. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    // self dot product + norm per row
    emb.select(col("vec_id"),
        Similarity.dot(col("embedding"), col("embedding")).as("dot_self"),
        Similarity.norm(col("embedding")).as("norm"))
      .coalesce(1).write.mode("overwrite").parquet("/tmp/probe_dot")
    // percentile probe: Spark exact interpolated percentiles
    spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .selectExpr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.99)) as p")
      .show(false)
    // events ts conversion probe
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    ev.printSchema()
    ev.select(col("event_id"),
        date_format(timestamp_micros(expr("ts div 1000")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"))
      .coalesce(1).write.mode("overwrite").parquet("/tmp/probe_ts")
    spark.stop()
  }
}
