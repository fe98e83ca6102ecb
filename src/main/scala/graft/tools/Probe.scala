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
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val n = emb.count()
    val nC = Similarity.autoCentroids(n)
    println(s"[probe] n=$n nC=$nC")
    val cents = graft.ext.PairStage.ivfCentroids(spark, dir, nC, iters = 2)
    for (eps <- Seq(0.3, 0.5, 0.7, 0.8, 0.9)) {
      val r = Similarity.semDedup(emb, cents, "vec_id", "embedding", eps)
      val agg = r.agg(count(lit(1)).as("n"),
        sum(col("is_removed")).as("n_removed")).collect()(0)
      println(s"[probe] eps=$eps n=${agg.getLong(0)} removed=${agg.getLong(1)}")
    }
    // within-cell earlier-pair cosine distribution (percentiles)
    val assigned = Similarity.ivfAssignWith(cents, emb, "vec_id", "embedding")
    val p = assigned.as("a").join(assigned.as("b"),
        col("a.centroid_id") === col("b.centroid_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(Similarity.dot(col("a.v"), col("b.v")).as("cos"))
    p.selectExpr("count(*) as n_pairs",
      "percentile(cos, array(0.5, 0.9, 0.99, 0.999, 1.0)) as pct").show(false)
    spark.stop()
  }
}
