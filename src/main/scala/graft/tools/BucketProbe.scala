package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: distinct-hash class counts and band-bucket occupancy for
  * the two banded-class pair ops at a given SF — sizes the hot-bucket
  * cap default against real corpus occupancy. */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = docs.select(col("doc_id"),
      graft.ext.Dedup.simhash(col("text")).as("h"))
    val cls = sh.groupBy(col("h")).agg(count(lit(1)).as("n"))
    val bands = cls.select(col("h"), explode(array((0 until 4).map(b =>
      struct(lit(b).as("band"), shiftrightunsigned(col("h"), b * 16)
        .bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bk"))
      .select(col("bk.band"), col("bk.key"))
    val occ = bands.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("bn"))
    println(s"simhash: docs=${docs.count()} classes=${cls.count()}")
    occ.orderBy(col("bn").desc).limit(10).collect()
      .foreach(r => println(s"  band=${r.get(0)} key=${r.get(1)} occ=${r.get(2)}"))
    // minhash band-bucket occupancy at the registered configs (8
    // bands for the pairs op; 16 is the tune report's loosest)
    val sigs = graft.ext.Dedup.minhashSignatures(
      docs, col("doc_id"), col("text"), shingleN = 3, k = 32)
    for (b <- Seq(4, 8, 16)) {
      val mocc = graft.ext.Dedup.minhashBandBuckets(sigs, 32, b)
        .groupBy(col("band"), col("key")).agg(count(lit(1)).as("bn"))
      val top = mocc.orderBy(col("bn").desc).limit(3).collect()
      println(s"minhash bands=$b top occupancy: " +
        top.map(_.get(2)).mkString(", "))
    }
    spark.stop()
  }
}
