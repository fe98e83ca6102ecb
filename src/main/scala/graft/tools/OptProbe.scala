package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for scan-spread experiments (r19 optimization round):
  * times a CPU-dense doc-scan shape with and without a round-robin
  * spread of the single-file scan across the local cores.
  * runMain graft.tools.OptProbe [sfDir] [reps]
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(mk: => DataFrame): Unit = {
      mk.count() // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[opt] $label min=${ts.head}%.3f med=${ts(ts.size / 2)}%.3f")
    }

    def skipgram(docs: DataFrame): DataFrame = {
      val fwd = concat(
        graft.functions.VectorFunctions.wordShingleStrings(col("text"), 2),
        graft.functions.VectorFunctions.wordShingleStrings(col("text"), 3))
      val both = concat(fwd, transform(fwd, g => concat_ws(" ",
        substring_index(g, " ", -1), substring_index(g, " ", 1))))
      docs.select(explode(both).as("g"))
        .select(substring_index(col("g"), " ", 1).as("center"),
          substring_index(col("g"), " ", -1).as("context"))
        .groupBy(col("center"), col("context"))
        .agg(count(lit(1)).as("n"))
    }

    val docs = graft.Tables.load(spark, sfDir, "documents")
    time("skipgram plain")(skipgram(docs))
    time("skipgram spread4")(skipgram(docs.repartition(4)))
    time("skipgram spread8")(skipgram(docs.repartition(8)))
    time("skipgram spread16")(skipgram(docs.repartition(16)))

    def containment(docs: DataFrame): DataFrame =
      graft.ext.Dedup.containmentPairs(docs, "doc_id", "text",
        shingleN = 3, pct = 90)
    // lazy-hot-keys variant of the same containment shape: guard
    // count recorded via observe at execution, no materialize+count
    def containmentLazy(docs: DataFrame): DataFrame = {
      val all = docs.select(col("doc_id"),
        explode(graft.functions.VectorFunctions
          .shingleHex60(col("text"), 3)).as("h"))
      val sizes = all.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val hot = all.groupBy(col("h"))
        .agg(count(lit(1)).as("df_count"))
        .filter(col("df_count") > 500L)
        .select(col("h"))
      val kept = all.join(hot, Seq("h"), "left_anti")
      val inter = kept.as("a").join(kept.as("b"), col("a.h") === col("b.h")
          && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("n_sh", "n_a"), Seq("doc_a"))
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("n_sh", "n_b"), Seq("doc_b"))
        .filter(lit(100L) * col("n_inter") >=
          lit(90L) * least(col("n_a"), col("n_b")))
        .withColumn("contained_doc",
          when(col("n_a") <= col("n_b"), col("doc_a"))
            .otherwise(col("doc_b")))
        .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_a"),
          col("n_b"), col("contained_doc"))
    }
    time("containment plain")(containment(docs))
    time("containment lazyhot")(containmentLazy(docs))
    time("containment lazyhot spread8")(containmentLazy(docs.repartition(8)))

    // full restructure: per-doc set size carried THROUGH the pair join
    // (pre-cap size from the shingle array itself — no sizes agg, no
    // post-agg size joins), lazy hot set, spread scan
    def containmentV2(docs: DataFrame): DataFrame = {
      val withSets = docs.select(col("doc_id"),
        graft.functions.VectorFunctions.shingleHex60(col("text"), 3)
          .as("hs"))
        .select(col("doc_id"), size(col("hs")).cast("long").as("n_sh"),
          explode(col("hs")).as("h"))
      val hot = withSets.groupBy(col("h"))
        .agg(count(lit(1)).as("df_count"))
        .filter(col("df_count") > 500L)
        .select(col("h"))
      val kept = withSets.join(hot, Seq("h"), "left_anti")
      kept.as("a").join(kept.as("b"), col("a.h") === col("b.h")
          && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_inter"),
          min(col("a.n_sh")).as("n_a"), min(col("b.n_sh")).as("n_b"))
        .filter(lit(100L) * col("n_inter") >=
          lit(90L) * least(col("n_a"), col("n_b")))
        .withColumn("contained_doc",
          when(col("n_a") <= col("n_b"), col("doc_a"))
            .otherwise(col("doc_b")))
        .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_a"),
          col("n_b"), col("contained_doc"))
    }
    time("containment v2 spread8")(containmentV2(docs.repartition(8)))
    time("containment v2 plain")(containmentV2(docs))

    def minhash(docs: DataFrame): DataFrame =
      graft.ext.Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, k = 32, bands = 8, threshold = 0.5)
    time("minhash plain")(minhash(docs))
    time("minhash spread8")(minhash(docs.repartition(8)))

    spark.stop()
  }
}
