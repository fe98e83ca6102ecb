package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling probe for the dedup/ANN family: runs the probed
  * queries at sf0.1 and at a DERIVED sf1 (10x) corpus and reports the
  * wall-time ratio next to each op's documented big-O claim — the
  * cheapest honest test of the 100 TB story (VERDICT r8 #5; the
  * composition-degeneracy rule showed sf0.01 -> sf0.1 already changes
  * regimes once).
  *
  * The sf1 corpus is derived from the driver's sf0.1 tables, not
  * synthesized from nothing: 10 copies, where copy 0 is byte-identical
  * to sf0.1 and copy i > 0 rewrites every whitespace token `w` to
  * `w_i` (documents) or rotates the embedding vector left by i
  * positions (embeddings; norm-preserving). Each copy therefore keeps
  * sf0.1's exact INTERNAL duplicate/neighbor structure while sharing
  * no tokens (resp. no aligned dims) across copies — duplicate-pair
  * count and neighbor count scale linearly (x10), which is what a real
  * x10 corpus with a constant duplication rate does. A naive 10x
  * union of identical copies would instead square the pair count and
  * probe a 100x-duplication regime no one claims to handle.
  *
  * Usage: runMain graft.tools.ScaleProbe [baseDir] [derivedDir] [reps]
  * (defaults /root/testdata/sf0.1, /tmp/graft_sf1, 3). The derived
  * corpus is built once and reused; delete derivedDir to rebuild.
  * Findings land in SCALE.md ("measured sf0.1 -> sf1 scaling").
  */
object ScaleProbe {

  val Probed = Seq("dedup_minhash_lsh", "dedup_incremental",
    "dedup_bloom_incremental", "sim_ivf_topk", "graph_pagerank",
    "dedup_containment")

  def deriveSf1(spark: SparkSession, baseDir: String, outDir: String): Unit = {
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val idStep = 10000000L
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val docCopies = (0 until 10).map { i =>
      val text =
        if (i == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", "$1_" + i)
      docs.select((col("doc_id") + lit(i * idStep)).as("doc_id"),
        text.as("text"), col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }
    docCopies.reduce(_.unionAll(_)).repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val embCopies = (0 until 10).map { i =>
      val rot =
        if (i == 0) col("embedding")
        else concat(slice(col("embedding"), i + 1, dim - i),
          slice(col("embedding"), 1, i))
      emb.select((col("vec_id") + lit(i * idStep)).as("vec_id"),
        rot.as("embedding"), col("label"))
    }
    embCopies.reduce(_.unionAll(_)).repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (!new java.io.File(s"$outDir/embeddings.parquet").exists()) {
      println(s"[scaleprobe] deriving 10x corpus at $outDir")
      deriveSf1(spark, baseDir, outDir)
    }
    val n0 = spark.read.parquet(s"$baseDir/documents.parquet").count()
    val n1 = spark.read.parquet(s"$outDir/documents.parquet").count()
    println(s"[scaleprobe] documents $n0 -> $n1, reps=$reps")

    def median(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).count() // untimed warm-up
      spark.catalog.clearCache(); System.gc()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc()
        s
      }.sorted
      ts(ts.length / 2)
    }

    val rows = Probed.map { name =>
      val t0 = median(name, baseDir)
      val t1 = median(name, outDir)
      println(f"[scaleprobe] $name%-24s sf0.1 $t0%7.2f s   sf1 $t1%7.2f s" +
        f"   ratio ${t1 / t0}%5.2fx")
      (name, t0, t1)
    }
    println("[scaleprobe] summary " + rows.map { case (n, t0, t1) =>
      f""""$n":[$t0%.2f,$t1%.2f]""" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
