package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The resampling half of DSIR: deterministic keep coins over the
  * importance weights, reported per source. */
class DsirResampleSpec extends SparkSpec {
  import spark.implicits._

  test("target==raw: every weight is 0 and the coin replays exactly") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = Corpus.dsirResample(docs, col("doc_id"), col("text"),
        isTarget = lit(true), col("source"))
      .select("source", "n_docs", "n_kept", "mean_millibits_all",
        "mean_millibits_kept")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, _, _, all, kept) =>
      assert(all === 0L); assert(kept === 0L)
    }
    // zero advantage -> keep_ppm = 500000 everywhere; the kept count
    // is the hash coin alone, replayable driver-side
    val want = docs.select(col("doc_id"), col("source"))
      .as[(Long, String)].collect()
      .groupBy(_._2).map { case (src, ds) =>
        src -> ds.count { case (id, _) =>
          TextOps.hex60Local(s"dsir:$id") % 1000000L < 500000L }.toLong
      }
    val gotKept = got.map(r => r._1 -> r._3).toMap
    assert(gotKept === want)
  }

  test("a target-like source keeps more than a raw-only source") {
    // disjoint vocabularies; the 'tgt' source IS the minority target
    val tDoc = (1 to 40).map(i => s"tgt$i").mkString(" ")
    val rDoc = (1 to 40).map(i => s"raw$i").mkString(" ")
    val docs = ((0 until 4).map(i => (i.toLong, tDoc, true, "tgtsrc")) ++
      (4 until 20).map(i => (i.toLong, rDoc, false, "rawsrc")))
      .toDF("doc_id", "text", "tgt", "source")
    val got = Corpus.dsirResample(docs, col("doc_id"), col("text"),
        isTarget = col("tgt"), col("source"))
      .select("source", "kept_ppm", "mean_millibits_all")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("tgtsrc")._3 > 0L && got("rawsrc")._3 < 0L)
    assert(got("tgtsrc")._2 > got("rawsrc")._2,
      "resampling must reshape toward the target source")
  }
}
