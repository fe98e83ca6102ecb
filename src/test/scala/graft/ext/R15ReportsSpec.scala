package graft.ext

import graft.SparkSpec

/** r15 report operators: the MIPS recall-vs-nProbe curve and the v3
  * curation funnel — structural invariants the hash gate cannot
  * express (monotonicity, bounds). */
class R15ReportsSpec extends SparkSpec {
  import spark.implicits._

  test("ann_mips_recall_report: recall is monotone in nProbe and bounded") {
    val rows = graft.registry.ExtQueriesSimilarity
      .queries("ann_mips_recall_report")(spark, sf0001)
      .select("n_probe", "matched", "total", "recall_ppm")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 4L))
    rows.foreach { case (_, m, t, r) =>
      assert(t > 0 && m >= 0 && m <= t)
      assert(r == m * 1000000L / t)
    }
    // probing MORE cells can only add candidates: recall must be
    // non-decreasing in nProbe (the dial the report exists to price)
    val recalls = rows.map(_._4).toSeq
    assert(recalls == recalls.sorted,
      s"recall not monotone in nProbe: $recalls")
  }

  test("corpus_curation_v3: funnel is monotone and anchored at the raw corpus") {
    val rows = graft.registry.ExtQueriesCorpus
      .queries("corpus_curation_v3")(spark, sf0001)
      .select("stage_idx", "stage", "n_docs", "n_tokens")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._2).toSeq ===
      Seq("raw", "line_dedup", "gopher_filter", "neardup_reps",
        "temp_mixture"))
    val raw = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(rows.head._3 === raw)
    // every stage only removes: docs and tokens non-increasing
    rows.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur._3 <= prev._3,
        s"stage ${cur._2} grew docs: ${prev._3} -> ${cur._3}")
      assert(cur._4 <= prev._4,
        s"stage ${cur._2} grew tokens: ${prev._4} -> ${cur._4}")
    }
    // the funnel must not degenerate: the composed chain keeps a
    // nonzero curated set on the driver corpus (the stop-hits dial)
    assert(rows.last._3 > 0, "curated output is empty")
  }

  test("corpus_curation_mm: funnel is monotone, anchored at the image slice, dedup collapses copies") {
    val rows = graft.registry.ExtQueriesSimilarity
      .queries("corpus_curation_mm")(spark, sf0001)
      .select("stage_idx", "stage", "n_items", "n_pixels")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._2).toSeq ===
      Seq("decode_profile", "size_gate", "brightness_gate",
        "phash_dedup", "temp_mixture"))
    // anchored at the dispatched image slice (doc_id % 3 == 0)
    val imgs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 0)
      .count()
    assert(rows.head._3 === imgs)
    // every stage only removes: items and pixel mass non-increasing
    rows.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur._3 <= prev._3,
        s"stage ${cur._2} grew items: ${prev._3} -> ${cur._3}")
      assert(cur._4 <= prev._4,
        s"stage ${cur._2} grew pixels: ${prev._4} -> ${cur._4}")
    }
    // the dedup stage must actually collapse the duplicate-upload
    // fixture (copies = doc_id % 97 share rasters): strictly fewer
    // keepers than gate survivors, bounded by the 97 seed classes
    val byStage = rows.map(r => r._2 -> r._3).toMap
    assert(byStage("phash_dedup") < byStage("brightness_gate"),
      "phash dedup removed nothing on a duplicate-heavy fixture")
    assert(byStage("phash_dedup") <= 97L,
      "more keepers than distinct seed rasters")
    assert(rows.last._3 > 0, "curated output is empty")
  }
}
