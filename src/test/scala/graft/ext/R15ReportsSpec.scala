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
}
