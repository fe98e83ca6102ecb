package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant specs for the round-9 context/statistics registry queries
  * (PMI collocations, text normalization, event context windows,
  * per-source winsorization). The DuckDB oracle proves cross-engine
  * equality; these prove the semantics are the intended ones, not just
  * mutually wrong.
  */
class ContextQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("pmi collocations replay the integer ratio against brute force") {
    val out = graft.registry.ExtQueries.queries("vocab_pmi_collocations")(
        spark, sf0001)
      .select(col("w1"), col("w2"), col("n12"), col("n1"), col("n2"),
        col("pmi_ppm"))
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // brute-force bigram counts from the raw text
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("text")).as[String].collect()
    val bigrams = texts.toSeq.flatMap { tx =>
      val toks = tx.trim.split("\\s+", -1).toSeq
      if (toks.length < 2) Seq.empty
      else toks.sliding(2).map { case Seq(a, b) => (a, b) }.toSeq
    }
    val cnt = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val m1 = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val m2 = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val total = bigrams.size.toLong
    val expect = cnt.filter(_._2 >= 5L).map { case ((a, b), n12) =>
      val ppm = (BigInt(total) * n12 * 1000000) / (BigInt(m1(a)) * m2(b))
      (a, b) -> (n12, m1(a), m2(b), ppm.toLong)
    }
    assert(out.length == expect.size,
      s"${out.length} rows vs brute-force ${expect.size}")
    out.foreach { case (a, b, n12, n1, n2, ppm) =>
      assert(expect((a, b)) == ((n12, n1, n2, ppm)),
        s"($a,$b): got ($n12,$n1,$n2,$ppm) want ${expect((a, b))}")
      assert(n12 <= math.min(n1, n2), s"($a,$b) joint exceeds a margin")
    }
  }

  test("normalized text is lowercase, single-spaced, length-consistent") {
    val out = graft.registry.ExtQueries.queries("text_normalize")(
        spark, sf0001)
      .select(col("doc_id"), col("norm_text"), col("n_chars_raw"),
        col("n_chars_norm"))
      .as[(Long, String, Long, Long)].collect()
    assert(out.nonEmpty)
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(out.length.toLong == nDocs, "normalization must keep every row")
    out.foreach { case (id, norm, raw, n) =>
      assert(norm == norm.toLowerCase, s"doc $id not lowercased")
      assert(!norm.contains("  "), s"doc $id has a double space")
      assert(norm == norm.trim, s"doc $id not trimmed")
      assert(n == norm.length.toLong, s"doc $id n_chars_norm mismatch")
      assert(n <= raw, s"doc $id normalization grew the text")
    }
  }

  test("event context window replays lag/lead for the busiest user") {
    val out = graft.registry.ExtQueries.queries("events_context_window")(
        spark, sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts_sec"), col("prev_type"), col("next_type"),
        col("prev_gap_sec"), col("next_gap_sec"))
      .as[(Long, Long, String, Long, Option[String], Option[String],
        Option[Long], Option[Long])].collect()
    assert(out.nonEmpty)
    val busiest = out.groupBy(_._2).maxBy(_._2.length)._1
    val rows = out.filter(_._2 == busiest)
      .sortBy(r => (r._4, r._1)) // the query's (ts_sec, event_id) order
    rows.zipWithIndex.foreach { case (r, i) =>
      val prev = if (i == 0) None else Some(rows(i - 1))
      val next = if (i == rows.length - 1) None else Some(rows(i + 1))
      assert(r._5 == prev.map(_._3), s"event ${r._1} prev_type wrong")
      assert(r._6 == next.map(_._3), s"event ${r._1} next_type wrong")
      assert(r._7 == prev.map(p => r._4 - p._4),
        s"event ${r._1} prev_gap wrong")
      assert(r._8 == next.map(nx => nx._4 - r._4),
        s"event ${r._1} next_gap wrong")
      assert(r._7.forall(_ >= 0) && r._8.forall(_ >= 0),
        s"event ${r._1} negative gap — order not total")
    }
  }

  test("winsorization clamps to the nearest-rank p05/p95 per source") {
    val out = graft.registry.ExtQueries.queries(
        "quality_winsorize_per_source")(spark, sf0001)
      .select(col("source"), col("n_tokens"), col("lo"), col("hi"),
        col("n_tokens_w"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (src, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length
      val expLo = sorted(((5 * n + 99) / 100 - 1).toInt)
      val expHi = sorted(((95 * n + 99) / 100 - 1).toInt)
      rows.foreach { case (_, nt, lo, hi, w) =>
        assert(lo == expLo && hi == expHi,
          s"source $src bounds ($lo,$hi) want ($expLo,$expHi)")
        assert(lo <= hi, s"source $src lo > hi")
        assert(w == math.max(lo, math.min(hi, nt)),
          s"source $src token count $nt clamped to $w")
      }
    }
  }
}
