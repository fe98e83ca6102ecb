package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant specs for the round-9 sequence/robust-statistics registry
  * queries (MAD outliers, skip-gram pairs, hourly OHLC, Markov
  * transitions). The DuckDB oracle proves cross-engine equality; these
  * prove the semantics are the intended ones, not just mutually wrong.
  */
class SequenceStatsSpec extends SparkSpec {
  import spark.implicits._

  test("mad outliers replay the nearest-rank median-of-deviations") {
    val out = graft.registry.ExtQueries.queries("quality_outlier_mad")(
        spark, sf0001)
      .select(col("source"), col("n_tokens"), col("med"), col("mad"),
        col("is_outlier"))
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(out.nonEmpty)
    def nearestRankMedian(vs: Seq[Long]): Long = {
      val s = vs.sorted
      s(((s.length + 1) / 2 - 1).toInt)
    }
    out.groupBy(_._1).foreach { case (src, rows) =>
      val med = nearestRankMedian(rows.map(_._2).toSeq)
      val mad = nearestRankMedian(rows.map(r => math.abs(r._2 - med)).toSeq)
      rows.foreach { case (_, nt, m, a, flag) =>
        assert(m == med && a == mad,
          s"source $src stats ($m,$a) want ($med,$mad)")
        assert(flag == (math.abs(nt - med) > 3 * mad),
          s"source $src n_tokens=$nt flag=$flag with med=$med mad=$mad")
      }
    }
  }

  test("skip-gram pairs match brute-force +-2 window co-occurrence") {
    val out = graft.registry.ExtQueries.queries("vocab_skipgram_pairs")(
        spark, sf0001)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out.nonEmpty)
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("text")).as[String].collect()
    val counts = collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { tx =>
      val toks = tx.trim.split("\\s+", -1)
      for {
        i <- toks.indices; j <- toks.indices
        if i != j && math.abs(i - j) <= 2
      } counts((toks(i), toks(j))) =
        counts.getOrElse((toks(i), toks(j)), 0L) + 1L
    }
    val expect = counts.filter(_._2 >= 5L).toMap
    assert(out == expect,
      s"${out.size} pairs vs brute-force ${expect.size}")
  }

  test("hourly anomaly gate replays per-type medians over real hours") {
    val out = graft.registry.ExtQueries.queries("events_anomaly_mad")(
        spark, sf0001)
      .select(col("event_type"), col("hour"), col("n_events"),
        col("med"), col("mad"), col("is_anomaly"))
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    assert(out.nonEmpty)
    def nearestRankMedian(vs: Seq[Long]): Long = {
      val s = vs.sorted
      s((s.length + 1) / 2 - 1)
    }
    // the hourly frame itself must reconcile with the raw events
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_type"),
        expr("CAST(ts AS LONG) div 3600").as("hour"))
      .as[(String, Long)].collect()
    val expectCounts = ev.groupBy(identity).view.mapValues(_.length.toLong)
    out.foreach { case (t, h, n, _, _, _) =>
      assert(expectCounts((t, h)) == n, s"count mismatch at ($t,$h)")
    }
    assert(out.length == expectCounts.size, "one row per present (type, hour)")
    out.groupBy(_._1).foreach { case (t, rows) =>
      val med = nearestRankMedian(rows.map(_._3).toSeq)
      val mad = nearestRankMedian(rows.map(r => math.abs(r._3 - med)).toSeq)
      rows.foreach { case (_, h, n, m, a, flag) =>
        assert(m == med && a == mad, s"type $t stats ($m,$a) want ($med,$mad)")
        assert(flag == (math.abs(n - med) > 3 * mad),
          s"type $t hour $h n=$n flag=$flag with med=$med mad=$mad")
      }
    }
  }

  test("ohlc bars replay open/high/low/close for the busiest hour") {
    val out = graft.registry.ExtQueries.queries("window_ohlc_hourly")(
        spark, sf0001)
      .select(col("hour"), col("open_micro"), col("high_micro"),
        col("low_micro"), col("close_micro"), col("n_events"),
        col("vol_micro"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts").cast("long").as("ts_sec"),
        floor(col("value") * 1000000).cast("long").as("micro"))
      .as[(Long, Long, Long)].collect()
    val busiest = out.maxBy(_._6)._1
    val rows = ev.filter(r => r._2 / 3600 == busiest)
      .sortBy(r => (r._2, r._1))
    val bar = out.find(_._1 == busiest).get
    assert(bar._2 == rows.head._3, "open is not the earliest event")
    assert(bar._3 == rows.map(_._3).max, "high mismatch")
    assert(bar._4 == rows.map(_._3).min, "low mismatch")
    assert(bar._5 == rows.last._3, "close is not the latest event")
    assert(bar._6 == rows.length.toLong, "n_events mismatch")
    assert(bar._7 == rows.map(_._3).sum, "volume mismatch")
  }

  test("markov transitions row-normalize and count every adjacency") {
    val out = graft.registry.ExtQueries.queries(
        "events_markov_transitions")(spark, sf0001)
      .select(col("event_type"), col("next_type"), col("n"),
        col("total"), col("prob_ppm"))
      .as[(Option[String], Option[String], Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (from, rows) =>
      val t = rows.map(_._3).sum
      rows.foreach { case (_, _, n, total, ppm) =>
        assert(total == t, s"from=$from total $total != sum ${t}")
        assert(ppm == n * 1000000L / total, s"from=$from ppm off")
      }
    }
    // every user with k events contributes exactly k-1 transitions
    val ev = graft.Tables.events(spark, sf0001)
      .groupBy(col("user_id")).agg(count(lit(1)).as("k"))
      .agg(sum(col("k") - 1)).as[Long].head()
    assert(out.map(_._3).sum == ev,
      "transition mass != sum of per-user (k-1)")
  }
}
