package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Windows

/** The seasonally-adjusted streaming drift gate (stream_cusum_gate):
  * stream == batch parity, and the seasonal adjustment's defining
  * semantics — a purely diurnal series never alarms (its every hour
  * matches its own hour-of-day mean), while a genuine level shift
  * beyond the daily shape does. */
class StreamCusumGateSpec extends SparkSpec {
  import spark.implicits._

  test("stream_cusum_gate equals the batch seasonal CUSUM") {
    val streamed = graft.registry.StreamQueries
      .queries("stream_cusum_gate")(spark, sf0001)
    val batch = Windows.cusumSeasonal(
      graft.Tables.events(spark, sf0001), col("event_type"), col("ts"),
      lambda = 5L)
    val s = streamed.orderBy("key")
      .as[(String, Long, Long, Long, Long, Option[Long])].collect().toSeq
    val b = batch.orderBy("key")
      .as[(String, Long, Long, Long, Long, Option[Long])].collect().toSeq
    assert(s == b)
    // the parity above also pins the sentinel-watermark contract: if
    // the final real window failed to close (the filter-pushdown trap
    // — a pre-aggregation sentinel filter gets pushed below the
    // EventTimeWatermark node and the watermark never advances), the
    // streamed spine would be one hour short and every column of this
    // compare would drift.
    assert(s.nonEmpty)
  }

  test("purely diurnal series never alarms; a level shift does") {
    // 10 days x 24 hours, two keys. "diurnal": the same daily shape
    // every day (count = 10 + hod) — every hour equals its own
    // hour-of-day mean exactly, so every deviation is 0 and the
    // seasonal CUSUM stays at 0. "shifted": flat 10/hour for 5 days
    // then 30/hour — drift beyond any daily shape, must alarm.
    val hours = (0 until 10 * 24).map(h => h.toLong * 3600L)
    val rows =
      hours.map(e => ("diurnal", e, 10L + (e % 86400L) / 3600L)) ++
        hours.map(e => ("shifted", e, if (e < 5 * 86400L) 10L else 30L))
    val counts = rows.toDF("k", "epoch", "n")
    val out = Windows.cusumSeasonalFromCounts(counts, lambda = 1L)
      .orderBy("key")
      .as[(String, Long, Long, Long, Long, Option[Long])].collect().toSeq
    val diurnal = out.find(_._1 == "diurnal").get
    val shifted = out.find(_._1 == "shifted").get
    assert(diurnal._4 == 0L, "diurnal series must not alarm")
    assert(diurnal._5 == 0L, "diurnal series must have zero max cusum")
    assert(shifted._4 > 0L, "level shift must alarm")
    // the first alarm lands after the shift point, never before
    assert(shifted._6.exists(_ >= 5 * 86400L))
    // spine integrity: both keys cover the full 240-hour spine
    assert(out.forall(_._2 == 240L))
  }

  test("flat CUSUM on the same diurnal series WOULD alarm (the gap the seasonal variant closes)") {
    // the same diurnal shape pushed through the FLAT cusum
    // (cusumChangepoint's reference level = the global hourly mean):
    // peak hours sit persistently above the flat mean, so the flat
    // monitor accumulates and alarms on pure seasonality — the false
    // positive the hod-normalized gate exists to remove.
    val hours = (0 until 10 * 24).map(h => h.toLong * 3600L)
    val ev = hours.flatMap { e =>
      val n = (10L + (e % 86400L) / 3600L).toInt
      Seq.fill(n)(("diurnal", e))
    }.toDF("k", "sec")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"))
    val flat = Windows.cusumChangepoint(ev, col("k"), col("ts"),
      lambda = 1L)
    val nAlarm = flat.select(col("n_alarm_hours")).as[Long].head()
    assert(nAlarm > 0L,
      "flat cusum should false-positive on pure diurnal seasonality")
  }
}
