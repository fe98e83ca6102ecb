package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join carries the whole latest right row, even with NULL payload values") {
    val left = Seq((1L, 25L, "e1"), (1L, 15L, "e2"), (2L, 5L, "e3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, Some(5.0), "a"), (1L, 20L, None, "b"))
      .toDF("k", "ts", "value", "note")
    val out = AsOfJoin.asofLe(left, right, "k", "ts", Seq("value", "note"))
      .orderBy("tag")
      .select("tag", "value", "note")
      .as[(String, Option[Double], Option[String])].collect().toSeq
    // e1 at ts=25 must get the ts=20 row AS A WHOLE: value NULL, note b
    // (not value 5.0 from ts=10 mixed with note b from ts=20)
    assert(out == Seq(
      ("e1", None, Some("b")),
      ("e2", Some(5.0), Some("a")),
      ("e3", None, None)))
  }

  test("same-instant right rows match (<= semantics)") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 10L, 7.0)).toDF("k", "ts", "value")
    val out = AsOfJoin.asofLe(left, right, "k", "ts", Seq("value"))
      .select("value").as[Option[Double]].head()
    assert(out.contains(7.0))
  }

  test("tolerance as-of: fresh matches keep payload + asof_ts, stale ones NULL both") {
    val left = Seq((1L, 100L, "e1"), (1L, 5000L, "e2"), (2L, 50L, "e3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 90L, 5.0), (1L, 95L, 7.0))
      .toDF("k", "ts", "value")
    val out = AsOfJoin.asofLeWithin(left, right, "k", "ts",
        Seq("value"), toleranceSec = 100L)
      .orderBy("tag").select("tag", "value", "asof_ts")
      .as[(String, Option[Double], Option[Long])].collect().toSeq
    assert(out == Seq(
      // ts=100 matches ts=95 (latest <=), 5s stale: kept, with the ts
      ("e1", Some(7.0), Some(95L)),
      // ts=5000 still MATCHES ts=95 positionally, but 4905s > 100s:
      // payload AND asof_ts come back NULL — stale is as good as none
      ("e2", None, None),
      ("e3", None, None)))
  }

  test("frame sampling handles empty payloads") {
    val out = Multimodal.frameSample(
      Seq((1L, ""), (2L, "x" * 100)).toDF("doc_id", "text"),
      chunkChars = 32, stride = 2)
      .orderBy("doc_id")
      .select("n_chunks", "n_sampled").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 0L), (4L, 2L)))
  }
}
