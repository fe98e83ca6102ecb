package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KeepFirstSpec extends SparkSpec {
  import spark.implicits._

  test("keepFirst == min_by(payload, struct(order)) on a mixed-type frame") {
    val df = (0 until 5000).map { i =>
      (i % 700, s"name_${(i * 37) % 991}", i.toLong, i.toDouble / 7,
        if (i % 11 == 0) null else s"v$i")
    }.toDF("k", "name", "ord", "score", "nullable_str")
    val payload = struct(df.columns.map(col): _*)
    val ours = df.groupBy(col("k"))
      .agg(KeepFirst.keepFirst(struct(col("ord")), payload).as("r"))
      .select(col("r.k"), col("r.name"), col("r.ord"), col("r.score"),
        col("r.nullable_str"))
    val minBy = df.groupBy(col("k"))
      .agg(min_by(payload, struct(col("ord"))).as("r"))
      .select(col("r.k"), col("r.name"), col("r.ord"), col("r.score"),
        col("r.nullable_str"))
    assert(ours.collect().toSet == minBy.collect().toSet)
  }

  test("strings survive buffer reuse across many groups (deep-copy pin)") {
    // many groups, distinct long-ish strings: a shallow copy into the
    // iterator's reused row buffer would surface as repeated/corrupt
    // strings in the output set
    val df = (0 until 20000)
      .map(i => (i % 4096, f"group_${i % 4096}%05d_payload_$i%07d", i))
      .toDF("k", "s", "ord")
    val out = df.groupBy(col("k"))
      .agg(KeepFirst.keepFirst(struct(col("ord")),
        struct(col("k"), col("s"))).as("r"))
      .select(col("r.s")).as[String].collect()
    assert(out.length == 4096)
    assert(out.distinct.length == 4096, "corrupt/duplicated strings")
    // keeper for group g is the first occurrence: i == g
    assert(out.forall { s =>
      val g = s.slice(6, 11).toInt
      s == f"group_$g%05d_payload_$g%07d"
    }, s"wrong keepers, e.g. ${out.take(3).toSeq}")
  }

  test("NULL order fields compare NULLS-FIRST, matching min_by on the struct wrap") {
    val df = Seq(
      (1, Some(5L), "five"),
      (1, None, "null_ord"), // struct(null) sorts FIRST -> the keeper
      (2, Some(2L), "two"),
      (2, Some(7L), "seven")
    ).toDF("k", "ord", "v")
    val got = df.groupBy(col("k"))
      .agg(KeepFirst.keepFirst(struct(col("ord")), struct(col("v"))).as("r"),
        min_by(struct(col("v")), struct(struct(col("ord")))).as("m"))
      .select(col("k"), col("r.v").as("ours"), col("m.v").as("minby"))
      .as[(Int, String, String)].collect()
      .map { case (k, o, m) => k -> (o, m) }.toMap
    assert(got(1) == (("null_ord", "null_ord")))
    assert(got(2) == (("two", "two")))
  }

  test("dedup plans as ObjectHashAggregate (never SortAggregate)") {
    val df = (0 until 1000).map(i => (i % 100, s"v$i", i.toLong))
      .toDF("pk", "v", "ord")
    val plan = graft.ops.Clean.dedupKeepFirst(df, Seq("pk"), col("ord"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"not hash-aggregated:\n$plan")
    assert(!plan.contains("SortAggregate"), s"sort crept back in:\n$plan")
    // and the session got its fallback threshold sized (default 128
    // would demote the hash map to sort-based merging immediately)
    assert(spark.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold").toInt
      > 100000)
  }
}
