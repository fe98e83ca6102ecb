package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {

  private def cust = spark.read.parquet(s"$sf0001/customer.parquet")
    .filter(col("c_mktsegment") === "BUILDING")
    .select(col("c_custkey").cast("long").as("c_custkey"))

  private def orders = spark.read.parquet(s"$sf0001/orders.parquet")
    .select(col("o_custkey").cast("long").as("o_custkey"), col("o_orderkey"))

  test("bloom prefilter never drops a joining row (no false negatives)") {
    val bloom = Bloom.buildLongKeyFilter(cust, "c_custkey", cust.count())
    val pref = orders.filter(Bloom.mightContain(bloom, col("o_custkey")))
    val exact = orders.join(cust, col("o_custkey") === col("c_custkey"))
    val prefJoin = pref.join(cust, col("o_custkey") === col("c_custkey"))
    assert(prefJoin.count() === exact.count())
    // and the full row sets agree, not just the counts
    assert(prefJoin.exceptAll(exact).isEmpty && exact.exceptAll(prefJoin).isEmpty)
  }

  test("bloom prefilter prunes most non-joining fact rows before the join") {
    val bloom = Bloom.buildLongKeyFilter(cust, "c_custkey", cust.count())
    val n = orders.count()
    val kept = orders.filter(Bloom.mightContain(bloom, col("o_custkey"))).count()
    val joining = orders.join(cust, col("o_custkey") === col("c_custkey")).count()
    assert(kept >= joining, "filter dropped joining rows")
    // BUILDING is ~1/5 of customers; at fpp=0.01 the kept set must be
    // far below the full scan
    assert(kept < n / 2, s"no real pruning: kept $kept of $n")
  }

  test("the probe predicate stays inside whole-stage codegen") {
    val bloom = Bloom.buildLongKeyFilter(cust, "c_custkey", cust.count())
    val df = orders.filter(Bloom.mightContain(bloom, col("o_custkey")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), s"predicate missing:\n$plan")
    // the starred operator prefix is the whole-stage-codegen marker
    assert("""\*\(\d+\) Filter bloom_might_contain""".r
        .findFirstIn(plan).isDefined,
      s"probe fell out of codegen:\n$plan")
    // interpreted path agrees with codegen
    val viaEval = LongBloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(12345L), {
        val bos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(bos); bos.toByteArray
      }).eval(null)
    assert(viaEval === bloom.mightContainLong(12345L))
  }

  test("bloom-routed incremental dedup equals the plain anti-join") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = graft.registry.ExtQueries
      .queries("dedup_bloom_incremental")(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val corpusMd5 = docs.filter(col("doc_id") % 10 =!= 3)
      .select(md5(col("text")).as("m"))
    val want = docs.filter(col("doc_id") % 10 === 3)
      .join(corpusMd5, md5(col("text")) === col("m"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("filter size is capped at MaxBits regardless of requested items") {
    val tiny = Bloom.buildLongKeyFilter(cust, "c_custkey",
      expectedItems = 1L << 40)
    assert(tiny.bitSize() <= Bloom.MaxBits)
  }
}
