package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Market-basket pair mining and ABC revenue classification — the
  * registered queries run against hand-computable fixtures (the
  * registry entries are inline compositions, so the spec drives them
  * through the public registry surface on a scratch sf dir). */
class BasketParetoSpec extends SparkSpec {
  import spark.implicits._

  /** Materialize a minimal lineitem parquet so the registry entry's
    * own loader reads the fixture. */
  private def liDir(rows: Seq[(Long, Long, Double, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bp").toString
    rows.toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_discount")
      .withColumn("l_suppkey", lit(1L))
      .withColumn("l_linenumber", lit(1))
      .withColumn("l_quantity", lit(1.0))
      .withColumn("l_tax", lit(0.0))
      .withColumn("l_returnflag", lit("N"))
      .withColumn("l_linestatus", lit("O"))
      .withColumn("l_shipdate", lit("2024-01-01").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def run(name: String, dir: String): DataFrame =
    graft.registry.ExtQueriesAnalytics.queries(name)(spark, dir)

  test("basket pairs: supports, min-support cut, confidence and lift") {
    // orders: 1:{A,B,C} 2:{A,B} 3:{A,C} 4:{B} — AB=2, AC=2, BC=1
    val a = 101L; val b = 102L; val c = 103L
    val dir = liDir(Seq(
      (1L, a, 10.0, 0.0), (1L, b, 10.0, 0.0), (1L, c, 10.0, 0.0),
      (2L, a, 10.0, 0.0), (2L, b, 10.0, 0.0),
      (3L, a, 10.0, 0.0), (3L, c, 10.0, 0.0),
      (4L, b, 10.0, 0.0)))
    val got = run("analytics_basket_pairs", dir)
      .select("part_a", "part_b", "n_pair", "n_a", "n_b", "lift_ppm",
        "conf_a_to_b_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.keySet === Set((a, b), (a, c)), "BC=1 is below min-support")
    // lift(AB) = (2/4) / ((3/4)(3/4)) = 8/9 -> 888888 ppm (floor)
    assert(got((a, b)) === ((a, b, 2L, 3L, 3L, 888888L, 666666L)))
    // lift(AC) = (2/4) / ((3/4)(2/4)) = 4/3 -> 1333333 ppm
    assert(got((a, c)) === ((a, c, 2L, 3L, 2L, 1333333L, 666666L)))
  }

  test("basket pairs: mega-baskets drop from the pair join, sizes stay pre-cap") {
    // order 1 is a 513-distinct-part degenerate basket (> the 512
    // cap); orders 2 and 3 are honest {A, B} baskets. The cap must
    // remove order 1's O(n^2) pair contribution while item counts and
    // the order denominator stay PRE-cap (conservative lower-bound
    // lift, the dedup df-cap contract).
    val mega = (1L to 513L).map(p => (1L, p, 1.0, 0.0))
    val dir = liDir(mega ++ Seq(
      (2L, 1L, 1.0, 0.0), (2L, 2L, 1.0, 0.0),
      (3L, 1L, 1.0, 0.0), (3L, 2L, 1.0, 0.0)))
    val got = run("analytics_basket_pairs", dir)
      .select("part_a", "part_b", "n_pair", "n_a", "n_b", "lift_ppm",
        "conf_a_to_b_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    // only (1,2) reaches support 2 — and at n_pair 2 (orders 2,3),
    // NOT 3: the mega-basket's copy is capped out of the join
    assert(got.toSeq === Seq((1L, 2L, 2L, 3L, 3L, 666666L, 666666L)))
  }

  test("pareto ABC: class bars at 80/95 on exact cents, shares sum") {
    // revenues: 800, 150, 30, 20 (total 1000): cum shares 80/95/98/100
    // -> A={800}, B={150}, C={30,20}
    val dir = liDir(Seq(
      (1L, 1L, 800.0, 0.0), (2L, 2L, 150.0, 0.0),
      (3L, 3L, 30.0, 0.0), (4L, 4L, 20.0, 0.0)))
    val got = run("analytics_pareto_abc", dir)
      .select("abc_class", "n_parts", "class_cents", "share_ppm")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("A") === ((1L, 80000L, 800000L)))
    assert(got("B") === ((1L, 15000L, 150000L)))
    assert(got("C") === ((2L, 5000L, 50000L)))
  }

  test("pareto ABC: bucket-decomposed cumulative equals a global sort") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val rev = li.groupBy(col("l_partkey").as("pkey"))
      .agg(sum(expr("CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100" +
        " + 0.5) AS BIGINT)")).as("rev"))
      .orderBy(col("rev").desc, col("pkey"))
      .as[(Long, Long)].collect()
    val total = rev.map(_._2).sum
    var cum = 0L
    val classes = rev.map { case (_, r) =>
      cum += r
      if (cum * 100 <= total * 80) "A"
      else if (cum * 100 <= total * 95) "B" else "C"
    }
    val want = classes.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong
    }
    val got = run("analytics_pareto_abc", dir)
      .select("abc_class", "n_parts").as[(String, Long)].collect().toMap
    assert(got === want)
  }
}
