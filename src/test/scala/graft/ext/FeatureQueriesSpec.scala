package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant specs for the round-9 feature-engineering registry queries
  * (integer-exact TF-IDF, rolling range-frame features, ordered funnel).
  * The DuckDB oracle proves cross-engine equality; these prove the
  * semantics are the intended ones, not just mutually wrong.
  */
class FeatureQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf top terms: rnk is 1..k<=3 per doc, ordered by (score desc, token)") {
    val out = graft.registry.ExtQueries.queries("text_tfidf_top_terms")(
        spark, sf0001)
      .select(col("doc_id"), col("token"), col("score"), col("rnk"))
      .as[(Long, String, Long, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (doc, rows) =>
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1L to byRank.length).toSeq,
        s"doc $doc ranks not consecutive from 1")
      assert(byRank.length <= 3, s"doc $doc has ${byRank.length} terms")
      // total order: score desc, then token asc
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2),
            s"doc $doc order violated at rnk ${a._4}->${b._4}")
        case _ =>
      }
    }
  }

  test("rolling 7d counts replay exactly for the busiest user") {
    val out = graft.registry.ExtQueries.queries("window_rolling_counts")(
        spark, sf0001)
      .select(col("user_id"), col("ts_sec"), col("n_7d"))
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val busiest = out.groupBy(_._1).maxBy(_._2.length)._1
    val ts = out.filter(_._1 == busiest).map(_._2).sorted
    out.filter(_._1 == busiest).foreach { case (_, t, n) =>
      val expect = ts.count(u => u >= t - 7L * 86400 && u <= t)
      assert(n == expect, s"user $busiest at $t: n_7d=$n expected=$expect")
    }
  }

  test("funnel stages partition the distinct users and respect ordering") {
    val dir = sf0001
    val out = graft.registry.ExtQueries.queries("events_funnel")(spark, dir)
      .as[(String, Long)].collect().toMap
    val users = graft.Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(out.keySet.subsetOf(Set("view", "click", "purchase", "none")))
    assert(out.values.sum == users,
      s"stage counts ${out.values.sum} != distinct users $users")
    // a purchase-stage user must have had view<=click<=purchase in-order;
    // spot-verify via the raw events for one such chain existing at all
    if (out.getOrElse("purchase", 0L) > 0) {
      val ev = graft.Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"),
          col("ts").cast("long").as("ts_sec"))
        .as[(Long, String, Long)].collect().groupBy(_._1)
      val ordered = ev.values.exists { rows =>
        val v = rows.filter(_._2 == "view").map(_._3)
        if (v.isEmpty) false
        else {
          val vt = v.min
          val c = rows.filter(r => r._2 == "click" && r._3 >= vt).map(_._3)
          c.nonEmpty && rows.exists(r =>
            r._2 == "purchase" && r._3 >= c.min &&
              r._3 <= vt + 604800L)
        }
      }
      assert(ordered, "no user exhibits the view->click->purchase chain " +
        "the funnel claims to count")
    }
  }
}
