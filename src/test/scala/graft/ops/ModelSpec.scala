package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ModelSpec extends SparkSpec {
  import spark.implicits._

  private val asOf = Timestamp.valueOf("2026-01-09 00:00:00")

  test("tenure bucket boundaries: 90 is NEW, 91 REGULAR, 365 REGULAR, 366 LOYAL") {
    val got = Seq(89L, 90L, 91L, 365L, 366L).toDF("d")
      .select(Model.tenureBucket(col("d"))).as[String].collect()
    assert(got.toSeq == Seq("NEW", "NEW", "REGULAR", "REGULAR", "LOYAL"))
  }

  test("tenure days are elapsed-days floor, not calendar datediff") {
    // signup 2026-01-08 23:00 -> asOf 2026-01-09 00:00 is 1h elapsed:
    // datediff would say 1 day; elapsed-days floor says 0.
    val got = Seq("2026-01-08 23:00:00").toDF("s")
      .select(Model.tenureDays(to_timestamp(col("s")), asOf))
      .as[Long].head()
    assert(got == 0L)
  }

  test("price band boundaries: 500 LOW, 500.01 MEDIUM, 2000 MEDIUM, 2000.01 HIGH") {
    val got = Seq(500.0, 500.01, 2000.0, 2000.01).toDF("p")
      .select(Model.priceBand(col("p"))).as[String].collect()
    assert(got.toSeq == Seq("LOW", "MEDIUM", "MEDIUM", "HIGH"))
  }

  test("price exactly 2000 is not premium") {
    val got = Seq(2000.0, 2000.5).toDF("p")
      .select(Model.isPremium(col("p"))).as[Boolean].collect()
    assert(got.toSeq == Seq(false, true))
  }

  test("email domain is NULL when no @, suffix otherwise") {
    val got = Seq("a@b.com", "nodomain", "x@y@z").toDF("e")
      .select(Model.emailDomain(col("e"))).as[Option[String]].collect()
    assert(got.toSeq == Seq(Some("b.com"), None, Some("y")))
  }

  test("full name trims and coalesces nulls") {
    val got = Seq(("A", Some("B")), ("A", None))
      .toDF("f", "l")
      .select(Model.fullName(col("f"), col("l"))).as[String].collect()
    assert(got.toSeq == Seq("A B", "A"))
  }

  test("pandasDow maps Monday=0..Sunday=6") {
    // 2026-01-05 is a Monday
    val got = (5 to 11).map(i => f"2026-01-$i%02d").toDF("d")
      .select(Model.pandasDow(to_date(col("d")))).as[Int].collect()
    assert(got.toSeq == (0 to 6))
  }

  test("date dim spans inclusive range with weekend flags") {
    val dd = Model.dateDim(spark, java.sql.Date.valueOf("2026-01-01"),
      java.sql.Date.valueOf("2026-01-31"))
    assert(dd.count() == 31)
    val weekend = dd.filter(col("is_weekend"))
      .select(date_format(col("date"), "yyyy-MM-dd")).as[String]
      .collect().sorted
    // Jan 2026 weekends: 3,4,10,11,17,18,24,25,31
    assert(weekend.toSeq == Seq("2026-01-03", "2026-01-04", "2026-01-10",
      "2026-01-11", "2026-01-17", "2026-01-18", "2026-01-24", "2026-01-25",
      "2026-01-31"))
    assert(dd.filter(col("quarter") =!= 1).count() == 0)
  }

  test("store region map lookup fails loudly on unmapped state via gate") {
    val df = Seq("MH", "XX").toDF("state")
      .withColumn("store_region", Model.storeRegion(col("state")))
    assertThrows[DataQualityException] {
      Gates.requireNoUnmappedRegion(df)
    }
  }
}
