package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval joins at scale.
  *
  * Spark plans a bare `p.x BETWEEN i.lo AND i.hi` join condition as
  * broadcast-nested-loop (or cartesian when neither side broadcasts) —
  * every point row tested against every interval, the quadratic
  * blowup the as-of join already avoids for time alignment. The
  * bucket trick turns it into an EQUI-join: pick a bucket width, map
  * each point to `x div W`, explode each interval to the bucket range
  * it covers, hash-join on the bucket, and re-apply the exact
  * BETWEEN as a post-filter. Semantics are exactly the naive join's;
  * the cost is interval replication by ceil(span/W) — bounded and
  * chosen, not quadratic and forced. The IP-geo lookup, the
  * value-band classification, the genomic-interval overlap all ship
  * this shape.
  *
  * Picking W at 100 TB: W ~ the MEDIAN interval span keeps
  * replication ~2x while keeping each bucket's candidate set small;
  * the exact filter absorbs whatever the bucket granularity admits.
  * Skewed buckets (a bucket covered by many intervals AND dense in
  * points) are ordinary join skew — AQE splits them (see "Salted
  * join vs AQE" in SCALE.md).
  */
object RangeJoin {

  /** Inner join of `points` to every interval containing the point:
    * all columns of both inputs. `pointCol` and the interval bounds
    * must be non-negative integers (div-as-floor); bounds inclusive.
    * Degenerate inputs (lo > hi) yield no matches, as with BETWEEN. */
  def bucketedRangeJoin(points: DataFrame, intervals: DataFrame,
                        pointCol: String, loCol: String, hiCol: String,
                        bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketedRangeJoin needs a positive width")
    val p = points.withColumn("_bucket",
      shiftrightOrDiv(col(pointCol), bucketWidth))
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("_bucket", explode(sequence(
        shiftrightOrDiv(col(loCol), bucketWidth),
        shiftrightOrDiv(col(hiCol), bucketWidth))))
    p.join(iv, Seq("_bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bucket")
  }

  /** x div W for non-negative x: a power-of-two W compiles to a bit
    * shift; otherwise decimal128 division truncated to long (never a
    * double division — longs past 2^53 would silently lose low
    * bits). */
  private def shiftrightOrDiv(c: org.apache.spark.sql.Column,
                              w: Long): org.apache.spark.sql.Column =
    if ((w & (w - 1)) == 0)
      shiftright(c.cast("long"), java.lang.Long.numberOfTrailingZeros(w))
    else {
      // subtract the remainder first: the decimal division is then
      // exactly integral, so no rounding at any scale/width (a bare
      // x/w rounds HALF_UP at result scale and overshoots floor once
      // (w-1)/w crosses 0.9999995, i.e. w > 2e6)
      val x = c.cast("long")
      ((x - pmod(x, lit(w)))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)) / lit(w))
        .cast("long")
    }
}
