package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row of
  * the same key with right.ts <= left.ts.
  *
  * Implemented with the union+window technique: tag both inputs, union
  * them, sort per key by (ts, side) and carry the last seen right
  * payload forward with `last_value(ignoreNulls)`. This is the
  * scale-correct shape — ONE shuffle on the key and a per-partition
  * sort, no range-condition join (which Spark would plan as a
  * broadcast-nested-loop or an exploding theta join). Equivalent to
  * engines' native ASOF JOIN semantics (ties on ts: the right row
  * sorts before the left row, so same-instant rights match).
  */
object AsOfJoin {

  /** @param left      rows to enrich
    * @param right     reference rows (must be unique per (key, ts);
    *                  pre-aggregate otherwise)
    * @param key       equi-key column name present on both sides
    * @param ts        event-time column name present on both sides
    * @param payload   right-side columns to carry (renamed as-is onto
    *                  the output)
    */
  def asofLe(left: DataFrame, right: DataFrame, key: String, ts: String,
             payload: Seq[String]): DataFrame = {
    val lCols = left.columns
    // side 0 = right, 1 = left: at equal ts the right row sorts first,
    // so last_value at the left row sees it (<= semantics)
    val l = left.withColumn("_side", lit(1))
      .select((lCols.map(col) :+ col("_side")) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val r = right.select(
      (Seq(col(key), col(ts)) ++
        lCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("_side")) ++ payload.map(col): _*)
      .select((lCols.map(col) :+ col("_side")) ++ payload.map(col): _*)
    val unioned = l.unionByName(r)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // carry the payload as ONE struct so all columns come from the SAME
    // right row — per-column carry would mix rows whenever a payload
    // value is legitimately NULL
    val packed = unioned.withColumn("_payload",
      when(col("_side") === 0, struct(payload.map(col): _*)))
    val carried = packed.withColumn("_payload",
      last(col("_payload"), ignoreNulls = true).over(w))
    payload.foldLeft(carried) { (df, p) =>
      df.withColumn(p, col("_payload").getField(p))
    }.filter(col("_side") === 1).drop("_side", "_payload")
  }

  /** [[asofLe]] with a MAX-STALENESS bound — the semantics a
    * production enrichment actually wants: a reference row older than
    * `toleranceSec` is no better than no row (a price quote from last
    * month, a session attribute from a previous visit), so the match
    * is kept only when left.ts − right.ts <= toleranceSec. Same
    * union+window single-shuffle shape: the matched right TIMESTAMP
    * rides the carried payload struct (one extra field), and the
    * staleness test is a post-carry projection — no second join, no
    * range condition for the planner to explode. Payload columns of
    * an out-of-tolerance match come back NULL, and `asof_ts` is
    * NULLed with them so callers can tell "stale, rejected" from
    * "matched at t".
    *
    * The names `_asof_ts` (the internal carry) and `asof_ts` (the
    * output) are RESERVED: an input already carrying either would be
    * silently replaced by withColumn and then dropped/overwritten,
    * corrupting caller data — so their presence is rejected loudly
    * (r15, ADVICE; the same collision care [[asofLe]] takes with its
    * payload struct). */
  def asofLeWithin(left: DataFrame, right: DataFrame, key: String,
                   ts: String, payload: Seq[String],
                   toleranceSec: Long): DataFrame = {
    require(toleranceSec >= 0, "tolerance must be non-negative")
    for (reserved <- Seq("_asof_ts", "asof_ts"))
      require(!left.columns.contains(reserved) &&
        !right.columns.contains(reserved),
        s"asofLeWithin reserves the column name '$reserved'; rename it " +
          "on the input before joining")
    val withTs = right.withColumn("_asof_ts", col(ts).cast("long"))
    val joined = asofLe(left, withTs, key, ts, payload :+ "_asof_ts")
    val fresh = col("_asof_ts").isNotNull &&
      (col(ts).cast("long") - col("_asof_ts") <= toleranceSec)
    payload.foldLeft(joined) { (df, p) =>
      df.withColumn(p, when(fresh, col(p)))
    }.withColumn("asof_ts", when(fresh, col("_asof_ts")))
      .drop("_asof_ts")
  }
}
