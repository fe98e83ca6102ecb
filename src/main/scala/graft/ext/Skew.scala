package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities.
  *
  * AQE's skew-join split handles most runtime skew, but a known-hot
  * key set (a handful of keys carrying a double-digit percentage of a
  * 100 TB fact) still serializes on the reducers that own those keys.
  * Salting spreads each hot key over `saltFactor` sub-keys: the fact
  * side gets a random-but-deterministic salt, the dim side is
  * replicated once per salt value. Semantics are identical to the
  * plain equi-join.
  */
object Skew {

  /** Inner equi-join with a salted key: `left` (large, possibly
    * skewed) joins `right` (replicated saltFactor times). The salt is
    * derived from a hash of the whole left row's key + a deterministic
    * spread column, so the same input always salts identically. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
                 rightKey: String, saltFactor: Int,
                 spread: Column): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(xxhash64(spread), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(typedlit((0 until saltFactor).toList)))
    salted.join(replicated,
      salted(leftKey) === replicated(rightKey)
        && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
