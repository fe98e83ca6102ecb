package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch construction: assign documents
  * to fixed-token-budget bins so a training job reads whole bins
  * instead of re-shuffling documents.
  *
  * A GLOBAL greedy first-fit is inherently sequential (a single-
  * partition window — the classic accidental scale-killer), so packing
  * here is partitioned: documents land in `nGroups` deterministic hash
  * groups ([[Sampling.bucket]] — stable across runs/engines), and the
  * greedy token cumsum runs per group in parallel. Bins never cross
  * groups; per-bin utilization stays near budget as long as documents
  * are small relative to it (oversized documents overflow their own
  * bin, the standard first-fit-by-order behavior). */
object Packing {

  /** (doc_id, n_tokens, pack_group, bin_id): bin = floor(tokens-before
    * / budget) within the doc's hash group, documents in id order. */
  def packSequences(df: DataFrame, id: Column, text: Column,
                    budgetTokens: Long, nGroups: Int = 256): DataFrame = {
    require(budgetTokens > 0 && nGroups > 0)
    val grouped = df.select(id.as("doc_id"),
      TextOps.bpeCount(text).as("n_tokens"),
      (Sampling.bucket(id) % nGroups).as("pack_group"))
    val w = Window.partitionBy(col("pack_group")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    grouped
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin_id",
        floor(col("tokens_before") / budgetTokens).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("pack_group"),
        col("bin_id"))
  }
}
