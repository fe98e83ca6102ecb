package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch construction: assign documents
  * to fixed-token-budget bins so a training job reads whole bins
  * instead of re-shuffling documents.
  *
  * A GLOBAL greedy first-fit is inherently sequential (a single-
  * partition scan — the classic accidental scale-killer), so packing
  * here is partitioned: documents land in `nGroups` deterministic hash
  * groups ([[Sampling.bucket]] — stable across runs/engines), and an
  * EXACT greedy fold runs per group in parallel: a bin closes when the
  * next document would overflow the budget, so no bin ever exceeds
  * budgetTokens unless a single oversized document owns it. Bins never
  * cross groups.
  *
  * The per-group fold holds only (doc_id, n_tokens) tuples — never
  * text — so memory per group is ~16 bytes x docs/group; scale nGroups
  * with the corpus to bound it (10^5 groups puts a 10^9-doc corpus at
  * ~160 KB per task). */
object Packing {

  /** Pack-group count for a corpus of n documents: the power of two
    * that puts ~targetPerGroup docs in each hash group, clamped to
    * [minG, maxG]. Pure integer formula (ceil-log2 via bit length) so
    * a SQL oracle derives the identical count from count(*). Per-group
    * fold memory is ~16 bytes x targetPerGroup regardless of corpus
    * size — the group count, not the group size, absorbs growth. */
  def autoGroups(n: Long, targetPerGroup: Long = 64L, minG: Int = 8,
                 maxG: Int = 1 << 20): Int = {
    val m = (n + targetPerGroup - 1) / targetPerGroup
    val ceilLog2 =
      if (m <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    // shift in LONG: the SQL twin shifts a BIGINT, and an Int shift
    // wraps mod 32 — at n >= ~2^31*targetPerGroup docs it would return
    // minG (per-group memory blowup) exactly where maxG is the answer
    math.max(minG.toLong, math.min(maxG.toLong, 1L << ceilLog2)).toInt
  }

  /** (doc_id, n_tokens, pack_group, bin_id), documents packed greedily
    * in id order within their hash group. */
  def packSequences(df: DataFrame, id: Column, text: Column,
                    budgetTokens: Long, nGroups: Int = 256): DataFrame =
    packWithPositions(df, id, text, budgetTokens, nGroups)
      .drop("seq_start")

  /** [[packSequences]] plus each document's `seq_start` — its token
    * offset inside its bin. This is the artifact a training loader
    * actually consumes: (bin, offset) is the position map that turns
    * a packed bin into attention-mask / position-id boundaries
    * without re-tokenizing. Same fold, one extra running value. */
  def packWithPositions(df: DataFrame, id: Column, text: Column,
                        budgetTokens: Long, nGroups: Int = 256): DataFrame = {
    require(budgetTokens > 0 && nGroups > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val grouped = df.select(id.cast("long").as("doc_id"),
        TextOps.bpeCount(text).as("n_tokens"),
        (Sampling.bucket(id) % nGroups).as("pack_group"))
      .as[(Long, Long, Long)]
    grouped.groupByKey(_._3)
      .flatMapGroups { (g: Long, it: Iterator[(Long, Long, Long)]) =>
        val rows = it.toArray.sortBy(_._1)
        var bin = 0L
        var fill = 0L
        var first = true
        rows.iterator.map { case (docId, n, _) =>
          if (!first && fill + n > budgetTokens) { bin += 1; fill = 0L }
          first = false
          val start = fill
          fill += n
          (docId, n, g, bin, start)
        }
      }
      .toDF("doc_id", "n_tokens", "pack_group", "bin_id", "seq_start")
  }
}
