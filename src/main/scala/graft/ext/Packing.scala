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
    * in id order within their hash group ([[packWithPositions]]'
    * `largestFirst` switches to token-count-descending order — the
    * next-fit-decreasing heuristic). */
  def packSequences(df: DataFrame, id: Column, text: Column,
                    budgetTokens: Long, nGroups: Int = 256,
                    largestFirst: Boolean = false): DataFrame =
    packWithPositions(df, id, text, budgetTokens, nGroups, largestFirst)
      .drop("seq_start")

  /** [[packSequences]] plus each document's `seq_start` — its token
    * offset inside its bin. This is the artifact a training loader
    * actually consumes: (bin, offset) is the position map that turns
    * a packed bin into attention-mask / position-id boundaries
    * without re-tokenizing. Same fold, one extra running value.
    *
    * `largestFirst` packs each group in (n_tokens desc, doc_id) order
    * instead of id order — next-fit-DECREASING, the classic one-line
    * upgrade that cuts padding waste by letting small documents close
    * the gaps big ones leave. Same fold, same memory bound; the only
    * cost is that bins no longer preserve id locality. */
  def packWithPositions(df: DataFrame, id: Column, text: Column,
                        budgetTokens: Long, nGroups: Int = 256,
                        largestFirst: Boolean = false): DataFrame = {
    require(budgetTokens > 0 && nGroups > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val grouped = df.select(id.cast("long").as("doc_id"),
        TextOps.bpeCount(text).as("n_tokens"),
        (Sampling.bucket(id) % nGroups).as("pack_group"))
      .as[(Long, Long, Long)]
    grouped.groupByKey(_._3)
      .flatMapGroups { (g: Long, it: Iterator[(Long, Long, Long)]) =>
        val rows =
          if (largestFirst) it.toArray.sortBy(r => (-r._2, r._1))
          else it.toArray.sortBy(_._1)
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

  /** First-fit-decreasing packing — the real quality upgrade over the
    * next-fit fold: every bin stays OPEN, each document (visited in
    * (n_tokens desc, doc_id) order) lands in the FIRST bin with room,
    * and a new bin opens only when none fits. Next-fit's weakness is
    * that closing a bin forfeits its remaining headroom forever;
    * decreasing order alone cannot fix that (measured: NFD ~= NF on
    * the fixture corpus — see pack_ffd_report), keeping bins open is
    * what does. Classic bound: FFD <= 11/9 OPT + 6/9 (Johnson 1973).
    *
    * Same partitioned shape as [[packWithPositions]]: the fold holds
    * (doc_id, n_tokens) tuples plus one running fill per open bin —
    * O(bins/group) extra memory, bounded by docs/group; nGroups
    * absorbs corpus growth. A document larger than the budget opens
    * its own bin (same contract as the next-fit fold). */
  def packFirstFitDecreasing(df: DataFrame, id: Column, text: Column,
                             budgetTokens: Long,
                             nGroups: Int = 256): DataFrame = {
    require(budgetTokens > 0 && nGroups > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val grouped = df.select(id.cast("long").as("doc_id"),
        TextOps.bpeCount(text).as("n_tokens"),
        (Sampling.bucket(id) % nGroups).as("pack_group"))
      .as[(Long, Long, Long)]
    grouped.groupByKey(_._3)
      .flatMapGroups { (g: Long, it: Iterator[(Long, Long, Long)]) =>
        val rows = it.toArray.sortBy(r => (-r._2, r._1))
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        rows.iterator.map { case (docId, n, _) =>
          var idx = fills.indexWhere(_ + n <= budgetTokens)
          if (idx < 0) { fills += 0L; idx = fills.length - 1 }
          val start = fills(idx)
          fills(idx) += n
          (docId, n, g, idx.toLong, start)
        }
      }
      .toDF("doc_id", "n_tokens", "pack_group", "bin_id", "seq_start")
  }
}
