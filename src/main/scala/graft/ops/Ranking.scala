package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe GLOBAL ordering: assign each row its 1-based position in
  * a total order over the whole corpus — the curriculum-learning /
  * deterministic-training-order primitive ("feed the longest documents
  * first", "replay the corpus in quality order").
  *
  * A naive `row_number() OVER (ORDER BY ...)` is a single window
  * partition: the entire corpus serializes through ONE task — the same
  * scale-killer the packing operator had. Same cure, hierarchically:
  *
  *  1. `repartitionByRange` on the sort keys puts each task a
  *     contiguous slice of the global order; a LOCAL `row_number` per
  *     slice is embarrassingly parallel.
  *  2. Per-slice row counts (a `chunks`-row frame) prefix-sum into
  *     slice offsets, broadcast back: `pos = offset + local_rn`.
  *
  * Prefix sums compose for ANY boundary placement, so the result is
  * identical to the single-window form; the slice frame is persisted so
  * both consumers see ONE sampled set of range boundaries.
  */
object Ranking {

  /** Append `outCol` = global 1-based position under `sort`.
    *
    * `sort` must be a TOTAL order (include a unique key as the last
    * tiebreak) — under a partial order, rows equal on every key could
    * land on either side of a chunk boundary and swap positions between
    * runs.
    */
  def globalRowNumber(df: DataFrame, sort: Seq[Column],
                      outCol: String = "pos", chunks: Int = 0): DataFrame =
    globalRowNumberReleasable(df, sort, outCol, chunks)._1

  /** [[globalRowNumber]] plus the release handle for the internal
    * boundary-consistency cache ([[Hierarchical.prefixSum]]) — call it
    * once the ranked output is materialized. The handle-less form is
    * for one-shot jobs; a long-lived session ranking many distinct
    * corpora must release, or each call pins a full MEMORY_AND_DISK
    * copy of its input until session end.
    */
  def globalRowNumberReleasable(df: DataFrame, sort: Seq[Column],
                                outCol: String = "pos",
                                chunks: Int = 0): (DataFrame, () => Unit) = {
    // position = exclusive prefix COUNT under the total order, + 1
    val (pref, release) = Hierarchical.prefixSum(df, sort, Nil, lit(1L),
      "_before", chunks)
    (pref.withColumn(outCol, col("_before") + lit(1L)).drop("_before"), release)
  }
}
