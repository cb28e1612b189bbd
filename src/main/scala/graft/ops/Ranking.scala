package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
                      outCol: String = "pos", chunks: Int = 0): DataFrame = {
    val n = if (chunks > 0) chunks
            else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sliced = df
      .repartitionByRange(n, sort: _*)
      .withColumn("_chunk", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val local = Window.partitionBy("_chunk").orderBy(sort: _*)
    val withLocal = sliced.withColumn("_local_rn",
      row_number().over(local).cast("long"))
    val offs = Window.orderBy("_chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    // chunks rows: the offsets window is tiny by construction, so the
    // single-partition window here is a non-issue
    val offsets = sliced.groupBy(col("_chunk"))
      .agg(count(lit(1)).as("_chunk_n"))
      .withColumn("_offset", coalesce(sum(col("_chunk_n")).over(offs), lit(0L)))
      .select(col("_chunk").as("_off_chunk"), col("_offset"))
    withLocal
      .join(broadcast(offsets), col("_chunk") === col("_off_chunk"))
      .withColumn(outCol, col("_offset") + col("_local_rn"))
      .drop("_chunk", "_local_rn", "_off_chunk", "_offset")
  }
}
