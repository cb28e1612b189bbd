package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-LAYOUT operators: multi-dimensional clustering keys and the
  * file-level skipping audit that justifies them.
  *
  * At 100 TB the scan is the cost, and the scan is cheap only when the
  * writer clustered the data so readers can SKIP files: parquet min/max
  * footers prune a file iff the filtered column's values are locally
  * tight. A single-column sort makes ONE column tight; a Z-ORDER
  * (Morton) key interleaves the bits of several columns so every
  * interleaved dimension stays locally tight at once — the standard
  * multi-dimensional layout trick (used by Delta/Iceberg compaction)
  * expressed here as a pure Spark column + the range-partitioned write
  * path + an auditable per-file bounding-box report.
  */
object Layout {

  /** MORTON (Z-order) interleave of two non-negative dimension values,
    * `bits` bits each (bits <= 31; the result occupies 2*bits <= 62
    * bits, sign never touched). Dimension values must already be
    * bucketed/rank-encoded into [0, 2^bits) — interleaving raw skewed
    * values wastes high bits; interleaving ranks is what makes the
    * curve space-filling. Bit i of x lands at result bit 2i, bit i of
    * y at 2i+1. One codegen'd HOF per row; no shuffle, no UDF.
    * `x`/`y` are SQL expressions (the [[Sketches.bloomPositions]]
    * convention — the variable-amount shifts exist only in SQL form).
    */
  def zorderKey2(x: String, y: String, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    // fold over bit positions: acc | x_bit << 2i | y_bit << (2i+1)
    expr(
      s"""aggregate(sequence(0, ${bits - 1}), 0L, (acc, i) ->
            acc
            | shiftleft(shiftright(CAST(($x) AS BIGINT), i) & 1L, 2 * i)
            | shiftleft(shiftright(CAST(($y) AS BIGINT), i) & 1L, 2 * i + 1))""")
  }

  /** Z-ORDER FILE-LAYOUT AUDIT: lay the frame out along the Morton
    * curve of (xCol, yCol) in files of `rowsPerFile`, and report each
    * planned file's row count and per-dimension bounding box
    * (x_min..x_max, y_min..y_max) — the exact min/max a parquet footer
    * would carry, i.e. the data-skipping effectiveness of the layout,
    * auditable BEFORE burning a 100 TB rewrite. Under a Z-order both
    * boxes stay tight; under a one-column sort only that column's box
    * does — diff two audits to quantify the win.
    *
    * The global file assignment is rank/rowsPerFile under the total
    * order (z, x, y); the rank comes from [[Hierarchical.prefixSum]]
    * (range slices + broadcast offsets — never a single-task window).
    * Rows tying on (z, x, y) are interchangeable for every reported
    * statistic, so the output is deterministic even though their
    * relative order is not. Output: (file_id, n, x_min, x_max, y_min,
    * y_max), one row per planned file.
    */
  def zorderFileStatsReleasable(df: DataFrame, xCol: String, yCol: String,
                                bits: Int, rowsPerFile: Long,
                                chunks: Int = 0): (DataFrame, () => Unit) = {
    require(rowsPerFile >= 1, s"rowsPerFile must be >= 1, got $rowsPerFile")
    val z = df.select(col(xCol).cast("long").as("_x"),
        col(yCol).cast("long").as("_y"))
      .withColumn("_z", zorderKey2("_x", "_y", bits))
    val (ranked, release) = Hierarchical.prefixSum(z,
      Seq(col("_z"), col("_x"), col("_y")), Nil, lit(1L), "_rank", chunks)
    val stats = ranked
      .withColumn("file_id", expr(s"_rank div ${rowsPerFile}L"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).cast("long").as("n"),
        min(col("_x")).as("x_min"), max(col("_x")).as("x_max"),
        min(col("_y")).as("y_min"), max(col("_y")).as("y_max"))
    (stats, release)
  }

  /** Handle-less [[zorderFileStatsReleasable]] for one-shot jobs. */
  def zorderFileStats(df: DataFrame, xCol: String, yCol: String,
                      bits: Int, rowsPerFile: Long,
                      chunks: Int = 0): DataFrame =
    zorderFileStatsReleasable(df, xCol, yCol, bits, rowsPerFile, chunks)._1
}
