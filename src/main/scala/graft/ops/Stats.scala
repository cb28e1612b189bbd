package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Optimizer-statistics collection — the ANALYZE TABLE surface a
  * warehouse runs before join planning: per-column row/null counts,
  * average serialized width, and a DISTINCT-COUNT estimate from the
  * portable deterministic HyperLogLog ([[Sketches.hllSketch]] — the
  * same registers the oracle replays, unlike the built-in HLL++'s
  * opaque blob). These are the numbers behind broadcast-threshold
  * decisions, join reordering, and partition-count sizing.
  *
  * Shape at scale: ONE pass over the scan projection (the melt to
  * (column, value) multiplies rows by |cols| map-side — no extra scan,
  * no per-column job), then two bounded aggregates: the base panel is
  * |cols| rows, the HLL exchange carries <= 2^p rows per column.
  */
object Stats {

  /** Per-column statistics panel: `(column, n_rows, n_nulls,
    * avg_len_milli, ndv_est)` — width in milli-chars of the string
    * form (integer, engine-exact), ndv from the deterministic HLL
    * registers (estimate; a column with no non-null values reports 0).
    */
  def columnStats(df: DataFrame, cols: Seq[String], p: Int = 6): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val entries = cols.flatMap(c => Seq(lit(c), col(c).cast("string")))
    val melted = df.select(explode(map(entries: _*)).as(Seq("column", "value")))
    val base = melted.groupBy("column").agg(
      count(lit(1)).cast("long").as("n_rows"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).cast("long")
        .as("n_nulls"),
      sum(when(col("value").isNull, 0L)
        .otherwise(length(col("value")).cast("long"))).as("_len"),
      sum(when(col("value").isNull, 0L).otherwise(1L)).as("_nn"))
      .withColumn("avg_len_milli",
        expr("CASE WHEN _nn = 0 THEN 0L ELSE (_len * 1000L) div _nn END"))
      .drop("_len", "_nn")
    val ndv = Sketches.hllEstimate(
        Sketches.hllSketch(melted.filter(col("value").isNotNull),
          Seq("column"), "value", p),
        Seq("column"), p)
      .select(col("column").as("_c"), col("est_distinct"))
    base.join(ndv, col("column") === col("_c"), "left")
      .select(col("column"), col("n_rows"), col("n_nulls"),
        col("avg_len_milli"),
        coalesce(col("est_distinct"), lit(0L)).as("ndv_est"))
  }
}
