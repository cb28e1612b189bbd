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

  /** Per-column statistics panel: `(col_name, n_rows, n_nulls,
    * avg_len_milli, ndv_est)` — width in milli-chars of the string
    * form (integer, engine-exact), ndv from the deterministic HLL
    * registers (estimate; a column with no non-null values reports 0).
    *
    * Small-range rule: when few registers are occupied
    * (n_buckets * 4 <= m) the raw harmonic estimator is grossly biased
    * high (hllEstimate deliberately ships no ln-based linear counting),
    * but in that regime occupied-register count ~= the true distinct
    * count (collisions are rare at n << m) — so low-cardinality
    * columns (status flags, priorities) report their near-exact ndv
    * instead of a 15x overestimate. Integer rule, oracle-replayable.
    */
  def columnStats(df: DataFrame, cols: Seq[String], p: Int = 6): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val entries = cols.flatMap(c => Seq(lit(c), col(c).cast("string")))
    val melted = df.select(explode(map(entries: _*)).as(Seq("col_name", "value")))
    val base = melted.groupBy("col_name").agg(
      count(lit(1)).cast("long").as("n_rows"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).cast("long")
        .as("n_nulls"),
      sum(when(col("value").isNull, 0L)
        .otherwise(length(col("value")).cast("long"))).as("_len"),
      sum(when(col("value").isNull, 0L).otherwise(1L)).as("_nn"))
      .withColumn("avg_len_milli",
        expr("CASE WHEN _nn = 0 THEN 0L ELSE (_len * 1000L) div _nn END"))
      .drop("_len", "_nn")
    val m = 1L << p
    val ndv = Sketches.hllEstimate(
        Sketches.hllSketch(melted.filter(col("value").isNotNull),
          Seq("col_name"), "value", p),
        Seq("col_name"), p)
      .select(col("col_name").as("_c"),
        when(col("n_buckets") * 4 <= m, col("n_buckets"))
          .otherwise(col("est_distinct")).as("est_distinct"))
    base.join(ndv, col("col_name") === col("_c"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("avg_len_milli"),
        coalesce(col("est_distinct"), lit(0L)).as("ndv_est"))
  }

  /** Textbook equi-join cardinality estimate from the stats panel:
    * `|L ⋈ R on k| ≈ |L| * |R| / max(ndv_L(k), ndv_R(k))` — the
    * containment-of-value-sets assumption every cost-based optimizer
    * starts from (System R). Inputs are ONE-ROW frames; the estimate
    * is exactly what a planner would read off [[columnStats]] before
    * choosing join order and broadcast sides. Output: one row
    * `(n_left, n_right, ndv_left, ndv_right, est_rows)` — integer
    * arithmetic, oracle-replayable because the ndv comes from the
    * deterministic HLL panel.
    */
  /** Cluster-purity audit: per cluster, the dominant label's share —
    * the label-agreement number a curation team reads before trusting
    * unsupervised cells (topic buckets, SemDeDup groups, IVF cells)
    * for sampling decisions. Ties go to the SMALLEST label (integer
    * struct-max, deterministic). Two bounded aggregations over the
    * (cluster, label) contingency — cells ≤ rows, never a matrix
    * materialized per row. Output per cluster: n, top_label, top_n,
    * purity_ppm.
    */
  def clusterPurity(assigned: DataFrame, clusterCol: String,
                    labelCol: String): DataFrame =
    assigned.groupBy(col(clusterCol), col(labelCol).cast("long").as("_lab"))
      .agg(count(lit(1)).cast("long").as("_n"))
      .groupBy(col(clusterCol))
      .agg(sum("_n").cast("long").as("n"),
        max(struct(col("_n"), (-col("_lab")).as("_neg"))).as("_best"))
      .select(col(clusterCol), col("n"),
        (-col("_best._neg")).as("top_label"),
        col("_best._n").as("top_n"),
        expr("(_best._n * 1000000L) div n").as("purity_ppm"))

  /** Classifier confusion matrix: (true, predicted) cells with counts
    * and the row-normalized share (recall decomposition) in ppm — the
    * evaluation staple for the language-ID / quality-model gates. One
    * bounded aggregation + a classes-sized window.
    */
  def confusionMatrix(df: DataFrame, trueCol: String,
                      predCol: String): DataFrame =
    df.groupBy(col(trueCol).as("true_class"),
        col(predCol).as("predicted"))
      .agg(count(lit(1)).cast("long").as("n"))
      .withColumn("row_ppm",
        expr("(n * 1000000L) div sum(n) OVER (PARTITION BY true_class)"))

  def joinCardinality(left: DataFrame, leftKey: String,
                      right: DataFrame, rightKey: String,
                      p: Int = 6): DataFrame = {
    def side(df: DataFrame, key: String, nOut: String, dOut: String) =
      columnStats(df, Seq(key), p)
        .select(col("n_rows").as(nOut), col("ndv_est").as(dOut))
    side(left, leftKey, "n_left", "ndv_left")
      .crossJoin(side(right, rightKey, "n_right", "ndv_right"))
      .withColumn("est_rows", expr(
        "CASE WHEN greatest(ndv_left, ndv_right) = 0 THEN 0L" +
          " ELSE (n_left * n_right) div greatest(ndv_left, ndv_right) END"))
      .select("n_left", "n_right", "ndv_left", "ndv_right", "est_rows")
  }
}
