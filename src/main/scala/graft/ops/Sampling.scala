package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data mixing operators: deterministic stratified sampling
  * and sequence packing — the two steps between a cleaned corpus and a
  * training batch stream.
  *
  * Both are scan-side or one-window operators: no RNG state (hash-based
  * sampling reproduces exactly across runs, engines, and retries — the
  * property that matters when a 100 TB sampling job is re-run after a
  * partial failure), no driver collects, no cartesians.
  */
object Sampling {

  /** Deterministic stratified sampling: keep a row iff
    * `hash32(md5(id)) % 1000 < rate_permille(stratum)`. The md5-derived
    * hash is uniform and engine-portable (same recipe as the dedup
    * pipeline's token hashes), so a rate of 0.25 keeps 25% ± binomial
    * noise of each stratum, the SAME 25% every run — sampling is a
    * pure filter in the scan, no shuffle, trivially scale-free.
    */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
                 ratesPermille: Map[String, Int],
                 defaultPermille: Int): DataFrame = {
    val permille: Column = ratesPermille.foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, p)) => when(col(strataCol) === stratum, lit(p)).otherwise(acc)
    }
    df.filter(
      pmod(graft.Pipeline.wordHash32(col(idCol).cast("string")), lit(1000L)) < permille)
  }

  /** Greedy contiguous sequence packing: within each stratum, rows in
    * `idCol` order are appended to a bin until the token budget is
    * crossed — `bin = cum_tokens_before div budget` (a doc that
    * straddles a boundary opens the next bin; a doc longer than the
    * budget gets its own bin plus spillover, the standard greedy
    * approximation).
    *
    * Strata are low-cardinality by construction (a handful of sources),
    * so a single `partitionBy(stratum)` window would serialize each
    * source's entire corpus through ONE task — a scale-killer at 100 TB.
    * Instead: two-pass hierarchical packing.
    *
    *  1. Range-partition by (stratum, id) into `chunks` contiguous
    *     slices; compute the cumulative-before sum LOCALLY per
    *     (chunk, stratum) — every chunk is an independent task.
    *  2. Aggregate per-(chunk, stratum) token totals — a tiny frame
    *     (chunks x strata rows) — and prefix-sum it per stratum to get
    *     each chunk's global offset; broadcast-join the offsets back.
    *
    * `bin = (offset + local_before) div budget` is identical to the
    * single-window form for ANY chunk boundary placement (prefix sums
    * compose), so the output is deterministic even though range
    * boundaries come from sampling. Exact integer `div`, not float
    * floor: bit-safe on every engine at any magnitude.
    */
  def packSequences(df: DataFrame, idCol: String, strataCol: String,
                    tokensCol: String, budget: Long, chunks: Int = 0): DataFrame = {
    val n = if (chunks > 0) chunks
            else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // persisted because BOTH branches below (the local window and the
    // per-chunk totals) read it: unpersisted, each branch plans its own
    // repartitionByRange, and each execution SAMPLES ITS OWN range
    // boundaries — on a non-order-stable input the two executions can
    // slice different chunks, so the joined offsets would describe
    // different chunks than _local_before was computed over (silently
    // wrong bins). One InMemoryRelation = one boundary sample = one
    // consistent chunking. Plan-keyed, so repeat builds share the entry;
    // dropped by Spark's context cleaner when the frame is unreferenced.
    val sliced = df
      .repartitionByRange(n, col(strataCol), col(idCol))
      .withColumn("_chunk", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val local = Window.partitionBy("_chunk", strataCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = sliced.withColumn(
      "_local_before", coalesce(sum(col(tokensCol)).over(local), lit(0L)))
    // chunks x strata rows: earlier-chunk totals per stratum = offset
    val offs = Window.partitionBy(strataCol).orderBy("_chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    // the chunk key is renamed on the offsets side so the join is on
    // two DISTINCT attributes — joining a column with itself relies on
    // fragile dataset-id disambiguation ("trivially true" warning)
    val offsets = sliced.groupBy(col("_chunk"), col(strataCol))
      .agg(sum(col(tokensCol)).as("_chunk_tot"))
      .withColumn("_offset", coalesce(sum(col("_chunk_tot")).over(offs), lit(0L)))
      .select(col("_chunk").as("_off_chunk"),
        col(strataCol).as("_off_stratum"), col("_offset"))
    withLocal
      .join(broadcast(offsets),
        col("_chunk") === col("_off_chunk") &&
          col(strataCol) <=> col("_off_stratum"))
      .withColumn("bin", expr(s"(_offset + _local_before) div $budget"))
      .drop("_chunk", "_local_before", "_off_chunk", "_off_stratum", "_offset")
  }
}
