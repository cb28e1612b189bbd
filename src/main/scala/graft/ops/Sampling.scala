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
    * approximation). ONE window (= one shuffle on the stratum key) over
    * exact integer arithmetic — the deterministic batch-construction
    * step a training pipeline runs after sampling.
    */
  def packSequences(df: DataFrame, idCol: String, strataCol: String,
                    tokensCol: String, budget: Long): DataFrame = {
    val before = Window.partitionBy(strataCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    // exact integer division (div), not float floor: bit-safe on every
    // engine at any magnitude
    df.withColumn("_cum_before", coalesce(sum(col(tokensCol)).over(before), lit(0L)))
      .withColumn("bin", expr(s"_cum_before div $budget"))
      .drop("_cum_before")
  }
}
