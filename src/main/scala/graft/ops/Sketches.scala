package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Pipeline.wordHash60
import graft.plans.GroupedTopK

/** Mergeable cardinality sketches.
  *
  * KMV (k-minimum-values): keep the k smallest DISTINCT 60-bit hashes
  * of a value per group; the k-th smallest estimates the distinct count
  * as `(k-1) * 2^60 / h_k` (the classic bottom-k estimator — the hash
  * space is uniform, so the k-th order statistic of n distinct draws
  * sits near `k/n` of the range). Groups with fewer than k distinct
  * values carry them all and the "estimate" is exact by construction.
  *
  * Why KMV and not HyperLogLog: `approx_count_distinct`'s HLL++ is the
  * right default inside one engine, but its register layout is not
  * replayable by any other engine — this sketch is DETERMINISTIC
  * (md5-derived hashes, integer estimator arithmetic), so the DuckDB
  * oracle replays the estimate bit-for-bit, and two engines sharing
  * the recipe can exchange sketches.
  *
  * Scale shape (the whole point at 100 TB): the sketch is a bounded
  * k-longs summary obtained without ever materializing the distinct
  * set in one place — a map-side-combined distinct on (group, hash)
  * followed by the [[GroupedTopK]] bounded-heap k-min (partial heaps
  * per partition, final heaps per group; never a global sort). Sketches
  * MERGE by re-minning the union ([[kmvMerge]]), so per-shard sketches
  * roll up to corpus totals through a k-longs-per-group exchange —
  * the distinct VALUES never travel, only sketches do.
  */
object Sketches {

  /** 2^60 — the hash-space size of [[graft.Pipeline.wordHash60]]. */
  private val HashSpace = 1152921504606846976L

  /** k smallest distinct hashes of `valueCol` per group, ascending.
    * Output: groupCols plus `kmv: array<long>` (length <= k).
    */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2 (the estimator divides by h_k), got $k")
    fromHashes(
      df.select((groupCols.map(col) :+
        wordHash60(col(valueCol).cast(StringType)).as("_h")): _*),
      groupCols, k)
  }

  /** Merge per-shard sketches (frames with a `kmv` column over the same
    * k) into one sketch per group: explode, distinct, re-min. Exactly
    * the sketch of the unioned inputs — bottom-k of a union is the
    * bottom-k of the pooled bottom-k's.
    */
  def kmvMerge(sketches: DataFrame, groupCols: Seq[String],
               k: Int): DataFrame =
    fromHashes(
      sketches.select((groupCols.map(col) :+
        explode(col("kmv")).as("_h")): _*),
      groupCols, k)

  /** Distinct-count estimate from a sketch: exact size when the group
    * never filled its k slots, else `(k-1) * 2^60 div h_k` — integer
    * arithmetic throughout (the product rides DECIMAL(38,0); `div`
    * lands on BIGINT), so every engine sharing the recipe computes the
    * identical estimate. Adds `est_distinct: bigint`.
    */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.withColumn("est_distinct",
      when(size(col("kmv")) < k, size(col("kmv")).cast(LongType))
        .otherwise(expr(
          // greatest(.,1): an all-but-impossible h_k = 0 (p ~ k/2^60)
          // must degrade to a huge estimate, not a division error
          s"CAST(${k - 1} AS DECIMAL(38,0)) * CAST($HashSpace AS DECIMAL(38,0))" +
            s" div greatest(element_at(kmv, $k), 1L)")))

  /** Shared tail: distinct (group, hash) -> bounded k-min heaps ->
    * one ascending array per group. The distinct is a map-side-combined
    * hash aggregate; the k-min is [[GroupedTopK]] with `largest=false`
    * (partial + final bounded heaps); the final `collect_list` holds at
    * most k longs per group.
    */
  private def fromHashes(hashes: DataFrame, groupCols: Seq[String],
                         k: Int): DataFrame =
    GroupedTopK.perKey(hashes.distinct(), groupCols, "_h", k, largest = false)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col("_h"))).as("kmv"))
}
