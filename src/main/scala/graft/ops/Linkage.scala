package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi–Sunter 1969): score
  * candidate pairs of records from two registries by summing per-field
  * agreement weights, then band into match / possible / non-match by
  * two thresholds — the classic entity-resolution decision rule, and
  * the structured-data sibling of the text near-dup family
  * ([[graft.Dedup]]): blocking bounds the pair volume, a cheap score
  * triages, thresholds decide.
  *
  * Weights are INTEGER milli-log-odds (ln(m/u) * 1000 pre-computed by
  * the caller from known or estimated m/u probabilities) so the score
  * sum is exact integer arithmetic — order-independent, bit-identical
  * across engines (the house portability discipline; no runtime libm).
  */
object Linkage {

  /** One field comparison: `agree` is a boolean Column over the joined
    * (left ⋈ right) frame; a pair scores `wAgree` when it holds,
    * `wDisagree` when it does not (NULL comparisons score as
    * disagreement — the conservative FS convention for missing
    * fields). */
  final case class FieldRule(agree: Column, wAgree: Long, wDisagree: Long)

  /** Score all candidate pairs that share the `blockCols` tuple
    * (column names present in BOTH inputs — the caller derives them:
    * phonetic keys, geo cells, value bands). The join is a plain
    * equi-join on the block key, so the pair volume is sum over blocks
    * of |L_b| * |R_b| — blocking design bounds the cost, exactly like
    * the LSH band join; run [[Skew.hotKeyReport]] on a candidate block
    * key BEFORE paying a 100 TB linkage, and split hot blocks with a
    * second key (the q232 recipe bands on balance for this reason).
    *
    * Output: the joined pair columns plus `score` (milli-log-odds sum)
    * and `band` ('match' >= upper, 'possible' >= lower, else
    * 'non_match').
    */
  def fellegiSunter(left: DataFrame, right: DataFrame,
                    blockCols: Seq[String], rules: Seq[FieldRule],
                    upper: Long, lower: Long): DataFrame = {
    require(rules.nonEmpty, "at least one field rule")
    require(upper >= lower, s"upper ($upper) must be >= lower ($lower)")
    val score = rules
      .map(r => when(coalesce(r.agree, lit(false)), r.wAgree)
        .otherwise(r.wDisagree))
      .reduce(_ + _)
    left.join(right, blockCols)
      .withColumn("score", score.cast("long"))
      .withColumn("band",
        when(col("score") >= upper, "match")
          .when(col("score") >= lower, "possible")
          .otherwise("non_match"))
  }

  /** Sorted-neighborhood blocking (Hernández/Stolfo): sort the
    * registry by a fuzzy key (here: the caller's `sort` columns — a
    * phonetic code, a normalized name, a balance), then candidate
    * pairs are rows within `w` positions of each other — the blocking
    * that catches what HASH blocks miss (values that are CLOSE but not
    * equal land in adjacent positions, never in the same hash bucket).
    *
    * Scale shape: the global position comes from the hierarchical
    * prefix-sum scaffold (range slices + broadcast offsets — never a
    * single-task rank window); the neighborhood expands as an explode
    * of gap = 1..w-1 joined back on `pos + gap = pos` — an EQUI-join,
    * volume exactly n*(w-1). Output: every input column prefixed `a_`
    * / `b_`, plus `gap`. Pair it with [[fellegiSunter]]-style scoring
    * on the survivors.
    */
  def sortedNeighborhood(df: DataFrame, sort: Seq[Column],
                         w: Int): DataFrame = {
    require(w >= 2, s"window must be >= 2 rows, got $w")
    val pos = Ranking.globalRowNumber(df, sort, "_pos")
    def side(p: String) = df.columns.foldLeft(pos) {
      (d, c) => d.withColumnRenamed(c, s"$p$c")
    }
    val a = side("a_").withColumn("_gap",
        explode(expr(s"sequence(1L, ${w - 1}L)")))
      .withColumn("_probe", col("_pos") + col("_gap"))
    a.join(side("b_").withColumnRenamed("_pos", "_probe"), "_probe")
      .select(df.columns.map(c => col(s"a_$c")) ++
        df.columns.map(c => col(s"b_$c")) :+
        col("_gap").as("gap"): _*)
  }
}
