package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot-key workloads.
  *
  * At 100 TB a handful of hot keys (one viral document source, one
  * dominant region code) can pin a single reducer. Two standard
  * mitigations, both pure DataFrame recipes:
  *
  * - salted two-stage aggregation: shard each key across `salts`
  *   partial groups, then combine — the hot key's work spreads over
  *   `salts` reducers at the cost of one extra (tiny) shuffle stage.
  * - salted broadcast join (for joins where one side is small but the
  *   big side is skewed): explode the small side `salts` ways so the
  *   big side can carry a random salt in its key.
  *
  * AQE's skewedJoin handles sort-merge join skew automatically; these
  * recipes cover aggregation skew and pre-AQE plans.
  */
object Skew {

  /** Deterministic salt from the full row content. Salts derived from
    * partition ids or monotonically_increasing_id are NOT retry-stable:
    * if only some reducers refetch a re-generated map output, rows can
    * land in different salt groups than the surviving fetches saw —
    * the classic shuffle-nondeterminism correctness bug. Hashing row
    * content is stable under any recomputation (identical rows sharing
    * a salt group is harmless — distinct rows still spread).
    */
  private def rowSalt(df: DataFrame, salts: Int) =
    pmod(hash(df.columns.map(col): _*), lit(salts))

  /** Two-stage salted aggregation: COUNT and SUM decompose over
    * partial groups, so the result is exactly groupBy(key).agg(...).
    */
  def saltedCountSum(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      salts: Int = 16): DataFrame = {
    df
      .withColumn("_salt", rowSalt(df, salts))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(keyCol))
      .agg(sum("_n").as("n"), sum("_s").as("total"))
  }

  /** Salted equi-join of a skewed big side against a small dimension:
    * the dimension replicates `salts` times, the fact side picks a
    * deterministic pseudo-random salt, and the join key becomes
    * (key, salt) — splitting each hot key across `salts` tasks.
    */
  def saltedJoin(
      bigSkewed: DataFrame,
      smallDim: DataFrame,
      key: String,
      salts: Int = 16): DataFrame = {
    val saltedBig = bigSkewed.withColumn("_salt", rowSalt(bigSkewed, salts))
    val replicatedDim = smallDim.withColumn(
      "_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** HOT-KEY advisory report — the measurement half of the salting
    * story: the `topK` heaviest keys of a would-be shuffle key, each
    * with its integer share of the corpus and the salt count that
    * spreads it back to an average task's load
    * (`rec_salts = ceil(share · parallelism)` — a key holding 5% of
    * the rows on a 200-task shuffle needs ~10 salt groups; keys at or
    * under one task's fair share recommend 1, i.e. no salting). Run
    * this BEFORE keying a 100 TB aggregate/join on a new column; feed
    * the answer to [[saltedCountSum]]/[[saltedJoin]] or to AQE skew
    * thresholds.
    *
    * Shape: one map-side-combined key count, then a k-row
    * TakeOrdered — the full per-key frame never sorts globally and
    * never reaches the driver. Output:
    * (key, n, share_ppm, rec_salts), heaviest first.
    */
  def hotKeyReport(df: DataFrame, keyCol: String, topK: Int = 20,
                   parallelism: Int = 200): DataFrame = {
    require(topK >= 1 && parallelism >= 1,
      s"topK and parallelism must be >= 1, got $topK / $parallelism")
    val total = df.count()
    require(total > 0, "hotKeyReport needs a non-empty frame")
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"))
      .orderBy(col("n").desc, col(keyCol))
      .limit(topK)
      .withColumn("share_ppm", expr(s"(n * 1000000L) div ${total}L"))
      .withColumn("rec_salts", expr(
        s"greatest(1L, (n * ${parallelism}L + ${total}L - 1L) div ${total}L)"))
  }

  /** The ADVISORY LOOP closed: [[hotKeyReport]] measures, its
    * `rec_salts` column feeds a PER-KEY salted aggregation — each hot
    * key spreads over exactly the salt count its share demands, cold
    * keys (absent from the report, or at fair share) stay unsalted
    * (`rec_salts = 1` -> one partial group, no extra cost). The
    * result is exactly `groupBy(keyCol).agg(count, sum(valueCol))`:
    * COUNT and SUM decompose over partial groups regardless of how
    * many each key uses.
    *
    * Shape: one extra pass for the report (map-side-combined count +
    * k-row TakeOrdered), the k-row advice frame BROADCAST back onto
    * the corpus (never a corpus shuffle), then the two-stage salted
    * aggregate. The salt is content-hashed ([[rowSalt]]'s
    * retry-stability argument) modulo the key's own advised count.
    */
  def advisedCountSum(df: DataFrame, keyCol: String, valueCol: String,
                      topK: Int = 20, parallelism: Int = 200): DataFrame = {
    // advice column renamed on the way in: the input frame owns its
    // namespace (it may legitimately carry a `rec_salts` of its own)
    val advice = hotKeyReport(df, keyCol, topK, parallelism)
      .select(col(keyCol), col("rec_salts").as("_adv_salts"))
    df.join(broadcast(advice), Seq(keyCol), "left")
      .withColumn("_salt", pmod(hash(df.columns.map(col): _*),
        coalesce(col("_adv_salts"), lit(1L))))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(keyCol))
      .agg(sum("_n").as("n"), sum("_s").as("total"))
  }
}
