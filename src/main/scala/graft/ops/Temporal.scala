package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Slowly-changing-dimension (SCD type 2) and point-in-time (PIT)
  * temporal operators — the warehouse-side surface the reference's
  * last-writer-wins MERGE (`server.js:368-375`, re-expressed as the
  * q18 LWW window) stops short of: instead of keeping only the latest
  * version of a key, keep EVERY version as a validity interval and
  * answer "what was the state of key K at time T" joins.
  *
  * Scale shape: both builders are per-key windows — each key's change
  * history sorts within one task, keys spread hash-uniformly across
  * the shuffle. That is the standard (and correct) distribution for
  * dimension builds: a dimension key's history is bounded by its
  * change RATE, not by corpus size, so the per-task slice stays small
  * at 100 TB fact volume. The PIT join is an EQUI-join on the key with
  * the interval containment as a residual filter — SortMergeJoin /
  * broadcast on the dimension side, never a range-only
  * BroadcastNestedLoopJoin.
  */
object Temporal {

  /** Compress an append-only change log into SCD2 validity intervals.
    *
    * Rows of `log` are (keys..., state, ts, tie); consecutive rows of
    * a key with the SAME state collapse into one version (null-safe:
    * a run of null states is one version). Output: keys..., `state`,
    * `valid_from` (first ts of the run), `valid_to` (start of the next
    * run, null for the open current version), `version` (1-based per
    * key), `is_current`.
    *
    * `tieCol` must make (ts, tie) unique per key — determinism of the
    * interval boundaries under equal timestamps is the caller's
    * contract (the oracle replays the same order). The tie column is
    * consumed and dropped from the output.
    */
  def scd2(log: DataFrame, keys: Seq[String], stateCol: String,
           tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val changes = log
      .withColumn("_prev", lag(col(stateCol), 1).over(w))
      .withColumn("_rn", row_number().over(w))
      // null-safe change detection, with an explicit first-row marker:
      // lag() returns null on the first row, so a key whose history
      // STARTS with a null-state run would otherwise look like "no
      // change" under <=> and lose its first version
      .filter(col("_rn") === 1 || !(col("_prev") <=> col(stateCol)))
      .drop("_prev", "_rn")
    // the change rows keep (ts, tie) uniqueness, so the same order key
    // is valid for the version window
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumnRenamed(tsCol, "valid_from")
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tieCol)
  }

  /** Point-in-time join: each fact row picks the dimension version
    * whose [valid_from, valid_to) interval contains `factTsCol`
    * (left join — facts before the key's first version keep null
    * dimension columns). `dim` is an [[scd2]] output (or anything with
    * `valid_from`/`valid_to`); intervals must partition time per key,
    * which makes the match unique by construction.
    */
  def pointInTime(facts: DataFrame, dim: DataFrame,
                  keys: Seq[String], factTsCol: String): DataFrame = {
    val d = dim.columns.foldLeft(dim)((df, c) => df.withColumnRenamed(c, s"_d_$c"))
    val keyCond = keys.map(k => facts(k) === d(s"_d_$k")).reduce(_ && _)
    val cond = keyCond &&
      d("_d_valid_from") <= facts(factTsCol) &&
      (d("_d_valid_to").isNull || facts(factTsCol) < d("_d_valid_to"))
    val joined = facts.join(d, cond, "left")
    // strip the rename prefix, dropping the duplicated key columns
    dim.columns.foldLeft(joined) { (df, c) =>
      if (keys.contains(c)) df.drop(s"_d_$c")
      else df.withColumnRenamed(s"_d_$c", c)
    }
  }

  /** Merge a late-arriving batch of PARTIAL aggregates into a stored
    * rollup without rescanning the base corpus: both sides carry the
    * mergeable state (count + exact decimal sum per group), the merge
    * is a re-aggregation of their union. At warehouse scale the stored
    * side is dimension-sized (groups, not rows) and the late side is
    * the delta — the cost of keeping a 100 TB rollup current is
    * proportional to the groups the late data TOUCHES, never to the
    * corpus. Inputs and output share the schema
    * (groupCols..., n, sum_value); derived means are computed by the
    * reader, keeping the stored state algebraic.
    */
  def mergeRollup(stored: DataFrame, late: DataFrame,
                  groupCols: Seq[String]): DataFrame =
    stored.unionByName(late)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).cast("long").as("n"),
        sum(col("sum_value")).cast(StateDecimal).as("sum_value"))

  /** The rollup state's sum type is pinned so chained merges keep a
    * FIXED schema (Spark widens a decimal sum's precision by 10 per
    * aggregation — unpinned, every merge generation would drift). */
  private val StateDecimal = org.apache.spark.sql.types.DecimalType(35, 6)

  /** The partial-aggregate builder both rollup sides share: group
    * counts + order-independent exact sums (decimal, the house
    * float-determinism policy). */
  def rollupState(rows: DataFrame, groupCols: Seq[String],
                  valueCol: String): DataFrame =
    rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(25, 6)))
          .cast(StateDecimal).as("sum_value"))

  /** RETRACTION-AWARE [[rollupState]]: rows carry a multiplicity
    * (`signCol`, +1 insert / -1 delete — the CDC change-stream shape),
    * so `n` is the NET live count and `sum_value` the net sum. The
    * output schema matches [[rollupState]] exactly, which means
    * [[mergeRollup]] merges signed and unsigned states verbatim —
    * deletes flow through the same incremental-maintenance path as
    * appends, closing [[joinRollupDelta]]'s documented append-only
    * limit for the base-rollup case. Run [[compactRollup]] after a
    * merge to drop fully-retracted groups.
    */
  def rollupStateSigned(rows: DataFrame, groupCols: Seq[String],
                        valueCol: String, signCol: String): DataFrame =
    rows.groupBy(groupCols.map(col): _*)
      .agg(sum(col(signCol).cast("long")).cast("long").as("n"),
        sum((col(signCol) * col(valueCol))
          .cast(org.apache.spark.sql.types.DecimalType(25, 6)))
          .cast(StateDecimal).as("sum_value"))

  /** Drop fully-retracted groups (net count zero) from a rollup
    * state — the compaction that keeps a signed rollup's stored size
    * proportional to LIVE groups. Kept separate from the merge: a
    * group passing through zero mid-stream must still merge exactly.
    */
  def compactRollup(state: DataFrame): DataFrame =
    state.filter(col("n") =!= 0L)

  /** Bounded SCD2 back-fill: absorb STRAGGLERS (rows the streaming
    * maintainer dropped as older than the open version —
    * [[graft.streaming.Streams.streamingScd2]]'s documented limit)
    * by recomputing ONLY the keys the stragglers touch. Untouched
    * keys keep their stored dimension rows verbatim (anti join);
    * affected keys replay [[scd2]] over their full change-log slice
    * plus the stragglers (semi join bounds the replay input). The
    * result equals a full rebuild over log ∪ stragglers, at a cost
    * proportional to the CORRECTED keys — the partition-scoped-merge
    * discipline (Store.mergeWritePartitions) applied to the temporal
    * dimension.
    */
  def scd2Backfill(storedDim: DataFrame, log: DataFrame,
                   stragglers: DataFrame, keys: Seq[String],
                   stateCol: String, tsCol: String,
                   tieCol: String): DataFrame = {
    val affected = stragglers.select(keys.map(col): _*).distinct()
    val untouched = storedDim.join(affected, keys, "left_anti")
    val rebuilt = scd2(
      log.unionByName(stragglers).join(affected, keys, "left_semi"),
      keys, stateCol, tsCol, tieCol)
    untouched.unionByName(rebuilt)
  }

  /** The composed straggler-repair facade closing the streaming SCD2
    * loop ([[graft.streaming.Streams.streamingScd2]] documents the
    * drop; this routes it): detect out-of-order arrivals -> bounded
    * [[scd2Backfill]] -> a dimension equal to the full rebuild.
    *
    * `log` is the COMPLETE arrival log with `arrivalCol` recording
    * per-key arrival order (a monotone ingest sequence — offset,
    * batch id + row number). Detection re-derives the maintainer's
    * drop rule batch-agnostically: a row is flagged when some EARLIER
    * arrival of its key carried a later (ts, tie). This
    * over-approximates (a row the maintainer saved by within-batch
    * sorting is flagged too), which is harmless by construction — the
    * back-fill recomputes every affected key from its full log slice,
    * so extra flags only widen the bounded rebuild, never change the
    * answer. Cost stays proportional to keys with out-of-order
    * arrivals; the detection window is per-key in-task (the
    * dimension-build distribution argument at the top of this file).
    */
  def scd2Repair(storedDim: DataFrame, log: DataFrame, keys: Seq[String],
                 stateCol: String, tsCol: String, tieCol: String,
                 arrivalCol: String): DataFrame = {
    val prior = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(arrivalCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val flagged = log.withColumn("_max_prior",
      max(struct(col(tsCol), col(tieCol))).over(prior))
    val isStraggler = col("_max_prior").isNotNull &&
      struct(col(tsCol), col(tieCol)) < col("_max_prior")
    val stragglers = flagged.filter(isStraggler)
      .drop("_max_prior", arrivalCol)
    val absorbed = flagged.filter(!isStraggler)
      .drop("_max_prior", arrivalCol)
    scd2Backfill(storedDim, absorbed, stragglers, keys, stateCol, tsCol,
      tieCol)
  }

  /** Incremental JOIN-view maintenance (the classic delta identity):
    * with both sides of an INNER equi-join receiving late batches,
    * the stored rollup's increment is
    *
    *   Δ(L ⋈ R) = (ΔL ⋈ R_old) ∪ (L_old ⋈ ΔR) ∪ (ΔL ⋈ ΔR)
    *
    * returned here as mergeable rollup state ([[rollupState]] shape)
    * ready for [[mergeRollup]] into the stored rollup. At warehouse
    * scale every term joins a DELTA (small by definition) against a
    * base or another delta — the base never re-joins the base, which
    * is the entire point: keeping a 100 TB join rollup current costs
    * delta-proportional work. Broadcast the delta side when it fits;
    * the equi-join shape leaves that choice to the planner/AQE.
    *
    * Inner-join append-only semantics (no retractions): rows only
    * arrive, never update or delete — the matching assumption of the
    * monotone aggregates in [[rollupState]] (COUNT/SUM of appends).
    */
  def joinRollupDelta(leftOld: DataFrame, leftDelta: DataFrame,
                      rightOld: DataFrame, rightDelta: DataFrame,
                      joinKeys: Seq[String], groupCols: Seq[String],
                      valueCol: String): DataFrame = {
    def term(l: DataFrame, r: DataFrame) = l.join(r, joinKeys)
      .select((groupCols :+ valueCol).map(col): _*)
    rollupState(
      term(leftDelta, rightOld)
        .unionByName(term(leftOld, rightDelta))
        .unionByName(term(leftDelta, rightDelta)),
      groupCols, valueCol)
  }

  /** Purged time-series folds (the López de Prado purged-CV shape):
    * K TIME-CONTIGUOUS folds for leakage-safe temporal evaluation —
    * a random split leaks future into past; contiguous blocks fix
    * that, and the EMBARGO purges rows within `embargo` time units
    * of a fold boundary so label/feature windows that STRADDLE the
    * boundary can't leak either.
    *
    * Exact integer assignment: `fold = (ts - tmin) * k div span`
    * (span = tmax - tmin + 1; the same equi-width formula as
    * quantileBuckets' rank form, engine-portable, no float edges);
    * boundary j starts at `tmin + span * j div k`, and a row is
    * `purged` when `ts - ownBoundary < embargo` (fold > 0) or
    * `nextBoundary - ts <= embargo` (fold < k-1) — a row AT a
    * boundary has distance 0 and purges on the after side. tmin/tmax
    * are one bounded aggregate resolved to literals (the
    * coverageThresholds convention). Output: input id column +
    * `(fold, purged)` with purged as 0/1.
    */
  def purgedTimeFolds(df: DataFrame, idCol: String, tsCol: String,
                      k: Int, embargo: Long): DataFrame = {
    require(k >= 2 && k <= 64, s"k must be in [2, 64], got $k")
    require(embargo >= 0, s"embargo must be nonnegative, got $embargo")
    val r = df.agg(min(col(tsCol).cast(LongType)),
      max(col(tsCol).cast(LongType))).first()
    require(!r.isNullAt(0), "purgedTimeFolds: empty input")
    val (tmin, tmax) = (r.getLong(0), r.getLong(1))
    val span = tmax - tmin + 1
    df.select(col(idCol), col(tsCol).cast(LongType).as("_ts"))
      .withColumn("fold",
        expr(s"((_ts - ${tmin}L) * $k) div ${span}L"))
      .withColumn("_ownb",
        expr(s"${tmin}L + (${span}L * fold) div $k"))
      .withColumn("_nextb",
        expr(s"${tmin}L + (${span}L * (fold + 1)) div $k"))
      .withColumn("purged",
        when((col("fold") > 0 && col("_ts") - col("_ownb") < embargo) ||
          (col("fold") < k - 1 && col("_nextb") - col("_ts") <= embargo),
          1L).otherwise(0L))
      .select(col(idCol), col("fold"), col("purged"))
  }
}
