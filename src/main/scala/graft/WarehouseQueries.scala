package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-13 batch (q226+): warehouse-temporal surface (SCD2 validity
  * intervals, point-in-time fact joins, incremental rollup
  * maintenance) plus the platform operators a 100 TB corpus store
  * needs around them — privacy audits, graph structure metrics,
  * blocked record linkage, prefix-dimension retrieval audits.
  *
  * The reference keeps only the LATEST version of each row
  * (init_db.sql:21-36 upsert, re-expressed as q18's LWW window); this
  * family is the standard warehouse upgrade: keep every version as an
  * interval, answer "state of key K at time T", and keep derived
  * rollups current without rescanning the base.
  *
  * House discipline throughout: timestamps travel as epoch MICROS
  * bigints (the oracle's precision — see Tables.events), float
  * aggregation goes through DECIMAL(25,6), every sampling/tiebreak
  * decision is an md5-slot or id order both engines replay exactly.
  */
object WarehouseQueries {
  import Tables._

  /** Order-independent exact sum of a double expression (house rule —
    * see Queries.dsum). */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(25, 6))).cast(DoubleType)
  private def dsumSql(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(25,6))) AS DOUBLE)"

  // NOTE: `all` is declared at the BOTTOM of this object. Every query
  // here is a lazy val interpolating helper vals; a top-of-file
  // `val all = Seq(q226, ...)` would force those lazy vals BEFORE the
  // (textually later) helper vals initialize, interpolating literal
  // "null" into the oracle SQL.

  // The SCD2 compression as DuckDB CTEs over an `el` CTE with
  // (user_id, state, ts_us, event_id): change rows via IS DISTINCT
  // FROM (null-safe, same as the engine's <=> negation), intervals via
  // LEAD under the (ts_us, event_id) order the engine uses.
  private val Scd2Ctes = """
        ch AS (SELECT user_id, state, ts_us, event_id FROM (
                 SELECT el.*, LAG(state) OVER (PARTITION BY user_id
                   ORDER BY ts_us, event_id) AS prev FROM el)
               WHERE prev IS DISTINCT FROM state),
        vs AS (SELECT user_id, state, ts_us AS valid_from_us,
                 LEAD(ts_us) OVER (PARTITION BY user_id
                   ORDER BY ts_us, event_id) AS valid_to_us,
                 CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts_us, event_id) AS BIGINT) AS version
               FROM ch)"""

  /** SCD2 dimension build ([[ops.Temporal.scd2]]): the events stream
    * as a per-user change log (state = event_type), compressed into
    * validity intervals — consecutive equal states collapse, each
    * version carries [valid_from, valid_to) in epoch micros, the open
    * version is flagged current. The per-key window is the correct
    * scale shape for dimension builds: a key's history is bounded by
    * its change rate, not corpus size. Oracle replays the same
    * LAG-compress + LEAD-interval recipe.
    */
  private lazy val q226: QueryDef =
    QueryDef("q226_scd2_intervals",
      Some(s"""
        WITH el AS (SELECT user_id, event_type AS state, epoch_us(ts) AS ts_us,
                           event_id
                    FROM events),
        $Scd2Ctes
        SELECT user_id, version, state, valid_from_us, valid_to_us,
               valid_to_us IS NULL AS is_current
        FROM vs ORDER BY user_id, version"""),
      (s, d) => {
        val log = events(s, d).select(col("user_id"),
          col("event_type").as("state"),
          expr("ts_ns div 1000").as("ts_us"), col("event_id"))
        graft.ops.Temporal.scd2(log, Seq("user_id"), "state", "ts_us",
            "event_id")
          .select(col("user_id"), col("version"), col("state"),
            col("valid_from").as("valid_from_us"),
            col("valid_to").as("valid_to_us"), col("is_current"))
          .orderBy("user_id", "version")
      })

  /** Point-in-time fact join ([[ops.Temporal.pointInTime]]): tier
    * changes (signup/purchase events) build the SCD2 dimension;
    * engagement facts (click/view/error) each pick the tier valid AT
    * their timestamp — an equi-join on the key with interval
    * containment as residual filter, never a range-only nested loop.
    * Facts before a user's first tier version keep a null tier (left
    * join), so the report separates "pre-signup" traffic. Output is
    * the per-(tier, fact-type) volume — the shape a PIT audit reads.
    */
  private lazy val q227: QueryDef =
    QueryDef("q227_pit_join",
      Some(s"""
        WITH ev AS (SELECT user_id, event_type, value, epoch_us(ts) AS ts_us,
                           event_id
                    FROM events),
        el AS (SELECT user_id, event_type AS state, ts_us, event_id FROM ev
               WHERE event_type IN ('signup', 'purchase')),
        $Scd2Ctes,
        f AS (SELECT user_id, event_type, value, ts_us FROM ev
              WHERE event_type IN ('click', 'view', 'error'))
        SELECT vs.state AS tier, f.event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               ${dsumSql("f.value")} AS total_value
        FROM f LEFT JOIN vs ON f.user_id = vs.user_id
          AND vs.valid_from_us <= f.ts_us
          AND (vs.valid_to_us IS NULL OR f.ts_us < vs.valid_to_us)
        GROUP BY 1, 2 ORDER BY 1, 2"""),
      (s, d) => {
        val ev = events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
        val dim = graft.ops.Temporal.scd2(
          ev.filter(col("event_type").isin("signup", "purchase"))
            .select(col("user_id"), col("event_type").as("tier"),
              col("ts_us"), col("event_id")),
          Seq("user_id"), "tier", "ts_us", "event_id")
        val facts = ev.filter(col("event_type").isin("click", "view", "error"))
          .select("user_id", "event_type", "value", "ts_us")
        graft.ops.Temporal.pointInTime(facts, dim, Seq("user_id"), "ts_us")
          .groupBy("tier", "event_type")
          .agg(count(lit(1)).cast("long").as("n"),
            dsum(col("value")).as("total_value"))
          .orderBy("tier", "event_type")
      })

  /** Incremental rollup maintenance ([[ops.Temporal.rollupState]] +
    * [[ops.Temporal.mergeRollup]]): a stored daily rollup (events with
    * event_id % 5 != 0) absorbs a late-arriving batch (the % 5 == 0
    * slice) by merging PARTIAL aggregates — count + exact decimal sum
    * are mergeable state, so keeping a 100 TB corpus' rollup current
    * costs the groups the late data touches, never a rescan. The
    * oracle is the semantic claim itself: merge(partials) equals the
    * full recount.
    */
  private lazy val q228: QueryDef =
    QueryDef("q228_rollup_merge",
      Some(s"""
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               ${dsumSql("value")} AS total_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),
      (s, d) => {
        // day as a STRING key: the checker's pandas normalization reads
        // a DuckDB DATE back as midnight Timestamp, which would never
        // equal Spark's date32 — string out-keys are type-stable
        val ev = events(s, d)
          .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
            col("event_type"),
            col("value"), col("event_id"))
        def state(pred: Column) = graft.ops.Temporal.rollupState(
          ev.filter(pred), Seq("day", "event_type"), "value")
        val stored = state(col("event_id") % 5 =!= 0)
        val late = state(col("event_id") % 5 === 0)
        graft.ops.Temporal.mergeRollup(stored, late, Seq("day", "event_type"))
          .select(col("day"), col("event_type"), col("n"),
            col("sum_value").cast(DoubleType).as("total_value"))
          .orderBy("day", "event_type")
      })

  val all: Seq[QueryDef] = Seq(q226, q227, q228)
}
