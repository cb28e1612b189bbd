package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import graft.wilayah.{Geo, Ingest, Model, Store}

/** Structured Streaming surface.
  *
  * The reference has no streaming (its "sync" is a blocking batch loop,
  * /root/reference/server.js:353-376, with a comment admitting a job
  * queue belongs there). These operators are the Spark-native upgrade a
  * continuously-fed corpus needs: incremental file ingest with the
  * batch engine's exact merge semantics, watermarked event-time
  * aggregation, streaming dedup, and custom keyed state.
  */
object Streams {

  // ===== incremental GeoJSON ingest (streaming /api/db/sync) =====

  /** Watch a directory for new GeoJSON files and merge each micro-batch
    * into the warehouse with the SAME last-writer-wins recipe as batch
    * sync (Store.merge) — foreachBatch reuses batch DataFrame code, so
    * stream and batch cannot diverge. `maxFilesPerTrigger` bounds
    * micro-batch size (at scale: predictable batch memory, steady
    * shuffle sizes).
    */
  def ingestStream(
      spark: SparkSession,
      watchDir: String,
      warehousePath: String,
      maxFilesPerTrigger: Int = 8,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val features = spark.readStream
      .schema(Model.featureCollectionSchema)
      .option("multiLine", true)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(watchDir)
      .select(
        element_at(split(input_file_name(), "/"), -1).as("file_name"),
        explode(col("features")).as("f"))
      .select(
        col("file_name"),
        Ingest.levelOfFileName(col("file_name")).as("level"),
        col("f.properties").as("p"),
        col("f.geometry").as("geometry"))

    val rows = Ingest.withKodeNama(features)
      .filter(Ingest.clean) // dirty keys / non-MultiPolygon -> quarantine
      .select(
        col("kode_wilayah_kemendagri"),
        col("nama_wilayah_kemendagri"),
        col("level"),
        Geo.normalizeToGeoJson(col("geometry.type"), col("geometry.coordinates"))
          .as("geometry"),
        current_timestamp().as("created_at"),
        current_timestamp().as("updated_at"))

    val writer = rows.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          Store.mergeWritePartitions(batch.sparkSession, batch, warehousePath)
      }
    // with a checkpoint the source offsets survive restarts: already-
    // ingested files are not re-read, and a replayed in-flight batch is
    // harmless because the merge is idempotent (last-writer-wins by key)
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d)).start()
  }

  // ===== event-time analytics =====

  /** Watermarked tumbling-window counts per event type: the canonical
    * late-data-tolerant streaming aggregate. State is bounded by the
    * watermark (10 min past window end gets dropped), so it runs
    * indefinitely at any input rate.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total"))

  /** Streaming exact dedup on a key with watermark-bounded state —
    * the streaming form of the exact-dedup batch operator (q24):
    * first occurrence wins, ANY later duplicate of the key within the
    * watermark horizon is dropped (regardless of its event time —
    * dropDuplicatesWithinWatermark keys state on the id alone, where
    * dropDuplicates(id, "ts") would only catch identical (id, ts)
    * pairs), and state older than the watermark is evicted.
    */
  def streamingDedup(docs: DataFrame, idCol: String): DataFrame =
    docs
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(idCol)

  /** Streaming CONTENT dedup: the canonical token-set fingerprint as
    * the dedup key, so reordered/duplicated text dedups on arrival
    * even when the copies carry different timestamps — the streaming
    * form of the fingerprint-dedup batch operator (q25).
    * Expects columns (ts, `textCol`).
    */
  def streamingFingerprintDedup(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("fp", graft.Pipeline.canonicalFingerprint(
        graft.Pipeline.words(col(textCol))))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")

  /** Stream-stream join: purchases joined to same-user clicks in the
    * preceding 5 minutes — the streaming form of the batch range join
    * (q42). Watermarks on BOTH sides bound the join state: a click
    * older than watermark - 5min can never match a future purchase and
    * is evicted. Columns: purchases(p_ts, user_id, p_id),
    * clicks(c_ts, c_user, c_id).
    */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame): DataFrame =
    purchases.withWatermark("p_ts", "10 minutes")
      .join(clicks.withWatermark("c_ts", "10 minutes"),
        expr("""
          user_id = c_user AND
          c_ts >= p_ts - INTERVAL 5 MINUTES AND
          c_ts < p_ts"""))
      .select(col("p_id"), col("user_id"), col("c_id"), col("p_ts"), col("c_ts"))

  // ===== custom keyed state =====

  case class KeyedEvent(user_id: Long, ts: Timestamp, value: Double)
  case class UserState(user_id: Long, n_events: Long, total: Double, last_ts: Timestamp)

  case class Session(user_id: Long, start: Timestamp, end: Timestamp, n_events: Long)
  // state classes must be encoder-visible (non-private): the state
  // serializer is codegen'd and cannot call private accessors
  case class SessionState(start: Long, end: Long, n: Long)

  /** Sessionization via flatMapGroupsWithState + event-time timeout:
    * events within `gapMinutes` of each other extend a session; a
    * larger gap (or the watermark passing the gap horizon) closes and
    * EMITS the session. The flatMap shape is what emit-on-close
    * requires — zero or many outputs per key per batch — and the
    * event-time timeout bounds state exactly like the watermark bounds
    * a windowed aggregate.
    */
  def userSessions(events: Dataset[KeyedEvent], gapMinutes: Int = 5): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60_000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[KeyedEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n))
          } else {
            val evs = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            evs.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Running per-user aggregate via mapGroupsWithState — the escape
    * hatch for state machines the built-in aggregates can't express
    * (sessionization, CDC-style upserts). Emits the updated state per
    * key per micro-batch. (Production long-runners would add an
    * event-time timeout for state eviction; a processing-time timeout
    * makes the engine self-trigger empty batches forever, which is
    * also why the test harness avoids it.)
    */
  def userRunningState(events: Dataset[KeyedEvent]): Dataset[UserState] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[KeyedEvent], state: GroupState[UserState]) =>
          val evs = batch.toSeq
          val prev = state.getOption.getOrElse(
            UserState(userId, 0L, 0.0, new Timestamp(0)))
          val next = UserState(
            userId,
            prev.n_events + evs.size,
            prev.total + evs.map(_.value).sum,
            evs.map(_.ts).maxByOption(_.getTime).getOrElse(prev.last_ts))
          state.update(next)
          next
      }
  }
}
