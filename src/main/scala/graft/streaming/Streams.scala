package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface of the engine: event-time windowed
  * aggregation with watermarked late-data handling, and stateful gap
  * sessionization via flatMapGroupsWithState.
  *
  * The reference is batch-only (SURVEY.md §2.10 "Streaming: absent") — this
  * module is the capability extension the Spark-native engine gets from
  * Structured Streaming. Every transform here is source-agnostic: pass any
  * streaming DataFrame with (ts: timestamp, user_id: long, event_type:
  * string, value: double) — file source, Kafka-shaped source, or
  * MemoryStream in tests.
  *
  * Scale notes: windowed counts shuffle on (window, event_type) with
  * partial aggregation and state-store-backed incremental merge; the
  * watermark bounds state (windows older than watermark are evicted), which
  * is what makes unbounded streams tractable — state size is
  * O(active windows × types), not O(stream).
  */
object Streams {

  /** Hourly tumbling-window counts per event_type, tolerating `lateness`
    * of event-time disorder before dropping data (watermark).
    * Batch-equivalent: q41_event_hourly.
    */
  def hourlyCounts(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"))

  final case class SessEvent(user_id: Long, ts_us: Long)
  final case class SessState(sessions: Long, events: Long, lastTsUs: Long)
  final case class SessUpdate(user_id: Long, n_sessions: Long, n_events: Long)

  /** Stateful gap sessionization (batch-equivalent: q36_sessionize /
    * Events.sessionize): per-user session counting with a `gapSec`
    * inactivity gap, state kept per key in the state store and emitted on
    * every update (Update output mode).
    *
    * State is O(1) per user (three longs) — the mapGroupsWithState
    * contract that keeps this viable with hundreds of millions of keys.
    */
  def sessionizeStream(events: Dataset[SessEvent], gapSec: Long)(
      implicit s: SparkSession): Dataset[SessUpdate] = {
    import s.implicits._
    val gapUs = gapSec * 1000000L
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessState, SessUpdate](GroupStateTimeout.NoTimeout) {
        (uid, batch, state: GroupState[SessState]) =>
          // Within a micro-batch, order by event time (cross-batch disorder
          // beyond the gap is an accepted approximation of true streaming
          // sessionization; exact semantics need event-time timeouts).
          val evs = batch.toArray.sortBy(_.ts_us)
          var st = state.getOption.getOrElse(SessState(0L, 0L, Long.MinValue))
          evs.foreach { e =>
            val newSession = st.lastTsUs == Long.MinValue || e.ts_us - st.lastTsUs > gapUs
            st = SessState(
              st.sessions + (if (newSession) 1 else 0),
              st.events + 1,
              math.max(st.lastTsUs, e.ts_us))
          }
          state.update(st)
          SessUpdate(uid, st.sessions, st.events)
      }
  }

  /** Streaming exact deduplication: first occurrence of each `idCols` key
    * wins — the streaming face of the engine's exact-dedup operator, and
    * the standard exactly-once ingest guard for training-data pipelines.
    *
    * Uses `dropDuplicatesWithinWatermark`, NOT `dropDuplicates`: plain
    * dropDuplicates only evicts state when the event-time column is part of
    * the dedup keys, so with business keys like `event_id` its state grows
    * without bound on a real stream. The WithinWatermark variant evicts any
    * key once the watermark passes its event time, making state
    * O(keys seen within `lateness`) — the contract is "duplicates arriving
    * within the watermark delay of the first occurrence are dropped", which
    * is exactly the at-least-once-source dedup guarantee needed here.
    */
  def dedupStream(events: DataFrame, lateness: String, idCols: Seq[String]): DataFrame =
    events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(idCols)

  /** Watermarked stream-stream interval join: for each left event, right
    * events of the same key within `(l.ts, l.ts + windowSec]` — the
    * streaming form of the batch bucketed range join (Events
    * .windowedMatchCount). Both sides carry watermarks and the join
    * condition time-bounds both directions, so Spark can evict join state
    * (unbounded state is the failure mode of naive stream joins).
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
                         windowSec: Long, lateness: String): DataFrame = {
    val l = left.withWatermark("ts", lateness)
      .select(col(key).as("l_key"), col("ts").as("l_ts"), col("event_id").as("l_id"))
    val r = right.withWatermark("ts", lateness)
      .select(col(key).as("r_key"), col("ts").as("r_ts"), col("event_id").as("r_id"))
    l.join(r, expr(
      s"""l_key = r_key AND
         |r_ts > l_ts AND
         |r_ts <= l_ts + interval $windowSec seconds""".stripMargin))
  }

  /** Write helper: stream to an in-memory table (tests/interactive) in the
    * given output mode; production sinks swap `format`.
    */
  def toMemorySink(df: DataFrame, queryName: String, mode: OutputMode = OutputMode.Update()) =
    df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(mode)
      .start()
}
