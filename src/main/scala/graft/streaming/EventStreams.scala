package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events table (SURVEY §2.10: the
  * reference is batch-only; this is the north-star extension). All logic is
  * expressed once and runs identically on a bounded directory (tests, the
  * driver gate) and an unbounded source — the Spark streaming model.
  *
  * Scale posture: windowed aggregates are keyed by (window, event_type) —
  * state is bounded by watermark eviction; sessionization keeps one state
  * object per active user, evicted by event-time timeout.
  */
object EventStreams {

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                            event_type: String, value: Double)

  final case class SessionAgg(user_id: Long, session_start: java.sql.Timestamp,
                              session_end: java.sql.Timestamp, n_events: Long,
                              total_value: Double)

  /** Internal per-user state (public: Catalyst's generated encoder code
    * must be able to reach the constructor).
    */
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** Streaming read of the events parquet in a scale-factor dir. The file's
    * `ts` physical type has drifted across testdata generations (NANOS long
    * vs MICROS timestamp), so the batch-probed schema decides the conversion
    * — same branch as [[graft.Tables.normalizeEventTs]], but surfacing a
    * session-tz TimestampType (streaming watermarks/windows require it; all
    * entry points pin UTC so values match the batch NTZ reader).
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    // same one-flag session requirement as the batch reader — ensured via
    // the documented initializer, never overriding an explicit setting
    graft.Tables.initEventCompat(spark)
    // `events.parquet` is a single FILE in the driver testdata but a
    // DIRECTORY of part files anywhere Spark wrote the table (every real
    // deployment): a file needs the glob-filtered read of its parent, a
    // directory is itself the stream source root (the sf1 probe surfaced
    // the directory case failing schema inference — the glob matched no
    // data file inside it).
    val raw = readParquetStream(spark, dir, "events.parquet")
    graft.Tables.normalizeEventTs(raw).withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Streaming read of any single-table parquet in a scale-factor dir —
    * the file-vs-directory branching the sf1 probe forced on the events
    * reader, factored for every table: driver testdata ships
    * `<name>.parquet` as a single FILE (glob-filtered read of its
    * parent), anything Spark wrote is a DIRECTORY of part files (itself
    * the stream source root).
    */
  def readParquetStream(spark: SparkSession, dir: String, name: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val isDir = p.getFileSystem(spark.sessionState.newHadoopConf())
      .getFileStatus(p).isDirectory
    if (isDir)
      spark.readStream.schema(spark.read.parquet(p.toString).schema)
        .parquet(p.toString)
    else
      spark.readStream
        .schema(spark.read.option("pathGlobFilter", name).parquet(dir).schema)
        .option("pathGlobFilter", name).parquet(dir)
  }

  /** Tumbling-window aggregate (event-time, watermarked). */
  def hourlyAggregates(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 6).as("total_value"))

  /** Stream-static enrichment: the unbounded stream joins a BOUNDED
    * dimension broadcast per micro-batch (the stream-static contract —
    * the static side never enters streaming state, and a dimension
    * update is picked up at the next batch), then aggregates by
    * (event-time window, dimension attribute). The canonical enrichment
    * shape: at any scale the dimension costs what a broadcast dim join
    * costs, and stream state stays (windows × attributes)-sized under
    * watermark eviction.
    */
  def enrichedHourlyAggregates(events: DataFrame, dim: DataFrame,
                               eventKey: String, dimKey: String, dimAttr: String,
                               watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(dim.select(col(dimKey), col(dimAttr))),
        col(eventKey) === col(dimKey))
      .groupBy(window(col("ts"), "1 hour"), col(dimAttr))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("total_value"))

  /** Sliding-window counts (1 hour window, 15 minute slide). */
  def slidingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  /** Stream-stream interval join: each view pairs with every purchase by
    * the same user in the preceding `lookback`. Both sides watermarked —
    * the event-time range condition lets Spark bound BOTH join states
    * (a purchase can be dropped once no future view can reach back to it),
    * so state stays proportional to the lookback window, not the stream
    * history. Inner join ⇒ append-mode output.
    */
  def viewPurchaseJoin(events: DataFrame, lookback: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("purchase_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    views.join(purchases,
      col("view_user") === col("purchase_user") &&
        col("purchase_ts") >= col("view_ts") - expr(s"INTERVAL $lookback") &&
        col("purchase_ts") <= col("view_ts"))
      .select(col("view_id"), col("view_user").as("user_id"), col("view_ts"),
        col("purchase_ts"), col("purchase_value"))
  }

  /** Session windows via the BUILT-IN `session_window` — the declarative
    * sibling of [[sessionize]]: one groupBy, no custom state code, and
    * the same merge rule (a pair exactly `gap` apart merges — probed and
    * spec-pinned; windows are [first, last + gap]). Works identically as
    * a batch aggregation and a watermarked streaming query — in batch
    * the watermark is a no-op. Prefer this form when the per-session
    * output is a plain aggregate; drop to [[sessionize]] only for
    * custom state transitions the aggregate language can't express.
    */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
                       watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("total_value"))
      .select(col("user_id"),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"), col("total_value"))
  }

  /** Stateful sessionization: one state object per user, sessions closed by
    * a `gapSeconds` quiet period or event-time timeout (watermark-driven).
    * The custom-state analog of the batch gaps-and-islands query (q18).
    */
  /** One buffered stage event: 0-based stage index + epoch-ms time. */
  final case class FunnelEv(stage: Int, tms: Long)
  /** Per-user funnel state: the buffered stage events. */
  final case class FunnelState(evs: List[FunnelEv])
  /** Per-user funnel report: stages completed in strict order (0..n). */
  final case class FunnelReach(user_id: Long, stages_completed: Int)

  /** STREAMING funnel — the per-user strict-order stage progression
    * ([[graft.ops.Funnel.funnelCounts]]'s recurrence) computed on the
    * live event stream: stage events buffer per user (the greedy
    * min-ts recurrence is a MULTISET function, so it cannot fold
    * incrementally under out-of-order arrival — buffering until the
    * user goes quiet is what makes the answer arrival-order-free), and
    * the user's report emits when their event-time timeout fires:
    * `gapSeconds` of event-time quiet, observed under the watermark.
    * Same emission semantics as [[sessionize]] on a bounded replay: a
    * user whose last stage event is too close to the stream's end
    * correctly stays in state awaiting more data, and the oracle
    * replays the same rule (last_ms + gap < max_ms − delay). State is
    * one entry per stage event of an active user — bounded by user
    * activity within the quiet window, never corpus-sized. The state
    * machine works in MILLISECONDS (Timestamp.getTime), so oracles
    * replay the recurrence in the ms domain (the q83 convention).
    */
  def funnelReach(events: Dataset[EventRow], stages: Seq[String],
                  gapSeconds: Long,
                  watermark: String = "2 hours"): Dataset[FunnelReach] = {
    import events.sparkSession.implicits._
    require(stages.nonEmpty, "need at least one stage")
    val idx = stages.zipWithIndex.toMap
    val gapMs = gapSeconds * 1000L

    def reached(evs: List[FunnelEv]): Int = {
      var prev = Long.MinValue
      var done = 0
      var i = 0
      while (i < stages.length) {
        val c = evs.iterator
          .filter(e => e.stage == i && (i == 0 || e.tms > prev))
          .map(_.tms)
        if (c.isEmpty) return done
        prev = c.min
        done = i + 1
        i += 1
      }
      done
    }

    events
      .filter(e => idx.contains(e.event_type))
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelReach](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[FunnelState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            val out = state.getOption
              .map(s => FunnelReach(userId, reached(s.evs))).toList
            state.remove()
            out.iterator
          } else {
            val add = rows
              .map(e => FunnelEv(idx(e.event_type), e.ts.getTime)).toList
            val evs = state.getOption.map(_.evs).getOrElse(Nil) ++ add
            state.update(FunnelState(evs))
            state.setTimeoutTimestamp(evs.iterator.map(_.tms).max + gapMs)
            Iterator.empty
          }
      }
  }

  def sessionize(events: Dataset[EventRow], gapSeconds: Long,
                 watermark: String = "2 hours"): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    def emit(userId: Long, s: SessionState): SessionAgg =
      SessionAgg(userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
        s.n, s.total)

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            val out = state.getOption.map(emit(userId, _)).toList
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var current = state.getOption
            val closed = List.newBuilder[SessionAgg]
            sorted.foreach { e =>
              val t = e.ts.getTime
              current match {
                case Some(s) if t - s.last <= gapMs =>
                  current = Some(s.copy(last = math.max(s.last, t), n = s.n + 1,
                    total = s.total + e.value))
                case Some(s) =>
                  closed += emit(userId, s)
                  current = Some(SessionState(t, t, 1, e.value))
                case None =>
                  current = Some(SessionState(t, t, 1, e.value))
              }
            }
            current match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.last + gapMs)
              case None => ()
            }
            closed.result().iterator
          }
      }
  }
}
