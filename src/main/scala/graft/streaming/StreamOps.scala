package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One input event (schema of the driver's `events` table). */
case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                 event_type: String, value: Double)

/** Per-user running aggregate emitted by the stateful stream. */
case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

/** One CDC change (the [[graft.operators.EventOps.cdcSnapshot]] feed
  * shape): op 'u' = upsert, 'd' = delete tombstone. */
case class Change(user_id: Long, id: Long, ts_us: Long, op: String,
                  state_cents: Long)

/** Running per-key count (the streaming heavy-hitter state/output). */
case class KeyCount(k: Long, freq: Long)

/** Structured Streaming operators (BASELINE stretch scope; the reference is
  * batch-only — SURVEY.md §2.9 — so these extend the engine beyond parity:
  * the same event schema, processed incrementally).
  *
  * Everything here is expressed on an unbounded DataFrame exactly like its
  * batch twin (`readStream` swaps in for `read`); Spark maintains the
  * incremental state. Watermarks bound that state — without one, a
  * windowed aggregation on an unbounded stream grows forever.
  */
object StreamOps {

  /** Windowed event counts + value sums per event_type: 10-minute tumbling
    * windows, 20-minute watermark (late rows beyond it are dropped and
    * their windows finalized — bounded state at any scale). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "20 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100)) / 100).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Arbitrary-state streaming: per-user running totals via
    * mapGroupsWithState — the engine's custom-state surface (session
    * aggregates, dedup-within-horizon, etc. all take this shape).
    *
    * With `idleTimeout = Some(d)` (the production setting) state
    * SELF-EXPIRES via processing-time timeout: an idle key emits its final
    * total and releases its slot, so memory is bounded by the
    * recently-active key set. Note the trade: registered timeouts keep the
    * micro-batch engine scheduling wake-up batches, so the query never
    * fully idles (`processAllAvailable` won't settle — which is why tests
    * and bounded-key workloads use `None` = no timeout, where state is
    * bounded by the total key set instead). */
  def userRunningTotals(events: Dataset[Event],
                        idleTimeout: Option[String] = Some("30 minutes")): Dataset[UserTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(timeoutConf) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserTotal]) =>
          if (state.hasTimedOut) {
            // idle key: emit the final total and release the state
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(UserTotal(userId, 0L, 0.0))
            val batch = rows.toSeq
            val next = UserTotal(userId,
              prev.n_events + batch.size,
              prev.total_value + batch.map(e => math.round(e.value * 100).toDouble / 100).sum)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            next
          }
      }
  }

  /** Streaming exact-dedup within the watermark horizon: drop events whose
    * (event_id) was already seen — the streaming twin of q30's batch dedup
    * (Spark tracks seen keys as watermark-bounded state). */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "20 minutes")
      .dropDuplicates("event_id")

  /** [[dedupStream]] with BOUNDED state — the production form. Plain
    * `dropDuplicates("event_id")` only evicts a key's state if the
    * event-time column is part of the dedup key, so id-only dedup state
    * grows forever; `dropDuplicatesWithinWatermark` guarantees eviction
    * once the watermark passes the key's event time while still deduping
    * on the id alone. The contract weakens explicitly: duplicates are
    * dropped only within the horizon (at-least-once sources retry within
    * seconds, so a horizon of minutes bounds state at
    * O(arrival-rate × horizon) instead of O(stream length)) — a replay
    * older than the horizon re-emits, which the spec pins as semantics,
    * not a bug. */
  def dedupBoundedStream(events: DataFrame,
                         horizon: String = "20 minutes"): DataFrame =
    events.withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming corpus intake — the streaming twin of the batch
    * corpus-clean pipeline's first two stages (exact dedup + quality
    * gate): drop any document whose md5(text) was already seen, then gate
    * on a minimum space-separated token count (TextOps.words — the single
    * tokenizer definition the oracle mirrors as string_split(text, ' ')).
    * Works identically on a bounded DataFrame (the batch twin — same
    * function, `read` instead of `readStream`).
    *
    * No watermark on the dedup: a content duplicate can arrive arbitrarily
    * late, so the seen-hash state is inherently unbounded — production
    * bounds it with a TTL'd state store or an upstream bloom pre-filter,
    * both of which trade recall for memory explicitly rather than
    * silently. */
  def cleanDocStream(docs: DataFrame, minTokens: Int = 20): DataFrame =
    docs
      .withColumn("text_hash", md5(col("text")))
      .dropDuplicates("text_hash")
      .filter(size(graft.operators.TextOps.words(col("text"))) >= minTokens)

  /** Streaming CDC compaction — the incremental twin of
    * [[graft.operators.EventOps.cdcSnapshot]]: per key, keep the change
    * with the greatest (ts_us, id) as mapGroupsWithState state and emit
    * it on every update (Update output mode = a changelog of the
    * snapshot). Tombstones ('d') are CARRIED, not dropped: the emitted
    * row's op tells the sink to delete, exactly like a compacted log —
    * the batch twin's final filter (op <> 'd') is the sink's contract,
    * asserted as twin-equality in StreamOpsSpec.
    *
    * Out-of-order safe: a late change with a smaller (ts_us, id) loses
    * against the stored winner no matter which micro-batch it arrives
    * in, so the snapshot converges to the batch answer for ANY arrival
    * order — which is why no watermark is needed for correctness (state
    * is one row per live key, the same as the snapshot itself). */
  def cdcSnapshotStream(changes: Dataset[Change]): Dataset[Change] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[Change], state: GroupState[Change]) =>
          val best = (state.getOption.iterator ++ rows)
            .maxBy(c => (c.ts_us, c.id))
          state.update(best)
          best
      }
  }

  /** Streaming gap-based sessionization via the built-in `session_window`
    * (merge-on-overlap session state, watermark-closed): per (user_id,
    * session) event counts, bounds, and integer-cents value sums — the
    * streaming twin of [[graft.operators.EventOps.sessionize]].
    *
    * Boundary semantics: `session_window(gap)` MERGES two events when
    * their timestamp difference is strictly < gap; the batch operator
    * merges on difference <= gapUs. The twin equivalence is therefore
    * session_window(gap) == sessionize(gap − 1 µs) — asserted in
    * StreamOpsSpec; at-the-boundary gaps are the only divergence, and
    * real gap thresholds are coarse (minutes) while event timestamps are
    * µs, so the distinction is theoretical but pinned by the spec rather
    * than left to luck.
    *
    * Works identically on a bounded DataFrame (the batch-equivalence
    * path); on a stream, Append output emits each session once its
    * watermark passes session end + gap. */
  def sessionizeStream(events: DataFrame, gap: String,
                       watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .select(col("user_id"), col("session_window.start").as("window_start"),
        col("n_events"), col("first_ts"), col("last_ts"), col("sum_cents"))

  /** Stream-stream interval join — purchase→view attribution: each
    * purchase joins the views of the same user whose timestamp lies in
    * [purchase_ts − lookback, purchase_ts]. Both sides are watermarked so
    * Spark can BOUND the join state: a view older than its watermark +
    * lookback can never match a future purchase and is evicted; an
    * unbounded stream-stream join would otherwise buffer both streams
    * forever. Inner join + time-interval condition is exactly the
    * supported streaming pattern (range condition drives state cleanup).
    *
    * Emits one row per (purchase, matching view) — the relational form;
    * the as-of "latest view only" reduction is a downstream aggregate
    * ([[graft.operators.EventOps.asofJoin]] is the batch twin of that
    * composition). Works identically on bounded frames (the
    * batch-equivalence path, asserted in StreamOpsSpec). */
  def attributionJoin(purchases: DataFrame, views: DataFrame,
                      lookback: String = "15 minutes",
                      watermark: String = "30 minutes"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
      .withWatermark("p_ts", watermark)
    val v = views
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", watermark)
    p.join(v,
      col("user_id") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $lookback"))
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        col("view_id"), col("v_ts"),
        round(col("purchase_value") * 100).cast("long").as("purchase_cents"))
  }

  /** LEFT OUTER stream-stream interval join — [[attributionJoin]]'s
    * unmatched-purchase lane: a purchase with NO view in its lookback
    * emits ONE null-padded row, and in streaming that row can only
    * materialize once the view-side watermark has passed the purchase's
    * whole lookback window (until then a matching view could still
    * arrive) — emission driven by state EVICTION, the subtlest supported
    * stream-join semantics and the reason outer results need a final
    * watermark advance to flush. The null view id is coalesced to the
    * −1 sentinel lane so the downstream MERGE key stays non-null; v_ts
    * stays NULL (the honest value). Identical semantics on bounded
    * frames (StreamOpsSpec pins equality with the plain batch left
    * join). */
  def attributionJoinOuter(purchases: DataFrame, views: DataFrame,
                           lookback: String = "15 minutes",
                           watermark: String = "30 minutes"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
      .withWatermark("p_ts", watermark)
    val v = views
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", watermark)
    p.join(v,
      col("user_id") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $lookback"),
      "left_outer")
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        coalesce(col("view_id"), lit(-1L)).as("view_id"), col("v_ts"),
        round(col("purchase_value") * 100).cast("long").as("purchase_cents"))
  }

  /** The batch twin of [[windowedCounts]] for A/B semantics tests: same
    * plan over a bounded DataFrame. */
  def windowedCountsBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100)) / 100).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact threshold heavy hitters: per-key running counts as
    * mapGroupsWithState state; a key is emitted (re-emitted on change,
    * Update mode) once its running count reaches `minFreq`. The streaming
    * twin of [[graft.operators.HeavyHitters.thresholdHitters]]'s exact
    * recount — after any prefix of the stream, the ≥ minFreq key set
    * equals the batch `HAVING count(*) >= minFreq` over that prefix.
    * State is one long per distinct key; production bounds it with the
    * same Misra-Gries candidate sketch when the key domain is unbounded
    * (drop keys whose upper bound falls below the bar). */
  def heavyHittersStream(keys: Dataset[Long], minFreq: Long): Dataset[KeyCount] = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (k: Long, rows: Iterator[Long], state: GroupState[KeyCount]) =>
          val n = state.getOption.map(_.freq).getOrElse(0L) + rows.size
          val next = KeyCount(k, n)
          state.update(next)
          next
      }
      .filter(_.freq >= minFreq)
  }

  /** [[heavyHittersStream]] rebuilt on Spark 4's transformWithState —
    * the arbitrary-stateful-processing API that supersedes
    * mapGroupsWithState (typed named state slots with per-slot TTL,
    * timers decoupled from input arrival, RocksDB-backed). Same contract
    * as its twin: after any stream prefix, the emitted ≥ minFreq key set
    * equals batch `HAVING count(*) >= minFreq` — the spec drives BOTH
    * implementations through the same waves and requires identical
    * results. Requires the RocksDB state-store provider (the API's
    * backing store; spark.sql.streaming.stateStore.providerClass). */
  def heavyHittersTws(keys: Dataset[Long], minFreq: Long): Dataset[KeyCount] = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.groupByKey(identity)
      .transformWithState(new RunningCountProcessor(minFreq),
        TimeMode.None(), OutputMode.Update())
      .filter(_.freq >= minFreq)
  }

  /** Timer-closed gap sessions on transformWithState: fold events into
    * per-user state, arm an event-time timer at last+gap, emit the
    * session when the watermark crosses it (see [[SessionTimerProcessor]]).
    * The watermark delay is 0 here so a session closes as soon as any
    * later data PROVES the gap elapsed — the spec advances a sentinel
    * user's clock to close other users' sessions deterministically. */
  def sessionCloseTws(events: Dataset[Event], gap: String): Dataset[SessionClosed] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    val ms = org.apache.spark.sql.catalyst.util.IntervalUtils
      .getDuration(gapMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    events.withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(ms),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Output modes the sinks expect (documented here so callers don't
    * guess): windowed aggs → Append with watermark closes windows;
    * mapGroupsWithState → Update. */
  val WindowedOutputMode: OutputMode = OutputMode.Append()
  val StatefulOutputMode: OutputMode = OutputMode.Update()
}

/** One closed session per user, emitted by an EVENT-TIME TIMER: the
  * transformWithState form of gap sessionization's close-out. Each
  * arriving wave folds into per-key (n, cents, last-event-time) state and
  * re-arms the key's single timer at `last + gap`; when the WATERMARK
  * passes the timer, [[SessionTimerProcessor.handleExpiredTimer]] emits
  * the session summary and clears the state — output is driven by time
  * passing, not by input arriving, which mapGroupsWithState could only
  * approximate with its coarse per-key timeout. */
case class SessionAgg(n: Long, cents: Long, lastMs: Long)
case class SessionClosed(user_id: Long, n_events: Long, total_cents: Long)

class SessionTimerProcessor(gapMs: Long)
  extends StatefulProcessor[Long, Event, SessionClosed] {
  @transient private var agg: ValueState[SessionAgg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    agg = getHandle.getValueState[SessionAgg]("agg",
      org.apache.spark.sql.Encoders.product[SessionAgg], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
                               timerValues: TimerValues): Iterator[SessionClosed] = {
    var cur = if (agg.exists()) agg.get() else SessionAgg(0L, 0L, 0L)
    rows.foreach { e =>
      cur = SessionAgg(cur.n + 1, cur.cents + math.round(e.value * 100),
        math.max(cur.lastMs, e.ts.getTime))
    }
    agg.update(cur)
    // exactly one armed timer per key: the session closes gap after the
    // LATEST event, so earlier arming points are stale
    getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
    getHandle.registerTimer(cur.lastMs + gapMs)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionClosed] = {
    val cur = agg.get()
    agg.clear()
    Iterator.single(SessionClosed(key, cur.n, cur.cents))
  }
}

/** Per-key running count in a named ValueState slot (transformWithState
  * form). minFreq is carried only for the scaladoc symmetry — emission is
  * unconditional here and filtered by the caller, identical to the
  * mapGroupsWithState twin's shape. */
class RunningCountProcessor(minFreq: Long)
  extends StatefulProcessor[Long, Long, KeyCount] {
  @transient private var count: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("count",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Long],
                               timerValues: TimerValues): Iterator[KeyCount] = {
    val n = (if (count.exists()) count.get() else 0L) + rows.size
    count.update(n)
    Iterator.single(KeyCount(key, n))
  }
}
