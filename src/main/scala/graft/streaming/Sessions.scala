package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Stateful streaming sessionization — the custom-state streaming twin of
 * the batch gap-based `ops/Relational.sessionize` (SURVEY §2 extension).
 *
 * Built on `KeyValueGroupedDataset.flatMapGroupsWithState` with an
 * event-time timeout: per key (user), an open session accumulates events;
 * when the watermark passes `lastSeen + gap` the timeout fires and the
 * finalized session is emitted exactly once (append mode).
 *
 * Scale design: state is O(1) per open session (no event buffering — only
 * counters + bounds), keyed state is hash-partitioned across executors by
 * Spark's state store, and the watermark bounds state lifetime so 100 TB of
 * history never accumulates in memory. The same semantics (gap-split
 * sessions, inclusive bounds, per-key counters) are pinned against the batch
 * sessionizer in SessionsSpec.
 */
object Sessions {

  /** Input event: key + event-time + a value to aggregate. */
  final case class Ev(user_id: Long, ts: Timestamp, value: Double)

  /** Open-session state: bounds and running aggregates, O(1) per key. */
  final case class SessionState(
      startMs: Long, lastMs: Long, nEvents: Long, totalValue: Double)

  /** Finalized session, emitted when the gap timeout fires. */
  final case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, total_value: Double)

  /**
   * Sessionize a stream of `Ev` with the given inactivity gap. The caller
   * sets the watermark on `ts` BEFORE calling (delay ≥ expected disorder);
   * output is append-mode: one row per closed session.
   *
   * A batch that contains a within-gap continuation extends the open
   * session; a batch event past the gap closes the old session (emitting it
   * immediately, without waiting for the timeout) and opens a new one —
   * matching the batch sessionizer's split rule (`ts - lag(ts) > gap`).
   */
  def sessionize(events: Dataset[Ev], gapMs: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(finalize(userId, s))
          } else {
            val sorted = rows.toVector.sortBy(_.ts.getTime)
            var closed = Vector.empty[SessionOut]
            var cur = state.getOption
            // in-watermark stragglers predating the open session by MORE
            // than the gap: the batch twin (global sort) would have formed
            // their own earlier session(s) — accumulate them into `pre`
            // (consecutive stragglers within the gap merge, a gap splits)
            // and emit closed, instead of silently merging into the open
            // session (ms - lastMs is negative there, so the merge guard
            // below would always accept them)
            var pre: Option[SessionState] = None
            def closePre(): Unit = pre.foreach { p =>
              closed :+= finalize(userId, p); pre = None
            }
            sorted.foreach { e =>
              val ms = e.ts.getTime
              cur match {
                case Some(s) if ms < s.startMs - gapMs =>
                  pre match {
                    case Some(p) if ms - p.lastMs <= gapMs =>
                      pre = Some(p.copy(lastMs = math.max(p.lastMs, ms),
                        nEvents = p.nEvents + 1, totalValue = p.totalValue + e.value))
                    case other =>
                      other.foreach(p => closed :+= finalize(userId, p))
                      pre = Some(SessionState(ms, ms, 1L, e.value))
                  }
                case Some(s) if ms - s.lastMs <= gapMs =>
                  closePre()
                  cur = Some(s.copy(
                    // a late event inside the gap can precede the recorded
                    // start — session_start must cover it
                    startMs = math.min(s.startMs, ms),
                    lastMs = math.max(s.lastMs, ms),
                    nEvents = s.nEvents + 1,
                    totalValue = s.totalValue + e.value))
                case Some(s) => // gap exceeded inside the batch: split now
                  closePre()
                  closed :+= finalize(userId, s)
                  cur = Some(SessionState(ms, ms, 1L, e.value))
                case None =>
                  closePre()
                  cur = Some(SessionState(ms, ms, 1L, e.value))
              }
            }
            closePre()
            cur.foreach { s =>
              state.update(s)
              // close when the watermark passes last-seen + gap
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.iterator
          }
      }
  }

  private def finalize(userId: Long, s: SessionState): SessionOut =
    SessionOut(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs),
      s.nEvents, s.totalValue)

  /**
   * Batch twin over the same `Ev` shape (thin wrapper over the windowed
   * sessionizer's split rule) — used to pin stream/batch parity in tests.
   */
  def sessionizeBatch(spark: SparkSession, events: Dataset[Ev], gapMs: Long): Dataset[SessionOut] = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
    events.toDF()
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev", lag(col("ms"), 1).over(w))
      .withColumn("new_sess",
        (col("prev").isNull || col("ms") - col("prev") > gapMs).cast("int"))
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))
      .as[SessionOut]
  }

  /**
   * Built-in twin of [[sessionize]] using Spark's native `session_window`
   * aggregate instead of custom `flatMapGroupsWithState` state.
   *
   * Prefer THIS form when the per-session result is expressible as
   * standard aggregates (count/sum/min/max): the state store holds the
   * native session layout, merges overlapping windows for free, and the
   * aggregate runs with codegen — no Scala closure per event. Reach for
   * the custom-state version only when session logic needs non-aggregate
   * state (e.g. emit-on-split semantics or per-session distinct tracking).
   * Same watermark rules: set it on `ts` before calling; append mode
   * emits each session once its window can no longer grow.
   */
  def sessionizeBuiltin(events: Dataset[Ev], gapMs: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF()
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMs milliseconds"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))
      .as[SessionOut]
  }
}
