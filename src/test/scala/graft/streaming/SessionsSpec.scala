package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.Sessions.{Ev, SessionOut}

/** Stateful streaming sessionization: timeout close, in-batch split, batch parity. */
class SessionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val GAP = 60_000L // 1 minute

  test("watermark timeout closes an idle session exactly once (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = Sessions.sessionize(
      input.toDS().withWatermark("ts", "0 seconds").as[Ev], GAP)
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(1L, ts("2026-01-01 10:00:00"), 1.0),
        Ev(1L, ts("2026-01-01 10:00:30"), 2.0))
      q.processAllAvailable()
      // nothing closed yet: watermark hasn't passed lastSeen + gap
      assert(spark.table("sess_out").count() == 0)
      // an unrelated key far in the future advances the watermark
      input.addData(Ev(99L, ts("2026-01-01 11:00:00"), 0.0))
      q.processAllAvailable()
      input.addData(Ev(99L, ts("2026-01-01 12:00:00"), 0.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out").as[SessionOut].collect()
        .filter(_.user_id == 1L)
      assert(rows.length == 1)
      assert(rows.head.n_events == 2 && rows.head.total_value == 3.0)
      assert(rows.head.session_start == ts("2026-01-01 10:00:00"))
      assert(rows.head.session_end == ts("2026-01-01 10:00:30"))
    } finally q.stop()
  }

  test("gap exceeded inside one batch splits and emits the older session immediately") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = Sessions.sessionize(
      input.toDS().withWatermark("ts", "0 seconds").as[Ev], GAP)
    val q = sessions.writeStream.format("memory").queryName("sess_split_out")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(7L, ts("2026-01-01 10:00:00"), 1.0),
        Ev(7L, ts("2026-01-01 10:00:10"), 1.0),
        Ev(7L, ts("2026-01-01 10:30:00"), 5.0)) // > 1 min after the first two
      q.processAllAvailable()
      val rows = spark.table("sess_split_out").as[SessionOut].collect()
      assert(rows.length == 1, s"expected the split-off first session, got ${rows.toSeq}")
      assert(rows.head.n_events == 2 && rows.head.total_value == 2.0)
    } finally q.stop()
  }

  test("in-watermark stragglers before the open session merge like the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // generous watermark so 2-hour-old events are still in-watermark
    val sessions = Sessions.sessionize(
      input.toDS().withWatermark("ts", "6 hours").as[Ev], GAP)
    val q = sessions.writeStream.format("memory").queryName("sess_strag_out")
      .outputMode("append").start()
    try {
      input.addData(Ev(5L, ts("2026-01-01 12:00:00"), 1.0)) // opens the session
      q.processAllAvailable()
      // two stragglers >gap BEFORE the open session, within gap of EACH
      // OTHER: the batch twin makes ONE 2-event session of them
      input.addData(
        Ev(5L, ts("2026-01-01 10:00:00"), 2.0),
        Ev(5L, ts("2026-01-01 10:00:30"), 3.0))
      q.processAllAvailable()
      val rows = spark.table("sess_strag_out").as[SessionOut].collect()
        .filter(_.user_id == 5L)
      assert(rows.length == 1, s"stragglers must merge into one session, got ${rows.toSeq}")
      assert(rows.head.n_events == 2 && rows.head.total_value == 5.0)
      assert(rows.head.session_start == ts("2026-01-01 10:00:00"))
      assert(rows.head.session_end == ts("2026-01-01 10:00:30"))
    } finally q.stop()
  }

  test("stream sessions equal the batch sessionizer on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      Ev(1L, ts("2026-01-01 10:00:00"), 1.0),
      Ev(1L, ts("2026-01-01 10:00:30"), 2.0),
      Ev(1L, ts("2026-01-01 10:05:00"), 4.0),  // new session (gap 4.5 min)
      Ev(2L, ts("2026-01-01 10:00:05"), 8.0))
    val input = MemoryStream[Ev]
    val sessions = Sessions.sessionize(
      input.toDS().withWatermark("ts", "0 seconds").as[Ev], GAP)
    val q = sessions.writeStream.format("memory").queryName("sess_parity_out")
      .outputMode("append").start()
    try {
      input.addData(evs: _*)
      q.processAllAvailable()
      // push the watermark far forward so every open session times out
      input.addData(Ev(99L, ts("2026-02-01 00:00:00"), 0.0))
      q.processAllAvailable()
      input.addData(Ev(99L, ts("2026-03-01 00:00:00"), 0.0))
      q.processAllAvailable()

      val streamed = spark.table("sess_parity_out").as[SessionOut].collect()
        .filter(_.user_id != 99L).map(s =>
          (s.user_id, s.session_start.toString, s.session_end.toString,
           s.n_events, s.total_value)).toSet
      val batch = Sessions.sessionizeBatch(spark, evs.toDS(), GAP).collect()
        .map(s => (s.user_id, s.session_start.toString, s.session_end.toString,
          s.n_events, s.total_value)).toSet
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      assert(batch.size == 3)
    } finally q.stop()
  }

  test("native session_window twin matches custom state and the batch path") {
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      Ev(1L, ts("2026-01-01 10:00:00"), 1.0),
      Ev(1L, ts("2026-01-01 10:00:30"), 2.0),
      Ev(1L, ts("2026-01-01 10:05:00"), 4.0), // gap > 1 min → new session
      Ev(2L, ts("2026-01-01 10:00:05"), 8.0))
    val input = MemoryStream[Ev]
    val sessions = Sessions.sessionizeBuiltin(
      input.toDS().withWatermark("ts", "0 seconds").as[Ev], GAP)
    val q = sessions.writeStream.format("memory").queryName("sess_native_out")
      .outputMode("append").start()
    try {
      input.addData(evs: _*)
      q.processAllAvailable()
      input.addData(Ev(99L, ts("2026-02-01 00:00:00"), 0.0))
      q.processAllAvailable()
      input.addData(Ev(99L, ts("2026-03-01 00:00:00"), 0.0))
      q.processAllAvailable()
      val native = spark.table("sess_native_out").as[SessionOut].collect()
        .filter(_.user_id != 99L).map(s =>
          (s.user_id, s.session_start.toString, s.session_end.toString,
           s.n_events, s.total_value)).toSet
      val batch = Sessions.sessionizeBatch(spark, evs.toDS(), GAP).collect()
        .map(s => (s.user_id, s.session_start.toString, s.session_end.toString,
          s.n_events, s.total_value)).toSet
      assert(native == batch, s"native=$native batch=$batch")
    } finally q.stop()
  }
}
