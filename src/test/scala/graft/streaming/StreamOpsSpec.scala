package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bounded-state streaming dedup + broadcast stream-static enrichment. */
class StreamOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dedupWithinWatermark keeps first arrival per key, duplicates dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val dedup = StreamOps.dedupWithinWatermark(
      input.toDF().toDF("id", "ts", "v"), "ts", "10 minutes", Seq("id"))
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        ("a", ts("2026-01-01 10:00:00"), 1.0),
        ("a", ts("2026-01-01 10:00:05"), 2.0), // dup within delay → dropped
        ("b", ts("2026-01-01 10:00:01"), 3.0))
      q.processAllAvailable()
      input.addData(("a", ts("2026-01-01 10:01:00"), 4.0)) // still within delay
      q.processAllAvailable()
      val rows = spark.table("dedup_out").select("id", "v")
        .as[(String, Double)].collect().toSet
      assert(rows == Set(("a", 1.0), ("b", 3.0)))
    } finally q.stop()
  }

  test("enrichWithStatic broadcasts the dim side and never shuffles the stream") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("purchase", "conversion"), ("view", "engagement"))
      .toDF("event_type", "label")
    val input = MemoryStream[(Long, String)]
    val enriched = StreamOps.enrichWithStatic(
      input.toDF().toDF("event_id", "event_type"), dim, Seq("event_type"))
    val q = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      input.addData((1L, "purchase"), (2L, "view"), (3L, "mystery"))
      q.processAllAvailable()
      val rows = spark.table("enrich_out").select("event_id", "label")
        .as[(Long, Option[String])].collect().toSet
      assert(rows == Set((1L, Some("conversion")), (2L, Some("engagement")), (3L, None)))
      // the executed plan must broadcast the static side
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) { q.explain() }
      assert(buf.toString("UTF-8").contains("BroadcastHashJoin"),
        s"expected broadcast join in streaming plan:\n${buf.toString("UTF-8")}")
    } finally q.stop()
  }

  test("intervalJoin matches stream pairs only inside the time bound") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(String, Timestamp)]
    val buys = MemoryStream[(String, Timestamp)]
    val joined = StreamOps.intervalJoin(
      views.toDF().toDF("uid", "ts").withWatermark("ts", "1 minute"),
      buys.toDF().toDF("uid", "ts").withWatermark("ts", "1 minute"),
      key = "uid", leftTs = "ts", rightTs = "ts",
      lowerMs = 0L, upperMs = 60_000L) // buy within 1 min AFTER the view
    val q = joined.writeStream.format("memory").queryName("ivj_out")
      .outputMode("append").start()
    try {
      views.addData(("u1", ts("2026-01-01 10:00:00")), ("u2", ts("2026-01-01 10:00:00")))
      buys.addData(
        ("u1", ts("2026-01-01 10:00:30")),  // inside [0, +1min] → match
        ("u2", ts("2026-01-01 10:05:00")),  // 5 min later → no match
        ("u3", ts("2026-01-01 10:00:10")))  // key never viewed → no match
      q.processAllAvailable()
      val rows = spark.table("ivj_out").select("uid", "r_uid")
        .as[(String, String)].collect().toSet
      assert(rows == Set(("u1", "u1")))
    } finally q.stop()
  }

  test("nearDupCandidates flags cross-batch near-identical docs, not distinct ones") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.Doc]
    val hits = StreamOps.nearDupCandidates(input.toDS(),
      horizonMs = 3600_000L, maxHamming = 3, bands = 4, watermarkDelay = "10 minutes")
    val q = hits.writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again"
      input.addData(
        StreamOps.Doc("d1", ts("2026-01-01 10:00:00"), base),
        StreamOps.Doc("d2", ts("2026-01-01 10:00:10"), "completely different topic entirely unrelated words"))
      q.processAllAvailable()
      // second batch: an exact dup of d1 and a fresh unique doc
      input.addData(
        StreamOps.Doc("d3", ts("2026-01-01 10:05:00"), base),
        StreamOps.Doc("d4", ts("2026-01-01 10:05:01"), "yet another unique document about spark plans"))
      q.processAllAvailable()
      val pairs = spark.table("neardup_out")
        .select("doc_id", "matched_id").as[(String, String)].collect().toSet
      assert(pairs.contains(("d3", "d1")), s"exact dup must be flagged, got $pairs")
      assert(!pairs.exists(p => p._1 == "d2" || p._1 == "d4"),
        s"distinct docs must not be flagged, got $pairs")
    } finally q.stop()
  }

  test("nearDupCandidates: beyond-horizon repeats are NOT flagged (state evicted)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.Doc]
    val hits = StreamOps.nearDupCandidates(input.toDS(),
      horizonMs = 60_000L, maxHamming = 3, bands = 4, watermarkDelay = "1 minute")
    val q = hits.writeStream.format("memory").queryName("neardup_h_out")
      .outputMode("append").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again"
      input.addData(StreamOps.Doc("e1", ts("2026-01-01 10:00:00"), base))
      q.processAllAvailable()
      // same text but 2 hours later — far outside the 1-minute horizon
      input.addData(StreamOps.Doc("e2", ts("2026-01-01 12:00:00"), base))
      q.processAllAvailable()
      val pairs = spark.table("neardup_h_out")
        .select("doc_id", "matched_id").as[(String, String)].collect().toSet
      assert(pairs.isEmpty, s"beyond-horizon repeat must not match, got $pairs")
    } finally q.stop()
  }

  test("checkpointed restart delivers each input row exactly once") {
    val root = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val (in, ckpt, out) = (s"$root/in", s"$root/ckpt", s"$root/out")
    def startQuery() = {
      val schema = org.apache.spark.sql.types.StructType.fromDDL("v STRING")
      spark.readStream.schema(schema).json(in)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    def addFile(name: String, lines: Seq[String]): Unit = {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/$name"),
        lines.map(l => s"""{"v":"$l"}""").mkString("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val q1 = startQuery()
    try { addFile("a.json", Seq("r1", "r2")); q1.processAllAvailable() }
    finally q1.stop()
    // restart from the SAME checkpoint; only the new file may be processed
    val q2 = startQuery()
    try { addFile("b.json", Seq("r3")); q2.processAllAvailable() }
    finally q2.stop()
    val vs = spark.read.parquet(out).select("v").as[String].collect().toSeq
    assert(vs.sorted == Seq("r1", "r2", "r3"), s"expected exactly-once, got $vs")
  }

  test("spaceSavingTopK is exact across batches while distinct values fit in m") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = StreamOps.spaceSavingTopK(input.toDF().toDF("v"), "v", m = 10, numShards = 2)
    val q = out.writeStream.format("memory").queryName("ss_exact")
      .outputMode("update").start()
    try {
      input.addData(Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"): _*)
      q.processAllAvailable()
      input.addData(Seq.fill(2)("a") ++ Seq("d"): _*)
      q.processAllAvailable()
      // est is monotone per value: the latest snapshot is max(est) per value
      val snap = spark.table("ss_exact").groupBy("value")
        .agg(max("est").as("est"), max("err").as("err"))
        .as[(String, Long, Long)].collect()
        .map { case (v, e, r) => v -> ((e, r)) }.toMap
      assert(snap == Map("a" -> ((7L, 0L)), "b" -> ((3L, 0L)),
        "c" -> ((1L, 0L)), "d" -> ((1L, 0L))))
    } finally q.stop()
  }

  test("spaceSavingTopK bounds state at m and keeps the space-saving guarantees") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    // one shard, m=2: forces evictions on the singleton tail
    val out = StreamOps.spaceSavingTopK(input.toDF().toDF("v"), "v", m = 2, numShards = 1)
    val q = out.writeStream.format("memory").queryName("ss_bound")
      .outputMode("update").start()
    try {
      input.addData(Seq.fill(5)("a") ++ Seq("b", "c", "d"): _*)
      q.processAllAvailable()
      val trueCnt = Map("a" -> 5L, "b" -> 1L, "c" -> 1L, "d" -> 1L)
      // latest snapshot = the final batch's emission (monotone est per value)
      val snap = spark.table("ss_bound").groupBy("value")
        .agg(max("est").as("est"), max("err").as("err"))
        .as[(String, Long, Long)].collect()
      val tracked = snap.map { case (v, e, r) => v -> ((e, r)) }.toMap
      assert(tracked.size >= 2) // table accumulates; per-batch state was ≤ m
      tracked.foreach { case (v, (est, err)) =>
        assert(est >= trueCnt(v), s"$v: est $est < true ${trueCnt(v)}")
        assert(est - err <= trueCnt(v), s"$v: est-err ${est - err} > true ${trueCnt(v)}")
      }
      // the > N/m hitter (a: 5 > 8/2) is guaranteed tracked, exactly counted
      assert(tracked("a") == ((5L, 0L)))
      // final batch emitted at most m counters for the single shard
      // (the memory table accumulates per-batch emissions; count the last
      // batch via the maximum est snapshot: distinct tracked values with the
      // top-2 estimates is the live state)
      val live = snap.sortBy { case (_, e, _) => -e }.take(2).map(_._1).toSet
      assert(live.contains("a"))
    } finally q.stop()
  }

  test("foreachBatch upserts each micro-batch into the versioned store") {
    // the streaming-lakehouse pattern: stream → foreachBatch → MERGE INTO,
    // giving idempotent-by-key continuous upsert with snapshot isolation
    // for concurrent readers (each batch lands as the NEXT version)
    implicit val sqlCtx = spark.sqlContext
    import graft.store.Snapshots
    val root = java.nio.file.Files.createTempDirectory("graft-stream-merge")
    val base = root.toString + "/t"
    try {
      Snapshots.write(Seq((1L, "old"), (2L, "old")).toDF("id", "status"), base)
      val input = MemoryStream[(Long, String)]
      val q = input.toDF().toDF("id", "status").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          Snapshots.mergeInto(spark, base, batch, "id"); ()
        }
        .option("checkpointLocation", root.toString + "/ckpt")
        .start()
      try {
        input.addData((2L, "updated"), (3L, "inserted"))
        q.processAllAvailable()
        input.addData((1L, "updated-later"))
        q.processAllAvailable()
        val now = Snapshots.read(spark, base)
          .as[(Long, String)].collect().toMap
        assert(now == Map(1L -> "updated-later", 2L -> "updated", 3L -> "inserted"))
        // every batch is a visible, time-travelable version
        assert(Snapshots.versions(spark, base) == Seq(1L, 2L, 3L))
        assert(Snapshots.read(spark, base, Some(2L))
          .as[(Long, String)].collect().toMap
          == Map(1L -> "old", 2L -> "updated", 3L -> "inserted"))
      } finally q.stop()
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).forEach(rm(_))
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(root)
    }
  }

  test("qualityGateCounters: streaming per-rule counts equal the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    // fixture spanning every gate outcome: kept, too-short (length_band),
    // short-word spam (word_len), repeated token (low_diversity), and a
    // no-stopword wall of distinct long words (no_stopwords)
    // kept: n=40, awl=(3+2+38·5)/40≈4.9, ttr=1.0, stop_ratio=2/40=0.05
    val kept = ("k1", ts("2026-01-01 10:00:05"),
      "the of " + (1 to 38).map(i => f"wd$i%03d").mkString(" "))
    val tooShort = ("s1", ts("2026-01-01 10:00:10"), "just five short words here")
    // 40 distinct 2-3 char tokens: awl≈2.8 < 3.8 → word_len
    val spam = ("w1", ts("2026-01-01 10:00:20"), (1 to 40).map(i => s"a$i").mkString(" "))
    // n=41, awl≈4.95, but ttr=2/41 → low_diversity
    val repet = ("r1", ts("2026-01-01 10:00:30"),
      "the " + Seq.fill(40)("lorem").mkString(" "))
    // 40 distinct 5-char words, zero stopwords → no_stopwords
    val noStop = ("n1", ts("2026-01-01 10:00:40"),
      (1 to 40).map(i => f"nw$i%03d").mkString(" "))
    val late = ("k2", ts("2026-01-01 10:20:00"), "closer") // advances watermark
    val fixture = Seq(kept, tooShort, spam, repet, noStop)

    val input = MemoryStream[(String, Timestamp, String)]
    val counters = StreamOps.qualityGateCounters(
      input.toDF().toDF("doc_id", "ts", "text"),
      "ts", "text", windowDur = "1 minute", watermarkDelay = "1 minute")
    val q = counters.writeStream.format("memory").queryName("qg_out")
      .outputMode("append").start()
    try {
      input.addData(fixture: _*)
      q.processAllAvailable()
      input.addData(late) // push the watermark past the fixture window
      q.processAllAvailable()
      val streamed = spark.table("qg_out")
        .select(col("window_start").cast("string"), col("rule"), col("n"))
        .as[(String, String, Long)].collect().toSet
      // batch twin: SAME gate expressions, same windowing, on a static frame
      val batch = graft.text.TextAnalysis
        .qualityGate(fixture.toDF("doc_id", "ts", "text"), "text")
        .groupBy(window(col("ts"), "1 minute"),
          coalesce(col("reject_reason"), lit("kept")).as("rule"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("string"), col("rule"), col("n"))
        .as[(String, String, Long)].collect().toSet
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      // the fixture exercised every rule exactly once
      assert(streamed.map(_._2) ==
        Set("kept", "length_band", "word_len", "low_diversity", "no_stopwords"))
      // a null-text record REJECTS (length_band) — it must never count as
      // kept, which is what all-null flags would coalesce into
      val nullGate = graft.text.TextAnalysis.qualityGate(
        Seq(("x1", ts("2026-01-01 10:00:50"), null.asInstanceOf[String]))
          .toDF("doc_id", "ts", "text"), "text")
      assert(nullGate.select("reject_reason").as[String].head() == "length_band")
      assert(nullGate.select("keep").as[Boolean].head() == false)
    } finally q.stop()
  }
}
