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
}
