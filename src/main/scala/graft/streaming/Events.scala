package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Workflow event-stream operators (SURVEY.md §2.10, S8–S10/T1–T6/P5/F10).
 *
 * The reference publishes JSON event envelopes to Redpanda/Kafka with
 * per-category topic routing (/root/reference/openai_agents/workflows/
 * redpanda_activity.py:42-143). Here the envelope/routing are pure Column
 * expressions (codegen'd, usable in batch AND Structured Streaming), and the
 * Kafka wiring is standard `format("kafka")` with a per-row `topic` column.
 */
object Events {

  /** Topic names; env-overridable in the reference (.env-sample), parameters here. */
  final case class Topics(
      default: String = "research-workflow-events",
      lifecycle: Option[String] = None,
      clarifications: Option[String] = None,
      artifacts: Option[String] = None,
      research: Option[String] = None) {
    def lifecycleT: String = lifecycle.getOrElse(default)
    def clarificationsT: String = clarifications.getOrElse(default)
    def artifactsT: String = artifacts.getOrElse(default)
    def researchT: String = research.getOrElse(default)
  }

  /**
   * P5/T2 — event→topic routing. The `when` cascade MUST mirror the
   * reference's check order (redpanda_activity.py:55-68):
   * lifecycle exact-list → "clarification" substring → artifact substrings
   * ("image_", "pdf_", "_generated") → research substrings ("search_",
   * "report_", "knowledge_graph") → default. Order matters:
   * `clarifications_generated` contains "_generated" but routes to
   * CLARIFICATIONS because that check runs first.
   */
  def topicFor(eventType: Column, t: Topics = Topics()): Column =
    when(eventType.isin("query_received", "research_complete", "research_started"),
        lit(t.lifecycleT))
      .when(eventType.contains("clarification"), lit(t.clarificationsT))
      .when(eventType.contains("image_") || eventType.contains("pdf_") ||
            eventType.contains("_generated"), lit(t.artifactsT))
      .when(eventType.contains("search_") || eventType.contains("report_") ||
            eventType.contains("knowledge_graph"), lit(t.researchT))
      .otherwise(lit(t.default))

  /**
   * F10/T1 — JSON event envelope {event_type, workflow_id, timestamp, data}
   * (redpanda_activity.py:116-121). `data` is already-serialized JSON text.
   */
  def envelope(eventType: Column, workflowId: Column, timestamp: Column,
               dataJson: Column): Column =
    to_json(struct(
      eventType.as("event_type"),
      workflowId.as("workflow_id"),
      date_format(timestamp, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("timestamp"),
      dataJson.as("data")))

  /**
   * S8 — rows → Kafka sink frame: (key, value, topic). Key = workflow_id so a
   * workflow's events land in one partition in order (T4; the reference
   * producer round-robins — keying is the Spark-side improvement that
   * preserves per-workflow order at 1000-executor scale).
   */
  def toKafkaFrame(df: DataFrame, eventType: Column, workflowId: Column,
                   timestamp: Column, dataJson: Column,
                   t: Topics = Topics()): DataFrame =
    df.select(
      workflowId.cast("string").as("key"),
      envelope(eventType, workflowId, timestamp, dataJson).as("value"),
      topicFor(eventType, t).as("topic"))

  /**
   * S10 — SASL/TLS option map for the Kafka source/sink, mirroring
   * get_kafka_config (redpanda_activity.py:12-39): SASL applies only when
   * mechanism+username+password are all present; else optional plain
   * security.protocol.
   */
  def kafkaOptions(bootstrap: String,
                   securityProtocol: Option[String] = None,
                   saslMechanism: Option[String] = None,
                   saslUsername: Option[String] = None,
                   saslPassword: Option[String] = None): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" ->
        bootstrap.split(",").map(_.trim).filter(_.nonEmpty).mkString(","))
    (saslMechanism, saslUsername, saslPassword) match {
      case (Some(m), Some(u), Some(p)) =>
        base ++ Map(
          "kafka.security.protocol" -> securityProtocol.getOrElse("SASL_SSL"),
          "kafka.sasl.mechanism" -> m,
          "kafka.sasl.jaas.config" ->
            ("org.apache.kafka.common.security.scram.ScramLoginModule required " +
             s"""username="$u" password="$p";"""))
      case _ =>
        base ++ securityProtocol.map("kafka.security.protocol" -> _).toMap
    }
  }

  /**
   * T3 — consumer positioning options (REDPANDA.md:113-125,167-186): group
   * id, offset seek (earliest/latest/per-partition JSON), fail-on-loss.
   */
  def consumerOptions(subscribe: String,
                      startingOffsets: String = "latest",
                      groupId: Option[String] = None,
                      failOnDataLoss: Boolean = false): Map[String, String] =
    Map(
      "subscribe" -> subscribe,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> failOnDataLoss.toString) ++
      groupId.map("kafka.group.id" -> _).toMap

  /**
   * T6 — producer tuning knobs with the reference's suggested defaults
   * (REDPANDA.md:395-405): acks=1, snappy, batch 16384 B, linger 10 ms.
   * (T7 retention.ms/retention.bytes/partition-count are broker-side topic
   * configs — `rpk topic alter-config` — not client options; they are ops
   * runbook items, not engine code.)
   */
  def producerTuning(acks: String = "1",
                     compression: String = "snappy",
                     batchSize: Int = 16384,
                     lingerMs: Int = 10): Map[String, String] =
    Map(
      "kafka.acks" -> acks,
      "kafka.compression.type" -> compression,
      "kafka.batch.size" -> batchSize.toString,
      "kafka.linger.ms" -> lingerMs.toString)

  /**
   * S9 — parse a Kafka value stream back into typed events (from_json over
   * the envelope schema; REDPANDA.md:113-125 consumer semantics).
   */
  def parseEnvelope(kafka: DataFrame): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_type string, workflow_id string, timestamp string, data string")
    kafka
      .select(from_json(col("value").cast("string"), schema).as("e"))
      .select(col("e.event_type"), col("e.workflow_id"),
        to_timestamp(col("e.timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("timestamp"),
        col("e.data"))
  }

  /**
   * T1 — failure-tolerant event delivery: the reference swallows publish
   * errors so event emission can never break a workflow
   * (redpanda_activity.py:136-140, "Don't raise"). Streaming twin:
   * foreachBatch wrapping the per-batch write in try/catch — a failed
   * batch is counted and dropped, the stream keeps running (the documented
   * production alternative is a dead-letter queue).
   */
  def resilientForeachBatchSink(
      df: DataFrame,
      writeBatch: (DataFrame, Long) => Unit,
      onError: (Throwable, Long) => Unit = (_, _) => (),
      deadLetterPath: Option[String] = None): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      try writeBatch(batch, id)
      catch {
        case e: Throwable =>
          // the documented production alternative to silent drop: land the
          // failed batch in a replayable DLQ keyed by batch id, with the
          // failure reason alongside; a DLQ write failure still never kills
          // the stream (the reference's "Don't raise" contract)
          deadLetterPath.foreach { p =>
            try batch
              .withColumn("__dlq_error", org.apache.spark.sql.functions.lit(
                Option(e.getMessage).getOrElse(e.getClass.getName).take(500)))
              .write.mode("overwrite").parquet(s"$p/batch=$id")
            catch { case _: Throwable => () }
          }
          onError(e, id)
      }
    }

  /**
   * T5 extension — per-workflow progress over event time with a watermark
   * (the reference leaves analytics to consumers, README.md:131; this is the
   * Structured-Streaming variant, works identically on a batch frame).
   */
  def progressByWindow(events: DataFrame, tsCol: String = "timestamp",
                       watermark: String = "10 minutes",
                       windowLen: String = "5 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col("workflow_id"), window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("n_events"))
}
