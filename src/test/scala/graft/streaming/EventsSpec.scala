package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.Schemas

/** Topic routing + envelope semantics (redpanda_activity.py:42-143). */
class EventsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val topics = Events.Topics(
    default = "default-topic",
    lifecycle = Some("t-life"), clarifications = Some("t-clar"),
    artifacts = Some("t-art"), research = Some("t-res"))

  private def route(et: String): String =
    Seq(et).toDF("event_type")
      .select(Events.topicFor(col("event_type"), topics).as("t"))
      .as[String].collect().head

  test("lifecycle exact-list routes first") {
    assert(route("query_received") == "t-life")
    assert(route("research_started") == "t-life")
    assert(route("research_complete") == "t-life")
  }

  test("precedence trap: clarifications_generated contains '_generated' but routes to CLARIFICATIONS") {
    assert(route("clarifications_generated") == "t-clar")
  }

  test("artifact substrings: image_, pdf_, _generated") {
    assert(route("image_generation_started") == "t-art")
    assert(route("pdf_generated") == "t-art")
    assert(route("report_generated") == "t-art") // _generated beats report_ (check order)
  }

  test("research substrings after artifacts") {
    assert(route("search_executing") == "t-res")
    assert(route("report_writing") == "t-res")
    assert(route("knowledge_graph_hit") == "t-res")
  }

  test("unknown event → default topic") {
    assert(route("totally_new_event") == "default-topic")
  }

  test("unset category topics fall back to default (env-default semantics)") {
    val bare = Events.Topics(default = "only")
    val r = Seq("query_received").toDF("event_type")
      .select(Events.topicFor(col("event_type"), bare).as("t")).as[String].collect().head
    assert(r == "only")
  }

  test("all 16 documented event types route somewhere non-default except none") {
    val routed = Schemas.eventTypes.map(route)
    assert(routed.forall(t => t.startsWith("t-")), s"got $routed")
  }

  test("envelope is the reference JSON shape {event_type, workflow_id, timestamp, data}") {
    val r = Seq(("query_received", "wf1", java.sql.Timestamp.valueOf("2026-01-02 03:04:05.123456"), """{"q":1}"""))
      .toDF("et", "wf", "ts", "data")
      .select(Events.envelope(col("et"), col("wf"), col("ts"), col("data")).as("v"))
      .as[String].collect().head
    assert(r == """{"event_type":"query_received","workflow_id":"wf1","timestamp":"2026-01-02T03:04:05.123456","data":"{\"q\":1}"}""")
  }

  test("kafka frame keys by workflow_id and carries per-row topic") {
    val df = Seq(("image_generated", "wfA", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "{}"))
      .toDF("et", "wf", "ts", "data")
    val out = Events.toKafkaFrame(df, col("et"), col("wf"), col("ts"), col("data"), topics)
      .as[(String, String, String)].collect().head
    assert(out._1 == "wfA" && out._3 == "t-art")
  }

  test("SASL config requires mechanism+username+password together (redpanda_activity.py:27-37)") {
    val full = Events.kafkaOptions("a:9092, b:9092", None, Some("SCRAM-SHA-256"), Some("u"), Some("p"))
    assert(full("kafka.bootstrap.servers") == "a:9092,b:9092")
    assert(full("kafka.security.protocol") == "SASL_SSL")
    assert(full("kafka.sasl.mechanism") == "SCRAM-SHA-256")
    val partial = Events.kafkaOptions("a:9092", Some("SSL"), Some("SCRAM-SHA-256"), None, None)
    assert(!partial.contains("kafka.sasl.mechanism"))
    assert(partial("kafka.security.protocol") == "SSL")
  }

  test("envelope round-trips through parseEnvelope (S9 consumer path)") {
    val ts = java.sql.Timestamp.valueOf("2026-01-02 03:04:05.123456")
    val df = Seq(("search_executing", "wf9", ts, """{"n":2}""")).toDF("et", "wf", "ts", "data")
    val kafkaish = Events.toKafkaFrame(df, col("et"), col("wf"), col("ts"), col("data"), topics)
    val back = Events.parseEnvelope(kafkaish)
      .as[(String, String, java.sql.Timestamp, String)].collect().head
    assert(back == (("search_executing", "wf9", ts, """{"n":2}""")))
  }
}
