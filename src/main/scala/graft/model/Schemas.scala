package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/**
 * Data model of the engine (SURVEY.md §1.3).
 *
 * The reference stores a property graph in Neo4j (`Conversation`, `Message`,
 * `Result` nodes — /root/reference/openai_agents/memory/neo4j_memory.py:30-133)
 * plus a Kafka event stream (redpanda_activity.py:116-121). Here the graph
 * becomes relational tables; `HAS_MESSAGE`/`HAS_RESULT` edges are the
 * `workflow_id` FK and `NEXT` is derived with a window function (no edge
 * tables needed at 100 TB — see SURVEY.md §1.3).
 */
object Schemas {

  /** neo4j_memory.py:30-55 (ConversationNode). */
  case class Conversation(
      workflow_id: String,
      original_query: String,
      status: String,
      created_at: Timestamp,
      conversation_id: String)

  /** neo4j_memory.py:58-91 (MessageNode); id format neo4j_memory.py:359. */
  case class Message(
      message_id: String,
      workflow_id: String,
      message_type: String, // human | ai
      content: String,
      timestamp: Timestamp,
      sequence: Int,
      message_category: Option[String]) // initial_query | clarification_question | clarification_answer

  /** neo4j_memory.py:94-133 (ResultNode); embedding neo4j_rag.py:193-198. */
  case class Result(
      result_id: String,
      workflow_id: String,
      short_summary: String,
      markdown_report: String,
      timestamp: Timestamp,
      sequence: Int,
      title: Option[String],
      image_file_path: Option[String],
      embedding: Option[Array[Float]])

  /** Many-to-many conversation↔result (cache-reuse re-links, neo4j_memory.py:574-688). */
  case class ResultLink(workflow_id: String, result_id: String, linked_at: Timestamp)

  /** Event envelope, redpanda_activity.py:116-121. `data` stays JSON text. */
  case class WorkflowEvent(
      event_type: String,
      workflow_id: String,
      timestamp: Timestamp,
      data: String)

  /** writer_agent.py:29-37 (ReportData). */
  case class ReportData(
      short_summary: String,
      markdown_report: String,
      follow_up_questions: Seq[String])

  /** planner_agent.py:17-27 (WebSearchItem / WebSearchPlan). */
  case class SearchItem(reason: String, query: String)

  val conversationSchema: StructType = StructType(Seq(
    StructField("workflow_id", StringType, nullable = false),
    StructField("original_query", StringType),
    StructField("status", StringType),
    StructField("created_at", TimestampType),
    StructField("conversation_id", StringType)))

  val messageSchema: StructType = StructType(Seq(
    StructField("message_id", StringType, nullable = false),
    StructField("workflow_id", StringType, nullable = false),
    StructField("message_type", StringType),
    StructField("content", StringType),
    StructField("timestamp", TimestampType),
    StructField("sequence", IntegerType),
    StructField("message_category", StringType)))

  val resultSchema: StructType = StructType(Seq(
    StructField("result_id", StringType, nullable = false),
    StructField("workflow_id", StringType, nullable = false),
    StructField("short_summary", StringType),
    StructField("markdown_report", StringType),
    StructField("timestamp", TimestampType),
    StructField("sequence", IntegerType),
    StructField("title", StringType),
    StructField("image_file_path", StringType),
    StructField("embedding", ArrayType(FloatType))))

  val resultLinkSchema: StructType = StructType(Seq(
    StructField("workflow_id", StringType, nullable = false),
    StructField("result_id", StringType, nullable = false),
    StructField("linked_at", TimestampType)))

  val eventSchema: StructType = StructType(Seq(
    StructField("event_type", StringType, nullable = false),
    StructField("workflow_id", StringType, nullable = false),
    StructField("timestamp", TimestampType),
    StructField("data", StringType)))

  /** The 16 example event types, redpanda_activity.py:85-101 (exact list). */
  val eventTypes: Seq[String] = Seq(
    "query_received", "knowledge_graph_hit", "clarifications_needed",
    "clarifications_generated", "clarification_answered", "clarifications_complete",
    "research_started", "search_plan_created", "search_executing",
    "image_generation_started", "image_generated", "report_writing",
    "report_generated", "pdf_generation_started", "pdf_generated",
    "research_complete")
}
