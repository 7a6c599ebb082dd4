package graft.store

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Schemas

/**
 * Conversation store (SURVEY.md §2.1 S1–S7 + §2.5 W1): the relational
 * re-expression of the reference's Neo4j property graph
 * (/root/reference/openai_agents/memory/neo4j_memory.py).
 *
 * Tables: conversations, messages, results, result_links (the extra
 * HAS_RESULT edges of neo4j_memory.py:645-658). NEXT edges are never
 * materialized — `lead()` over (workflow_id, sequence) reconstructs them
 * (see `messagesWithNext`).
 *
 * Storage: the north star is Iceberg MERGE/UPDATE, but /opt/spark/jars
 * carries no iceberg-runtime jar, so the API stays Iceberg-shaped
 * (merge/append/update verbs) over parquet read-modify-overwrite. At 100 TB
 * on Iceberg the same verbs become `MERGE INTO`/`UPDATE` row-level ops with
 * partition (bucket(workflow_id)) pruning; only this class changes, not
 * callers.
 *
 * Write-path scale notes: every mutation here rewrites only the target
 * table (point upserts on conversations are tiny; messages/results appends
 * go through append mode, no rewrite). Sequence assignment is the batch
 * row_number form for bulk loads and max+1 for single appends (the
 * reference's per-write semantics, neo4j_memory.py:327-339).
 */
class ConversationStore(spark: SparkSession, basePath: String) {
  import Schemas._

  private def path(t: String) = s"$basePath/$t"

  private def readOr(t: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    try spark.read.schema(schema).parquet(path(t))
    catch { case _: Throwable => spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema) }

  def conversations: DataFrame = readOr("conversations", conversationSchema)
  def messages: DataFrame = readOr("messages", messageSchema)
  def results: DataFrame = readOr("results", resultSchema)
  def resultLinks: DataFrame = readOr("result_links", resultLinkSchema)

  private def overwrite(t: String, df: DataFrame): Unit = {
    // read-modify-overwrite needs a materialized source (can't overwrite
    // what is being read); tiny tables here, cache + count forces it.
    val cached = df.cache()
    cached.count()
    cached.write.mode(SaveMode.Overwrite).parquet(path(t))
    cached.unpersist()
  }

  private def append(t: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(path(t))

  // ── S1: conversation upsert (MERGE on workflow_id) ─────────────────────
  /**
   * MERGE semantics of neo4j_memory.py:170-186: ON CREATE set all props,
   * ON MATCH set only `status`.
   */
  def createConversation(workflowId: String, originalQuery: String,
                         status: String, now: Timestamp): Conversation = {
    val existing = conversations
    val src = spark.createDataFrame(Seq(
      Conversation(workflowId, originalQuery, status, now, s"conv-$workflowId")))
    val merged = existing.alias("t")
      .join(src.alias("s"), Seq("workflow_id"), "full_outer")
      .select(
        col("workflow_id"),
        coalesce(col("t.original_query"), col("s.original_query")).as("original_query"),
        coalesce(col("s.status"), col("t.status")).as("status"), // MATCH → update status
        coalesce(col("t.created_at"), col("s.created_at")).as("created_at"),
        coalesce(col("t.conversation_id"), col("s.conversation_id")).as("conversation_id"))
    overwrite("conversations", merged)
    getConversation(workflowId).get
  }

  // ── S2: status update by key ───────────────────────────────────────────
  def updateStatus(workflowId: String, status: String): Unit =
    overwrite("conversations", conversations.withColumn("status",
      when(col("workflow_id") === workflowId, lit(status)).otherwise(col("status"))))

  // ── S3: point lookup ───────────────────────────────────────────────────
  def getConversation(workflowId: String): Option[Conversation] = {
    import spark.implicits._
    conversations.filter(col("workflow_id") === workflowId)
      .as[Conversation].collect().headOption
  }

  /** A1 — next sequence over Message∪Result (max+1, 0 on empty group). */
  private def nextSequence(workflowId: String): Int = {
    val items = messages.select(col("workflow_id"), col("sequence"))
      .unionByName(results.select(col("workflow_id"), col("sequence")))
      .filter(col("workflow_id") === workflowId)
    items.agg(coalesce(max(col("sequence")) + 1, lit(0))).collect()(0).getInt(0)
  }

  // ── S4: message append with sequence (neo4j_memory.py:306-431) ─────────
  def addMessage(workflowId: String, messageType: String, content: String,
                 now: Timestamp, category: Option[String] = None): Message = {
    val seq = nextSequence(workflowId)
    val m = Message(s"$workflowId-msg-$seq", workflowId, messageType, content,
      now, seq, category)
    append("messages", spark.createDataFrame(Seq(m)))
    m
  }

  /**
   * Batch message ingest: per-workflow sequences assigned in ONE
   * distributed pass — row_number over the batch (ordered by `ord`),
   * offset by each workflow's current max sequence over Message∪Result.
   * Bulk loads must never take the per-append max+1 driver round-trip:
   * this is the scale path (one shuffle on workflow_id, reused by the
   * join and the window), and it assigns exactly the sequences a loop of
   * `addMessage` calls would (pinned in ConversationStoreSpec).
   *
   * `df` columns: workflow_id, message_type, content, created_at,
   * message_category (nullable). Returns the written rows with their
   * assigned message_id/sequence.
   */
  def addMessages(df: DataFrame,
                  ord: Seq[org.apache.spark.sql.Column] = Seq(col("created_at"))): DataFrame = {
    val existingMax = messages.select(col("workflow_id"), col("sequence"))
      .unionByName(results.select(col("workflow_id"), col("sequence")))
      .groupBy(col("workflow_id"))
      .agg(max(col("sequence")).as("__base"))
    val w = Window.partitionBy(col("workflow_id")).orderBy(ord: _*)
    val assigned = df
      .join(existingMax, Seq("workflow_id"), "left")
      .withColumn("sequence",
        (row_number().over(w) - 1 + coalesce(col("__base") + 1, lit(0))).cast("int"))
      .withColumn("message_id",
        concat(col("workflow_id"), lit("-msg-"), col("sequence")))
      .select(col("message_id"), col("workflow_id"), col("message_type"),
        col("content"), col("created_at"), col("sequence"), col("message_category"))
    // localCheckpoint (eager): materializes ONE assignment before the append
    // (the plan reads `messages` for __base while the write lands in the
    // same directory), and the returned frame is that same materialization —
    // re-evaluating the lazy plan could re-order created_at ties in the
    // window and report message_ids that differ from the rows written
    val materialized = assigned.localCheckpoint(true)
    append("messages", materialized)
    materialized
  }

  /**
   * J3-guarded message append: skip when (workflow_id, content, category)
   * already exists — the question-dedup guard of ui/backend/main.py:296-303.
   */
  def addMessageIfAbsent(workflowId: String, messageType: String, content: String,
                         now: Timestamp, category: Option[String]): Option[Message] = {
    val dup = messages.filter(col("workflow_id") === workflowId &&
      col("content") === content &&
      col("message_category") <=> category.map(lit(_)).getOrElse(lit(null))).limit(1)
    if (dup.collect().nonEmpty) None
    else Some(addMessage(workflowId, messageType, content, now, category))
  }

  // ── S5: result append (neo4j_memory.py:433-572) ────────────────────────
  def addResult(workflowId: String, shortSummary: String, markdownReport: String,
                now: Timestamp, title: Option[String] = None,
                imageFilePath: Option[String] = None): Result = {
    val seq = nextSequence(workflowId)
    val r = Result(s"$workflowId-result-$seq", workflowId, shortSummary,
      markdownReport, now, seq, title,
      imageFilePath.map(p => if (p.startsWith("/")) p else s"/$p"), None)
    append("results", spark.createDataFrame(Seq(r))
      .withColumn("embedding", lit(null).cast("array<float>")))
    append("result_links", spark.createDataFrame(Seq(ResultLink(workflowId, r.result_id, now))))
    r
  }

  // ── S6: idempotent result re-link (neo4j_memory.py:574-688) ────────────
  /** Returns true when a new link was written, false when it already existed. */
  def linkExistingResult(workflowId: String, resultId: String, now: Timestamp): Boolean = {
    val already = resultLinks.filter(col("workflow_id") === workflowId &&
      col("result_id") === resultId).limit(1)
    if (already.collect().nonEmpty) false
    else {
      append("result_links", spark.createDataFrame(Seq(ResultLink(workflowId, resultId, now))))
      true
    }
  }

  // ── S7: embedding column write (neo4j_rag.py:163-214) ──────────────────
  def setEmbedding(resultId: String, embedding: Array[Float]): Unit =
    overwrite("results", results.withColumn("embedding",
      when(col("result_id") === resultId, lit(embedding).cast("array<float>"))
        .otherwise(col("embedding"))))

  // ── Reads ──────────────────────────────────────────────────────────────
  /** W3 — ordered message scan (neo4j_memory.py:703-721). */
  def getMessages(workflowId: String, limit: Option[Int] = None): DataFrame = {
    val base = messages.filter(col("workflow_id") === workflowId)
      .orderBy(col("sequence"))
    limit.map(base.limit).getOrElse(base)
  }

  /** W1 — NEXT-edge reconstruction via lead() (SURVEY §1.3). */
  def messagesWithNext(workflowId: String): DataFrame = {
    val w = Window.partitionBy(col("workflow_id")).orderBy(col("sequence"))
    messages.filter(col("workflow_id") === workflowId)
      .withColumn("next_id", lead(col("message_id"), 1).over(w))
  }

  /** W4 — ordered desc + offset pagination (neo4j_memory.py:279-289). */
  def listConversations(offset: Int, limit: Int): DataFrame =
    conversations.orderBy(col("created_at").desc, col("workflow_id").desc)
      .offset(offset).limit(limit)

  /** W4 at scale — keyset-paginated listing: the page strictly AFTER the
    * (created_at, workflow_id) cursor in the same DESC total order as
    * [[listConversations]]; pass the last row of the previous page as the
    * cursor. The boundary is a pushable predicate + top-n, so page depth
    * never costs an O(offset) skip (see
    * [[graft.ops.Relational.paginateAfter]]). */
  def listConversationsAfter(cursorCreatedAt: Timestamp,
                             cursorWorkflowId: String, n: Int): DataFrame =
    graft.ops.Relational.paginateAfter(conversations,
      Seq("created_at" -> false, "workflow_id" -> false),
      Seq(lit(cursorCreatedAt), lit(cursorWorkflowId)), n)

  /** J5 — results of a conversation through result_links (FK hash join). */
  def getResults(workflowId: String): DataFrame =
    resultLinks.filter(col("workflow_id") === workflowId)
      .select(col("result_id"), col("linked_at"))
      .join(results, "result_id")
      .orderBy(col("sequence"))
}
