package graft.store

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S1–S7 store semantics (neo4j_memory.py) over the parquet fallback. */
class ConversationStoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def freshStore(): ConversationStore =
    new ConversationStore(spark, Files.createTempDirectory("graft-store").toString)

  private val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
  private val t1 = Timestamp.valueOf("2026-01-01 00:01:00")

  test("S1: upsert creates on first write, on match updates ONLY status (neo4j_memory.py:170-186)") {
    val st = freshStore()
    val c1 = st.createConversation("wf1", "original?", "pending", t0)
    assert(c1.status == "pending" && c1.original_query == "original?")
    // second MERGE with different query text: status updates, query does not
    val c2 = st.createConversation("wf1", "DIFFERENT", "researching", t1)
    assert(c2.status == "researching")
    assert(c2.original_query == "original?", "ON MATCH must not overwrite original_query")
    assert(c2.created_at == t0, "ON MATCH must not overwrite created_at")
    assert(st.conversations.count() == 1)
  }

  test("S2/S3: point status update + point lookup") {
    val st = freshStore()
    st.createConversation("wf1", "q", "pending", t0)
    st.createConversation("wf2", "q2", "pending", t0)
    st.updateStatus("wf1", "completed")
    assert(st.getConversation("wf1").get.status == "completed")
    assert(st.getConversation("wf2").get.status == "pending")
    assert(st.getConversation("nope").isEmpty)
  }

  test("S4/A1: message sequence is per-conversation monotonic from 0; id format wf-msg-seq") {
    val st = freshStore()
    val m0 = st.addMessage("wf1", "human", "hello", t0)
    val m1 = st.addMessage("wf1", "ai", "hi!", t1)
    val other = st.addMessage("wf2", "human", "separate", t0)
    assert(m0.sequence == 0 && m1.sequence == 1 && other.sequence == 0)
    assert(m0.message_id == "wf1-msg-0" && m1.message_id == "wf1-msg-1")
  }

  test("batch addMessages assigns exactly the sequences a loop of addMessage would") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val t2 = Timestamp.valueOf("2026-01-01 00:02:00")
    val t3 = Timestamp.valueOf("2026-01-01 00:03:00")

    // store A: one-by-one appends (the reference's per-write path)
    val a = freshStore()
    a.addMessage("wf1", "human", "m0", t0)
    a.addMessage("wf1", "ai", "m1", t1)
    a.addMessage("wf1", "human", "m2", t2)
    a.addMessage("wf1", "ai", "m3", t3)
    a.addMessage("wf2", "human", "n0", t2)

    // store B: same starting state (2 singles on wf1), then ONE batch
    val b = freshStore()
    b.addMessage("wf1", "human", "m0", t0)
    b.addMessage("wf1", "ai", "m1", t1)
    val batch = Seq(
      ("wf1", "human", "m2", t2, None: Option[String]),
      ("wf1", "ai", "m3", t3, None: Option[String]),
      ("wf2", "human", "n0", t2, None: Option[String])
    ).toDF("workflow_id", "message_type", "content", "created_at", "message_category")
    b.addMessages(batch)

    def snap(st: ConversationStore) = st.messages
      .select("message_id", "workflow_id", "message_type", "content", "sequence")
      .collect().map(_.toSeq).toSet
    assert(snap(b) == snap(a), "batch and single-append sequence assignment must agree")
    // continuation after a batch also agrees: next single append lands at max+1
    assert(a.addMessage("wf1", "human", "m4", t3).sequence == 4)
    assert(b.addMessage("wf1", "human", "m4", t3).sequence == 4)
  }

  test("S5: result append shares the sequence counter with messages (Message∪Result)") {
    val st = freshStore()
    st.addMessage("wf1", "human", "q", t0)
    val r = st.addResult("wf1", "sum", "# Report\nbody", t1)
    assert(r.sequence == 1, "sequence counts across the Message∪Result union")
    assert(r.result_id == "wf1-result-1")
    assert(st.resultLinks.count() == 1)
  }

  test("S5: image path normalized on write (F6)") {
    val st = freshStore()
    val r = st.addResult("wf1", "s", "m", t0, imageFilePath = Some("img.png"))
    assert(r.image_file_path.contains("/img.png"))
  }

  test("J3: addMessageIfAbsent skips duplicate (workflow, content, category) (main.py:296-303)") {
    val st = freshStore()
    assert(st.addMessageIfAbsent("wf1", "ai", "Q1?", t0, Some("clarification_question")).isDefined)
    assert(st.addMessageIfAbsent("wf1", "ai", "Q1?", t1, Some("clarification_question")).isEmpty)
    assert(st.addMessageIfAbsent("wf1", "ai", "Q2?", t1, Some("clarification_question")).isDefined)
    assert(st.messages.count() == 2)
  }

  test("S6: re-link is idempotent (neo4j_memory.py:606-617)") {
    val st = freshStore()
    val r = st.addResult("wfA", "s", "m", t0)
    assert(st.linkExistingResult("wfB", r.result_id, t1))
    assert(!st.linkExistingResult("wfB", r.result_id, t1), "second link must be a no-op")
    assert(st.resultLinks.count() == 2) // original + one re-link
    assert(st.getResults("wfB").count() == 1)
  }

  test("S7: embedding column write targets exactly one result (neo4j_rag.py:193-198)") {
    val st = freshStore()
    val r1 = st.addResult("wf1", "s1", "m1", t0)
    val r2 = st.addResult("wf1", "s2", "m2", t1)
    st.setEmbedding(r1.result_id, Array(1f, 2f, 3f))
    val rows = st.results.orderBy("sequence").collect()
    assert(!rows(0).isNullAt(rows(0).fieldIndex("embedding")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("embedding")))
  }

  test("W1: messagesWithNext reconstructs the NEXT chain via lead()") {
    val st = freshStore()
    st.addMessage("wf1", "human", "a", t0)
    st.addMessage("wf1", "ai", "b", t1)
    st.addMessage("wf1", "human", "c", t1)
    val next = st.messagesWithNext("wf1").orderBy("sequence")
      .select("message_id", "next_id").collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
    assert(next.toSeq == Seq(
      ("wf1-msg-0", Some("wf1-msg-1")),
      ("wf1-msg-1", Some("wf1-msg-2")),
      ("wf1-msg-2", None)))
  }

  test("W4: listConversations paginates desc by created_at (neo4j_memory.py:279-289)") {
    val st = freshStore()
    (1 to 5).foreach(i =>
      st.createConversation(s"wf$i", s"q$i", "pending",
        Timestamp.valueOf(s"2026-01-0$i 00:00:00")))
    val page = st.listConversations(offset = 1, limit = 2).collect().map(_.getString(0))
    assert(page.toSeq == Seq("wf4", "wf3"))
  }

  test("W4b: listConversationsAfter pages from a cursor, equal to the offset page") {
    val st = freshStore()
    (1 to 5).foreach(i =>
      st.createConversation(s"wf$i", s"q$i", "pending",
        Timestamp.valueOf(s"2026-01-0$i 00:00:00")))
    // two conversations at the SAME created_at: the workflow_id tiebreak is
    // what makes the cursor a total order
    st.createConversation("wfa", "qa", "pending",
      Timestamp.valueOf("2026-01-03 00:00:00"))
    val all = st.listConversations(offset = 0, limit = 10).collect()
      .map(r => (r.getString(0), r.getTimestamp(3)))
    // page after the 2nd row == offset page (2, 2)
    val cursor = all(1)
    val keyset = st.listConversationsAfter(cursor._2, cursor._1, 2)
      .collect().map(_.getString(0)).toSeq
    val offsetPage = st.listConversations(offset = 2, limit = 2)
      .collect().map(_.getString(0)).toSeq
    assert(keyset == offsetPage, s"keyset $keyset vs offset $offsetPage")
    // paging from the tie row skips only rows at/before it in total order
    val tieIdx = all.indexWhere(_._1 == "wfa")
    val afterTie = st.listConversationsAfter(all(tieIdx)._2, "wfa", 10)
      .collect().map(_.getString(0)).toSeq
    assert(afterTie == all.drop(tieIdx + 1).map(_._1).toSeq)
  }
}
