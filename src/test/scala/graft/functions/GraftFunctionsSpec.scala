package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** F1–F16 scalar semantics pinned to the reference (SURVEY §2.8). */
class GraftFunctionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def title(md: String): Option[String] =
    Seq(md).toDF("md").select(GraftFunctions.extractTitle(col("md")).as("t"))
      .as[Option[String]].collect().head

  test("F1: extracts first '# ' line, strips prefix (ui/backend/main.py:68-89)") {
    assert(title("intro\n# My Title\nbody") == Some("My Title"))
  }

  test("F1: '##' subsection lines are not titles") {
    assert(title("## Section\ntext") == None)
  }

  test("F1: '# ' heading wins over later headings; whitespace trimmed") {
    assert(title("# First  \n# Second") == Some("First"))
  }

  test("F1: empty title → null") {
    assert(title("no headings here") == None)
  }

  test("F2: truncation appends '...' only when longer than n (neo4j_rag.py:363-365)") {
    val r = Seq(("a" * 10, "b" * 5)).toDF("long", "short")
      .select(GraftFunctions.truncateText(col("long"), 5).as("l"),
        GraftFunctions.truncateText(col("short"), 5).as("s"))
      .as[(String, String)].collect().head
    assert(r == (("a" * 5) + "...", "b" * 5))
  }

  test("F3: context block format with 2-decimal similarity (neo4j_rag.py:367-372)") {
    val r = Seq(("T", "S", "C", 0.876)).toDF("t", "s", "c", "sc")
      .select(GraftFunctions.formatContext(col("t"), col("s"), col("c"), col("sc")).as("f"))
      .as[String].collect().head
    assert(r == "Title: T\nSummary: S\nContent: C\n(Similarity: 0.88)")
  }

  test("F5: search-input format (research_manager.py:486-489)") {
    val r = Seq(("q", "r")).toDF("q", "r")
      .select(GraftFunctions.formatSearchInput(col("q"), col("r")).as("f"))
      .as[String].collect().head
    assert(r == "Search term: q\nReason for searching: r")
  }

  test("F6: path normalization prefixes '/' only when missing (neo4j_memory.py:119-122)") {
    val r = Seq(("img.png", "/abs.png")).toDF("rel", "abs")
      .select(GraftFunctions.normalizePath(col("rel")).as("r"),
        GraftFunctions.normalizePath(col("abs")).as("a"))
      .as[(String, String)].collect().head
    assert(r == ("/img.png", "/abs.png"))
  }

  test("F7: isNonBlank - whitespace-only and null are blank") {
    val r = Seq(("  ", "x", null.asInstanceOf[String])).toDF("ws", "ok", "nul")
      .select(GraftFunctions.isNonBlank(col("ws")),
        GraftFunctions.isNonBlank(col("ok")),
        GraftFunctions.isNonBlank(col("nul")))
      .as[(Boolean, Boolean, Boolean)].collect().head
    assert(r == ((false, true, false)))
  }

  test("F9: id synthesis format workflow-msg-seq (neo4j_memory.py:359,491)") {
    val r = Seq(("wf1", 3)).toDF("w", "s")
      .select(GraftFunctions.messageId(col("w"), col("s")).as("m"),
        GraftFunctions.resultId(col("w"), col("s")).as("r"))
      .as[(String, String)].collect().head
    assert(r == ("wf1-msg-3", "wf1-result-3"))
  }

  test("F11/F12: case-insensitive substring membership (research_manager.py:593-596)") {
    val r = Seq("Fatal ERROR occurred").toDF("s")
      .select(GraftFunctions.containsAnyIgnoreCase(col("s"), Seq("error", "timeout")).as("m"))
      .as[Boolean].collect().head
    assert(r)
  }

  test("F13: KEY=VALUE parses into map; splits on first '=' only") {
    val r = Seq("depth=a=b").toDF("s")
      .select(GraftFunctions.parseKeyValue(col("s")).as("m"))
      .as[Map[String, String]].collect().head
    assert(r == Map("depth" -> "a=b"))
  }

  test("F13: malformed arg without '=' → null (reference CLI skips it)") {
    val r = Seq("noequals").toDF("s")
      .select(GraftFunctions.parseKeyValue(col("s")).as("m"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("F14: bootstrap list parse comma-splits and trims (redpanda_activity.py:17)") {
    val r = Seq("a:9092 , b:9092,c:9092").toDF("s")
      .select(GraftFunctions.parseCsvList(col("s")).as("l"))
      .as[Seq[String]].collect().head
    assert(r == Seq("a:9092", "b:9092", "c:9092"))
  }
}
