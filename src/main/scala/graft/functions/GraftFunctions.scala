package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions._

import graft.expr.{BloomMightContain, ChunkText, CosineSimilarity, DotProduct, NormalizeText, StripAccents}

/**
 * Scalar-function surface of the engine (SURVEY.md §2.8–2.9, F1–F16 + V2–V3).
 *
 * Everything here is a Column function built on `org.apache.spark.sql.functions`
 * or a native Catalyst expression — no Scala UDFs — so every call stays inside
 * whole-stage codegen and is visible to Catalyst (constant folding, pushdown).
 *
 * The custom expressions are reached through the session FunctionRegistry +
 * `call_function` (the public path — `ExpressionUtils.column` is private[sql]
 * in Spark 4.1). Call `register(spark)` once per session (idempotent); every
 * engine entry point does this.
 */
object GraftFunctions {

  // ─── V3: vector ops ───────────────────────────────────────────────────────

  /** Cosine similarity of two array<float> columns (native codegen expression). */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Dot product of two array<float> columns; == cosine on normalized vectors. */
  def dotProduct(a: Column, b: Column): Column = call_function("dot_product", a, b)

  /** Canonical text form (NFC + control strip + whitespace collapse + trim) —
    * the dedup/fingerprint key (native codegen expression). */
  def normText(c: Column): Column = call_function("norm_text", c)

  /** Accent fold (NFD − combining marks → NFC) — the match-key fold for
    * entity resolution and search (native codegen expression). */
  def stripAccents(c: Column): Column = call_function("strip_accents", c)

  /** Probe a serialized BloomFilter sketch (see [[graft.expr.BloomMightContain]]). */
  def bloomMightContain(key: Column, filterBytes: Array[Byte]): Column =
    call_function("bloom_might_contain", key, lit(filterBytes))

  /** L2-normalize an array<float> vector (null-safe; zero vector → null). */
  def l2Normalize(v: Column): Column = {
    val norm = sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double")))
    when(norm > 0.0d, transform(v, x => (x.cast("double") / norm).cast("float")))
  }

  // ─── V2: chunker ─────────────────────────────────────────────────────────

  /**
   * Generator column: explodes `text` into (chunk_idx, chunk_start, chunk)
   * rows. Use as `df.select($"doc_id", chunkText($"text", 1000, 200))`.
   */
  def chunkText(text: Column, size: Int = ChunkText.DefaultSize,
                overlap: Int = ChunkText.DefaultOverlap): Column =
    call_function("chunk_text", text, lit(size), lit(overlap))

  // ─── F1–F16: string / date / misc scalar functions ──────────────────────

  /**
   * F1 — H1 title extraction: first line starting "# " but not "##", stripped;
   * null when no such line or empty title (reference ui/backend/main.py:68-89).
   */
  def extractTitle(markdown: Column): Column = {
    val t = trim(regexp_extract(markdown, "(?m)^#\\s+(.*?)\\s*$", 1))
    when(length(t) > 0, t)
  }

  /** F2 — truncate to n chars with "..." suffix when longer (neo4j_rag.py:363-365). */
  def truncateText(text: Column, n: Int): Column =
    when(length(text) > n, concat(substring(text, 1, n), lit("..."))).otherwise(text)

  /**
   * F3 — context block formatting (neo4j_rag.py:367-372):
   * Title/Summary/Content/(Similarity: %.2f).
   */
  def formatContext(title: Column, summary: Column, content: Column, score: Column): Column =
    format_string("Title: %s\nSummary: %s\nContent: %s\n(Similarity: %.2f)",
      title, summary, content, score)

  /** F5 — search-input formatting (research_manager.py:486-489). */
  def formatSearchInput(query: Column, reason: Column): Column =
    format_string("Search term: %s\nReason for searching: %s", query, reason)

  /** F6 — path normalization: prefix "/" when missing (neo4j_memory.py:119-122). */
  def normalizePath(path: Column): Column =
    when(path.isNull || path.startsWith("/"), path).otherwise(concat(lit("/"), path))

  /** F7 — non-empty-after-trim validation (ui/backend/main.py:233,455). */
  def isNonBlank(c: Column): Column = length(trim(coalesce(c, lit("")))) > 0

  /** F9 — id synthesis "{workflow_id}-msg-{seq}" / "-result-{seq}" (neo4j_memory.py:359,491). */
  def messageId(workflowId: Column, seq: Column): Column =
    concat_ws("-", workflowId, lit("msg"), seq)
  def resultId(workflowId: Column, seq: Column): Column =
    concat_ws("-", workflowId, lit("result"), seq)

  /** F11/F12 — case-insensitive substring membership (research_manager.py:593-596). */
  def containsAnyIgnoreCase(c: Column, needles: Seq[String]): Column =
    needles.map(n => lower(c).contains(n.toLowerCase)).reduce(_ || _)

  /**
   * F13 — KEY=VALUE arg parsing into a map; malformed args (no "=") yield
   * null, mirroring the reference CLI's skip
   * (cli/run_interactive_research_workflow.py:267-274). The guard matters:
   * `map(k, null)` throws "Cannot use null as map value" at runtime.
   */
  def parseKeyValue(c: Column): Column = {
    val parts = split(c, "=", 2)
    when(size(parts) === 2, map(element_at(parts, 1), element_at(parts, 2)))
  }

  /** F14 — comma-split + trim bootstrap-list parsing (redpanda_activity.py:17). */
  def parseCsvList(c: Column): Column = transform(split(c, ","), x => trim(x))

  // ─── SQL registration ────────────────────────────────────────────────────

  /** Function descriptions shared by `register` and `GraftExtensions`. */
  private[functions] val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    def intLit(e: Expression, name: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"chunk_text $name must be an integer literal, got $other")
    }
    Seq(
      (FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
        (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
      (FunctionIdentifier("dot_product"),
        new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
        (children: Seq[Expression]) => DotProduct(children(0), children(1))),
      (FunctionIdentifier("bloom_might_contain"),
        new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
        (children: Seq[Expression]) => BloomMightContain(children(0), children(1))),
      (FunctionIdentifier("norm_text"),
        new ExpressionInfo(classOf[NormalizeText].getName, "norm_text"),
        (children: Seq[Expression]) => NormalizeText(children.head)),
      (FunctionIdentifier("strip_accents"),
        new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
        (children: Seq[Expression]) => StripAccents(children.head)),
      (FunctionIdentifier("chunk_text"),
        new ExpressionInfo(classOf[ChunkText].getName, "chunk_text"),
        (children: Seq[Expression]) => children match {
          case Seq(t) => ChunkText(t, ChunkText.DefaultSize, ChunkText.DefaultOverlap)
          case Seq(t, s) => ChunkText(t, intLit(s, "size"), ChunkText.DefaultOverlap)
          case Seq(t, s, o) => ChunkText(t, intLit(s, "size"), intLit(o, "overlap"))
          case _ => throw new IllegalArgumentException("chunk_text(text[, size[, overlap]])")
        }))
  }

  /**
   * Registers the custom expressions in the session's FunctionRegistry so
   * they are usable from SQL text and `call_function` as `cosine_sim`,
   * `dot_product`, `chunk_text`. Idempotent. (Session-build alternative:
   * `spark.sql.extensions=graft.functions.GraftExtensions`.)
   */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    descriptions.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
  }
}
