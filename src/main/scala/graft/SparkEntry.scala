package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.GraftFunctions
import graft.model.Schemas
import graft.ops.Relational
import graft.rag.Rag
import graft.sources.TestData
import graft.streaming.Events
import graft.text.TextAnalysis

/**
 * Driver contract (SURVEY.md §7): `entry` = flagship smoke query,
 * `queries` = one entry per implemented operator from SURVEY.md §2,
 * `oracleSql` = the DuckDB-equivalent ANSI SQL per query key.
 *
 * Conventions that make the oracle hash-compare deterministic:
 *  - every query ends with an explicit ORDER BY mirrored in the SQL;
 *  - FP aggregations go through exact DECIMAL(18,2) sums, cast back to
 *    double (identical bits regardless of partial-agg order);
 *  - cosine scores are rounded to 6 dp on output (double accumulation
 *    error ~1e-15, so rounding is stable across engines);
 *  - nanosecond event timestamps are exposed as epoch milliseconds
 *    (Spark floor-truncates ns→µs exactly like DuckDB).
 */
object SparkEntry {

  import graft.entry.Shared.{Q, queryVec}
  import graft.entry._


  // ────────────────────────────────────────────────────────────────────────
  /** Flagship: V5 context retrieval over documents+embeddings at sf0.001
    * (SURVEY §7.2 slice 0 — scan → cosine → top-k → threshold → truncate →
    * format → concat_ws, the exact shape of neo4j_rag.py:333-375). */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    GraftFunctions.register(spark)
    val q = queryVec(spark, d)
    val results = TestData.embeddings(spark, d)
      .join(TestData.documents(spark, d), col("vec_id") === col("doc_id"))
    Rag.contextRetrieval(results, "vec_id", "embedding",
      concat(lit("Doc "), col("doc_id").cast("string")),
      substring(col("text"), 1, 30), col("text"),
      q, k = 3, minScore = 0.0, truncateAt = 2000)
  }
  // Family query defs live in graft.entry (round-12 split); the
  // concatenation order is the historical single-file order.
  private def defs: Seq[(String, Q)] =
    CoreQueries.defs ++ DedupQueries.defs ++ TextQueries.defs ++
      ScalarQueries.defs ++ StoreQueries.defs ++ AnalyticsQueries.defs ++
      TpchQueries.defs ++ GraphQueries.defs ++ CurationQueries.defs ++
      AdvancedQueries.defs


  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (k, q) => k -> q.fn }.toMap

  def oracleSql: Map[String, String] =
    defs.collect { case (k, Q(_, Some(sql))) => k -> sql }.toMap
}
