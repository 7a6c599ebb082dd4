package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Parquet table loaders for the driver-generated test data
 * (/root/repo/TESTDATA.md): TPC-H-ish star schema + `events` stream table +
 * `documents`/`embeddings` for the RAG / LLM-pipeline operator family.
 *
 * Reads go through `spark.read.parquet` so Catalyst predicate pushdown,
 * column pruning and partition pruning all apply — at 100 TB these scans are
 * the dominant cost and every query must show `PushedFilters`/pruned
 * `ReadSchema` in its formatted plan.
 */
object TestData {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /**
   * `events.parquet`'s `ts` physical type has varied across driver testdata
   * generations: TIMESTAMP(NANOS) (which Spark's parquet reader rejects —
   * read nanos as long via the legacy conf, floor-convert to µs exactly as
   * DuckDB's ns→TIMESTAMP coercion does) or plain TIMESTAMP(MICROS) (usable
   * as-is). Dispatch on the INFERRED schema, not an assumed generation, so
   * both vintages read identically and oracle comparisons agree.
   */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case _ =>
        // already µs precision, but read as TIMESTAMP_NTZ; cast to the
        // session-zone TIMESTAMP (session timezone is pinned UTC) so every
        // downstream query and dumped parquet sees the SAME type the
        // nanos-vintage path produced
        raw.withColumn("ts", raw("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
