package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/**
 * Schema-enforced JSONL ingestion with corrupt-record quarantine — the
 * batch twin of the streaming DLQ ([[graft.streaming.Events]] T1 "never
 * break"): a crawl/export drop always contains some malformed lines, and
 * the pipeline must neither crash (FAILFAST) nor silently null them out
 * (plain PERMISSIVE).
 *
 * PERMISSIVE mode + `columnNameOfCorruptRecord` keeps the RAW offending
 * line alongside the parsed rows; we split clean from quarantined, each
 * side a plain DataFrame. The read is distributed line-parallel (JSONL
 * splits at newlines); nothing funnels through the driver.
 */
object Ingest {

  /**
   * (clean, quarantined): `clean` carries exactly `schema`'s fields;
   * `quarantined` is (raw_line) — the unparsed text of every line that
   * failed the schema, ready for a DLQ sink.
   *
   * The json FILE source refuses to answer queries that touch only its
   * corrupt-record column (it would have to re-parse just to re-fail, so
   * Spark demands a cache). Reading lines through the text source and
   * parsing with `from_json` — corrupt column embedded in the struct —
   * sidesteps that restriction: both sides stay independent codegen'd
   * scans, no cache, and the text scan still splits at newlines.
   */
  def jsonlWithQuarantine(spark: SparkSession, path: String,
                          schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "schema must not already contain _corrupt_record")
    val readSchema = schema.add("_corrupt_record", StringType)
    val parsed = spark.read.text(path)
      .select(from_json(col("value"), readSchema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("p"))
    val clean = parsed.filter(col("p._corrupt_record").isNull)
      .select(schema.fieldNames.map(f => col(s"p.$f")).toSeq: _*)
    val quarantined = parsed.filter(col("p._corrupt_record").isNotNull)
      .select(col("p._corrupt_record").as("raw_line"))
    (clean, quarantined)
  }

  /**
   * Schema-evolution read: a long-lived dataset accumulates batches whose
   * schemas drifted (columns added over time), and a consumer must see ONE
   * unified schema with nulls where an old batch predates a column.
   *
   * `mergeSchema` asks the parquet source to union the file footers'
   * schemas at planning time — per-FOOTER metadata only, no data scan, and
   * at 100 TB the footer reads parallelize over the executor pool. Column
   * pruning and filter pushdown still apply to the merged scan: a file
   * without a requested column vectorizes it as nulls. Prefer this over N
   * separate reads + unionByName(allowMissingColumns): one scan node, one
   * pass, partition pruning intact.
   */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
