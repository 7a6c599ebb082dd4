package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * S11 — file/artifact sinks (SURVEY §2.1): the reference writes generated
 * images, PDFs, and markdown reports to disk
 * (/root/reference/openai_agents/workflows/image_generation_activity.py:102-125,
 * pdf_generation_activity.py:90-106, cli/run_interactive_research_workflow.py:199-202).
 *
 * Spark-side: binary payload rows → files via `foreachPartition` (executor-
 * side IO, no driver funnel — each task writes its partition's artifacts),
 * and text reports via the text datasource. The inverse direction is
 * `Multimodal.readBinaryDir` (binaryFile source).
 *
 * At scale: artifact writes are embarrassingly parallel and IO-bound;
 * partition count controls concurrent writers. File naming comes from the
 * row (media_id), so retries are idempotent overwrites, not duplicates.
 */
object Artifacts {

  /**
   * Write one file per row: (media_id: string, payload: binary) → dir/media_id.
   * Runs on executors; `dir` must be a path visible to them (local dir in
   * local mode, shared/object storage on a cluster).
   */
  def writeBinaryArtifacts(df: DataFrame, dir: String): Unit = {
    val out = dir
    df.select(col("media_id").cast("string"), col("payload"))
      .foreachPartition { rows: Iterator[Row] =>
        val base = Paths.get(out)
        Files.createDirectories(base)
        rows.foreach { r =>
          val name = Paths.get(r.getString(0)).getFileName.toString // no traversal
          Files.write(base.resolve(name), r.getAs[Array[Byte]](1),
            StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
            StandardOpenOption.WRITE)
        }
      }
  }

  /**
   * Write markdown reports: one file per row named `<workflow_id>.md`
   * (CLI's report save shape). Same executor-side write path.
   */
  def writeReports(df: DataFrame, dir: String): Unit =
    writeBinaryArtifacts(
      df.select(concat(col("workflow_id"), lit(".md")).as("media_id"),
        encode(col("markdown_report"), "UTF-8").as("payload")),
      dir)
}
