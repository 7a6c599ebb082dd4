package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** JSONL ingestion: schema-clean rows split from quarantined raw lines. */
class IngestSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val schema = new StructType()
    .add("id", LongType).add("text", StringType)

  private def withJsonl(lines: Seq[String])(f: String => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-ingest")
    try {
      Files.write(dir.resolve("part-0.jsonl"),
        lines.mkString("\n").getBytes("UTF-8"))
      f(dir.toString)
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (Files.isDirectory(p)) Files.list(p).forEach(rm(_))
        Files.deleteIfExists(p)
      }
      rm(dir)
    }
  }

  test("clean rows parse, malformed lines quarantine with the raw text intact") {
    withJsonl(Seq(
      """{"id": 1, "text": "good row"}""",
      """{"id": 2 "text": "missing comma"}""",     // malformed JSON
      """not json at all""",
      """{"id": 4, "text": "also good"}"""
    )) { dir =>
      val (clean, quarantined) = Ingest.jsonlWithQuarantine(spark, dir, schema)
      assert(clean.columns.toSeq == Seq("id", "text"))
      assert(clean.as[(Long, String)].collect().toSet ==
        Set((1L, "good row"), (4L, "also good")))
      val bad = quarantined.as[String].collect().toSet
      assert(bad == Set("""{"id": 2 "text": "missing comma"}""", "not json at all"))
    }
  }

  test("type mismatches quarantine too — schema is a contract, not a hint") {
    withJsonl(Seq(
      """{"id": "not-a-number", "text": "bad type"}""",
      """{"id": 7, "text": "fine"}"""
    )) { dir =>
      val (clean, quarantined) = Ingest.jsonlWithQuarantine(spark, dir, schema)
      assert(clean.as[(Long, String)].collect().toSeq == Seq((7L, "fine")))
      assert(quarantined.as[String].collect().toSeq ==
        Seq("""{"id": "not-a-number", "text": "bad type"}"""))
    }
  }

  test("all-clean input quarantines nothing; extra fields are not corruption") {
    withJsonl(Seq(
      """{"id": 1, "text": "a", "extra": "ignored"}""",
      """{"id": 2, "text": "b"}"""
    )) { dir =>
      val (clean, quarantined) = Ingest.jsonlWithQuarantine(spark, dir, schema)
      assert(clean.count() == 2 && quarantined.count() == 0)
    }
  }

  test("readEvolved unifies drifted batch schemas with nulls for old rows") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-evolve-spec")
    try {
      Seq((1L, "x")).toDF("id", "a")
        .write.mode("overwrite").parquet(root.toString + "/b=1")
      Seq((2L, "y", 9L)).toDF("id", "a", "added")
        .write.mode("overwrite").parquet(root.toString + "/b=2")
      val df = Ingest.readEvolved(spark, root.toString)
      assert(df.columns.toSet == Set("id", "a", "added", "b"))
      val rows = df.select("id", "added")
        .as[(Long, Option[Long])].collect().toMap
      assert(rows(1L).isEmpty && rows(2L).contains(9L))
      // column pruning still reaches the merged scan
      val plan = df.select("id").queryExecution.executedPlan.toString
      assert(plan.contains("ReadSchema: struct<id:bigint>"), plan)
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).forEach(rm(_))
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(root)
    }
  }
}
