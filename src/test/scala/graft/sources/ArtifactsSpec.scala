package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.multimodal.Multimodal

/** S11 artifact sink ↔ binaryFile source round trip. */
class ArtifactsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("binary artifacts write one file per row from executors; idempotent overwrite") {
    val dir = Files.createTempDirectory("graft-art").toString
    val df = Seq(
      ("img-a.png", Array[Byte](1, 2, 3)),
      ("img-b.png", Array[Byte](4, 5))
    ).toDF("media_id", "payload")
    Artifacts.writeBinaryArtifacts(df, dir)
    Artifacts.writeBinaryArtifacts(df, dir) // retry must overwrite, not duplicate
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString).sorted
    assert(files.length == 2)
    assert(Files.readAllBytes(Paths.get(dir, "img-a.png")).toSeq == Seq[Byte](1, 2, 3))
    // round trip through the binaryFile source (S11 sink ↔ source)
    val back = Multimodal.readBinaryDir(spark, dir, "*.png")
      .select("media_id", "payload").as[(String, Array[Byte])].collect()
      .map { case (k, v) => k -> v.toSeq }.toMap
    assert(back == Map("img-a.png" -> Seq[Byte](1, 2, 3), "img-b.png" -> Seq[Byte](4, 5)))
  }

  test("report sink writes <workflow_id>.md with UTF-8 content") {
    val dir = Files.createTempDirectory("graft-rep").toString
    val df = Seq(("wf1", "# Title\n\nbody — naïve")).toDF("workflow_id", "markdown_report")
    Artifacts.writeReports(df, dir)
    val content = new String(Files.readAllBytes(Paths.get(dir, "wf1.md")), "UTF-8")
    assert(content == "# Title\n\nbody — naïve")
  }

  test("path traversal in media_id is neutralized to the basename") {
    val dir = Files.createTempDirectory("graft-sec").toString
    val df = Seq(("../../evil.bin", Array[Byte](9))).toDF("media_id", "payload")
    Artifacts.writeBinaryArtifacts(df, dir)
    assert(Files.exists(Paths.get(dir, "evil.bin")))
    assert(!Files.exists(Paths.get(dir).getParent.resolve("evil.bin")))
  }

  test("consumer/producer option helpers carry the documented knobs") {
    val c = graft.streaming.Events.consumerOptions("topic-a", "earliest", Some("g1"))
    assert(c("subscribe") == "topic-a" && c("startingOffsets") == "earliest"
      && c("kafka.group.id") == "g1")
    val p = graft.streaming.Events.producerTuning()
    assert(p("kafka.acks") == "1" && p("kafka.compression.type") == "snappy"
      && p("kafka.batch.size") == "16384" && p("kafka.linger.ms") == "10")
  }
}
