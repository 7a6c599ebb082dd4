package graft.multimodal

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def mediaDf = Seq(
    Multimodal.MediaItem("img1", "image", Array[Byte](1, 2, 3, 4), "image/png",
      Some(640), Some(480), None, "/m/img1.png"),
    Multimodal.MediaItem("img2", "image", Array[Byte](9, 9), "image/png",
      Some(100), Some(50), None, "/m/img2.png"),
    Multimodal.MediaItem("vid1", "video", Array.fill[Byte](64)(7), "video/mp4",
      Some(1920), Some(1080), Some(10000L), "/m/vid1.mp4")
  ).toDF()

  test("binaryFile source ingests files as media rows") {
    val dir = Files.createTempDirectory("graft-media")
    Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3))
    Files.write(dir.resolve("b.bin"), Array[Byte](4, 5))
    val df = Multimodal.readBinaryDir(spark, dir.toString, "*.bin")
    val rows = df.select("media_id", "payload").as[(String, Array[Byte])]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("a.bin", "b.bin"))
    assert(rows(0)._2.toSeq == Seq[Byte](1, 2, 3))
  }

  test("extractFeatures: per-partition codec init, deterministic features + checksum") {
    val f = Multimodal.extractFeatures(mediaDf, dim = 4).collect()
      .map(m => m.media_id -> m).toMap
    assert(f("img1").n_bytes == 4)
    assert(f("img1").features.toSeq == Seq(1 / 255f, 2 / 255f, 3 / 255f, 4 / 255f))
    // determinism: same input → same checksum on re-run
    val again = Multimodal.extractFeatures(mediaDf, dim = 4).collect()
      .map(m => m.media_id -> m.checksum).toMap
    assert(f.view.mapValues(_.checksum).toMap == again)
  }

  test("patchFeatures: contiguous byte slices, exact bucket sums, ragged tail to last patch") {
    // 6 bytes over grid=4: i*4/6 → patches [0,0,1,2,2,3] — the ragged
    // boundary the integer math must place deterministically
    val media = Seq(("m1", Array[Byte](10, 20, 30, 40, 50, 60))).toDF("media_id", "payload")
    val p = Multimodal.patchFeatures(media, grid = 4, dim = 2).collect()
      .sortBy(_.patch_idx)
    assert(p.length == 4 && p.forall(_.n_bytes == 6))
    // bucket = global index % 2: patch0 gets bytes 10(i=0,b0),20(i=1,b1)
    assert(p(0).features.toSeq == Seq(10L, 20L))
    assert(p(1).features.toSeq == Seq(30L, 0L))     // byte 30 at i=2 → b0
    assert(p(2).features.toSeq == Seq(50L, 40L))    // i=4→b0, i=3→b1
    assert(p(3).features.toSeq == Seq(0L, 60L))     // i=5 → b1
    // empty payload yields no patch rows
    val empty = Seq(("m2", Array.emptyByteArray)).toDF("media_id", "payload")
    assert(Multimodal.patchFeatures(empty, 4, 2).isEmpty)
  }

  test("pooledEmbedding: per-dim sums across patches, unit L2 norm, dim order preserved") {
    val media = Seq(("m1", Array[Byte](10, 20, 30, 40, 50, 60))).toDF("media_id", "payload")
    val emb = Multimodal.pooledEmbedding(
      Multimodal.patchFeatures(media, grid = 4, dim = 2).toDF(), dim = 2)
      .select($"media_id", $"embedding").as[(String, Array[Float])].collect()
    assert(emb.length == 1)
    val v = emb(0)._2
    // pooled sums: b0 = 10+30+50 = 90, b1 = 20+40+60 = 120 → direction (3,4)/5
    assert(math.abs(v(0) - 0.6f) < 1e-6 && math.abs(v(1) - 0.8f) < 1e-6)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // zero-payload media (no patches) and all-zero vectors are absent, not NaN
    val zero = Seq(("mz", Array[Byte](0, 0))).toDF("media_id", "payload")
    assert(Multimodal.pooledEmbedding(
      Multimodal.patchFeatures(zero, 2, 2).toDF(), 2).isEmpty)
  }

  test("withResizedDims keeps aspect ratio via integer floor math (F15)") {
    val r = Multimodal.withResizedDims(mediaDf, targetWidth = 320)
      .select("media_id", "resized_height").as[(String, Option[Int])].collect().toMap
    assert(r("img1").contains(240)) // 480 * 320/640
    assert(r("img2").contains(160)) // 50 * 320/100
  }

  test("sampleFrames explodes duration-spaced frame rows for video only") {
    val frames = Multimodal.sampleFrames(mediaDf, everyMs = 2500)
      .select("media_id", "frame_idx").as[(String, Int)].collect()
    assert(frames.forall(_._1 == "vid1"))
    assert(frames.map(_._2).sorted.toSeq == Seq(0, 1, 2, 3)) // 0,2500,5000,7500
  }

  test("repartitionByBytes sizes partition count from payload volume") {
    val df = Multimodal.repartitionByBytes(mediaDf, targetBytesPerTask = 32)
    assert(df.rdd.getNumPartitions == 3) // 70 bytes total / 32 → 3 parts
    assert(df.count() == 3)
  }
}
