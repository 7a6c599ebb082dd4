package graft.store

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Manifest segments (round-15): append-family commits fold long runs of
 * inherited lines into immutable `_seg-*` files referenced by `I:` include
 * lines, so commit metadata is O(delta + includes) instead of
 * O(table-files) — the write-side twin of the footer-sweep fix. Readers
 * expand transparently; segments are expiry/vacuum-protected like the data
 * files they describe.
 */
class ManifestSegmentSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Run `body` with a tiny fold threshold so small fixtures exercise the
    * segment machinery. */
  private def withFold[T](threshold: Int)(body: => T): T = {
    val prev = Snapshots.FoldRunThreshold
    Snapshots.FoldRunThreshold = threshold
    try body finally Snapshots.FoldRunThreshold = prev
  }

  private def df(lo: Long, hi: Long) =
    (lo to hi).map(i => (i, s"v$i")).toDF("id", "s")

  test("appends fold inherited lines; reads/time-travel/expanded views are unchanged") {
    withFold(6) {
      val base = java.nio.file.Files.createTempDirectory("graft-seg").toString + "/t"
      Snapshots.write(df(1, 100).repartitionByRange(4, col("id")), base,
        statsKey = Some("id"))
      (1 to 5).foreach { i =>
        Snapshots.append(df(100L + i * 10 - 9, 100L + i * 10)
          .coalesce(1), base, statsKey = Some("id"))
      }
      val head = Snapshots.versions(spark, base).last
      val raw = Snapshots.rawManifestLines(spark, base, head)
      val expanded = Snapshots.manifestLines(spark, base, head)
      assert(raw.exists(_.startsWith("I:")), s"no fold happened:\n$raw")
      assert(raw.size < expanded.size,
        s"raw (${raw.size}) must be smaller than expanded (${expanded.size})")
      // the expanded view carries every data entry exactly once: 4 base
      // files + 5 one-file appends, no duplicates through the fold
      val files = Snapshots.manifestFiles(spark, base, head)
      assert(files.size == 9 && files.distinct.size == 9, files.mkString("\n"))
      assert(!expanded.exists(_.startsWith("I:")), "expansion must be total")
      // reads through the folded manifest
      assert(Snapshots.read(spark, base).count() == 150L)
      assert(Snapshots.countWhere(spark, base, col("id") <= 50L) == 50L)
      assert(Snapshots.scanWhere(spark, base, col("id") === 120L).count() == 1L)
      assert(Snapshots.metaCount(spark, base) == Some(150L))
      // time travel across folded and pre-fold versions
      assert(Snapshots.read(spark, base, Some(1L)).count() == 100L)
      // appendedSince still sees a pure append chain THROUGH the folds
      assert(Snapshots.appendedSince(spark, base, 1L).count() == 50L)
    }
  }

  test("raw manifest stays bounded while expanded grows (O(delta) commits)") {
    withFold(6) {
      val base = java.nio.file.Files.createTempDirectory("graft-seg2").toString + "/t"
      Snapshots.write(df(1, 10).repartition(3), base)
      val rawSizes = (1 to 12).map { i =>
        Snapshots.append(df(100L * i, 100L * i + 5).repartition(2), base)
        Snapshots.rawManifestLines(spark, base,
          Snapshots.versions(spark, base).last).size
      }
      val expanded = Snapshots.manifestLines(spark, base,
        Snapshots.versions(spark, base).last)
      assert(expanded.count(!_.startsWith("S:")) >= 27, expanded.size.toString)
      // raw line count must not track the table's file count: with
      // threshold 6 every ≥6-line loose run folds, so the raw manifest
      // stays within includes + a sub-threshold tail + the delta
      assert(rawSizes.last < expanded.size / 2,
        s"raw=${rawSizes.last} expanded=${expanded.size}")
      assert(Snapshots.read(spark, base).count() == 10 + 12 * 6)
    }
  }

  test("expire keeps segments a surviving manifest includes; drops them with their last reference") {
    withFold(4) {
      val base = java.nio.file.Files.createTempDirectory("graft-seg3").toString + "/t"
      Snapshots.write(df(1, 40).repartitionByRange(5, col("id")), base,
        statsKey = Some("id"))
      Snapshots.append(df(41, 44).coalesce(1), base, statsKey = Some("id")) // folds v1's 5 lines
      Snapshots.append(df(45, 48).coalesce(1), base, statsKey = Some("id"))
      val head = Snapshots.versions(spark, base).last
      val segs = Snapshots.rawManifestLines(spark, base, head)
        .filter(_.startsWith("I:")).map(_.drop(2))
      assert(segs.nonEmpty, "fixture must have folded")
      // drop v1 and v2: the head still includes segments physically living
      // in dropped version dirs — they must survive
      Snapshots.expire(spark, base, keep = 1)
      segs.foreach { rel =>
        assert(new java.io.File(s"$base/$rel").exists(),
          s"segment $rel was collected while the head still includes it")
      }
      assert(Snapshots.read(spark, base).count() == 48L)
      assert(Snapshots.countWhere(spark, base, col("id") > 40L) == 8L)
      // vacuum must not collect included segments either
      Snapshots.vacuum(spark, base, txnTtlMs = 0L)
      assert(Snapshots.read(spark, base).count() == 48L)
    }
  }

  test("rewrite verbs unfold but stay correct; later appends refold; MV refresh crosses folds") {
    withFold(5) {
      val root = java.nio.file.Files.createTempDirectory("graft-seg4").toString
      val (base, mv) = (root + "/t", root + "/mv")
      val rows = (1L to 60L).map(i => (i, s"g${i % 3}", 1.0))
        .toDF("id", "grp", "v")
      Snapshots.write(rows.repartitionByRange(6, col("id")), base,
        statsKey = Some("id"))
      Snapshots.append(rows.filter(col("id") <= 0).coalesce(1), base) // fold trigger
      MatView.create(spark, base, mv, Seq("grp"), "v")
      // CoW delete reads the folded manifest, inherits expanded subsets —
      // and its own commit RE-FOLDS them (commitStaged folds any long
      // loose run, so even rewrite commits keep O-bounded manifests)
      Snapshots.deleteWhere(spark, base, col("id") % 10 === 0)
      assert(Snapshots.read(spark, base).count() == 54L)
      // MV CDC fallback across the rewrite still converges
      MatView.refresh(spark, base, mv, Seq("grp"), "v", cdcKey = Some("id"))
      assert(MatView.read(spark, mv)
        .agg(org.apache.spark.sql.functions.sum(col("n"))).head.getLong(0) == 54L)
      // appends after the rewrite keep the manifest folded and correct
      (1 to 3).foreach(i => Snapshots.append(
        df(1000L * i, 1000L * i + 1).coalesce(1)
          .withColumn("grp", lit("gX")).withColumn("v", lit(1.0))
          .select(col("id"), col("grp"), col("v")), base))
      val rawTail = Snapshots.rawManifestLines(spark, base,
        Snapshots.versions(spark, base).last)
      assert(rawTail.exists(_.startsWith("I:")), rawTail.mkString("\n"))
      assert(Snapshots.read(spark, base).count() == 60L)
    }
  }

  test("branches and WAP publish preserve segment references; dropBranch sweeps unshared segments") {
    withFold(4) {
      val base = java.nio.file.Files.createTempDirectory("graft-seg5").toString + "/t"
      Snapshots.write(df(1, 40).repartitionByRange(5, col("id")), base,
        statsKey = Some("id"))
      Snapshots.append(df(41, 42).coalesce(1), base, statsKey = Some("id"))
      Snapshots.createBranch(spark, base, "audit", 2L)
      Snapshots.appendBranch(df(43, 46).coalesce(1), base, "audit")
      assert(Snapshots.readBranch(spark, base, "audit").count() == 46L)
      Snapshots.fastForward(spark, base, "audit")
      assert(Snapshots.read(spark, base).count() == 46L)
      // branch manifests inherited main's segments; dropping the branch
      // must NOT collect segments main still includes
      Snapshots.dropBranch(spark, base, "audit")
      assert(Snapshots.read(spark, base).count() == 46L)
      assert(Snapshots.countWhere(spark, base, col("id") <= 8L) == 8L)
    }
  }
}
