package graft.store

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * ADD COLUMN evolution (round-15): `A:` manifest op — metadata-only
 * declaration, reads null-fill, appends physicalize at the declared type,
 * and (unlike rename/drop/widen) DML/compaction/sidecar builds proceed
 * while the op pends.
 */
class AddColumnSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("declare → null-filled reads → typed appends → DML while pending → materialize") {
    val base = java.nio.file.Files.createTempDirectory("graft-addcol").toString + "/t"
    Snapshots.write((1L to 40L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartitionByRange(2, col("id")), base, statsKey = Some("id"))
    val vA = Snapshots.addColumn(spark, base, "score", DoubleType)
    // metadata-only: no new files in the add version
    assert(Snapshots.manifestFiles(spark, base, vA).toSet ==
      Snapshots.manifestFiles(spark, base, vA - 1).toSet)
    // reads see the column immediately, null-filled; time travel doesn't
    val now = Snapshots.read(spark, base)
    assert(now.schema("score").dataType == DoubleType)
    assert(now.filter(col("score").isNotNull).count() == 0L)
    assert(!Snapshots.read(spark, base, Some(1L)).columns.contains("score"))

    // appends carry it physically at the declared type; a divergent type
    // is rejected loudly
    Snapshots.append((41L to 50L).map(i => (i, s"v$i", i / 2.0))
      .toDF("id", "s", "score"), base, statsKey = Some("id"))
    intercept[IllegalArgumentException] {
      Snapshots.append(Seq((51L, "x", 1)).toDF("id", "s", "score"), base)
    }
    val mixed = Snapshots.read(spark, base)
    assert(mixed.count() == 50L)
    assert(mixed.filter(col("score").isNotNull).count() == 10L)

    // DML proceeds while the add pends (no materializeSchema required) —
    // the rewrite physicalizes the column for rewritten rows and the A:
    // line keeps null-filling the untouched old files
    Snapshots.updateWhere(spark, base, col("id") === 3L,
      Seq("score" -> lit(9.5)))
    val afterUpd = Snapshots.read(spark, base)
    assert(afterUpd.filter(col("id") === 3L).head.getAs[Double]("score") == 9.5)
    assert(afterUpd.filter(col("score").isNull).count() == 39L)
    Snapshots.mergeInto(spark, base,
      Seq((60L, "new", 1.5)).toDF("id", "s", "score"), "id")
    assert(Snapshots.read(spark, base).count() == 51L)
    // sidecar builds proceed too
    assert(Snapshots.writeStatsSidecars(spark, base, Seq("score")) > 0)

    // materializeSchema physicalizes everywhere and folds the op away
    val before = Snapshots.read(spark, base)
      .select("id", "s", "score").collect().toSet
    val vM = Snapshots.materializeSchema(spark, base, statsKey = Some("id"))
    assert(!Snapshots.manifestLines(spark, base, vM).exists(_.startsWith("A:")))
    assert(Snapshots.read(spark, base)
      .select("id", "s", "score").collect().toSet == before)
  }

  test("guards: duplicate name, scan/count/topK over a declared column, compose with rename") {
    val base = java.nio.file.Files.createTempDirectory("graft-addcol2").toString + "/t"
    Snapshots.write((1L to 30L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartitionByRange(3, col("id")), base, statsKey = Some("id"))
    intercept[IllegalArgumentException] {
      Snapshots.addColumn(spark, base, "id", LongType) // exists
    }
    intercept[IllegalArgumentException] {
      Snapshots.addColumn(spark, base, "__x", LongType) // reserved
    }
    Snapshots.addColumn(spark, base, "tag", StringType)
    // predicate on the declared column: IS NULL matches everything, the
    // pruned verbs stay exact (no stats anywhere → must-scan, never wrong)
    assert(Snapshots.countWhere(spark, base, col("tag").isNull) == 30L)
    assert(Snapshots.scanWhere(spark, base, col("tag") === "x").count() == 0L)
    assert(Snapshots.topK(spark, base, "id", 3).count() == 3L)
    // rename of a declared column composes in line order
    Snapshots.renameColumn(spark, base, "tag", "label")
    val cols = Snapshots.read(spark, base).columns.toSet
    assert(cols.contains("label") && !cols.contains("tag"))
    // metaCount unaffected by metadata DDL
    assert(Snapshots.metaCount(spark, base) == Some(30L))
  }

  test("vacuum collects stale orphaned sidecar tmp debris in committed dirs") {
    val base = java.nio.file.Files.createTempDirectory("graft-tmpdeb").toString + "/t"
    Snapshots.write((1L to 10L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1), base)
    val dataFile = Snapshots.manifestFiles(spark, base, 1L).head
    // a failed executor write's leftover, named like writeSidecarAtomic's
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$base/v=1/.${new java.io.File(dataFile).getName}.ndv.tmp-deadbeef"),
      "junk")
    val fresh = s"$base/v=1/.${new java.io.File(dataFile).getName}.stats.tmp-cafecafe"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(fresh), "junk")
    // age only the stale one
    val staleFile = new java.io.File(
      s"$base/v=1/.${new java.io.File(dataFile).getName}.ndv.tmp-deadbeef")
    staleFile.setLastModified(System.currentTimeMillis() - 7200_000L)
    val removed = Snapshots.vacuum(spark, base, txnTtlMs = 3600_000L)
    assert(removed.exists(_.endsWith(".ndv.tmp-deadbeef")), removed.toString)
    assert(!staleFile.exists())
    assert(new java.io.File(fresh).exists(), "fresh tmp must survive the ttl")
    // the committed data is untouched
    assert(Snapshots.read(spark, base).count() == 10L)
  }
}
