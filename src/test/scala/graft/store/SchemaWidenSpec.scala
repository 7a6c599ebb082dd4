package graft.store

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Type-widening schema evolution (round-15): `W:` manifest ops — the third
 * Iceberg evolution verb after round-14's rename/drop. Metadata-only
 * commit; narrow-vintage files are read wide through the recorded-schema
 * union (the parquet reader upcasts in place); materializeSchema rewrites
 * only the narrow files; the guard matrix mirrors rename/drop.
 */
class SchemaWidenSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("int→long: metadata-only widen, mixed-vintage reads, time travel, partial materialize") {
    val base = java.nio.file.Files.createTempDirectory("graft-widen").toString + "/t"
    val narrow = (1 to 100).map(i => (i, s"v$i")).toDF("id", "s")
      .select(col("id").cast("int").as("id"), col("s"))
      .repartitionByRange(2, col("id"))
    Snapshots.write(narrow, base, statsKey = Some("id"))
    assert(Snapshots.read(spark, base).schema("id").dataType == IntegerType)

    val vW = Snapshots.widenColumn(spark, base, "id", LongType)
    // metadata-only: no new data file in the widen version
    assert(Snapshots.manifestFiles(spark, base, vW).toSet ==
      Snapshots.manifestFiles(spark, base, vW - 1).toSet)
    assert(Snapshots.read(spark, base).schema("id").dataType == LongType)
    // time travel sees the narrow schema AS OF the pre-widen version
    assert(Snapshots.read(spark, base, Some(1L)).schema("id").dataType == IntegerType)

    // post-widen appends: wide AND still-narrow writers both land
    Snapshots.append((101L to 150L).map(i => (i, s"v$i")).toDF("id", "s"),
      base, statsKey = Some("id"))
    Snapshots.append((151 to 160).map(i => (i, s"v$i")).toDF("id", "s")
      .select(col("id").cast("int").as("id"), col("s")), base,
      statsKey = Some("id"))
    val all = Snapshots.read(spark, base)
    assert(all.schema("id").dataType == LongType)
    assert(all.as[(Long, String)].collect().map(_._1).sorted.toSeq ==
      (1L to 160L))

    // stats keep pruning across the widening (tag L on both vintages)
    assert(Snapshots.countWhere(spark, base, col("id") <= 50L) == 50L)
    val (cand, pruned) = Snapshots.scanPlan(spark, base, col("id") === 120L)
    assert(pruned.nonEmpty && cand.nonEmpty, "stats must prune across widen")
    assert(Snapshots.scanWhere(spark, base, col("id") === 120L)
      .as[(Long, String)].collect().toSeq == Seq((120L, "v120")))

    // materializeSchema rewrites ONLY the narrow-vintage files; the wide
    // append is inherited by reference, and the W: line is folded away
    val preFiles = Snapshots.manifestFiles(spark, base,
      Snapshots.versions(spark, base).last).toSet
    val before = Snapshots.read(spark, base).as[(Long, String)].collect().toSet
    val vM = Snapshots.materializeSchema(spark, base, statsKey = Some("id"))
    val lines = Snapshots.manifestLines(spark, base, vM)
    assert(!lines.exists(_.startsWith("W:")), "widen op must be folded")
    val postFiles = Snapshots.manifestFiles(spark, base, vM).toSet
    assert((preFiles intersect postFiles).nonEmpty, "wide files must inherit")
    assert((preFiles -- postFiles).nonEmpty, "narrow files must be rewritten")
    assert(Snapshots.read(spark, base).as[(Long, String)].collect().toSet ==
      before, "materialize must be bit-identical")
    assert(Snapshots.read(spark, base).schema("id").dataType == LongType)
  }

  test("float→double and decimal precision growth widen; metaCount survives") {
    val base = java.nio.file.Files.createTempDirectory("graft-widen2").toString + "/t"
    val df = (1 to 40).map(i => (i.toLong, i / 2.0f, BigDecimal(i).setScale(2)))
      .toDF("id", "score", "amt")
      .select(col("id"), col("score").cast("float").as("score"),
        col("amt").cast("decimal(10,2)").as("amt"))
    Snapshots.write(df, base)
    Snapshots.widenColumn(spark, base, "score", DoubleType)
    Snapshots.widenColumn(spark, base, "amt", DecimalType(14, 2))
    val got = Snapshots.read(spark, base)
    assert(got.schema("score").dataType == DoubleType)
    assert(got.schema("amt").dataType == DecimalType(14, 2))
    assert(got.agg(org.apache.spark.sql.functions.sum(col("score"))).head
      .getDouble(0) == (1 to 40).map(_ / 2.0f).sum.toDouble)
    assert(Snapshots.metaCount(spark, base) == Some(40L))
  }

  test("guard matrix: unwidenable types, pending ops, MoR deletes, rewrite verbs") {
    val base = java.nio.file.Files.createTempDirectory("graft-widen3").toString + "/t"
    Snapshots.write((1 to 20).map(i => (i, s"v$i")).toDF("id", "s")
      .select(col("id").cast("int").as("id"), col("s")), base)

    // not widenable: narrowing, cross-kind, scale change
    intercept[IllegalArgumentException] {
      Snapshots.widenColumn(spark, base, "id", IntegerType) // identity
    }
    intercept[IllegalArgumentException] {
      Snapshots.widenColumn(spark, base, "s", LongType) // string→long
    }
    intercept[IllegalArgumentException] {
      Snapshots.widenColumn(spark, base, "nope", LongType) // absent
    }

    Snapshots.widenColumn(spark, base, "id", LongType)
    // rewrite verbs refuse while the widen pends (same matrix as rename)
    intercept[IllegalArgumentException] {
      Snapshots.mergeInto(spark, base, Seq((1L, "X")).toDF("id", "s"), "id")
    }
    intercept[IllegalArgumentException] {
      Snapshots.compact(spark, base, smallBytes = 1L << 30)
    }
    intercept[IllegalArgumentException] {
      Snapshots.writeBloomSidecars(spark, base, "id")
    }
    // rename/drop refuse while a widen pends, and vice versa
    intercept[IllegalArgumentException] {
      Snapshots.renameColumn(spark, base, "s", "s2")
    }
    intercept[IllegalArgumentException] {
      Snapshots.dropColumn(spark, base, "s")
    }
    Snapshots.materializeSchema(spark, base)
    Snapshots.renameColumn(spark, base, "s", "s2")
    intercept[IllegalArgumentException] {
      Snapshots.widenColumn(spark, base, "id", LongType) // pending rename
    }
    Snapshots.materializeSchema(spark, base)

    // MoR delete pending → widen refuses
    Snapshots.deleteWhereMoR(spark, base, col("id") === 1L)
    intercept[IllegalArgumentException] {
      Snapshots.widenColumn(spark, base, "id", LongType)
    }
  }

  test("widen refuses on pre-upgrade tables without recorded schemas") {
    val base = java.nio.file.Files.createTempDirectory("graft-widen4").toString + "/t"
    Snapshots.write((1 to 10).map(i => (i, s"v$i")).toDF("id", "s")
      .select(col("id").cast("int").as("id"), col("s")), base)
    // simulate a pre-round-15 manifest
    val mf = new java.io.File(s"$base/v=1/_manifest")
    val stripped = scala.io.Source.fromFile(mf).getLines()
      .filterNot(_.startsWith("S:"))
      .map(_.replaceAll("\\t#s=\\d+", "")).mkString("\n") + "\n"
    java.nio.file.Files.writeString(mf.toPath, stripped)
    new java.io.File(s"$base/v=1/._manifest.crc").delete()
    intercept[IllegalArgumentException] {
      Snapshots.widenColumn(spark, base, "id", LongType)
    }
    // one compact re-records schemas and unlocks the widen
    Snapshots.compact(spark, base, smallBytes = 1L << 30)
    Snapshots.widenColumn(spark, base, "id", LongType)
    assert(Snapshots.read(spark, base).schema("id").dataType == LongType)
  }
}
