package graft.store

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Snapshot-on-write, time travel, and expiry over the versioned layout. */
class SnapshotsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("write → time travel → expire round trip") {
    val base = java.nio.file.Files.createTempDirectory("graft-snap").toString + "/t"

    val v1 = Snapshots.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), base)
    val v2 = Snapshots.write(Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "s"), base)
    assert(v1 == 1L && v2 == 2L)
    assert(Snapshots.versions(spark, base) == Seq(1L, 2L))

    // latest sees the update+insert; VERSION AS OF 1 sees the original
    val latest = Snapshots.read(spark, base).as[(Long, String)].collect().toSet
    assert(latest == Set((1L, "a"), (2L, "B"), (3L, "c")))
    val asOf1 = Snapshots.read(spark, base, Some(1L)).as[(Long, String)].collect().toSet
    assert(asOf1 == Set((1L, "a"), (2L, "b")))

    // a third version, then expire to the newest 2
    Snapshots.write(Seq((9L, "z")).toDF("id", "s"), base)
    val dropped = Snapshots.expire(spark, base, keep = 2)
    assert(dropped == Seq(1L))
    assert(Snapshots.versions(spark, base) == Seq(2L, 3L))
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, base, Some(1L))
    }
  }

  test("mergeInto upserts by key into a new snapshot; diff classifies the CDC") {
    val base = java.nio.file.Files.createTempDirectory("graft-snap-merge").toString + "/t"
    Snapshots.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"), base)
    val v2 = Snapshots.mergeInto(spark, base,
      Seq((2L, "B2"), (4L, "d")).toDF("id", "s"), key = "id")
    assert(v2 == 2L)
    val merged = Snapshots.read(spark, base).as[(Long, String)].collect().toSet
    assert(merged == Set((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))

    val cdc = Snapshots.diff(spark, base, 1L, 2L, "id")
      .as[(Long, String)].collect().toMap
    assert(cdc == Map(2L -> "update", 4L -> "insert"))

    // a delete shows up when a version drops a key
    Snapshots.write(Snapshots.read(spark, base).filter(col("id") =!= 1L), base)
    val cdc2 = Snapshots.diff(spark, base, 2L, 3L, "id")
      .as[(Long, String)].collect().toMap
    assert(cdc2 == Map(1L -> "delete"))
  }

  test("reading an empty base fails loudly, never returns an empty frame") {
    val base = java.nio.file.Files.createTempDirectory("graft-snap-empty").toString + "/t"
    intercept[IllegalArgumentException] { Snapshots.read(spark, base) }
  }

  test("a version directory without _SUCCESS is invisible and its slot is reclaimed") {
    val base = java.nio.file.Files.createTempDirectory("graft-snap-crash").toString + "/t"
    Snapshots.write(Seq((1L, "a")).toDF("id", "s"), base)
    // simulate a crashed in-flight write: a v=2 directory with data but no marker
    val crashed = new java.io.File(s"$base/v=2")
    crashed.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/v=2/part-00000.parquet"), Array[Byte](1, 2, 3))
    assert(Snapshots.versions(spark, base) == Seq(1L), "partial snapshot must not be listed")
    assert(Snapshots.read(spark, base).as[(Long, String)].collect().toSet == Set((1L, "a")))
    // the retry reclaims v=2 rather than skipping to v=3 or failing
    val v = Snapshots.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), base)
    assert(v == 2L)
    assert(Snapshots.read(spark, base).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("diff sees a column added in the newer version (union-schema hash)") {
    val base = java.nio.file.Files.createTempDirectory("graft-snap-evolve").toString + "/t"
    Snapshots.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), base)
    // v2 adds a column; row 2 differs ONLY in the new column
    Snapshots.write(
      Seq((1L, "a", null.asInstanceOf[String]), (2L, "b", "extra"))
        .toDF("id", "s", "note"), base)
    val cdc = Snapshots.diff(spark, base, 1L, 2L, "id")
      .as[(Long, String)].collect().toMap
    assert(cdc == Map(2L -> "update"),
      "row changed only in the added column must classify as update; null-filled row must not")
  }
}
