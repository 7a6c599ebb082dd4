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
}
