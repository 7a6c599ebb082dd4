package graft.store

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * MERGE `WHEN NOT MATCHED BY SOURCE` (Delta's third clause family; the
 * reference's conversation-store upserts never retire rows, so this is the
 * scale-path extension for full-snapshot feed reconciliation). Pins the
 * clause semantics (not-matched scope, delete-before-update precedence,
 * SQL null handling, simultaneous OLD-row assignments), the file-granular
 * CoW contract (untouched files inherited by reference, clause-bounds
 * pruning of the discovery scan), and the guard matrix.
 */
class MergeNmbsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  private def table(base: String, n: Int = 90, parts: Int = 3): Unit =
    Snapshots.write(
      (1L to n.toLong).map(i => (i, s"s$i", i * 10.0)).toDF("id", "name", "score")
        .repartitionByRange(parts, col("id")),
      base, statsKey = Some("id"))

  private def recordsReadDuring(body: => Unit): Long = {
    val recs = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) recs.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      var prev = -1L; var n = 0
      while (n < 100 && prev != recs.get()) { prev = recs.get(); Thread.sleep(20); n += 1 }
    } finally spark.sparkContext.removeSparkListener(l)
    recs.get()
  }

  test("three-way merge: upsert + insert + NMBS delete + NMBS update in one commit") {
    val base = fresh("nmbs1")
    table(base)
    // source carries 10,20,30 (updates) and 1000 (insert)
    val src = Seq((10L, "u10", 1.0), (20L, "u20", 2.0), (30L, "u30", 3.0),
      (1000L, "new", 9.0)).toDF("id", "name", "score")
    Snapshots.mergeInto(spark, base, src, "id",
      notMatchedBySourceDelete = Some(col("id") > 80L),
      notMatchedBySourceUpdate = Some((col("id") <= 5L,
        Map("score" -> (col("score") + 100.0)))))
    val got = Snapshots.read(spark, base).as[(Long, String, Double)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // matched rows replaced by source
    assert(got(10L) == (("u10", 1.0)) && got(30L) == (("u30", 3.0)))
    // unmatched source row inserted
    assert(got(1000L) == (("new", 9.0)))
    // NMBS delete: ids 81..90 retired (none matched by source)
    assert((81L to 90L).forall(!got.contains(_)))
    // NMBS update: ids 1..5 get +100 score, name untouched
    assert((1L to 5L).forall(i => got(i) == ((s"s$i", i * 10.0 + 100.0))))
    // everything else carried verbatim
    assert(got(50L) == (("s50", 500.0)))
    assert(got.size == 90 - 10 + 1)
  }

  test("clause scope: a MATCHED row is never touched by an NMBS clause") {
    val base = fresh("nmbs2")
    table(base, n = 20)
    // source matches id=90-overlapping delete range? use id=19,20 matched;
    // delete clause covers id > 18 — but 19,20 are matched, so they upsert
    val src = Seq((19L, "u19", 1.0), (20L, "u20", 2.0)).toDF("id", "name", "score")
    Snapshots.mergeInto(spark, base, src, "id",
      notMatchedBySourceDelete = Some(col("id") > 18L))
    val got = Snapshots.read(spark, base).as[(Long, String, Double)]
      .collect().map(t => t._1 -> t._2).toMap
    assert(got(19L) == "u19" && got(20L) == "u20")
    assert(got.size == 20)
  }

  test("DELETE evaluates before UPDATE: a row satisfying both is deleted") {
    val base = fresh("nmbs3")
    table(base, n = 10)
    val src = Seq((1L, "u1", 0.0)).toDF("id", "name", "score")
    Snapshots.mergeInto(spark, base, src, "id",
      notMatchedBySourceDelete = Some(col("id") === 7L),
      notMatchedBySourceUpdate = Some((col("id") >= 6L,
        Map("name" -> lit("flagged")))))
    val got = Snapshots.read(spark, base).as[(Long, String, Double)]
      .collect().map(t => t._1 -> t._2).toMap
    assert(!got.contains(7L), "row satisfying both clauses must be deleted")
    assert(got(6L) == "flagged" && got(8L) == "flagged")
    assert(got(5L) == "s5")
  }

  test("SQL null semantics: NULL clause condition leaves the row unchanged") {
    val base = fresh("nmbs4")
    Snapshots.write(Seq((1L, Some(5.0)), (2L, None), (3L, Some(50.0)))
      .toDF("id", "v"), base)
    val src = Seq((99L, Some(1.0))).toDF("id", "v")
    // v > 10 is NULL for id=2 → kept (a bare WHERE would also drop it, but
    // DML null semantics keep it — same contract as deleteWhere)
    Snapshots.mergeInto(spark, base, src, "id",
      notMatchedBySourceDelete = Some(col("v") > 10.0))
    val ids = Snapshots.read(spark, base).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 99L))
  }

  test("UPDATE assignments are simultaneous against the OLD row (swap)") {
    val base = fresh("nmbs5")
    Snapshots.write(Seq((1L, 10.0, 20.0)).toDF("id", "a", "b"), base)
    val src = Seq((99L, 0.0, 0.0)).toDF("id", "a", "b")
    Snapshots.mergeInto(spark, base, src, "id",
      notMatchedBySourceUpdate = Some((lit(true),
        Map("a" -> col("b"), "b" -> col("a")))))
    val r = Snapshots.read(spark, base).filter(col("id") === 1L)
      .as[(Long, Double, Double)].head()
    assert(r == ((1L, 20.0, 10.0)))
  }

  test("file granularity: untouched files inherited by reference; clause bounds prune discovery") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.cntfs.impl", classOf[CountingLocalFs].getName)
    val root = java.nio.file.Files.createTempDirectory("graft-nmbs6")
    val base = s"cntfs:$root/t"
    // 3 range files: ~[1..30], ~[31..60], ~[61..90]
    Snapshots.write(
      (1L to 90L).map(i => (i, s"s$i", i * 10.0)).toDF("id", "name", "score")
        .repartitionByRange(3, col("id")),
      base, statsKey = Some("id"))
    val entries = Snapshots.scanPlan(spark, base, col("id") >= 1L)._1
    // provably clean = disjoint from the source key {5}, the update range
    // id<=3, and the delete range id>85
    val mid = entries.filter(_.stats.exists { case (_, _, mn, mx) =>
      mn.toLong > 5L && mx.toLong <= 85L })
    assert(mid.nonEmpty, "fixture needs a provably-clean middle file")
    val pre = Snapshots.manifestFiles(spark, base, 1L).toSet
    val src = Seq((5L, "u5", 1.0)).toDF("id", "name", "score")
    // delete clause only touches the high file; update clause only the low
    CountingLocalFs.reset()
    Snapshots.mergeInto(spark, base, src, "id",
      notMatchedBySourceDelete = Some(col("id") > 85L),
      notMatchedBySourceUpdate = Some((col("id") <= 3L,
        Map("score" -> lit(0.0)))))
    // the provably-clean middle file is never OPENED (not even its footer):
    // clause bounds + source key range prune it from every discovery pass
    val strays = CountingLocalFs.openedParquet
      .filter(p => mid.exists(e => p.endsWith(e.path)))
    assert(strays.isEmpty,
      s"merge opened the provably-clean middle file: ${strays.mkString(", ")}")
    val post = Snapshots.manifestFiles(spark, base,
      Snapshots.versions(spark, base).last).toSet
    // the middle file is inherited verbatim; low and high are rewritten
    assert(mid.forall(e => post.contains(e.path)), "mid-range file must be inherited")
    assert((pre -- post).nonEmpty, "low and high files must be rewritten")
    val got = Snapshots.read(spark, base).as[(Long, String, Double)]
      .collect().map(t => t._1 -> t._3).toMap
    assert(got.size == 85 && got(1L) == 0.0 && got(5L) == 1.0 && got(50L) == 500.0)
  }

  test("guards: unknown assignment column refuses; pending MoR deletes refuse") {
    val base = fresh("nmbs7")
    table(base, n = 10)
    val src = Seq((1L, "u", 0.0)).toDF("id", "name", "score")
    val e = intercept[IllegalArgumentException] {
      Snapshots.mergeInto(spark, base, src, "id",
        notMatchedBySourceUpdate = Some((lit(true), Map("nope" -> lit(1)))))
    }
    assert(e.getMessage.contains("unknown columns"))
    Snapshots.deleteWhereMoR(spark, base, col("id") === 2L)
    val e2 = intercept[IllegalArgumentException] {
      Snapshots.mergeInto(spark, base, src, "id",
        notMatchedBySourceDelete = Some(col("id") > 5L))
    }
    assert(e2.getMessage.contains("materializeDeletes"))
  }

  test("no NMBS clause: behavior is byte-identical to the plain merge path") {
    val base = fresh("nmbs8")
    table(base, n = 30)
    val src = Seq((3L, "u3", 0.0)).toDF("id", "name", "score")
    Snapshots.mergeInto(spark, base, src, "id")
    val got = Snapshots.read(spark, base).count()
    assert(got == 30)
  }
}
