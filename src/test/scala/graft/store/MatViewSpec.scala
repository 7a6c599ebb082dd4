package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Incrementally-maintained aggregate views: O(delta) refresh parity with
  * full recompute, anchor atomicity, and the rewrite-chain CDC fallback. */
class MatViewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

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

  private def fullRecompute(base: String) =
    Snapshots.read(spark, base).groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).cast("decimal(28,2)").as("total"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("grp", "n", "total").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet

  test("create → append → refresh equals full recompute, bit-exact decimals") {
    val root = java.nio.file.Files.createTempDirectory("graft-mv").toString
    val (base, mv) = (root + "/t", root + "/mv")
    val df = (1L to 300L).map(i => (i, s"g${i % 5}", i * 1.01)).toDF("id", "grp", "v")
    Snapshots.write(df.filter(col("id") <= 100), base)
    MatView.create(spark, base, mv, Seq("grp"), "v")
    assert(MatView.anchor(spark, mv) == 1L)

    Snapshots.append(df.filter(col("id") > 100 && col("id") <= 200), base)
    Snapshots.append(df.filter(col("id") > 200), base)
    MatView.refresh(spark, base, mv, Seq("grp"), "v")
    assert(MatView.anchor(spark, mv) == 3L)
    assert(rows(MatView.read(spark, mv)) == rows(fullRecompute(base)))
  }

  test("refresh is O(delta): a small append reads delta + view, not the table") {
    val root = java.nio.file.Files.createTempDirectory("graft-mv-od").toString
    val (base, mv) = (root + "/t", root + "/mv")
    val big = (1L to 50000L).map(i => (i, s"g${i % 4}", 1.0)).toDF("id", "grp", "v")
    Snapshots.write(big, base)
    MatView.create(spark, base, mv, Seq("grp"), "v")
    Snapshots.append(Seq((50001L, "g0", 2.0)).toDF("id", "grp", "v"), base)
    val read = recordsReadDuring {
      MatView.refresh(spark, base, mv, Seq("grp"), "v")
    }
    // 1 delta row + 4 view rows + manifest/bookkeeping — nowhere near 50k
    assert(read < 1000L, s"refresh read $read records - not O(delta)")
    assert(rows(MatView.read(spark, mv)) == rows(fullRecompute(base)))
  }

  test("no-op refresh commits nothing; replay after conflict is exactly-once") {
    val root = java.nio.file.Files.createTempDirectory("graft-mv-noop").toString
    val (base, mv) = (root + "/t", root + "/mv")
    Snapshots.write(Seq((1L, "a", 5.0)).toDF("id", "grp", "v"), base)
    MatView.create(spark, base, mv, Seq("grp"), "v")
    val v1 = MatView.refresh(spark, base, mv, Seq("grp"), "v")
    val v2 = MatView.refresh(spark, base, mv, Seq("grp"), "v")
    assert(v1 == 1L && v2 == 1L, "head==anchor must not commit a view version")
    // a re-run AFTER a successful refresh (the conflict-retry story) sees
    // the advanced anchor and no-ops rather than double-applying
    Snapshots.append(Seq((2L, "a", 7.0)).toDF("id", "grp", "v"), base)
    MatView.refresh(spark, base, mv, Seq("grp"), "v")
    val before = rows(MatView.read(spark, mv))
    MatView.refresh(spark, base, mv, Seq("grp"), "v")
    assert(rows(MatView.read(spark, mv)) == before, "replay must be exactly-once")
  }

  test("rewrite since anchor: CDC fallback subtracts; no cdcKey fails loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft-mv-cdc").toString
    val (base, mv) = (root + "/t", root + "/mv")
    val df = (1L to 120L).map(i => (i, s"g${i % 3}", i * 0.5)).toDF("id", "grp", "v")
    Snapshots.write(df, base)
    MatView.create(spark, base, mv, Seq("grp"), "v")
    // CoW delete rewrites files → the chain is no longer pure appends
    Snapshots.deleteWhere(spark, base, col("id") % 4 === 0)
    val e = intercept[IllegalStateException] {
      MatView.refresh(spark, base, mv, Seq("grp"), "v")
    }
    assert(e.getMessage.contains("not a pure append chain"))
    MatView.refresh(spark, base, mv, Seq("grp"), "v", cdcKey = Some("id"))
    assert(rows(MatView.read(spark, mv)) == rows(fullRecompute(base)))
    // a group deleted to zero drops out entirely
    Snapshots.deleteWhere(spark, base, col("grp") === "g1")
    MatView.refresh(spark, base, mv, Seq("grp"), "v", cdcKey = Some("id"))
    assert(rows(MatView.read(spark, mv)) == rows(fullRecompute(base)))
    assert(!MatView.read(spark, mv).select("grp").as[String]
      .collect().contains("g1"))
  }

  test("distinct view: sketch merge tracks exact distincts; rewrites refuse") {
    val root = java.nio.file.Files.createTempDirectory("graft-mv-hll").toString
    val (base, mv) = (root + "/t", root + "/mv")
    def batch(r: Range) = r.map(i => (i.toLong, s"g${i % 2}", (i % 500).toLong))
      .toDF("id", "grp", "user")
    Snapshots.write(batch(1 to 2000), base)
    MatView.createDistinctView(spark, base, mv, Seq("grp"), "user", lgK = 14)
    // append overlaps old users (no distinct growth) AND adds new ones
    Snapshots.append(batch(1500 to 4000), base)
    MatView.refreshDistinctView(spark, base, mv, Seq("grp"), "user", lgK = 14)
    val est = MatView.readDistinctView(spark, mv)
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val exact = Snapshots.read(spark, base).groupBy("grp")
      .agg(countDistinct(col("user")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n) <= n * 0.05, s"$g: est ${est(g)} vs exact $n")
    }
    // replay: head == anchor → no new view version
    val v = Snapshots.versions(spark, mv).last
    MatView.refreshDistinctView(spark, base, mv, Seq("grp"), "user", lgK = 14)
    assert(Snapshots.versions(spark, mv).last == v)
    // a rewrite breaks merge-only maintenance loudly
    Snapshots.deleteWhere(spark, base, col("id") === 10L)
    val e = intercept[IllegalStateException] {
      MatView.refreshDistinctView(spark, base, mv, Seq("grp"), "user", lgK = 14)
    }
    assert(e.getMessage.contains("cannot subtract"))
  }

  test("streaming maintenance: redelivery, skipped refresh, and backlog all converge") {
    val root = java.nio.file.Files.createTempDirectory("graft-mv-str").toString
    val (base, mv) = (root + "/t", root + "/mv")
    def b(ids: Range) = ids.map(i => (i.toLong, s"g${i % 3}", 1.0)).toDF("id", "grp", "v")
    Snapshots.write(b(1 to 10), base)
    MatView.create(spark, base, mv, Seq("grp"), "v")

    // batch 0 lands normally
    MatView.ingestAndRefresh(b(11 to 20), 0L, base, mv, Seq("grp"), "v", "app")
    assert(rows(MatView.read(spark, mv)) == rows(fullRecompute(base)))
    // batch 0 is REDELIVERED (at-least-once source): both tables no-op
    val srcV = Snapshots.versions(spark, base).last
    val mvV = Snapshots.versions(spark, mv).last
    MatView.ingestAndRefresh(b(11 to 20), 0L, base, mv, Seq("grp"), "v", "app")
    assert(Snapshots.versions(spark, base).last == srcV &&
      Snapshots.versions(spark, mv).last == mvV,
      "a redelivered batch must commit nothing on either table")
    // batch 1 appends but CRASHES before its refresh (simulated by a raw
    // appendStream); batch 2 then folds the two-version backlog at once
    Snapshots.appendStream(b(21 to 30), base, "app", 1L)
    MatView.ingestAndRefresh(b(31 to 40), 2L, base, mv, Seq("grp"), "v", "app")
    assert(rows(MatView.read(spark, mv)) == rows(fullRecompute(base)))
    assert(MatView.read(spark, mv).agg(sum(col("n"))).head.getLong(0) == 40L)
  }

  test("anchor auto-pin: aggressive source expiry between refreshes cannot break refresh") {
    val root = java.nio.file.Files.createTempDirectory("graft-mv-pin").toString
    val (base, mv) = (root + "/t", root + "/mv")
    def b(ids: Range) = ids.map(i => (i.toLong, s"g${i % 3}", 1.0)).toDF("id", "grp", "v")
    Snapshots.write(b(1 to 10), base)
    MatView.create(spark, base, mv, Seq("grp"), "v") // pins source v1
    assert(Snapshots.tags(spark, base).values.toSet.contains(1L),
      "create must pin its anchor on the source")
    Snapshots.append(b(11 to 20), base)
    Snapshots.append(b(21 to 30), base)
    // keep=1 would normally drop v1 and v2 — the pin must keep v1 alive,
    // or the next refresh's appendedSince(v1) has no chain to diff
    Snapshots.expire(spark, base, keep = 1)
    assert(Snapshots.versions(spark, base).contains(1L),
      "the pinned anchor version must survive expiry")
    MatView.refresh(spark, base, mv, Seq("grp"), "v")
    assert(rows(MatView.read(spark, mv)) == rows(fullRecompute(base)))
    // the pin moved to the new anchor: expiry can now collect v1
    Snapshots.expire(spark, base, keep = 1)
    assert(!Snapshots.versions(spark, base).contains(1L),
      "re-pointing the pin must release the old anchor")
    // retiring the view releases the pin entirely
    assert(MatView.unpin(spark, base, mv))
    assert(Snapshots.tags(spark, base).isEmpty)
  }

  test("empty view keeps its anchor: retire-all CDC refresh, then repopulate") {
    val root = java.nio.file.Files.createTempDirectory("graft-mv-empty").toString
    val (base, mv) = (root + "/t", root + "/mv")
    def b(ids: Range) = ids.map(i => (i.toLong, s"g${i % 3}", 1.0)).toDF("id", "grp", "v")
    Snapshots.write(b(1 to 10), base)
    MatView.create(spark, base, mv, Seq("grp"), "v")
    // CoW-delete EVERY row → the CDC refresh retires every group
    Snapshots.deleteWhere(spark, base, lit(true))
    MatView.refresh(spark, base, mv, Seq("grp"), "v", cdcKey = Some("id"))
    assert(MatView.read(spark, mv).isEmpty, "all groups retired")
    // the anchor must survive the zero-row view (marker row / pin) …
    assert(MatView.anchor(spark, mv) == Snapshots.versions(spark, base).last)
    // … so the next refresh repopulates instead of throwing
    Snapshots.append(b(41 to 50), base)
    MatView.refresh(spark, base, mv, Seq("grp"), "v", cdcKey = Some("id"))
    assert(rows(MatView.read(spark, mv)) == rows(fullRecompute(base)))
    assert(MatView.read(spark, mv).agg(sum(col("n"))).head.getLong(0) == 10L)
  }

  test("distinct view keeps a REAL group whose distinct values are all NULL (round-15)") {
    val root = java.nio.file.Files.createTempDirectory("graft-mv-nullg").toString
    val (base, mv) = (root + "/t", root + "/mv")
    // group gX: every distinct-column value NULL → null sketch, but the
    // group is REAL and a GROUP BY oracle shows it with 0 distincts
    val rows0 = Seq(("gA", Option("u1")), ("gA", Option("u2")),
      ("gX", None: Option[String]), ("gX", None: Option[String]))
    Snapshots.write(rows0.toDF("grp", "user"), base)
    MatView.createDistinctView(spark, base, mv, Seq("grp"), "user")
    val got = MatView.readDistinctView(spark, mv)
      .orderBy(col("grp"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("gA", 2L), ("gX", 0L)),
      s"all-NULL group must report 0, not vanish: $got")
    // the group survives a refresh (union keeps null-sketch rows) and
    // starts counting once real values arrive
    Snapshots.append(Seq(("gX", Option("u9")), ("gY", None: Option[String]))
      .toDF("grp", "user"), base)
    MatView.refreshDistinctView(spark, base, mv, Seq("grp"), "user")
    val got2 = MatView.readDistinctView(spark, mv)
      .orderBy(col("grp"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got2 == Seq(("gA", 2L), ("gX", 1L), ("gY", 0L)), got2.toString)
  }

  test("anchor pins are created BEFORE the view commit and stale pins are collected (round-15)") {
    val root = java.nio.file.Files.createTempDirectory("graft-mv-prepin").toString
    val (base, mv) = (root + "/t", root + "/mv")
    def b(ids: Range) = ids.map(i => (i.toLong, s"g${i % 3}", 1.0)).toDF("id", "grp", "v")
    Snapshots.write(b(1 to 10), base)
    MatView.create(spark, base, mv, Seq("grp"), "v")
    val pre = MatView.pinPrefix(mv)
    // exactly one pin, named for its anchor — some pin covers every version
    // a committed view references, with no drop-then-create window
    assert(Snapshots.tags(spark, base).toSeq == Seq((s"$pre-v1", 1L)))
    // a legacy single-name pin (pre-round-15 layout) and a crash-orphaned
    // pre-pin are both collected by the next refresh
    Snapshots.tag(spark, base, pre, 1L)
    Snapshots.append(b(11 to 20), base)
    Snapshots.tag(spark, base, s"$pre-v2", 2L) // orphaned pre-pin shape
    Snapshots.append(b(21 to 30), base)
    MatView.refresh(spark, base, mv, Seq("grp"), "v")
    assert(Snapshots.tags(spark, base).toSeq == Seq((s"$pre-v3", 3L)),
      s"stale pins must be collected: ${Snapshots.tags(spark, base)}")
    assert(MatView.unpin(spark, base, mv))
    assert(Snapshots.tags(spark, base).isEmpty)
  }
}
