package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Hidden partitioning via the bucket transform (round-15): writeBucketed /
 * appendBucketed / rewriteBucketed lay files out with Spark's own bucketBy,
 * scanPlan prunes equality/IN probes to the matching buckets' files, and
 * bucketedTable exposes the layout to Catalyst for shuffle-free joins.
 *
 * The load-bearing claims pinned here:
 *  - the manifest-side bucket id (pmod(murmur3(lit, 42), n)) agrees with
 *    where bucketBy actually PLACED each row, across column types — a
 *    disagreement would silently drop rows from pruned scans;
 *  - pruning is conservative: plain-append files (no bucket name), widen
 *    ops on the bucket column, and type-mismatched literals all degrade to
 *    must-scan, never mis-prune;
 *  - a join between two same-spec bucketedTable registrations plans with
 *    ZERO shuffle exchanges on the join path;
 *  - the guard matrix: bucketedTable refuses pending deletes / schema ops /
 *    multi-dir layouts / broken bucket names; appendBucketed refuses a
 *    mismatched spec.
 */
class BucketLayoutSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  spark.sparkContext.hadoopConfiguration
    .set("fs.cntfs.impl", classOf[CountingLocalFs].getName)

  private def freshBase(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("equality scan prunes to the probed buckets' files; rows agree with read().filter") {
    val base = freshBase("graft-bkt")
    val df = (1L to 2000L).map(i => (i, s"s${i % 7}", i * 2.0))
      .toDF("id", "grp", "x")
    Snapshots.writeBucketed(df, base, "id", 16, statsKey = Some("grp"))
    // one file per bucket, all bucket-named
    val (data, _) = Snapshots.splitEntries(
      Snapshots.manifestLines(spark, base, 1L))
    assert(data.size == 16, s"${data.size} files (expected one per bucket)")
    assert(data.forall(e => Snapshots.bucketIdOf(e.path).exists(_ < 16)))

    for (probe <- Seq(1L, 700L, 1999L)) {
      val (cand, pruned) = Snapshots.scanPlan(spark, base, col("id") === probe)
      assert(cand.size == 1 && pruned.size == 15,
        s"probe $probe: ${cand.size}/${pruned.size}")
      val got = Snapshots.scanWhere(spark, base, col("id") === probe).collect()
      assert(got.length == 1 && got(0).getLong(0) == probe,
        s"probe $probe lost its row - manifest bucket hash disagrees with bucketBy placement")
    }
    // IN-list: at most 3 buckets admitted, all rows found
    val in = col("id").isin(5L, 600L, 1500L)
    val (cand, _) = Snapshots.scanPlan(spark, base, in)
    assert(cand.size <= 3, s"${cand.size} candidates for a 3-value IN")
    assert(Snapshots.scanWhere(spark, base, in).count() == 3)
  }

  test("bucket hash parity across column types (string, int, date, timestamp)") {
    // every row must survive a point probe on its own key: a single
    // mis-hashed type would prune the file that actually holds the row
    val base = freshBase("graft-bkt-ty")
    val df = (1 to 300).map { i =>
      (s"key-$i", i, java.sql.Date.valueOf(s"2024-0${i % 9 + 1}-0${i % 27 / 3 + 1}"),
        java.sql.Timestamp.valueOf(s"2024-01-01 0${i % 9}:00:0${i % 9}"))
    }.toDF("sk", "ik", "dk", "tk")
    Snapshots.writeBucketed(df, base, "sk", 8)
    for (i <- Seq(1, 57, 300)) {
      val got = Snapshots.scanWhere(spark, base, col("sk") === s"key-$i").collect()
      assert(got.length == 1, s"string key key-$i lost")
      val (cand, _) = Snapshots.scanPlan(spark, base, col("sk") === s"key-$i")
      assert(cand.size == 1, s"string probe admitted ${cand.size}")
    }
    val bI = freshBase("graft-bkt-i")
    Snapshots.writeBucketed(df, bI, "ik", 8)
    assert(Snapshots.scanWhere(spark, bI, col("ik") === 57).count() == 1)
    assert(Snapshots.scanPlan(spark, bI, col("ik") === 57)._1.size == 1)
    val bD = freshBase("graft-bkt-d")
    Snapshots.writeBucketed(df, bD, "dk", 8)
    val someDate = df.select(col("dk")).head().getDate(0)
    val nD = df.filter(col("dk") === someDate).count()
    assert(Snapshots.scanWhere(spark, bD, col("dk") === someDate).count() == nD)
    assert(Snapshots.scanPlan(spark, bD, col("dk") === someDate)._1.size == 1)
    val bT = freshBase("graft-bkt-t")
    Snapshots.writeBucketed(df, bT, "tk", 8)
    val someTs = df.select(col("tk")).head().getTimestamp(0)
    val nT = df.filter(col("tk") === someTs).count()
    assert(Snapshots.scanWhere(spark, bT, col("tk") === someTs).count() == nT)
    assert(Snapshots.scanPlan(spark, bT, col("tk") === someTs)._1.size == 1)
  }

  test("scanWhere opens parquet ONLY for the admitted bucket (counting FS)") {
    val root = java.nio.file.Files.createTempDirectory("graft-bkt-cnt")
    val base = s"cntfs:$root/t"
    val df = (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "s")
    Snapshots.writeBucketed(df, base, "id", 10, statsKey = Some("id"))
    val (cand, _) = Snapshots.scanPlan(spark, base, col("id") === 404L)
    assert(cand.size == 1)
    CountingLocalFs.reset()
    val rows = Snapshots.scanWhere(spark, base, col("id") === 404L).collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 404L)
    val stray = CountingLocalFs.openedParquet
      .filterNot(p => cand.exists(e => p.endsWith(e.path)))
    assert(stray.isEmpty, s"opened beyond the admitted bucket: $stray")
  }

  test("plain append degrades that delta to must-scan; bucketed files still prune") {
    val base = freshBase("graft-bkt-mix")
    Snapshots.writeBucketed(
      (1L to 800L).map(i => (i, i * 1.0)).toDF("id", "x"), base, "id", 8)
    Snapshots.append(
      (10001L to 10020L).map(i => (i, i * 1.0)).toDF("id", "x"), base)
    val (cand, pruned) = Snapshots.scanPlan(spark, base, col("id") === 10007L)
    // the probed value hashes to ONE bucket; the plain-append files never
    // prune by bucket, so candidates = 1 bucket file + all plain files
    val plainFiles = cand.count(e => Snapshots.bucketIdOf(e.path).isEmpty)
    assert(plainFiles >= 1, "plain-append files must always scan")
    assert(pruned.size == 7, s"pruned ${pruned.size} (expected the 7 other buckets)")
    assert(Snapshots.scanWhere(spark, base, col("id") === 10007L).count() == 1)
    assert(Snapshots.scanWhere(spark, base, col("id") === 42L).count() == 1)
  }

  test("widen on the bucket column disables bucket pruning (no mis-prune)") {
    val base = freshBase("graft-bkt-wid")
    val df = (1 to 500).map(i => (i, s"r$i")).toDF("ik", "s")
    Snapshots.writeBucketed(df, base, "ik", 8)
    Snapshots.widenColumn(spark, base, "ik",
      org.apache.spark.sql.types.LongType)
    // probe is a LONG literal now; old files were placed by INT hashing —
    // the pruner must stand down entirely rather than probe wrong buckets
    val (cand, pruned) = Snapshots.scanPlan(spark, base, col("ik") === 57L)
    assert(pruned.isEmpty && cand.size == 8,
      s"widen pending but pruner ran: ${cand.size}/${pruned.size}")
    assert(Snapshots.scanWhere(spark, base, col("ik") === 57L).count() == 1)
  }

  test("rename of the bucket column translates: pruning works in the new name") {
    val base = freshBase("graft-bkt-ren")
    Snapshots.writeBucketed(
      (1L to 400L).map(i => (i, s"v$i")).toDF("id", "s"), base, "id", 8)
    Snapshots.renameColumn(spark, base, "id", "doc_id")
    val (cand, pruned) = Snapshots.scanPlan(spark, base, col("doc_id") === 123L)
    assert(cand.size == 1 && pruned.size == 7, s"${cand.size}/${pruned.size}")
    assert(Snapshots.scanWhere(spark, base, col("doc_id") === 123L).count() == 1)
  }

  test("bucketed join between same-spec tables plans with ZERO exchanges") {
    val baseL = freshBase("graft-bkt-jl")
    val baseR = freshBase("graft-bkt-jr")
    val left = (1L to 3000L).map(i => (i, s"g${i % 5}")).toDF("k", "grp")
    val right = (1L to 3000L).filter(_ % 3 == 0).map(i => (i, i * 10.0)).toDF("k", "v")
    Snapshots.writeBucketed(left, baseL, "k", 12)
    Snapshots.writeBucketed(right, baseR, "k", 12)
    val l = Snapshots.bucketedTable(spark, baseL, "bktspec_l")
    val r = Snapshots.bucketedTable(spark, baseR, "bktspec_r")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val joined = l.join(r, Seq("k")).groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      val rows = joined.collect()
      // correctness vs a plain join
      val expect = left.join(right, Seq("k")).groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .collect().map(r0 => (r0.getString(0), r0.getLong(1), r0.getDouble(2))).toSet
      assert(rows.map(r0 => (r0.getString(0), r0.getLong(1), r0.getDouble(2))).toSet == expect)
      // the storage-partitioned property: no shuffle anywhere below the
      // join (the scans report HashPartitioning(k, 12), so SortMergeJoin
      // needs no Exchange children). Inspect only the FINAL adaptive plan
      // (toString appends the initial plan, which would re-surface the
      // groupBy's own legitimate exchange). The join subtree is the text
      // from SortMergeJoin down — operators above it print before it.
      val plan = joined.queryExecution.executedPlan.toString
      val fin = plan.split("== Initial Plan ==")(0)
      val joinIdx = fin.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a sort-merge join:\n$fin")
      assert(!fin.substring(joinIdx).contains("Exchange"),
        s"shuffle below the join - bucketing not picked up:\n$fin")
      assert(fin.contains("SelectedBucketsCount") || fin.contains("Bucketed: true"),
        s"scan does not report bucketed reading:\n$fin")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("groupBy on the bucket key skips its shuffle") {
    val base = freshBase("graft-bkt-agg")
    Snapshots.writeBucketed(
      (1L to 2000L).map(i => (i % 40, i * 1.0)).toDF("k", "v"), base, "k", 8)
    val t = Snapshots.bucketedTable(spark, base, "bktspec_agg")
    val agg = t.groupBy(col("k")).agg(sum(col("v")).as("sv"))
    val n = agg.count()
    assert(n == 40)
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed groupBy still shuffles:\n$plan")
  }

  test("bucketedTable coexists with stats sidecars (directory is glob-filtered)") {
    val base = freshBase("graft-bkt-sc")
    Snapshots.writeBucketed(
      (1L to 500L).map(i => (i, s"s${i % 3}", i * 2.0)).toDF("id", "src", "x"),
      base, "id", 4, statsKey = Some("id"))
    Snapshots.writeStatsSidecars(spark, base, Seq("src"))
    val t = Snapshots.bucketedTable(spark, base, "bktspec_sc")
    assert(t.count() == 500, "sidecar files leaked into the table read")
  }

  test("guard matrix: deletes, schema ops, multi-dir, broken names, spec mismatch") {
    val base = freshBase("graft-bkt-g")
    Snapshots.writeBucketed(
      (1L to 300L).map(i => (i, s"v$i")).toDF("id", "s"), base, "id", 4)
    // appendBucketed under a different spec refuses
    val delta = Seq((301L, "v301")).toDF("id", "s")
    val eM = intercept[IllegalArgumentException] {
      Snapshots.appendBucketed(delta, base, "id", 8)
    }
    assert(eM.getMessage.contains("bucketed as"))
    // same-spec bucketed append lands, but now spans two dirs → refuses
    Snapshots.appendBucketed(delta, base, "id", 4)
    val eDir = intercept[IllegalArgumentException] {
      Snapshots.bucketedTable(spark, base, "bktspec_g1")
    }
    assert(eDir.getMessage.contains("directories"))
    // consolidate → eligible again
    Snapshots.rewriteBucketed(spark, base, "id", 4)
    assert(Snapshots.bucketedTable(spark, base, "bktspec_g2").count() == 301)
    // pending MoR delete refuses
    Snapshots.deleteWhereMoR(spark, base, col("id") === 5L)
    val eDel = intercept[IllegalArgumentException] {
      Snapshots.bucketedTable(spark, base, "bktspec_g3")
    }
    assert(eDel.getMessage.contains("merge-on-read"))
    Snapshots.materializeDeletes(spark, base)
    // pending rename refuses (catalog reads physical schemas only)
    Snapshots.renameColumn(spark, base, "s", "txt")
    val eOps = intercept[IllegalArgumentException] {
      Snapshots.bucketedTable(spark, base, "bktspec_g4")
    }
    assert(eOps.getMessage.contains("schema-evolution"))
    // a compacted table has no spec line and plain names → refuses loudly
    val b2 = freshBase("graft-bkt-g5")
    Snapshots.write((1L to 100L).map(i => (i, s"v$i")).toDF("id", "s"), b2)
    val eSpec = intercept[IllegalArgumentException] {
      Snapshots.bucketedTable(spark, b2, "bktspec_g5")
    }
    assert(eSpec.getMessage.contains("no bucket spec"))
  }

  test("time travel reads and metadata verbs are unaffected by the bucket layout") {
    val base = freshBase("graft-bkt-tt")
    val v1df = (1L to 600L).map(i => (i, i * 1.0)).toDF("id", "x")
    Snapshots.writeBucketed(v1df, base, "id", 6, statsKey = Some("id"))
    Snapshots.appendBucketed(
      Seq((601L, 601.0)).toDF("id", "x"), base, "id", 6, statsKey = Some("id"))
    assert(Snapshots.read(spark, base, Some(1L)).count() == 600)
    assert(Snapshots.read(spark, base).count() == 601)
    assert(Snapshots.metaCount(spark, base).contains(601L))
    // bucket pruning composes with bounds pruning on the same key: the
    // probe admits the intersection (bounds prove v=601 sits only in the
    // delta file; bucket id proves one bucket) — here exactly one file
    val (cand, _) = Snapshots.scanPlan(spark, base, col("id") === 601L)
    assert(cand.size == 1, s"${cand.size}")
  }
}
