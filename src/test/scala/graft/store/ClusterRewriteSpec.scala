package graft.store

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * [[Snapshots.rewriteSorted]] — the OPTIMIZE/cluster maintenance verb.
 * Pins content invariance, the pruning flip (arrival-order layout admits
 * everything; clustered layout prunes to boundary files, counting-FS
 * proof), the z-order variant clustering BOTH dimensions, target file
 * sizing, metadata lineage (constraints kept, bucket spec dropped,
 * ADD-COLUMN defaults physicalized), and the rewrite guard matrix.
 */
class ClusterRewriteSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("content invariant; range scan flips from scan-all to boundary files") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.cntfs.impl", classOf[CountingLocalFs].getName)
    val root = java.nio.file.Files.createTempDirectory("graft-clus1")
    val base = s"cntfs:$root/t"
    // arrival order: every file spans the whole keyspace
    Snapshots.write(
      (1L to 1200L).map(i => (i, s"v$i", i * 1.0)).toDF("id", "s", "x")
        .repartition(4),
      base, statsKey = Some("id"))
    val before = Snapshots.read(spark, base).as[(Long, String, Double)]
      .collect().toSet
    val (c1, p1) = Snapshots.scanPlan(spark, base, col("id") <= 50L)
    assert(p1.isEmpty && c1.size == 4, "arrival order must admit every file")
    Snapshots.rewriteSorted(spark, base, Seq("id"), targetBytes = 8L * 1024)
    val (c2, p2) = Snapshots.scanPlan(spark, base, col("id") <= 50L)
    assert(p2.nonEmpty && c2.size < c1.size,
      s"clustered layout must prune: ${c2.size} cand / ${p2.size} pruned")
    // counting-FS: the scan opens ONLY admitted files
    CountingLocalFs.reset()
    val n = Snapshots.scanWhere(spark, base, col("id") <= 50L).count()
    assert(n == 50L)
    val stray = CountingLocalFs.openedParquet
      .filterNot(pth => c2.exists(e => pth.endsWith(e.path)))
    assert(stray.isEmpty, s"scan opened pruned files: ${stray.mkString(", ")}")
    val after = Snapshots.read(spark, base).as[(Long, String, Double)]
      .collect().toSet
    assert(after == before, "cluster rewrite must not change content")
  }

  test("z-order clusters BOTH dimensions: each column's scan prunes files") {
    val base = java.nio.file.Files.createTempDirectory("graft-clus2").toString + "/t"
    // two independent uniform dimensions
    val rows = (0L until 4096L).map { i =>
      val a = (i * 2654435761L) % 1024L  // Knuth-hash scatter
      val b = (i * 40503L) % 1024L
      (i, a, b)
    }
    Snapshots.write(rows.toDF("id", "a", "b").repartition(4), base,
      statsKey = Some("a"))
    Snapshots.rewriteSorted(spark, base, Seq("a", "b"),
      targetBytes = 8L * 1024, zorder = true)
    Snapshots.writeStatsSidecars(spark, base, Seq("a", "b"))
    val (ca, pa) = Snapshots.scanPlan(spark, base, col("a") < 64L)
    val (cb, pb) = Snapshots.scanPlan(spark, base, col("b") < 64L)
    assert(pa.nonEmpty, "z-order must prune on the first dimension")
    assert(pb.nonEmpty, "z-order must prune on the second dimension")
    // correctness: counts match a full-scan filter
    assert(Snapshots.countWhere(spark, base, col("a") < 64L) ==
      rows.count(_._2 < 64L))
    assert(Snapshots.countWhere(spark, base, col("b") < 64L) ==
      rows.count(_._3 < 64L))
    assert(ca.nonEmpty && cb.nonEmpty)
  }

  test("z-order over THREE columns: every dimension's scan prunes files") {
    val base = java.nio.file.Files.createTempDirectory("graft-clus2b").toString + "/t"
    val rows = (0L until 4096L).map { i =>
      (i, (i * 2654435761L) % 512L, (i * 40503L) % 512L, (i * 69069L) % 512L)
    }
    Snapshots.write(rows.toDF("id", "a", "b", "c").repartition(4), base,
      statsKey = Some("a"))
    Snapshots.rewriteSorted(spark, base, Seq("a", "b", "c"),
      targetBytes = 4L * 1024, zorder = true, zBits = 9)
    Snapshots.writeStatsSidecars(spark, base, Seq("a", "b", "c"))
    for (dim <- Seq("a", "b", "c")) {
      val (_, pruned) = Snapshots.scanPlan(spark, base, col(dim) < 32L)
      assert(pruned.nonEmpty, s"3-dim z-order must prune on $dim")
      assert(Snapshots.countWhere(spark, base, col(dim) < 32L) ==
        rows.count(r => Seq(r._2, r._3, r._4)(Seq("a", "b", "c").indexOf(dim)) < 32L))
    }
    // guard: too many interleave bits refuses
    intercept[IllegalArgumentException] {
      Snapshots.rewriteSorted(spark, base, Seq("a", "b", "c"),
        zorder = true, zBits = 22)
    }
  }

  test("metadata lineage: constraints ride along, bucket spec is dropped, ADD default physicalizes") {
    val base = java.nio.file.Files.createTempDirectory("graft-clus3").toString + "/t"
    Snapshots.writeBucketed(
      (1L to 200L).map(i => (i, i * 1.0)).toDF("id", "x"), base, "id", 4)
    Snapshots.addConstraint(spark, base, "pos_x", "x >= 0")
    Snapshots.addColumn(spark, base, "tag",
      org.apache.spark.sql.types.StringType, default = Some("'fresh'"))
    Snapshots.rewriteSorted(spark, base, Seq("id"), targetBytes = 4L * 1024)
    val v = Snapshots.versions(spark, base).last
    val lines = Snapshots.manifestLines(spark, base, v)
    assert(lines.exists(_.startsWith("C:")), "constraint must survive")
    assert(!lines.exists(_.startsWith("B:")), "bucket spec must be dropped")
    // default physicalized: every row carries it, and a violating append
    // still refuses (constraint is live)
    val tags = Snapshots.read(spark, base).select("tag").distinct()
      .as[String].collect().toSeq
    assert(tags == Seq("fresh"))
    intercept[Snapshots.ConstraintViolationException] {
      Snapshots.append(Seq((999L, -5.0, "t")).toDF("id", "x", "tag"), base)
    }
    assert(Snapshots.read(spark, base).count() == 200L)
  }

  test("target sizing: smaller targetBytes yields more, range-disjoint files") {
    val base = java.nio.file.Files.createTempDirectory("graft-clus4").toString + "/t"
    Snapshots.write((1L to 2000L).map(i => (i, s"pad-$i-${"x" * 20}"))
      .toDF("id", "s").repartition(2), base, statsKey = Some("id"))
    Snapshots.rewriteSorted(spark, base, Seq("id"), targetBytes = 6L * 1024)
    val files = Snapshots.scanPlan(spark, base, col("id") >= 1L)._1
    assert(files.size >= 3, s"expected several output files, got ${files.size}")
    // clustered: per-file [min,max] are pairwise disjoint
    val ranges = files.flatMap(_.stats.map { case (_, _, mn, mx) =>
      (mn.toLong, mx.toLong) }).sortBy(_._1)
    assert(ranges.sliding(2).forall {
      case Seq((_, mx1), (mn2, _)) => mx1 < mn2
      case _ => true
    }, s"ranges must be disjoint: $ranges")
  }

  test("clusteringDepth: arrival order reads ~file-count, clustered reads ~1, unmeasurable reads None") {
    val base = java.nio.file.Files.createTempDirectory("graft-clus6").toString + "/t"
    Snapshots.write((1L to 1000L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(4), base, statsKey = Some("id"))
    val d0 = Snapshots.clusteringDepth(spark, base, "id").get
    assert(d0 > 3.0, s"round-robin files all span the range: depth $d0")
    // statless column → None (no stats key, no sidecar — don't guess)
    assert(Snapshots.clusteringDepth(spark, base, "s").isEmpty)
    Snapshots.rewriteSorted(spark, base, Seq("id"), targetBytes = 4L * 1024)
    val d1 = Snapshots.clusteringDepth(spark, base, "id").get
    assert(d1 <= 1.2, s"disjoint ranges must read ~1: depth $d1")
    // pending MoR delete → None (bounds may overstate live rows)
    Snapshots.deleteWhereMoR(spark, base, col("id") === 5L)
    assert(Snapshots.clusteringDepth(spark, base, "id").isEmpty)
  }

  test("maintain(clusterBy): fires when degraded, quiet when healthy, never on unmeasurable") {
    val base = java.nio.file.Files.createTempDirectory("graft-clus7").toString + "/t"
    Snapshots.write((1L to 1000L).map(i => (i, s"v$i", i * 1.0))
      .toDF("id", "s", "x").repartition(4), base, statsKey = Some("id"))
    val r1 = Snapshots.maintain(spark, base, targetBytes = 4L * 1024,
      clusterBy = Some(Seq("id")), maxClusterDepth = 2.0)
    assert(r1.clusteredToVersion.isDefined, "degraded layout must trigger")
    assert(r1.compactedToVersion.isEmpty, "cluster rewrite subsumes bin-packing")
    val r2 = Snapshots.maintain(spark, base,
      smallBytes = 1L, // don't let compaction rewrite the layout we measure
      clusterBy = Some(Seq("id")), maxClusterDepth = 2.0)
    assert(r2.clusteredToVersion.isEmpty, "healthy layout must stay quiet")
    // unmeasurable column (no stats anywhere): never triggers a rewrite
    val r3 = Snapshots.maintain(spark, base, smallBytes = 1L,
      clusterBy = Some(Seq("s")), maxClusterDepth = 2.0)
    assert(r3.clusteredToVersion.isEmpty, "unmeasurable must not guess")
    assert(Snapshots.read(spark, base).count() == 1000L)
  }

  test("maintain refreshes declared sidecars: a cluster cycle leaves depth AND coverage green") {
    val base = java.nio.file.Files.createTempDirectory("graft-clus8").toString + "/t"
    Snapshots.write((1L to 1000L).map(i => (i, s"v$i", i * 1.0))
      .toDF("id", "s", "x").repartition(4), base, statsKey = Some("id"))
    Snapshots.writeStatsSidecars(spark, base, Seq("x"))
    Snapshots.writeNdvSidecars(spark, base, Seq("x"))
    assert(Snapshots.metaBoundsOf(spark, base, "x").isDefined)
    val r1 = Snapshots.maintain(spark, base, targetBytes = 4L * 1024,
      clusterBy = Some(Seq("id")), maxClusterDepth = 2.0,
      statsCols = Seq("x"), ndvCols = Seq("x"))
    assert(r1.clusteredToVersion.isDefined)
    // every clustered file regained its evidence inside the same cycle:
    // depth healthy AND the non-key column still answers from metadata
    assert(Snapshots.clusteringDepth(spark, base, "id").exists(_ <= 2.0))
    assert(r1.sidecarsBuilt > 0, "rewritten files must re-sidecar")
    assert(Snapshots.metaBoundsOf(spark, base, "x").isDefined,
      "coverage must be complete after the cycle, not stale")
    assert(Snapshots.approxDistinct(spark, base, "x") > 900L)
    // quiet cycle: nothing rewritten, nothing rebuilt
    val r2 = Snapshots.maintain(spark, base, smallBytes = 1L,
      clusterBy = Some(Seq("id")), maxClusterDepth = 2.0,
      statsCols = Seq("x"), ndvCols = Seq("x"))
    assert(r2.clusteredToVersion.isEmpty && r2.compactedToVersion.isEmpty &&
      r2.sidecarsBuilt == 0, s"quiet table must build nothing: $r2")
  }

  test("string clusteringDepth: bound-rank measure drives maintain on a string key") {
    val base = java.nio.file.Files.createTempDirectory("graft-clus9").toString + "/t"
    // workflow_id-shaped keys: constant prefix, ordering lives in the
    // tail; range-partition on n % 8 so each of 8 files holds one residue
    // class and provably spans the whole keyspace
    Snapshots.write(
      (1L to 1000L).map(i => (f"wf-$i%06d", i)).toDF("wf_id", "n")
        .repartitionByRange(8, org.apache.spark.sql.functions.pmod(col("n"),
          org.apache.spark.sql.functions.lit(8))),
      base, statsKey = Some("wf_id"))
    // rank measure on 8 interleaved files: each [min,max] spans ~all 16
    // bound ranks → depth ≈ 64/15 ≈ 4 (≈ half the file count, see
    // clusteringDepth's scaladoc) — far past the 2.0 default trigger
    val d0 = Snapshots.clusteringDepth(spark, base, "wf_id").get
    assert(d0 > 2.5, s"interleaved string files must read as degraded: depth $d0")
    // the health trigger now FIRES on a string key (r15 gap: strings could
    // never qualify) and the cycle lands a clustered layout
    val r = Snapshots.maintain(spark, base, targetBytes = 4L * 1024,
      clusterBy = Some(Seq("wf_id")), maxClusterDepth = 2.0)
    assert(r.clusteredToVersion.isDefined, "string depth must trigger maintain")
    val d1 = Snapshots.clusteringDepth(spark, base, "wf_id").get
    assert(d1 <= 1.3, s"disjoint string ranges must read ~1: depth $d1")
    // and the clustered layout actually prunes a string range scan
    val (cand, pruned) = Snapshots.scanPlan(spark, base,
      col("wf_id") <= "wf-000050")
    assert(pruned.nonEmpty && cand.size <= 2,
      s"a 50-key range over a clustered layout must admit boundary files " +
        s"only: ${cand.size} cand / ${pruned.size} pruned")
    assert(Snapshots.scanWhere(spark, base, col("wf_id") <= "wf-000050")
      .count() == 50L)
  }

  test("guards: pending rename and pending MoR deletes refuse") {
    val base = java.nio.file.Files.createTempDirectory("graft-clus5").toString + "/t"
    Snapshots.write((1L to 50L).map(i => (i, i * 1.0)).toDF("id", "x"), base)
    Snapshots.renameColumn(spark, base, "x", "y")
    val e = intercept[IllegalArgumentException] {
      Snapshots.rewriteSorted(spark, base, Seq("id"))
    }
    assert(e.getMessage.contains("materializeSchema"))
    Snapshots.materializeSchema(spark, base)
    Snapshots.deleteWhereMoR(spark, base, col("id") === 3L)
    val e2 = intercept[IllegalArgumentException] {
      Snapshots.rewriteSorted(spark, base, Seq("id"))
    }
    assert(e2.getMessage.contains("materializeDeletes"))
  }
}
