package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.store.Snapshots

/** The opt-in automatic file-pruning rule: plan surgery + result parity. */
class SnapshotPruneRewriteSpec extends AnyFunSuite {

  private def withExtSession[T](f: SparkSession => T): T = {
    val prev = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder().master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  private def scannedFiles(df: DataFrame): Int =
    df.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f.relation.location.inputFiles.length
    }.getOrElse(-1)

  test("enabled: a plain read().filter() scans only admitted files, same rows") {
    withExtSession { s =>
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-prule1").toString + "/t"
      Snapshots.write(
        (1L to 800L).map(i => (i, s"v$i")).toDF("id", "s")
          .repartitionByRange(8, col("id")),
        base, statsKey = Some("id"))
      val q = Snapshots.read(s, base).filter(col("id") === 700L)
      // disabled (default): all 8 files scanned
      s.conf.set(SnapshotPruneRewrite.EnabledKey, "false")
      assert(scannedFiles(q) == 8, "default path must be untouched")
      val expect = q.collect().map(_.getString(1)).toSeq
      // enabled: the planner admits 1 file; rows identical
      s.conf.set(SnapshotPruneRewrite.EnabledKey, "true")
      val q2 = Snapshots.read(s, base).filter(col("id") === 700L)
      assert(scannedFiles(q2) == 1, "rule must swap in the pruned index")
      assert(q2.collect().map(_.getString(1)).toSeq == expect)
      assert(expect == Seq("v700"))
      // residual evaluation survives: a range + non-prunable conjunct
      val q3 = Snapshots.read(s, base)
        .filter(col("id") <= 100L && col("s").endsWith("7"))
      assert(scannedFiles(q3) == 1)
      assert(q3.count() == 10L) // 7, 17, ..., 97
      s.conf.set(SnapshotPruneRewrite.EnabledKey, "false")
    }
  }

  test("declines: pending MoR deletes, foreign parquet, already-pruned sets; time travel still prunes") {
    withExtSession { s =>
      import s.implicits._
      s.conf.set(SnapshotPruneRewrite.EnabledKey, "true")
      try {
        val root = java.nio.file.Files.createTempDirectory("graft-prule2").toString
        val base = s"$root/t"
        Snapshots.write(
          (1L to 400L).map(i => (i, i * 2.0)).toDF("id", "x")
            .repartitionByRange(4, col("id")),
          base, statsKey = Some("id"))
        // time travel read of v1 prunes too (exact-version match by set)
        Snapshots.append(Seq((9999L, 1.0)).toDF("id", "x"), base)
        val tt = Snapshots.read(s, base, Some(1L)).filter(col("id") === 42L)
        assert(scannedFiles(tt) == 1 && tt.count() == 1L)
        // pending MoR delete: version match fails → untouched, and rows
        // are still correct through the delete join
        Snapshots.deleteWhereMoR(s, base, col("id") === 42L)
        val q = Snapshots.read(s, base).filter(col("id") <= 50L)
        assert(q.count() == 49L, "MoR delete must still apply")
        // foreign parquet dir (no v=N layout): untouched
        val plain = s"$root/plain"
        (1L to 100L).map(i => (i, i)).toDF("a", "b")
          .repartition(3).write.parquet(plain)
        val fq = s.read.parquet(plain).filter(col("a") === 5L)
        assert(scannedFiles(fq) == 3 && fq.count() == 1L)
      } finally s.conf.set(SnapshotPruneRewrite.EnabledKey, "false")
    }
  }
}
