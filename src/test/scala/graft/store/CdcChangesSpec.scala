package graft.store

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Full-row CDC feed ([[Snapshots.changes]], Delta table_changes shape).
 * Pins the state-transition semantics (insert / delete / update pre+post
 * pairs, intermediate churn collapse), the O(delta) file scoping (shared
 * files are never OPENED — counting-FS proof), the merge-on-read honesty
 * fallback, and schema-evolution interplay (pre-images null-fill columns
 * added after fromV).
 */
class CdcChangesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def collectChanges(base: String, fromV: Long, toV: Long)
      : Map[(Long, String), (String, Double)] =
    Snapshots.changes(spark, base, fromV, toV, "id")
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type")) ->
        ((r.getAs[String]("name"), r.getAs[Double]("score"))))
      .toMap

  test("insert / delete / update pre+post; intermediate churn collapses") {
    val base = java.nio.file.Files.createTempDirectory("graft-cdc1").toString + "/t"
    Snapshots.write(
      (1L to 50L).map(i => (i, s"n$i", i * 1.0)).toDF("id", "name", "score")
        .repartitionByRange(2, col("id")), base, statsKey = Some("id"))
    // v2: update 10 and 20; v3: delete 20 (update-then-delete collapses)
    Snapshots.updateWhere(spark, base, col("id") === 10L || col("id") === 20L,
      Seq("score" -> (col("score") + 100.0)))
    Snapshots.deleteWhere(spark, base, col("id") === 20L)
    Snapshots.append(Seq((999L, "new", 0.5)).toDF("id", "name", "score"), base)
    val got = collectChanges(base, 1L, Snapshots.versions(spark, base).last)
    assert(got((999L, "insert")) == (("new", 0.5)))
    // collapsed: delete carries the v1 image, not the v2 one
    assert(got((20L, "delete")) == (("n20", 20.0)))
    assert(got((10L, "update_preimage")) == (("n10", 10.0)))
    assert(got((10L, "update_postimage")) == (("n10", 110.0)))
    // untouched keys produce nothing
    assert(got.size == 4)
    // adjacent pair: v1→v2 shows only the two updates
    val v12 = collectChanges(base, 1L, 2L)
    assert(v12.keySet ==
      Set((10L, "update_preimage"), (10L, "update_postimage"),
        (20L, "update_preimage"), (20L, "update_postimage")))
  }

  test("O(delta) scoping: shared files are never opened") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.cntfs.impl", classOf[CountingLocalFs].getName)
    val root = java.nio.file.Files.createTempDirectory("graft-cdc2")
    val base = s"cntfs:$root/t"
    // 4 range files; only the low file is ever touched
    Snapshots.write(
      (1L to 400L).map(i => (i, s"n$i", i * 1.0)).toDF("id", "name", "score")
        .repartitionByRange(4, col("id")), base, statsKey = Some("id"))
    Snapshots.updateWhere(spark, base, col("id") <= 5L,
      Seq("score" -> lit(0.0)))
    val shared = Snapshots.manifestFiles(spark, base, 1L).toSet intersect
      Snapshots.manifestFiles(spark, base, 2L).toSet
    assert(shared.size == 3, s"fixture: 3 files must be inherited, got ${shared.size}")
    CountingLocalFs.reset()
    val n = Snapshots.changes(spark, base, 1L, 2L, "id").count()
    assert(n == 10L) // 5 keys × (pre + post)
    val strays = CountingLocalFs.openedParquet
      .filter(p => shared.exists(sh => p.endsWith(sh)))
    assert(strays.isEmpty,
      s"changes opened files shared by both versions: ${strays.mkString(", ")}")
  }

  test("pure append between versions reads only the appended file") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.cntfs.impl", classOf[CountingLocalFs].getName)
    val root = java.nio.file.Files.createTempDirectory("graft-cdc3")
    val base = s"cntfs:$root/t"
    Snapshots.write(
      (1L to 300L).map(i => (i, s"n$i", i * 1.0)).toDF("id", "name", "score")
        .repartitionByRange(3, col("id")), base, statsKey = Some("id"))
    Snapshots.append(Seq((900L, "x", 1.0)).toDF("id", "name", "score"), base)
    val v1Files = Snapshots.manifestFiles(spark, base, 1L).toSet
    CountingLocalFs.reset()
    val rows = Snapshots.changes(spark, base, 1L, 2L, "id").collect()
    assert(rows.length == 1 && rows(0).getAs[String]("_change_type") == "insert")
    val strays = CountingLocalFs.openedParquet
      .filter(p => v1Files.exists(sh => p.endsWith(sh)))
    assert(strays.isEmpty, s"pure append must not re-read v1: ${strays.mkString(", ")}")
  }

  test("MoR honesty: a pending delete between the versions still yields correct CDC") {
    val base = java.nio.file.Files.createTempDirectory("graft-cdc4").toString + "/t"
    Snapshots.write(
      (1L to 30L).map(i => (i, s"n$i", i * 1.0)).toDF("id", "name", "score")
        .repartitionByRange(2, col("id")), base, statsKey = Some("id"))
    // MoR delete: no data file changes, only a delete file lands
    Snapshots.deleteWhereMoR(spark, base, col("id") === 7L)
    val got = collectChanges(base, 1L, 2L)
    assert(got.keySet == Set((7L, "delete")))
    assert(got((7L, "delete")) == (("n7", 7.0)))
  }

  test("MoR delta scope: only delete-COVERED shared files are opened") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.cntfs.impl", classOf[CountingLocalFs].getName)
    val root = java.nio.file.Files.createTempDirectory("graft-cdc6")
    val base = s"cntfs:$root/t"
    Snapshots.write(
      (1L to 400L).map(i => (i, s"n$i", i * 1.0)).toDF("id", "name", "score")
        .repartitionByRange(4, col("id")), base, statsKey = Some("id"))
    // MoR delete touching ONLY the lowest range file: data files unchanged,
    // one positional delete lands
    Snapshots.deleteWhereMoR(spark, base, col("id") <= 5L)
    val (data2, dels2) =
      Snapshots.splitEntries(Snapshots.manifestLines(spark, base, 2L))
    val covered = Snapshots.deleteCoveredFiles(spark, base, dels2)
    assert(covered.size == 1, s"fixture: one covered file, got $covered")
    val uncovered = data2.map(_.path).toSet -- covered
    assert(uncovered.size == 3)
    CountingLocalFs.reset()
    val got = collectChanges(base, 1L, 2L)
    assert(got.keySet == (1L to 5L).map(i => (i, "delete")).toSet)
    // files opened ≈ changed + covered: the 3 uncovered shared files stay shut
    val strays = CountingLocalFs.openedParquet
      .filter(p => uncovered.exists(u => p.endsWith(u)))
    assert(strays.isEmpty,
      s"pending one-file delete must not widen past its coverage: ${strays.mkString(", ")}")
  }

  test("ADD COLUMN with a non-null default between versions surfaces as updates") {
    val base = java.nio.file.Files.createTempDirectory("graft-cdc7").toString + "/t"
    Snapshots.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), base)
    // the read image of every pre-add row changes (NULL → 0.0), yet no data
    // file is rewritten — delta scoping must fall back to a full read or the
    // feed silently omits these rows
    Snapshots.addColumn(spark, base, "score",
      org.apache.spark.sql.types.DoubleType, default = Some("0.0"))
    val rows = Snapshots.changes(spark, base, 1L,
      Snapshots.versions(spark, base).last, "id").collect()
    val byKey = rows.map(r => (r.getAs[Long]("id"),
      r.getAs[String]("_change_type")) -> r.getAs[Any]("score")).toMap
    assert(byKey.keySet == Set(
      (1L, "update_preimage"), (1L, "update_postimage"),
      (2L, "update_preimage"), (2L, "update_postimage")))
    assert(byKey((1L, "update_preimage")) == null)
    assert(byKey((1L, "update_postimage")) == 0.0)
  }

  test("schema evolution: columns added after fromV null-fill the pre-images") {
    val base = java.nio.file.Files.createTempDirectory("graft-cdc5").toString + "/t"
    Snapshots.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), base)
    Snapshots.addColumn(spark, base, "score",
      org.apache.spark.sql.types.DoubleType)
    Snapshots.append(Seq((3L, "c", 9.0)).toDF("id", "name", "score"), base)
    val rows = Snapshots.changes(spark, base, 1L,
        Snapshots.versions(spark, base).last, "id").collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("id") == 3L &&
      r.getAs[String]("_change_type") == "insert" &&
      r.getAs[Double]("score") == 9.0)
    // the new column exists in the unified output schema
    assert(rows(0).schema.fieldNames.contains("score"))
  }
}
