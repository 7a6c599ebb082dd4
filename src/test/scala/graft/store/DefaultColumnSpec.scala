package graft.store

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * ADD COLUMN ... DEFAULT (round-15, Iceberg v3 default values): the
 * optional third field of the `A:` op is a constant SQL expression applied
 * at read to every row whose FILE's recorded schema lacks the column —
 * initial-default (pre-add vintages) and write-default (post-add appends
 * that omitted the column) collapse into one file-granular rule, decided
 * from the manifest's per-file schemas, never guessed. A carrier file's
 * EXPLICIT nulls stay null.
 */
class DefaultColumnSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshBase(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("pre-add rows read the default; carrier rows keep real values AND explicit nulls") {
    val base = freshBase("graft-dflt")
    Snapshots.write((1L to 100L).map(i => (i, s"v$i")).toDF("id", "s"), base,
      statsKey = Some("id"))
    Snapshots.addColumn(spark, base, "score", DoubleType, Some("1.5"))
    // v1 time travel: no column at all
    assert(!Snapshots.read(spark, base, Some(1L)).columns.contains("score"))
    // pre-add rows fill the default (no carrier exists yet)
    val all = Snapshots.read(spark, base)
    assert(all.filter(col("score") === 1.5).count() == 100)
    // a carrier append with real values AND an explicit null
    Snapshots.append(
      Seq((101L, "v101", Some(9.0)), (102L, "v102", Option.empty[Double]))
        .toDF("id", "s", "score"), base, statsKey = Some("id"))
    val now = Snapshots.read(spark, base)
    assert(now.filter(col("id") <= 100L && col("score") === 1.5).count() == 100,
      "pre-add vintage must default-fill")
    assert(now.filter(col("id") === 101L && col("score") === 9.0).count() == 1)
    assert(now.filter(col("id") === 102L && col("score").isNull).count() == 1,
      "a carrier's EXPLICIT null must stay null - not be overwritten by the default")
  }

  test("post-add append OMITTING the column gets the default (write-default)") {
    val base = freshBase("graft-dflt2")
    Snapshots.write(Seq((1L, "a")).toDF("id", "s"), base)
    Snapshots.addColumn(spark, base, "lang", StringType, Some("'und'"))
    Snapshots.append(Seq((2L, "b")).toDF("id", "s"), base) // omits lang
    Snapshots.append(Seq((3L, "c", "en")).toDF("id", "s", "lang"), base)
    val got = Snapshots.read(spark, base).select(col("id"), col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "und", 2L -> "und", 3L -> "en"), s"$got")
  }

  test("scanWhere/countWhere/topK see defaults (readSubset path)") {
    val base = freshBase("graft-dflt3")
    Snapshots.write((1L to 600L).map(i => (i, i * 1.0)).toDF("id", "x")
      .repartitionByRange(6, col("id")), base, statsKey = Some("id"))
    Snapshots.addColumn(spark, base, "grade", StringType, Some("'ok'"))
    Snapshots.append(Seq((601L, 601.0, "bad")).toDF("id", "x", "grade"), base,
      statsKey = Some("id"))
    // a bounds-pruned scan over pre-add files only must still fill
    val hits = Snapshots.scanWhere(spark, base,
      col("id") <= 100L && col("grade") === "ok")
    assert(hits.count() == 100)
    assert(Snapshots.countWhere(spark, base, col("id") <= 100L) == 100L)
    val top = Snapshots.topK(spark, base, "id", 2, ascending = false)
    assert(top.select(col("grade")).collect().map(_.getString(0)).toSeq
      .sorted == Seq("bad", "ok"))
  }

  test("MoR deletes and defaults coexist (vintage + row_index pre-resolution)") {
    val base = freshBase("graft-dflt4")
    Snapshots.write((1L to 50L).map(i => (i, s"v$i")).toDF("id", "s"), base,
      statsKey = Some("id"))
    Snapshots.addColumn(spark, base, "score", DoubleType, Some("2.0"))
    Snapshots.deleteWhereMoR(spark, base, col("id") <= 10L)
    val now = Snapshots.read(spark, base)
    assert(now.count() == 40)
    assert(now.filter(col("score") === 2.0).count() == 40,
      "survivors of a positional delete must still default-fill")
    Snapshots.deleteByKey(spark, base, Seq(11L).toDF("id"))
    assert(Snapshots.read(spark, base).count() == 39)
    Snapshots.materializeDeletes(spark, base)
    assert(Snapshots.read(spark, base).filter(col("score") === 2.0).count() == 39)
  }

  test("CoW DML physicalizes the default in rewritten files; untouched vintages still fill") {
    val base = freshBase("graft-dflt5")
    Snapshots.write((1L to 400L).map(i => (i, i * 1.0)).toDF("id", "x")
      .repartitionByRange(4, col("id")), base, statsKey = Some("id"))
    Snapshots.addColumn(spark, base, "score", DoubleType, Some("3.5"))
    // rewrite ONE file via an unrelated update; its rows must keep the
    // default (physicalized now), other files keep filling at read
    Snapshots.updateWhere(spark, base, col("id") === 7L, Seq("x" -> lit(-7.0)))
    val now = Snapshots.read(spark, base)
    assert(now.filter(col("score") === 3.5).count() == 400)
    assert(now.filter(col("id") === 7L && col("x") === -7.0).count() == 1)
    // merge upsert: kept rows of the rewritten file keep the default too
    Snapshots.mergeInto(spark, base,
      Seq((8L, 88.0, 9.9)).toDF("id", "x", "score"), "id")
    val after = Snapshots.read(spark, base)
    assert(after.filter(col("id") === 8L && col("score") === 9.9).count() == 1)
    assert(after.filter(col("score") === 3.5).count() == 399)
    // replaceWhere keeps defaults on kept neighbors of a touched file
    Snapshots.replaceWhere(spark, base, col("id") <= 3L,
      Seq((1L, 0.0, 3.5), (2L, 0.0, 3.5), (3L, 0.0, 3.5)).toDF("id", "x", "score"))
    assert(Snapshots.read(spark, base).filter(col("score") === 3.5).count() == 399)
  }

  test("compact and materializeSchema physicalize defaults; the fold drops the op") {
    val base = freshBase("graft-dflt6")
    Snapshots.write((1L to 200L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(3), base)
    Snapshots.addColumn(spark, base, "n", DoubleType, Some("7.0"))
    Snapshots.compact(spark, base, smallBytes = Long.MaxValue)
    assert(Snapshots.read(spark, base).filter(col("n") === 7.0).count() == 200,
      "compaction must physicalize the default, not bury nulls")
    val b2 = freshBase("graft-dflt7")
    Snapshots.write((1L to 100L).map(i => (i, s"v$i")).toDF("id", "s"), b2)
    Snapshots.addColumn(spark, b2, "n", DoubleType, Some("7.0"))
    Snapshots.materializeSchema(spark, b2)
    val lines = Snapshots.manifestLines(spark, b2,
      Snapshots.versions(spark, b2).last)
    assert(!lines.exists(_.startsWith("A:")), "materialize must fold the op")
    assert(Snapshots.read(spark, b2).filter(col("n") === 7.0).count() == 100)
  }

  test("guards: non-constant or ill-typed defaults refuse at declare time") {
    val base = freshBase("graft-dflt8")
    Snapshots.write(Seq((1L, "a")).toDF("id", "s"), base)
    intercept[IllegalArgumentException] {
      Snapshots.addColumn(spark, base, "bad", DoubleType, Some("id + 1"))
    }
    intercept[IllegalArgumentException] {
      Snapshots.addColumn(spark, base, "bad", DoubleType, Some("not_a_fn()"))
    }
    intercept[IllegalArgumentException] {
      Snapshots.addColumn(spark, base, "bad", DoubleType, Some("1.0\tx"))
    }
  }
}
