package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * CHECK constraints (`C:` lines, enforced in commitStaged before the
 * atomic rename) and REPLACE WHERE (transactional dynamic overwrite) —
 * round-15.
 */
class ConstraintReplaceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshBase(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  // ─── constraints ─────────────────────────────────────────────────────────

  test("violating append never becomes a version; clean append passes; NULL passes (SQL CHECK)") {
    val base = freshBase("graft-ck")
    Snapshots.write((1L to 100L).map(i => (i, i * 1.0)).toDF("id", "score"), base)
    Snapshots.addConstraint(spark, base, "score_nonneg", "score >= 0")
    assert(Snapshots.constraints(spark, base) == Seq(("score_nonneg", "score >= 0")))
    val vBefore = Snapshots.versions(spark, base).last
    val e = intercept[Snapshots.ConstraintViolationException] {
      Snapshots.append(Seq((101L, -5.0)).toDF("id", "score"), base)
    }
    assert(e.getMessage.contains("score_nonneg"))
    assert(Snapshots.versions(spark, base).last == vBefore,
      "a violating batch must not create a version")
    assert(Snapshots.read(spark, base).count() == 100)
    // UNKNOWN (NULL score) passes — SQL CHECK semantics
    Snapshots.append(Seq((101L, Option.empty[Double]), (102L, Some(7.0)))
      .toDF("id", "score"), base)
    assert(Snapshots.read(spark, base).count() == 102)
  }

  test("addConstraint refuses when existing rows violate; declares after cleanup") {
    val base = freshBase("graft-ck2")
    Snapshots.write(Seq((1L, 5.0), (2L, -1.0)).toDF("id", "score"), base)
    val e = intercept[IllegalArgumentException] {
      Snapshots.addConstraint(spark, base, "pos", "score >= 0")
    }
    assert(e.getMessage.contains("existing rows violate"))
    Snapshots.deleteWhere(spark, base, col("score") < 0)
    Snapshots.addConstraint(spark, base, "pos", "score >= 0")
    assert(Snapshots.constraints(spark, base).map(_._1) == Seq("pos"))
  }

  test("constraints survive CoW DML and compaction, and gate DML output itself") {
    val base = freshBase("graft-ck3")
    Snapshots.write((1L to 200L).map(i => (i, i * 1.0)).toDF("id", "score")
      .repartitionByRange(4, col("id")), base, statsKey = Some("id"))
    Snapshots.addConstraint(spark, base, "cap", "score <= 1000")
    // an UPDATE that would break the constraint is refused pre-rename
    intercept[Snapshots.ConstraintViolationException] {
      Snapshots.updateWhere(spark, base, col("id") === 7L,
        Seq("score" -> lit(99999.0)))
    }
    assert(Snapshots.read(spark, base).filter(col("score") > 1000).count() == 0)
    // a legal UPDATE passes and the constraint line survives the rewrite
    Snapshots.updateWhere(spark, base, col("id") === 7L,
      Seq("score" -> lit(999.0)))
    assert(Snapshots.constraints(spark, base).map(_._1) == Seq("cap"))
    Snapshots.compact(spark, base, smallBytes = Long.MaxValue)
    assert(Snapshots.constraints(spark, base).map(_._1) == Seq("cap"))
    // still enforced after the compaction rewrite
    intercept[Snapshots.ConstraintViolationException] {
      Snapshots.append(Seq((999L, 5000.0)).toDF("id", "score"), base)
    }
  }

  test("dropConstraint lifts enforcement; duplicate/missing names refuse") {
    val base = freshBase("graft-ck4")
    Snapshots.write(Seq((1L, 1.0)).toDF("id", "score"), base)
    Snapshots.addConstraint(spark, base, "pos", "score >= 0")
    intercept[IllegalArgumentException] {
      Snapshots.addConstraint(spark, base, "pos", "score >= 0")
    }
    Snapshots.dropConstraint(spark, base, "pos")
    assert(Snapshots.constraints(spark, base).isEmpty)
    Snapshots.append(Seq((2L, -9.0)).toDF("id", "score"), base) // no gate now
    assert(Snapshots.read(spark, base).count() == 2)
    intercept[IllegalArgumentException] {
      Snapshots.dropConstraint(spark, base, "pos")
    }
  }

  test("rename/drop of a referenced column refuses; materialize carries constraints") {
    val base = freshBase("graft-ck5")
    Snapshots.write(Seq((1L, 1.0, "a")).toDF("id", "score", "tag"), base)
    Snapshots.addConstraint(spark, base, "pos", "score >= 0")
    val eR = intercept[IllegalArgumentException] {
      Snapshots.renameColumn(spark, base, "score", "s2")
    }
    assert(eR.getMessage.contains("pos"))
    val eD = intercept[IllegalArgumentException] {
      Snapshots.dropColumn(spark, base, "score")
    }
    assert(eD.getMessage.contains("pos"))
    // an UNreferenced column renames fine, and materializeSchema carries
    // the constraint through the fold
    Snapshots.renameColumn(spark, base, "tag", "label")
    Snapshots.materializeSchema(spark, base)
    assert(Snapshots.constraints(spark, base).map(_._1) == Seq("pos"))
    intercept[Snapshots.ConstraintViolationException] {
      Snapshots.append(Seq((2L, -1.0, "b")).toDF("id", "score", "label"), base)
    }
  }

  test("delete-file commits are not falsely gated (constraint skips non-row schemas)") {
    val base = freshBase("graft-ck6")
    Snapshots.write((1L to 50L).map(i => (i, i * 1.0)).toDF("id", "score"), base)
    Snapshots.addConstraint(spark, base, "pos", "score >= 0")
    // MoR delete stages positional-delete payloads, not table rows — the
    // constraint must not block (or crash) that commit
    Snapshots.deleteWhereMoR(spark, base, col("id") <= 5L)
    assert(Snapshots.read(spark, base).count() == 45)
    Snapshots.materializeDeletes(spark, base)
    assert(Snapshots.constraints(spark, base).map(_._1) == Seq("pos"))
    intercept[Snapshots.ConstraintViolationException] {
      Snapshots.append(Seq((99L, -1.0)).toDF("id", "score"), base)
    }
  }

  // ─── replaceWhere ────────────────────────────────────────────────────────

  test("replaceWhere: one commit, file-granular CoW, clean files inherited") {
    val base = freshBase("graft-rw")
    val df = (1L to 1200L).map(i => (i, s"src${i % 3}", i * 1.0))
      .toDF("id", "src", "x")
    Snapshots.write(df.repartitionByRange(6, col("id")), base,
      statsKey = Some("id"))
    val vBefore = Snapshots.versions(spark, base).last
    // replace the low-id range with recomputed rows
    val repl = (1L to 200L).map(i => (i, s"src${i % 3}", -i * 1.0))
      .toDF("id", "src", "x")
    Snapshots.replaceWhere(spark, base, col("id") <= 200L, repl,
      statsKey = Some("id"))
    assert(Snapshots.versions(spark, base).last == vBefore + 1,
      "replace must be ONE commit")
    val now = Snapshots.read(spark, base)
    assert(now.count() == 1200)
    assert(now.filter(col("id") <= 200L && col("x") > 0).count() == 0)
    assert(now.filter(col("id") > 200L && col("x") < 0).count() == 0)
    // files outside the predicate's bounds are INHERITED, not rewritten
    val (d1, _) = Snapshots.splitEntries(
      Snapshots.manifestLines(spark, base, vBefore))
    val (d2, _) = Snapshots.splitEntries(
      Snapshots.manifestLines(spark, base, vBefore + 1))
    val shared = d1.map(_.path).toSet intersect d2.map(_.path).toSet
    assert(shared.nonEmpty, "clean files must be inherited by reference")
  }

  test("replaceWhere refuses stray replacement rows and NULL-predicate rows are kept") {
    val base = freshBase("graft-rw2")
    Snapshots.write(Seq((1L, Some(1.0)), (2L, Option.empty[Double]), (3L, Some(3.0)))
      .toDF("id", "x"), base)
    val e = intercept[IllegalArgumentException] {
      Snapshots.replaceWhere(spark, base, col("x") > 2.0,
        Seq((9L, Some(1.0))).toDF("id", "x")) // 1.0 does not satisfy x > 2
    }
    assert(e.getMessage.contains("satisfy the predicate"))
    Snapshots.replaceWhere(spark, base, col("x") > 2.0,
      Seq((9L, Some(30.0))).toDF("id", "x"))
    val ids = Snapshots.read(spark, base).select(col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 9L), s"got $ids - the NULL-x row must be KEPT")
  }

  test("replaceWhere respects constraints on the replacement batch") {
    val base = freshBase("graft-rw3")
    Snapshots.write(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "score"), base)
    Snapshots.addConstraint(spark, base, "pos", "score >= 0")
    intercept[Snapshots.ConstraintViolationException] {
      Snapshots.replaceWhere(spark, base, col("id") === 2L,
        Seq((2L, -5.0)).toDF("id", "score"))
    }
    assert(Snapshots.read(spark, base).filter(col("score") < 0).count() == 0)
  }

  test("replaceWhere guards: pending MoR deletes and schema ops refuse") {
    val base = freshBase("graft-rw4")
    Snapshots.write((1L to 50L).map(i => (i, i * 1.0)).toDF("id", "x"), base)
    Snapshots.deleteWhereMoR(spark, base, col("id") === 1L)
    intercept[IllegalArgumentException] {
      Snapshots.replaceWhere(spark, base, col("id") === 2L,
        Seq((2L, 0.0)).toDF("id", "x"))
    }
    Snapshots.materializeDeletes(spark, base)
    Snapshots.renameColumn(spark, base, "x", "y")
    intercept[IllegalArgumentException] {
      Snapshots.replaceWhere(spark, base, col("id") === 2L,
        Seq((2L, 0.0)).toDF("id", "y"))
    }
  }
}
