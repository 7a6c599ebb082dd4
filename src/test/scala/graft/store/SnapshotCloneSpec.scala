package graft.store

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Shallow clones: zero-copy cross-table forks with structural GC safety
 * on both sides (clone maintenance never deletes source bytes; source
 * maintenance protects clone-referenced files via the `_clones/`
 * registry until detach).
 */
class SnapshotCloneSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-clone-$tag").toString

  /** All regular files under a directory (recursive), relative paths. */
  private def filesUnder(dir: String): Set[String] = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) Set.empty
    else {
      val out = scala.collection.mutable.Set.empty[String]
      java.nio.file.Files.walk(root).forEach { p =>
        if (java.nio.file.Files.isRegularFile(p))
          out += root.relativize(p).toString
      }
      out.toSet
    }
  }

  test("fork is zero-copy and fully isolated in both directions") {
    val root = freshRoot("fork")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Snapshots.write((1L to 40L).map(i => (i, s"s$i")).toDF("id", "s")
      .repartition(3), src, statsKey = Some("id"))
    Snapshots.append(Seq((41L, "s41")).toDF("id", "s"), src,
      statsKey = Some("id"))
    val srcFilesBefore = filesUnder(src)

    val v = Snapshots.shallowClone(spark, src, dst)
    assert(v == 1L)
    // zero data bytes moved: the clone dir holds only its v1 manifest
    val dstFiles = filesUnder(dst)
    assert(dstFiles.forall(f => f.contains("_manifest")), // + local-FS .crc twin
      s"clone must be metadata-only, found $dstFiles")
    assert(filesUnder(src) -- srcFilesBefore ==
      filesUnder(src).filter(_.startsWith("_clones/")),
      "source gains only the registry entry")
    assert(Snapshots.registeredClones(spark, src).values.toSet == Set(dst))

    // same rows; then each side diverges without the other noticing
    assert(Snapshots.read(spark, dst).as[(Long, String)].collect().toSet ==
      Snapshots.read(spark, src).as[(Long, String)].collect().toSet)
    Snapshots.append(Seq((100L, "clone-only")).toDF("id", "s"), dst)
    Snapshots.append(Seq((200L, "src-only")).toDF("id", "s"), src)
    val dstRows = Snapshots.read(spark, dst).as[(Long, String)].collect().toSet
    val srcRows = Snapshots.read(spark, src).as[(Long, String)].collect().toSet
    assert(dstRows.contains((100L, "clone-only")) && !dstRows.contains((200L, "src-only")))
    assert(srcRows.contains((200L, "src-only")) && !srcRows.contains((100L, "clone-only")))
    // clone time travel sees the fork image
    assert(Snapshots.read(spark, dst, Some(1L)).count() == 41L)

    // manifest key stats carried over: a pruned scan on the CLONE skips
    // files from the source-written bounds
    val (cand, pruned) = Snapshots.scanPlan(spark, dst, col("id") === 41L)
    assert(pruned.nonEmpty, "clone must inherit pruning evidence")
    assert(Snapshots.scanWhere(spark, dst, col("id") === 41L).count() == 1L)
  }

  test("source expiry + vacuum protect clone-referenced files until detach") {
    val root = freshRoot("gc")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Snapshots.write((1L to 30L).map(i => (i, i * 10L)).toDF("id", "x")
      .repartition(2), src, statsKey = Some("id"))
    Snapshots.shallowClone(spark, src, dst)

    // source moves on and expires the cloned snapshot
    Snapshots.write(Seq((99L, 990L)).toDF("id", "x"), src) // full replace
    val dropped = Snapshots.expire(spark, src, keep = 1)
    assert(dropped == Seq(1L))
    Snapshots.vacuum(spark, src, txnTtlMs = 0L)
    // the clone still reads every forked row — its files survived both
    assert(Snapshots.read(spark, dst).as[(Long, Long)].collect().toSet ==
      (1L to 30L).map(i => (i, i * 10L)).toSet)

    // detach refuses while refs live
    val ex = intercept[IllegalArgumentException] {
      Snapshots.detachClone(spark, src, dst)
    }
    assert(ex.getMessage.contains("deepenClone"))

    // localize, retire the ref-holding snapshot, then detach
    Snapshots.deepenClone(spark, dst)
    Snapshots.expire(spark, dst, keep = 1)
    assert(Snapshots.detachClone(spark, src, dst))
    assert(Snapshots.registeredClones(spark, src).isEmpty)
    // clone unaffected by the source's GC from here on
    Snapshots.vacuum(spark, src, txnTtlMs = 0L)
    assert(Snapshots.read(spark, dst).count() == 30L)
    // and the formerly-protected source debris is now collectible
    assert(!filesUnder(src).exists(_.startsWith("v=1/part-")),
      "after detach, vacuum collects the expired version's files")
    assert(Snapshots.detachClone(spark, src, dst) === false, "second detach no-ops")
  }

  test("clone-side maintenance never deletes source bytes (structural)") {
    val root = freshRoot("cgc")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Snapshots.write((1L to 20L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(2), src)
    Snapshots.shallowClone(spark, src, dst)
    val srcBefore = filesUnder(src)
    // full replace on the clone: v1's external refs become unreferenced,
    // then expire + vacuum the clone — the sweep sees the absolute paths
    // in v1's manifest and must skip them
    Snapshots.write(Seq((7L, "w")).toDF("id", "s"), dst)
    assert(Snapshots.expire(spark, dst, keep = 1) == Seq(1L))
    Snapshots.vacuum(spark, dst, txnTtlMs = 0L)
    assert(filesUnder(src) == srcBefore,
      "clone expiry/vacuum must not touch the source")
    assert(Snapshots.read(spark, src).count() == 20L)
    // no external refs remain → detach succeeds with the table live
    assert(Snapshots.detachClone(spark, src, dst))
  }

  test("merge-on-read deletes on a clone hit source-inherited files exactly") {
    val root = freshRoot("mor")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Snapshots.write((1L to 25L).map(i => (i, i % 5L)).toDF("id", "k")
      .repartition(2), src, statsKey = Some("id"))
    Snapshots.shallowClone(spark, src, dst)

    // equality delete: covered set includes the external files
    Snapshots.deleteByKey(spark, dst, Seq(3L, 17L).toDF("id"))
    assert(Snapshots.read(spark, dst).as[(Long, Long)].collect().map(_._1).toSet ==
      ((1L to 25L).toSet -- Set(3L, 17L)))
    // positional delete over external files
    Snapshots.deleteWhereMoR(spark, dst, col("id") === 9L)
    assert(Snapshots.read(spark, dst).count() == 22L)
    // sequence-number scoping survives cloning: re-inserted key lives
    Snapshots.append(Seq((3L, 3L)).toDF("id", "k"), dst)
    assert(Snapshots.read(spark, dst).filter(col("id") === 3L).count() == 1L)

    // folding the deletes localizes only the touched files
    Snapshots.materializeDeletes(spark, dst)
    val rows = Snapshots.read(spark, dst).as[(Long, Long)].collect().map(_._1).toSet
    assert(rows == (1L to 25L).toSet -- Set(17L, 9L) ,
      s"after materialize: $rows")
    // source rows never changed
    assert(Snapshots.read(spark, src).count() == 25L)
  }

  test("deepenClone copies bytes + sidecars exactly and is a no-op when local") {
    val root = freshRoot("deep")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Snapshots.write((1L to 50L).map(i => (i, i * 2L)).toDF("id", "x")
      .repartition(2), src, statsKey = Some("id"))
    Snapshots.writeStatsSidecars(spark, src, Seq("x"))
    Snapshots.shallowClone(spark, src, dst)

    val beforeLines = Snapshots.manifestLines(spark, dst, 1L)
    val v2 = Snapshots.deepenClone(spark, dst)
    assert(v2 == 2L)
    val afterLines = Snapshots.manifestLines(spark, dst, v2)
    // every stats/counter field survives the path rewrite verbatim
    def tails(lines: Seq[String]) = lines.filterNot(_.contains(":"))
      .map(l => l.substring(l.indexOf('\t').max(0))).sorted
    assert(tails(afterLines) == tails(beforeLines),
      "manifest stats/counters must be preserved by localization")
    assert(!afterLines.map(l => Snapshots.parseEntry(l))
      .exists(e => !e.isSchemaOp && Snapshots.isExternalPath(e.path)),
      "head must hold no external refs after deepen")
    // byte-exact copies, sidecars included
    val deepFiles = filesUnder(dst).filter(f =>
      f.startsWith("v=2/deep-") && !f.endsWith(".stats"))
    assert(deepFiles.size == 2)
    assert(filesUnder(dst).count(f =>
      f.startsWith("v=2/deep-") && f.endsWith(".stats")) == 2,
      "source-side stats sidecars ride along")
    assert(Snapshots.read(spark, dst).as[(Long, Long)].collect().toSet ==
      (1L to 50L).map(i => (i, i * 2L)).toSet)
    // pruning still works off the preserved stats
    val (_, pruned) = Snapshots.scanPlan(spark, dst, col("id") === 1L)
    assert(pruned.nonEmpty)
    // second deepen: nothing external left → no-op
    assert(Snapshots.deepenClone(spark, dst) == v2)
  }

  test("refusals: pending MoR on source, chained clone, occupied destination") {
    val root = freshRoot("refuse")
    val src = s"$root/src"
    Snapshots.write((1L to 10L).map(i => (i, s"s$i")).toDF("id", "s"), src)

    // occupied destination
    val occupied = s"$root/occupied"
    Snapshots.write(Seq((1L, "x")).toDF("id", "s"), occupied)
    assert(intercept[IllegalArgumentException] {
      Snapshots.shallowClone(spark, src, occupied)
    }.getMessage.contains("already holds a table"))

    // same path
    assert(intercept[IllegalArgumentException] {
      Snapshots.shallowClone(spark, src, src)
    }.getMessage.contains("same table"))

    // pending MoR deletes on the source snapshot
    Snapshots.deleteByKey(spark, src, Seq(4L).toDF("id"))
    assert(intercept[IllegalArgumentException] {
      Snapshots.shallowClone(spark, src, s"$root/dst0")
    }.getMessage.contains("materializeDeletes"))
    // but a pre-delete version clones fine
    val dst1 = s"$root/dst1"
    Snapshots.shallowClone(spark, src, dst1, version = Some(1L))
    assert(Snapshots.read(spark, dst1).count() == 10L)

    // chained shallow clone refuses while refs live
    assert(intercept[IllegalArgumentException] {
      Snapshots.shallowClone(spark, dst1, s"$root/dst2")
    }.getMessage.contains("deepenClone"))
    // …and works once localized
    Snapshots.deepenClone(spark, dst1)
    Snapshots.expire(spark, dst1, keep = 1)
    Snapshots.shallowClone(spark, dst1, s"$root/dst2")
    assert(Snapshots.read(spark, s"$root/dst2").count() == 10L)

    // deepen refuses while clone-side MoR deletes are pending
    val dst3 = s"$root/dst3"
    Snapshots.shallowClone(spark, src, dst3, version = Some(1L))
    Snapshots.deleteByKey(spark, dst3, Seq(5L).toDF("id"))
    assert(intercept[IllegalArgumentException] {
      Snapshots.deepenClone(spark, dst3)
    }.getMessage.contains("materializeDeletes"))
  }

  test("refreshClone re-syncs an undiverged fork; divergence refuses") {
    val root = freshRoot("refresh")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Snapshots.write((1L to 20L).map(i => (i, s"s$i")).toDF("id", "s"), src)
    Snapshots.shallowClone(spark, src, dst)
    Snapshots.append((21L to 25L).map(i => (i, s"s$i")).toDF("id", "s"), src)
    // post-fork source schema evolution rides the refresh
    Snapshots.addColumn(spark, src, "score",
      org.apache.spark.sql.types.LongType, default = Some("3"))
    val v2 = Snapshots.refreshClone(spark, src, dst)
    assert(v2 == 2L)
    assert(Snapshots.read(spark, dst).count() == 25L)
    assert(Snapshots.read(spark, dst).filter(col("id") === 3L)
      .select("score").as[Long].head() == 3L)
    // fork image stays time-travelable; second refresh no-ops
    assert(Snapshots.read(spark, dst, Some(1L)).count() == 20L)
    assert(Snapshots.refreshClone(spark, src, dst) == v2)
    // all referenced vintages stay protected through source expiry
    Snapshots.write(Seq((99L, "w", 9L)).toDF("id", "s", "score"), src)
    Snapshots.expire(spark, src, keep = 1)
    Snapshots.vacuum(spark, src, txnTtlMs = 0L)
    assert(Snapshots.read(spark, dst).count() == 25L)
    assert(Snapshots.read(spark, dst, Some(1L)).count() == 20L)

    // any clone-side divergence refuses the refresh
    val dst2 = s"$root/dst2"
    Snapshots.shallowClone(spark, src, dst2)
    Snapshots.append(Seq((100L, "local", 1L)).toDF("id", "s", "score"), dst2)
    assert(intercept[IllegalArgumentException] {
      Snapshots.refreshClone(spark, src, dst2)
    }.getMessage.contains("diverged"))
    val dst3 = s"$root/dst3"
    Snapshots.shallowClone(spark, src, dst3)
    Snapshots.deleteByKey(spark, dst3, Seq(99L).toDF("id"))
    assert(intercept[IllegalArgumentException] {
      Snapshots.refreshClone(spark, src, dst3)
    }.getMessage.contains("diverged"))
    // and an unregistered table is not refreshable
    assert(intercept[IllegalArgumentException] {
      Snapshots.refreshClone(spark, dst, dst2)
    }.getMessage.contains("not a registered clone"))
  }

  test("a WAP staging branch promotes to a standalone table by clone, surviving dropBranch") {
    val root = freshRoot("branch")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Snapshots.write((1L to 10L).map(i => (i, s"m$i")).toDF("id", "s"), src)
    Snapshots.createBranch(spark, src, "staging", 1L)
    Snapshots.appendBranch((11L to 14L).map(i => (i, s"b$i")).toDF("id", "s"),
      src, "staging")
    Snapshots.appendBranch(Seq((15L, "b15")).toDF("id", "s"), src, "staging")
    // main moves on; the branch fork must not see it
    Snapshots.append(Seq((99L, "main-only")).toDF("id", "s"), src)

    Snapshots.shallowClone(spark, src, dst, branch = Some("staging"))
    val expected = (1L to 15L).map(i =>
      (i, if (i <= 10) s"m$i" else s"b$i")).toSet
    assert(Snapshots.read(spark, dst).as[(Long, String)].collect().toSet ==
      expected, "clone is the branch head, not main")

    // dropping the branch on the source must not strand the clone: its
    // branch-namespace files are registry-protected through the drop
    Snapshots.dropBranch(spark, src, "staging")
    assert(Snapshots.read(spark, dst).as[(Long, String)].collect().toSet ==
      expected, "clone survives dropBranch on the source")

    // refresh against MAIN re-points the promoted table at main's head
    val v2 = Snapshots.refreshClone(spark, src, dst)
    assert(Snapshots.read(spark, dst).as[(Long, String)].collect().toSet ==
      ((1L to 10L).map(i => (i, s"m$i")).toSet + ((99L, "main-only"))))
    assert(Snapshots.read(spark, dst, Some(1L)).count() == 15L,
      "the branch fork image stays time-travelable")

    // release: localize, retire the ref-holders, detach, and the
    // dropped branch's debris becomes collectible on the source
    Snapshots.deepenClone(spark, dst)
    Snapshots.expire(spark, dst, keep = 1)
    assert(Snapshots.detachClone(spark, src, dst))
    Snapshots.vacuum(spark, src, txnTtlMs = 0L)
    assert(!filesUnder(src).exists(_.startsWith("vb-staging")),
      "after detach, the dropped branch's protected files are reclaimed")
    assert(Snapshots.read(spark, dst).count() == 11L)
    assert(v2 == 2L)
  }

  test("streaming and change feed read a clone across the fork boundary") {
    val root = freshRoot("stream")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Snapshots.write((1L to 12L).map(i => (i, s"n$i")).toDF("id", "name"), src)
    Snapshots.append((13L to 16L).map(i => (i, s"n$i")).toDF("id", "name"), src)
    Snapshots.shallowClone(spark, src, dst)
    Snapshots.append(Seq((99L, "clone-only")).toDF("id", "name"), dst)

    def drain(ck: String, cdf: Boolean): Seq[org.apache.spark.sql.Row] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      val reader = spark.readStream.format("graft-snapshots")
      val q = (if (cdf) reader.option("readChangeFeed", "true")
                 .option("changeKey", "id")
               else reader)
        .load(dst)
        .writeStream
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect()
          out.synchronized { out ++= rows }
          ()
        }
        .start()
      q.awaitTermination()
      out.toSeq
    }

    // append stream: micro-batches clip-read the external fork files
    // directly (resolve() in the splice path), then the clone commit
    val rows = drain(s"$root/ck1", cdf = false)
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSet ==
      ((1L to 16L).map(i => (i, s"n$i")).toSet + ((99L, "clone-only"))))
    // incremental: a post-checkpoint clone append arrives alone
    Snapshots.append(Seq((100L, "late")).toDF("id", "name"), dst)
    assert(drain(s"$root/ck1", cdf = false)
      .map(r => (r.getLong(0), r.getString(1))) == Seq((100L, "late")))

    // change feed: the fork image is the clone's OWN v1 (inserts), each
    // clone commit stamps its own version — source history is invisible
    val ch = drain(s"$root/ck2", cdf = true)
    assert(ch.forall(_.getAs[String]("_change_type") == "insert"))
    val byVersion = ch.groupBy(_.getAs[Long]("_commit_version"))
      .view.mapValues(_.map(_.getAs[Long]("id")).toSet).toMap
    assert(byVersion == Map(
      1L -> (1L to 16L).toSet, 2L -> Set(99L), 3L -> Set(100L)))
  }

  test("vintage defaults + MoR deletes + external paths compose on one read") {
    val root = freshRoot("mixcanon")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Snapshots.write((1L to 12L).map(i => (i, s"s$i")).toDF("id", "s")
      .repartition(2), src)
    Snapshots.addColumn(spark, src, "score",
      org.apache.spark.sql.types.LongType, default = Some("5"))
    Snapshots.shallowClone(spark, src, dst)
    // clone-local carrier file + MoR deletes hitting BOTH vintages: the
    // read must thread the suffix canon through the vintage-default fill
    // AND the positional-delete anti-join in the same plan
    Snapshots.append(Seq((20L, "n20", 9L)).toDF("id", "s", "score"), dst)
    Snapshots.deleteWhereMoR(spark, dst, col("id").isin(3L, 20L))
    val rows = Snapshots.read(spark, dst)
      .select(col("id"), col("score")).as[(Long, Long)].collect().toMap
    assert(rows == ((1L to 12L).filter(_ != 3L).map(_ -> 5L)).toMap,
      s"got $rows")
    // folding localizes only the touched files; defaults physicalize
    Snapshots.materializeDeletes(spark, dst)
    assert(Snapshots.read(spark, dst)
      .select(col("id"), col("score")).as[(Long, Long)].collect().toMap ==
      ((1L to 12L).filter(_ != 3L).map(_ -> 5L)).toMap)
  }

  test("ADD-COLUMN defaults fill source-vintage files through a clone") {
    val root = freshRoot("adddef")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Snapshots.write((1L to 6L).map(i => (i, s"s$i")).toDF("id", "s"), src)
    Snapshots.addColumn(spark, src, "score",
      org.apache.spark.sql.types.LongType, default = Some("7"))
    Snapshots.shallowClone(spark, src, dst)
    // pre-add external files take the declared default on the clone read
    assert(Snapshots.read(spark, dst).select("score").as[Long]
      .collect().toSeq == Seq.fill(6)(7L))
    // a clone-side append that carries the column stays a carrier
    Snapshots.append(Seq((9L, "s9", 1L)).toDF("id", "s", "score"), dst)
    assert(Snapshots.read(spark, dst).filter(col("id") === 9L)
      .select("score").as[Long].head() == 1L)
  }
}
