package graft.store

import scala.collection.mutable

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Table-as-stream source ([[SnapshotStreamSource]], V1 Source so each
 * micro-batch splices a real file relation into the plan — pruned,
 * filtered, vectorized). Pins: micro-batch union == batch read of the
 * final version, version- and byte-capped admission control, checkpointed
 * crash-and-replay exactly-once, startingVersion=latest, the append-only
 * contract's refusals (rewrite/MoR-delete/image-changing schema op) with
 * ignoreChanges opt-out, file splitting by filesMaxPartitionBytes, column
 * pruning + filter pushdown reaching the scan (ReadSchema + bytes-read
 * observables), and the CDF feed incl. branch scoping.
 */
class SnapshotStreamSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-ss-$tag").toString

  /** Run an AvailableNow pass collecting (batchId, rows) per micro-batch. */
  private def drain(base: String, checkpoint: String,
                    options: Map[String, String] = Map.empty)
      : Seq[(Long, Seq[(Long, String)])] = {
    val batches = mutable.ArrayBuffer.empty[(Long, Seq[(Long, String)])]
    val q = options.foldLeft(
        spark.readStream.format("graft-snapshots")) {
        case (r, (k, v)) => r.option(k, v)
      }
      .load(base)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val rows = batch.select(col("id"), col("name")).collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq
        batches.synchronized { batches += ((bid, rows)) }
        ()
      }
      .start()
    q.awaitTermination()
    batches.toSeq
  }

  test("micro-batch union == batch read; maxVersionsPerTrigger paces one commit per batch") {
    val base = freshDir("basic") + "/t"
    val ckpt = freshDir("basic-ckpt")
    Snapshots.write((1L to 40L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    Snapshots.append((41L to 70L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    Snapshots.append((71L to 90L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    val batches = drain(base, ckpt, Map("maxVersionsPerTrigger" -> "1"))
    val nonEmpty = batches.filter(_._2.nonEmpty)
    assert(nonEmpty.size == 3, s"one commit per micro-batch: $batches")
    // batch boundaries match commit boundaries
    assert(nonEmpty.map(_._2.map(_._1).toSet) ==
      Seq((1L to 40L).toSet, (41L to 70L).toSet, (71L to 90L).toSet))
    val union = batches.flatMap(_._2)
    assert(union.size == union.toSet.size, "no duplicate delivery")
    val batchRead = Snapshots.read(spark, base)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(union.toSet == batchRead, "streamed union must equal the final batch read")
  }

  test("crash-and-replay: a restarted checkpoint delivers only new commits, exactly once") {
    val base = freshDir("replay") + "/t"
    val ckpt = freshDir("replay-ckpt")
    Snapshots.write((1L to 20L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    val first = drain(base, ckpt)
    assert(first.flatMap(_._2).map(_._1).toSet == (1L to 20L).toSet)
    // "crash": the query is gone; new commits land while it is down
    Snapshots.append((21L to 30L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    Snapshots.append((31L to 35L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    val second = drain(base, ckpt)
    assert(second.flatMap(_._2).map(_._1).toSet == (21L to 35L).toSet,
      s"replay must resume at the checkpointed version: $second")
    // fully replayed again with nothing new: no batch, no duplicates
    val third = drain(base, ckpt)
    assert(third.flatMap(_._2).isEmpty, s"caught-up restart must deliver nothing: $third")
  }

  test("startingVersion=latest skips history; numeric startingVersion replays from it") {
    val base = freshDir("latest") + "/t"
    Snapshots.write((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    Snapshots.append((11L to 15L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    val ckptLatest = freshDir("latest-ckpt")
    assert(drain(base, ckptLatest, Map("startingVersion" -> "latest"))
      .flatMap(_._2).isEmpty, "latest must skip existing commits")
    Snapshots.append((16L to 18L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    assert(drain(base, ckptLatest).flatMap(_._2).map(_._1).toSet ==
      (16L to 18L).toSet)
    val fromV2 = drain(base, freshDir("v2-ckpt"), Map("startingVersion" -> "2"))
    assert(fromV2.flatMap(_._2).map(_._1).toSet == (11L to 18L).toSet)
  }

  private def msgChain(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  test("startingTimestamp streams commits at-or-after the cutoff (readAsOf's clock)") {
    val base = freshDir("ts") + "/t"
    Snapshots.write((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    Snapshots.append((11L to 15L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    Snapshots.append((16L to 20L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    // push v1/v2 into the past (manifest mtime IS the commit clock)
    val now = System.currentTimeMillis()
    new java.io.File(s"$base/v=1/_manifest").setLastModified(now - 60000)
    new java.io.File(s"$base/v=2/_manifest").setLastModified(now - 30000)
    // cutoff between v2 and v3: stream v3 only
    val got = drain(base, freshDir("ts-ckpt"),
      Map("startingTimestamp" -> (now - 10000).toString))
      .flatMap(_._2).map(_._1).toSet
    assert(got == (16L to 20L).toSet, s"cutoff must admit v3 only: $got")
    // cutoff before everything: the whole table; future cutoff: nothing
    assert(drain(base, freshDir("ts-ckpt2"),
      Map("startingTimestamp" -> (now - 90000).toString))
      .flatMap(_._2).size == 20)
    assert(drain(base, freshDir("ts-ckpt3"),
      Map("startingTimestamp" -> (now + 3600000).toString))
      .flatMap(_._2).isEmpty)
    // both starting options together refuse
    val e = intercept[Exception] {
      drain(base, freshDir("ts-ckpt4"),
        Map("startingTimestamp" -> now.toString, "startingVersion" -> "1"))
    }
    assert(msgChain(e).contains("not both"), msgChain(e))
  }

  test("append-only contract: rewrites, MoR deletes and image ops refuse; ignoreChanges overrides") {
    val base = freshDir("strict") + "/t"
    val ckpt = freshDir("strict-ckpt")
    Snapshots.write((1L to 30L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(2), base)
    drain(base, ckpt) // checkpoint at v1
    // a CoW rewrite lands; the CHECKPOINTED stream's next range removes a
    // file it already delivered → strict mode refuses
    Snapshots.deleteWhere(spark, base, col("id") === 5L)
    val e1 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(base, ckpt)
    }
    assert(msgChain(e1).contains("append-only"), msgChain(e1))
    // relaxed mode re-delivers the REWRITTEN file only, never the table
    val relaxed = drain(base, ckpt, Map("ignoreChanges" -> "true"))
      .flatMap(_._2).map(_._1).toSet
    assert(relaxed.nonEmpty && !relaxed.contains(5L) && relaxed.size < 29,
      s"ignoreChanges must re-deliver just the rewritten file: $relaxed")
    // a fresh stream over the rewritten table is fine (initial snapshot)
    assert(drain(base, freshDir("strict-c2")).flatMap(_._2).map(_._1).toSet ==
      (1L to 30L).toSet -- Set(5L))
    // pending MoR delete refuses even a fresh stream
    Snapshots.deleteWhereMoR(spark, base, col("id") === 7L)
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(base, freshDir("strict-c3"))
    }
    assert(msgChain(e2).contains("materializeDeletes"), msgChain(e2))
    Snapshots.materializeDeletes(spark, base)
    assert(drain(base, freshDir("strict-c4")).flatMap(_._2).map(_._1).toSet ==
      (1L to 30L).toSet -- Set(5L, 7L))
    // pending rename (image op) refuses until materializeSchema
    Snapshots.renameColumn(spark, base, "name", "label")
    val e3 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft-snapshots").load(base)
        .writeStream
        .option("checkpointLocation", freshDir("strict-c5"))
        .trigger(Trigger.AvailableNow())
        .format("noop")
        .start()
      q.awaitTermination()
    }
    assert(msgChain(e3).contains("materializeSchema"), msgChain(e3))
  }

  test("default-less ADD COLUMN streams through; old stream keeps its start schema") {
    val base = freshDir("addcol") + "/t"
    val ckpt = freshDir("addcol-ckpt")
    Snapshots.write((1L to 5L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    assert(drain(base, ckpt).flatMap(_._2).size == 5)
    Snapshots.addColumn(spark, base, "score",
      org.apache.spark.sql.types.DoubleType)
    Snapshots.append(Seq((6L, "n6", 1.5)).toDF("id", "name", "score"), base)
    // the checkpointed stream's schema predates the add: the new physical
    // column projects away, the row still arrives
    assert(drain(base, ckpt).flatMap(_._2) == Seq((6L, "n6")))
    // a FRESH stream sees the evolved schema, with the old vintage null-filled
    val fresh = spark.readStream.format("graft-snapshots").load(base)
    assert(fresh.schema.fieldNames.contains("score"))
    val got = mutable.ArrayBuffer.empty[(Long, Option[Double])]
    val q = fresh.writeStream
      .option("checkpointLocation", freshDir("addcol-ckpt2"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.select(col("id"), col("score")).collect()
          .map(r => (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    q.awaitTermination()
    assert(got.toMap == ((1L to 5L).map(_ -> None).toMap + (6L -> Some(1.5))))
  }

  test("change feed: updates/deletes/appends stream as CDC micro-batches, exactly once") {
    val base = freshDir("cdf") + "/t"
    val ckpt = freshDir("cdf-ckpt")
    def drainCdf(): Seq[(Long, Long, String, Long)] = {
      val got = mutable.ArrayBuffer.empty[(Long, Long, String, Long)]
      val q = spark.readStream.format("graft-snapshots")
        .option("readChangeFeed", "true")
        .option("changeKey", "id")
        .option("maxVersionsPerTrigger", "1")
        .load(base)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, bid: Long) =>
          val rows = b.select(col("id"), col("_change_type"),
            col("_commit_version")).collect()
            .map(r => (bid, r.getLong(0), r.getString(1), r.getLong(2)))
          got.synchronized { got ++= rows }
          ()
        }
        .start()
      q.awaitTermination()
      got.toSeq
    }
    Snapshots.write((1L to 20L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(2), base)
    // fresh stream: the initial snapshot arrives as inserts
    val first = drainCdf()
    assert(first.map(r => (r._2, r._3)).toSet ==
      (1L to 20L).map(i => (i, "insert")).toSet)
    assert(first.forall(_._4 == 1L), "initial snapshot tags _commit_version 1")
    // CoW update, CoW delete, append — each paced as its own CDC batch;
    // the append-only contract does NOT apply to the feed
    Snapshots.updateWhere(spark, base, col("id") === 5L,
      Seq("name" -> org.apache.spark.sql.functions.lit("renamed")))
    Snapshots.deleteWhere(spark, base, col("id") === 7L)
    Snapshots.append(Seq((21L, "n21")).toDF("id", "name"), base)
    val second = drainCdf()
    val byVersion = second.groupBy(_._4).view
      .mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    assert(byVersion(2L) ==
      Set((5L, "update_preimage"), (5L, "update_postimage")))
    assert(byVersion(3L) == Set((7L, "delete")))
    assert(byVersion(4L) == Set((21L, "insert")))
    assert(second.map(_._1).distinct.size == 3, "one commit per micro-batch")
    // caught-up replay delivers nothing
    assert(drainCdf().isEmpty)
    // sweep: planning a new batch drops every older materialized dir
    // (incl. a planted .tmp_b_* crash orphan); at most the FINAL batch's
    // own dir remains (the engine commits source offsets lazily, so the
    // last range's dir is swept by the NEXT batch)
    val cdcDir = new org.apache.hadoop.fs.Path(s"$ckpt/sources/0/__graft_cdc")
    val f = cdcDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(cdcDir, ".tmp_b_0_1_deadbeef"))
    Snapshots.append(Seq((22L, "n22")).toDF("id", "name"), base)
    assert(drainCdf().map(r => (r._2, r._3)) == Seq((22L, "insert")))
    val left = f.listStatus(cdcDir).map(_.getPath.getName).toSeq
    assert(left.forall(_ == "b_4_0_5_0"),
      s"older CDF batch dirs and tmp orphans must be swept, left: $left")
  }

  test("branch streaming: a staging branch's commits stream; main stays independent") {
    val base = freshDir("branch") + "/t"
    Snapshots.write((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    Snapshots.createBranch(spark, base, "staging", 1L)
    Snapshots.appendBranch(
      (11L to 15L).map(i => (i, s"n$i")).toDF("id", "name"), base, "staging")
    // fresh branch stream: forked state + branch appends
    val ckpt = freshDir("branch-ckpt")
    def drainBranch(): Seq[(Long, Seq[(Long, String)])] = {
      val batches = mutable.ArrayBuffer.empty[(Long, Seq[(Long, String)])]
      val q = spark.readStream.format("graft-snapshots")
        .option("branch", "staging")
        .load(base)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, bid: Long) =>
          val rows = b.select(col("id"), col("name")).collect()
            .map(r => (r.getLong(0), r.getString(1))).toSeq
          batches.synchronized { batches += ((bid, rows)) }
          ()
        }
        .start()
      q.awaitTermination()
      batches.toSeq
    }
    assert(drainBranch().flatMap(_._2).map(_._1).toSet == (1L to 15L).toSet)
    // a MAIN commit is invisible to the branch stream; a branch commit isn't
    Snapshots.append(Seq((99L, "main-only")).toDF("id", "name"), base)
    Snapshots.appendBranch(Seq((16L, "n16")).toDF("id", "name"), base, "staging")
    assert(drainBranch().flatMap(_._2).map(_._1).toSet == Set(16L),
      "the branch stream must deliver branch deltas only")
  }

  test("change feed from a BRANCH: row-level changes of staging, main invisible") {
    val base = freshDir("brcdf") + "/t"
    Snapshots.write((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    Snapshots.createBranch(spark, base, "staging", 1L)
    // branch appends, one per commit; main moves independently
    Snapshots.appendBranch(Seq((11L, "n11")).toDF("id", "name"), base, "staging")
    Snapshots.appendBranch(Seq((12L, "n12")).toDF("id", "name"), base, "staging")
    Snapshots.append(Seq((99L, "main-only")).toDF("id", "name"), base)
    val ckpt = freshDir("brcdf-ckpt")
    def drainCdf(): Seq[(Long, String, Long)] = {
      val got = mutable.ArrayBuffer.empty[(Long, String, Long)]
      val q = spark.readStream.format("graft-snapshots")
        .option("branch", "staging")
        .option("readChangeFeed", "true").option("changeKey", "id")
        .option("maxVersionsPerTrigger", "1")
        .load(base)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.select(col("id"), col("_change_type"),
            col("_commit_version")).collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
          got.synchronized { got ++= rows }
          ()
        }
        .start()
      q.awaitTermination()
      got.toSeq
    }
    val first = drainCdf()
    // fork snapshot as inserts at branch v1, then per-commit branch changes
    assert(first.filter(_._3 == 1L).map(r => (r._1, r._2)).toSet ==
      (1L to 10L).map(i => (i, "insert")).toSet, s"$first")
    assert(first.filter(_._3 == 2L).map(r => (r._1, r._2)).toSet ==
      Set((11L, "insert")))
    assert(first.filter(_._3 == 3L).map(r => (r._1, r._2)).toSet ==
      Set((12L, "insert")))
    assert(!first.exists(_._1 == 99L), "main-only rows must not reach the branch feed")
    // crash-replay determinism: caught-up restart delivers nothing
    assert(drainCdf().isEmpty)
  }

  test("column pruning + filter pushdown reach the streaming scan (ReadSchema + bytes)") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.cntfs.impl", classOf[CountingLocalFs].getName)
    val root = java.nio.file.Files.createTempDirectory("graft-ss-prune")
    val base = s"cntfs:$root/t"
    // a fat INCOMPRESSIBLE padding column dominates the file (a constant
    // pad would dictionary-encode away and hide the pruning win); a
    // pruned scan must not read it
    val df = (1L to 2000L).map { i =>
      val rnd = new scala.util.Random(i)
      (i, s"n$i", Array.fill(2048)((rnd.nextInt(94) + 33).toChar).mkString)
    }.toDF("id", "name", "pad")
    Snapshots.write(df, base)
    def run(projectAndFilter: Boolean): (Long, Seq[String], String) = {
      CountingLocalFs.reset()
      val src = spark.readStream.format("graft-snapshots").load(base)
      val shaped = if (projectAndFilter) src.select(col("id")).where(col("id") > 1990L)
                   else src
      val q = shaped.writeStream
        .option("checkpointLocation", freshDir(s"prune-ckpt-$projectAndFilter"))
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect(); ()
        }
        .start()
      q.awaitTermination()
      // the last micro-batch's executed plan carries the actual file scan
      val exec = q.asInstanceOf[
          org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan
      val scan = exec.collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scan.nonEmpty, s"micro-batch must plan a FileSourceScan:\n$exec")
      (CountingLocalFs.bytesRead.get(),
        scan.get.requiredSchema.fieldNames.toSeq, scan.get.toString)
    }
    val (fullBytes, fullSchema, _) = run(projectAndFilter = false)
    assert(fullSchema == Seq("id", "name", "pad"), s"baseline reads full width: $fullSchema")
    val (prunedBytes, prunedSchema, scan) = run(projectAndFilter = true)
    // the 2-column... 1-column projection's ReadSchema carries exactly it
    assert(prunedSchema == Seq("id"),
      s"projection must prune the streaming scan to [id], got $prunedSchema")
    assert(scan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1990)]") ||
      scan.contains("GreaterThan(id,1990)"),
      s"the filter must push into the parquet scan: $scan")
    assert(prunedBytes * 3 < fullBytes,
      s"pruned scan must skip the fat column's bytes: $prunedBytes vs $fullBytes")
  }

  test("maxBytesPerTrigger splits one fat commit across triggers, replay-deterministic") {
    val base = freshDir("bytes") + "/t"
    val ckpt = freshDir("bytes-ckpt")
    Snapshots.write((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1), base) // v1: one file
    Snapshots.append((11L to 50L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(4), base) // v2: one FAT commit, four files
    Snapshots.append((51L to 60L).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1), base) // v3: one file
    // a 1-byte budget admits exactly one file per trigger (progress
    // guarantee) → the fat commit splits into four micro-batches
    val batches = drain(base, ckpt, Map("maxBytesPerTrigger" -> "1"))
      .filter(_._2.nonEmpty)
    assert(batches.size == 6,
      s"1+4+1 files should pace as six single-file batches: ${batches.map(_._2.size)}")
    val union = batches.flatMap(_._2)
    assert(union.size == union.toSet.size, "no duplicate delivery across splits")
    assert(union.map(_._1).toSet == (1L to 60L).toSet)
    // caught-up restart delivers nothing (mid-version offsets replay clean)
    assert(drain(base, ckpt, Map("maxBytesPerTrigger" -> "1"))
      .flatMap(_._2).isEmpty)
    // a restart WITHOUT byte pacing from a mid-version checkpoint also works:
    // fresh commits arrive whole
    Snapshots.append(Seq((61L, "n61")).toDF("id", "name"), base)
    assert(drain(base, ckpt).flatMap(_._2).map(_._1) == Seq(61L))
    // a generous budget takes whole commits per trigger
    val fat = drain(base, freshDir("bytes-c2"),
      Map("maxBytesPerTrigger" -> (64L * 1024 * 1024).toString))
      .filter(_._2.nonEmpty)
    assert(fat.size == 1, s"a 64MB budget should drain all commits at once: ${fat.size}")
    // maxFilesPerTrigger composes at the same file granularity: 7 files
    // at 3 per trigger = ceil(7/3) = 3 batches, no dupes, full union
    val byFiles = drain(base, freshDir("files-ckpt"),
      Map("maxFilesPerTrigger" -> "3")).filter(_._2.nonEmpty)
    assert(byFiles.size == 3, s"7 files / 3 per trigger: ${byFiles.size}")
    val fu = byFiles.flatMap(_._2)
    assert(fu.size == fu.toSet.size && fu.map(_._1).toSet == (1L to 61L).toSet)
  }

  test("AvailableNow pins its target: commits landing mid-run arrive next drain, exactly once") {
    val base = freshDir("concw") + "/t"
    val ckpt = freshDir("concw-ckpt")
    Snapshots.write((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    Snapshots.append((11L to 20L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    // a writer races the catch-up run: first foreachBatch commits v3
    // while the paced stream is still mid-drain
    val appended = new java.util.concurrent.atomic.AtomicBoolean(false)
    val got = mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-snapshots")
      .option("maxVersionsPerTrigger", "1")
      .load(base)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = b.select(col("id")).collect().map(_.getLong(0))
        got.synchronized { got ++= ids }
        if (appended.compareAndSet(false, true))
          Snapshots.append((21L to 25L).map(i => (i, s"n$i"))
            .toDF("id", "name"), base)
        ()
      }
      .start()
    q.awaitTermination()
    // the run terminated at the PINNED target (v2): the racing commit is
    // not delivered mid-run...
    assert(got.toSet == (1L to 20L).toSet,
      s"AvailableNow must stop at its pinned target: ${got.sorted}")
    // ...and arrives exactly once on the next drain
    assert(drain(base, ckpt).flatMap(_._2).map(_._1).toSet == (21L to 25L).toSet)
    assert(drain(base, ckpt).flatMap(_._2).isEmpty)
  }

  test("a checkpoint that outlived retention REFUSES with the retention message — never silent re-delivery") {
    val base = freshDir("expired") + "/t"
    val ckpt = freshDir("expired-ckpt")
    Snapshots.write((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    Snapshots.append((11L to 20L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    assert(drain(base, ckpt).flatMap(_._2).map(_._1).toSet == (1L to 20L).toSet)
    // the stream pauses; two more commits land and retention expires the
    // delivered-through version's manifest
    Snapshots.append((21L to 25L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    Snapshots.append((26L to 30L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    Snapshots.expire(spark, base, keep = 1)
    // the checkpointed offset (delivered through v2) now sits BELOW the
    // retained head; its added-file diff base is gone. Pre-round-18 this
    // fell into the before-first sentinel path and re-delivered the WHOLE
    // snapshot as if fresh (silent duplicates); it must refuse, naming
    // the retention verbs and the recovery path.
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(base, ckpt)
    }
    assert(msgChain(e).contains("no longer committed"), msgChain(e))
    assert(msgChain(e).contains("expire"), msgChain(e))
    assert(msgChain(e).contains("checkpointLocation"), msgChain(e))
    // the documented recovery: a fresh checkpoint re-delivers the current
    // snapshot (initial sentinel — legitimately below head, not refused)
    assert(drain(base, freshDir("expired-c2")).flatMap(_._2).map(_._1).toSet ==
      (1L to 30L).toSet)
    // same refusal in CDF mode: the initial-snapshot path must not re-run
    // for an expired non-initial offset
    val src = new SnapshotSource(spark,
      SnapshotStreamSource.inferSchema(spark, SnapshotStreamSource.optionsOf(
        Map("path" -> base, "readChangeFeed" -> "true", "changeKey" -> "id"))),
      SnapshotStreamSource.optionsOf(
        Map("path" -> base, "readChangeFeed" -> "true", "changeKey" -> "id")),
      freshDir("expired-cdc-meta"))
    val vs = Snapshots.versions(spark, base)
    val eCdf = intercept[IllegalArgumentException] {
      src.getBatch(Some(SnapshotVersionOffset(vs.head - 2)),
        SnapshotVersionOffset(vs.last))
    }
    assert(eCdf.getMessage.contains("no longer committed"), eCdf.getMessage)
  }

  test("sentinel offsets serialize distinctly (~v) and round-trip; mid-commit CDF resumes appends, refuses rewrites") {
    // the before-first sentinel must stay distinguishable from a real
    // delivered-through-v position across checkpoint round-trips — the
    // expired-offset refusal above depends on it
    assert(SnapshotVersionOffset(4, 0, initial = true).json() == "~4")
    assert(SnapshotVersionOffset.parse("~4") ==
      SnapshotVersionOffset(4, 0, initial = true))
    assert(SnapshotVersionOffset.parse("~4#2") ==
      SnapshotVersionOffset(4, 2, initial = true))
    assert(SnapshotVersionOffset.parse("4") == SnapshotVersionOffset(4))
    assert(SnapshotVersionOffset.parse("4#2") == SnapshotVersionOffset(4, 2))
    // a v#k offset inside a PURE-APPEND commit resumes in change-feed
    // mode (round-18): the commit's change set IS its added-file list,
    // so the slice picks up at file k — already-delivered files are not
    // re-delivered. The materialized feed dirs under the source's own
    // metadata path make the delivered rows directly observable.
    val base = freshDir("midcdf") + "/t"
    val meta = freshDir("midcdf-meta")
    Snapshots.write((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    Snapshots.append((11L to 20L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(3), base)
    val opts = SnapshotStreamSource.optionsOf(
      Map("path" -> base, "readChangeFeed" -> "true", "changeKey" -> "id"))
    val src = new SnapshotSource(spark,
      SnapshotStreamSource.inferSchema(spark, opts), opts, meta)
    def feedIds(dir: String): Set[Long] =
      spark.read.parquet(s"$meta/__graft_cdc/$dir")
        .select(col("id")).collect().map(_.getLong(0)).toSet
    src.getBatch(Some(SnapshotVersionOffset(1)), SnapshotVersionOffset(1, 2))
    val firstTwo = feedIds("b_1_0_1_2") // read before the next plan sweeps it
    src.getBatch(Some(SnapshotVersionOffset(1, 2)), SnapshotVersionOffset(2))
    val lastOne = feedIds("b_1_2_2_0")
    assert(firstTwo.intersect(lastOne).isEmpty, "no re-delivery across the cut")
    assert(firstTwo.union(lastOne) == (11L to 20L).toSet,
      s"the two paced slices must cover commit 2 exactly: $firstTwo / $lastOne")
    // ...but a cut inside a REWRITING commit refuses with the commit
    // named: a diff join's row set has no per-file decomposition
    Snapshots.deleteWhere(spark, base, col("id") === 5L)
    val e = intercept[IllegalArgumentException] {
      src.getBatch(Some(SnapshotVersionOffset(2, 1)), SnapshotVersionOffset(3))
    }
    assert(e.getMessage.contains("not a pure append"), e.getMessage)
    assert(e.getMessage.contains("maxVersionsPerTrigger"), e.getMessage)
  }

  test("byte-paced CDF: cuts inside append commits, rewriting commits admit atomically, exactly once") {
    val base = freshDir("cdfpaced") + "/t"
    val ckpt = freshDir("cdfpaced-ckpt")
    def drainCdf(): Seq[(Long, Seq[(Long, String, Long)])] = {
      val got = mutable.ArrayBuffer.empty[(Long, Seq[(Long, String, Long)])]
      val q = spark.readStream.format("graft-snapshots")
        .option("readChangeFeed", "true")
        .option("changeKey", "id")
        .option("maxBytesPerTrigger", "1") // one file per trigger
        .load(base)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, bid: Long) =>
          val rows = b.select(col("id"), col("_change_type"),
            col("_commit_version")).collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
          got.synchronized { got += ((bid, rows)) }
          ()
        }
        .start()
      q.awaitTermination()
      got.toSeq
    }
    Snapshots.write((1L to 20L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(2), base) // v1: 2 files — the initial snapshot paces too
    Snapshots.append((21L to 30L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(2), base) // v2: 2 files
    val first = drainCdf()
    assert(first.size == 4, s"2+2 files at one per trigger: ${first.map(_._2.size)}")
    assert(first.flatMap(_._2).map(_._1).toSet == (1L to 30L).toSet)
    assert(first.flatMap(_._2).forall(_._2 == "insert"))
    assert(first.flatMap(_._2).map(r => (r._1, r._3)).toMap
      .forall { case (id, cv) => cv == (if (id <= 20) 1L else 2L) },
      "per-commit stamps survive the mid-commit cuts")
    assert(first.flatMap(_._2).size == 30, "exactly once across paced batches")
    assert(drainCdf().isEmpty, "caught-up replay is a no-op")
    // a rewriting commit lands between appends: it must arrive ATOMICALLY
    // as one whole-version batch of update pairs, with the appends around
    // it still paced file-by-file
    Snapshots.updateWhere(spark, base, col("id") === 7L,
      Seq("name" -> org.apache.spark.sql.functions.lit("renamed"))) // v3
    Snapshots.append((31L to 36L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(2), base) // v4: 2 files
    val second = drainCdf()
    assert(second.size == 3, s"rewrite alone + 2 paced files: ${second.map(_._2)}")
    val rewriteBatch = second.find(_._2.exists(_._2 != "insert")).get._2
    assert(rewriteBatch.map(r => (r._1, r._2)).toSet ==
      Set((7L, "update_preimage"), (7L, "update_postimage")))
    assert(rewriteBatch.forall(_._3 == 3L))
    val appended = second.filterNot(_._2.exists(_._2 != "insert"))
    assert(appended.flatMap(_._2).map(_._1).toSet == (31L to 36L).toSet)
    assert(appended.flatMap(_._2).forall(_._3 == 4L))
    assert(drainCdf().isEmpty)
  }

  test("byte-paced CDF composes with branch streaming: the staging chain paces file-by-file, main stays invisible") {
    val base = freshDir("cdfpacedbr") + "/t"
    Snapshots.write((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(2), base) // fork point: 2 files
    Snapshots.createBranch(spark, base, "staging", 1L)
    Snapshots.appendBranch((11L to 16L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(2), base, "staging") // branch commit: 2 files
    // main moves on independently — must never reach the branch feed
    Snapshots.append((91L to 95L).map(i => (i, s"n$i")).toDF("id", "name"), base)
    val got = mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var batches = 0
    val q = spark.readStream.format("graft-snapshots")
      .option("branch", "staging")
      .option("readChangeFeed", "true")
      .option("changeKey", "id")
      .option("maxBytesPerTrigger", "1")
      .load(base)
      .writeStream
      .option("checkpointLocation", freshDir("cdfpacedbr-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += 1
        val rows = b.select(col("id"), col("_commit_version")).collect()
          .map(r => (r.getLong(0), r.getLong(1), 0L))
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    q.awaitTermination()
    assert(batches == 4, s"2+2 branch files at one per trigger, got $batches")
    assert(got.map(_._1).toSet == ((1L to 10L) ++ (11L to 16L)).toSet,
      s"fork snapshot + branch append only — main's 91-95 invisible: ${got.map(_._1).sorted}")
    assert(got.map(r => (r._1, r._2)).toMap.forall {
      case (id, cv) => cv == (if (id <= 10) 1L else 2L) },
      "per-commit stamps through the paced branch cuts")
  }

  test("a large file splits into filesMaxPartitionBytes-sized partitions") {
    val base = freshDir("split") + "/t"
    Snapshots.write((1L to 5000L).map(i => (i, s"name-padding-$i"))
      .toDF("id", "name").coalesce(1), base)
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "8192")
    try {
      var parts = 0
      val q = spark.readStream.format("graft-snapshots").load(base)
        .writeStream
        .option("checkpointLocation", freshDir("split-ckpt"))
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          parts = math.max(parts, b.rdd.getNumPartitions)
          assert(b.count() == 5000L)
          ()
        }
        .start()
      q.awaitTermination()
      assert(parts > 1, s"a single large file must split, got $parts partition(s)")
    } finally spark.conf.set(key, prev)
  }
}
