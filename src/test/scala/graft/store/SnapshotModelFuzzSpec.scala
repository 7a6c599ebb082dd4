package graft.store

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Model-based lifecycle fuzz of the snapshot store's verb algebra: a
 * seeded random sequence of DML + maintenance verbs runs against a real
 * table AND an in-memory model (content map + per-version history +
 * pending-delete state), with the table checked against the model after
 * EVERY verb, random retained versions time-travel-checked along the
 * way, and a mid-trial shallow clone checked for isolation at the end.
 *
 * The single-verb suites prove each verb right in isolation; this sweep
 * proves the INTERACTIONS — eq-delete covered-version scoping across
 * later appends, rollback resurrecting a pending-delete state, expiry
 * retention vs covered versions, CoW after MoR after materialize — stay
 * right under arbitrary interleaving. Verbs whose preconditions the
 * model knows to be unsatisfied (compact under pending deletes, expiry
 * that would strand a covered version) are re-drawn, mirroring how an
 * operator sequences them.
 */
class SnapshotModelFuzzSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private case class Entry(content: Map[Long, Long], eqCov: Set[Long],
                           pending: Boolean)

  test("randomized verb interleavings match the model at every step") {
    val rnd = new scala.util.Random(42180L) // fixed seed: deterministic
    (1 to 4).foreach { trial =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-modelfuzz$trial").toString
      val base = s"$root/t"
      var nextId = 1L
      var graveyard = Set.empty[Long]
      var entries = Map.empty[Long, Entry]
      var headV = 0L
      def head: Entry = entries(headV)

      def freshRows(n: Int): Seq[(Long, Long)] = {
        val resurrect =
          if (graveyard.nonEmpty && rnd.nextInt(3) == 0)
            Seq(graveyard.head -> rnd.nextLong(100000))
          else Seq.empty
        resurrect.foreach { case (id, _) => graveyard -= id }
        val fresh = (0 until n).map { _ =>
          val id = nextId; nextId += 1
          id -> rnd.nextLong(100000)
        }
        resurrect ++ fresh
      }
      def df(rows: Seq[(Long, Long)]) =
        rows.toDF("id", "x").repartition(1 + rnd.nextInt(3))

      def record(v: Long, e: Entry): Unit =
        if (v != headV) { entries += v -> e; headV = v }

      def checkHead(tag: String): Unit = {
        val rows = Snapshots.read(spark, base).select(col("id"), col("x"))
          .as[(Long, Long)].collect()
        assert(rows.length == head.content.size &&
          rows.toMap == head.content,
          s"trial $trial after $tag@v$headV: table=${rows.sorted.take(20)}… " +
            s"model=${head.content.toSeq.sorted.take(20)}…")
      }

      // v1: initial write
      val init = freshRows(15 + rnd.nextInt(15))
      Snapshots.write(df(init), base)
      record(1L, Entry(init.toMap, Set.empty, pending = false))
      checkHead("write")

      (1 to 16).foreach { step =>
        val op = rnd.nextInt(10)
        op match {
          case 0 | 1 => // append (sometimes resurrecting a deleted id)
            val rows = freshRows(4 + rnd.nextInt(12))
            val v = Snapshots.append(df(rows), base)
            record(v, head.copy(content = head.content ++ rows))
          case 2 if !head.pending => // CoW delete
            val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
            val v = Snapshots.deleteWhere(spark, base, col("id") % m === r)
            val (dead, kept) = head.content.partition(_._1 % m == r)
            graveyard ++= dead.keys
            record(v, head.copy(content = kept))
          case 3 if !head.pending => // CoW update
            val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
            val d = rnd.nextLong(1000)
            val v = Snapshots.updateWhere(spark, base, col("id") % m === r,
              Seq("x" -> (col("x") + lit(d))))
            record(v, head.copy(content = head.content.map {
              case (id, x) if id % m == r => id -> (x + d)
              case kv => kv
            }))
          case 4 => // MoR positional delete
            val m = 3 + rnd.nextInt(4); val r = rnd.nextInt(m)
            val prior = headV
            val v = Snapshots.deleteWhereMoR(spark, base, col("id") % m === r)
            val (dead, kept) = head.content.partition(_._1 % m == r)
            graveyard ++= dead.keys
            if (v != prior)
              record(v, head.copy(content = kept, pending = true))
          case 5 => // equality delete on sampled keys
            val keys = rnd.shuffle(head.content.keys.toSeq)
              .take(1 + rnd.nextInt(5))
            if (keys.nonEmpty) {
              val prior = headV
              val v = Snapshots.deleteByKey(spark, base, keys.toDF("id"))
              graveyard ++= keys
              if (v != prior)
                record(v, Entry(head.content -- keys,
                  head.eqCov + prior, pending = true))
            }
          case 6 => // fold pending deletes away
            val prior = headV
            val v = Snapshots.materializeDeletes(spark, base)
            if (v != prior)
              record(v, Entry(head.content, Set.empty, pending = false))
          case 7 if !head.pending => // compact (content-invariant)
            val prior = headV
            val v = Snapshots.compact(spark, base, smallBytes = 1L << 20)
            if (v != prior) record(v, head)
          case 8 => // rollback to a random retained version
            val targets = entries.keys.toSeq.sorted
            val to = targets(rnd.nextInt(targets.size))
            val v = Snapshots.rollback(spark, base, to)
            record(v, entries(to))
          case 9 => // expire + vacuum, only when no retained manifest
            // would reference an expired covered version
            val keep = 1 + rnd.nextInt(3)
            val retained = entries.keys.toSeq.sorted
            val cut = retained.drop(math.max(0, retained.size - keep))
            val safe = cut.forall(v =>
              entries(v).eqCov.forall(cv => cut.contains(cv)))
            if (safe && retained.size > keep) {
              val droppedV = Snapshots.expire(spark, base, keep)
              assert(droppedV.toSet == retained.dropRight(keep).toSet)
              entries --= droppedV
              Snapshots.vacuum(spark, base, txnTtlMs = 0L)
              // an expired version must refuse, not misread
              intercept[IllegalArgumentException] {
                Snapshots.read(spark, base, Some(droppedV.head)).collect()
              }
            }
          case _ => () // precondition unsatisfied: skip the draw
        }
        checkHead(s"op$op/step$step")
        if (step % 4 == 0) { // time travel on a random retained version
          val vs = entries.keys.toSeq.sorted
          val v = vs(rnd.nextInt(vs.size))
          val rows = Snapshots.read(spark, base, Some(v))
            .select(col("id"), col("x")).as[(Long, Long)].collect()
          assert(rows.length == entries(v).content.size &&
            rows.toMap == entries(v).content,
            s"trial $trial time travel v$v diverged from the model")
        }
      }

      // epilogue: fork the final state and prove clone isolation through
      // one more destructive round on the source (epilogue-1)
      if (!head.pending) {
        val dst = s"$root/clone"
        Snapshots.shallowClone(spark, base, dst)
        val forked = head.content
        Snapshots.write(df(freshRows(5)), base)
        Snapshots.expire(spark, base, keep = 1)
        Snapshots.vacuum(spark, base, txnTtlMs = 0L)
        val rows = Snapshots.read(spark, dst).select(col("id"), col("x"))
          .as[(Long, Long)].collect()
        assert(rows.length == forked.size && rows.toMap == forked,
          s"trial $trial: clone diverged after source GC")
      }
    }
  }

  test("randomized branch interleavings: fork, append, publish, drop under main expiry") {
    val rnd = new scala.util.Random(77180L) // fixed seed: deterministic
    (1 to 3).foreach { trial =>
      val base = java.nio.file.Files
        .createTempDirectory(s"graft-branchfuzz$trial").toString + "/t"
      var nextId = 1L
      def freshRows(n: Int): Seq[(Long, Long)] = (0 until n).map { _ =>
        val id = nextId; nextId += 1
        id -> rnd.nextLong(100000)
      }
      def df(rows: Seq[(Long, Long)]) =
        rows.toDF("id", "x").repartition(1 + rnd.nextInt(3))
      def contentOf(frame: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        frame.select(col("id"), col("x")).as[(Long, Long)].collect().toMap

      var mainC: Map[Long, Long] = Map.empty
      var branchC: Option[Map[Long, Long]] = None
      var headV = 0L
      val init = freshRows(10 + rnd.nextInt(10))
      headV = Snapshots.write(df(init), base)
      mainC = init.toMap

      (1 to 14).foreach { step =>
        rnd.nextInt(9) match {
          case 0 | 1 => // main append
            val rows = freshRows(3 + rnd.nextInt(8))
            headV = Snapshots.append(df(rows), base)
            mainC = mainC ++ rows
          case 2 if branchC.isEmpty => // fork from the main head
            Snapshots.createBranch(spark, base, "dev", headV)
            branchC = Some(mainC)
          case 3 | 4 if branchC.nonEmpty => // branch append
            val rows = freshRows(2 + rnd.nextInt(6))
            Snapshots.appendBranch(df(rows), base, "dev")
            branchC = branchC.map(_ ++ rows)
          case 5 if branchC.nonEmpty => // publish: main fast-forwards
            headV = Snapshots.fastForward(spark, base, "dev")
            mainC = branchC.get
          case 6 if branchC.nonEmpty => // abandon the audit branch
            Snapshots.dropBranch(spark, base, "dev")
            branchC = None
          case 7 => // retention on main must never strand the branch
            Snapshots.expire(spark, base, keep = 1 + rnd.nextInt(2))
            Snapshots.vacuum(spark, base, txnTtlMs = 0L)
          case 8 => // compact main (content-invariant)
            headV = Snapshots.compact(spark, base, smallBytes = 1L << 20)
          case _ => () // precondition unsatisfied: skip the draw
        }
        val m = contentOf(Snapshots.read(spark, base))
        assert(m == mainC, s"trial $trial step $step: main diverged")
        branchC.foreach { bc =>
          val b = contentOf(Snapshots.readBranch(spark, base, "dev"))
          assert(b == bc, s"trial $trial step $step: branch diverged")
        }
      }
    }
  }

  test("randomized stream pacing: paced unions and CDF replays reconstruct the table") {
    import org.apache.spark.sql.streaming.Trigger
    val rnd = new scala.util.Random(90180L) // fixed seed: deterministic
    (1 to 3).foreach { trial =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-streamfuzz$trial").toString
      var nextId = 1L
      def freshRows(n: Int): Seq[(Long, Long)] = (0 until n).map { _ =>
        val id = nextId; nextId += 1
        id -> rnd.nextLong(100000)
      }
      def df(rows: Seq[(Long, Long)]) =
        rows.toDF("id", "x").repartition(1 + rnd.nextInt(3))

      def drain(base: String, ck: String, opts: Map[String, String])
          : Seq[org.apache.spark.sql.Row] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
        val q = opts.foldLeft(spark.readStream.format("graft-snapshots")) {
            case (r, (k, v)) => r.option(k, v)
          }
          .load(base)
          .writeStream
          .option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            val rows = b.collect()
            out.synchronized { out ++= rows }
            ()
          }
          .start()
        q.awaitTermination()
        out.toSeq
      }

      // append-only table, randomly paced plain stream: the batch union
      // must be the table, a caught-up re-drain a no-op, and a
      // post-checkpoint commit must arrive alone
      val base = s"$root/t"
      var expected = Map.empty[Long, Long]
      val nCommits = 3 + rnd.nextInt(3)
      (1 to nCommits).foreach { i =>
        val rows = freshRows(5 + rnd.nextInt(10))
        if (i == 1) Snapshots.write(df(rows), base)
        else Snapshots.append(df(rows), base)
        expected ++= rows
      }
      val opts = rnd.nextInt(3) match {
        case 0 => Map("maxBytesPerTrigger" -> "1") // one file per trigger
        case 1 => Map("maxFilesPerTrigger" -> "1")
        case 2 => Map("maxBytesPerTrigger" ->
          (500 + rnd.nextInt(3000)).toString) // mid-commit cuts
      }
      val got = drain(base, s"$root/ck", opts)
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("x"))
      assert(got.size == expected.size && got.toMap == expected,
        s"trial $trial opts=$opts: paced union diverged")
      assert(drain(base, s"$root/ck", opts).isEmpty,
        s"trial $trial: caught-up re-drain delivered rows")
      val late = freshRows(4)
      Snapshots.append(df(late), base)
      val inc = drain(base, s"$root/ck", opts)
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("x"))
      assert(inc.toMap == late.toMap,
        s"trial $trial: incremental drain was not exactly the new commit")

      // CDF over appends + CoW deletes, randomly paced: replaying the
      // feed in commit order must reconstruct the final table
      val base2 = s"$root/t2"
      var model = Map.empty[Long, Long]
      Snapshots.write(df(freshRows(8)), base2)
      model = contentOfTable(base2)
      (1 to 3 + rnd.nextInt(3)).foreach { _ =>
        if (rnd.nextInt(3) == 0 && model.nonEmpty) {
          val m = 2 + rnd.nextInt(3); val r = rnd.nextInt(m)
          Snapshots.deleteWhere(spark, base2, col("id") % m === r)
          model = model.filter(_._1 % m != r)
        } else {
          val rows = freshRows(3 + rnd.nextInt(8))
          Snapshots.append(df(rows), base2)
          model ++= rows
        }
      }
      val cdfOpts = Map("readChangeFeed" -> "true", "changeKey" -> "id") ++
        (if (rnd.nextBoolean()) Map("maxBytesPerTrigger" -> "1") else Map.empty)
      val feed = drain(base2, s"$root/ck2", cdfOpts)
      val replay = scala.collection.mutable.Map.empty[Long, Long]
      feed.sortBy(r => (r.getAs[Long]("_commit_version"),
          r.getAs[String]("_change_type"))).foreach { r =>
        r.getAs[String]("_change_type") match {
          case "insert" => replay(r.getAs[Long]("id")) = r.getAs[Long]("x")
          case "delete" => replay.remove(r.getAs[Long]("id"))
          case other => fail(s"unexpected change type $other")
        }
      }
      assert(replay.toMap == model,
        s"trial $trial: CDF replay did not reconstruct the table")
      assert(drain(base2, s"$root/ck2", cdfOpts).isEmpty,
        s"trial $trial: caught-up CDF re-drain delivered rows")
    }
  }

  private def contentOfTable(base: String): Map[Long, Long] =
    Snapshots.read(spark, base).select(col("id"), col("x"))
      .as[(Long, Long)].collect().toMap

  test("randomized clone lifecycles: source and fork evolve independently under GC on both sides") {
    val rnd = new scala.util.Random(31180L) // fixed seed: deterministic
    (1 to 3).foreach { trial =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-clonefuzz$trial").toString
      val src = s"$root/src"
      val dst = s"$root/dst"
      var nextId = 1L
      def freshRows(n: Int): Seq[(Long, Long)] = (0 until n).map { _ =>
        val id = nextId; nextId += 1
        id -> rnd.nextLong(100000)
      }
      def df(rows: Seq[(Long, Long)]) =
        rows.toDF("id", "x").repartition(1 + rnd.nextInt(3))

      var srcC: Map[Long, Long] = Map.empty
      var dstC: Map[Long, Long] = Map.empty
      var dstPending = false
      var diverged = false // content differs from the source's head
      var localized = false // deepened: head no longer all-external
      val init = freshRows(12 + rnd.nextInt(10))
      Snapshots.write(df(init), src)
      srcC = init.toMap
      Snapshots.shallowClone(spark, src, dst)
      dstC = srcC

      (1 to 14).foreach { step =>
        rnd.nextInt(10) match {
          case 0 => // source append
            val rows = freshRows(3 + rnd.nextInt(8))
            Snapshots.append(df(rows), src); srcC ++= rows
          case 1 => // source CoW delete
            val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
            Snapshots.deleteWhere(spark, src, col("id") % m === r)
            srcC = srcC.filter(_._1 % m != r)
          case 2 => // source retention: clone-referenced files must survive
            Snapshots.expire(spark, src, keep = 1 + rnd.nextInt(2))
            Snapshots.vacuum(spark, src, txnTtlMs = 0L)
          case 3 | 4 => // clone append (diverges)
            val rows = freshRows(3 + rnd.nextInt(8))
            Snapshots.append(df(rows), dst)
            dstC ++= rows; diverged = true
          case 5 => // clone MoR delete over source-owned + local files
            val m = 3 + rnd.nextInt(3); val r = rnd.nextInt(m)
            val before = dstC
            Snapshots.deleteWhereMoR(spark, dst, col("id") % m === r)
            dstC = dstC.filter(_._1 % m != r)
            if (dstC != before) { dstPending = true; diverged = true }
          case 6 if dstPending => // fold the clone's deletes
            Snapshots.materializeDeletes(spark, dst)
            dstPending = false
          case 7 if !dstPending => // localize whatever the head references
            Snapshots.deepenClone(spark, dst); localized = true
          // refresh needs an all-external head: deepening localizes it,
          // so a localized mirror refuses refresh even when contents match
          case 8 if !diverged && !localized && !dstPending => // re-sync the mirror
            Snapshots.refreshClone(spark, src, dst)
            dstC = srcC
          case 9 if !dstPending => // clone-side compact: rewrites small
            // external files into local merged ones — localizing, like
            // deepen, for the refresh gate
            Snapshots.compact(spark, dst, smallBytes = 1L << 20)
            localized = true
          case _ => () // precondition unsatisfied: skip the draw
        }
        assert(contentOfTable(src) == srcC,
          s"trial $trial step $step: source diverged from the model")
        assert(contentOfTable(dst) == dstC,
          s"trial $trial step $step: clone diverged from the model")
      }
      // wind-down: localize, retire ref-holders, detach, and the source's
      // next vacuum proceeds as if the fork never happened
      if (dstPending) Snapshots.materializeDeletes(spark, dst)
      Snapshots.deepenClone(spark, dst)
      Snapshots.expire(spark, dst, keep = 1)
      assert(Snapshots.detachClone(spark, src, dst))
      Snapshots.vacuum(spark, src, txnTtlMs = 0L)
      assert(contentOfTable(dst) == dstC, s"trial $trial: detach broke the clone")
      assert(contentOfTable(src) == srcC, s"trial $trial: detach broke the source")
    }
  }

  test("randomized schema evolution: adds, renames, drops, physicalize interleaved with DML vs the model") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val rnd = new scala.util.Random(55180L) // fixed seed: deterministic
    (1 to 3).foreach { trial =>
      val base = java.nio.file.Files
        .createTempDirectory(s"graft-schemafuzz$trial").toString + "/t"
      var nextId = 1L
      var nextCol = 1
      case class E(rows: Map[Long, Map[String, Long]], cols: Vector[String],
                   pending: Boolean)
      var entries = Map.empty[Long, E]
      var headV = 0L
      def head: E = entries(headV)
      // columns added since the last materializeSchema keep a pending
      // AddOp for some vintages — rename/drop only touch settled columns
      var addPending = Set.empty[String]

      def freshRows(n: Int, cols: Vector[String])
          : Seq[(Long, Map[String, Long])] = (0 until n).map { _ =>
        val id = nextId; nextId += 1
        id -> cols.map(c => c -> rnd.nextLong(100000)).toMap
      }
      def df(rows: Seq[(Long, Map[String, Long])], cols: Vector[String]) = {
        val schema = StructType(StructField("id", LongType, nullable = false) +:
          cols.map(c => StructField(c, LongType, nullable = true)))
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.map { case (id, m) =>
            Row.fromSeq(id +: cols.map(m(_))) }, 1 + rnd.nextInt(3)),
          schema)
      }
      def record(v: Long, e: E): Unit =
        if (v != headV) { entries += v -> e; headV = v }
      def checkAgainst(frame: org.apache.spark.sql.DataFrame, e: E,
                       tag: String): Unit = {
        assert(frame.columns.toSet == (e.cols :+ "id").toSet,
          s"trial $trial $tag: schema=${frame.columns.toSeq} model=${e.cols}")
        val got = frame.collect().map { r =>
          r.getAs[Long]("id") -> e.cols.map(c => c -> r.getAs[Long](c)).toMap
        }
        assert(got.length == e.rows.size && got.toMap == e.rows,
          s"trial $trial $tag: content diverged")
      }

      val init = freshRows(10 + rnd.nextInt(10), Vector("c0"))
      Snapshots.write(df(init, Vector("c0")), base)
      record(1L, E(init.toMap, Vector("c0"), pending = false))

      (1 to 14).foreach { step =>
        rnd.nextInt(9) match {
          case 0 | 1 => // append in the CURRENT logical shape
            val rows = freshRows(3 + rnd.nextInt(8), head.cols)
            val v = Snapshots.append(df(rows, head.cols), base)
            record(v, head.copy(rows = head.rows ++ rows))
          case 2 => // ADD COLUMN with a declared default: every pre-add
            // vintage must read the default from here on
            val c = s"c$nextCol"; nextCol += 1
            val d = rnd.nextLong(1000)
            val v = Snapshots.addColumn(spark, base, c, LongType,
              default = Some(d.toString))
            addPending += c
            record(v, head.copy(
              rows = head.rows.view.mapValues(_ + (c -> d)).toMap,
              cols = head.cols :+ c))
          case 3 if head.cols.exists(!addPending(_)) => // RENAME a settled column
            val from = {
              val settled = head.cols.filter(!addPending(_))
              settled(rnd.nextInt(settled.size))
            }
            val to = s"r$nextCol"; nextCol += 1
            val v = Snapshots.renameColumn(spark, base, from, to)
            record(v, E(
              head.rows.view.mapValues(m => (m - from) + (to -> m(from))).toMap,
              head.cols.map(c => if (c == from) to else c),
              pending = true))
          case 4 if head.cols.size >= 2 &&
              head.cols.exists(!addPending(_)) => // DROP a settled column
            val settled = head.cols.filter(!addPending(_))
            val c = settled(rnd.nextInt(settled.size))
            val v = Snapshots.dropColumn(spark, base, c)
            record(v, E(head.rows.view.mapValues(_ - c).toMap,
              head.cols.filterNot(_ == c), pending = true))
          case 5 => // physicalize: rewrite mixed-vintage files, clear ops
            val prior = headV
            val v = Snapshots.materializeSchema(spark, base)
            addPending = Set.empty
            if (v != prior) record(v, head.copy(pending = false))
          case 6 if !head.pending => // CoW delete under the evolved schema
            val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
            val v = Snapshots.deleteWhere(spark, base, col("id") % m === r)
            record(v, head.copy(rows = head.rows.filter(_._1 % m != r)))
          case 7 => // retention (no eq-deletes here: always safe)
            val keep = 1 + rnd.nextInt(2)
            val retained = entries.keys.toSeq.sorted
            if (retained.size > keep) {
              val droppedV = Snapshots.expire(spark, base, keep)
              entries --= droppedV
              Snapshots.vacuum(spark, base, txnTtlMs = 0L)
            }
          case 8 if !head.pending => // compact mixed-vintage files
            val prior = headV
            val v = Snapshots.compact(spark, base, smallBytes = 1L << 20)
            if (v != prior) record(v, head)
          case _ => () // precondition unsatisfied: skip the draw
        }
        checkAgainst(Snapshots.read(spark, base), head, s"step$step")
        if (step % 4 == 0) { // time travel shows THAT version's schema
          val vs = entries.keys.toSeq.sorted
          val v = vs(rnd.nextInt(vs.size))
          checkAgainst(Snapshots.read(spark, base, Some(v)), entries(v),
            s"timetravel-v$v")
        }
      }
    }
  }

  test("six concurrent writers with disjoint keys serialize: no lost updates, no torn manifests") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-concfuzz").toString + "/t"
    Snapshots.write(Seq((0L, "init")).toDF("id", "s"), base)
    val nThreads = 6
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    // per-thread key spaces are disjoint, so the serializable effects
    // commute and the final content is deterministic under ANY
    // interleaving. Verb classes are phase-barriered: merges refuse (by
    // design, not as a retryable conflict) while another writer's MoR
    // delete is pending, so appends race appends, merges race merges,
    // deletes race deletes — the realistic multi-writer shape.
    val gates = Array.fill(3)(new java.util.concurrent.CountDownLatch(nThreads))
    def phase(i: Int): Unit = { gates(i).countDown(); gates(i).await() }
    def worker(t: Int) = scala.concurrent.Future {
      val b0 = t * 1000L
      phase(0)
      Snapshots.withConflictRetry(40) {
        Snapshots.append(
          Seq((b0 + 1, s"a$t"), (b0 + 2, s"b$t")).toDF("id", "s"), base)
      }
      phase(1)
      Snapshots.withConflictRetry(40) {
        Snapshots.mergeInto(spark, base,
          Seq((b0 + 1, s"A$t"), (b0 + 3, s"c$t")).toDF("id", "s"), "id")
      }
      phase(2)
      Snapshots.withConflictRetry(40) {
        Snapshots.deleteByKey(spark, base, Seq(b0 + 2).toDF("id"))
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence((1 to nThreads).map(worker)),
      scala.concurrent.duration.Duration(300, "s"))
    pool.shutdown()
    // 18 racing commits landed as a gapless serial chain
    val vs = Snapshots.versions(spark, base)
    assert(vs == (1L to (1 + 3L * nThreads)),
      s"expected a gapless serial version chain, got $vs")
    val expected = Map(0L -> "init") ++ (1 to nThreads).flatMap { t =>
      val b0 = t * 1000L
      Seq(b0 + 1 -> s"A$t", b0 + 3 -> s"c$t")
    }.toMap
    val rows = Snapshots.read(spark, base).as[(Long, String)].collect()
    assert(rows.length == expected.size && rows.toMap == expected,
      s"lost or phantom updates: ${rows.sorted.toSeq}")
    // no torn manifest: every referenced file of every version exists
    vs.foreach { v =>
      Snapshots.manifestFiles(spark, base, v).foreach { rel =>
        assert(new java.io.File(s"$base/$rel").exists(), s"v=$v missing $rel")
      }
    }
    // folding the racing eq-deletes changes nothing
    Snapshots.materializeDeletes(spark, base)
    assert(Snapshots.read(spark, base).as[(Long, String)]
      .collect().toMap == expected)
  }

  test("randomized MatView maintenance: the view equals a direct recompute after every refresh") {
    val rnd = new scala.util.Random(66180L) // fixed seed: deterministic
    (1 to 3).foreach { trial =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-mvfuzz$trial").toString
      val src = s"$root/src"
      val mv = s"$root/mv"
      var nextId = 1L
      def freshRows(n: Int): Seq[(Long, Long, Long)] = (0 until n).map { _ =>
        val id = nextId; nextId += 1
        (id, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong)
      }
      def df(rows: Seq[(Long, Long, Long)]) =
        rows.toDF("id", "g", "v").repartition(1 + rnd.nextInt(3))

      Snapshots.write(df(freshRows(15 + rnd.nextInt(10))), src)
      MatView.create(spark, src, mv, Seq("g"), "v")

      def checkView(tag: String): Unit = {
        val view = MatView.read(spark, mv)
          .select(col("g"), col("n"), col("total"))
        val direct = Snapshots.read(spark, src).groupBy(col("g"))
          .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
            org.apache.spark.sql.functions.sum(col("v").cast("decimal(18,2)"))
              .cast("decimal(28,2)").as("total"))
        assert(view.except(direct).isEmpty && direct.except(view).isEmpty,
          s"trial $trial $tag: view != direct recompute")
      }
      checkView("create")

      (1 to 10).foreach { step =>
        rnd.nextInt(6) match {
          case 0 | 1 => // append-only delta: the O(delta) refresh path
            Snapshots.append(df(freshRows(3 + rnd.nextInt(8))), src)
          case 2 => // CoW delete: forces the cdcKey rewrite-chain fallback
            val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
            Snapshots.deleteWhere(spark, src, col("id") % m === r)
          case 3 => // CoW update: group totals move, counts stay
            val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
            Snapshots.updateWhere(spark, src, col("id") % m === r,
              Seq("v" -> (col("v") + lit(7L))))
          case 4 => // layout churn between anchor and head
            Snapshots.compact(spark, src, smallBytes = 1L << 20)
          case 5 => // source retention: the view's PINNED anchor survives
            Snapshots.expire(spark, src, keep = 1 + rnd.nextInt(2))
            Snapshots.vacuum(spark, src, txnTtlMs = 0L)
          case _ => ()
        }
        if (rnd.nextInt(3) != 0) { // refresh on most steps, not all
          MatView.refresh(spark, src, mv, Seq("g"), "v", cdcKey = Some("id"))
          checkView(s"step$step")
        }
      }
      MatView.refresh(spark, src, mv, Seq("g"), "v", cdcKey = Some("id"))
      checkView("final")
    }
  }
}
