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
      // one more destructive round on the source
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
}
