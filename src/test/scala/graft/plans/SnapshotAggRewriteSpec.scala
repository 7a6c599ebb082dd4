package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LocalTableScanExec
import org.apache.spark.sql.functions.{avg, col, count, lit, max, min}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.store.{CountingLocalFs, Snapshots}

/** The opt-in metadata-answered aggregate rule: plan surgery, zero data
  * IO on the provable path, bit-identical results, conservative declines. */
class SnapshotAggRewriteSpec extends AnyFunSuite {

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

  private def isMetadataAnswered(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.collectFirst {
      case l: LocalTableScanExec => l
    }.nonEmpty

  test("count/min/max answer from metadata: LocalTableScan, zero data files opened, bit-identical") {
    withExtSession { s =>
      import s.implicits._
      s.sparkContext.hadoopConfiguration
        .set("fs.cntfs.impl", classOf[CountingLocalFs].getName)
      val root = java.nio.file.Files.createTempDirectory("graft-aggr1")
      val base = s"cntfs:$root/t"
      Snapshots.write(
        (1L to 900L).map(i =>
          (i, s"v$i", i * 0.5, if (i % 3 == 0) null else s"u$i"))
          .toDF("id", "s", "x", "maybe")
          .repartitionByRange(6, col("id")),
        base, statsKey = Some("id"))
      Snapshots.writeStatsSidecars(s, base, Seq("x", "s"))
      val t = Snapshots.read(s, base)
      // reference values with the rule OFF
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
      val refFiltered = t.filter(col("id") <= 300L)
        .agg(count(lit(1)).as("n")).collect().toSeq
      val refGlobal = t.agg(count(lit(1)).as("n"),
        min(col("id")).as("mn"), max(col("id")).as("mx"),
        min(col("x")).as("xmn"), max(col("s")).as("smx")).collect().toSeq
      val refNotNull = t.agg(count(col("maybe")).as("nm")).collect().toSeq
      assert(!isMetadataAnswered(t.agg(count(lit(1)))))
      s.conf.set(SnapshotAggRewrite.EnabledKey, "true")
      CountingLocalFs.reset()
      val qf = Snapshots.read(s, base).filter(col("id") <= 300L)
        .agg(count(lit(1)).as("n"))
      assert(isMetadataAnswered(qf), "filtered count must rewrite")
      assert(qf.collect().toSeq == refFiltered)
      val qg = Snapshots.read(s, base)
        .agg(count(lit(1)).as("n"),
          min(col("id")).as("mn"), max(col("id")).as("mx"),
          min(col("x")).as("xmn"), max(col("s")).as("smx"))
      assert(isMetadataAnswered(qg), "global count/min/max must rewrite")
      assert(qg.collect().toSeq == refGlobal)
      // the whole provable battery above opened ZERO data files
      assert(CountingLocalFs.openedParquet.isEmpty,
        s"metadata-answered aggregates opened: ${CountingLocalFs.openedParquet}")
      // count(col) on a column with no null-count metadata is the HYBRID
      // path: still rewritten, still exact — it scans what it must
      val qn = Snapshots.read(s, base).agg(count(col("maybe")).as("nm"))
      assert(isMetadataAnswered(qn))
      assert(qn.collect().toSeq == refNotNull)
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
    }
  }

  test("boundary predicates stay exact: unprovable files scan, result still bit-identical") {
    withExtSession { s =>
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-aggr2").toString + "/t"
      Snapshots.write(
        (1L to 400L).map(i => (i, s"v$i")).toDF("id", "s")
          .repartitionByRange(4, col("id")),
        base, statsKey = Some("id"))
      s.conf.set(SnapshotAggRewrite.EnabledKey, "true")
      // 137 cuts through a file: metadata proves the interior, scans the
      // boundary file — exactness over purity
      val q = Snapshots.read(s, base).filter(col("id") <= 137L)
        .agg(count(lit(1)).as("n"))
      assert(isMetadataAnswered(q))
      assert(q.collect().head.getLong(0) == 137L)
      // residual non-stats conjunct: countWhere scans boundary files for it
      val q2 = Snapshots.read(s, base)
        .filter(col("id") <= 110L && col("s").endsWith("7"))
        .agg(count(lit(1)).as("n"))
      assert(isMetadataAnswered(q2))
      assert(q2.collect().head.getLong(0) == 11L) // 7,17,...,107
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
    }
  }

  test("SQL surface: a temp view's COUNT(*) WHERE answers from metadata") {
    withExtSession { s =>
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-aggr3").toString + "/t"
      Snapshots.write(
        (1L to 500L).map(i => (i, i * 2.0)).toDF("id", "x")
          .repartitionByRange(5, col("id")),
        base, statsKey = Some("id"))
      Snapshots.read(s, base).createOrReplaceTempView("agg_rewrite_v")
      s.conf.set(SnapshotAggRewrite.EnabledKey, "true")
      val q = s.sql("SELECT count(*) AS n FROM agg_rewrite_v WHERE id > 400")
      assert(isMetadataAnswered(q), "SQL count must rewrite")
      assert(q.collect().head.getLong(0) == 100L)
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
    }
  }

  test("SUM/AVG answer from sum sidecars: zero data IO when covered, exact hybrid otherwise") {
    withExtSession { s =>
      import s.implicits._
      s.sparkContext.hadoopConfiguration
        .set("fs.cntfs.impl", classOf[CountingLocalFs].getName)
      val root = java.nio.file.Files.createTempDirectory("graft-aggr5")
      val base = s"cntfs:$root/t"
      Snapshots.write(
        (1L to 600L).map(i =>
          (i, i * 3L, BigDecimal(i).setScale(2) * 0.25,
            if (i % 4 == 0) null else java.lang.Long.valueOf(i)))
          .toDF("id", "v", "dec", "maybe")
          .repartitionByRange(4, col("id")),
        base, statsKey = Some("id"))
      Snapshots.writeSumSidecars(s, base, Seq("v", "dec", "maybe"))
      // min ≥ 0 proofs: SUM/AVG only rewrite on provably-non-negative
      // columns (partials monotone → no overflow in ANY eval mode)
      Snapshots.writeStatsSidecars(s, base, Seq("v", "dec", "maybe"))
      val t = Snapshots.read(s, base)
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
      val ref = t.agg(
        org.apache.spark.sql.functions.sum(col("v")).as("sv"),
        org.apache.spark.sql.functions.sum(col("dec")).as("sd"),
        org.apache.spark.sql.functions.sum(col("maybe")).as("sm"),
        org.apache.spark.sql.functions.avg(col("v")).as("av")).collect().toSeq
      s.conf.set(SnapshotAggRewrite.EnabledKey, "true")
      CountingLocalFs.reset()
      val q = Snapshots.read(s, base).agg(
        org.apache.spark.sql.functions.sum(col("v")).as("sv"),
        org.apache.spark.sql.functions.sum(col("dec")).as("sd"),
        org.apache.spark.sql.functions.sum(col("maybe")).as("sm"),
        org.apache.spark.sql.functions.avg(col("v")).as("av"))
      assert(isMetadataAnswered(q), "covered SUM/AVG must rewrite")
      assert(q.collect().toSeq == ref, "bit-identical to the aggregation scan")
      assert(CountingLocalFs.openedParquet.isEmpty,
        s"covered sums opened: ${CountingLocalFs.openedParquet}")
      // append with bounds coverage but WITHOUT a sum sidecar: the proof
      // (min ≥ 0 everywhere) holds, so the hybrid path scans only the new
      // file for its sum contribution — no decline and no full scan.
      // Without bounds on the new file the rewrite correctly DECLINES
      // (global non-negativity can't be proven for rows it can't see).
      Snapshots.append(Seq((601L, 1803L, BigDecimal(150.25),
        java.lang.Long.valueOf(601L))).toDF("id", "v", "dec", "maybe"), base)
      assert(!isMetadataAnswered(Snapshots.read(s, base)
        .agg(org.apache.spark.sql.functions.sum(col("v")))),
        "unproven non-negativity must decline")
      Snapshots.writeStatsSidecars(s, base, Seq("v"))
      val q2 = Snapshots.read(s, base)
        .agg(org.apache.spark.sql.functions.sum(col("v")).as("sv"))
      assert(isMetadataAnswered(q2))
      assert(q2.collect().head.getLong(0) ==
        (1L to 600L).map(_ * 3L).sum + 1803L)
      // AVG without a non-negativity proof declines (FP-order exactness
      // cannot be established)
      val neg = java.nio.file.Files.createTempDirectory("graft-aggr5n").toString + "/t"
      Snapshots.write((1L to 50L).map(i => (i, i - 25L)).toDF("id", "w"), neg)
      Snapshots.writeSumSidecars(s, neg, Seq("w"))
      val q3 = Snapshots.read(s, neg)
        .agg(org.apache.spark.sql.functions.avg(col("w")))
      assert(!isMetadataAnswered(q3), "AVG without min>=0 proof must decline")
      // SUM over double always declines (order-dependent)
      val q4 = Snapshots.read(s, neg)
        .agg(org.apache.spark.sql.functions.sum(col("w").cast("double")))
      assert(!isMetadataAnswered(q4), "double sum must decline")
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
    }
  }

  test("SIGNED SUM/AVG answer under the |partial-sum| bound; near-overflow declines") {
    withExtSession { s =>
      import s.implicits._
      s.sparkContext.hadoopConfiguration
        .set("fs.cntfs.impl", classOf[CountingLocalFs].getName)
      val root = java.nio.file.Files.createTempDirectory("graft-aggr6")
      val base = s"cntfs:$root/t"
      // a SIGNED column (account-delta shape): non-negativity fails, the
      // metaAbsSumBound proof (Σ rows·max|bounds| fits the accumulator)
      // admits it
      Snapshots.write(
        (1L to 400L).map(i => (i, i - 200L)).toDF("id", "delta")
          .repartitionByRange(4, col("id")),
        base, statsKey = Some("id"))
      Snapshots.writeSumSidecars(s, base, Seq("delta"))
      Snapshots.writeStatsSidecars(s, base, Seq("delta"))
      val t = Snapshots.read(s, base)
      // ANSI-mode parity pin: the proof claims exactness in EVERY eval
      // mode; run the reference under explicit ANSI
      val ansiPrev = s.conf.get("spark.sql.ansi.enabled")
      s.conf.set("spark.sql.ansi.enabled", "true")
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
      val ref = t.agg(
        org.apache.spark.sql.functions.sum(col("delta")).as("sd"),
        org.apache.spark.sql.functions.avg(col("delta")).as("ad"))
        .collect().toSeq
      s.conf.set(SnapshotAggRewrite.EnabledKey, "true")
      CountingLocalFs.reset()
      val q = t.agg(
        org.apache.spark.sql.functions.sum(col("delta")).as("sd"),
        org.apache.spark.sql.functions.avg(col("delta")).as("ad"))
      assert(isMetadataAnswered(q), "signed SUM/AVG must answer via the bound")
      assert(q.collect().toSeq == ref, "bit-identical under ANSI")
      assert(CountingLocalFs.openedParquet.isEmpty,
        s"signed covered sums opened: ${CountingLocalFs.openedParquet}")
      s.conf.set("spark.sql.ansi.enabled", ansiPrev)
      // near-overflow: bounds so wide the |partial| bound exceeds Long —
      // the rule cannot prove safety and must DECLINE (the unrewritten
      // aggregate still runs; its actual partials happen to cancel)
      val wide = java.nio.file.Files.createTempDirectory("graft-aggr6w")
        .toString + "/t"
      val x = Long.MaxValue / 4
      Snapshots.write(
        (1 to 8).map(i => (i.toLong, if (i % 2 == 0) x else -x))
          .toDF("id", "w"),
        wide)
      Snapshots.writeSumSidecars(s, wide, Seq("w"))
      Snapshots.writeStatsSidecars(s, wide, Seq("w"))
      val qw = Snapshots.read(s, wide)
        .agg(org.apache.spark.sql.functions.sum(col("w")).as("sw"))
      assert(!isMetadataAnswered(qw),
        "8 × Long.MaxValue/4 bound exceeds the accumulator: must decline")
      assert(qw.collect().head.getLong(0) == 0L)
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
    }
  }

  test("filtered MIN/MAX: proven files fold from stats, ONLY boundary files open") {
    withExtSession { s =>
      import s.implicits._
      s.sparkContext.hadoopConfiguration
        .set("fs.cntfs.impl", classOf[CountingLocalFs].getName)
      val root = java.nio.file.Files.createTempDirectory("graft-aggrmw")
      val base = s"cntfs:$root/t"
      // 12 range-clustered files over id 1..1200; x rides along
      Snapshots.write(
        (1L to 1200L).map(i => (i, i * 3L)).toDF("id", "x")
          .repartitionByRange(12, col("id")),
        base, statsKey = Some("id"))
      Snapshots.writeStatsSidecars(s, base, Seq("x"))
      val t = Snapshots.read(s, base)
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
      val ref = t.filter(col("id") >= 250L && col("id") <= 850L)
        .agg(min(col("id")).as("mn"), max(col("id")).as("mx"),
          min(col("x")).as("xmn"), max(col("x")).as("xmx"))
        .collect().toSeq
      s.conf.set(SnapshotAggRewrite.EnabledKey, "true")
      CountingLocalFs.reset()
      val q = t.filter(col("id") >= 250L && col("id") <= 850L)
        .agg(min(col("id")).as("mn"), max(col("id")).as("mx"),
          min(col("x")).as("xmn"), max(col("x")).as("xmx"))
      assert(isMetadataAnswered(q), "hybrid must rewrite to a local relation")
      assert(q.collect().toSeq == ref, "bit-identical to the unrewritten plan")
      // [301,800] is proven by stats; only the two boundary files
      // ([201,300], [801,900]) may be opened
      val boundary = Snapshots.scanPlan(s, base,
        col("id") >= 250L && col("id") <= 850L)._1
        .filter(e => e.stats.exists { case (_, _, mn, mx) =>
          mn.toLong < 250L || mx.toLong > 850L })
      assert(boundary.size == 2)
      val opened = CountingLocalFs.openedParquet
      val stray = opened.filterNot(p => boundary.exists(e => p.endsWith(e.path)))
      assert(stray.isEmpty,
        s"filtered MIN/MAX opened files beyond its boundary set: $stray")
      // filtered SUM/AVG (round-17): sidecar sums for the proven files,
      // boundary-only opens, bit-identical
      Snapshots.writeSumSidecars(s, base, Seq("x"))
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
      val sref = t.filter(col("id") >= 250L && col("id") <= 850L)
        .agg(org.apache.spark.sql.functions.sum(col("x")).as("sx"),
          avg(col("x")).as("ax")).collect().toSeq
      s.conf.set(SnapshotAggRewrite.EnabledKey, "true")
      CountingLocalFs.reset()
      val sq = t.filter(col("id") >= 250L && col("id") <= 850L)
        .agg(org.apache.spark.sql.functions.sum(col("x")).as("sx"),
          avg(col("x")).as("ax"))
      assert(isMetadataAnswered(sq), "filtered SUM/AVG answers via the hybrid")
      assert(sq.collect().toSeq == sref)
      val strayS = CountingLocalFs.openedParquet
        .filterNot(p => boundary.exists(e => p.endsWith(e.path)))
      assert(strayS.isEmpty,
        s"filtered SUM opened files beyond its boundary set: $strayS")
      // empty-match predicate: answers NULL from metadata, zero opens
      CountingLocalFs.reset()
      val nullQ = t.filter(col("id") > 5000L).agg(min(col("x")).as("mn"))
      assert(isMetadataAnswered(nullQ))
      assert(nullQ.collect().head.isNullAt(0))
      assert(CountingLocalFs.openedParquet.isEmpty)
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
    }
  }

  test("grouped pushdown on the cluster key: proven files fold, only the straddler opens") {
    withExtSession { s =>
      import s.implicits._
      s.sparkContext.hadoopConfiguration
        .set("fs.cntfs.impl", classOf[CountingLocalFs].getName)
      val root = java.nio.file.Files.createTempDirectory("graft-aggrg")
      val base = s"cntfs:$root/t"
      def slice(days: Range, parts: Int) =
        days.flatMap(day => (1L to 100L).map { i =>
          val id = day * 100L + i
          (day.toLong, id, if (id % 10 == 0) null
                           else java.lang.Long.valueOf(id * 2))
        }).toDF("day", "id", "v")
          .repartitionByRange(parts, col("day"))
      // 8 single-day files + ONE file straddling days 9..12
      Snapshots.write(slice(1 to 4, 4), base, statsKey = Some("day"))
      Snapshots.append(slice(5 to 8, 4), base, statsKey = Some("day"))
      Snapshots.append(slice(9 to 12, 4).coalesce(1), base,
        statsKey = Some("day"))
      Snapshots.writeStatsSidecars(s, base, Seq("v"))
      Snapshots.writeSumSidecars(s, base, Seq("v"))
      val t = Snapshots.read(s, base)
      // no ORDER BY here: a global sort adds an exchange, AQE wraps the
      // plan, and the LocalTableScan pin can't see inside the adaptive
      // root — order the collected rows instead
      def rollup() = t.groupBy(col("day")).agg(
        count(lit(1)).as("n"), count(col("v")).as("nv"),
        org.apache.spark.sql.functions.sum(col("v")).as("sv"),
        min(col("v")).as("mnv"), max(col("v")).as("mxv"))
      def ordered(rs: Seq[org.apache.spark.sql.Row]) = rs.sortBy(_.getLong(0))
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
      val ref = ordered(rollup().collect().toSeq)
      s.conf.set(SnapshotAggRewrite.EnabledKey, "true")
      CountingLocalFs.reset()
      val q = rollup()
      assert(isMetadataAnswered(q), "clustered rollup must fold from metadata")
      assert(ordered(q.collect().toSeq) == ref, "bit-identical to the grouped scan")
      // only the one straddling file (days 9..12) may be opened
      val opened = CountingLocalFs.openedParquet
      val straddlers = Snapshots.scanPlan(s, base, col("day") >= 9L)._1
        .filter(e => e.stats.exists { case (_, _, mn, mx) => mn != mx })
      assert(straddlers.size == 1, s"fixture wants one straddler: $straddlers")
      val stray = opened.filterNot(p =>
        straddlers.exists(e => p.endsWith(e.path)))
      assert(stray.isEmpty, s"grouped fold opened proven files: $stray")
      // grouped rollup UNDER A WHERE (round-17): interior days fold from
      // metadata, the straddler scans with the residual; bit-identical
      def whereRollup() = t.filter(col("day") >= 2L && col("day") <= 10L)
        .groupBy(col("day")).agg(count(lit(1)).as("n"),
          org.apache.spark.sql.functions.sum(col("v")).as("sv"))
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
      val wref = ordered(whereRollup().collect().toSeq)
      s.conf.set(SnapshotAggRewrite.EnabledKey, "true")
      CountingLocalFs.reset()
      val wq = whereRollup()
      assert(isMetadataAnswered(wq), "grouped WHERE rollup must fold")
      assert(ordered(wq.collect().toSeq) == wref)
      val strayW = CountingLocalFs.openedParquet
        .filterNot(p => straddlers.exists(e => p.endsWith(e.path)))
      assert(strayW.isEmpty, s"grouped WHERE fold opened proven files: $strayW")
      // COMPOSITE key (round-17): GROUP BY (day, parity) on a
      // day-clustered table — parity is constant within each single-day
      // file, so every key column pins and the rollup folds
      val base2 = s"cntfs:$root/t2"
      Snapshots.write(
        (1 to 8).flatMap(day => (1L to 50L).map { i =>
          (day.toLong, (day % 2).toLong, day * 1000L + i)
        }).toDF("day", "parity", "v")
          .repartitionByRange(8, col("day")),
        base2, statsKey = Some("day"))
      Snapshots.writeStatsSidecars(s, base2, Seq("parity", "v"))
      Snapshots.writeSumSidecars(s, base2, Seq("v"))
      val t2 = Snapshots.read(s, base2)
      def comp() = t2.groupBy(col("day"), col("parity"))
        .agg(count(lit(1)).as("n"),
          org.apache.spark.sql.functions.sum(col("v")).as("sv"))
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
      val cref = comp().collect().toSeq.sortBy(_.getLong(0))
      s.conf.set(SnapshotAggRewrite.EnabledKey, "true")
      val cq = comp()
      assert(isMetadataAnswered(cq), "composite-key rollup must fold")
      assert(cq.collect().toSeq.sortBy(_.getLong(0)) == cref)
      // SELECT DISTINCT on the cluster key = the degenerate grouped plan
      val dq = t2.select(col("day")).distinct()
      assert(isMetadataAnswered(dq), "SELECT DISTINCT on the key must fold")
      assert(dq.collect().map(_.getLong(0)).toSet == (1L to 8L).toSet)
      // COUNT(DISTINCT key) = the fold's cardinality (global arm)
      val cdq = t2.agg(org.apache.spark.sql.functions
        .countDistinct(col("day")).as("nd"))
      assert(isMetadataAnswered(cdq), "COUNT(DISTINCT key) must fold")
      assert(cdq.collect().head.getLong(0) == 8L)
      // ... and under a WHERE
      val cdw = t2.filter(col("day") >= 3L)
        .agg(org.apache.spark.sql.functions.countDistinct(col("day")).as("nd"))
      assert(isMetadataAnswered(cdw))
      assert(cdw.collect().head.getLong(0) == 6L)
      // a group cap below the group count declines (driver-side fold must
      // stay dashboard-sized); an unclustered key declines outright
      s.conf.set(SnapshotAggRewrite.MaxGroupsKey, "3")
      assert(!isMetadataAnswered(rollup()), "maxGroups cap must decline")
      s.conf.unset(SnapshotAggRewrite.MaxGroupsKey)
      assert(!isMetadataAnswered(
        t.groupBy(col("id")).agg(count(lit(1)))),
        "per-row key (never single-group) must decline")
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
    }
  }

  test("randomized parity sweep: rewrite-on == rewrite-off over adversarial fixtures") {
    withExtSession { s =>
      import s.implicits._
      val rnd = new scala.util.Random(20260816L) // fixed seed: deterministic
      (1 to 10).foreach { trial =>
        val base = java.nio.file.Files
          .createTempDirectory(s"graft-aggfuzz$trial").toString + "/t"
        val nDays = 2 + rnd.nextInt(6)
        val rows = (1 to (200 + rnd.nextInt(400))).map { _ =>
          val day = 1L + rnd.nextInt(nDays)
          val v = if (rnd.nextInt(10) == 0) null
                  else java.lang.Long.valueOf(rnd.nextInt(2001) - 1000L) // signed
          // double column (round-18): injects the non-finite states the
          // NaN-aware folds exist for — NaN (greatest in Spark's order),
          // ±Infinity (statLeq falls to double compare), NULL. Finite
          // values are k·0.5 so every canon round-trips exactly. NO -0.0:
          // a -0.0/0.0 min/max tie is order-dependent in Spark itself
          // (see statMinFold's scaladoc), so parity on it is undefined.
          val x: java.lang.Double = rnd.nextInt(20) match {
            case 0 => Double.NaN
            case 1 => Double.PositiveInfinity
            case 2 => Double.NegativeInfinity
            case 3 | 4 => null
            case _ => (rnd.nextInt(4001) - 2000) * 0.5
          }
          (day, rnd.nextInt(), v, x)
        }
        val df = rows.toDF("day", "id", "v", "x")
        // adversarial layouts: clustered, partially clustered, unclustered,
        // plus an empty-partition commit and a straddler append
        val layout = rnd.nextInt(3) match {
          case 0 => df.repartitionByRange(nDays, col("day"))
          case 1 => df.repartition(nDays + 4, col("day")) // empties likely
          case 2 => df.repartition(3) // unclustered
        }
        Snapshots.write(layout, base, statsKey = Some("day"))
        Snapshots.append(df.limit(30).coalesce(1), base) // mixed straddler
        Snapshots.writeStatsSidecars(s, base, Seq("v", "x"))
        Snapshots.writeSumSidecars(s, base, Seq("v"))
        // round-18: cycle the adversarial MANIFEST STATES through the
        // randomized grid alongside the plain layouts — pending MoR
        // deletes (the rewrite must DECLINE: metadata counts would ignore
        // deleted rows) and pending schema ops (rename/widen of a column
        // the grid never touches: the metadata verbs are rename-/widen-
        // aware — stats lookups translate names and tag L spans the
        // widening — so the rule may still ANSWER, and parity is the
        // contract that proves it answers RIGHT)
        val mutation = (trial - 1) % 5
        mutation match {
          case 1 => Snapshots.deleteWhereMoR(s, base, col("id") % 5 === 0)
          case 2 => Snapshots.renameColumn(s, base, "id", "rid")
          case 3 => Snapshots.widenColumn(s, base, "id",
            org.apache.spark.sql.types.LongType)
          case _ => ()
        }
        // mutation 4 — shallow clone (round-18): the grid runs over a
        // fresh CLONE of the fixture. Its scan is the source's exact file
        // set, so the rule resolves it against the SOURCE's manifests and
        // folds the shared stats/sidecars; parity proves the cross-table
        // answering is bit-exact over every adversarial layout.
        val t =
          if (mutation == 4) {
            val cb = java.nio.file.Files
              .createTempDirectory(s"graft-aggfuzz${trial}c").toString + "/t"
            Snapshots.shallowClone(s, base, cb)
            Snapshots.read(s, cb)
          } else Snapshots.read(s, base)
        if (mutation == 1) {
          s.conf.set(SnapshotAggRewrite.EnabledKey, "true")
          assert(!isMetadataAnswered(
            t.agg(count(lit(1)).as("a"), min(col("v")).as("b"))),
            s"trial $trial: pending MoR deletes must decline the rewrite")
          s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
        }
        val cut = 1L + rnd.nextInt(nDays)
        def grid(): Seq[org.apache.spark.sql.DataFrame] = Seq(
          t.agg(count(lit(1)).as("a"), min(col("v")).as("b"),
            max(col("v")).as("c"),
            org.apache.spark.sql.functions.sum(col("v")).as("d"),
            avg(col("v")).as("e"), count(col("v")).as("f"),
            min(col("x")).as("g"), max(col("x")).as("h")),
          t.filter(col("day") >= cut).agg(count(lit(1)).as("a"),
            min(col("v")).as("b"), max(col("v")).as("c"),
            org.apache.spark.sql.functions.sum(col("v")).as("d"),
            min(col("x")).as("e"), max(col("x")).as("f")),
          t.groupBy(col("day")).agg(count(lit(1)).as("a"),
            org.apache.spark.sql.functions.sum(col("v")).as("b"),
            min(col("v")).as("c"), max(col("v")).as("d"),
            count(col("v")).as("e"),
            min(col("x")).as("f"), max(col("x")).as("g")),
          t.filter(col("day") <= cut).groupBy(col("day"))
            .agg(count(lit(1)).as("a"),
              org.apache.spark.sql.functions.sum(col("v")).as("b"),
              max(col("x")).as("c")),
          t.select(col("day")).distinct(),
          t.agg(org.apache.spark.sql.functions.countDistinct(col("day"))
            .as("nd")))
        def run(enabled: Boolean): Seq[Seq[String]] = {
          s.conf.set(SnapshotAggRewrite.EnabledKey, enabled.toString)
          grid().map(_.collect().map(_.toString).sorted.toSeq)
        }
        val off = run(enabled = false)
        val on = run(enabled = true)
        off.zip(on).zipWithIndex.foreach { case ((o, n), qi) =>
          assert(o == n, s"trial $trial query $qi diverged:\noff=$o\non=$n")
        }
        s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
      }
    }
  }

  test("NaN canon from a boundary scan folds in Spark's order: max keeps NaN, min discards it; float group keys decline") {
    withExtSession { s =>
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-aggnan").toString + "/t"
      // clustered table: days 1..3 finite; an appended straddler pins
      // day 2 but holds NaN in x — stagedStats refuses to RECORD NaN
      // stats, so that file can only contribute through the boundary
      // SCAN, whose statExtract canon is the string "NaN"
      Snapshots.write(
        (1L to 300L).map(i => (1L + (i - 1) / 100, i, (i % 50) * 1.5))
          .toDF("day", "id", "x")
          .repartition(8, col("day")),
        base, statsKey = Some("day"))
      Snapshots.append(
        Seq((2L, 1001L, Double.NaN), (2L, 1002L, 7.25)).toDF("day", "id", "x")
          .coalesce(1), base)
      Snapshots.writeStatsSidecars(s, base, Seq("x"))
      val t = Snapshots.read(s, base)
      def strs(df: DataFrame) = df.collect().map(_.toString).sorted.toSeq
      // filtered MIN/MAX (metaBoundsWhere): Spark's max() is NaN when any
      // value is; min() ignores NaN — the fold must reproduce both
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
      val fRef = strs(t.filter(col("day") >= 2L)
        .agg(min(col("x")).as("mn"), max(col("x")).as("mx")))
      val gRef = strs(t.groupBy(col("day"))
        .agg(min(col("x")).as("mn"), max(col("x")).as("mx"), count(lit(1)).as("n")))
      s.conf.set(SnapshotAggRewrite.EnabledKey, "true")
      val fq = t.filter(col("day") >= 2L)
        .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      assert(isMetadataAnswered(fq), "filtered min/max must still rewrite")
      assert(strs(fq) == fRef, s"NaN mis-fold: ${strs(fq)} vs $fRef")
      // grouped twin (metaGroupAgg's mergeInto): day 2 merges a proven
      // finite file with the NaN straddler's scanned canon
      val gq = t.groupBy(col("day"))
        .agg(min(col("x")).as("mn"), max(col("x")).as("mx"), count(lit(1)).as("n"))
      assert(isMetadataAnswered(gq), "grouped rollup must still rewrite")
      assert(strs(gq) == gRef, s"grouped NaN mis-fold: ${strs(gq)} vs $gRef")
      // float/double GROUPING keys decline outright: GROUP BY normalizes
      // -0.0 == 0.0 while canon strings keep them distinct
      assert(!isMetadataAnswered(t.groupBy(col("x")).agg(count(lit(1)).as("n"))),
        "double grouping key must decline")
      assert(!isMetadataAnswered(
        t.agg(org.apache.spark.sql.functions.countDistinct(col("x")).as("nd"))),
        "COUNT(DISTINCT double) must decline")
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
    }
  }

  test("a high-NDV straddler declines via a BOUNDED boundary collect — driver memory never depends on data shape") {
    withExtSession { s =>
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-aggndv").toString + "/t"
      // one proven single-group file (day 1)...
      Snapshots.write(
        (1L to 50L).map(i => (1L, i)).toDF("day", "id").coalesce(1),
        base, statsKey = Some("day"))
      // ...plus a straddler whose key has far more distinct values than
      // the group cap — the grouped boundary scan must be LIMITed before
      // collecting, and reaching the limit declines the rewrite
      Snapshots.append(
        (1L to 500L).map(i => (100L + i, i)).toDF("day", "id").coalesce(1),
        base)
      s.conf.set(SnapshotAggRewrite.EnabledKey, "true")
      s.conf.set(SnapshotAggRewrite.MaxGroupsKey, "5")
      val t = Snapshots.read(s, base)
      val q = t.groupBy(col("day")).agg(count(lit(1)).as("n"))
      assert(!isMetadataAnswered(q),
        "over-cap straddler must decline the grouped rewrite")
      // and the unrewritten plan still answers correctly
      assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        .get(1L).contains(50L))
      assert(q.count() == 501L)
      s.conf.unset(SnapshotAggRewrite.MaxGroupsKey)
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
    }
  }

  test("declines: grouped aggs, avg, distinct, MoR deletes, foreign parquet; filtered min answers") {
    withExtSession { s =>
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-aggr4").toString + "/t"
      Snapshots.write(
        (1L to 200L).map(i => (i, i % 5, i * 1.0)).toDF("id", "g", "x")
          .repartitionByRange(2, col("id")),
        base, statsKey = Some("id"))
      s.conf.set(SnapshotAggRewrite.EnabledKey, "true")
      val t = Snapshots.read(s, base)
      assert(!isMetadataAnswered(t.groupBy(col("g")).agg(count(lit(1)))),
        "grouped agg must decline")
      assert(!isMetadataAnswered(t.agg(count(lit(1)), avg(col("x")))),
        "an unanswerable function declines the WHOLE node")
      // filtered MIN/MAX answers via the metaBoundsWhere hybrid
      // (round-17) — here with no stats on g every file is boundary, so
      // the rule's fold IS a scan, but the result stays bit-identical
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
      val fmRef = t.filter(col("g") === 1)
        .agg(min(col("id")).as("mn"), max(col("x")).as("mx")).collect().toSeq
      s.conf.set(SnapshotAggRewrite.EnabledKey, "true")
      val fm = t.filter(col("g") === 1)
        .agg(min(col("id")).as("mn"), max(col("x")).as("mx"))
      assert(isMetadataAnswered(fm), "filtered min/max answers via the hybrid")
      assert(fm.collect().toSeq == fmRef)
      assert(!isMetadataAnswered(t.agg(
        org.apache.spark.sql.functions.countDistinct(col("g")))),
        "distinct must decline")
      // a non-deterministic filter must run as written, never re-evaluate
      assert(!isMetadataAnswered(
        t.filter(org.apache.spark.sql.functions.rand(7) < 0.5)
          .agg(count(lit(1)))),
        "non-deterministic filter must decline")
      // foreign parquet (not a snapshot layout)
      val foreign = java.nio.file.Files.createTempDirectory("graft-aggr4f").toString + "/p"
      (1L to 50L).map(i => (i, i * 1.0)).toDF("id", "x")
        .write.parquet(foreign)
      assert(!isMetadataAnswered(s.read.parquet(foreign).agg(count(lit(1)))))
      // pending MoR deletes disqualify the version: results must include them
      Snapshots.deleteWhereMoR(s, base, col("id") <= 10L)
      val q = Snapshots.read(s, base).agg(count(lit(1)).as("n"))
      assert(!isMetadataAnswered(q), "MoR deletes must decline")
      assert(q.collect().head.getLong(0) == 190L)
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
    }
  }

  test("shallow clones: fresh clone answers via the source's metadata; divergence declines; deepen + sidecar refresh restores") {
    withExtSession { s =>
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft-aggclone")
      val src = s"$root/src"
      val dst = s"$root/dst"
      Snapshots.write((1L to 600L).map(i => (i, i * 2L)).toDF("id", "x")
          .repartitionByRange(4, col("id")), src, statsKey = Some("id"))
      Snapshots.writeStatsSidecars(s, src, Seq("x"))
      Snapshots.shallowClone(s, src, dst)
      def q(df: DataFrame) = df.agg(count(lit(1)).as("n"),
        min(col("id")).as("mn"), max(col("x")).as("mx"))
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
      val ref = q(Snapshots.read(s, dst)).collect().toSeq
      s.conf.set(SnapshotAggRewrite.EnabledKey, "true")
      // a fresh clone's scan IS the source snapshot's file set, so the
      // rule resolves it against the SOURCE's manifests and folds the
      // source's recorded stats + sidecars — shared metadata for free
      val fresh = q(Snapshots.read(s, dst))
      assert(isMetadataAnswered(fresh),
        "fresh clone must answer via the source's metadata")
      assert(fresh.collect().toSeq == ref)
      // divergence mixes source-owned and clone-owned directories: no
      // single base matches a committed version → conservative decline
      Snapshots.append(Seq((601L, 9999L)).toDF("id", "x"), dst,
        statsKey = Some("id"))
      val diverged = q(Snapshots.read(s, dst))
      assert(!isMetadataAnswered(diverged), "diverged clone must decline")
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
      val ref2 = q(Snapshots.read(s, dst)).collect().toSeq
      s.conf.set(SnapshotAggRewrite.EnabledKey, "true")
      assert(q(Snapshots.read(s, dst)).collect().toSeq == ref2)
      // localize: deep copies carry the source sidecars byte-exactly and
      // the refresh builds only the appended file's — the clone's own
      // manifests answer from here on
      Snapshots.deepenClone(s, dst)
      assert(Snapshots.writeStatsSidecars(s, dst, Seq("x")) == 1,
        "refresh owes exactly the clone-appended file")
      val deep = q(Snapshots.read(s, dst))
      assert(isMetadataAnswered(deep),
        "deepened clone must answer from its own metadata")
      assert(deep.collect().toSeq == ref2)
      s.conf.set(SnapshotAggRewrite.EnabledKey, "false")
    }
  }
}
