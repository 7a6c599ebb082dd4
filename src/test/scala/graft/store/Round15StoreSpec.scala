package graft.store

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Round-15 store behaviors: generalized metadata MIN/MAX (metaBoundsOf),
 * delete-scoped approxDistinct, executor-side sidecar builds, and the
 * bloom canon-vintage guard.
 */
class Round15StoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def recordsReadDuring(body: => Unit): Long = {
    val recs = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) recs.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      var prev = -1L; var n = 0
      while (n < 100 && prev != recs.get()) { prev = recs.get(); Thread.sleep(20); n += 1 }
    } finally spark.sparkContext.removeSparkListener(l)
    recs.get()
  }

  test("filtered topK: WHERE prunes candidates, residual filters rows, parity with full scan") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.cntfs.impl", classOf[CountingLocalFs].getName)
    val root = java.nio.file.Files.createTempDirectory("graft-tkw")
    val base = s"cntfs:$root/t"
    // 8 range files over [1..800]
    val df = (1L to 800L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartitionByRange(8, col("id"))
    Snapshots.write(df, base, statsKey = Some("id"))
    CountingLocalFs.reset()
    val top = Snapshots.topK(spark, base, "id", 5,
      where = Some(col("id") <= 300L && col("id") % 2 === 0L))
      .select("id").as[Long].collect().toSeq
    assert(top == Seq(300L, 298L, 296L, 294L, 292L))
    // the WHERE range covers files 1-3; the global-top files (id > 300)
    // must never be OPENED even though they hold the best bounds
    val highFiles = Snapshots.scanPlan(spark, base, col("id") > 300L)._1
      .filter(_.stats.exists { case (_, _, mn, _) => mn.toLong > 300L })
    val strays = CountingLocalFs.openedParquet
      .filter(p => highFiles.exists(e => p.endsWith(e.path)))
    assert(strays.isEmpty,
      s"filtered topK opened out-of-range files: ${strays.mkString(", ")}")
    // ascending + fewer-than-k + all-filtered edges
    val asc = Snapshots.topK(spark, base, "id", 3, ascending = true,
      where = Some(col("id") > 795L)).select("id").as[Long].collect().toSeq
    assert(asc == Seq(796L, 797L, 798L))
    assert(Snapshots.topK(spark, base, "id", 3,
      where = Some(col("id") > 9999L)).count() == 0L)
    // parity with the plain path when no predicate is given
    assert(Snapshots.topK(spark, base, "id", 2).select("id")
      .as[Long].collect().toSeq == Seq(800L, 799L))
  }

  test("topK over a double key with NaN rows: NaN k-th disables the ASC threshold; parity both directions") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-tknan").toString + "/t"
    // statted finite files (clustered on x) + an appended file holding
    // NaN rows — writers refuse NaN stats, so it rides stats-less and is
    // always admitted; the hazard is the THRESHOLD: with k exceeding the
    // admitted finite rows, the ascending k-th canon is "NaN", on which
    // every statLeq test is false — pre-round-18 that admitted nothing
    // more and returned NaN rows in place of finite ones still excluded
    val df = (1L to 80L).map(i => (i, i * 1.0)).toDF("id", "x")
      .repartitionByRange(4, col("x"))
    Snapshots.write(df, base, statsKey = Some("x"))
    Snapshots.append(
      Seq((900L, Double.NaN), (901L, Double.NaN), (902L, 500.0))
        .toDF("id", "x").coalesce(1), base)
    def ref(k: Int, asc: Boolean) = {
      val o = if (asc) col("x").asc else col("x").desc
      Snapshots.read(spark, base).orderBy(o, col("id").asc).limit(k)
        .select("id").as[Long].collect().toSeq
    }
    def tk(k: Int, asc: Boolean) =
      Snapshots.topK(spark, base, "x", k, tieBreak = Seq("id"),
        ascending = asc).select("id").as[Long].collect().toSeq
    // ascending, k large enough that the first-admitted candidate set
    // runs out of finite rows and the k-th lands on NaN
    for (k <- Seq(3, 22, 45, 83)) {
      assert(tk(k, asc = true) == ref(k, asc = true), s"asc k=$k")
      assert(tk(k, asc = false) == ref(k, asc = false), s"desc k=$k")
    }
  }

  test("metaBoundsOf: min/max of a NON-key column from sidecars, zero records read") {
    val base = java.nio.file.Files.createTempDirectory("graft-mbof").toString + "/t"
    val df = (1L to 300L).map(i => (i, i * 2 + 1, s"v$i")).toDF("id", "score", "s")
      .repartitionByRange(3, col("id"))
    Snapshots.write(df, base, statsKey = Some("id"))
    // manifest-key column answers immediately
    assert(Snapshots.metaBoundsOf(spark, base, "id") == Some(("1", "300")))
    // non-key column: no sidecars yet → None (fallback, never a guess)
    assert(Snapshots.metaBoundsOf(spark, base, "score").isEmpty)
    Snapshots.writeStatsSidecars(spark, base, Seq("score"))
    val read = recordsReadDuring {
      assert(Snapshots.metaBoundsOf(spark, base, "score") == Some(("3", "601")))
    }
    assert(read == 0L, s"metaBoundsOf must not read data, read $read records")
    // string column is sidecar-covered too (UTF-8 byte order)
    Snapshots.writeStatsSidecars(spark, base, Seq("s")) // no-op: sidecars exist
    // pending delete → None (the extreme row may be gone)
    Snapshots.deleteWhereMoR(spark, base, col("id") === 300L)
    assert(Snapshots.metaBoundsOf(spark, base, "score").isEmpty)
  }

  test("metaBoundsOf answers in the NEW name after a rename (translation layer)") {
    val base = java.nio.file.Files.createTempDirectory("graft-mbof2").toString + "/t"
    Snapshots.write((1L to 90L).map(i => (i, i * 3)).toDF("id", "score")
      .repartitionByRange(3, col("id")), base, statsKey = Some("id"))
    Snapshots.writeStatsSidecars(spark, base, Seq("score"))
    Snapshots.renameColumn(spark, base, "score", "points")
    assert(Snapshots.metaBoundsOf(spark, base, "points") == Some(("3", "270")))
    assert(Snapshots.metaBoundsOf(spark, base, "score").isEmpty,
      "the old name no longer exists")
  }

  test("approxDistinct under a pending MoR delete re-scans ONLY covered files") {
    val base = java.nio.file.Files.createTempDirectory("graft-ndvdel").toString + "/t"
    val df = (1L to 400L).map(i => (i, s"u${i}")).toDF("id", "user")
      .repartitionByRange(4, col("id"))
    Snapshots.write(df, base, statsKey = Some("id"))
    assert(Snapshots.writeNdvSidecars(spark, base, Seq("id")) == 4)
    assert(Snapshots.approxDistinct(spark, base, "id") == 400L)
    // positional delete confined to ONE file ([1,100])
    Snapshots.deleteWhereMoR(spark, base, col("id") === 5L)
    val read = recordsReadDuring {
      assert(Snapshots.approxDistinct(spark, base, "id") == 399L)
    }
    // covered-file rows (100) + the KiB delete file (1 row) — NOT the
    // 400-row full re-scan round 14 paid
    assert(read <= 150L, s"expected delete-scoped re-scan, read $read records")

    // equality delete covers the whole recorded version → full honesty
    // re-scan, still exact
    val base2 = java.nio.file.Files.createTempDirectory("graft-ndvdel2").toString + "/t"
    Snapshots.write(df, base2, statsKey = Some("id"))
    Snapshots.writeNdvSidecars(spark, base2, Seq("id"))
    Snapshots.deleteByKey(spark, base2, Seq(7L, 9L).toDF("id"))
    assert(Snapshots.approxDistinct(spark, base2, "id") == 398L)
    // appended-after files are NOT covered by the earlier delete: their
    // sketches stay usable
    Snapshots.append((401L to 500L).map(i => (i, s"u$i")).toDF("id", "user"),
      base2, statsKey = Some("id"))
    Snapshots.writeNdvSidecars(spark, base2, Seq("id"))
    assert(Snapshots.approxDistinct(spark, base2, "id") == 498L)
  }

  test("executor-side sidecar builds: multi-partition, counted, idempotent") {
    val base = java.nio.file.Files.createTempDirectory("graft-execsc").toString + "/t"
    val df = (1L to 600L).map(i => (i, i / 2.0, s"g${i % 5}")).toDF("id", "x", "g")
      .repartitionByRange(6, col("id"))
    Snapshots.write(df, base)
    assert(Snapshots.writeNdvSidecars(spark, base, Seq("id", "g")) == 6)
    assert(Snapshots.writeNdvSidecars(spark, base, Seq("id", "g")) == 0)
    assert(Snapshots.writeStatsSidecars(spark, base, Seq("x")) == 6)
    assert(Snapshots.writeStatsSidecars(spark, base, Seq("x")) == 0)
    assert(Snapshots.writeBloomSidecars(spark, base, "id",
      expectedItems = 1000L) == 6)
    assert(Snapshots.writeBloomSidecars(spark, base, "id",
      expectedItems = 1000L) == 0)
    // the artifacts work end to end
    assert(Snapshots.approxDistinct(spark, base, "g") == 5L)
    assert(Snapshots.metaBoundsOf(spark, base, "x") == Some(("0.5", "300.0")))
    assert(Snapshots.pointLookup(spark, base, "id", 42L).count() == 1L)
    // no tmp debris left behind by the executor writers
    val debris = new java.io.File(base).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.contains(".tmp-"))
    assert(debris.isEmpty, debris.mkString(", "))
  }

  test("legacy (pre-canon) bloom sections never probe timestamp columns; long columns still prune") {
    val base = java.nio.file.Files.createTempDirectory("graft-bloomv1").toString + "/t"
    val rows = (0 until 300).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-${i / 10 + 1}%02d 00:00:${i % 10}%02d"),
        i.toLong, s"v$i")
    }.toDF("ts", "id", "s")
    Snapshots.write(rows.repartition(3), base) // interleaved: bounds can't prune
    // hand-write V1 sidecars whose ts sections use the OLD canon (rendered
    // timestamps) — exactly what a pre-round-14 build left on disk. A new-
    // canon probe (epoch micros) would read "definitely absent" from them.
    val f = new java.io.File(base + "/v=1")
    val dataFiles = f.listFiles().filter(_.getName.endsWith(".parquet"))
    dataFiles.foreach { df0 =>
      val rel = s"v=1/${df0.getName}"
      val vals = spark.read.parquet(df0.getPath)
      val tsBloom = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
      vals.select(col("ts").cast("string")).collect()
        .foreach(r => tsBloom.putString(r.getString(0)))
      val idBloom = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
      vals.select(col("id").cast("string")).collect()
        .foreach(r => idBloom.putString(r.getString(0)))
      val bos = new java.io.ByteArrayOutputStream()
      def sec(c: String, b: org.apache.spark.util.sketch.BloomFilter): Unit = {
        val bb = new java.io.ByteArrayOutputStream(); b.writeTo(bb)
        bos.write(s"GRAFTBLOOM1\t$c\t${bb.size}\n".getBytes("UTF-8"))
        bos.write(bb.toByteArray)
      }
      sec("id", idBloom); sec("ts", tsBloom)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$base/$rel.bloom"), bos.toByteArray)
    }
    // timestamp probe: the v1 ts section must be IGNORED (must-scan), so
    // the count stays exact instead of mis-pruning to 0
    val probe = java.sql.Timestamp.valueOf("2024-01-05 00:00:03")
    assert(Snapshots.countWhere(spark, base, col("ts") === lit(probe)) == 1L)
    assert(Snapshots.scanPlan(spark, base, col("ts") === lit(probe))._1.size == 3,
      "v1 ts sections must admit every file")
    // long probe: v1 and v2 canons coincide → the v1 id section still prunes
    val (candId, _) = Snapshots.scanPlan(spark, base, col("id") === 42L)
    assert(candId.size < 3, "v1 long sections remain usable")
    assert(Snapshots.countWhere(spark, base, col("id") === 42L) == 1L)
  }

  test("metaBoundsOf folds decimal bounds EXACTLY beyond double precision") {
    // two decimal(38,18) per-file bounds that compare EQUAL as doubles
    // (they differ only in the 19th significant digit): the cross-file
    // fold must still pick the true extreme — a double-space tie lets
    // the fold return the wrong exact MIN/MAX (round-17 advisory).
    // Commit order puts the HIGHER file first so a tie-as-equal fold
    // would keep the wrong side for MIN.
    val base = java.nio.file.Files.createTempDirectory("graft-decb").toString + "/t"
    val hi = new java.math.BigDecimal("1.000000000000000002")
    val lo = new java.math.BigDecimal("1.000000000000000001")
    assert(hi.doubleValue() == lo.doubleValue(), "fixture: must tie as doubles")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 18)
    def frame(v: java.math.BigDecimal, ids: Range) = {
      val rows = ids.map(i => org.apache.spark.sql.Row(i.toLong, v))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v", dec38))))
    }
    Snapshots.write(frame(hi, 1 to 5), base, statsKey = Some("v"))
    Snapshots.append(frame(lo, 6 to 10), base, statsKey = Some("v"))
    assert(Snapshots.metaBoundsOf(spark, base, "v") ==
      Some((lo.toPlainString, hi.toPlainString)),
      s"exact decimal fold, got ${Snapshots.metaBoundsOf(spark, base, "v")}")
    // and the scan planner still prunes/admits soundly with exact compares
    assert(Snapshots.countWhere(spark, base,
      col("v") === lit(lo).cast(dec38)) == 5L)
  }
}
