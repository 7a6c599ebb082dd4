package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Partition pruning from the date layout; compaction preserves content. */
class LayoutSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("date layout: a dt predicate prunes partitions in the plan and on disk") {
    val dir = tmp("graft-layout")
    val events = TestData.events(spark, "/root/testdata/sf0.001")
    Layout.writeDatePartitioned(events, "ts", dir, sortKeys = Seq("user_id"))

    val nPartitions = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("dt="))
    assert(nPartitions > 1, s"expected several dt= partitions, got $nPartitions")

    val oneDay = Layout.readDatePartitioned(spark, dir)
      .filter(col("dt") === spark.read.parquet(dir).agg(min("dt")).head().getDate(0))
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      oneDay.explain()
    }
    val plan = buf.toString("UTF-8")
    assert(plan.contains("PartitionFilters"), plan)
    assert(oneDay.count() > 0)
    assert(oneDay.count() < events.count())
  }

  test("range layout: files carry disjoint key intervals (file-skipping ready)") {
    val dir = tmp("graft-range")
    val events = TestData.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value")
    Layout.writeRangePartitioned(events, "user_id", nFiles = 4, dir)

    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(files.size >= 3, s"expected several range files, got ${files.size}")
    val intervals = files.map { f =>
      spark.read.parquet(f).agg(min("user_id"), max("user_id"))
        .as[(Long, Long)].collect().head
    }.sortBy(_._1)
    intervals.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping file ranges: $intervals")
      case _ =>
    }
    assert(spark.read.parquet(dir).count() == events.count())
  }

  test("schema evolution: mergeSchema unions old and new file generations") {
    val dir = tmp("graft-evolve")
    // generation 1: two columns; generation 2 adds a third
    Seq((1L, "a")).toDF("id", "s").write.parquet(s"$dir/g1")
    Seq((2L, "b", 9.5)).toDF("id", "s", "score").write.parquet(s"$dir/g2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/g1", s"$dir/g2")
    assert(merged.columns.toSet == Set("id", "s", "score"))
    val rows = merged.select("id", "score").as[(Long, Option[Double])]
      .collect().toMap
    assert(rows == Map(1L -> None, 2L -> Some(9.5))) // old files read as null
  }

  test("zorderKey2 matches a reference bit-interleave exhaustively (64×64 grid)") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i => (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).sum
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
    val mismatches = grid
      .withColumn("z", Layout.zorderKey2(col("x"), col("y"), bitsPerCol = 6))
      .as[(Long, Long, Long)].collect()
      .filter { case (x, y, z) => z != ref(x, y, 6) }
    assert(mismatches.isEmpty, s"first mismatch: ${mismatches.headOption}")
    // spot-pin one canonical value: interleave(3=011b, 5=101b) = 100111b = 39
    assert(ref(3, 5, 3) == 39)
  }

  test("z-ordered layout: every file covers a compact 2-D tile (both ranges prune)") {
    val dir = tmp("graft-zorder")
    val grid = (for (x <- 0L until 128L; y <- 0L until 128L) yield (x, y)).toDF("x", "y")
    Layout.writeZOrdered(grid, "x", "y", nFiles = 64, path = dir, bitsPerCol = 7)
    // a single-key range sort leaves the OTHER column's per-file range at
    // ~full width; a z-order tile must bound BOTH well below the full 0..127
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max(col("x")) - min(col("x"))).as("xr"), (max(col("y")) - min(col("y"))).as("yr"))
      .as[(String, Long, Long)].collect()
    assert(perFile.length > 16)
    // (a single-key x sort would give x-range ≈ 2 but y-range = 127 here;
    // bound allows for repartitionByRange's sampled, unaligned boundaries)
    val worstX = perFile.map(_._2).max
    val worstY = perFile.map(_._3).max
    assert(worstX < 100 && worstY < 100,
      s"z-tiles should bound both dims: worst x-range $worstX, y-range $worstY of 127")
    assert(spark.read.parquet(dir).count() == 128L * 128L)
  }

  test("compact: many small files → few target-size files, content identical") {
    val in = tmp("graft-compact-in")
    val out = tmp("graft-compact-out")
    val events = TestData.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("value"))
    events.repartition(32).write.mode("overwrite").parquet(in)

    val (nBefore, nAfter) = Layout.compact(spark, in, out, targetBytes = 64L * 1024 * 1024)
    assert(nBefore == 32)
    assert(nAfter < 4, s"expected ≤3 compacted files, got $nAfter")

    def digest(p: String): (Long, Double) =
      spark.read.parquet(p)
        .agg(count(lit(1)), sum(col("value").cast("decimal(18,2)")).cast("double"))
        .as[(Long, Double)].collect().head
    assert(digest(in) == digest(out))
  }
}
