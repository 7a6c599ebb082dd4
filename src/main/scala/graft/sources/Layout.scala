package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Write-time layout + table maintenance — the storage-side half of the
 * 100 TB design (SCALE.md "Storage layout"). The reference gets this from
 * Iceberg (partition specs, rewrite_data_files); with no iceberg runtime in
 * /opt/spark/jars the same operations are expressed directly against
 * parquet directories, keeping the verbs Iceberg-shaped so a catalog swap
 * is a config change, not a rewrite.
 */
object Layout {

  /**
   * Date-partitioned layout for event-time tables: Hive-style `dt=` dirs so
   * any engine prunes partitions from a date predicate. Within each
   * partition, rows are range-sorted by the sort keys → per-file min/max
   * stats are tight → row-group skipping works on top of partition pruning.
   */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String,
                           sortKeys: Seq[String] = Nil): Unit = {
    val withDt = df.withColumn("dt", to_date(col(tsCol)))
    val sorted =
      if (sortKeys.isEmpty) withDt
      else withDt.sortWithinPartitions((col("dt") +: sortKeys.map(col)): _*)
    sorted.write.mode("overwrite").partitionBy("dt").parquet(path)
  }

  /** Read back a date-partitioned table (partition pruning on `dt`). */
  def readDatePartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /**
   * Range-partitioned layout: global range partitioning + in-file sort on
   * the key gives every output file a DISJOINT key interval, so any engine
   * skips whole files from the parquet min/max stats on a key predicate —
   * the sort-order half of data skipping (the `dt=` layout is the
   * partition-pruning half). LayoutSpec asserts the disjointness.
   */
  def writeRangePartitioned(df: DataFrame, keyCol: String, nFiles: Int,
                            path: String): Unit =
    df.repartitionByRange(nFiles, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .write.mode("overwrite").parquet(path)

  /**
   * Z-order (Morton) key over two non-negative integer columns: bit i of
   * `x` lands at z-bit 2i, bit i of `y` at 2i+1, over the low `bitsPerCol`
   * bits of each. Range-partitioning + sorting by the z-key clusters rows
   * close in BOTH dimensions into the same files, so parquet min/max stats
   * prune predicates on EITHER/both columns — a single-key range sort only
   * skips on its leading key. This is Iceberg's `rewrite_data_files`
   * z-order strategy expressed as a pure column expression: built-in bit
   * ops only (whole-stage codegen, no UDF), and engine-portable — the
   * DuckDB oracle recomputes the identical key.
   */
  def zorderKey2(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
                 bitsPerCol: Int = 16): org.apache.spark.sql.Column =
    zorderKeyN(Seq(x, y), bitsPerCol)

  /**
   * N-column Morton key: bit `i` of column `j` lands at position
   * `i * N + j` (round-robin interleave; for N=2 this is exactly
   * [[zorderKey2]]'s layout, bit-identical). `bitsPerCol * N` must fit a
   * long's non-sign bits, so more dimensions trade per-dimension
   * resolution — the standard z-order dial (Delta's ZORDER BY accepts
   * the same multi-column list with the same caveat that locality
   * dilutes as dimensions grow).
   */
  def zorderKeyN(cols: Seq[org.apache.spark.sql.Column],
                 bitsPerCol: Int = 16): org.apache.spark.sql.Column = {
    val n = cols.size
    require(n >= 2, s"z-order interleaves at least two columns, got $n")
    require(bitsPerCol >= 1 && bitsPerCol * n <= 63,
      s"bitsPerCol * cols must fit a long: $bitsPerCol * $n")
    val terms = (0 until bitsPerCol).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftrightunsigned(c.cast("long"), i).bitwiseAND(1), i * n + j)
      }
    }
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /**
   * Z-ordered layout: range-partition + sort by the Morton key of
   * (xCol, yCol), then drop the key — each output file covers a compact
   * 2-D tile, so both columns' min/max stats stay tight per file.
   */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, nFiles: Int,
                    path: String, bitsPerCol: Int = 16): Unit =
    df.withColumn("__z", zorderKey2(col(xCol), col(yCol), bitsPerCol))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /**
   * Compact small files to ~`targetBytes` per output file — the
   * `rewrite_data_files` maintenance verb. Rewrites into `outPath`
   * (object-store pattern: write-new-then-flip-pointer; an in-place swap is
   * a catalog commit in Iceberg, a directory rename here).
   *
   * Returns (filesBefore, filesAfter).
   */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    def parquetFiles(p: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      val it = fs.listFiles(hp, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.toSeq
    }
    val before = parquetFiles(inPath)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outPath)
    (before.size, parquetFiles(outPath).size)
  }
}
