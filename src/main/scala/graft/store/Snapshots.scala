package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Versioned-table layer: snapshot-on-write + time travel + snapshot expiry —
 * the Iceberg table-format verbs (snapshots, `VERSION AS OF`,
 * expire_snapshots) over plain parquet directories.
 *
 * Layout: `basePath/v=N/part-*.parquet`. A write never mutates an existing
 * version — it lands a complete new directory and the new version becomes
 * visible only when its directory is fully written (readers list versions at
 * read time, and Spark's _SUCCESS-marker write protocol makes the directory
 * appear atomically-complete on any filesystem with atomic rename; on a real
 * deployment the version pointer is a catalog row / Iceberg metadata.json
 * commit — same verbs, swap the pointer implementation).
 *
 * Scale: time travel costs nothing at read time beyond choosing a directory;
 * old snapshots share nothing (full copies) — at 100 TB you'd want Iceberg's
 * manifest-level sharing, which is exactly why the API mirrors its verbs so
 * the swap is mechanical.
 */
object Snapshots {

  private def fs(spark: SparkSession, base: String) =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All committed versions, ascending. */
  def versions(spark: SparkSession, base: String): Seq[Long] = {
    val f = fs(spark, base)
    val p = new Path(base)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted
  }

  /** Commit `df` as the next version; returns the new version number. */
  def write(df: DataFrame, base: String): Long = {
    val next = versions(df.sparkSession, base).lastOption.getOrElse(0L) + 1
    df.write.mode("errorifexists").parquet(s"$base/v=$next")
    next
  }

  /** Read latest (None) or `VERSION AS OF` (Some(v)). */
  def read(spark: SparkSession, base: String, version: Option[Long] = None): DataFrame = {
    val vs = versions(spark, base)
    require(vs.nonEmpty, s"no snapshots under $base")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs")
    spark.read.parquet(s"$base/v=$v")
  }

  /** expire_snapshots: keep the newest `keep` versions, delete the rest. */
  def expire(spark: SparkSession, base: String, keep: Int): Seq[Long] = {
    val vs = versions(spark, base)
    val drop = vs.dropRight(math.max(1, keep))
    val f = fs(spark, base)
    drop.foreach(v => f.delete(new Path(s"$base/v=$v"), true))
    drop
  }
}
