package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Versioned-table layer: snapshot-on-write + time travel + snapshot expiry —
 * the Iceberg table-format verbs (snapshots, `VERSION AS OF`,
 * expire_snapshots) over plain parquet directories.
 *
 * Layout: `basePath/v=N/part-*.parquet` data files plus a `v=N/_manifest`
 * listing every data file (base-relative path) the snapshot consists of —
 * the parquet-implemented stand-in for Iceberg's manifest lists. A version
 * may therefore SHARE files with its ancestors: [[append]] writes only the
 * delta and inherits the previous manifest, so snapshot N+1 costs O(delta),
 * not O(table) — the property that makes a 100 TB versioned table
 * affordable. [[write]] (full replace) and [[mergeInto]] (copy-on-write
 * upsert) still rewrite, as they must.
 *
 * Commit protocol: data files land first, then the manifest is staged and
 * RENAMED into place — rename is atomic on HDFS/local, so the version
 * appears all-or-nothing (on a real deployment the pointer is a catalog
 * CAS / Iceberg metadata.json commit — same verbs, swap the pointer).
 *
 * Scale: time travel costs one small-file read; expiry deletes only files
 * unreferenced by surviving manifests, so shared files outlive the
 * versions that wrote them.
 */
object Snapshots {

  private def fs(spark: SparkSession, base: String) =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(base: String, v: Long) = new Path(s"$base/v=$v/_manifest")

  /**
   * All committed versions, ascending. "Committed" = `_manifest` exists:
   * the manifest is renamed into place only after every data file is fully
   * written, so a manifest-less `v=N` directory is an in-flight (or
   * crashed) write — treating it as committed would hand readers a partial
   * snapshot and make `write` allocate the next version on top of garbage.
   * Gating on the manifest keeps both snapshot isolation and
   * crash-retryability (a failed write's directory is simply never visible
   * and gets overwritten on retry).
   */
  def versions(spark: SparkSession, base: String): Seq[Long] = {
    val f = fs(spark, base)
    val p = new Path(base)
    if (!f.exists(p)) Seq.empty
    else
      // one glob instead of an exists() RPC per version dir — a table with
      // hundreds of snapshots on an object store must not pay N+1 listings
      f.globStatus(new Path(p, "v=*/_manifest")).toSeq
        .map(_.getPath.getParent.getName.stripPrefix("v=").toLong)
        .sorted
  }

  /** Base-relative data-file paths of version `v`, in manifest order. */
  def manifestFiles(spark: SparkSession, base: String, v: Long): Seq[String] = {
    val in = fs(spark, base).open(manifestPath(base, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toVector
    finally in.close()
  }

  /** The freshly-written `part-*` files under `v=N`, base-relative. */
  private def ownFiles(spark: SparkSession, base: String, v: Long): Seq[String] = {
    fs(spark, base).listStatus(new Path(s"$base/v=$v")).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("part-"))
      .sorted
      .map(n => s"v=$v/$n")
  }

  /** Stage + atomic-rename the manifest: the version's commit point. */
  private def commitManifest(spark: SparkSession, base: String, v: Long,
                             files: Seq[String]): Unit = {
    val f = fs(spark, base)
    val tmp = new Path(s"$base/v=$v/_manifest.tmp")
    val out = f.create(tmp, true)
    try out.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    require(f.rename(tmp, manifestPath(base, v)),
      s"manifest commit failed for $base v=$v")
  }

  /** Commit `df` as the next FULL version (complete replace); returns the
    * new version number. Overwrite mode: under the SINGLE-WRITER assumption
    * (the norm for a versioned table without a catalog), the only way
    * `v=next` already exists is a crashed write that never gained its
    * manifest (invisible to `versions`) — the retry must be able to reclaim
    * that directory. Two concurrent writers could race to the same version
    * number; that coordination belongs to the catalog, not the layout. */
  def write(df: DataFrame, base: String): Long = {
    val spark = df.sparkSession
    val next = versions(spark, base).lastOption.getOrElse(0L) + 1
    df.write.mode("overwrite").parquet(s"$base/v=$next")
    commitManifest(spark, base, next, ownFiles(spark, base, next))
    next
  }

  /**
   * Commit `df` as the next version by APPENDING: only the delta's files
   * are written; every file of the previous version is inherited by
   * manifest reference. This is the incremental-metadata path — version
   * N+1's write cost is proportional to the delta, and unchanged files are
   * stored once however many snapshots reference them (pinned in
   * SnapshotsSpec). With no prior version this is exactly [[write]].
   */
  def append(df: DataFrame, base: String): Long = {
    val spark = df.sparkSession
    val vs = versions(spark, base)
    val next = vs.lastOption.getOrElse(0L) + 1
    val inherited = vs.lastOption.map(manifestFiles(spark, base, _)).getOrElse(Seq.empty)
    df.write.mode("overwrite").parquet(s"$base/v=$next")
    commitManifest(spark, base, next, inherited ++ ownFiles(spark, base, next))
    next
  }

  /** Read latest (None) or `VERSION AS OF` (Some(v)): the manifest's file
    * list, wherever those files physically live. mergeSchema so a column
    * added by a later append is null-filled on inherited files instead of
    * silently dropped. */
  def read(spark: SparkSession, base: String, version: Option[Long] = None): DataFrame = {
    val vs = versions(spark, base)
    require(vs.nonEmpty, s"no snapshots under $base")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs")
    val files = manifestFiles(spark, base, v).map(rel => s"$base/$rel")
    spark.read.option("mergeSchema", true).parquet(files: _*)
  }

  /** expire_snapshots: keep the newest `keep` versions; drop the rest.
    * A dropped version's manifest goes first (the version becomes
    * invisible atomically), then its data files — EXCEPT those still
    * referenced by a surviving manifest, which stay until the last
    * referencing snapshot expires. */
  def expire(spark: SparkSession, base: String, keep: Int): Seq[Long] = {
    val vs = versions(spark, base)
    val drop = vs.dropRight(math.max(1, keep))
    val kept = vs.drop(drop.length)
    val f = fs(spark, base)
    val referenced = kept.flatMap(manifestFiles(spark, base, _)).toSet
    drop.foreach { v =>
      f.delete(manifestPath(base, v), false)
      val dir = new Path(s"$base/v=$v")
      val leftover = f.listStatus(dir).toSeq.filterNot(st =>
        referenced(s"v=$v/${st.getPath.getName}"))
      leftover.foreach(st => f.delete(st.getPath, true))
      if (f.listStatus(dir).isEmpty) f.delete(dir, true)
    }
    drop
  }

  /**
   * MERGE INTO (upsert-by-key): source rows replace same-key target rows,
   * unmatched source rows insert; the merged table lands as the NEXT
   * version (snapshot isolation — readers of the old version see nothing
   * until the new directory is complete). Anti-join + union: one shuffle on
   * the key, broadcast when the source is small.
   *
   * Copy-on-write at FILE granularity (Iceberg's merge-on-write): only the
   * data files that actually CONTAIN a matched key are rewritten; every
   * untouched file is inherited into the new manifest by reference. A
   * point-update of one key in a 100 TB table rewrites one file, not the
   * table (pinned in SnapshotsSpec). The touched-file discovery is a
   * semi-join + distinct over file names — its result is bounded by the
   * file count, never the row count.
   */
  def mergeInto(spark: SparkSession, base: String, source: DataFrame,
                key: String): Long = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    val vs = versions(spark, base)
    val next = vs.lastOption.getOrElse(0L) + 1
    val prior = vs.lastOption.map(manifestFiles(spark, base, _)).getOrElse(Seq.empty)
    val target = read(spark, base).withColumn("__file", input_file_name())
    // which files hold a matched key? (bounded: ≤ #files rows)
    val touched: Set[String] = target
      .join(source.select(col(key)), Seq(key), "left_semi")
      .select(col("__file")).distinct()
      .collect().map(_.getString(0)).toSet
    // manifest entries are base-relative; input_file_name is a URI — match
    // by the v=N/part-... suffix
    val (rewrite, inherit) = prior.partition(rel => touched.exists(_.endsWith(rel)))
    require(rewrite.size == touched.size,
      s"merge file accounting: ${touched.size} touched vs ${rewrite.size} manifest matches")
    val kept = target
      .filter(col("__file").isin(touched.toSeq: _*))
      .drop("__file")
      .join(source.select(col(key)), Seq(key), "left_anti")
    kept.unionByName(source).write.mode("overwrite").parquet(s"$base/v=$next")
    commitManifest(spark, base, next, inherit ++ ownFiles(spark, base, next))
    next
  }

  /**
   * DELETE WHERE, copy-on-write at file granularity: only files that
   * contain a matching row are rewritten (minus those rows); every clean
   * file is inherited by manifest reference. Deleting one key from a
   * 100 TB table rewrites one file. A predicate matching nothing commits
   * a version that inherits everything (cheap no-op snapshot).
   */
  def deleteWhere(spark: SparkSession, base: String,
                  predicate: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.{col, input_file_name, lit, not, coalesce}
    val vs = versions(spark, base)
    require(vs.nonEmpty, s"no snapshots under $base")
    val next = vs.last + 1
    val prior = manifestFiles(spark, base, vs.last)
    val target = read(spark, base).withColumn("__file", input_file_name())
    val touched: Set[String] = target.filter(predicate)
      .select(col("__file")).distinct()
      .collect().map(_.getString(0)).toSet
    val (rewrite, inherit) = prior.partition(rel => touched.exists(_.endsWith(rel)))
    // same loud guard as mergeInto: a touched file that fails the suffix
    // match (URI-encoding drift) would be inherited AND rewritten —
    // silent row duplication. Fail instead.
    require(rewrite.size == touched.size,
      s"delete file accounting: ${touched.size} touched vs ${rewrite.size} manifest matches")
    val kept = target
      .filter(col("__file").isin(touched.toSeq: _*))
      // SQL DELETE semantics: rows where the predicate is NULL are KEPT
      .filter(not(coalesce(predicate, lit(false))))
      .drop("__file")
    kept.write.mode("overwrite").parquet(s"$base/v=$next")
    commitManifest(spark, base, next, inherit ++ ownFiles(spark, base, next))
    next
  }

  /**
   * Compaction (Iceberg `rewrite_data_files` / OPTIMIZE bin-packing): data
   * files smaller than `smallBytes` are rewritten together into
   * ~`targetBytes`-sized files; files already big enough are inherited
   * untouched. The small-file problem is THE operational tax of a
   * heavily-appended 100 TB table — every scan pays a task per file —
   * and compaction pays it down without touching well-sized data.
   * Content is bit-identical (pinned in SnapshotsSpec); returns the new
   * version (or the current one when ≤1 small file exists — nothing to
   * bin-pack, no empty snapshot churn).
   */
  def compact(spark: SparkSession, base: String, smallBytes: Long,
              targetBytes: Long = 128L * 1024 * 1024): Long = {
    val vs = versions(spark, base)
    require(vs.nonEmpty, s"no snapshots under $base")
    val prior = manifestFiles(spark, base, vs.last)
    val f = fs(spark, base)
    val sized = prior.map(rel => rel -> f.getFileStatus(new Path(s"$base/$rel")).getLen)
    val (small, big) = sized.partition(_._2 < smallBytes)
    if (small.size <= 1) return vs.last
    val next = vs.last + 1
    val nOut = math.max(1, math.ceil(small.map(_._2).sum.toDouble / targetBytes).toInt)
    spark.read.option("mergeSchema", true)
      .parquet(small.map { case (rel, _) => s"$base/$rel" }: _*)
      .repartition(nOut)
      .write.mode("overwrite").parquet(s"$base/v=$next")
    commitManifest(spark, base, next, big.map(_._1) ++ ownFiles(spark, base, next))
    next
  }

  /**
   * Orphan-file GC: removes files in version directories that never gained
   * a manifest — crash debris from in-flight writes that died before their
   * commit point. Committed versions are untouched, and so is EVERY file a
   * surviving manifest references: [[expire]] deliberately leaves
   * still-shared data files behind in a dropped (now manifest-less)
   * version's directory, so vacuum must resolve references before
   * deleting, not treat "no manifest" as "all debris" — otherwise
   * write → append → expire → vacuum loses the surviving snapshot's data
   * (pinned in SnapshotsSpec). A manifest-less directory is removed only
   * once it is empty. SINGLE-WRITER assumption applies (a LIVE concurrent
   * write's directory would look identical to debris; with a catalog this
   * check is a lease, not a listing). Returns removed paths.
   */
  def vacuum(spark: SparkSession, base: String): Seq[String] = {
    val f = fs(spark, base)
    val p = new Path(base)
    if (!f.exists(p)) return Seq.empty
    val committed = versions(spark, base).toSet
    val referenced = committed.toSeq.flatMap(manifestFiles(spark, base, _)).toSet
    f.globStatus(new Path(p, "v=*")).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(d => scala.util.Try(
        d.getName.stripPrefix("v=").toLong).toOption.exists(!committed(_)))
      .flatMap { d =>
        val v = d.getName
        val removed = f.listStatus(d).toSeq
          .filterNot(st => referenced(s"$v/${st.getPath.getName}"))
          .map { st => f.delete(st.getPath, true); st.getPath.toString }
        if (f.listStatus(d).isEmpty) { f.delete(d, true); removed :+ d.toString }
        else removed
      }
  }

  /**
   * CDC between two snapshots: full-outer join on the key, rows classified
   * `insert` / `delete` / `update` (any non-key column changed; unchanged
   * rows drop out). The changed-row check hashes over the UNION of both
   * versions' columns (a column only one side has is null-filled on the
   * other) so schema evolution between snapshots is visible as `update`
   * rather than silently ignored — and a dropped column can't throw.
   */
  /**
   * Incremental maintenance of a SUM/COUNT materialized aggregate between
   * two snapshots — the materialized-view path that makes a 100 TB rollup
   * affordable: instead of re-aggregating the whole new snapshot, compute
   * the per-group delta contributed by changed rows only.
   *
   * Returns (groupCols..., cnt_delta, sum_delta). The CDC key-diff finds
   * changed keys; each version is then SEMI-joined to its changed-key side
   * (deleted+updated rows subtract, inserted+updated rows add), so the
   * expensive aggregation runs over |changed rows|, not |table|. Sums stay
   * decimal — decimal addition is exact and associative, so
   * `applyAggDelta(matAgg(v1), delta)` is bit-identical to recomputing the
   * aggregate from v2 (pinned in SnapshotsSpec).
   */
  def incrementalAggDelta(spark: SparkSession, base: String, fromV: Long,
                          toV: Long, key: String, groupCols: Seq[String],
                          valueCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val changed = diff(spark, base, fromV, toV, key)
    val gone = changed.filter(col("change_type").isin("delete", "update")).select(col(key))
    val came = changed.filter(col("change_type").isin("insert", "update")).select(col(key))
    def side(v: Long, keys: DataFrame, sign: Int) =
      read(spark, base, Some(v))
        .join(keys, Seq(key), "left_semi")
        .groupBy(groupCols.map(col): _*)
        .agg(sum(lit(sign.toLong)).as("cnt_d"),
          sum(col(valueCol).cast("decimal(18,2)") * sign).as("sum_d"))
    side(fromV, gone, -1).unionByName(side(toV, came, +1))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("cnt_d")).as("cnt_delta"), sum(col("sum_d")).as("sum_delta"))
  }

  /** Apply an [[incrementalAggDelta]] to a (groupCols..., n, total) decimal
    * aggregate; groups whose count reaches zero drop out (full-outer +
    * coalesce — a delta may create or retire a group). */
  def applyAggDelta(matAgg: DataFrame, delta: DataFrame,
                    groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    matAgg.join(delta, groupCols, "full_outer")
      .select(groupCols.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("cnt_delta"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(java.math.BigDecimal.ZERO).cast("decimal(28,2)")) +
          coalesce(col("sum_delta"), lit(java.math.BigDecimal.ZERO).cast("decimal(28,2)")))
          .as("total")): _*)
      .filter(col("n") > 0)
  }

  def diff(spark: SparkSession, base: String, fromV: Long, toV: Long,
           key: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val fromCols = read(spark, base, Some(fromV)).columns.toSeq
    val toCols = read(spark, base, Some(toV)).columns.toSeq
    // stable order: fromV's columns first, then toV-only additions
    val cols = fromCols ++ toCols.filterNot(fromCols.contains)
    def hashed(v: Long, tag: String) = {
      val df = read(spark, base, Some(v))
      val present = df.columns.toSet
      val hashInputs = cols.filterNot(_ == key).map(c =>
        if (present(c)) col(c) else lit(null).as(c))
      df.select(col(key), xxhash64(struct(hashInputs: _*)).as(s"__h_$tag"))
    }
    val from = hashed(fromV, "from")
    val to = hashed(toV, "to")
    from.join(to, Seq(key), "full_outer")
      .withColumn("change_type",
        when(col("__h_from").isNull, lit("insert"))
          .when(col("__h_to").isNull, lit("delete"))
          .when(col("__h_from") =!= col("__h_to"), lit("update")))
      .filter(col("change_type").isNotNull)
      .select(col(key), col("change_type"))
  }
}
