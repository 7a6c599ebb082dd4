package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persistent incrementally-maintained aggregate view over a [[Snapshots]]
 * table — the materialized-view lifecycle that makes a 100 TB rollup
 * affordable: the view is created once with a full aggregation, then each
 * [[refresh]] advances it by aggregating ONLY the rows that changed since
 * the last refresh.
 *
 * The view itself is a snapshot table of shape
 * `(groupCols..., n: bigint, total: decimal(28,2), _src_version: bigint)`:
 * `n`/`total` are COUNT/SUM of the value column (decimal, so incremental
 * application is bit-identical to a full recompute — decimal addition is
 * exact and associative), and `_src_version` is the source snapshot the
 * view reflects, carried on every row so the anchor commits ATOMICALLY
 * with the aggregate it describes (a sidecar meta file could be lost
 * between commits, and a stale anchor would double-apply the next delta).
 *
 * Refresh strategy, in cost order:
 *  1. source head == anchor → no-op (no new MV version).
 *  2. the history since the anchor is a pure append chain →
 *     [[Snapshots.appendedSince]] reads ONLY the added files (O(delta)
 *     scan, manifest set-diff planning), the delta aggregates map-side,
 *     and [[Snapshots.applyAggDelta]] folds it into the current view —
 *     the view table is |groups|-sized, so the rewrite is bounded by
 *     group cardinality, not source size.
 *  3. a rewrite version (merge / CoW delete / compact) broke the append
 *     chain → fall back to the CDC delta ([[Snapshots.incrementalAggDelta]]
 *     over `cdcKey`), which subtracts removed rows and adds new ones;
 *     groups whose count reaches zero drop out. Requires `cdcKey`.
 *
 * The anchor version must still exist when refresh runs — and the
 * library guarantees it: every create/refresh PINS its anchor with a
 * [[Snapshots.tag]] on the SOURCE table (name derived from the view
 * path) and drops the previous pin, so however aggressive
 * `expire`/`maintain` runs between refreshes, the version a view still
 * needs — the one the CDC fallback diffs against — can never be
 * collected. Concurrent refreshes serialize on the view's optimistic
 * commit — a loser sees [[Snapshots.SnapshotConflictException]] and can
 * simply re-run (the anchor read repeats, so replays are exactly-once).
 */
object MatView {
  /** Anchor column carried on every view row (uniform per version). */
  val SrcVersionCol = "_src_version"

  /** Explicit marker column (round-15, advisor item): TRUE only on the
    * one all-null row an EMPTY view body commits to keep its anchor.
    * Before this the readers keyed "marker" on a null aggregate value —
    * which conflated the marker with a REAL group whose distinct-column
    * values are all NULL (hll_sketch_agg yields a null sketch), silently
    * dropping that group from distinct views. */
  val MarkerCol = "__mv_marker"

  /** Deterministic per-view pin-tag PREFIX on the SOURCE table: derived
    * from the view's base path, so one source can carry pins from many
    * views. Each anchor gets its own tag (`<prefix>-v<anchor>`). */
  private[store] def pinPrefix(mvBase: String): String = {
    val h = java.security.MessageDigest.getInstance("SHA-1")
      .digest(mvBase.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
    s"mv-pin-$h"
  }

  /** Pin `anchor` BEFORE the view commit that will reference it (round-15,
    * advisor item: the old pin-AFTER-commit left a window — crash between
    * the view write and the pin, or a concurrent expire inside the old
    * drop-then-create — where an aggressive expire could collect the
    * anchor the next refresh needs). Create-new-then-drop-old means SOME
    * pin always covers every version a committed view references; losing
    * the tag-create race to a concurrent refresher of the same view is
    * fine (the tag then exists with the right target). */
  private def pinAnchorPre(spark: SparkSession, srcBase: String,
                           mvBase: String, anchor: Long): Unit = {
    val name = s"${pinPrefix(mvBase)}-v$anchor"
    if (!Snapshots.tags(spark, srcBase).contains(name))
      try Snapshots.tag(spark, srcBase, name, anchor)
      catch { case _: java.io.IOException
          if Snapshots.tags(spark, srcBase).contains(name) => () }
  }

  /** AFTER a successful view commit: drop every pin of this view except
    * the one covering `anchor` (also collects pre-round-15 single-name
    * pins and any crash-orphaned pre-pins). */
  private def dropStalePins(spark: SparkSession, srcBase: String,
                            mvBase: String, anchor: Long): Unit = {
    val pre = pinPrefix(mvBase)
    val keep = s"$pre-v$anchor"
    Snapshots.tags(spark, srcBase).keys
      .filter(n => (n == pre || n.startsWith(s"$pre-v")) && n != keep)
      .foreach(Snapshots.dropTag(spark, srcBase, _))
  }

  /** Drop the view's pins on its source (call when retiring a view so its
    * anchor snapshot becomes expirable again). */
  def unpin(spark: SparkSession, srcBase: String, mvBase: String): Boolean = {
    val pre = pinPrefix(mvBase)
    Snapshots.tags(spark, srcBase).keys
      .filter(n => n == pre || n.startsWith(s"$pre-v")).toSeq
      .map(Snapshots.dropTag(spark, srcBase, _))
      .exists(identity)
  }

  private def aggregate(df: DataFrame, groupCols: Seq[String],
                        valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)"))
          .cast("decimal(28,2)").as("total"))

  /**
   * Stamp the anchor onto `df` — and keep it stamped even when the view
   * body is EMPTY (a CDC refresh can retire every group; a view created
   * over an empty source starts that way): the anchor rides only on data
   * rows, so a zero-row commit would lose it permanently and brick the
   * next refresh. An empty body commits ONE marker row: all-null except
   * the anchor and the explicit [[MarkerCol]] flag — the flag (not a null
   * aggregate) is what readers filter on, so a REAL group whose sketch is
   * null (all-NULL distinct values) is never mistaken for the marker.
   * The frame is eagerly localCheckpoint'd so the emptiness probe and the
   * write share one computation of the delta.
   */
  private def anchored(df: DataFrame, head: Long): DataFrame = {
    val out = df.withColumn(SrcVersionCol, lit(head))
      .withColumn(MarkerCol, lit(false)).localCheckpoint()
    if (!out.isEmpty) out
    else {
      val relaxed = org.apache.spark.sql.types.StructType(out.schema.map(f =>
        if (f.name == SrcVersionCol || f.name == MarkerCol) f
        else f.copy(nullable = true)))
      out.sparkSession.createDataFrame(
        java.util.Collections.singletonList(
          org.apache.spark.sql.Row.fromSeq(relaxed.map(f =>
            if (f.name == SrcVersionCol) head
            else if (f.name == MarkerCol) true
            else null))),
        relaxed)
    }
  }

  /** The view's REAL rows: marker row out (explicit flag; legacy views
    * without the flag fall back to the null-aggregate heuristic on
    * `legacyAggCol`), marker column dropped. */
  private def bodyRows(df: DataFrame, legacyAggCol: String): DataFrame =
    if (df.columns.contains(MarkerCol))
      df.filter(!coalesce(col(MarkerCol), lit(false))).drop(MarkerCol)
    else df.filter(col(legacyAggCol).isNotNull)

  /** Full build from the source's current snapshot; the view starts at
    * version 1 anchored (and source-pinned) to the source head. */
  def create(spark: SparkSession, srcBase: String, mvBase: String,
             groupCols: Seq[String], valueCol: String): Long = {
    val head = Snapshots.versions(spark, srcBase).last
    pinAnchorPre(spark, srcBase, mvBase, head)
    val v = Snapshots.write(
      anchored(aggregate(Snapshots.read(spark, srcBase), groupCols, valueCol),
        head),
      mvBase)
    dropStalePins(spark, srcBase, mvBase, head)
    v
  }

  /** The view's rows without the bookkeeping columns (and without the
    * empty-view marker row — filtered on the explicit marker flag). */
  def read(spark: SparkSession, mvBase: String): DataFrame =
    bodyRows(Snapshots.read(spark, mvBase), "n").drop(SrcVersionCol)

  /** Source version the view currently reflects (read from the rows; the
    * empty-view marker carries it when every group retired). */
  def anchor(spark: SparkSession, mvBase: String): Long = {
    val r = Snapshots.read(spark, mvBase)
      .agg(max(col(SrcVersionCol))).head
    require(!r.isNullAt(0),
      s"view $mvBase carries no anchor (zero rows, pre-marker layout) - " +
        "re-create the view")
    r.getLong(0)
  }

  /**
   * Advance the view to the source head. Returns the view's (possibly
   * unchanged) latest version. `cdcKey` names a unique row key used only
   * by the rewrite-chain fallback; omitting it makes a rewrite since the
   * anchor an error (IllegalStateException) instead of a silent full
   * recompute — at 100 TB the caller should KNOW when O(delta) stopped
   * being available.
   */
  def refresh(spark: SparkSession, srcBase: String, mvBase: String,
              groupCols: Seq[String], valueCol: String,
              cdcKey: Option[String] = None): Long = {
    val mvVersions = Snapshots.versions(spark, mvBase)
    require(mvVersions.nonEmpty, s"no materialized view under $mvBase - run create first")
    val mv = bodyRows(Snapshots.read(spark, mvBase), "n")
    val from = anchor(spark, mvBase)
    val head = Snapshots.versions(spark, srcBase).last
    if (head == from) return mvVersions.last
    // the NEW anchor is pinned before the commit that references it; the
    // OLD anchor's pin survives until after (the delta computation below
    // is lazy — it must still find the old version when the write runs)
    pinAnchorPre(spark, srcBase, mvBase, head)
    val delta =
      try {
        aggregate(Snapshots.appendedSince(spark, srcBase, from),
            groupCols, valueCol)
          .withColumnRenamed("n", "cnt_delta")
          .withColumnRenamed("total", "sum_delta")
      } catch {
        case e: IllegalArgumentException =>
          val key = cdcKey.getOrElse(throw new IllegalStateException(
            s"source history ($from, $head] of $srcBase is not a pure " +
              "append chain and no cdcKey was given for the CDC fallback: " +
              e.getMessage))
          Snapshots.incrementalAggDelta(spark, srcBase, from, head, key,
            groupCols, valueCol)
      }
    val v = Snapshots.write(
      anchored(Snapshots.applyAggDelta(mv.drop(SrcVersionCol), delta,
        groupCols), head),
      mvBase)
    dropStalePins(spark, srcBase, mvBase, head)
    v
  }

  // ── HLL distinct-count views ────────────────────────────────────────────

  /**
   * Distinct-count view backed by mergeable DataSketches HLLs: the
   * per-group state is a SKETCH (KB), not a distinct set, so maintaining
   * "distinct users per segment over 100 TB" costs a delta scan + a
   * |groups|-sized sketch merge per refresh — the rollup a12/a19 do
   * across days, here made a persistent anchored view. Sketches merge
   * but cannot SUBTRACT: [[refreshDistinctView]] accepts only pure
   * append chains and fails loudly on a rewritten history (rebuild with
   * [[createDistinctView]] — there is no cheaper sound option).
   */
  def createDistinctView(spark: SparkSession, srcBase: String, mvBase: String,
                         groupCols: Seq[String], distinctCol: String,
                         lgK: Int = 12): Long = {
    val head = Snapshots.versions(spark, srcBase).last
    pinAnchorPre(spark, srcBase, mvBase, head)
    val v = Snapshots.write(
      anchored(Snapshots.read(spark, srcBase)
        .groupBy(groupCols.map(col): _*)
        .agg(expr(s"hll_sketch_agg(`$distinctCol`, $lgK)").as("sketch")),
        head),
      mvBase)
    dropStalePins(spark, srcBase, mvBase, head)
    v
  }

  /** Advance the distinct view over the appended delta: sketch the delta,
    * union-merge per group (new groups appear automatically). */
  def refreshDistinctView(spark: SparkSession, srcBase: String, mvBase: String,
                          groupCols: Seq[String], distinctCol: String,
                          lgK: Int = 12): Long = {
    val mvVersions = Snapshots.versions(spark, mvBase)
    require(mvVersions.nonEmpty, s"no view under $mvBase - run createDistinctView first")
    val mv = bodyRows(Snapshots.read(spark, mvBase), "sketch")
    val from = anchor(spark, mvBase)
    val head = Snapshots.versions(spark, srcBase).last
    if (head == from) return mvVersions.last
    pinAnchorPre(spark, srcBase, mvBase, head)
    val delta =
      try Snapshots.appendedSince(spark, srcBase, from)
      catch {
        case e: IllegalArgumentException => throw new IllegalStateException(
          s"source history ($from, $head] of $srcBase is not a pure append " +
            "chain - HLL sketches cannot subtract removed rows; rebuild the " +
            s"view with createDistinctView: ${e.getMessage}")
      }
    val dAgg = delta.groupBy(groupCols.map(col): _*)
      .agg(expr(s"hll_sketch_agg(`$distinctCol`, $lgK)").as("sketch"))
    // real groups with a NULL sketch (all-NULL distinct values) survive the
    // fold — hll_union_agg ignores nulls per group and yields null only
    // when every input is null, which readDistinctView reports as 0
    val v = Snapshots.write(
      anchored(mv.drop(SrcVersionCol)
        .unionByName(dAgg)
        .groupBy(groupCols.map(col): _*)
        .agg(expr("hll_union_agg(sketch)").as("sketch")),
        head),
      mvBase)
    dropStalePins(spark, srcBase, mvBase, head)
    v
  }

  /** The distinct view's estimates: (groupCols..., approx_distinct). The
    * empty-view marker row is filtered on the explicit flag; a REAL group
    * whose distinct-column values are all NULL reports 0 (matching
    * `count(DISTINCT x)` over all-NULL x), not a dropped row. */
  def readDistinctView(spark: SparkSession, mvBase: String): DataFrame =
    bodyRows(Snapshots.read(spark, mvBase), "sketch")
      .withColumn("approx_distinct",
        coalesce(expr("hll_sketch_estimate(sketch)"), lit(0L)))
      .drop("sketch", SrcVersionCol)

  /**
   * foreachBatch body for CONTINUOUS view maintenance: exactly-once
   * append of the micro-batch into the source table (idempotent on
   * `(appId, batchId)` via [[Snapshots.appendStream]] — a redelivered
   * batch commits nothing), then an anchor-based catch-up [[refresh]].
   * No dual-commit machinery is needed for the view itself because
   * refresh IS a catch-up: a crash after the append but before the
   * refresh leaves the view one (or many) source versions behind, and
   * the next batch's refresh folds the whole backlog in one O(backlog
   * delta) pass; a crash after the refresh makes the replayed batch a
   * no-op on both tables. The view never double-counts and never misses
   * rows — exactly-once end to end from an at-least-once stream.
   */
  def ingestAndRefresh(batch: DataFrame, batchId: Long, srcBase: String,
                       mvBase: String, groupCols: Seq[String],
                       valueCol: String, appId: String,
                       statsKey: Option[String] = None): Long = {
    Snapshots.appendStream(batch, srcBase, appId, batchId, statsKey)
    refresh(batch.sparkSession, srcBase, mvBase, groupCols, valueCol)
  }
}
