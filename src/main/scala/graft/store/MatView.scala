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

  /** Deterministic per-view pin-tag name on the SOURCE table: derived
    * from the view's base path, so one source can carry pins from many
    * views and a re-created view reuses (re-points) its own pin. */
  private[store] def pinName(mvBase: String): String = {
    val h = java.security.MessageDigest.getInstance("SHA-1")
      .digest(mvBase.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
    s"mv-pin-$h"
  }

  /** Re-point the view's source pin to `anchor` (tags are immutable —
    * drop-then-create; the window where no pin exists is harmless
    * because the caller holds the just-committed view whose refresh has
    * already read everything it needs from the old anchor). */
  private def pinAnchor(spark: SparkSession, srcBase: String, mvBase: String,
                        anchor: Long): Unit = {
    val name = pinName(mvBase)
    if (!Snapshots.tags(spark, srcBase).get(name).contains(anchor)) {
      Snapshots.dropTag(spark, srcBase, name)
      Snapshots.tag(spark, srcBase, name, anchor)
    }
  }

  /** Drop the view's pin on its source (call when retiring a view so its
    * anchor snapshot becomes expirable again). */
  def unpin(spark: SparkSession, srcBase: String, mvBase: String): Boolean =
    Snapshots.dropTag(spark, srcBase, pinName(mvBase))

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
   * the anchor column. Markers are invisible to every reader (filtered
   * on the null aggregate — `n` is count(*) and a sketch is an agg
   * value, so a REAL row can never carry null there) and contribute
   * nothing to the next delta application. The frame is eagerly
   * localCheckpoint'd so the emptiness probe and the write share one
   * computation of the delta.
   */
  private def anchored(df: DataFrame, head: Long): DataFrame = {
    val out = df.withColumn(SrcVersionCol, lit(head)).localCheckpoint()
    if (!out.isEmpty) out
    else {
      val relaxed = org.apache.spark.sql.types.StructType(out.schema.map(f =>
        if (f.name == SrcVersionCol) f else f.copy(nullable = true)))
      out.sparkSession.createDataFrame(
        java.util.Collections.singletonList(
          org.apache.spark.sql.Row.fromSeq(relaxed.map(f =>
            if (f.name == SrcVersionCol) head else null))),
        relaxed)
    }
  }

  /** Full build from the source's current snapshot; the view starts at
    * version 1 anchored (and source-pinned) to the source head. */
  def create(spark: SparkSession, srcBase: String, mvBase: String,
             groupCols: Seq[String], valueCol: String): Long = {
    val head = Snapshots.versions(spark, srcBase).last
    val v = Snapshots.write(
      anchored(aggregate(Snapshots.read(spark, srcBase), groupCols, valueCol),
        head),
      mvBase)
    pinAnchor(spark, srcBase, mvBase, head)
    v
  }

  /** The view's rows without the anchor bookkeeping column (and without
    * the empty-view marker row, which has a null `n`). */
  def read(spark: SparkSession, mvBase: String): DataFrame =
    Snapshots.read(spark, mvBase).filter(col("n").isNotNull)
      .drop(SrcVersionCol)

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
    val mv = Snapshots.read(spark, mvBase).filter(col("n").isNotNull)
    val from = anchor(spark, mvBase)
    val head = Snapshots.versions(spark, srcBase).last
    if (head == from) return mvVersions.last
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
    pinAnchor(spark, srcBase, mvBase, head)
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
    val v = Snapshots.write(
      anchored(Snapshots.read(spark, srcBase)
        .groupBy(groupCols.map(col): _*)
        .agg(expr(s"hll_sketch_agg(`$distinctCol`, $lgK)").as("sketch")),
        head),
      mvBase)
    pinAnchor(spark, srcBase, mvBase, head)
    v
  }

  /** Advance the distinct view over the appended delta: sketch the delta,
    * union-merge per group (new groups appear automatically). */
  def refreshDistinctView(spark: SparkSession, srcBase: String, mvBase: String,
                          groupCols: Seq[String], distinctCol: String,
                          lgK: Int = 12): Long = {
    val mvVersions = Snapshots.versions(spark, mvBase)
    require(mvVersions.nonEmpty, s"no view under $mvBase - run createDistinctView first")
    val mv = Snapshots.read(spark, mvBase)
    val from = anchor(spark, mvBase)
    val head = Snapshots.versions(spark, srcBase).last
    if (head == from) return mvVersions.last
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
    val v = Snapshots.write(
      anchored(mv.drop(SrcVersionCol).filter(col("sketch").isNotNull)
        .unionByName(dAgg)
        .groupBy(groupCols.map(col): _*)
        .agg(expr("hll_union_agg(sketch)").as("sketch")),
        head),
      mvBase)
    pinAnchor(spark, srcBase, mvBase, head)
    v
  }

  /** The distinct view's estimates: (groupCols..., approx_distinct); the
    * empty-view marker (null sketch) is filtered out. */
  def readDistinctView(spark: SparkSession, mvBase: String): DataFrame =
    Snapshots.read(spark, mvBase)
      .filter(col("sketch").isNotNull)
      .withColumn("approx_distinct", expr("hll_sketch_estimate(sketch)"))
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
