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
 * The anchor version must still exist when refresh runs: pin it with a
 * [[Snapshots.tag]] if aggressive `expire` runs between refreshes.
 * Concurrent refreshes serialize on the view's optimistic commit — a
 * loser sees [[Snapshots.SnapshotConflictException]] and can simply
 * re-run (the anchor read repeats, so replays are exactly-once).
 */
object MatView {
  /** Anchor column carried on every view row (uniform per version). */
  val SrcVersionCol = "_src_version"

  private def aggregate(df: DataFrame, groupCols: Seq[String],
                        valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)"))
          .cast("decimal(28,2)").as("total"))

  /** Full build from the source's current snapshot; the view starts at
    * version 1 anchored to the source head. */
  def create(spark: SparkSession, srcBase: String, mvBase: String,
             groupCols: Seq[String], valueCol: String): Long = {
    val anchor = Snapshots.versions(spark, srcBase).last
    Snapshots.write(
      aggregate(Snapshots.read(spark, srcBase), groupCols, valueCol)
        .withColumn(SrcVersionCol, lit(anchor)),
      mvBase)
  }

  /** The view's rows without the anchor bookkeeping column. */
  def read(spark: SparkSession, mvBase: String): DataFrame =
    Snapshots.read(spark, mvBase).drop(SrcVersionCol)

  /** Source version the view currently reflects. */
  def anchor(spark: SparkSession, mvBase: String): Long =
    Snapshots.read(spark, mvBase)
      .agg(max(col(SrcVersionCol))).head.getLong(0)

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
    val mv = Snapshots.read(spark, mvBase)
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
    Snapshots.write(
      Snapshots.applyAggDelta(mv.drop(SrcVersionCol), delta, groupCols)
        .withColumn(SrcVersionCol, lit(head)),
      mvBase)
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
    val anchor = Snapshots.versions(spark, srcBase).last
    Snapshots.write(
      Snapshots.read(spark, srcBase)
        .groupBy(groupCols.map(col): _*)
        .agg(expr(s"hll_sketch_agg(`$distinctCol`, $lgK)").as("sketch"))
        .withColumn(SrcVersionCol, lit(anchor)),
      mvBase)
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
    Snapshots.write(
      mv.drop(SrcVersionCol).unionByName(dAgg)
        .groupBy(groupCols.map(col): _*)
        .agg(expr("hll_union_agg(sketch)").as("sketch"))
        .withColumn(SrcVersionCol, lit(head)),
      mvBase)
  }

  /** The distinct view's estimates: (groupCols..., approx_distinct). */
  def readDistinctView(spark: SparkSession, mvBase: String): DataFrame =
    Snapshots.read(spark, mvBase)
      .select(col("*"))
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
