package graft.store

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * Table-as-stream-source: the snapshot store as a Structured Streaming
 * SOURCE — the Delta/Iceberg `spark.readStream.table(...)` twin, and the
 * read-side complement of [[Snapshots.appendStream]]/[[MatView]] (which
 * only let the store be a stream SINK). Consumers subscribe to a table
 * and receive every committed append as a micro-batch:
 *
 * {{{
 *   spark.readStream.format("graft-snapshots")
 *     .option("startingVersion", "1")      // or "latest"; default: first
 *     .option("maxVersionsPerTrigger", 1)  // admission control, optional
 *     .option("maxBytesPerTrigger", 10000000) // byte pacing, optional
 *     .option("branch", "staging")         // stream a branch's commits
 *     // CDC mode (Delta CDF twin): batches become the changes() feed
 *     .option("readChangeFeed", true).option("changeKey", "id")
 *     .load(base)
 * }}}
 *
 * This is the V1 [[Source]] surface (`StreamSourceProvider`), NOT a DSv2
 * `MicroBatchStream` — deliberately, and for the same reason Delta and
 * Spark's own FileStreamSource sit on it: `getBatch` returns a real
 * DataFrame that is SPLICED INTO each micro-batch's plan, so Catalyst
 * prunes columns, pushes filters into the parquet scan, and keeps the
 * vectorized reader — a streaming consumer doing
 * `.selectExpr("id").where("v > 0")` reads exactly one column through
 * columnar IO with `PushedFilters` at the scan. A DSv2 MicroBatchStream
 * CANNOT deliver any of that in this Spark: the engine builds its Scan
 * once at stream start with no pushdown pass (`MicroBatchExecution`
 * calls `newScanBuilder(options).build()` directly, and
 * `V2ScanRelationPushDown` matches only batch relations), so a V2
 * reader factory is locked to full-width row-based IO before the
 * query's projections are even known — the round-16 implementation paid
 * exactly that on every appended file. The streaming-engine integration
 * ([[SupportsAdmissionControl]], [[SupportsTriggerAvailableNow]],
 * checkpointed offsets) is surface-independent and unchanged.
 *
 * The design falls out of the committed-manifest model:
 *
 *  - OFFSETS ARE VERSION POSITIONS. Offset `v` means "every commit ≤ v
 *    has been delivered" and serializes as the bare number (checkpoint
 *    compatible across rounds); under byte pacing an offset may land
 *    MID-VERSION as `v#k` — "all of ≤ v, plus the first k added files
 *    of the next commit" (added-file order is manifest order, immutable,
 *    so replay is deterministic). `latestOffset` is one directory
 *    listing ([[Snapshots.versions]]), no file IO.
 *  - A MICRO-BATCH IS THE MANIFEST DELTA. The batch for `(start, end]`
 *    reads the data files present in `end`'s manifest and absent from
 *    `start`'s — O(delta) by construction: ten appended files out of
 *    100k mean ten files planned, never a table scan, and the planning
 *    itself is two manifest reads (O(versions-in-range) reads only when
 *    byte pacing slices inside commits).
 *  - APPEND-ONLY CONTRACT, enforced not assumed (Delta's default
 *    streaming semantics): a version range that REMOVES data files
 *    (compact/delete/update rewrites), carries pending MoR delete files,
 *    or pends a schema op that changes the read image of existing rows
 *    (rename/widen, ADD COLUMN with a non-null default) makes `getBatch`
 *    throw with the maintenance verb that restores streamability
 *    ([[Snapshots.materializeDeletes]] / [[Snapshots.materializeSchema]]).
 *    `option("ignoreChanges", true)` opts into Delta's relaxed mode:
 *    added files stream anyway, which re-delivers rows of rewritten
 *    files — the consumer owns dedup, same caveat Delta documents. A
 *    default-less ADD COLUMN streams without fuss (old files clip-read
 *    as NULL through the stream's declared schema).
 *  - ADMISSION CONTROL: `maxVersionsPerTrigger` paces whole commits;
 *    `maxBytesPerTrigger` (round-17) paces by ADDED BYTES read from the
 *    manifest's `#b=` length field (zero extra IO; entries from before
 *    the field cost one delta-scoped getFileStatus each) and
 *    `maxFilesPerTrigger` by added-file count — soft caps at file
 *    granularity, always admitting at least one file per trigger, so
 *    one 10 GB commit splits across triggers instead of blowing one.
 *    All three compose; `Trigger.AvailableNow` pins the catch-up target
 *    at query start so the run terminates while writers keep committing.
 *
 * CHANGE-DATA-FEED mode (Delta CDF streaming twin,
 * `option("readChangeFeed", true)` + `option("changeKey", <unique key>)`):
 * each micro-batch is the [[Snapshots.changes]] feed — insert / delete /
 * update pre+post PAIRS with `_change_type` and `_commit_version` — and
 * the append-only contract does not apply (rewrites are exactly what the
 * feed describes). Batches spanning several commits are planned ONE
 * VERSION AT A TIME and unioned, so `_commit_version` is per-commit
 * exact (the Delta convention) even under `ReadLimit.allAvailable`; the
 * first batch of a fresh stream is the initial snapshot as inserts,
 * stamped with its version. With `option("branch", ...)` the feed walks
 * the branch's own chain (round-17) — the WAP audit subscriber's
 * row-level view of staging. A provably PURE-APPEND commit (no removed
 * files, no MoR deletes, no image-op delta) streams its slice as a
 * direct clip-read of the added files tagged `insert` (round-18) — the
 * append-only 100 TB steady state pays plain-scan cost, never the
 * per-row-hash full_outer diff, which only rewriting commits need. The
 * same decomposition lets `maxBytesPerTrigger`/`maxFilesPerTrigger`
 * pace the FEED at file granularity (round-18): cuts land inside
 * pure-append commits as `v#k` offsets, while a rewriting commit admits
 * atomically as one trigger's unit — a 10 GB append commit streams its
 * CDF in paced batches instead of one giant one.
 *
 * 100 TB: every driver-side step is O(delta in versions + files
 * touched); nothing lists the table, nothing reads a shared file, and
 * row IO is executor-side through Spark's own pruned, filtered,
 * vectorized parquet scan.
 *
 * Reference streaming semantics: consumer-side event delivery per
 * redpanda_activity.py; the table-as-stream shape itself is the
 * lakehouse capability (SURVEY §2.10) the reference's broker fills with
 * Kafka.
 */
class SnapshotStreamSource extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-snapshots"

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val opts = SnapshotStreamSource.optionsOf(parameters)
    (s"graft-snapshots:${SnapshotStreamSource.basePath(opts)}",
      schema.getOrElse(SnapshotStreamSource.inferSchema(
        sqlContext.sparkSession, opts)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val opts = SnapshotStreamSource.optionsOf(parameters)
    new SnapshotSource(sqlContext.sparkSession,
      schema.getOrElse(SnapshotStreamSource.inferSchema(
        sqlContext.sparkSession, opts)), opts, metadataPath)
  }
}

object SnapshotStreamSource {
  private[store] def optionsOf(parameters: Map[String, String]): CaseInsensitiveStringMap =
    new CaseInsensitiveStringMap(parameters.asJava)

  private[store] def basePath(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft-snapshots needs the table base path: .load(<base>)")
    p
  }

  private[store] def isChangeFeed(options: CaseInsensitiveStringMap): Boolean =
    Option(options.get("readChangeFeed")).exists(_.toBoolean)

  /** Memo for [[inferSchema]], keyed on the chain HEAD version: the V1
    * provider protocol resolves the schema once for analysis
    * (`sourceSchema`) and once at `createSource`, and every stream
    * (re)start repeats both — each a manifest-metadata union-schema
    * derivation. Committed manifests are immutable, so a (base, branch,
    * head-version) key can never serve a stale schema; bounded by a
    * crude full-clear (streams against thousands of distinct tables in
    * one driver are not a leak vector worth an LRU). */
  private val schemaMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, Option[String], Boolean, Long), StructType]()

  /** Declared stream schema: the table's (or branch's) current read
    * schema, plus the CDC columns in change-feed mode. */
  private[store] def inferSchema(spark: SparkSession,
      options: CaseInsensitiveStringMap): StructType = {
    val base = basePath(options)
    val branch = Option(options.get("branch"))
    val head = branch.fold(Snapshots.versions(spark, base))(b =>
      Snapshots.branchVersions(spark, base, b)).lastOption.getOrElse(-1L)
    if (schemaMemo.size > 1024) schemaMemo.clear()
    schemaMemo.computeIfAbsent((base, branch, isChangeFeed(options), head),
      _ => {
        val t = branch match {
          case Some(b) => Snapshots.readBranch(spark, base, b).schema
          case None => Snapshots.read(spark, base).schema
        }
        if (isChangeFeed(options))
          StructType(t.fields.toSeq :+
            StructField("_change_type", StringType) :+
            StructField("_commit_version", LongType))
        else t
      })
  }
}

/** Stream position: every commit ≤ `v` delivered, plus the first
  * `fileIdx` added files of the chain's NEXT commit (byte pacing may cut
  * inside a commit). Serializes as the bare version number when aligned
  * to a commit boundary — the round-16 checkpoint format — and as
  * `v#fileIdx` mid-commit.
  *
  * `initial` marks the BEFORE-FIRST-DELIVERY sentinel (round-18,
  * serialized `~v`): "nothing delivered yet, start after v". Without the
  * marker a sentinel is indistinguishable from a real delivered-through-v
  * position once retention expires version v's manifest — both then sit
  * below the surviving chain's head, and treating a stale delivered
  * offset as a sentinel would silently RE-DELIVER the whole current
  * snapshot (duplicates) instead of refusing. [[SnapshotSource.stateAt]]
  * refuses non-initial offsets below the retained head for exactly this
  * reason. */
private[store] case class SnapshotVersionOffset(v: Long, fileIdx: Int = 0,
    initial: Boolean = false)
    extends OffsetV1 {
  override def json(): String = {
    val tail = if (fileIdx == 0) v.toString else s"$v#$fileIdx"
    if (initial) s"~$tail" else tail
  }
}

private[store] object SnapshotVersionOffset {
  def parse(json: String): SnapshotVersionOffset = {
    val init = json.startsWith("~")
    (if (init) json.drop(1) else json).split('#') match {
      case Array(v) => SnapshotVersionOffset(v.toLong, 0, init)
      case Array(v, i) => SnapshotVersionOffset(v.toLong, i.toInt, init)
      case _ => throw new IllegalArgumentException(s"bad snapshot offset: $json")
    }
  }
}

private[store] class SnapshotSource(spark: SparkSession,
    tableSchema: StructType, options: CaseInsensitiveStringMap,
    metadataPath: String = "")
    extends Source with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val base = SnapshotStreamSource.basePath(options)
  private val changeFeed = SnapshotStreamSource.isChangeFeed(options)
  private val changeKey: String = {
    val k = Option(options.get("changeKey")).getOrElse("")
    require(!changeFeed || k.nonEmpty,
      "readChangeFeed needs option(\"changeKey\", <unique key column>)")
    k
  }
  /** Stream a BRANCH's commit chain instead of main (Iceberg's
    * branch-scoped reads): offsets walk `branchVersions`, batches read
    * the branch manifests' deltas — the WAP shape where an audit job
    * subscribes to a staging branch before fast-forward publishes it.
    * Composes with the change feed (round-17): CDC batches replay
    * [[Snapshots.changes]] over the branch chain. */
  private val branchOpt: Option[String] = Option(options.get("branch"))
  private val ignoreChanges =
    Option(options.get("ignoreChanges")).exists(_.toBoolean)
  private val maxVersionsPerTrigger: Option[Long] =
    Option(options.get("maxVersionsPerTrigger")).map { s =>
      val n = s.toLong
      require(n > 0, s"maxVersionsPerTrigger must be > 0, got $n")
      n
    }
  private val maxBytesPerTrigger: Option[Long] =
    Option(options.get("maxBytesPerTrigger")).map { s =>
      val n = s.toLong
      require(n > 0, s"maxBytesPerTrigger must be > 0, got $n")
      n
    }
  private val maxFilesPerTrigger: Option[Int] =
    Option(options.get("maxFilesPerTrigger")).map { s =>
      val n = s.toInt
      require(n > 0, s"maxFilesPerTrigger must be > 0, got $n")
      n
    }

  private def currentVersions: Seq[Long] = branchOpt match {
    case Some(b) =>
      val vs = Snapshots.branchVersions(spark, base, b)
      require(vs.nonEmpty, s"no branch '$b' under $base")
      vs
    case None => Snapshots.versions(spark, base)
  }

  override def schema: StructType = tableSchema

  /** The before-first-delivery sentinel from `startingVersion` /
    * `startingTimestamp` (Delta's pair — the timestamp form streams
    * every commit whose manifest mtime is AT OR AFTER the cutoff, the
    * same clock [[Snapshots.readAsOf]] and expiry key on; epoch millis
    * or any `java.sql.Timestamp`-parseable string). */
  private def startSentinel: Long = {
    val vs = currentVersions
    require(vs.nonEmpty, s"no snapshots under $base")
    val byVersion = Option(options.get("startingVersion"))
    val byTs = Option(options.get("startingTimestamp"))
    require(byVersion.isEmpty || byTs.isEmpty,
      "set startingVersion OR startingTimestamp, not both")
    (byVersion, byTs) match {
      case (None, None) => vs.head - 1 // the whole table from its first commit
      case (Some("latest"), _) => vs.last // only commits after stream start
      case (Some(s), _) =>
        val v = s.toLong
        require(v >= vs.head && v <= vs.last + 1,
          s"startingVersion $v outside committed range $vs")
        v - 1
      case (_, Some(ts)) =>
        val millis = scala.util.Try(ts.toLong).getOrElse(
          java.sql.Timestamp.valueOf(ts.replace('T', ' ')).getTime)
        val f = new Path(base)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        def mtime(v: Long): Long = f.getFileStatus(new Path(
          s"$base/${if (branchOpt.isEmpty) s"v=$v" else s"vb-${branchOpt.get}=$v"}/_manifest"))
          .getModificationTime
        // first commit at-or-after the cutoff starts the stream; a
        // future cutoff degrades to "latest" (only new commits)
        vs.find(v => mtime(v) >= millis).map(_ - 1).getOrElse(vs.last)
    }
  }

  override def initialOffset(): OffsetV2 =
    SnapshotVersionOffset(startSentinel, 0, initial = true)

  /** The engine drives admission-controlled sources through
    * `latestOffset(start, limit)`; the legacy polling surface must not
    * be consulted (FileStreamSource's contract). */
  override def getOffset: Option[OffsetV1] =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is called instead (SupportsAdmissionControl)")

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Trigger.AvailableNow pins the catch-up target at query start so the
    * run terminates even while writers keep committing; batches still
    * pace at the trigger limits until the target is reached. */
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(currentVersions.last)

  private def offsetOf(o: OffsetV2): SnapshotVersionOffset = o match {
    case s: SnapshotVersionOffset => s
    case other => SnapshotVersionOffset.parse(other.json())
  }

  /** Next committed version in the chain strictly after `v` (chain
    * numbering may in principle carry gaps; walk the committed list). */
  private def chainNext(vs: Seq[Long], v: Long): Option[Long] =
    vs.find(_ > v)

  /** The files version `v` ADDED over its chain predecessor, in manifest
    * order (immutable ⇒ per-file offsets replay deterministically). */
  private def addedAt(vs: Seq[Long], v: Long): Seq[Snapshots.ManifestEntry] = {
    val prevPaths = vs.takeWhile(_ < v).lastOption match {
      case None => Set.empty[String]
      case Some(p) => stateAt(p)._1.map(_.path).toSet
    }
    stateAt(v)._1.filterNot(e => prevPaths.contains(e.path))
  }

  /** Byte length of an added file: the manifest's `#b=` field, else one
    * delta-scoped getFileStatus (pre-field vintages). */
  private def lengthOf(e: Snapshots.ManifestEntry): Long =
    e.bytes.getOrElse {
      val p = new Path(Snapshots.resolve(base, e.path))
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p).getLen
    }

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    // getStartOffset hands a V1 source NULL on the first trigger and the
    // progress offset afterward
    val s0 = Option(start).map(offsetOf)
      .getOrElse(SnapshotVersionOffset(startSentinel, 0, initial = true))
    val vs = currentVersions
    val last = availableNowTarget.getOrElse(vs.last)
    // version pacing (whole commits); an in-flight mid-version commit
    // counts as the first of the cap
    val vCap = maxVersionsPerTrigger.fold(last)(m => math.min(last, s0.v + m))
    if (maxBytesPerTrigger.nonEmpty || maxFilesPerTrigger.nonEmpty) {
      // file-granular soft caps (bytes and/or file count, composed):
      // admit added files in chain order until either budget is spent,
      // always at least one file (progress guarantee); an offset may
      // land mid-commit as (lastFullVersion, fileIdx). In CHANGE-FEED
      // mode (round-18) a cut may land inside a PURE-APPEND commit only
      // — its change set is exactly its added-file list, so file
      // positions decompose it; a rewriting commit (removed files, MoR
      // deletes, image-op delta) admits ATOMICALLY as one
      // version-per-trigger unit, since a diff join's row set has no
      // per-file decomposition.
      var pos = s0
      var budget = maxBytesPerTrigger.getOrElse(Long.MaxValue)
      val fileCap = maxFilesPerTrigger.getOrElse(Int.MaxValue)
      var admitted = 0
      var done = false
      while (!done) {
        chainNext(vs, pos.v).filter(_ <= vCap) match {
          case None => done = true
          case Some(nv) if changeFeed && !deltaOf(vs, nv)._3 =>
            // non-decomposable commit: one whole version, alone in its
            // trigger when anything was already admitted
            if (admitted == 0) pos = SnapshotVersionOffset(nv)
            done = true
          case Some(nv) =>
            val files = addedAt(vs, nv)
            var i = math.min(pos.fileIdx, files.length)
            var cut = false
            while (i < files.length && !cut) {
              val len = if (budget == Long.MaxValue) 0L else lengthOf(files(i))
              if (admitted > 0 && (len > budget || admitted >= fileCap))
                cut = true
              else { budget -= len; admitted += 1; i += 1 }
            }
            if (i >= files.length) pos = SnapshotVersionOffset(nv)
            else {
              // a mid-commit cut keeps the base version AND its initial
              // flag: pacing inside the stream's FIRST commit anchors to
              // the before-first sentinel (~v#k) — without the flag the
              // retention guard would read `sentinel#k` as an expired
              // checkpoint (round-18)
              pos = SnapshotVersionOffset(pos.v, i, pos.initial)
              done = true
            }
            if (budget <= 0L || admitted >= fileCap) done = true
        }
      }
      pos
    } else {
      // version-granular pacing (maxVersionsPerTrigger, or no caps); a
      // mid-version position left by a paced run first completes its
      // commit
      val minEnd = if (s0.fileIdx > 0) chainNext(vs, s0.v).getOrElse(s0.v)
                   else s0.v
      val end = math.max(vCap, minEnd)
      if (end <= s0.v) s0 else SnapshotVersionOffset(end)
    }
  }

  override def deserializeOffset(json: String): OffsetV2 =
    SnapshotVersionOffset.parse(json)

  /** The retention-vs-checkpoint refusal (round-18): actionable, in the
    * maintenance-verb-naming pattern of the append-only refusals. */
  private def expiredOffsetMessage(v: Long): String =
    s"stream offset version $v is no longer committed under $base — the " +
      "checkpoint outlived snapshot retention (Snapshots.expire / " +
      "expireOlderThan removed the version this stream last delivered " +
      "from, so the next batch's added-file diff base is gone). Keep " +
      "enough versions to cover the stream's longest pause: raise " +
      "expire's `keep` / expireOlderThan's cutoff, or pin the stream's " +
      "floor with a tag (Snapshots.snapshots(spark, base) lists what " +
      "survives). To resume NOW, restart from a FRESH " +
      "checkpointLocation — the stream re-delivers from the current " +
      "snapshot, and the consumer owns dedup of rows it already saw."

  private def cdcRoot = s"$metadataPath/__graft_cdc"

  override def commit(end: OffsetV1): Unit =
    if (changeFeed) sweepCdc(offsetOf(end))
  override def stop(): Unit = ()

  /** `(data entries, delete entries, image-changing op lines)` at `v`;
    * all empty for the before-first-commit sentinel. `isInitial` asserts
    * the offset is the before-first sentinel (round-18): a NON-initial
    * offset below the retained head can only be a checkpoint whose
    * delivered-through version was expired — its added-file diff base is
    * gone, so the stream refuses rather than silently re-delivering the
    * whole current snapshot as if fresh. */
  private def stateAt(v: Long, isInitial: Boolean = false)
      : (Seq[Snapshots.ManifestEntry],
      Seq[Snapshots.ManifestEntry], Seq[String]) = {
    val vs = currentVersions
    if (v < vs.head) {
      require(isInitial, expiredOffsetMessage(v))
      (Seq.empty, Seq.empty, Seq.empty)
    } else {
      require(vs.contains(v), expiredOffsetMessage(v))
      val lines = branchOpt match {
        case Some(b) => Snapshots.branchManifestLines(spark, base, b, v)
        case None => Snapshots.manifestLines(spark, base, v)
      }
      val (data, dels) = Snapshots.splitEntries(lines)
      // ops that change the read image of PRE-EXISTING rows: rename and
      // widen always (old files carry the old physical name / narrow
      // type), ADD only when it carries a default (clip-read would
      // null-fill where the batch path fills the default). Drops and
      // default-less adds are clip-safe.
      val imageOps = lines.filter(l =>
        l.startsWith("R:") || l.startsWith("W:") ||
          (l.startsWith("A:") && l.drop(2).split('\t').length == 3))
      (data, dels, imageOps)
    }
  }

  /** Align a batch frame to the stream's DECLARED schema: null-fill a
    * column the range's versions don't carry yet, cast a widened one,
    * drop post-start additions — the consumer sees one stable schema for
    * the stream's lifetime. */
  private def align(df: DataFrame, to: StructType): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val present = df.columns.toSet
    df.select(to.fields.toSeq.map { f =>
      if (present(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  private def emptyBatch: DataFrame =
    org.apache.spark.sql.graftshim.Shims.emptyStreamingFrame(spark, tableSchema)

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val s0 = start.map(o => offsetOf(o))
      .getOrElse(SnapshotVersionOffset(startSentinel, 0, initial = true))
    val e0 = offsetOf(end)
    // a mid-commit offset (v#k) resumes in change-feed mode too
    // (round-18): a pure-append commit's change set IS its added-file
    // list, so the slice picks up at file k — whether the checkpoint was
    // written by this CDF stream's own byte pacing or by a paced append
    // stream being switched over (the already-delivered files are not
    // re-delivered). A cut inside a NON-append commit is refused inside
    // changeFeedBatch with the commit named.
    if (changeFeed) changeFeedBatch(s0, e0)
    else appendBatch(s0, e0)
  }

  /** Non-CDF batch: the added-file delta between the offsets, clip-read
    * through the stream's declared schema as ONE file relation (missing
    * columns null-fill, extra physical columns project away — the batch
    * read's own vintage semantics) and flagged streaming. Catalyst then
    * prunes columns, pushes the query's filters into the scan, and keeps
    * the vectorized reader — the whole point of the V1 splice. */
  private def appendBatch(s0: SnapshotVersionOffset,
                          e0: SnapshotVersionOffset): DataFrame = {
    if (e0.v < s0.v || (e0.v == s0.v && e0.fileIdx <= s0.fileIdx))
      return emptyBatch
    val vs = currentVersions
    // contract checks run over the whole span (endpoint manifests)
    val spanEnd = if (e0.fileIdx == 0) e0.v
                  else chainNext(vs, e0.v).getOrElse(e0.v)
    val (dataS, delsS, _) = stateAt(s0.v, s0.initial)
    val (dataT, delsT, imageOpsT) = stateAt(spanEnd)
    if (!ignoreChanges) {
      val removed = dataS.map(_.path).toSet -- dataT.map(_.path).toSet
      require(removed.isEmpty,
        s"version range (${s0.v}, $spanEnd] of $base rewrites/removes " +
          s"${removed.size} data file(s) — not an append-only stream. Set " +
          "option(\"ignoreChanges\", true) to stream added files anyway " +
          "(re-delivers rewritten rows), or start a fresh stream.")
      require(delsS.isEmpty && delsT.isEmpty,
        s"pending merge-on-read deletes on $base — run " +
          "Snapshots.materializeDeletes first (a delete file changes rows " +
          "of files this stream has already delivered)")
      require(imageOpsT.isEmpty,
        s"pending rename/widen/ADD-with-default schema ops on $base — run " +
          "Snapshots.materializeSchema first (clip-reading old-vintage " +
          "files through the evolved schema would mis-read them)")
    }
    val entries: Seq[Snapshots.ManifestEntry] =
      if (s0.fileIdx == 0 && e0.fileIdx == 0) {
        // commit-aligned range: the endpoint manifest diff (two manifest
        // reads however many versions the range spans)
        val pathsS = dataS.map(_.path).toSet
        dataT.filterNot(e => pathsS.contains(e.path))
      } else {
        // byte-paced range cutting inside commits: per-version added
        // lists (manifest order, immutable), sliced at the offsets'
        // file positions
        val startPartial = chainNext(vs, s0.v).filter(_ => s0.fileIdx > 0)
        val endPartial = chainNext(vs, e0.v).filter(_ => e0.fileIdx > 0)
        vs.filter(v => v > s0.v && v <= spanEnd).flatMap { v =>
          val files = addedAt(vs, v)
          val lo = if (startPartial.contains(v)) s0.fileIdx else 0
          val hi = if (endPartial.contains(v)) e0.fileIdx else files.length
          files.slice(lo, hi)
        }
      }
    if (entries.isEmpty) return emptyBatch
    org.apache.spark.sql.graftshim.Shims.streamingFrame(
      spark.read.schema(tableSchema)
        .parquet(entries.map(e => Snapshots.resolve(base, e.path)): _*))
  }

  /** CDF batch: [[Snapshots.changes]] planned ONE COMMIT AT A TIME and
    * unioned, each slice stamped with its own `_commit_version` (Delta's
    * per-commit fidelity even when a batch spans commits under
    * `ReadLimit.allAvailable`); a fresh stream's first slice is the
    * initial snapshot as inserts at the chain's first in-range version.
    * The feed is MATERIALIZED under the stream's own checkpoint
    * directory and served back as one streaming-flagged parquet
    * relation: the changes() join has to be executed somewhere (splicing
    * its multi-relation plan in directly would read as a stream-stream
    * join to the incremental planner), the write is a distributed job
    * replaying deterministically from immutable manifests, and the
    * DELIVERY scan — the side the consumer's projections hit — stays a
    * prunable, filterable, vectorized file read. Idempotent via tmp +
    * atomic rename (getBatch can run more than once per batch; losers
    * discard their tmp), swept on commit(). */
  /** Drop materialized CDF batch dirs (and crash-orphaned `.tmp_b_*`)
    * whose END version is ≤ `upTo` — provably behind the stream. Runs on
    * commit() AND when planning a new batch starting at `upTo` (the
    * engine only commits source offsets lazily when the NEXT batch runs,
    * so commit() alone would leave the final batch's dir behind on an
    * AvailableNow run). Best-effort: a swept dir is re-materialized
    * deterministically on any replay. */
  private def sweepCdc(upTo: SnapshotVersionOffset): Unit = try {
    val dir = new Path(cdcRoot)
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // behind = the dir's END offset ≤ the stream's position, compared
    // (version, fileIdx) lexicographically (byte-paced CDF ends can land
    // mid-commit since round-18)
    def behind(ev: String, ei: String): Boolean =
      (scala.util.Try(ev.toLong).toOption, scala.util.Try(ei.toInt).toOption)
        match {
        case (Some(v), Some(i)) =>
          v < upTo.v || (v == upTo.v && i <= upTo.fileIdx)
        case _ => false
      }
    if (f.exists(dir)) f.listStatus(dir).foreach { st =>
      val done = st.getPath.getName.split('_') match {
        // round-18 four-field names (b_sv_si_ev_ei) and their tmps
        case Array("b", _, _, e, i) => behind(e, i)
        case Array(".tmp", "b", _, _, e, i, _) => behind(e, i)
        // pre-18 two-field names (b_sv_ev) from an upgraded checkpoint
        case Array("b", _, e) => behind(e, "0")
        case Array(".tmp", "b", _, e, _) => behind(e, "0")
        case _ => false
      }
      if (done) { f.delete(st.getPath, true); () }
    }
  } catch { case scala.util.control.NonFatal(_) => () }

  /** Chain-predecessor delta of version `v`: (removed paths, added
    * entries, pure-append?). "Pure append" = no removed files, no MoR
    * deletes at either endpoint, no image-op delta — the condition under
    * which v's change slice is exactly "added files as inserts" and is
    * therefore FILE-DECOMPOSABLE (the fast path, and since round-18 the
    * unit byte/file pacing may cut inside). The chain's first version
    * diffs against the empty state, so its "added" is the full snapshot
    * and pure requires v itself to carry no dels/ops. */
  private def deltaOf(vs: Seq[Long], v: Long)
      : (Set[String], Seq[Snapshots.ManifestEntry], Boolean) = {
    val prevOpt = vs.takeWhile(_ < v).lastOption
    val (dataP, delsP, opsP) = prevOpt.map(p => stateAt(p))
      .getOrElse((Seq.empty[Snapshots.ManifestEntry],
        Seq.empty[Snapshots.ManifestEntry], Seq.empty[String]))
    val (dataV, delsV, opsV) = stateAt(v)
    val prevPaths = dataP.map(_.path).toSet
    val removed = prevPaths -- dataV.map(_.path).toSet
    val added = dataV.filterNot(e => prevPaths.contains(e.path))
    val pure = removed.isEmpty && delsP.isEmpty && delsV.isEmpty &&
      opsP == opsV
    (removed, added, pure)
  }

  private def changeFeedBatch(s0: SnapshotVersionOffset,
                              e0: SnapshotVersionOffset): DataFrame = {
    import org.apache.spark.sql.functions.lit
    if (e0.v < s0.v || (e0.v == s0.v && e0.fileIdx <= s0.fileIdx))
      return emptyBatch
    sweepCdc(s0)
    val vs = currentVersions
    // a non-initial offset below the retained head is an expired
    // checkpoint, not a fresh stream — re-running the initial-snapshot
    // path would re-deliver every row as an insert (round-18)
    require(s0.v >= vs.head || s0.initial, expiredOffsetMessage(s0.v))
    // ... and an in-range offset must BE a committed version (a pinned
    // tag can leave expiry holes): a silent fallback to an older chain
    // predecessor would re-deliver the gap
    require(s0.v < vs.head || vs.contains(s0.v), expiredOffsetMessage(s0.v))
    // data columns + _change_type; _commit_version is stamped per slice
    val withCt = StructType(tableSchema.fields.dropRight(1))
    val dataSchema = StructType(withCt.fields.dropRight(1))
    def stamped(body: DataFrame, v: Long): DataFrame =
      align(body, withCt).withColumn("_commit_version", lit(v))
    def clipRead(es: Seq[Snapshots.ManifestEntry], v: Long): DataFrame =
      stamped(spark.read.schema(dataSchema)
        .parquet(es.map(e => Snapshots.resolve(base, e.path)): _*)
        .withColumn("_change_type", lit("insert")), v)
    // byte/file pacing may cut INSIDE a pure-append commit (round-18):
    // v#k offsets slice the commit's added-file list, which IS its
    // change set; the planner only cuts decomposable commits, and a
    // replayed (or foreign, e.g. ignoreChanges-paced append-stream)
    // offset is re-verified here before any row is built
    val startPartial = chainNext(vs, s0.v).filter(_ => s0.fileIdx > 0)
    val endPartial = chainNext(vs, e0.v).filter(_ => e0.fileIdx > 0)
    val spanEnd = endPartial.getOrElse(e0.v)
    // One slice per version, each stamped with its own _commit_version:
    //  - PURE-APPEND (the 100 TB steady state): clip-read of the added
    //    files tagged insert — no per-row xxhash64, no full_outer diff;
    //    the chain's FIRST version is the initial snapshot and rides the
    //    same route when pure (added == the full file set).
    //  - first version, NOT pure (dels/ops landed in it): the snapshot
    //    read, which applies them.
    //  - any other non-pure commit: [[Snapshots.changes]] — the
    //    hash-compare diff join, the honest price of row-level change
    //    semantics on a rewriting commit.
    // align()+stamped() normalize every route to one schema, and the
    // oracle keys pin route equivalence on the append slices.
    val slices = vs.filter(v => v > s0.v && v <= spanEnd).flatMap { v =>
      val (_, added, pure) = deltaOf(vs, v)
      val lo = if (startPartial.contains(v)) s0.fileIdx else 0
      val hi = if (endPartial.contains(v)) e0.fileIdx else added.length
      if (lo > 0 || hi < added.length) {
        require(pure,
          s"change-feed offset cuts inside commit $v of $base, which is " +
            "not a pure append (it rewrites/removes files, carries " +
            "merge-on-read deletes, or lands schema ops) — a rewriting " +
            "commit's change set has no per-file decomposition. Restart " +
            "the stream from a fresh checkpointLocation, or pace with " +
            "maxVersionsPerTrigger (commit-granular).")
        val part = added.slice(lo, hi)
        if (part.isEmpty) None else Some(clipRead(part, v))
      } else if (pure && added.nonEmpty) Some(clipRead(added, v))
      else if (vs.takeWhile(_ < v).isEmpty) {
        val body = branchOpt match {
          case Some(b) => Snapshots.readBranch(spark, base, b, Some(v))
          case None => Snapshots.read(spark, base, Some(v))
        }
        Some(stamped(body.withColumn("_change_type", lit("insert")), v))
      } else Some(stamped(
        Snapshots.changes(spark, base, vs.takeWhile(_ < v).last, v,
          changeKey, branchOpt), v))
    }
    if (slices.isEmpty) return emptyBatch
    val feed = slices.reduce(_ unionByName _)
    val p = new Path(
      s"$cdcRoot/b_${s0.v}_${s0.fileIdx}_${e0.v}_${e0.fileIdx}")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) {
      val tmp = new Path(
        s"$cdcRoot/.tmp_b_${s0.v}_${s0.fileIdx}_${e0.v}_${e0.fileIdx}_" +
          java.util.UUID.randomUUID)
      feed.write.mode("overwrite").parquet(tmp.toString)
      if (!f.rename(tmp, p)) { f.delete(tmp, true); () }
    }
    org.apache.spark.sql.graftshim.Shims.streamingFrame(
      spark.read.schema(tableSchema).parquet(p.toString))
  }
}
