package graft.store

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * Table-as-stream-source: the snapshot store as a Structured Streaming
 * SOURCE (DataSource V2 [[MicroBatchStream]]) — the Delta/Iceberg
 * `spark.readStream.table(...)` twin, and the read-side complement of
 * [[Snapshots.appendStream]]/[[graft.store.MatView]] (which only let the
 * store be a stream SINK). Consumers subscribe to a table and receive
 * every committed append as a micro-batch:
 *
 * {{{
 *   spark.readStream.format("graft-snapshots")
 *     .option("startingVersion", "1")      // or "latest"; default: first
 *     .option("maxVersionsPerTrigger", 1)  // admission control, optional
 *     .option("branch", "staging")         // stream a branch's commits
 *     // CDC mode (Delta CDF twin): batches become the changes() feed
 *     .option("readChangeFeed", true).option("changeKey", "id")
 *     .load(base)
 * }}}
 *
 * The design falls out of the committed-manifest model:
 *
 *  - OFFSETS ARE VERSION NUMBERS. Offset `v` means "every commit ≤ v has
 *    been delivered"; `latestOffset` is the newest committed version
 *    ([[Snapshots.versions]] — one directory listing, no file IO).
 *    Offsets serialize as the version number, so a checkpoint survives
 *    restarts and replays deterministically: manifests are immutable, so
 *    `planInputPartitions(start, end)` always re-derives the same file
 *    list — exactly-once delivery under crash-and-replay is inherited
 *    from the store's commit protocol, not re-implemented here.
 *  - A MICRO-BATCH IS THE MANIFEST DELTA. The batch for `(start, end]`
 *    reads the data files present in `end`'s manifest and absent from
 *    `start`'s — the same non-shared-file scoping the CDC feed
 *    ([[Snapshots.changes]]) uses, O(delta) by construction: ten appended
 *    files out of 100k mean ten files planned, never a table scan, and
 *    the planning itself is two manifest reads.
 *  - APPEND-ONLY CONTRACT, enforced not assumed (Delta's default
 *    streaming semantics): a version range that REMOVES data files
 *    (compact/delete/update rewrites), carries pending MoR delete files,
 *    or pends a schema op that changes the read image of existing rows
 *    (rename/widen, ADD COLUMN with a non-null default) makes
 *    `planInputPartitions` throw with the maintenance verb that restores
 *    streamability ([[Snapshots.materializeDeletes]] /
 *    [[Snapshots.materializeSchema]]). `option("ignoreChanges", true)`
 *    opts into Delta's relaxed mode: added files stream anyway, which
 *    re-delivers rows of rewritten files — the consumer owns dedup, same
 *    caveat Delta documents. A default-less ADD COLUMN streams without
 *    fuss (old files clip-read as NULL, the batch semantics).
 *  - PARTITIONS ARE FILE SPLITS. Each planned file becomes
 *    `filesMaxPartitionBytes`-sized [[PartitionedFile]] splits (parquet
 *    is row-group splittable), read on executors through Spark's own
 *    parquet reader ([[ParquetFileFormat.buildReaderWithPartitionValues]]
 *    — the engine FileScanRDD itself runs on), so a 10 GB append spreads
 *    across the cluster instead of pinning one task per file.
 *
 * 100 TB: every driver-side step is O(delta in versions + files touched);
 * nothing lists the table, nothing reads a shared file, and row IO is
 * executor-side and split-parallel. Reference streaming semantics:
 * consumer-side event delivery per redpanda_activity.py; the
 * table-as-stream shape itself is the lakehouse capability (SURVEY
 * §2.10) the reference's broker fills with Kafka.
 */
class SnapshotStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-snapshots"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val base = SnapshotStreamSource.basePath(options)
    val t = Option(options.get("branch")) match {
      case Some(b) => Snapshots.readBranch(SparkSession.active, base, b).schema
      case None => Snapshots.read(SparkSession.active, base).schema
    }
    if (SnapshotStreamSource.isChangeFeed(options))
      StructType(t.fields.toSeq :+
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType) :+
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType))
    else t
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SnapshotStreamTable(schema,
      new CaseInsensitiveStringMap(properties))
}

object SnapshotStreamSource {
  private[store] def basePath(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft-snapshots needs the table base path: .load(<base>)")
    p
  }

  private[store] def isChangeFeed(options: CaseInsensitiveStringMap): Boolean =
    Option(options.get("readChangeFeed")).exists(_.toBoolean)
}

private[store] class SnapshotStreamTable(tableSchema: StructType,
    options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String =
    s"graft-snapshots:${SnapshotStreamSource.basePath(options)}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // .load(path) registers options at getTable time; merge both maps so
    // either surface works
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ scanOptions.asScala).asJava)
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SnapshotMicroBatchStream(SparkSession.active, tableSchema,
            merged, checkpointLocation)
      }
    }
  }
}

/** Version-number offset; serializes as the bare number. */
private[store] case class SnapshotVersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

private[store] class SnapshotMicroBatchStream(spark: SparkSession,
    tableSchema: StructType, options: CaseInsensitiveStringMap,
    checkpointLocation: String = "")
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val base = SnapshotStreamSource.basePath(options)
  /** Change-data-feed mode (Delta CDF streaming twin): each micro-batch
    * is [[Snapshots.changes]] over its version range — insert / delete /
    * update pre+post PAIRS with `_change_type` and `_commit_version`
    * columns — instead of the added files' rows, and the append-only
    * contract does not apply (rewrites are exactly what the feed
    * describes). The first batch of a fresh stream is the initial
    * snapshot as inserts, Delta's convention. Requires
    * `option("changeKey", <unique key column>)` — the CDC contract. The
    * batch's rows are materialized under the stream's own checkpoint
    * directory (the join output has to live somewhere; the write is a
    * distributed job and replays deterministically from the immutable
    * manifests) and swept once the batch commits. */
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
    * The change feed stays main-only (the CDC verbs key on main
    * versions). */
  private val branchOpt: Option[String] = Option(options.get("branch"))
  require(!changeFeed || branchOpt.isEmpty,
    "readChangeFeed streams main versions; drop option(\"branch\")")
  private val ignoreChanges =
    Option(options.get("ignoreChanges")).exists(_.toBoolean)
  private val maxVersionsPerTrigger: Option[Long] =
    Option(options.get("maxVersionsPerTrigger")).map { s =>
      val n = s.toLong
      require(n > 0, s"maxVersionsPerTrigger must be > 0, got $n")
      n
    }

  private def currentVersions: Seq[Long] = branchOpt match {
    case Some(b) =>
      val vs = Snapshots.branchVersions(spark, base, b)
      require(vs.nonEmpty, s"no branch '$b' under $base")
      vs
    case None => Snapshots.versions(spark, base)
  }

  override def initialOffset(): Offset = {
    val vs = currentVersions
    require(vs.nonEmpty, s"no snapshots under $base")
    val start = Option(options.get("startingVersion")) match {
      case None => vs.head - 1 // stream the whole table from its first commit
      case Some("latest") => vs.last // only commits after stream start
      case Some(s) =>
        val v = s.toLong
        require(v >= vs.head && v <= vs.last + 1,
          s"startingVersion $v outside committed range $vs")
        v - 1
    }
    SnapshotVersionOffset(start)
  }

  override def latestOffset(): Offset =
    SnapshotVersionOffset(currentVersions.last)

  /** Trigger.AvailableNow pins the catch-up target at query start so the
    * run terminates even while writers keep committing; batches still
    * pace at maxVersionsPerTrigger until the target is reached. */
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(currentVersions.last)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SnapshotVersionOffset].v
    val last = availableNowTarget.getOrElse(currentVersions.last)
    SnapshotVersionOffset(
      maxVersionsPerTrigger.fold(last)(m => math.min(last, s + m)))
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset =
    SnapshotVersionOffset(json.toLong)

  override def commit(end: Offset): Unit = if (changeFeed) {
    // sweep materialized CDF batches the checkpoint no longer needs
    // (end version ≤ the committed one); best-effort — a leftover dir is
    // re-overwritten on replay, never re-served
    val ev = end.asInstanceOf[SnapshotVersionOffset].v
    try {
      val dir = new Path(cdcRoot)
      val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (f.exists(dir)) f.listStatus(dir).foreach { st =>
        st.getPath.getName.split('_') match {
          case Array("b", _, e) if scala.util.Try(e.toLong).toOption.exists(_ <= ev) =>
            f.delete(st.getPath, true); ()
          case _ => ()
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }
  override def stop(): Unit = ()

  private def cdcRoot = s"$checkpointLocation/__graft_cdc"

  /** Materialize the CDF batch under the checkpoint dir and return its
    * parquet files as the batch's input partitions. */
  private def planChangeFeed(sv: Long, ev: Long): Array[InputPartition] = {
    import org.apache.spark.sql.functions.{col, lit}
    val vs = currentVersions
    val body =
      if (sv < vs.head) // fresh stream: initial snapshot as inserts
        Snapshots.read(spark, base, Some(ev))
          .withColumn("_change_type", lit("insert"))
      else Snapshots.changes(spark, base, sv, ev, changeKey)
    val feed = body.withColumn("_commit_version", lit(ev))
    // align to the stream's declared schema (null-fill a column the
    // range's versions don't carry yet; drop post-start additions)
    val present = feed.columns.toSet
    val aligned = feed.select(tableSchema.fields.toSeq.map { f =>
      if (present(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    // idempotent materialization: planInputPartitions can run more than
    // once per batch (every action on the batch frame re-plans), so the
    // dir is written ONCE via tmp + atomic rename and reused afterwards —
    // a second writer deleting files a first plan still references would
    // be a mid-read FileNotFound. Content is deterministic (changes()
    // replans identically from immutable manifests), so any COMPLETE dir
    // is valid; losers of the rename race discard their tmp.
    val p = new Path(s"$cdcRoot/b_${sv}_$ev")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) {
      val tmp = new Path(
        s"$cdcRoot/.tmp_b_${sv}_${ev}_${java.util.UUID.randomUUID}")
      aligned.write.mode("overwrite").parquet(tmp.toString)
      if (!f.rename(tmp, p)) { f.delete(tmp, true); () }
    }
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    f.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
      .flatMap { st =>
        val len = st.getLen
        (0L until math.max(len, 1L) by maxSplit).map { off =>
          SnapshotInputPartition(PartitionedFile(
            InternalRow.empty, SparkPath.fromPath(st.getPath), off,
            math.min(maxSplit, len - off), Array.empty, 0L, len, Map.empty))
        }
      }
  }

  /** `(data entries, delete entries, image-changing op lines)` at `v`;
    * all empty for the before-first-commit sentinel. */
  private def stateAt(v: Long): (Seq[Snapshots.ManifestEntry],
      Seq[Snapshots.ManifestEntry], Seq[String]) = {
    val vs = currentVersions
    if (v < vs.head) (Seq.empty, Seq.empty, Seq.empty)
    else {
      require(vs.contains(v),
        s"offset version $v no longer committed under $base (expired?)")
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

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val sv = start.asInstanceOf[SnapshotVersionOffset].v
    val ev = end.asInstanceOf[SnapshotVersionOffset].v
    if (ev <= sv) return Array.empty
    if (changeFeed) return planChangeFeed(sv, ev)
    val (dataS, delsS, _) = stateAt(sv)
    val (dataT, delsT, imageOpsT) = stateAt(ev)
    if (!ignoreChanges) {
      val removed = dataS.map(_.path).toSet -- dataT.map(_.path).toSet
      require(removed.isEmpty,
        s"version range ($sv, $ev] of $base rewrites/removes " +
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
    val pathsS = dataS.map(_.path).toSet
    val added = dataT.filterNot(e => pathsS.contains(e.path))
    val f = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    added.flatMap { e =>
      val p = new Path(s"$base/${e.path}")
      val len = f.getFileStatus(p).getLen
      (0L until math.max(len, 1L) by maxSplit).map { off =>
        SnapshotInputPartition(PartitionedFile(
          InternalRow.empty, SparkPath.fromPath(p), off,
          math.min(maxSplit, len - off), Array.empty,
          0L, len, Map.empty))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // Row-based parquet path (vectorized readers hand back ColumnarBatch,
    // which needs the columnar scan surface); the flag is flipped only
    // around the driver-side reader BUILD — it's captured eagerly into
    // the returned closure — then restored. The reader function is the
    // serializable closure FileScanRDD itself ships to executors —
    // missing columns clip-read as NULL (default-less ADD COLUMN), extra
    // physical columns (pending DROP) project away.
    val key = "spark.sql.parquet.enableVectorizedReader"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    val readFunc = try {
      new ParquetFileFormat().buildReaderWithPartitionValues(
        sparkSession = spark,
        dataSchema = tableSchema,
        partitionSchema = StructType(Nil),
        requiredSchema = tableSchema,
        filters = Nil,
        options = Map.empty,
        hadoopConf = spark.sessionState.newHadoopConfWithOptions(Map.empty))
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    new SnapshotPartitionReaderFactory(readFunc)
  }
}

private[store] case class SnapshotInputPartition(file: PartitionedFile)
  extends InputPartition

private[store] class SnapshotPartitionReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val it = readFunc(partition.asInstanceOf[SnapshotInputPartition].file)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
