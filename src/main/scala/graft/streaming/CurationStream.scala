package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dedup.Dedup
import graft.store.Snapshots

/**
 * Continuous corpus curation: the end-to-end streaming twin of the batch
 * `pipeline_neardup_pretraining` capstone. Each micro-batch of raw
 * documents is quality-gated, near-dup-deduped BOTH against the corpus
 * built so far (the prebucketed LSH probe — the corpus is never re-signed)
 * and within itself, then committed exactly-once:
 *
 *   raw stream ─ gate ─ sign ─┬─ probe corpus buckets ──┐
 *                             └─ intra-batch LSH pairs ─┴─ admitted docs
 *        admitted ─► appendStream(corpus table)          (idempotent by batchId)
 *        admitted's buckets ─► appendStream(bucket table) (same batchId)
 *
 * The two appends are EACH idempotent on (appId, batchId) — a crash
 * between them leaves one committed; the replayed batch no-ops the
 * committed half and completes the other, so the pair converges to
 * exactly-once without a cross-table transaction. The bucket table is the
 * same artifact [[Dedup.incrementalLshMatchesPrebucketed]] probes, so the
 * index the NEXT batch dedups against is maintained by the pipeline
 * itself — O(delta) per batch end to end (corpus-flat append + probe,
 * measured in SNAP_SLOPES.json / SCALE.md round-10 section).
 *
 * Intra-batch rule: a doc is dropped when it LSH-pairs with a smaller-id
 * doc in the same batch — bounded and driver-state-free. Its exact
 * semantics vs full min-label components (made precise in round 11):
 * the admitted set NEVER contains two docs that are direct LSH
 * candidates of each other (if kept u < kept v were paired, v would have
 * the smaller partner u and be dropped), and it is a SUPERSET of the
 * component-survivor set — the component minimum has no smaller partner,
 * so it is always kept, and docs connected to their component's minimum
 * only transitively (through a dropped middle doc) are kept too, where
 * components would drop them. On identical texts the pair set is a
 * clique and the two semantics coincide exactly; on near-dup CHAINS
 * (A–B–C with no A–C pair) both drop B and C; on STARS the greedy rule
 * deliberately keeps the non-adjacent leaves (they are not near-dups of
 * the survivor — dropping them, as components would, loses data for no
 * dedup gain). Cross-batch chains are covered by the corpus probe,
 * because the admitted representative's buckets are in the bucket table
 * for every later batch.
 *
 * Reference semantics: the dedup-on-write admission of
 * `neo4j_memory.py:606-617` lifted from per-conversation rows to corpus
 * curation, with the reference's at-least-once producer retry
 * (`redpanda_activity.py:127-143`) made exactly-once in the store commit.
 */
object CurationStream {

  /**
   * Start the ingest query. `docs` is a STREAMING frame with columns
   * (doc_id: long, text: string); `storeBase`/`bucketBase` are snapshot
   * store roots (created on first batch).
   *
   * Batch-size assumption: each micro-batch must be broadcast-sized (the
   * corpus probe hints the batch side — the design that keeps the probe
   * O(delta)). Cap the source's per-trigger intake (e.g. Kafka
   * `maxOffsetsPerTrigger`) accordingly; for a one-off catch-up over a
   * large backlog, run the BATCH path (`incrementalLshMatchesPrebucketed`
   * with `broadcastBatch = false`) instead of replaying it through the
   * stream (round-11 advisory).
   */
  def curationIngest(docs: DataFrame, storeBase: String, bucketBase: String,
                     appId: String, checkpoint: String,
                     minLen: Int = 20, numHashes: Int = 4,
                     bands: Int = 2): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, storeBase, bucketBase, appId,
          minLen, numHashes, bands)
      }
      .start()

  /** One micro-batch of the admission dataflow — factored out so the spec
    * can drive the crash window deterministically. */
  def ingestBatch(batch: DataFrame, batchId: Long, storeBase: String,
                  bucketBase: String, appId: String, minLen: Int,
                  numHashes: Int, bands: Int): Unit =
    withAdmission(batch, bucketBase, minLen, numHashes, bands) {
      (admitted, admittedBuckets) =>
        // two idempotent commits under ONE batch id: replay after a crash
        // between them no-ops the committed half and completes the other
        Snapshots.appendStream(admitted, storeBase, appId, batchId,
          statsKey = Some("doc_id"))
        Snapshots.appendStream(admittedBuckets, bucketBase, appId, batchId)
        ()
    }

  /**
   * Branch-WAP ingest (round-12): the stream's corpus commit lands on a
   * `staging` BRANCH with a write-audit over exactly the staged delta;
   * only an audit-passed batch is PUBLISHED by fast-forwarding main to
   * the branch head (metadata-only) — `pipeline_wap_gate`'s
   * audit-then-publish shape, continuous. Main readers therefore never
   * see an unaudited row, while the branch keeps the full staged history.
   *
   * Exactly-once across THREE commits, each idempotent on
   * (appId, batchId): branch data commit (marker in the branch version),
   * bucket-index commit, main publish (marker via
   * [[Snapshots.fastForwardStream]]). A crash in any window replays the
   * batch; committed halves no-op on their markers and the rest
   * completes (StreamingSpec drives each window). An audit-REJECTED
   * batch commits marker-only on the branch (no data, no publish) so the
   * stream stays live instead of replaying the poison batch forever.
   *
   * First batch bootstraps the store: an empty main v1 pinning the
   * schema, then the staging branch forked from it.
   */
  def ingestBatchWap(batch: DataFrame, batchId: Long, storeBase: String,
                     bucketBase: String, appId: String,
                     audit: DataFrame => Boolean, branch: String = "staging",
                     minLen: Int = 20, numHashes: Int = 4,
                     bands: Int = 2): Unit =
    withAdmission(batch, bucketBase, minLen, numHashes, bands) {
      (admitted, admittedBuckets) =>
        val spark = batch.sparkSession
        if (Snapshots.versions(spark, storeBase).isEmpty)
          Snapshots.write(admitted.limit(0), storeBase)
        if (Snapshots.branchVersions(spark, storeBase, branch).isEmpty)
          Snapshots.createBranch(spark, storeBase, branch,
            Snapshots.versions(spark, storeBase).last)
        val (_, ok) = Snapshots.appendStreamBranch(admitted, storeBase,
          branch, appId, batchId, statsKey = Some("doc_id"),
          audit = Some(audit))
        if (ok) {
          // the dedup index tracks PUBLISHED content only — a rejected
          // batch must not shadow future legitimate admissions
          Snapshots.appendStream(admittedBuckets, bucketBase, appId, batchId)
          Snapshots.fastForwardStream(spark, storeBase, branch, appId, batchId)
        }
        ()
    }

  /** Start the WAP ingest query — [[curationIngest]] with the branch-WAP
    * commit tail. */
  def curationIngestWap(docs: DataFrame, storeBase: String, bucketBase: String,
                        appId: String, checkpoint: String,
                        audit: DataFrame => Boolean,
                        branch: String = "staging",
                        minLen: Int = 20, numHashes: Int = 4,
                        bands: Int = 2): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchWap(batch, batchId, storeBase, bucketBase, appId,
          audit, branch, minLen, numHashes, bands)
      }
      .start()

  /** The shared admission dataflow: gate → sign → corpus-bucket probe →
    * intra-batch greedy drop, then hand (admitted, admittedBuckets) to the
    * commit tail. The signed bucket frame is persisted for the span of the
    * tail (probe + intra-join + both commits read it) and released after. */
  private def withAdmission(batch: DataFrame, bucketBase: String, minLen: Int,
                            numHashes: Int, bands: Int)(
      commit: (DataFrame, DataFrame) => Unit): Unit = {
    val spark = batch.sparkSession
    val gated = batch
      .filter(col("text").isNotNull && length(trim(col("text"))) >= minLen)
    if (gated.isEmpty) return

    // hashed (xxhash64-long) signatures: this is a production path with no
    // cross-engine oracle, so it takes the 8-byte bucket representation —
    // the md5 artifact at the SNAP_SLOPES 5M point paid a 5.6× build tax
    // purely for hex-string portability this path doesn't need
    val sig = Dedup.minhashSignatureHashed(gated, "doc_id", "text", 5, numHashes)
    val batchBuckets = Dedup.lshBucketsHashed(sig, "doc_id", numHashes, bands)
      .persist()
    try {
      // corpus probe: skip when no corpus exists yet (first batch). The
      // drop set stays a DataFrame end to end — admission is an anti-join,
      // never a collected id list (the batch is small but need not be).
      // excludeSelf = false (round-11 advisory): source-level at-least-once
      // redelivery re-sends an ALREADY-ADMITTED doc in a LATER batch — a
      // different batchId, so the (appId, batchId) commit marker cannot
      // no-op it. The redelivered copy hashes to its admitted twin's
      // buckets with the SAME doc_id; the batch-mode self-exclusion would
      // filter that exact match out and re-admit the duplicate.
      val corpusHits =
        if (Snapshots.versions(spark, bucketBase).isEmpty) None
        else Some(Dedup.incrementalLshMatchesPrebucketed(
            batchBuckets, Snapshots.read(spark, bucketBase), "doc_id",
            excludeSelf = false)
          .select(col("id_new").as("doc_id")))
      // intra-batch: drop every doc that pairs with a smaller id — a
      // self-join of the PERSISTED bucket frame, so the batch is signed
      // exactly once per micro-batch
      val bbA = batchBuckets.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
      val bbB = batchBuckets.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
      val intraDrops = bbA.join(bbB, Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_b").as("doc_id"))
      val dropIds = corpusHits.fold(intraDrops)(intraDrops.union)
      val admitted = gated.join(dropIds, Seq("doc_id"), "left_anti")
      commit(admitted,
        batchBuckets.join(admitted.select(col("doc_id")), "doc_id"))
    } finally {
      batchBuckets.unpersist(false)
      ()
    }
  }
}
