package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * Deduplication operator family for large-scale training-data pipelines:
 * exact, MinHash+LSH banding, SimHash, n-gram Jaccard, embedding-cosine
 * near-dup.
 *
 * Scale invariant: NOTHING here is all-pairs. Every near-dup path blocks
 * first (LSH band buckets, shared-shingle join, signature buckets) so the
 * quadratic step runs only within buckets — at 100 TB the candidate set is
 * the only thing that ever gets joined. All expressions are built-in
 * (codegen'd); md5-based hashing keeps signatures engine-portable (the
 * DuckDB oracle computes the identical signature), with xxhash64 variants
 * for the fast path.
 */
object Dedup {

  /** All unordered element pairs of `ids` as an array of `(a, b)` structs
    * with `a < b` — the pair-generation step the df-capped banded paths
    * run INSIDE a ≤ maxDf-sized bucket array, never as a self-join
    * ([[exactSubstringPairs]], [[winnowCandidatePairs]],
    * [[sharedSpanPairs]]). Row-local, ≤ maxDf²/2 structs per bucket. */
  private def allPairs(ids: Column): Column =
    flatten(transform(ids, a =>
      transform(filter(ids, b => a < b), b => struct(a.as("a"), b.as("b")))))

  // ── exact ────────────────────────────────────────────────────────────────
  /**
   * Exact dedup: one survivor (min id) per identical key. A hash groupBy —
   * one shuffle on the content hash, no sort. At scale group on
   * xxhash64(content) (8 bytes) instead of the full content.
   */
  def exact(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.groupBy(xxhash64(col(keyCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact-dedup survivors (the deduplicated table itself). */
  def exactSurvivors(df: DataFrame, idCol: String, keyCol: String): DataFrame = {
    val keep = df.groupBy(col(keyCol).as("__k")).agg(min(col(idCol)).as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // ── shingles ─────────────────────────────────────────────────────────────
  /** Distinct character n-gram shingles per document (1 row per shingle). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    // NOT spread-normalized: callers mostly shingle SMALL filtered slices
    // (the LSH queries cap the corpus), where an extra exchange costs more
    // than the single-task explode saves — measured neutral-to-negative at
    // sf0.1. Heavy whole-corpus gram paths (boilerplate, span removal) do
    // spread; see TextAnalysis.spreadIfUndersplit.
    df.select(col(idCol),
        // one-pass gram emission (round-18, [[graft.expr.CharGrams]]); the
        // transform(sequence, substr) shape re-scanned the string per
        // window — O(len²) byte work. Shorter-than-n texts keep the legacy
        // boundary semantics: the whole text is its own single shingle.
        explode(when(length(col(textCol)) < n, array(col(textCol)))
          .otherwise(graft.expr.CharGrams(col(textCol), n))).as("shingle"))
      .select(col(idCol), col("shingle"))
      .distinct()

  // ── contamination ────────────────────────────────────────────────────────
  /**
   * Train/test contamination check — the eval-integrity gate every training
   * corpus needs: for each held-out (test) document, how many of its
   * character n-gram shingles also appear anywhere in the training split.
   *
   * Returns one row per test doc: (idCol, n_shingles, n_shared,
   * contamination = n_shared / n_shingles). Blocked by shingle (the join key
   * is the shingle itself), so cost is Σ|shingles| — never test × train
   * pairs. The train-side set is deduplicated to distinct shingles before
   * the join, which is the right broadcast candidate when the held-out set
   * is small relative to the corpus.
   */
  def contamination(df: DataFrame, idCol: String, textCol: String,
                    isTrain: Column, n: Int = 5): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
      .join(df.select(col(idCol), isTrain.as("__train")), Seq(idCol))
    val trainSet = sh.filter(col("__train")).select(col("shingle")).distinct()
    val test = sh.filter(!col("__train")).select(col(idCol), col("shingle"))
    val tot = test.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val shared = test.join(trainSet, "shingle")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared"))
    tot.join(shared, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)).cast("double") /
          col("n_shingles").cast("double")).as("contamination"))
  }

  // ── MinHash ──────────────────────────────────────────────────────────────
  /**
   * MinHash signature: h_j(doc) = min over shingles of md5(j || shingle).
   * md5-lexicographic-min is a valid permutation-min (md5 is uniform), and
   * is reproducible in any engine with md5 — which is what makes the DuckDB
   * oracle possible. One shuffle (groupBy id); signature width `numHashes`.
   */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
                       n: Int, numHashes: Int): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
    val aggs = (0 until numHashes).map(j =>
      min(md5(concat(lit(j.toString), lit("|"), col("shingle")))).as(s"h$j"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * PRODUCTION twin of [[minhashSignature]]: xxhash64 longs instead of md5
   * hex strings. Identical blocking semantics (min over a uniform hash is
   * a valid permutation-min; two docs share a band bucket iff their band
   * rows are equal, which holds for any injective-enough hash), but each
   * signature cell is 8 bytes instead of a 32-char string — the third
   * decade of SNAP_SLOPES measured the md5 path's bucket artifact at
   * 20M×string rows becoming scan-bound (33 s probe, 815 s build at 5M
   * docs), which is a representation tax, not an algorithmic term. Use
   * this for engine-internal artifacts (the corpus bucket table, the
   * streaming index); keep the md5 path where a DuckDB oracle must replay
   * the values.
   */
  def minhashSignatureHashed(df: DataFrame, idCol: String, textCol: String,
                             n: Int, numHashes: Int): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
    val aggs = (0 until numHashes).map(j =>
      min(xxhash64(lit(j), col("shingle"))).as(s"h$j"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * LSH banding over a MinHash signature: band b = hash of rows
   * [b*rowsPerBand, (b+1)*rowsPerBand). Docs sharing ANY band bucket are
   * candidates. The candidate join is per-(band, bucket) — never all-pairs;
   * bucket sizes are bounded by the band hash, so the within-bucket
   * self-join stays local after one shuffle on the bucket key.
   */
  /** Band-bucket rows (idCol, band, bucket) of a minhash signature frame —
    * the LSH blocking key. Shared by the all-pairs and incremental paths;
    * at production scale the corpus side is a materialized table
    * partitioned by band. */
  def lshBuckets(sig: DataFrame, idCol: String, numHashes: Int,
                 bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", slice: _*)).as("bucket"))
    }
    sig.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** PRODUCTION twin of [[lshBuckets]] for [[minhashSignatureHashed]]
    * signatures: the band bucket is one xxhash64 long over the band's
    * signature rows — 9 bytes per bucket row instead of an md5 string.
    * Same (idCol, band, bucket) shape, so it drops into
    * [[incrementalLshMatchesPrebucketed]] unchanged. */
  def lshBucketsHashed(sig: DataFrame, idCol: String, numHashes: Int,
                       bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(lit(b) +: slice: _*).as("bucket"))
    }
    sig.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  def lshCandidatePairs(sig: DataFrame, idCol: String, numHashes: Int,
                        bands: Int): DataFrame = {
    val buckets = lshBuckets(sig, idCol, numHashes, bands)
    val a = buckets.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = buckets.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /**
   * Incremental near-dup matching: block a NEW batch against an EXISTING
   * corpus signature table — the daily-increment shape, where the corpus
   * side is a precomputed artifact and only the batch is (re)signed. The
   * batch's band-buckets broadcast into the corpus bucket table, so the
   * corpus is never self-joined and never reshuffled; with the corpus
   * buckets materialized partitioned-by-band, the scan prunes to the
   * batch's buckets. Returns (id_new, id_corpus) candidate matches —
   * batch-internal pairs are NOT emitted (run [[lshCandidatePairs]] on
   * the batch alone for those).
   */
  def incrementalLshMatches(newSig: DataFrame, corpusSig: DataFrame,
                            idCol: String, numHashes: Int,
                            bands: Int): DataFrame = {
    val cb = lshBuckets(corpusSig, idCol, numHashes, bands)
    incrementalLshMatchesPrebucketed(
      lshBuckets(newSig, idCol, numHashes, bands), cb, idCol)
  }

  /**
   * Steady-state form of [[incrementalLshMatches]]: the corpus side is the
   * ALREADY-MATERIALIZED bucket table (idCol, band, bucket) — the artifact
   * a daily pipeline maintains with one O(delta) append per batch — so a
   * batch probe never re-signs or re-explodes the corpus. The batch
   * buckets broadcast (`broadcastBatch` — see below); the corpus-side work
   * is one columnar scan of the 3-column bucket table (layout note:
   * written partitioned by band / bucket prefix, that scan prunes to the
   * batch's buckets and the probe cost stops growing with the corpus).
   *
   * `excludeSelf` controls the id_new == id_corpus rows. `true` (the
   * batch-mode default) assumes DISJOINT id spaces and filters self-joins
   * out; `false` treats a corpus row with the probe doc's own id as a
   * match — the at-least-once-ingest setting ([[graft.streaming
   * .CurationStream]]), where a redelivered doc re-hashes to its admitted
   * copy's buckets and must be caught as a duplicate, not silently
   * re-admitted. (A redelivery that MUTATED the text may land in entirely
   * different buckets and still slip through — that is an update, not a
   * duplicate, and is out of scope for LSH admission.)
   *
   * `broadcastBatch = true` hints the batch side regardless of size —
   * right whenever the caller bounds the batch (micro-batches with a
   * maxOffsets cap, a daily delta). Pass `false` for an UNBOUNDED batch
   * (e.g. a first catch-up batch over a large backlog) so the planner
   * falls back to a shuffle join instead of OOMing executors on the
   * broadcast.
   */
  def incrementalLshMatchesPrebucketed(newBuckets: DataFrame,
                                       corpusBuckets: DataFrame,
                                       idCol: String,
                                       maxDf: Int = Int.MaxValue,
                                       excludeSelf: Boolean = true,
                                       broadcastBatch: Boolean = true): DataFrame = {
    val nb = newBuckets.withColumnRenamed(idCol, "id_new")
    val cb0 = corpusBuckets.withColumnRenamed(idCol, "id_corpus")
    // hot-bucket cap, the incremental twin of the batch family's maxDf:
    // a bucket shared by thousands of corpus docs is boilerplate blocking
    // noise — every probe doc "matches" it and the join output grows with
    // the corpus, which is the one way this probe goes super-constant.
    // The df column is PRECOMPUTED in the artifact (see [[withBucketDf]])
    // so the cap is a scan-side filter, not an O(corpus) aggregation per
    // batch. A caller asking for the cap against an artifact that lacks
    // the column must hear about it — a silent no-op returns unboundedly
    // more matches than the caller sized for (round-11 advisory).
    require(maxDf == Int.MaxValue || cb0.columns.contains("df"),
      "maxDf requested but the corpus bucket table has no precomputed 'df' " +
        "column — build the artifact with withBucketDf (or refresh it at " +
        "compaction) so the hot-bucket cap is a scan-side filter")
    val cb =
      if (maxDf != Int.MaxValue) cb0.filter(col("df") <= maxDf).drop("df")
      else cb0.drop(cb0.columns.filter(_ == "df"): _*)
    val probe = if (broadcastBatch) broadcast(nb) else nb
    val joined = probe.join(cb, Seq("band", "bucket"))
    val matched =
      if (excludeSelf) joined.filter(col("id_new") =!= col("id_corpus"))
      else joined
    matched.select(col("id_new"), col("id_corpus")).distinct()
  }

  /**
   * Bloom-guarded incremental EXACT-dedup admission — the exact-match
   * twin of [[incrementalLshMatchesPrebucketed]]'s near-dup probe, and
   * the corpus-scale form of the reference's dedup-on-write admission
   * (`neo4j_memory.py:606-617`). The corpus maintains a Bloom filter
   * over xxhash64(content) — a KB–MB driver-side artifact that
   * OR-merges on append, so maintenance is O(delta) exactly like the
   * LSH bucket table. A batch doc whose content hash MISSES the bloom
   * is provably novel and is admitted without touching the corpus at
   * all; only bloom-positive docs (true duplicates plus the fpp sliver
   * of false positives) enter the exact confirm join. At steady state
   * (mostly-novel batches) the confirm join's probe side is the
   * duplicate fraction of the batch, not the batch.
   *
   * The confirm join keys on the content hash AND compares the text, so
   * a corpus laid out hash-bucketed on xxhash64(content) prunes the
   * probe to the candidates' buckets (same layout argument as the
   * bucket table). The result is EXACT — false positives die in the
   * confirm join — so the output equals the plain anti-join on content,
   * which is what the oracle replays.
   *
   * Returns the admitted subset of `batch` (original columns).
   */
  def bloomExactAdmission(batch: DataFrame, corpus: DataFrame,
                          textCol: String,
                          expectedItems: Long = 1L << 20,
                          fpp: Double = 0.01): DataFrame = {
    // empty corpus (first batch): everything is novel — and Spark's
    // bloom_filter_agg returns null over zero rows, which stat.bloomFilter
    // NPEs on, so the guard is required, not just a fast path
    if (corpus.isEmpty) return batch
    bloomExactAdmissionWith(batch, corpus, textCol,
      contentBloom(corpus, textCol, expectedItems, fpp))
  }

  /** Build the corpus content-hash Bloom filter — the driver-side
    * admission artifact the scaladoc above describes. A continuous
    * pipeline builds this ONCE (or on restart) and then OR-merges each
    * admitted batch's hashes via [[mergeContentHashes]] instead of
    * re-scanning the corpus every batch — the O(delta) maintenance that
    * makes admission corpus-flat at 100 TB. */
  def contentBloom(corpus: DataFrame, textCol: String,
                   expectedItems: Long = 1L << 20,
                   fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter =
    corpus.select(xxhash64(col(textCol)).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)

  /** OR-merge a just-admitted batch's content hashes into the maintained
    * filter, driver-side. The batch is the stream's delta — collecting
    * its hashes is O(batch), never O(corpus); callers localCheckpoint the
    * admitted frame so this reuses the materialization the store append
    * already paid for. Soundness: the filter must stay a SUPERSET of the
    * corpus keys (a missing key admits a duplicate); merging after every
    * committed append preserves that, and a crash between append and
    * merge is healed by the restart path rebuilding from the corpus. */
  def mergeContentHashes(bf: org.apache.spark.util.sketch.BloomFilter,
                         batch: DataFrame, textCol: String): Unit =
    batch.select(xxhash64(col(textCol)).as("__h")).na.drop("all")
      .collect().foreach(r => if (!r.isNullAt(0)) bf.putLong(r.getLong(0)))

  /** [[bloomExactAdmission]] with a caller-MAINTAINED filter: probe the
    * given bloom, exact-confirm only the positives against the corpus.
    * The corpus frame is touched ONLY by the confirm join's candidate
    * probe — a mostly-novel batch reads nothing from it. */
  def bloomExactAdmissionWith(batch: DataFrame, corpus: DataFrame,
                              textCol: String,
                              bf: org.apache.spark.util.sketch.BloomFilter)
      : DataFrame = {
    graft.functions.GraftFunctions.register(batch.sparkSession)
    val bytes = { // serialized once on the driver, ships as a literal
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out)
      out.toByteArray
    }
    // NULL text ⇒ xxhash64 is NULL ⇒ bloomMightContain is NULL. The plain
    // anti-join (and the oracle's NOT EXISTS) ADMITS such rows — a NULL
    // key matches nothing — so route them to the novel branch via
    // coalesce(_, false) instead of letting them fail both filters.
    val flagged = batch.withColumn("__might",
      coalesce(graft.functions.GraftFunctions.bloomMightContain(
        xxhash64(col(textCol)), bytes), lit(false)))
    val novel = flagged.filter(!col("__might")).drop("__might")
    val candidates = flagged.filter(col("__might")).drop("__might")
    val ck = corpus.select(xxhash64(col(textCol)).as("__ch"),
      col(textCol).as("__ct"))
    val confirmedNovel = candidates.join(ck,
        xxhash64(candidates(textCol)) === ck("__ch") &&
          candidates(textCol) === ck("__ct"),
        "left_anti")
    novel.unionByName(confirmedNovel)
  }

  /** Partition count for [[writeBucketArtifact]]'s bucket-prefix layout —
    * a canonical constant so probe-side derivation needs no metadata. */
  val BucketPrefixes = 16

  /** The bucket-prefix partition key: a stable hash of the bucket value
    * folded to [[BucketPrefixes]] cells. Equal buckets ⇒ equal prefix, so
    * adding it to the probe's join keys is a no-op semantically and a
    * partition-pruning handle physically. */
  def bucketPrefix(bucket: Column): Column =
    pmod(xxhash64(bucket), lit(BucketPrefixes.toLong)).cast("int")

  /**
   * Write the corpus bucket table PARTITIONED by the bucket prefix — the
   * physical layout SCALE.md's probe argument assumes. With the artifact
   * laid out this way and the batch side broadcast, Spark's dynamic
   * partition pruning turns the (band, bucket, bp) join into file-level
   * pruning: a probe touches only the partitions holding the batch's
   * bucket prefixes, so probe IO stops growing with the corpus even
   * before the row-level join runs. Appends (`mode=append` via the
   * snapshot layer or plain parquet) land in the same partition dirs.
   */
  def writeBucketArtifact(buckets: DataFrame, path: String,
                          mode: String = "overwrite"): Unit =
    buckets.withColumn("bp", bucketPrefix(col("bucket")))
      .write.partitionBy("bp").mode(mode).parquet(path)

  /**
   * Probe a [[writeBucketArtifact]] layout: derives the batch buckets'
   * prefixes with the same canonical expression, adds `bp` to the join
   * keys (semantically redundant — equal bucket implies equal bp — but it
   * is what lets dynamic partition pruning prune the corpus scan), and
   * delegates to [[incrementalLshMatchesPrebucketed]]'s contract.
   */
  def probeBucketArtifact(newBuckets: DataFrame, spark: org.apache.spark.sql.SparkSession,
                          path: String, idCol: String,
                          maxDf: Int = Int.MaxValue,
                          excludeSelf: Boolean = true): DataFrame = {
    val nb = newBuckets.withColumnRenamed(idCol, "id_new")
      .withColumn("bp", bucketPrefix(col("bucket")))
    val cb0 = spark.read.parquet(path).withColumnRenamed(idCol, "id_corpus")
    require(maxDf == Int.MaxValue || cb0.columns.contains("df"),
      "maxDf requested but the artifact has no precomputed 'df' column")
    val cb =
      if (maxDf != Int.MaxValue) cb0.filter(col("df") <= maxDf).drop("df")
      else cb0.drop(cb0.columns.filter(_ == "df"): _*)
    broadcast(nb).join(cb, Seq("band", "bucket", "bp"))
      .filter(if (excludeSelf) col("id_new") =!= col("id_corpus") else lit(true))
      .select(col("id_new"), col("id_corpus"))
      .distinct()
  }

  /** Annotate a bucket table with each (band, bucket)'s document frequency
    * — computed ONCE at artifact build/compaction time so the incremental
    * probe's hot-bucket cap ([[incrementalLshMatchesPrebucketed]] maxDf)
    * is a stored-column filter at probe time. On append the df drifts
    * conservatively low for new buckets; recompute with the periodic
    * compaction pass, like any other table statistic. */
  def withBucketDf(buckets: DataFrame): DataFrame = {
    val df = buckets.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).cast("int").as("df"))
    buckets.join(df, Seq("band", "bucket"))
  }

  /** MinHash-estimated Jaccard for candidate pairs (fraction of equal hashes). */
  def minhashJaccard(sig: DataFrame, idCol: String, pairs: DataFrame,
                     numHashes: Int): DataFrame = {
    val sa = sig.toDF(sig.columns.map(c => if (c == idCol) "id_a" else s"a_$c"): _*)
    val sb = sig.toDF(sig.columns.map(c => if (c == idCol) "id_b" else s"b_$c"): _*)
    val eqs = (0 until numHashes).map(j =>
      when(col(s"a_h$j") === col(s"b_h$j"), 1).otherwise(0))
    pairs.join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"),
        (eqs.reduce(_ + _).cast("double") / numHashes).as("est_jaccard"))
  }

  // ── n-gram Jaccard (exact, shared-shingle blocked) ──────────────────────
  /**
   * Exact Jaccard via the shared-shingle join: |A∩B| from a self-join on
   * shingle (blocking — only docs sharing ≥1 shingle ever pair), |A∪B| =
   * |A|+|B|-|A∩B|. The shingle join shuffles on the shingle value; hot
   * shingles (stopword-grams) are the skew risk at scale — cap them with a
   * document-frequency filter (`maxDf`).
   */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, minJaccard: Double,
                        maxDf: Option[Int] = None): DataFrame = {
    val sh = shingles(df, idCol, textCol, n).cache()
    val filtered = maxDf match {
      case Some(cap) =>
        val rare = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select(col("shingle"))
        sh.join(rare, Seq("shingle"), "left_semi")
      case None => sh
    }
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = filtered.select(col("shingle"), col(idCol).as("id_a"))
      .join(filtered.select(col("shingle"), col(idCol).as("id_b")), "shingle")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("i"))
    inter
      .join(sizes.toDF("id_a", "sz_a"), "id_a")
      .join(sizes.toDF("id_b", "sz_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("i").cast("double") / (col("sz_a") + col("sz_b") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /**
   * EXACT edit-distance similarity join (ED-Join's prefix filtering, Xiao
   * et al. 2008): every pair with levenshtein ≤ `maxDist`, found WITHOUT
   * an all-pairs pass. The pruning chain, each step exactness-preserving:
   *
   *  1. q-gram prefix blocking: one edit destroys at most q positional
   *     q-grams, so two strings within distance k share at least one of
   *     each other's (k·q+1) RAREST q-grams (rarity = global document
   *     frequency, ties on the gram). Candidates are generated ONLY by
   *     joining those prefixes — the rare-gram buckets are small by
   *     construction, the hot-gram bucket problem solved by theorem
   *     instead of a lossy df cap.
   *  2. length filter: |len(s) − len(t)| ≤ k.
   *  3. exact levenshtein confirm on the surviving candidates.
   *
   * The prefix theorem needs ≥ k·q+1 grams per string (len ≥ q·(k+1));
   * shorter strings go through a DELETION-NEIGHBORHOOD block instead (any
   * missed pair must have BOTH sides short, since length differs by ≤ k):
   * identical shorts collapse to one blocking row first, then each
   * DISTINCT short string keys on every string reachable by deleting ≤ k
   * characters. This is exact and complete — an alignment with ≤ k edit
   * ops leaves a common subsequence obtainable from EITHER side by ≤ k
   * deletions (each op consumes ≤ 1 character per side), so two strings
   * within distance k always share a neighborhood key (the SymSpell
   * theorem). Candidate count is Σ bucket² over deletion-variant buckets
   * — never all-pairs across distinct strings, whatever the cohort COUNT;
   * the per-string key fan-out is ≤ (len choose k) + 1 ≤ a small constant
   * because short strings have constant max length. (Pairs of IDENTICAL
   * strings are inherently quadratic in the duplicate count — that is the
   * join's own output size, not a blocking defect.)
   * Returns (id_a, id_b, dist) with id_a < id_b, dist ≤ maxDist.
   *
   * This is the entity-resolution / near-identical-title join; for long
   * documents use the shingle/MinHash family — edit distance on 10 KB
   * texts is the wrong metric and the wrong cost.
   */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 2, s"q must be >= 2, got $q")
    val k = maxDist
    val d = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .filter(col("__s").isNotNull).cache()
    val shortMax = q * (k + 1) // strings below this can miss the theorem
    val grams = d
      .filter(length(col("__s")) >= shortMax)
      .select(col("__id"), posexplode(expr(
        s"transform(sequence(1, length(__s) - ${q - 1}), i -> substring(__s, i, $q))"))
        .as(Seq("__pos", "__g")))
    val gramDf = grams.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id"))
      .orderBy(col("__df"), col("__g"), col("__pos"))
    val prefix = grams.join(gramDf, "__g")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k * q + 1)
      .select(col("__id"), col("__g"))
    val blocked = prefix.select(col("__g"), col("__id").as("id_a"))
      .join(prefix.select(col("__g"), col("__id").as("id_b")), "__g")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    // short-cohort fallback: a pair the prefix theorem cannot cover has
    // both sides shorter than shortMax + k. Blocked, not all-pairs:
    // identical shorts collapse to one row, then distinct strings join on
    // their ≤k-deletion neighborhoods (exact — see scaladoc). The hash
    // join on the variant key replaces the former crossJoin, so a 10⁸-row
    // short cohort generates Σ bucket² candidates, not 10¹⁶.
    val shorts = d.filter(length(col("__s")) < shortMax + k)
    val sdist = shorts.select(col("__s")).distinct()
    // D≤k(s): grow the ≤j-deletion set one deletion level at a time
    val delOnce = "transform(sequence(1, length(x)), i -> " +
      "concat(substring(x, 1, i-1), substring(x, i+1, length(x))))"
    var nbr = sdist.withColumn("__nbr", array(col("__s")))
    for (_ <- 1 to k)
      nbr = nbr.withColumn("__nbr", array_distinct(concat(col("__nbr"),
        expr(s"flatten(transform(__nbr, x -> case when length(x) = 0 " +
          s"then cast(array() as array<string>) else $delOnce end))"))))
    val keyed = nbr.select(col("__s"), explode(col("__nbr")).as("__key"))
    val strPairs = keyed.select(col("__key"), col("__s").as("__pa"))
      .join(keyed.select(col("__key"), col("__s").as("__pb")), "__key")
      .filter(col("__pa") <= col("__pb"))
      .select(col("__pa"), col("__pb")).distinct()
    val shortPairs = strPairs
      .join(shorts.select(col("__s").as("__pa"), col("__id").as("ida0")), "__pa")
      .join(shorts.select(col("__s").as("__pb"), col("__id").as("idb0")), "__pb")
      .filter(col("ida0") =!= col("idb0"))
      .select(least(col("ida0"), col("idb0")).as("id_a"),
        greatest(col("ida0"), col("idb0")).as("id_b"))
    val candidates = blocked.unionByName(shortPairs).distinct()
    candidates
      .join(d.select(col("__id").as("id_a"), col("__s").as("__sa")), "id_a")
      .join(d.select(col("__id").as("id_b"), col("__s").as("__sb")), "id_b")
      .filter(abs(length(col("__sa")) - length(col("__sb"))) <= k)
      // thresholded levenshtein runs the BANDED O(k·n) DP and returns -1
      // past the bound — the confirm step's cost no longer grows with the
      // square of string length, only with k
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__sa"), col("__sb"), k).as("dist"))
      .filter(col("dist") >= 0)
  }

  /**
   * Asymmetric n-gram CONTAINMENT (Broder 1997's containment coefficient):
   * c(A→B) = |A∩B| / |A| — how much of doc A's shingle set lives inside
   * doc B. The excerpt/quotation detector Jaccard is blind to: a short
   * doc fully copied into a long one has tiny Jaccard (the union is
   * dominated by the long doc) but containment ≈ 1 in the short→long
   * direction. Emits BOTH directions per candidate pair (c_ab = A-in-B,
   * c_ba = B-in-A), filtered on max(c_ab, c_ba) ≥ `minContainment`.
   *
   * Scale shape identical to [[ngramJaccardPairs]]: the pair term exists
   * only inside shared-shingle blocks, hot shingles capped by `maxDf`;
   * sizes are a per-doc aggregate joined back. Returns
   * (id_a, id_b, c_ab, c_ba), id_a < id_b, coefficients rounded to 6.
   */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int, minContainment: Double,
                       maxDf: Option[Int] = None): DataFrame = {
    val sh = shingles(df, idCol, textCol, n).cache()
    val filtered = maxDf match {
      case Some(cap) =>
        val rare = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select(col("shingle"))
        sh.join(rare, Seq("shingle"), "left_semi")
      case None => sh
    }
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = filtered.select(col("shingle"), col(idCol).as("id_a"))
      .join(filtered.select(col("shingle"), col(idCol).as("id_b")), "shingle")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("i"))
    inter
      .join(sizes.toDF("id_a", "sz_a"), "id_a")
      .join(sizes.toDF("id_b", "sz_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("i").cast("double") / col("sz_a"), 6).as("c_ab"),
        round(col("i").cast("double") / col("sz_b"), 6).as("c_ba"))
      .filter(greatest(col("c_ab"), col("c_ba")) >= minContainment)
  }

  /**
   * Fuzzy candidate join by edit distance on a fixed-length prefix:
   * shingle-blocked (a shared rare n-gram makes a candidate), then an exact
   * `levenshtein` filter over candidates only. Typo-level near-dup
   * detection that complements the set-similarity paths (Jaccard/MinHash
   * are blind to character transpositions inside tokens).
   *
   * Scale shape: identical to [[ngramJaccardPairs]] — the quadratic step
   * runs only within shingle buckets, hot shingles capped by `maxDf`, and
   * the O(prefixLen²) levenshtein is bounded by the fixed prefix (never
   * the whole document — full-text edit distance at corpus scale is not a
   * thing). Returns (id_a, id_b, dist), id_a < id_b.
   */
  def fuzzyPairs(df: DataFrame, idCol: String, textCol: String,
                 prefixLen: Int = 40, maxDist: Int = 10,
                 n: Int = 5, maxDf: Option[Int] = Some(50)): DataFrame = {
    val pre = df.select(col(idCol), substring(col(textCol), 1, prefixLen).as("__pre"))
    val sh = shingles(pre, idCol, "__pre", n)
    val filtered = maxDf match {
      case Some(cap) =>
        val rare = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select(col("shingle"))
        sh.join(rare, Seq("shingle"), "left_semi")
      case None => sh
    }
    val cand = filtered.select(col("shingle"), col(idCol).as("id_a"))
      .join(filtered.select(col("shingle"), col(idCol).as("id_b")), "shingle")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(pre.toDF("id_a", "pre_a"), "id_a")
      .join(pre.toDF("id_b", "pre_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("pre_a"), col("pre_b")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  // ── SimHash ──────────────────────────────────────────────────────────────
  /**
   * 64-bit SimHash over whitespace tokens: bit b of the fingerprint is the
   * sign of Σ_tokens (bit b of xxhash64(token) ? +1 : -1). Computed with
   * array ops (transform/aggregate) — one projection, no explode, no
   * shuffle; near-dup = Hamming distance via bit_count(xor).
   */
  def simhash64(textCol: Column): Column = {
    val tokens = filter(split(textCol, "\\s+"), t => length(t) > 0)
    // hash once per token, then 64 static-bit vote aggregations over the
    // hash array — a single projection, no explode, no shuffle
    val hashes = transform(tokens, t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val mask = lit(1L << b)
      val vote = aggregate(hashes, lit(0),
        (acc, h) => acc + when(h.bitwiseAND(mask) =!= 0, 1).otherwise(-1))
      when(vote > 0, mask).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /**
   * Plain-JVM twin of [[simhash64]] for typed/streaming paths where a
   * Column expression would evaluate interpreted (higher-order-function
   * lambdas) or per-row state is already deserialized: same tokens
   * (whitespace split, non-empty), same xxhash64 (Spark's XXH64 with seed
   * 42), same majority vote — parity with the Column form is pinned in
   * DedupSpec.
   */
  def simhash64Local(text: String): Long = {
    val votes = new Array[Int](64)
    var n = 0
    for (tok <- text.split("\\s+") if tok.nonEmpty) {
      val bytes = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      var b = 0
      while (b < 64) { votes(b) += ((h >>> b) & 1L).toInt; b += 1 }
      n += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) * 2 > n) sig |= (1L << b); b += 1 }
    sig
  }

  /** Vote-assembly core shared by the simhash variants: (id, h) token-hash
   *  rows → (id, sig). `nBits` codegen'd branchless bit sums + ONE shared
   *  count per doc (vote_b = 2·Σbit_b − n), one shuffle on the id. */
  private def simhashFromHashes(hashed: DataFrame, idCol: String, nBits: Int): DataFrame = {
    val votes = (0 until nBits).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(1)).as(s"s$b")) :+
      count(lit(1)).as("n")
    val voted = hashed.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val sig = (0 until nBits).map(b =>
      when(col(s"s$b") * 2 > col("n"), lit(1L << b)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    voted.select(col(idCol), sig.as("sig"))
  }

  private def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      explode(filter(split(col(textCol), "\\s+"), t => length(t) > 0)).as("tok"))

  /**
   * SimHash signatures as a DataFrame op: explode tokens → xxhash64 →
   * 64 codegen'd conditional sums per doc → assemble the fingerprint.
   * One shuffle on the id; every expression stays in whole-stage codegen
   * (unlike the Column-lambda variant above, whose higher-order-function
   * lambdas evaluate interpreted — fine for ad-hoc use, not for a scan).
   */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    simhashFromHashes(
      tokens(df, idCol, textCol).select(col(idCol), xxhash64(col("tok")).as("h")),
      idCol, nBits = 64)

  /** Portable-bit count of `simhashSignaturesPortable` (15 hex chars = 60 bits). */
  val PortableSigBits = 60

  /**
   * Portable 60-bit SimHash: the token hash is the first 15 hex chars of
   * md5(token) parsed as an integer — reproducible in ANY engine with md5
   * (the DuckDB oracle recomputes the identical signature), at the cost of
   * a slower hash than xxhash64. Same plan shape as `simhashSignatures`.
   */
  def simhashSignaturesPortable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    simhashFromHashes(
      tokens(df, idCol, textCol).select(col(idCol),
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long").as("h")),
      idCol, nBits = PortableSigBits)

  /**
   * Multi-band blocking over an integer signature column `sig`: split the
   * `sigBits`-bit signature into `bands` contiguous bands; docs sharing ANY
   * band value are candidates. Pigeonhole guarantee: every pair with
   * Hamming distance < `bands` shares at least one intact band — unlike a
   * single-prefix block, recall doesn't depend on WHERE the differing bits
   * fall, and bucket sizes are ~N/2^(sigBits/bands) per band rather than
   * N/2^prefix on one fixed prefix. Join is per-(band, bucket), never
   * all-pairs.
   */
  def bandedSigPairs(sigged: DataFrame, idCol: String, sigBits: Int,
                     bands: Int): DataFrame = {
    require(bands > 0 && sigBits % bands == 0, s"bands ($bands) must divide sigBits ($sigBits)")
    val width = sigBits / bands
    val mask = (1L << width) - 1
    val bandCols = (0 until bands).map { i =>
      struct(lit(i).as("band"),
        shiftrightunsigned(col("sig"), i * width).bitwiseAND(lit(mask)).as("bucket"))
    }
    val buckets = sigged.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = buckets.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = buckets.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /**
   * SimHash near-dup pairs: multi-band blocking (any shared band →
   * candidate), then exact Hamming ≤ maxHamming on the full signature.
   * Pairs with Hamming < `bands` are found with certainty; beyond that
   * recall degrades gracefully (each band is a 1/bands sample of the bits).
   * `portable = true` switches to the md5-derived 60-bit signature that a
   * SQL oracle can recompute.
   */
  def simhashNearDup(df: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int, bands: Int = 4,
                     portable: Boolean = false): DataFrame = {
    val sigBits = if (portable) PortableSigBits else 64
    // signatures materialized once — the pair join must not recompute them.
    // The cache lives as long as the returned plan (Spark evicts it LRU
    // under pressure); sessions running MANY near-dup passes should bound
    // storage with spark.catalog.clearCache between passes.
    val withSig = (if (portable) simhashSignaturesPortable(df, idCol, textCol)
                   else simhashSignatures(df, idCol, textCol)).cache()
    val pairs = bandedSigPairs(withSig, idCol, sigBits, bands)
    val sa = withSig.select(col(idCol).as("id_a"), col("sig").as("sig_a"))
    val sb = withSig.select(col(idCol).as("id_b"), col("sig").as("sig_b"))
    pairs.join(sa, "id_a").join(sb, "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  // ── embedding near-dup ───────────────────────────────────────────────────
  /**
   * Embedding-cosine near-dup, LSH-bucketed: random-hyperplane signature
   * (graft.rag.Rag.signature) blocks the join; exact cosine reranks within
   * buckets. `bruteForcePairs` is the oracle/small-data reference path.
   */
  def embeddingNearDupBruteForce(emb: DataFrame, idCol: String, vecCol: String,
                                 minCosine: Double): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        GraftFunctions.cosineSim(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  // ── near-dup clustering (pairs → groups → survivors) ─────────────────────
  /**
   * Connected components over a near-dup pair list: every doc gets the min
   * doc-id of its component as `cluster`. Iterative min-label propagation
   * (large-star/small-star simplification): each round joins current labels
   * across edges and keeps the per-node min; converges in O(component
   * diameter) rounds — near-dup clusters are shallow (diameter ≤ ~5), so a
   * handful of shuffles, each on the node id. Lineage is truncated with a
   * local checkpoint per round so 100 rounds can't build a 100-stage plan.
   */
  def connectedComponents(pairs: DataFrame, allIds: DataFrame, idCol: String,
                          maxIters: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    // undirected edge list, both directions
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().cache()
    // iterate ONLY over nodes that appear in an edge: in a near-dup corpus
    // almost every doc is isolated, so propagating |V| labels per round
    // would shuffle the whole corpus maxIters times for nothing — isolated
    // ids are unioned back (cluster = own id) after convergence.
    // Seed with the 1-hop minimum (least of self and direct neighbors),
    // computed in ONE aggregation over edges: near-dup components are
    // mostly cliques, so this init is already the fixpoint and the loop's
    // first round just confirms it — one driver job saved per query, and
    // the groupBy doubles as the edge-node enumeration.
    var labels = edges
      .groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("cluster"))
      .select(col("src").as("id"), col("cluster"))
      .cache()
    // labels only ever decrease, so Σcluster strictly decreases until the
    // fixpoint — convergence is one cheap scalar per round, not a self-join
    // (null sum = empty edge set, e.g. a corpus with no near-dup pairs)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("cluster")).cast("decimal(38,0)")).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // neighbor's current label, pulled across each edge
      val viaEdge = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("cluster", "nbr"),
          "dst")
        .groupBy(col("src").as("id")).agg(min(col("nbr")).as("nbr_min"))
      val next0 = labels.join(viaEdge, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nbr_min"), col("cluster"))).as("cluster"))
      // truncate lineage EVERY round: the round plan references `labels`
      // twice, so the analyzed tree doubles per round — with sparse
      // truncation Catalyst analysis (not execution) dominated the loop.
      // LAZY checkpoint: the labelSum aggregate materializes it, ONE job
      // per round instead of two (single-JVM local mode — no executor-loss
      // caveat for lazy local checkpoints)
      val next = next0.localCheckpoint(false)
      val s = labelSum(next) // materializes `next`, parent can go
      labels.unpersist(false) // no-op on the uncached round-0 frame
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      i += 1
    }
    // min-label propagation moves one hop per round: a component whose
    // diameter exceeds maxIters would otherwise return silently-split labels
    require(converged,
      s"connectedComponents did not converge in $maxIters rounds — a component's " +
        s"diameter exceeds the budget; raise maxIters (labels would be silently wrong)")
    // the final labels frame is cached/checkpointed, so the anti-join reads
    // the materialized edge-node set, not the pair-generation lineage
    val isolated = allIds.select(col(idCol).as("id"))
      .join(labels.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster"))
    val out = labels.unionByName(isolated)
    edges.unpersist()
    out
  }

  /**
   * Connected components by alternating large-star / small-star edge
   * rewrites (Kiveris et al., "Connected Components in MapReduce and
   * Beyond", SoCC 2014) — the deep-component scale path. Min-label
   * propagation ([[connectedComponents]]) moves one hop per round, so a
   * path of diameter d needs d rounds; star contraction halves distances
   * each alternation and converges in O(log d) rounds, at the cost of one
   * extra shuffle per round (both phases group on the node id, same key).
   *
   * Each phase recomputes every node's min neighbor m and rewires:
   * large-star points strictly-larger neighbors at m, small-star points
   * ≤-neighbors (and the node itself) at m. The fixpoint is a star per
   * component centered at its minimum id. Same output contract as
   * [[connectedComponents]]: (id, cluster) over allIds, isolated nodes
   * label themselves; fails fast if maxIters is exhausted.
   */
  def connectedComponentsStars(pairs: DataFrame, allIds: DataFrame,
                               idCol: String, maxIters: Int = 15): DataFrame = {
    def canon(df: DataFrame): DataFrame =
      df.select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b")).distinct()

    def phase(e: DataFrame, large: Boolean): DataFrame = {
      val both = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
      val mins = both.groupBy(col("u"))
        .agg(least(col("u"), min(col("v"))).as("m"))
      val joined = both.join(mins, Seq("u"))
      val emitted =
        if (large) joined.filter(col("v") > col("u"))
          .select(col("v").as("a"), col("m").as("b"))
        else joined.filter(col("v") <= col("u"))
          .select(col("v").as("a"), col("m").as("b"))
          .unionByName(mins.select(col("u").as("a"), col("m").as("b")))
      canon(emitted)
    }

    // edge-set signature: (count, Σ xxhash64) — equal signature after a full
    // large+small alternation ⇒ the star fixpoint (edges only ever move
    // toward component minima, so an unchanged set is stable, not cycling)
    def sig(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)"))).head()
      (r.getLong(0),
        Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO))
    }

    var edges = canon(pairs.select(col("id_a").as("a"), col("id_b").as("b")))
      .cache()
    var prev = sig(edges)
    var converged = edges.isEmpty
    var i = 0
    while (!converged && i < maxIters) {
      val next0 = phase(phase(edges, large = true), large = false)
      // truncate lineage EVERY round: each phase() references its input
      // ~4 times, so one round grows the analyzed tree ~16x — with sparser
      // truncation Catalyst ANALYSIS dominated wall time (measured 6 s+
      // per round on a 42-edge graph); per-round localCheckpoint keeps the
      // tree constant-size and the loop ~1 s/round. LAZY checkpoint: the
      // sig() aggregate right below materializes it, so each round runs
      // ONE job instead of two (single-JVM local mode — no executor-loss
      // caveat for lazy local checkpoints here)
      val next = next0.localCheckpoint(false)
      val s = sig(next)
      edges.unpersist(false)
      converged = s == prev
      prev = s
      edges = next
      i += 1
    }
    require(converged,
      s"connectedComponentsStars did not converge in $maxIters rounds — " +
        "raise maxIters (labels would be silently wrong)")
    val leaves = edges.groupBy(col("b").as("id")).agg(min(col("a")).as("cluster"))
    val centers = edges.select(col("a").as("id")).distinct()
      .join(leaves.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster"))
    val labeled = leaves.unionByName(centers)
    val isolated = allIds.select(col(idCol).as("id"))
      .join(labeled.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster"))
    labeled.unionByName(isolated)
  }

  /**
   * Survivor selection: one representative per cluster, highest `scoreCol`
   * wins (ties to min id) — the reduction that turns near-dup pairs into a
   * deduplicated corpus. Window top-1 per cluster (Spark 4 plans partial +
   * final WindowGroupLimit — no full sort of the corpus).
   */
  def dedupByCluster(df: DataFrame, labels: DataFrame, idCol: String,
                     scoreCol: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(scoreCol.desc, col(idCol))
    df.join(labels.withColumnRenamed("id", idCol), idCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /**
   * Embedding near-dup, hyperplane-LSH blocked: multi-band blocking on the
   * sign signature (any shared band → candidate; Hamming < `bands` pairs
   * are found with certainty), Hamming prune, then exact cosine rerank.
   */
  def embeddingNearDupLsh(emb: DataFrame, idCol: String, vecCol: String,
                          minCosine: Double, planes: Array[Array[Float]],
                          maxHamming: Int = 4, bands: Int = 4): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val sigged = graft.rag.Rag.withSignature(emb, vecCol, planes).cache()
    val pairs = bandedSigPairs(sigged, idCol, sigBits = planes.length, bands = bands)
    val a = sigged.select(col(idCol).as("id_a"), col(vecCol).as("v_a"), col("sig").as("sig_a"))
    val b = sigged.select(col(idCol).as("id_b"), col(vecCol).as("v_b"), col("sig").as("sig_b"))
    pairs.join(a, "id_a").join(b, "id_b")
      .filter(bit_count(col("sig_a").bitwiseXOR(col("sig_b"))) <= maxHamming)
      .select(col("id_a"), col("id_b"),
        GraftFunctions.cosineSim(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /**
   * Exact shared-span detection — the substring-dedup method ("documents
   * that share any exact run of ≥ w tokens") from the training-data
   * dedup literature, approximated at stride granularity: every w-token
   * window at stride `stride` fingerprints to md5, and two docs sharing
   * ANY window fingerprint share an exact w-token span (stride ≤ w/2
   * guarantees every span of 1.5w tokens is caught; smaller strides
   * tighten the bound toward w at linearly more windows).
   *
   * Scale shape: fingerprints are per-doc array expressions (one explode,
   * no char-level blowup), DISTINCT bounds each doc's contribution, and
   * `maxDf` drops boilerplate fingerprints shared by more than maxDf docs
   * (same skew cap as the n-gram path) BEFORE the bucket self-join — the
   * quadratic step runs only inside ≤ maxDf-sized buckets.
   * Output: (id_a, id_b, shared_windows), id_a < id_b.
   */
  def sharedSpanPairs(df: DataFrame, idCol: String, textCol: String,
                      w: Int = 20, stride: Int = 10,
                      maxDf: Int = 50): DataFrame = {
    require(w >= 2 && stride >= 1 && stride <= w,
      s"need w >= 2 and 1 <= stride <= w, got w=$w stride=$stride")
    val toks = graft.text.TextAnalysis.tokens(col(textCol))
    // docs shorter than w tokens have no w-token span BY DEFINITION — without
    // this filter two identical short docs would report a vacuous "shared
    // w-token span" from the single sub-w window. Spread an undersplit
    // scan first: tokenize+md5 is the CPU bulk ([[removeSharedSpans]]'s
    // rationale).
    val spread = graft.text.TextAnalysis.spreadIfUndersplit(df, col(idCol))
    val fps = spread.select(col(idCol).as("__id"), toks.as("__toks"))
      .filter(size(col("__toks")) >= w)
      .select(col("__id"),
        explode(transform(
          sequence(lit(0), size(col("__toks")) - w, lit(stride)),
          s => md5(concat_ws(" ", slice(col("__toks"), s + 1, lit(w)))))).as("fp"))
      .distinct()
    // one-pass skew-safe df cap (round-17, see [[exactSubstringPairs]]):
    // capped collect per fingerprint — map-side partial aggregation
    // collapses a hot boilerplate fingerprint into bounded buffers, a
    // group over the cap nulls out from its exact count — then pairs
    // explode from the ≤ maxDf bucket arrays. Fingerprints are distinct
    // per doc, so the group's value count IS the document frequency.
    val buckets = fps.groupBy(col("fp"))
      .agg(graft.expr.CappedCollectList(col("__id"), maxDf).as("ids"))
      .filter(col("ids").isNotNull && size(col("ids")) >= 2)
    buckets.select(explode(allPairs(col("ids"))).as("p"))
      .groupBy(col("p.a"), col("p.b"))
      .agg(count(lit(1)).as("shared_windows"))
      .select(col("a").as("id_a"), col("b").as("id_b"),
        col("shared_windows"))
  }

  /**
   * Exact duplicate-span REMOVAL — the corpus-REWRITE counterpart of
   * [[sharedSpanPairs]] (which only detects): every `w`-token window whose
   * fingerprint occurs in >= `minDf` distinct documents is duplicated text,
   * every token position covered by such a window is dropped, and each
   * document is re-assembled from its surviving tokens in order. This is
   * the exact-substring dedup of the training-data literature applied as a
   * transformation: boilerplate and cross-document copies disappear from
   * the corpus instead of merely being reported.
   *
   * Windows run at stride 1 (removal needs full coverage — a stride would
   * leave duplicated tokens between sampled windows), so the explode is
   * ~1 row per token: linear, never quadratic. The duplicated-fingerprint
   * set is produced by a combiner-friendly distinct+count and is small in
   * non-degenerate corpora (AQE broadcasts it back); covered positions are
   * bounded by duplicated-text volume x w before DISTINCT collapses the
   * overlaps. Re-assembly is one anti-join on (id, pos) plus one per-doc
   * sort_array over collect_list — per-doc memory, same class as every
   * other per-doc array op here.
   *
   * Output: (id, n_tokens, n_removed, clean_text), one row per input doc
   * (docs shorter than w tokens pass through untouched by definition).
   */
  def removeSharedSpans(df: DataFrame, idCol: String, textCol: String,
                        w: Int = 20, minDf: Int = 2): DataFrame = {
    require(w >= 2 && minDf >= 2, s"need w >= 2 and minDf >= 2, got w=$w minDf=$minDf")
    val toksC = graft.text.TextAnalysis.tokens(col(textCol))
    // spread an undersplit scan before the stride-1 window explode — the
    // tokenize+md5 stage is the CPU bulk of this operator and must
    // parallelize even when the corpus arrives as one small file
    val spread = graft.text.TextAnalysis.spreadIfUndersplit(df, col(idCol))
    // 1-based window starts, stride 1; sub-w docs have no w-token span
    val wins = spread.select(col(idCol).as("__id"), toksC.as("__toks"))
      .filter(size(col("__toks")) >= w)
      .select(col("__id"),
        explode(transform(
          sequence(lit(1), size(col("__toks")) - w + 1),
          s => struct(s.as("start"),
            md5(concat_ws(" ", slice(col("__toks"), s, lit(w)))).as("fp")))).as("__w"))
      .select(col("__id"), col("__w.start").as("__start"), col("__w.fp").as("fp"))
    val dup = wins.select(col("fp"), col("__id")).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf).select(col("fp"))
    val covered = wins.join(dup, Seq("fp"))
      .select(col("__id"),
        explode(sequence(col("__start"), col("__start") + w - 1)).as("__pos"))
      .distinct()
    val toksPos = spread
      .select(col(idCol).as("__id"), posexplode(toksC).as(Seq("__p0", "__tok")))
      .select(col("__id"), (col("__p0") + 1).as("__pos"), col("__tok"))
    val rebuilt = toksPos.join(covered, Seq("__id", "__pos"), "left_anti")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("__n_kept"),
        concat_ws(" ",
          transform(sort_array(collect_list(struct(col("__pos"), col("__tok")))),
            x => x.getField("__tok"))).as("__clean"))
    df.select(col(idCol).as("__id"), size(toksC).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("__clean"), lit("")).as("clean_text"))
  }

  // ── winnowing fingerprints (MOSS-style document fingerprinting) ──────────
  /**
   * Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD'03):
   * hash every `k`-char gram of the text, slide a window of `w` consecutive
   * gram hashes, keep the MINIMUM hash of each window, and emit the distinct
   * selected hashes as the document's fingerprints. Guarantees every shared
   * substring of length ≥ w+k-1 contributes at least one common fingerprint
   * between two documents, while sampling only ~2/(w+1) of all gram hashes —
   * the standard index-size/recall dial for plagiarism-style exact-overlap
   * detection at corpus scale.
   *
   * Everything is row-local array arithmetic (sequence → transform → slice →
   * array_min → array_distinct → explode): zero shuffles before the caller's
   * own aggregation, whole-stage codegen, cost linear in text length × w.
   * md5 keeps the hash engine-portable (the DuckDB oracle replays the exact
   * selection with a window-function MIN); ties inside a window (identical
   * md5 strings ⇒ identical grams) collapse under the distinct.
   *
   * Documents shorter than k chars have no grams and produce no rows; with
   * fewer than `w` grams the whole doc is one window (min of all grams) —
   * the winnowing paper's boundary behavior.
   * Output: (id, fingerprint) distinct pairs.
   */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 8, w: Int = 4): DataFrame = {
    require(k >= 2 && w >= 1, s"need k >= 2 and w >= 1, got k=$k w=$w")
    val nGrams = length(col(textCol)) - k + 1
    // gram emission via the one-pass CharGrams expression (round-18): the
    // transform(sequence, i -> substring(text, i, k)) shape re-scans the
    // string from byte 0 per window to find code point i — O(len²) byte
    // work per doc on the hottest loop of this family
    val hashes = transform(graft.expr.CharGrams(col(textCol), k), g => md5(g))
    // bind the gram-hash array to a LAMBDA VARIABLE (single-element
    // transform) so it is evaluated once per row — naming it through a
    // projection alias lets CollapseProject inline it into the window
    // lambda, where it would be recomputed per window: O(len²) md5 calls
    // instead of O(len), a 20× wall-time difference measured at sf0.1
    val fps = flatten(transform(array(hashes), h => {
      val g = size(h)
      transform(sequence(lit(1), greatest(g - w + 1, lit(1))),
        j => array_min(slice(h, j, least(lit(w), g))))
    }))
    df.filter(nGrams >= 1)
      .select(col(idCol).as("id"),
        explode(array_distinct(fps)).as("fingerprint"))
  }

  /**
   * Candidate pairs from shared winnowing fingerprints — the detection half
   * of the winnow path (fingerprints → pairs), same structure as
   * [[lshCandidatePairs]]: join ONLY on the fingerprint (never all-pairs),
   * count shared selections per pair, keep pairs with ≥ `minShared`. A
   * `maxDf` cap drops fingerprints selected in more than that many docs
   * before the self-join — boilerplate grams would otherwise create a
   * quadratic hot bucket (identical reasoning to [[sharedSpanPairs]]).
   * Output: (id_a, id_b, shared_fps), id_a < id_b.
   */
  def winnowCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                           k: Int = 8, w: Int = 4, minShared: Int = 2,
                           maxDf: Int = 50): DataFrame = {
    require(minShared >= 1 && maxDf >= 2,
      s"need minShared >= 1 and maxDf >= 2, got minShared=$minShared maxDf=$maxDf")
    // spread an undersplit scan first: gram hashing + window minima are
    // the CPU bulk and must parallelize even from one small file
    val fps = winnowFingerprints(
      graft.text.TextAnalysis.spreadIfUndersplit(df, col(idCol)),
      idCol, textCol, k, w)
    // one-pass skew-safe df cap — capped collect per fingerprint + pairs
    // from the bucket array, never a window count and never a self-join
    // (see [[exactSubstringPairs]]: the hot boilerplate fingerprint must
    // collapse map-side, never colocate in one unsplittable window task)
    val buckets = fps.groupBy(col("fingerprint"))
      .agg(graft.expr.CappedCollectList(col("id"), maxDf).as("ids"))
      .filter(col("ids").isNotNull && size(col("ids")) >= 2)
    buckets.select(explode(allPairs(col("ids"))).as("p"))
      .groupBy(col("p.a"), col("p.b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
      .select(col("a").as("id_a"), col("b").as("id_b"), col("shared_fps"))
  }

  /**
   * EXACT substring-level contamination pairs (round-16): every pair of
   * documents sharing at least `minShared` exact substrings of length
   * `minLen`, joined on the SUBSTRING ITSELF — no hashes anywhere in the
   * match, so a reported pair provably shares the returned witness text
   * verbatim. This is the reference-free decontamination shape (the
   * "13-gram overlap" filter eval-suite hygiene needs): [[contamination]]
   * probes a KNOWN benchmark list, [[winnowCandidatePairs]] trades recall
   * below w+k-1 for a ~2/(w+1) index — this verb is the exact tier, the
   * distributed equivalent of bucketing a suffix array by its first
   * `minLen` characters (each gram IS a suffix's length-`minLen` prefix;
   * suffixes sharing it collide in one bucket; any shared substring of
   * length ≥ minLen IS some shared gram, so recall at minLen is total).
   *
   * Scale: emission is O(total chars) distinct-per-doc gram rows — the
   * price of exactness; dial `minLen` up or step down to the winnow tier
   * when the index must shrink. The join is banded on the gram (never
   * all-pairs); `maxDf` drops grams present in more than that many
   * documents BEFORE the self-join, the boilerplate guard every banded
   * path here uses (a license header shared by a million docs would
   * otherwise make one quadratic bucket). Row-local array arithmetic up
   * to the explode, whole-stage codegen; the df cap and the banding are
   * ONE skew-safe aggregation ([[graft.expr.CappedCollectList]] — never a
   * window, never a self-join: the cap must not itself be the skew
   * bottleneck it exists to prevent), pairs exploding from ≤ maxDf bucket
   * arrays.
   *
   * Output: (id_a, id_b, shared_grams, witness), id_a < id_b, witness =
   * the lexicographically-least shared gram.
   */
  def exactSubstringPairs(df: DataFrame, idCol: String, textCol: String,
                          minLen: Int = 20, minShared: Int = 1,
                          maxDf: Int = 50): DataFrame = {
    require(minLen >= 2 && minShared >= 1 && maxDf >= 2,
      s"need minLen >= 2, minShared >= 1, maxDf >= 2: $minLen/$minShared/$maxDf")
    // spread an undersplit scan BEFORE the explode: gram emission plus
    // the capped-collect partial aggregation are the CPU bulk, and a
    // small single-file corpus would otherwise run both on one task
    val spread = graft.text.TextAnalysis.spreadIfUndersplit(df, col(idCol))
    val grams = spread.filter(length(col(textCol)) >= minLen)
      .select(col(idCol).as("id"),
        // one-pass gram emission (round-18) — see [[winnowFingerprints]]
        explode(array_distinct(
          graft.expr.CharGrams(col(textCol), minLen))).as("gram"))
    // grams are distinct per doc, so the group's value count IS the
    // document frequency. ONE pass (round-17): a skew-safe capped collect
    // per gram ([[graft.expr.CappedCollectList]] — map-side partial
    // aggregation collapses a hot boilerplate gram into bounded
    // (count, ≤maxDf ids) buffers; groups over the cap evaluate to NULL
    // from the exact count) and pairs explode from the ≤maxDf-sized
    // bucket arrays. No self-join, no second evaluation of the gram
    // explode, and — critically — no Window.partitionBy(gram) df count,
    // which would drag every occurrence of exactly the gram this cap
    // exists to discard (a license header shared by 30% of the corpus)
    // into one semantically-unsplittable straggler task.
    val buckets = grams.groupBy(col("gram"))
      .agg(graft.expr.CappedCollectList(col("id"), maxDf).as("ids"))
      .filter(col("ids").isNotNull && size(col("ids")) >= 2)
    buckets.select(col("gram"), explode(allPairs(col("ids"))).as("p"))
      .groupBy(col("p.a"), col("p.b"))
      .agg(count(lit(1)).as("shared_grams"), min(col("gram")).as("witness"))
      .filter(col("shared_grams") >= minShared)
      .select(col("a").as("id_a"), col("b").as("id_b"),
        col("shared_grams"), col("witness"))
  }

  // ── semantic dedup (SemDeDup-style centroid-bucketed cosine pruning) ─────
  /**
   * Semantic near-dup pruning in the SemDeDup shape (Abbas et al., 2023):
   * cluster the embedding space, then compare pairs ONLY within a cluster
   * and prune every vector that has a sufficiently-similar lower-id
   * neighbor. The cluster step here is one deterministic Lloyd assignment
   * seeded by the corpus' own `labelCol` partition (per-label centroid =
   * decimal-exact per-dimension mean, so the seed is bit-stable across
   * engines and partitionings); [[semanticDedupTrained]] refines that seed
   * with distributed Lloyd iterations (k-means proper) — the swap changes
   * only the centroid table, not the shape of the plan.
   *
   * Scale argument: the all-pairs term is bounded by the largest cluster
   * (Σ|cluster|² instead of n²), centroids are a K×dim broadcast, and the
   * pairwise stage is one self-join on `cluster` with the codegen'd
   * cosine expression — the exact structure that holds when n grows 1000×
   * and K grows with it.
   *
   * Output: (id, cluster, max_sim, kept) — cluster = assigned centroid
   * label, max_sim = highest cosine to a smaller-id cluster-mate (null if
   * none), kept = no cluster-mate with smaller id reaches `minCosine`.
   *
   * The assignment table is cached for the plan's lifetime (same contract
   * as [[simhashNearDup]]: Spark evicts LRU under pressure; sessions
   * running many passes should `spark.catalog.clearCache()` between them).
   */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, minCosine: Double): DataFrame = {
    val cent = centroidTable(emb, col(labelCol), vecCol)
    val assigned = assignToCentroids(emb, idCol, vecCol, cent).cache()
    pruneWithinClusters(assigned, vecCol, minCosine)
  }

  /**
   * SemDeDup with TRAINED centroids — k-means proper, the paper's shape
   * (Abbas et al., 2023 §3): the per-label seed is refined by `lloydIters`
   * distributed Lloyd iterations (assign every vector to its nearest
   * centroid, recompute each centroid as the decimal-exact mean of its
   * assignees) before the final assignment and within-cluster prune.
   *
   * This is the same distributed-Lloyd shape as [[graft.rag.Ivf.refine]]
   * (posexplode → groupBy(cluster, dim): the shuffle carries K×dim rows,
   * never the corpus; the centroid relation is KiB-sized), re-expressed
   * with this module's cross-engine determinism contract instead of
   * Ivf's float/spherical arithmetic: decimal-exact order-independent
   * sums, 6dp-rounded means, cosine assignment with ties to the lowest
   * cluster id — so a relational replay (the DuckDB oracle) reproduces
   * the centroids bit-for-bit. Clusters that lose every member keep
   * their previous centroid (same empty-cell rule as Ivf.refine).
   *
   * Each iteration is one full corpus pass (inherent to Lloyd's); the
   * centroid table is materialized per round with an eager
   * localCheckpoint — K×dim scalars, the moral twin of Ivf.refine's
   * driver collect — so iteration i+1's plan starts from data, not from
   * iteration i's whole lineage.
   */
  def semanticDedupTrained(emb: DataFrame, idCol: String, vecCol: String,
                           labelCol: String, minCosine: Double,
                           lloydIters: Int = 1): DataFrame = {
    require(lloydIters >= 1, s"need lloydIters >= 1, got $lloydIters")
    var cent = centroidTable(emb, col(labelCol), vecCol)
    for (_ <- 1 to lloydIters) {
      val asg = assignToCentroids(emb, idCol, vecCol, cent)
      val next = centroidTable(asg, col("cluster"), vecCol)
      cent = cent.select(col("__cl"), col("__cvec").as("__cv0"))
        .join(next.select(col("__cl"), col("__cvec").as("__cv1")), Seq("__cl"), "left")
        .select(col("__cl"), coalesce(col("__cv1"), col("__cv0")).as("__cvec"))
        .localCheckpoint(true)
    }
    val assigned = assignToCentroids(emb, idCol, vecCol, cent).cache()
    pruneWithinClusters(assigned, vecCol, minCosine)
  }

  /**
   * Per-cluster centroid table (`__cl`, `__cvec`): decimal-exact sums
   * (order-independent, so centroids are reproducible bit-for-bit across
   * engines and partitionings), means rounded to 6dp like every
   * cross-engine float surface in this battery.
   */
  private def centroidTable(df: DataFrame, clCol: Column, vecCol: String): DataFrame =
    df.select(clCol.as("__cl"), posexplode(col(vecCol)).as(Seq("__dim", "__x")))
      .groupBy(col("__cl"), col("__dim"))
      .agg((sum(col("__x").cast("decimal(28,12)")).cast("double") /
        count(lit(1))).as("__m"))
      .groupBy(col("__cl"))
      .agg(transform(array_sort(collect_list(struct(col("__dim"), col("__m")))),
        x => round(x.getField("__m"), 6)).as("__cvec"))

  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /**
   * Nearest centroid by cosine → (id, vecCol, cluster). K×dim broadcast,
   * ordered-fold arithmetic (aggregate over zip_with) so the
   * per-(vec,centroid) score is a deterministic left-to-right sum in EVERY
   * engine's replay. Norms are precomputed per vector and per centroid
   * (they're invariant across the K×n cross product — recomputing them per
   * pair tripled the interpreted higher-order-function work), and the
   * vector side is hash-repartitioned on id first: a small parquet scan
   * arrives in one partition, and the cross product would otherwise
   * evaluate single-threaded. Explicit N: a bare repartition(key) is
   * AQE-coalescible by shuffle BYTES, and a few MB of vectors collapse to
   * one partition — leaving the K×n interpreted dot-product stage
   * single-threaded. Argmax as a hash aggregate (max_by on
   * (score, -cluster): highest score wins, ties to the LOWEST cluster id —
   * same total order as a row_number window but without the rank
   * exchange+sort).
   */
  private def assignToCentroids(emb: DataFrame, idCol: String, vecCol: String,
                                cent: DataFrame): DataFrame = {
    val centN = cent.withColumn("__cnorm", sqrt(dotD(col("__cvec"), col("__cvec"))))
    val vd = transform(col(vecCol), x => x.cast("double"))
    val scored = emb.select(col(idCol).as("id"), col(vecCol))
      .repartition(emb.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .withColumn("__vd", vd)
      .withColumn("__vnorm", sqrt(dotD(col("__vd"), col("__vd"))))
      .crossJoin(broadcast(centN))
      .withColumn("__s", round(
        dotD(col("__vd"), col("__cvec")) / (col("__vnorm") * col("__cnorm")), 6))
    scored
      .groupBy(col("id"))
      .agg(max_by(struct(col("__cl"), col(vecCol).as("__v")),
        struct(col("__s"), (-col("__cl")).as("__negcl"))).as("__best"))
      .select(col("id"), col("__best.__v").as(vecCol),
        col("__best.__cl").as("cluster"))
  }

  /**
   * Within-cluster pairwise cosine (codegen'd expression, no dim
   * explosion); a vector is pruned when a SMALLER-id cluster-mate is
   * ≥ minCosine similar — the deterministic one-survivor-per-pair rule.
   * `assigned` should be cached by the caller: the pairwise stage consumes
   * it on BOTH sides of the self-join, and it is also the output's
   * id/cluster spine — without the cache the assignment pipeline executes
   * three times.
   */
  private def pruneWithinClusters(assigned: DataFrame, vecCol: String,
                                  minCosine: Double): DataFrame = {
    GraftFunctions.register(assigned.sparkSession)
    val b = assigned.select(col("cluster"), col("id").as("__ib"),
      col(vecCol).as("__vb"))
    val sims = assigned.join(b, Seq("cluster"))
      .filter(col("id") < col("__ib"))
      .select(col("__ib").as("id"),
        round(GraftFunctions.cosineSim(col(vecCol), col("__vb")), 6).as("__sim"))
      .groupBy(col("id")).agg(max(col("__sim")).as("max_sim"))
    assigned.select(col("id"), col("cluster"))
      .join(sims, Seq("id"), "left")
      .select(col("id"), col("cluster"), col("max_sim"),
        (coalesce(col("max_sim"), lit(-1.0d)) < minCosine).as("kept"))
  }
}
