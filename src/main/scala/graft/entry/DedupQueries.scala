package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.GraftFunctions
import graft.model.Schemas
import graft.ops.Relational
import graft.rag.Rag
import graft.sources.TestData
import graft.streaming.Events
import graft.text.TextAnalysis

import graft.entry.Shared._

/** Query family split out of SparkEntry (round-12); see Shared. */
private[graft] object DedupQueries {

  def defs: Seq[(String, Q)] = Seq(

    "dd_exact_groups" -> Q(
      (s, d) => T(s, d, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .select(col("keep_id"), col("n_dups"))
        .orderBy(col("keep_id")),
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_dups
             |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin)),

    "dd_exact_survivors" -> Q(
      (s, d) => Dedup.exactSurvivors(T(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"))
        .orderBy(col("doc_id")),
      Some("""SELECT min(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id""")),

    // Train/test contamination: held-out docs (odd ids) whose 5-gram
    // shingles leak from the training split (even ids) — the eval-integrity
    // gate, blocked by shingle exactly like the n-gram Jaccard path
    "dd_contamination" -> Q(
      (s, d) => Dedup.contamination(
          T(s, d, "documents").filter(col("doc_id") < 200), "doc_id", "text",
          isTrain = col("doc_id") % 2 === 0, n = 5)
        .select(col("doc_id"), col("n_shingles"), col("n_shared"),
          round(col("contamination"), 6).as("contamination"))
        .orderBy(col("doc_id")),
      Some(s"""WITH ${shingleCte("WHERE doc_id < 200")},
              |tr AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 2 = 0),
              |te AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 2 = 1),
              |tot AS (SELECT doc_id, count(*) AS n_shingles FROM te GROUP BY 1),
              |shared AS (SELECT doc_id, count(*) AS n_shared
              |           FROM te JOIN tr USING (shingle) GROUP BY 1)
              |SELECT t.doc_id, t.n_shingles,
              |  CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared,
              |  round(coalesce(s.n_shared, 0) / CAST(t.n_shingles AS DOUBLE), 6)
              |    AS contamination
              |FROM tot t LEFT JOIN shared s USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    // Typo-level fuzzy dedup: shingle-blocked candidates, exact levenshtein
    // on a fixed prefix (both engines implement classic edit distance)
    "dd_fuzzy_pairs" -> Q(
      (s, d) => Dedup.fuzzyPairs(
          T(s, d, "documents").filter(col("doc_id") < 500), "doc_id", "text",
          prefixLen = 40, maxDist = 15, n = 5, maxDf = Some(50))
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH p AS (SELECT doc_id, substr(text, 1, 40) AS pre
             |           FROM documents WHERE doc_id < 500),
             |sh AS (SELECT DISTINCT doc_id, substr(pre, CAST(s + 1 AS INT), 5) AS shingle
             |       FROM (SELECT doc_id, pre,
             |               unnest(range(0, greatest(length(pre) - 5, 0) + 1)) AS s
             |             FROM p) t),
             |rare AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 50),
             |blocked AS (SELECT doc_id, shingle FROM sh JOIN rare USING (shingle)),
             |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |         FROM blocked a JOIN blocked b USING (shingle)
             |         WHERE a.doc_id < b.doc_id)
             |SELECT id_a, id_b, CAST(levenshtein(pa.pre, pb.pre) AS INT) AS dist
             |FROM cand JOIN p pa ON id_a = pa.doc_id JOIN p pb ON id_b = pb.doc_id
             |WHERE levenshtein(pa.pre, pb.pre) <= 15
             |ORDER BY id_a, id_b""".stripMargin)),

    "dd_minhash_signature" -> Q(
      (s, d) => Dedup.minhashSignature(
          T(s, d, "documents").filter(col("doc_id") < 50), "doc_id", "text",
          n = 5, numHashes = 4)
        .orderBy(col("doc_id")),
      Some(s"""WITH ${shingleCte("WHERE doc_id < 50")}
             |SELECT doc_id,
             |  min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
             |  min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3
             |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    "dd_lsh_candidates" -> Q(
      (s, d) => {
        val sig = Dedup.minhashSignature(
          T(s, d, "documents").filter(col("doc_id") < 50), "doc_id", "text", 5, 4)
        Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 4, bands = 2)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""WITH ${shingleCte("WHERE doc_id < 50")},
             |sig AS (SELECT doc_id,
             |    min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
             |    min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3
             |  FROM sh GROUP BY doc_id),
             |b AS (SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM sig
             |      UNION ALL
             |      SELECT doc_id, 1 AS band, md5(h2 || '|' || h3) AS bucket FROM sig)
             |SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
             |FROM b a JOIN b c ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id
             |ORDER BY id_a, id_b""".stripMargin)),

    // pairs → connected components → per-doc cluster label: the step that
    // turns near-dup pairs into a deduplicated corpus. Oracle recomputes the
    // identical md5 LSH pairs, then closes them with a recursive CTE.
    "dd_cluster_labels" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents").filter(col("doc_id") < 50)
        val sig = Dedup.minhashSignature(docs, "doc_id", "text", 5, 4)
        val pairs = Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 4, bands = 2)
        Dedup.connectedComponents(pairs, docs.select(col("doc_id")), "doc_id")
          .select(col("id").as("doc_id"), col("cluster"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE ${shingleCte("WHERE doc_id < 50")},
             |sig AS (SELECT doc_id,
             |    min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
             |    min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3
             |  FROM sh GROUP BY doc_id),
             |b AS (SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM sig
             |      UNION ALL
             |      SELECT doc_id, 1 AS band, md5(h2 || '|' || h3) AS bucket FROM sig),
             |pairs AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
             |  FROM b a JOIN b c ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |r AS (SELECT doc_id AS id, doc_id AS m FROM documents WHERE doc_id < 50
             |      UNION
             |      SELECT e.src, r.m FROM edges e JOIN r ON e.dst = r.id)
             |SELECT id AS doc_id, min(m) AS cluster FROM r GROUP BY id ORDER BY doc_id""".stripMargin)),

    // incremental near-dup: a new batch (doc_id % 10 = 0) blocked against
    // the precomputed corpus signatures — batch buckets broadcast, corpus
    // never self-joins
    "dd_incremental_lsh" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents").filter(col("doc_id") < 200)
        val newDf = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        val corpusDf = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
        Dedup.incrementalLshMatches(
          Dedup.minhashSignature(newDf, "doc_id", "text", 5, 4),
          Dedup.minhashSignature(corpusDf, "doc_id", "text", 5, 4),
          "doc_id", numHashes = 4, bands = 2)
          .orderBy(col("id_new"), col("id_corpus"))
      },
      Some(s"""WITH ${shingleCte("WHERE doc_id < 200")},
             |sig AS (SELECT doc_id,
             |    min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
             |    min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3
             |  FROM sh GROUP BY doc_id),
             |b AS (SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM sig
             |      UNION ALL
             |      SELECT doc_id, 1 AS band, md5(h2 || '|' || h3) AS bucket FROM sig),
             |nb AS (SELECT doc_id AS id_new, band, bucket FROM b WHERE doc_id % 10 = 0),
             |cb AS (SELECT doc_id AS id_corpus, band, bucket FROM b WHERE doc_id % 10 <> 0)
             |SELECT DISTINCT id_new, id_corpus
             |FROM nb JOIN cb USING (band, bucket)
             |ORDER BY id_new, id_corpus""".stripMargin)),

    // Bloom-guarded incremental EXACT-dedup admission (round-11): the
    // corpus keeps a bloom over xxhash64(text) — a KB artifact that
    // OR-merges on append — and a batch doc that MISSES it is admitted
    // without touching the corpus at all; bloom-positives go through the
    // exact confirm join (hash-keyed, text-compared), which kills the fpp
    // false positives. Output is EXACT, so the oracle is the plain
    // anti-join on content — bloom correctness and join-prune shape are
    // both covered by the hash compare.
    "dd_incremental_exact_bloom" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents")
        val batch = docs.filter(col("doc_id") >= 400)
        val corpus = docs.filter(col("doc_id") < 400)
        Dedup.bloomExactAdmission(batch, corpus, "text",
            expectedItems = 1 << 12, fpp = 0.01)
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT b.doc_id, b.source FROM documents b
             |WHERE b.doc_id >= 400
             |  AND NOT EXISTS (SELECT 1 FROM documents c
             |                  WHERE c.doc_id < 400 AND c.text = b.text)
             |ORDER BY b.doc_id""".stripMargin)),

    // Steady-state twin of dd_incremental_lsh: the corpus bucket table is
    // MATERIALIZED to parquet first (the daily artifact a production
    // pipeline maintains with one O(delta) append per batch) and the batch
    // probes it via the prebucketed path — the corpus is never re-signed,
    // never re-exploded; its cost per batch is one columnar scan of a
    // 3-column table. Result is identical to the re-signing path, so the
    // oracle is the same relational replay; hash-green here proves the
    // parquet round-trip preserves the bucket keys bit-exactly.
    "dd_incremental_prebucketed" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents").filter(col("doc_id") < 200)
        val newDf = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        val corpusDf = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
        val root = FixtureRoot.fresh("prebucket")
        val bucketDir = root.toString + "/corpus_buckets"
        Dedup.lshBuckets(
            Dedup.minhashSignature(corpusDf, "doc_id", "text", 5, 4),
            "doc_id", numHashes = 4, bands = 2)
          .write.mode("overwrite").parquet(bucketDir)
        Dedup.incrementalLshMatchesPrebucketed(
          Dedup.lshBuckets(
            Dedup.minhashSignature(newDf, "doc_id", "text", 5, 4),
            "doc_id", numHashes = 4, bands = 2),
          s.read.parquet(bucketDir), "doc_id")
          .orderBy(col("id_new"), col("id_corpus"))
      },
      Some(s"""WITH ${shingleCte("WHERE doc_id < 200")},
             |sig AS (SELECT doc_id,
             |    min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
             |    min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3
             |  FROM sh GROUP BY doc_id),
             |b AS (SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM sig
             |      UNION ALL
             |      SELECT doc_id, 1 AS band, md5(h2 || '|' || h3) AS bucket FROM sig),
             |nb AS (SELECT doc_id AS id_new, band, bucket FROM b WHERE doc_id % 10 = 0),
             |cb AS (SELECT doc_id AS id_corpus, band, bucket FROM b WHERE doc_id % 10 <> 0)
             |SELECT DISTINCT id_new, id_corpus
             |FROM nb JOIN cb USING (band, bucket)
             |ORDER BY id_new, id_corpus""".stripMargin)),

    // Winnowing document fingerprints (MOSS): md5 k-gram hashes, min per
    // sliding window of w hashes, distinct selected hashes per doc. Row-
    // local array arithmetic — the plan has NO shuffle before the final
    // distinct, and the fingerprint density (~2/(w+1)) is the index-size
    // dial. Oracle replays the selection with a window-frame MIN over the
    // exploded gram table — same md5, same boundary rule (docs with fewer
    // than w grams yield one whole-doc window).
    "dd_winnow" -> Q(
      (s, d) => Dedup.winnowFingerprints(
          T(s, d, "documents").filter(col("doc_id") < 300), "doc_id", "text",
          k = 8, w = 4)
        .select(col("id").as("doc_id"), col("fingerprint"))
        .orderBy(col("doc_id"), col("fingerprint")),
      Some("""WITH g AS (SELECT doc_id, i, md5(substr(text, CAST(i AS INT), 8)) AS h,
             |    greatest(length(text) - 8 + 1, 0) AS ng
             |  FROM (SELECT doc_id, text,
             |          unnest(range(1, greatest(length(text) - 8, 0) + 2)) AS i
             |        FROM documents WHERE doc_id < 300) t
             |  WHERE i <= length(text) - 8 + 1),
             |wm AS (SELECT doc_id, i, ng,
             |    min(h) OVER (PARTITION BY doc_id ORDER BY i
             |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
             |  FROM g)
             |SELECT DISTINCT doc_id, fp AS fingerprint FROM wm
             |WHERE i <= greatest(ng - 4 + 1, 1)
             |ORDER BY doc_id, fingerprint""".stripMargin)),

    // EXACT substring contamination pairs (round-16): suffix-prefix
    // bucketing joined on the substring ITSELF — no hashes in the match,
    // the witness column is the shared text verbatim. The reference-free
    // decontamination tier above the winnow path (which trades recall
    // below w+k-1 for index size). minLen=30/minShared=2 is
    // discriminative on this corpus: 28 of 125k possible pairs at
    // sf0.01, 727 of 12.5M at sf0.1.
    "dd_substring_exact" -> Q(
      (s, d) => Dedup.exactSubstringPairs(T(s, d, "documents"),
          "doc_id", "text", minLen = 30, minShared = 2, maxDf = 50)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH g AS (
             |  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 30) AS gram
             |  FROM (SELECT doc_id, text,
             |          unnest(range(1, greatest(length(text) - 30, 0) + 2)) AS i
             |        FROM documents) t
             |  WHERE i <= length(text) - 30 + 1),
             |b AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= 50),
             |gg AS (SELECT g.* FROM g JOIN b USING (gram))
             |SELECT a.doc_id AS id_a, c.doc_id AS id_b,
             |  count(*) AS shared_grams, min(a.gram) AS witness
             |FROM gg a JOIN gg c ON a.gram = c.gram AND a.doc_id < c.doc_id
             |GROUP BY 1, 2 HAVING count(*) >= 2
             |ORDER BY id_a, id_b""".stripMargin)),

    // exact substring pairs → components → SURVIVORS: the substring
    // family's full reduction, mirroring dd_winnow_survivors /
    // dd_cluster_survivors — exact gram-bucketed pairs, min-label
    // components, longest-text winner per cluster (ties to min id).
    // Composition of proven pieces: exactSubstringPairs (gram join,
    // maxDf cap), connectedComponents (lineage-truncated min-label),
    // dedupByCluster — no all-pairs term anywhere.
    "dd_substring_survivors" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents")
        val pairs = Dedup.exactSubstringPairs(docs, "doc_id", "text",
          minLen = 30, minShared = 2, maxDf = 50)
        val labels = Dedup.connectedComponents(
          pairs, docs.select(col("doc_id")), "doc_id")
        Dedup.dedupByCluster(docs, labels, "doc_id", length(col("text")))
          .select(col("doc_id"), col("cluster"),
            length(col("text")).as("text_len"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE g AS (
             |  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 30) AS gram
             |  FROM (SELECT doc_id, text,
             |          unnest(range(1, greatest(length(text) - 30, 0) + 2)) AS i
             |        FROM documents) t
             |  WHERE i <= length(text) - 30 + 1),
             |b AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= 50),
             |gg AS (SELECT g.* FROM g JOIN b USING (gram)),
             |pairs AS (SELECT a.doc_id AS id_a, c.doc_id AS id_b
             |  FROM gg a JOIN gg c ON a.gram = c.gram AND a.doc_id < c.doc_id
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |r AS (SELECT doc_id AS id, doc_id AS m FROM documents
             |      UNION
             |      SELECT e.src, r.m FROM edges e JOIN r ON e.dst = r.id),
             |lbl AS (SELECT id AS doc_id, min(m) AS cluster FROM r GROUP BY id),
             |ranked AS (SELECT d.doc_id, l.cluster, length(d.text) AS text_len,
             |    row_number() OVER (PARTITION BY l.cluster
             |                       ORDER BY length(d.text) DESC, d.doc_id) AS rn
             |  FROM documents d JOIN lbl l ON d.doc_id = l.doc_id)
             |SELECT doc_id, cluster, CAST(text_len AS INT) AS text_len
             |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // winnow fingerprints → candidate PAIRS (the detection half of the
    // winnow path, structurally the LSH-pairs shape): join only on the
    // selected fingerprint, maxDf caps boilerplate buckets, ≥ minShared
    // filters incidental single-gram collisions. k=20/w=10 chosen where
    // the pair set is discriminative on this corpus (27 of 44k possible
    // pairs at sf0.01), not all-pairs as char-8 grams would be.
    "dd_winnow_pairs" -> Q(
      (s, d) => Dedup.winnowCandidatePairs(
          T(s, d, "documents").filter(col("doc_id") < 300), "doc_id", "text",
          k = 20, w = 10, minShared = 2, maxDf = 10)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH g AS (SELECT doc_id, i, md5(substr(text, CAST(i AS INT), 20)) AS h,
             |    greatest(length(text) - 20 + 1, 0) AS ng
             |  FROM (SELECT doc_id, text,
             |          unnest(range(1, greatest(length(text) - 20, 0) + 2)) AS i
             |        FROM documents WHERE doc_id < 300) t
             |  WHERE i <= length(text) - 20 + 1),
             |wm AS (SELECT doc_id, i, ng,
             |    min(h) OVER (PARTITION BY doc_id ORDER BY i
             |                 ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING) AS fp
             |  FROM g),
             |fps AS (SELECT DISTINCT doc_id, fp FROM wm
             |        WHERE i <= greatest(ng - 10 + 1, 1)),
             |bounded AS (SELECT doc_id, fp FROM (
             |    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df
             |    FROM fps) t WHERE df <= 10),
             |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    count(*) AS shared_fps
             |  FROM bounded a JOIN bounded b
             |    ON a.fp = b.fp AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT id_a, id_b, shared_fps FROM pairs
             |WHERE shared_fps >= 2 ORDER BY id_a, id_b""".stripMargin)),

    // winnow pairs → connected components → SURVIVORS: the full winnow-
    // family reduction mirroring dd_cluster_survivors (the minhash capstone):
    // fingerprint-blocked pairs, min-label components, longest-text winner
    // per cluster (ties to min id). Every stage re-uses the proven pieces —
    // winnowCandidatePairs (fingerprint join, maxDf cap), connectedComponents
    // (per-round lineage truncation; a round-11 A/B measured the star-
    // contraction variant 2x slower on this shallow pair graph, so min-label
    // stays), dedupByCluster — so the scale argument
    // is the composition of their individual ones: no all-pairs term, joins
    // only on fingerprint / node id. Oracle closes the identical md5 winnow
    // pairs with the recursive-CTE pattern, then picks the same winner.
    "dd_winnow_survivors" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents").filter(col("doc_id") < 300)
        val pairs = Dedup.winnowCandidatePairs(docs, "doc_id", "text",
          k = 20, w = 10, minShared = 2, maxDf = 10)
        val labels = Dedup.connectedComponents(
          pairs, docs.select(col("doc_id")), "doc_id")
        Dedup.dedupByCluster(docs, labels, "doc_id", length(col("text")))
          .select(col("doc_id"), col("cluster"), length(col("text")).as("text_len"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE g AS (SELECT doc_id, i, md5(substr(text, CAST(i AS INT), 20)) AS h,
             |    greatest(length(text) - 20 + 1, 0) AS ng
             |  FROM (SELECT doc_id, text,
             |          unnest(range(1, greatest(length(text) - 20, 0) + 2)) AS i
             |        FROM documents WHERE doc_id < 300) t
             |  WHERE i <= length(text) - 20 + 1),
             |wm AS (SELECT doc_id, i, ng,
             |    min(h) OVER (PARTITION BY doc_id ORDER BY i
             |                 ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING) AS fp
             |  FROM g),
             |fps AS (SELECT DISTINCT doc_id, fp FROM wm
             |        WHERE i <= greatest(ng - 10 + 1, 1)),
             |bounded AS (SELECT doc_id, fp FROM (
             |    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df
             |    FROM fps) t WHERE df <= 10),
             |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
             |  FROM bounded a JOIN bounded b
             |    ON a.fp = b.fp AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |r AS (SELECT doc_id AS id, doc_id AS m FROM documents WHERE doc_id < 300
             |      UNION
             |      SELECT e.src, r.m FROM edges e JOIN r ON e.dst = r.id),
             |lbl AS (SELECT id AS doc_id, min(m) AS cluster FROM r GROUP BY id),
             |ranked AS (SELECT d.doc_id, l.cluster, length(d.text) AS text_len,
             |    row_number() OVER (PARTITION BY l.cluster
             |                       ORDER BY length(d.text) DESC, d.doc_id) AS rn
             |  FROM documents d JOIN lbl l ON d.doc_id = l.doc_id WHERE d.doc_id < 300)
             |SELECT doc_id, cluster, CAST(text_len AS INT) AS text_len
             |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // SemDeDup-style semantic pruning: deterministic centroid seed (per-
    // label decimal-exact means), nearest-centroid assignment (K×dim
    // broadcast), pairwise cosine ONLY within a cluster, smaller-id
    // survivor rule. The all-pairs term is Σ|cluster|², never n² — the
    // property that survives a 1000× corpus. Oracle replays centroids,
    // assignment, and within-cluster pairs relationally.
    "dd_semdedup" -> Q(
      (s, d) => Dedup.semanticDedup(
          TestData.embeddings(s, d).filter(col("vec_id") =!= 0),
          "vec_id", "embedding", "label", minCosine = 0.35)
        .select(col("id").as("vec_id"), col("cluster"), col("max_sim"), col("kept"))
        .orderBy(col("vec_id")),
      Some("""WITH base AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id <> 0),
             |dimsl AS (SELECT label, vec_id, unnest(embedding)::DOUBLE AS x,
             |            generate_subscripts(embedding, 1) AS i FROM base),
             |cent AS (SELECT label AS cl, i,
             |    round(CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS m
             |  FROM dimsl GROUP BY label, i),
             |asg AS (SELECT d.vec_id, c.cl,
             |    SUM(d.x * c.m) / (SQRT(SUM(d.x * d.x)) * SQRT(SUM(c.m * c.m))) AS s
             |  FROM dimsl d JOIN cent c ON d.i = c.i GROUP BY d.vec_id, c.cl),
             |best AS (SELECT vec_id, cl AS cluster FROM (
             |    SELECT vec_id, cl, row_number() OVER (
             |      PARTITION BY vec_id ORDER BY round(s, 6) DESC, cl) AS rn FROM asg) t
             |  WHERE rn = 1),
             |bc AS (SELECT b.vec_id, b.embedding, t.cluster FROM base b JOIN best t USING (vec_id)),
             |pd AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
             |    unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
             |  FROM bc a JOIN bc b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
             |ps AS (SELECT ia, ib,
             |    round(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS s
             |  FROM pd GROUP BY ia, ib),
             |ms AS (SELECT ib AS vec_id, max(s) AS max_sim FROM ps GROUP BY ib)
             |SELECT c.vec_id, c.cluster, m.max_sim,
             |  coalesce(m.max_sim, -1.0) < 0.35 AS kept
             |FROM bc c LEFT JOIN ms m USING (vec_id)
             |ORDER BY c.vec_id""".stripMargin)),

    // SemDeDup with TRAINED centroids (k-means proper, the paper's shape):
    // the per-label seed refined by ONE distributed Lloyd iteration —
    // assign to nearest seed centroid, recompute each centroid as the
    // decimal-exact 6dp-rounded mean of its assignees (empty clusters keep
    // their seed) — then the final assignment and within-cluster prune.
    // The oracle replays the ENTIRE training relationally: seed means,
    // assignment argmax, refined means, second assignment, pairwise prune —
    // so it verifies the Lloyd arithmetic itself, not just its consumer.
    "dd_semdedup_trained" -> Q(
      (s, d) => Dedup.semanticDedupTrained(
          TestData.embeddings(s, d).filter(col("vec_id") =!= 0),
          "vec_id", "embedding", "label", minCosine = 0.35, lloydIters = 1)
        .select(col("id").as("vec_id"), col("cluster"), col("max_sim"), col("kept"))
        .orderBy(col("vec_id")),
      Some("""WITH base AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id <> 0),
             |dimsl AS (SELECT label, vec_id, unnest(embedding)::DOUBLE AS x,
             |            generate_subscripts(embedding, 1) AS i FROM base),
             |cent0 AS (SELECT label AS cl, i,
             |    round(CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS m
             |  FROM dimsl GROUP BY label, i),
             |asg0s AS (SELECT d.vec_id, c.cl,
             |    SUM(d.x * c.m) / (SQRT(SUM(d.x * d.x)) * SQRT(SUM(c.m * c.m))) AS s
             |  FROM dimsl d JOIN cent0 c ON d.i = c.i GROUP BY d.vec_id, c.cl),
             |asg0 AS (SELECT vec_id, cl FROM (
             |    SELECT vec_id, cl, row_number() OVER (
             |      PARTITION BY vec_id ORDER BY round(s, 6) DESC, cl) AS rn FROM asg0s) t
             |  WHERE rn = 1),
             |cent1n AS (SELECT a.cl, d.i,
             |    round(CAST(sum(CAST(d.x AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS m
             |  FROM dimsl d JOIN asg0 a USING (vec_id) GROUP BY a.cl, d.i),
             |cent1 AS (SELECT c0.cl, c0.i, coalesce(c1.m, c0.m) AS m
             |  FROM cent0 c0 LEFT JOIN cent1n c1 ON c0.cl = c1.cl AND c0.i = c1.i),
             |asg1s AS (SELECT d.vec_id, c.cl,
             |    SUM(d.x * c.m) / (SQRT(SUM(d.x * d.x)) * SQRT(SUM(c.m * c.m))) AS s
             |  FROM dimsl d JOIN cent1 c ON d.i = c.i GROUP BY d.vec_id, c.cl),
             |best AS (SELECT vec_id, cl AS cluster FROM (
             |    SELECT vec_id, cl, row_number() OVER (
             |      PARTITION BY vec_id ORDER BY round(s, 6) DESC, cl) AS rn FROM asg1s) t
             |  WHERE rn = 1),
             |bc AS (SELECT b.vec_id, b.embedding, t.cluster FROM base b JOIN best t USING (vec_id)),
             |pd AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
             |    unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
             |  FROM bc a JOIN bc b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
             |ps AS (SELECT ia, ib,
             |    round(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS s
             |  FROM pd GROUP BY ia, ib),
             |ms AS (SELECT ib AS vec_id, max(s) AS max_sim FROM ps GROUP BY ib)
             |SELECT c.vec_id, c.cluster, m.max_sim,
             |  coalesce(m.max_sim, -1.0) < 0.35 AS kept
             |FROM bc c LEFT JOIN ms m USING (vec_id)
             |ORDER BY c.vec_id""".stripMargin)),

    // same clustering through the O(log d) large-star/small-star path —
    // the deep-component scale route, checked against the identical
    // recursive-CTE closure oracle
    "dd_cluster_stars" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents").filter(col("doc_id") < 50)
        val sig = Dedup.minhashSignature(docs, "doc_id", "text", 5, 4)
        val pairs = Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 4, bands = 2)
        Dedup.connectedComponentsStars(pairs, docs.select(col("doc_id")), "doc_id")
          .select(col("id").as("doc_id"), col("cluster"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE ${shingleCte("WHERE doc_id < 50")},
             |sig AS (SELECT doc_id,
             |    min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
             |    min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3
             |  FROM sh GROUP BY doc_id),
             |b AS (SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM sig
             |      UNION ALL
             |      SELECT doc_id, 1 AS band, md5(h2 || '|' || h3) AS bucket FROM sig),
             |pairs AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
             |  FROM b a JOIN b c ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |r AS (SELECT doc_id AS id, doc_id AS m FROM documents WHERE doc_id < 50
             |      UNION
             |      SELECT e.src, r.m FROM edges e JOIN r ON e.dst = r.id)
             |SELECT id AS doc_id, min(m) AS cluster FROM r GROUP BY id ORDER BY doc_id""".stripMargin)),

    // pairs → components → SURVIVORS: the full near-dup reduction ending in
    // a deduplicated corpus (best quality = longest text wins, ties to min
    // id). Oracle closes the identical md5 LSH pairs with a recursive CTE,
    // then picks the same per-cluster winner.
    "dd_cluster_survivors" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents").filter(col("doc_id") < 50)
        val sig = Dedup.minhashSignature(docs, "doc_id", "text", 5, 4)
        val pairs = Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 4, bands = 2)
        val labels = Dedup.connectedComponents(pairs, docs.select(col("doc_id")), "doc_id")
        Dedup.dedupByCluster(docs, labels, "doc_id", length(col("text")))
          .select(col("doc_id"), col("cluster"), length(col("text")).as("text_len"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE ${shingleCte("WHERE doc_id < 50")},
             |sig AS (SELECT doc_id,
             |    min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
             |    min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3
             |  FROM sh GROUP BY doc_id),
             |b AS (SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM sig
             |      UNION ALL
             |      SELECT doc_id, 1 AS band, md5(h2 || '|' || h3) AS bucket FROM sig),
             |pairs AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
             |  FROM b a JOIN b c ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |r AS (SELECT doc_id AS id, doc_id AS m FROM documents WHERE doc_id < 50
             |      UNION
             |      SELECT e.src, r.m FROM edges e JOIN r ON e.dst = r.id),
             |lbl AS (SELECT id AS doc_id, min(m) AS cluster FROM r GROUP BY id),
             |ranked AS (SELECT d.doc_id, l.cluster, length(d.text) AS text_len,
             |    row_number() OVER (PARTITION BY l.cluster
             |                       ORDER BY length(d.text) DESC, d.doc_id) AS rn
             |  FROM documents d JOIN lbl l ON d.doc_id = l.doc_id WHERE d.doc_id < 50)
             |SELECT doc_id, cluster, CAST(text_len AS INT) AS text_len
             |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    "dd_ngram_jaccard" -> Q(
      (s, d) => Dedup.ngramJaccardPairs(
          T(s, d, "documents").filter(col("doc_id") < 50), "doc_id", "text",
          n = 5, minJaccard = 0.2)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH ${shingleCte("WHERE doc_id < 50")},
             |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |jac AS (SELECT id_a, id_b, i * 1.0 / (sa.sz + sb.sz - i) AS jaccard
             |  FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id)
             |SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM jac
             |WHERE jaccard >= 0.2 ORDER BY id_a, id_b""".stripMargin)),

    // Exact edit-distance similarity join (round-13): ED-Join q-gram
    // prefix blocking + levenshtein confirm. The oracle is the brute-force
    // all-pairs join over the SAME bounded fixture — a hash match proves
    // the blocking chain (rare-gram prefixes, length filter, short-cohort
    // fallback) loses NO pair, which is the entire claim of the operator.
    "dd_edit_join" -> Q(
      (s, d) => Dedup.editDistancePairs(
          T(s, d, "documents").filter(col("doc_id") < 500)
            .select(col("doc_id"), substring(col("text"), 1, 25).as("t")),
          "doc_id", "t", maxDist = 3)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH fix AS (SELECT doc_id, substr(text, 1, 25) AS t
             |  FROM documents WHERE doc_id < 500)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(levenshtein(a.t, b.t) AS INT) AS dist
             |FROM fix a JOIN fix b ON a.doc_id < b.doc_id
             |WHERE abs(length(a.t) - length(b.t)) <= 3
             |  AND levenshtein(a.t, b.t) <= 3
             |ORDER BY id_a, id_b""".stripMargin)),

    // Asymmetric containment (round-11): |A∩B|/|A| per direction — the
    // excerpt/quotation detector Jaccard is blind to (a short doc copied
    // into a long one has tiny Jaccard but containment ≈ 1). Same
    // shared-shingle blocking as dd_ngram_jaccard; oracle replays both
    // normalizations.
    "dd_containment" -> Q(
      (s, d) => Dedup.containmentPairs(
          T(s, d, "documents").filter(col("doc_id") < 50), "doc_id", "text",
          n = 5, minContainment = 0.4)
        .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH ${shingleCte("WHERE doc_id < 50")},
             |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |cont AS (SELECT id_a, id_b,
             |    round(i * 1.0 / sa.sz, 6) AS c_ab,
             |    round(i * 1.0 / sb.sz, 6) AS c_ba
             |  FROM inter JOIN sizes sa ON id_a = sa.doc_id
             |             JOIN sizes sb ON id_b = sb.doc_id)
             |SELECT id_a, id_b, c_ab, c_ba FROM cont
             |WHERE greatest(c_ab, c_ba) >= 0.4 ORDER BY id_a, id_b""".stripMargin)),

    // portable md5-derived 60-bit simhash + multi-band blocking: the DuckDB
    // oracle recomputes the identical signature, band buckets, and Hamming
    // filter — full hash-checked mirror of the banded near-dup path
    "dd_simhash_neardup" -> Q(
      (s, d) => Dedup.simhashNearDup(
          T(s, d, "documents"), "doc_id", "text", maxHamming = 20, bands = 4,
          portable = true)
        .orderBy(col("id_a"), col("id_b")),
      Some(simhashPortableSql("", maxHamming = 20, bands = 4))),

    // embedding near-dup LSH scale path: seed-fixed hyperplanes embedded as
    // SQL literals so DuckDB computes the identical sign signature, band
    // buckets, Hamming prune, and exact cosine rerank
    "dd_embedding_lsh" -> Q(
      (s, d) => {
        val planes = Rag.hyperplanes(dim = 64, nBits = 16, seed = 42L)
        Dedup.embeddingNearDupLsh(
            T(s, d, "embeddings").filter(col("vec_id") < 200), "vec_id", "embedding",
            minCosine = 0.3, planes, maxHamming = 6, bands = 4)
          .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some {
        val planes = Rag.hyperplanes(dim = 64, nBits = 16, seed = 42L)
        s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
           |sigs AS (SELECT vec_id, embedding, ${planeSigSql(planes, "embedding")} AS sig FROM emb),
           |bnd AS (SELECT vec_id, 0 AS band, (sig >> 0) & 15 AS bucket FROM sigs
           |  UNION ALL SELECT vec_id, 1 AS band, (sig >> 4) & 15 AS bucket FROM sigs
           |  UNION ALL SELECT vec_id, 2 AS band, (sig >> 8) & 15 AS bucket FROM sigs
           |  UNION ALL SELECT vec_id, 3 AS band, (sig >> 12) & 15 AS bucket FROM sigs),
           |pairs AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM bnd a JOIN bnd b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
           |pruned AS (SELECT p.id_a, p.id_b FROM pairs p
           |  JOIN sigs sa ON p.id_a = sa.vec_id JOIN sigs sb ON p.id_b = sb.vec_id
           |  WHERE bit_count(xor(sa.sig, sb.sig)) <= 6),
           |cp AS (SELECT p.id_a, p.id_b, unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
           |  FROM pruned p JOIN emb a ON p.id_a = a.vec_id JOIN emb b ON p.id_b = b.vec_id),
           |cos AS (SELECT id_a, id_b, SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS c
           |  FROM cp GROUP BY id_a, id_b)
           |SELECT id_a, id_b, round(c, 6) AS cosine FROM cos
           |WHERE c >= 0.3 ORDER BY id_a, id_b""".stripMargin
      }),

    "dd_embedding_neardup" -> Q(
      (s, d) => Dedup.embeddingNearDupBruteForce(
          T(s, d, "embeddings").filter(col("vec_id") < 200), "vec_id", "embedding",
          minCosine = 0.3)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH p AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
             |    unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
             |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |  WHERE a.vec_id < 200 AND b.vec_id < 200),
             |s AS (SELECT ia, ib, SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS c
             |      FROM p GROUP BY ia, ib)
             |SELECT ia AS id_a, ib AS id_b, round(c, 6) AS cosine FROM s
             |WHERE c >= 0.3 ORDER BY id_a, id_b""".stripMargin)),

    // V4 best-match gate, both outcomes in one fixture: the fixture's best
    // cosine is ~0.33-0.41 at every SF, so the strict 0.8 gate REJECTS
    // (its branch contributes 0 rows — the reference's cache-miss path)
    // while the loose 0.3 gate PASSES the same top-1 (1 row survives; a
    // 0-row result would prove nothing)
    "v4_best_match_gate" -> Q(
      (s, d) => {
        val q = queryVec(s, d)
        val emb = TestData.embeddings(s, d).filter(col("vec_id") =!= 0)
        val strict = Rag.knn(emb, "vec_id", "embedding", q, k = 1, minScore = 0.8)
          .withColumn("gate", lit("strict@0.8"))
        val loose = Rag.knn(emb, "vec_id", "embedding", q, k = 1, minScore = 0.3)
          .withColumn("gate", lit("loose@0.3"))
        strict.unionByName(loose)
          .select(col("gate"), col("vec_id"), round(col("score"), 6).as("score"))
          .orderBy(col("gate"), col("vec_id"))
      },
      Some("""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
             |pairs AS (SELECT e.vec_id AS vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qv)::DOUBLE AS y
             |          FROM embeddings e, q WHERE e.vec_id <> 0),
             |scores AS (SELECT vec_id, SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS s
             |           FROM pairs GROUP BY vec_id),
             |topk AS (SELECT vec_id, s FROM scores ORDER BY s DESC, vec_id LIMIT 1)
             |SELECT gate, vec_id, round(s, 6) AS score FROM (
             |  SELECT 'strict@0.8' AS gate, vec_id, s FROM topk WHERE s >= 0.8
             |  UNION ALL
             |  SELECT 'loose@0.3' AS gate, vec_id, s FROM topk WHERE s >= 0.3) t
             |ORDER BY gate, vec_id""".stripMargin))
  )
}
