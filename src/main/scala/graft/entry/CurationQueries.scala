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
private[graft] object CurationQueries {

  def defs: Seq[(String, Q)] = Seq(

    // Exact corpus-wide heavy hitters (top-k frequent tokens + counts):
    // groupBy + TakeOrderedAndProject — the distinct set is never sorted
    "cu_heavy_hitters" -> Q(
      (s, d) => graft.ops.Curation.heavyHitters(
        T(s, d, "documents").select(
          explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok")),
        col("tok"), k = 20),
      Some("""SELECT value, count(*) AS n FROM (
             |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                            t -> length(t) > 0)) AS value
             |  FROM documents)
             |GROUP BY 1 ORDER BY n DESC, value LIMIT 20""".stripMargin)),

    // Deterministic domain mixing (portable md5-Bernoulli per row) + audit:
    // corpus composition is reproducible bit-for-bit on any engine
    // deterministic train/val/test split audit: cumulative thresholds over
    // the portable uniform (thresholds interpolated from the same doubles)
    "cu_split_assign" -> Q(
      (s, d) => graft.ops.Curation.splitAssign(T(s, d, "documents"), "doc_id",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .groupBy(col("split")).agg(count(lit(1)).as("n"))
        .orderBy(col("split")),
      Some(s"""SELECT CASE WHEN u < 0.8 THEN 'train'
             |            WHEN u < 0.9 THEN 'val'
             |            ELSE 'test' END AS split, count(*) AS n
             |FROM (SELECT CAST('0x' || substr(md5('split|' || doc_id), 1, 15) AS BIGINT)
             |        % 10000 / 10000.0 AS u
             |      FROM documents)
             |GROUP BY 1 ORDER BY split""".stripMargin)),

    // temperature rebalancing audit: q_s ∝ n_s^0.5 keep-rates from the
    // corpus itself, deterministic hash-Bernoulli application
    "cu_temperature_mix" -> Q(
      (s, d) => graft.ops.Curation.temperatureMix(
          T(s, d, "documents"), "doc_id", "source", tau = 0.5, targetFrac = 0.5)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
          first(col("__keep_rate")).as("keep_rate"))
        .orderBy(col("source")),
      Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS total_n, sum(pow(n, 0.5)) AS z FROM c),
             |r AS (SELECT source, round(least(1.0,
             |        0.5 * total_n * pow(n, 0.5) / z / n), 6) AS keep_rate FROM c, t),
             |k AS (SELECT d.source, r.keep_rate,
             |        CAST('0x' || substr(md5('temp|' || d.doc_id), 1, 15) AS BIGINT)
             |          % 10000 / 10000.0 < r.keep_rate AS kept
             |      FROM documents d JOIN r USING (source))
             |SELECT source, count(*) AS n_total,
             |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  keep_rate
             |FROM k GROUP BY source, keep_rate ORDER BY source""".stripMargin)),

    "cu_weighted_mix" -> Q(
      (s, d) => graft.ops.Curation.mixAudit(
          graft.ops.Curation.weightedMix(T(s, d, "documents"), "doc_id", "source",
            rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
            defaultRate = 0.1),
          "source")
        .select(col("source"), col("n_total"), col("n_kept"),
          round(col("realized_rate"), 6).as("realized_rate"))
        .orderBy(col("source")),
      Some("""SELECT source, count(*) AS n_total,
             |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  round(sum(CASE WHEN kept THEN 1 ELSE 0 END)
             |        / CAST(count(*) AS DOUBLE), 6) AS realized_rate
             |FROM (SELECT source,
             |        CAST('0x' || substr(md5('mix|' || doc_id), 1, 15) AS BIGINT)
             |          % 10000 / 10000.0 <
             |        CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
             |                    WHEN 'src2' THEN 0.25 ELSE 0.1 END AS kept
             |      FROM documents)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Quantile binning into quality tiers (deterministic ntile: total order
    // with id tiebreak), rolled up per bin
    // Count-min heavy hitters (the sketch scale path): sample→candidates,
    // sketch→selection, exact verify pass → output counts are exact, so the
    // exact top-k IS the oracle. Deterministic: xxhash64 buckets + hashed
    // row sample, no rand().
    "cu_cm_topk" -> Q(
      (s, d) => graft.ops.Curation.cmTopK(
        T(s, d, "documents").select(col("doc_id"),
          posexplode(graft.text.TextAnalysis.tokens(col("text")))
            .as(Seq("pos", "tok"))),
        rowKey = concat_ws("#", col("doc_id"), col("pos")),
        value = col("tok"), k = 10),
      Some("""SELECT value, count(*) AS n FROM (
             |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                            t -> length(t) > 0)) AS value
             |  FROM documents)
             |GROUP BY 1 ORDER BY n DESC, value LIMIT 10""".stripMargin)),

    // Cutpoint binning (the shuffle-free scale path of cu_quality_bins):
    // exact interpolated percentiles (DuckDB quantile_cont twin) collected
    // once, binning as a scalar expression over the scan
    "cu_cutpoint_bins" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents")
        val cuts = graft.ops.Curation.percentileCutpoints(docs, col("n_chars"), n = 10)
        graft.ops.Curation.binByCutpoints(docs, col("n_chars"), cuts)
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
          .orderBy(col("bin"))
      },
      Some("""WITH c AS (
             |  SELECT quantile_cont(n_chars, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cuts
             |  FROM documents)
             |SELECT bin, count(*) AS n_docs,
             |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
             |FROM (SELECT n_chars,
             |        1 + CAST(n_chars > cuts[1] AS INT) + CAST(n_chars > cuts[2] AS INT)
             |          + CAST(n_chars > cuts[3] AS INT) + CAST(n_chars > cuts[4] AS INT)
             |          + CAST(n_chars > cuts[5] AS INT) + CAST(n_chars > cuts[6] AS INT)
             |          + CAST(n_chars > cuts[7] AS INT) + CAST(n_chars > cuts[8] AS INT)
             |          + CAST(n_chars > cuts[9] AS INT) AS bin
             |      FROM documents, c)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Crawl curation: subdomain-aware domain blocklist as equi joins over
    // the suffix chain. URLs synthesized deterministically from doc_id
    // (identical in both engines); the oracle uses the naive LIKE-suffix
    // form — same semantics, nested-loop shape we deliberately avoid
    "web_domain_block" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents").select(col("doc_id"),
          concat(lit("https://"),
            when(pmod(col("doc_id"), lit(3)) === 0, lit("cdn.")).otherwise(lit("")),
            lit("d"), pmod(col("doc_id"), lit(40)).cast("string"),
            lit(".example.com/p/"), col("doc_id").cast("string")).as("url"))
        val blocklist = Seq("d1.example.com", "d7.example.com",
          "d13.example.com", "d28.example.com").toDF("domain")
        graft.ops.Web.blockByDomain(docs, "doc_id", col("url"), blocklist)
          .orderBy(col("doc_id"))
      },
      Some("""WITH u AS (
             |  SELECT doc_id,
             |    'https://' || CASE WHEN doc_id % 3 = 0 THEN 'cdn.' ELSE '' END
             |      || 'd' || (doc_id % 40)::VARCHAR || '.example.com/p/'
             |      || doc_id::VARCHAR AS url
             |  FROM documents),
             |b(domain) AS (VALUES ('d1.example.com'), ('d7.example.com'),
             |                     ('d13.example.com'), ('d28.example.com')),
             |d AS (SELECT doc_id, url,
             |        lower(regexp_extract(url,
             |          '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS dom
             |      FROM u)
             |SELECT doc_id, url FROM d
             |WHERE NOT EXISTS (SELECT 1 FROM b
             |                  WHERE dom = b.domain OR dom LIKE '%.' || b.domain)
             |ORDER BY doc_id""".stripMargin)),

    // Per-source quota caps (fixed-count companion to the rate-based mix):
    // portable md5 hash order, so DuckDB reproduces the exact sample
    "cu_quota_sample" -> Q(
      (s, d) => graft.ops.Curation.quotaSample(
          T(s, d, "documents"), "doc_id", "source", quota = 25)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, source FROM (
             |  SELECT doc_id, source,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY md5('quota|' || doc_id::VARCHAR), doc_id) AS rk
             |  FROM documents) t
             |WHERE rk <= 25 ORDER BY doc_id""".stripMargin)),

    // Greedy per-source token-budget fill: best docs first (type/token
    // ratio as the quality proxy) until the source's cumulative token count
    // hits the budget — the knapsack-ish selection after quality scoring.
    // One partitioned running-sum window = one hash shuffle on source.
    "cu_token_budget" -> Q(
      (s, d) => {
        val toks = graft.text.TextAnalysis.tokens(col("text"))
        graft.ops.Curation.tokenBudget(
            T(s, d, "documents")
              .select(col("doc_id"), col("source"),
                size(toks).cast("long").as("n_tokens"),
                graft.text.TextAnalysis.typeTokenRatio(col("text")).as("__ttr")),
            "doc_id", "source", col("n_tokens"), col("__ttr"), budget = 700L)
          .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_weight"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH scored AS (
             |  SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n_tokens,
             |    CASE WHEN len(t) > 0
             |         THEN len(list_distinct(t)) * 1.0 / len(t) END AS ttr
             |  FROM (SELECT doc_id, source,
             |          list_filter(regexp_split_to_array(text, '\s+'),
             |                      x -> length(x) > 0) AS t
             |        FROM documents)),
             |runsum AS (
             |  SELECT doc_id, source, n_tokens,
             |    CAST(sum(n_tokens) OVER (PARTITION BY source
             |      ORDER BY ttr DESC, doc_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_weight
             |  FROM scored)
             |SELECT doc_id, source, n_tokens, cum_weight
             |FROM runsum WHERE cum_weight <= 700
             |ORDER BY doc_id""".stripMargin)),

    // Deterministic corpus shuffle (epoch ordering): head of the permutation
    // with its position — the position is what makes order hash-checkable.
    // Scale path: TakeOrderedAndProject top-100 + bounded self-join
    // numbering (Curation.shuffleHead) — no single-partition WindowExec.
    "cu_corpus_shuffle" -> Q(
      (s, d) => graft.ops.Curation.shuffleHead(
          T(s, d, "documents"), "doc_id", k = 100)
        .select(col("doc_id"), col("pos"))
        .orderBy(col("pos")),
      Some("""SELECT doc_id, pos FROM (
             |  SELECT doc_id, row_number() OVER (
             |    ORDER BY md5('shuffle|' || doc_id::VARCHAR), doc_id) AS pos
             |  FROM documents) t
             |WHERE pos <= 100 ORDER BY pos""".stripMargin)),

    // Decile quality bins via the SCALE path: one percentile pass →
    // cutpoints as broadcast literals → zero-shuffle scalar binning
    // (Curation.percentileCutpoints + binByCutpoints). The global-ntile
    // form (Curation.quantileBins) stays as the semantics cross-check in
    // CurationSpec only — it must never be the benched plan.
    "cu_quality_bins" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents")
        val cuts = graft.ops.Curation.percentileCutpoints(docs, col("n_chars"), 10)
        graft.ops.Curation.binByCutpoints(docs, col("n_chars"), cuts)
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
          .orderBy(col("bin"))
      },
      Some(s"""WITH c AS (SELECT quantile_cont(n_chars,
             |    [${(1 to 9).map(i => s"0.$i").mkString(", ")}]) AS cuts FROM documents),
             |b AS (SELECT n_chars,
             |        1 ${(1 to 9).map(i => s"+ CAST(n_chars > cuts[$i] AS INT)").mkString(" ")} AS bin
             |      FROM documents, c)
             |SELECT bin, count(*) AS n_docs,
             |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
             |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    // DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    // multinomials, target = the English slice, raw = the whole corpus.
    // The raw explode is shared between the per-doc counts and the raw
    // marginal (ReuseExchange); the log-ratio table (≤4096 rows)
    // broadcasts. Only the final sum rounds (6 dp) — a pre-rounded λ
    // parks sums exactly on the half-way boundary (4/500 docs flipped).
    "cu_dsir_weights" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents")
        graft.ops.Curation.dsirLogWeights(
            docs, docs.filter(col("lang") === "en"), "doc_id", "text",
            buckets = 4096, alpha = 1.0)
          .orderBy(col("doc_id"))
      },
      Some(dsirWeightsCte +
        "\nSELECT doc_id, n_grams, log_w FROM w ORDER BY doc_id")),

    // Dataset diff card (round-13): per-source delta between two corpus
    // versions — old = doc_id % 3 ≠ 0, new = doc_id % 2 ≠ 0, so every
    // source both gains and loses docs. added/removed are id-level
    // anti-joins: a source that gains AND loses shows both (the net
    // alone hides it).
    "cu_dataset_diff" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        graft.ops.Curation.datasetDiff(
            docs.filter(pmod(col("doc_id"), lit(3)) =!= 0),
            docs.filter(pmod(col("doc_id"), lit(2)) =!= 0),
            "doc_id", "source", col("n_chars"))
          .orderBy(col("source"))
      },
      Some("""WITH o AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
             |n AS (SELECT * FROM documents WHERE doc_id % 2 <> 0),
             |oa AS (SELECT source, count(*) AS old_docs,
             |         CAST(sum(n_chars) AS BIGINT) AS old_toks
             |       FROM o GROUP BY 1),
             |na AS (SELECT source, count(*) AS new_docs,
             |         CAST(sum(n_chars) AS BIGINT) AS new_toks
             |       FROM n GROUP BY 1),
             |ad AS (SELECT source, count(*) AS added FROM n
             |       WHERE doc_id NOT IN (SELECT doc_id FROM o) GROUP BY 1),
             |rm AS (SELECT source, count(*) AS removed FROM o
             |       WHERE doc_id NOT IN (SELECT doc_id FROM n) GROUP BY 1)
             |SELECT source,
             |  coalesce(old_docs, 0) AS old_docs,
             |  coalesce(new_docs, 0) AS new_docs,
             |  coalesce(added, 0) AS added,
             |  coalesce(removed, 0) AS removed,
             |  coalesce(new_toks, 0) - coalesce(old_toks, 0) AS token_delta
             |FROM oa FULL OUTER JOIN na USING (source)
             |  LEFT JOIN ad USING (source) LEFT JOIN rm USING (source)
             |ORDER BY source""".stripMargin)),

    // Leakage-safe split (round-13): near-dup clusters (star pairs per
    // (source, length-bucket) group, run through the real min-label CC)
    // must land whole in one split — the oracle replays the cluster label
    // as the group-min window and the split as the md5 threshold chain on
    // that LABEL, and pins the no-leakage invariant as a boolean.
    "cu_leakage_split" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        val g = docs.withColumn("__b", floor(col("n_chars") / 200))
        val mins = g.groupBy(col("source"), col("__b"))
          .agg(min(col("doc_id")).as("m"))
        val pairs = g.join(mins, Seq("source", "__b"))
          .filter(col("doc_id") > col("m"))
          .select(col("m").as("id_a"), col("doc_id").as("id_b"))
        val cc = graft.dedup.Dedup.connectedComponents(
          pairs, docs.select(col("doc_id")), "doc_id")
        val split = graft.ops.Curation.leakageSafeSplit(docs, "doc_id",
          cc, Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        val leakFree = split
          .join(cc.select(col("id").as("doc_id"), col("cluster")), "doc_id")
          .groupBy(col("cluster"))
          .agg(countDistinct(col("split")).as("k"))
          .agg(max(col("k")).as("mx")).head.getLong(0) == 1L
        split.groupBy(col("split")).agg(count(lit(1)).as("n"))
          .withColumn("no_leakage", lit(leakFree))
          .orderBy(col("split"))
      },
      Some("""WITH c AS (
             |  SELECT doc_id,
             |    min(doc_id) OVER (PARTITION BY source,
             |      CAST(floor(n_chars / 200) AS BIGINT)) AS cluster
             |  FROM documents),
             |s AS (SELECT doc_id, cluster,
             |  CASE WHEN u < 0.8 THEN 'train'
             |       WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
             |  FROM (SELECT doc_id, cluster,
             |    CAST('0x' || substr(md5('split|' || cluster), 1, 15) AS BIGINT)
             |      % 10000 / 10000.0 AS u FROM c))
             |SELECT split, count(*) AS n, TRUE AS no_leakage
             |FROM s GROUP BY 1 ORDER BY split""".stripMargin)),

    // DSIR resampling: Gumbel-top-k over the log-weights — deterministic
    // per-row Gumbel (md5-uniform nudged off the grid edge), global top-k
    // via TakeOrderedAndProject, ties by id
    "cu_dsir_sample" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents")
        graft.ops.Curation.dsirResample(
            docs, docs.filter(col("lang") === "en"), "doc_id", "text",
            k = 100, buckets = 4096, alpha = 1.0)
          .orderBy(col("samp_key").desc, col("doc_id"))
      },
      Some(dsirWeightsCte + """
             |SELECT doc_id, n_grams, log_w,
             |  round(log_w - ln(-ln((CAST('0x' || substr(md5('dsir|' || doc_id::VARCHAR), 1, 15)
             |    AS BIGINT) % 10000 + 0.5) / 10000.0)), 6) AS samp_key
             |FROM w ORDER BY samp_key DESC, doc_id LIMIT 100""".stripMargin))
  )

  /** Shared oracle CTE for the DSIR pair: per-doc hashed-gram counts,
    * target/raw bucket marginals, smoothed log-ratio λ (8 dp), per-doc
    * weights `w(doc_id, n_grams, log_w)` (6 dp). Replays
    * [[graft.ops.Curation.dsirLogWeights]] with buckets=4096, alpha=1. */
  private val dsirWeightsCte: String =
    """WITH tok AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '\s+'), x -> length(x) > 0) AS t
      |  FROM documents),
      |uni AS (SELECT doc_id, unnest(t) AS gram FROM tok),
      |bi AS (SELECT doc_id, t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] AS gram
      |       FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tok)),
      |grams AS (SELECT doc_id,
      |    CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) % 4096 AS bucket
      |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
      |rdb AS (SELECT doc_id, bucket, count(*) AS n FROM grams GROUP BY 1, 2),
      |rc AS (SELECT bucket, sum(n) AS rc FROM rdb GROUP BY 1),
      |tc AS (SELECT bucket, count(*) AS tc FROM grams
      |       JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY 1),
      |tot AS (SELECT (SELECT sum(tc) FROM tc) AS tt, (SELECT sum(rc) FROM rc) AS rt),
      |lam AS (SELECT bucket,
      |    ln((coalesce(tc, 0) + 1.0) / (tt + 1.0 * 4096))
      |        - ln((coalesce(rc, 0) + 1.0) / (rt + 1.0 * 4096)) AS lam
      |  FROM rc FULL OUTER JOIN tc USING (bucket), tot),
      |w AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_grams,
      |        round(sum(n * lam), 6) AS log_w
      |      FROM rdb JOIN lam USING (bucket) GROUP BY doc_id)""".stripMargin
}
