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
private[graft] object ScalarQueries {

  def defs: Seq[(String, Q)] = Seq(

    "f4_enrichment_template" -> Q(
      (s, d) => TestData.events(s, d)
        .select(col("event_id"),
          concat(lit("Original query: "), col("event_type"),
            lit("\n\nAdditional context:\n"),
            coalesce(get_json_object(col("props"), "$.missing"),
              lit("No specific preference"))).as("enriched"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |  'Original query: ' || event_type || chr(10) || chr(10) ||
             |  'Additional context:' || chr(10) ||
             |  coalesce(json_extract_string(props, '$.missing'), 'No specific preference') AS enriched
             |FROM events ORDER BY event_id""".stripMargin)),

    "f8_iso_format" -> Q(
      (s, d) => TestData.events(s, d)
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("iso_ts"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S') AS iso_ts
             |FROM events ORDER BY event_id""".stripMargin)),

    "f14_csv_parse" -> Q(
      (s, d) => T(s, d, "documents")
        .withColumn("arr", GraftFunctions.parseCsvList(
          concat(col("source"), lit(" , "), col("lang"))))
        .select(col("doc_id"),
          element_at(col("arr"), 1).as("first"),
          element_at(col("arr"), 2).as("second"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  list_transform(str_split(source || ' , ' || lang, ','), t -> trim(t))[1] AS first,
             |  list_transform(str_split(source || ' , ' || lang, ','), t -> trim(t))[2] AS second
             |FROM documents ORDER BY doc_id""".stripMargin)),

    "f15_aspect_ratio" -> Q(
      (s, d) => TestData.events(s, d)
        .select(col("event_id"),
          floor(col("value") * 2 / 3).cast("int").as("scaled_height"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, CAST(floor(value * 2 / 3) AS INT) AS scaled_height
             |FROM events ORDER BY event_id""".stripMargin)),

    "s3_point_lookup" -> Q(
      (s, d) => T(s, d, "customer")
        .filter(col("c_custkey") === 42L)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .limit(1),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE c_custkey = 42 LIMIT 1""".stripMargin)),

    "f3_format_context" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"),
          concat(lit("Title: Doc "), col("doc_id").cast("string"), lit(NL),
            lit("Summary: "), substring(col("text"), 1, 20), lit(NL),
            lit("Content: "), substring(col("text"), 1, 40)).as("block"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  'Title: Doc ' || doc_id || chr(10) ||
             |  'Summary: ' || substr(text, 1, 20) || chr(10) ||
             |  'Content: ' || substr(text, 1, 40) AS block
             |FROM documents ORDER BY doc_id""".stripMargin)),

    "f5_search_input_format" -> Q(
      (s, d) => TestData.events(s, d)
        .select(col("event_id"),
          GraftFunctions.formatSearchInput(col("event_type"),
            concat(lit("user "), col("user_id").cast("string"))).as("search_input"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |  'Search term: ' || event_type || chr(10) || 'Reason for searching: user ' || user_id AS search_input
             |FROM events ORDER BY event_id""".stripMargin)),

    "f11_contains_filter" -> Q(
      (s, d) => T(s, d, "documents")
        .filter(GraftFunctions.containsAnyIgnoreCase(col("text"), Seq("spark", "merge")))
        .select(col("doc_id"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id FROM documents
             |WHERE contains(lower(text), 'spark') OR contains(lower(text), 'merge')
             |ORDER BY doc_id""".stripMargin)),

    "a3_progress_counters" -> Q(
      (s, d) => TestData.events(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_total"),
          count(when(col("event_type") === "purchase", 1)).as("n_done"))
        .select(col("user_id"), col("n_total"), col("n_done"),
          round(col("n_done") * 100.0 / col("n_total"), 6).as("pct_done"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, n_total, n_done, round(n_done * 100.0 / n_total, 6) AS pct_done
             |FROM (SELECT user_id, count(*) AS n_total,
             |        count(*) FILTER (WHERE event_type = 'purchase') AS n_done
             |      FROM events GROUP BY user_id) t
             |ORDER BY user_id""".stripMargin)),

    // ── round 4: SCD2, sampling, batching, hybrid retrieval, drift, URLs ──

    // SCD2 dimension build from a change log: collapse no-op rows, then
    // half-open validity intervals via lead — both windows share one
    // shuffle on the entity key (plan pinned in PlanAuditSpec)
    "x12_scd2" -> Q(
      (s, d) => Relational.scd2(
          TestData.events(s, d)
            .select(col("event_id"), col("user_id"), col("event_type"),
              unix_millis(col("ts")).as("ms")),
          "user_id", "ms", Seq("event_type"), tieBreak = Seq(col("event_id")))
        .select(col("user_id"), col("event_type"),
          col("valid_from").as("valid_from_ms"), col("valid_to").as("valid_to_ms"),
          col("is_current"))
        .orderBy(col("user_id"), col("valid_from_ms"), col("event_type")),
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
             |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
             |c AS (SELECT *,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev,
             |    lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev_ms
             |  FROM e),
             |-- prev_ms IS NULL keeps each key's FIRST row even when its
             |-- tracked attribute is NULL: Spark's lag-struct is null only
             |-- for the first row, but NULL-vs-NULL under IS DISTINCT FROM
             |-- is "not distinct" and would drop it (ms is non-null)
             |ch AS (SELECT user_id, event_type, ms, event_id FROM c
             |       WHERE prev_ms IS NULL OR prev IS DISTINCT FROM event_type)
             |SELECT user_id, event_type, ms AS valid_from_ms,
             |  lead(ms) OVER w AS valid_to_ms,
             |  lead(ms) OVER w IS NULL AS is_current
             |FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
             |ORDER BY user_id, valid_from_ms, event_type""".stripMargin)),

    // weighted sampling without replacement (A-ES): global top-k on the
    // deterministic key, TakeOrderedAndProject — no full sort
    "cu_weighted_sample" -> Q(
      (s, d) => graft.ops.Curation.weightedSample(
          T(s, d, "documents").select(col("doc_id"), col("n_chars")),
          "doc_id", col("n_chars"), k = 50, salt = "ws1")
        .orderBy(col("samp_key"), col("doc_id")),
      Some("""WITH u AS (SELECT doc_id, n_chars,
             |    greatest(CAST(CAST('0x' || substr(md5('ws1|' || doc_id), 1, 15) AS BIGINT) % 10000 AS DOUBLE) / 10000.0, 0.0001) AS uu
             |  FROM documents)
             |SELECT doc_id, n_chars, round(-ln(uu) / n_chars, 9) AS samp_key
             |FROM u ORDER BY samp_key, doc_id LIMIT 50""".stripMargin)),

    // length-bucketed batch assignment: quantile buckets via cutpoints (no
    // global sort), md5-shuffled within bucket, cut every 16 rows
    "cu_length_batches" -> Q(
      (s, d) => graft.ops.Curation.lengthBatches(
          T(s, d, "documents"), "doc_id", col("n_chars"),
          nBuckets = 4, batchSize = 16, salt = "lb1")
        .orderBy(col("batch_id"), col("pos_in_batch")),
      Some("""WITH c AS (SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75]) AS cuts FROM documents),
             |b AS (SELECT doc_id, n_chars,
             |        1 + CAST(n_chars > cuts[1] AS INT) + CAST(n_chars > cuts[2] AS INT)
             |          + CAST(n_chars > cuts[3] AS INT) AS bucket
             |      FROM documents, c),
             |r AS (SELECT *, row_number() OVER (PARTITION BY bucket
             |        ORDER BY md5('lb1|' || doc_id), doc_id) - 1 AS rn FROM b)
             |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_tokens, bucket,
             |  CAST(bucket * 1000000 + rn // 16 AS BIGINT) AS batch_id,
             |  CAST(rn % 16 AS INT) AS pos_in_batch
             |FROM r ORDER BY batch_id, pos_in_batch""".stripMargin)),

    // hybrid retrieval: BM25 top-20 ∪ cosine top-20 → reciprocal-rank
    // fusion (k0=60); both lists are pre-reduced so fusion joins k rows
    "v6_hybrid_rrf" -> Q(
      (s, d) => {
        val lex = graft.text.Bm25.search(T(s, d, "documents"), "doc_id", "text",
          queryTerms = Seq("join", "vector", "shard"), k = 20)
        val vec = Rag.knn(TestData.embeddings(s, d).filter(col("vec_id") =!= 0),
            "vec_id", "embedding", queryVec(s, d), k = 20, minScore = 0.0)
          .select(col("vec_id").as("doc_id"), round(col("score"), 6).as("score"))
        Rag.rrfFuse(Seq(lex, vec), "doc_id", "score", k0 = 60, topK = 10)
          .orderBy(col("rrf").desc, col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                                    t -> length(t) > 0)) AS tok
             |  FROM documents),
             |stats AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
             |corpus AS (SELECT count(*) AS n_docs, avg(len) AS avg_len FROM stats),
             |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
             |       WHERE tok IN ('join', 'vector', 'shard') GROUP BY 1, 2),
             |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
             |sc AS (SELECT doc_id,
             |    round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             |        * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len / avg_len))), 6) AS score
             |  FROM tf JOIN dfreq USING (tok) JOIN stats USING (doc_id), corpus
             |  GROUP BY doc_id),
             |bmtop AS (SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 20),
             |bm AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rb FROM bmtop),
             |qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
             |pr AS (SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(qv.q)::DOUBLE AS y
             |       FROM embeddings e, qv WHERE e.vec_id <> 0),
             |cs AS (SELECT vec_id, SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS s
             |       FROM pr GROUP BY vec_id),
             |vtop AS (SELECT vec_id AS doc_id, round(s, 6) AS score FROM cs
             |         ORDER BY s DESC, vec_id LIMIT 20),
             |vv AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rv FROM vtop),
             |f AS (SELECT coalesce(bm.doc_id, vv.doc_id) AS doc_id,
             |        round(coalesce(1.0/(60+rb), 0) + coalesce(1.0/(60+rv), 0), 9) AS rrf
             |      FROM bm FULL OUTER JOIN vv ON bm.doc_id = vv.doc_id)
             |SELECT doc_id, rrf FROM f ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin)),

    // per-label embedding centroids in long form: decimal-exact dimension
    // sums (order-independent partials), double mean on the way out
    "v7_centroids" -> Q(
      (s, d) => TestData.embeddings(s, d).filter(col("vec_id") =!= 0)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("label"), col("dim"))
        .agg((sum(col("x").cast("decimal(28,12)")).cast("double") / count(lit(1))).as("m"))
        .select(col("label"), col("dim"), round(col("m"), 6).as("mean"))
        .orderBy(col("label"), col("dim")),
      Some("""SELECT label, i - 1 AS dim,
             |  round(CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS mean
             |FROM (SELECT label, unnest(embedding)::DOUBLE AS x,
             |        generate_subscripts(embedding, 1) AS i
             |      FROM embeddings WHERE vec_id <> 0) t
             |GROUP BY label, i ORDER BY label, dim""".stripMargin)),

    // PSI distribution drift between two event halves: reference-quantile
    // bins, add-half smoothing, per-bin (p_c − p_r)·ln(p_c/p_r)
    "dq_drift" -> Q(
      (s, d) => {
        val ev = TestData.events(s, d).filter(col("value").isNotNull)
        graft.quality.DataQuality.psiDrift(
            ev.filter(col("event_id") % 2 === 0).select(col("value")),
            ev.filter(col("event_id") % 2 === 1).select(col("value")),
            "value", nBins = 10)
          .orderBy(col("bin"))
      },
      Some("""WITH ref AS (SELECT value FROM events WHERE value IS NOT NULL AND event_id % 2 = 0),
             |cur AS (SELECT value FROM events WHERE value IS NOT NULL AND event_id % 2 = 1),
             |c AS (SELECT quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cuts FROM ref),
             |rb AS (SELECT 1 + CAST(value > cuts[1] AS INT) + CAST(value > cuts[2] AS INT)
             |         + CAST(value > cuts[3] AS INT) + CAST(value > cuts[4] AS INT)
             |         + CAST(value > cuts[5] AS INT) + CAST(value > cuts[6] AS INT)
             |         + CAST(value > cuts[7] AS INT) + CAST(value > cuts[8] AS INT)
             |         + CAST(value > cuts[9] AS INT) AS bin FROM ref, c),
             |cb AS (SELECT 1 + CAST(value > cuts[1] AS INT) + CAST(value > cuts[2] AS INT)
             |         + CAST(value > cuts[3] AS INT) + CAST(value > cuts[4] AS INT)
             |         + CAST(value > cuts[5] AS INT) + CAST(value > cuts[6] AS INT)
             |         + CAST(value > cuts[7] AS INT) + CAST(value > cuts[8] AS INT)
             |         + CAST(value > cuts[9] AS INT) AS bin FROM cur, c),
             |rn AS (SELECT bin, count(*) AS n_ref FROM rb GROUP BY 1),
             |cn AS (SELECT bin, count(*) AS n_cur FROM cb GROUP BY 1),
             |spine AS (SELECT CAST(unnest(range(1, 11)) AS INT) AS bin),
             |j AS (SELECT bin, coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
             |      FROM spine LEFT JOIN rn USING (bin) LEFT JOIN cn USING (bin)),
             |t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM j)
             |SELECT bin, n_ref, n_cur,
             |  round(((n_cur + 0.5)/(tc + 5.0) - (n_ref + 0.5)/(tr + 5.0))
             |        * ln(((n_cur + 0.5)/(tc + 5.0)) / ((n_ref + 0.5)/(tr + 5.0))), 9) AS psi_term
             |FROM j, t ORDER BY bin""".stripMargin)),

    // URL canonicalization → exact dedup: 500 messy aliases (case, default
    // port, tracking params, fragments, trailing slash) collapse to 25
    // canonical URLs; the whole chain is scan-fused scalar expressions
    "web_url_canon" -> Q(
      (s, d) => {
        val raw = T(s, d, "documents").select(col("doc_id"),
          concat(
            when(col("doc_id") % 2 === 0, lit("HTTPS://WWW.Example.COM:443"))
              .otherwise(lit("https://www.example.com")),
            lit("/docs/"), (col("doc_id") % 25).cast("string"),
            when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
            lit("?utm_source=feed&id="), (col("doc_id") % 25).cast("string"),
            when(col("doc_id") % 5 === 0, lit("&utm_campaign=x")).otherwise(lit("")),
            lit("#sec"), col("doc_id").cast("string")).as("url"))
        raw.select(col("doc_id"), graft.ops.Web.canonicalizeUrl(col("url")).as("canonical"))
          .groupBy(col("canonical"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
          .orderBy(col("canonical"))
      },
      Some("""WITH raw AS (SELECT doc_id,
             |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.Example.COM:443' ELSE 'https://www.example.com' END)
             |    || '/docs/' || (doc_id % 25)
             |    || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
             |    || '?utm_source=feed&id=' || (doc_id % 25)
             |    || (CASE WHEN doc_id % 5 = 0 THEN '&utm_campaign=x' ELSE '' END)
             |    || '#sec' || doc_id AS url FROM documents),
             |st AS (SELECT doc_id, regexp_replace(url, '#.*', '', 'g') AS u1 FROM raw),
             |au AS (SELECT doc_id, u1,
             |         regexp_extract(u1, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*') AS auth FROM st),
             |parts AS (SELECT doc_id,
             |    regexp_replace(regexp_replace(lower(auth),
             |      '^(http://[^/:]*):80$', '\1'), '^(https://[^/:]*):443$', '\1') AS a2,
             |    substr(u1, length(auth) + 1) AS rest FROM au),
             |clean AS (SELECT doc_id, a2,
             |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             |      rest, '([?&])(utm_[a-zA-Z0-9_]*|fbclid|gclid|ref)=[^&#]*', '\1', 'g'),
             |      '\?&+', '?', 'g'), '&&+', '&', 'g'), '[?&]+$', '', 'g') AS r2 FROM parts),
             |fin AS (SELECT doc_id,
             |    a2 || regexp_replace(regexp_replace(r2, '/\?', '?', 'g'), '/$', '', 'g') AS canonical
             |  FROM clean)
             |SELECT canonical, count(*) AS n, min(doc_id) AS first_doc
             |FROM fin GROUP BY canonical ORDER BY canonical""".stripMargin)),

    // bigram LM fluency score: add-k smoothed mean ln P(w2|w1); both corpus
    // counts share one shuffle (c2's (w1,w2) clustering is satisfied by the
    // c1 window's w1 partitioning)
    "ta_bigram_lm" -> Q(
      (s, d) => graft.text.TextAnalysis.bigramLmScore(
          T(s, d, "documents").filter(col("doc_id") < 200), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH base AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(text, '\s+'), x -> length(x) > 0) AS t
             |  FROM documents WHERE doc_id < 200),
             |bi AS (SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
             |       FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM base)),
             |v AS (SELECT count(DISTINCT tok) AS vocab
             |      FROM (SELECT unnest(t) AS tok FROM base)),
             |c AS (SELECT doc_id, w1, w2,
             |        count(*) OVER (PARTITION BY w1) AS c1,
             |        count(*) OVER (PARTITION BY w1, w2) AS c2
             |      FROM bi)
             |SELECT doc_id, count(*) AS n_bigrams,
             |  round(avg(ln((c2 + 0.5) / (c1 + 0.5 * vocab))), 6) AS avg_logp
             |FROM c, v GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // schema evolution: two drifted parquet batches read back through ONE
    // mergeSchema scan (footer-union at planning, nulls where a batch
    // predates a column); oracle recreates the union relationally
    "src_schema_merge" -> Q(
      (s, d) => {
        val root = FixtureRoot.fresh("evolve")
        val orders = T(s, d, "orders")
        // batch 1: v1 schema (no priority column); batch 2 adds it
        orders.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_totalprice"))
          .write.mode("overwrite").parquet(root.toString + "/b=1")
        orders.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
          .write.mode("overwrite").parquet(root.toString + "/b=2")
        graft.sources.Ingest.readEvolved(s, root.toString)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""WITH unified AS (
             |  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
             |  FROM orders WHERE o_orderkey % 2 = 0
             |  UNION ALL
             |  SELECT o_orderkey, o_totalprice, o_orderpriority
             |  FROM orders WHERE o_orderkey % 2 = 1)
             |SELECT o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM unified GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // error-tolerant expression surface: try_cast/try_divide/try_element_at
    // return NULL instead of raising — the ingest-time posture where one
    // malformed value must not fail a 100 TB batch (ANSI mode stays ON for
    // everything else)
    "f22_try_ops" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"),
          expr("try_cast(substring(text, 1, 2) AS INT)").as("maybe_int"),
          try_divide(col("n_chars"), col("doc_id") % 3).as("maybe_div"),
          try_element_at(split(col("source"), "-"), lit(2)).as("maybe_part"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  TRY_CAST(substr(text, 1, 2) AS INT) AS maybe_int,
             |  CASE WHEN doc_id % 3 = 0 THEN NULL
             |       ELSE n_chars / (doc_id % 3) END AS maybe_div,
             |  str_split(source, '-')[2] AS maybe_part
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // categorical aggregate surface: deterministic mode (ties → smallest),
    // count_if; the oracle recomputes the modal value via a rank window
    "a16_mode_aggs" -> Q(
      (s, d) => TestData.events(s, d)
        .groupBy(col("event_type"))
        .agg(mode(col("user_id"), deterministic = true).as("modal_user"),
          count_if(col("value") > 50).as("n_high"),
          min(col("user_id")).as("first_user"))
        .orderBy(col("event_type")),
      Some("""WITH per AS (SELECT event_type, user_id, count(*) AS c,
             |         count(*) FILTER (WHERE value > 50) AS high_c
             |       FROM events GROUP BY event_type, user_id),
             |agg AS (SELECT event_type, CAST(sum(high_c) AS BIGINT) AS n_high,
             |          min(user_id) AS first_user
             |        FROM per GROUP BY event_type),
             |m AS (SELECT event_type, min(user_id) AS modal_user
             |      FROM (SELECT event_type, user_id,
             |              rank() OVER (PARTITION BY event_type ORDER BY c DESC) AS r
             |            FROM per)
             |      WHERE r = 1 GROUP BY event_type)
             |SELECT event_type, modal_user, n_high, first_user
             |FROM agg JOIN m USING (event_type) ORDER BY event_type""".stripMargin)),

    // interval algebra: merge each user's overlapping/touching 30-min
    // purchase windows (running-max-end grouping catches contained
    // intervals); one key shuffle serves both windows and the aggregate
    "x13_interval_merge" -> Q(
      (s, d) => Relational.mergeIntervals(
          TestData.events(s, d).filter(col("event_type") === "purchase")
            .select(col("user_id"), unix_millis(col("ts")).as("s"),
              (unix_millis(col("ts")) + 1800000L).as("e")),
          "user_id", "s", "e")
        .orderBy(col("user_id"), col("merged_start")),
      Some("""WITH iv AS (SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS s,
             |    epoch_ms(CAST(ts AS TIMESTAMP)) + 1800000 AS e
             |  FROM events WHERE event_type = 'purchase'),
             |f AS (SELECT user_id, s, e,
             |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS me
             |  FROM iv),
             |g AS (SELECT user_id, s, e,
             |    sum(CASE WHEN me IS NULL OR s > me THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS grp
             |  FROM f)
             |SELECT user_id, min(s) AS merged_start, max(e) AS merged_end,
             |  count(*) AS n_intervals
             |FROM g GROUP BY user_id, grp
             |ORDER BY user_id, merged_start""".stripMargin)),

    // k-anonymity audit over a quasi-identifier projection (event_type ×
    // user cohort): groups under k=5 are re-identifiable; suppression is
    // the semi-join twin (GovernanceSpec)
    "gov_k_anonymity" -> Q(
      (s, d) => graft.text.Governance.kAnonymity(
          TestData.events(s, d)
            .select(col("event_type"), (col("user_id") % 37).as("cohort")),
          Seq("event_type", "cohort"), k = 5)
        .orderBy(col("event_type"), col("cohort")),
      Some("""SELECT event_type, user_id % 37 AS cohort,
             |  count(*) AS n_rows, count(*) < 5 AS at_risk
             |FROM events GROUP BY event_type, user_id % 37
             |ORDER BY event_type, cohort""".stripMargin)),

    // ε-DP stats release (round-11): Laplace-noised per-type counts and
    // clipped sums, with the noise drawn DETERMINISTICALLY per (salt,
    // group) from the portable hash-uniform — a pipeline rerun reproduces
    // the same release instead of spending fresh privacy budget, and the
    // oracle replays the identical inverse-CDF arithmetic bit-for-bit.
    // One grouped pass each; the noise is a scalar on the aggregate.
    "gov_dp_release" -> Q(
      (s, d) => {
        val ev = TestData.events(s, d)
        graft.text.Governance.dpCounts(ev, "event_type", epsilon = 1.0)
          .join(graft.text.Governance.dpSum(ev, "event_type", "value",
            clip = 100.0, epsilon = 1.0), Seq("event_type"))
          .orderBy(col("event_type"))
      },
      Some("""WITH u AS (SELECT event_type,
             |    CAST(('0x' || substr(md5('dp|' || event_type), 1, 15)) AS BIGINT)
             |      % 10000 / 10000.0 + 0.00005 AS uc,
             |    CAST(('0x' || substr(md5('dpsum|' || event_type), 1, 15)) AS BIGINT)
             |      % 10000 / 10000.0 + 0.00005 AS us,
             |    count(*) AS n,
             |    sum(least(greatest(value, 0.0), 100.0)) AS cs
             |  FROM events GROUP BY event_type)
             |SELECT event_type, n,
             |  round(n + (-1.0 * sign(uc - 0.5) * ln(1 - 2 * abs(uc - 0.5))), 6) AS noisy_n,
             |  round(cs, 6) AS clipped_sum,
             |  round(cs + (-100.0 * sign(us - 0.5) * ln(1 - 2 * abs(us - 0.5))), 6) AS noisy_sum
             |FROM u ORDER BY event_type""".stripMargin)),

    // filtered vector search: the metadata predicate (lang = 'en') prunes
    // candidates BEFORE any distance math — semi-join then knn, so the
    // scan-side filter composes with the ANN paths' signature prune
    "v8_filtered_knn" -> Q(
      (s, d) => {
        val en = T(s, d, "documents").filter(col("lang") === "en")
          .select(col("doc_id").as("vec_id"))
        val cand = TestData.embeddings(s, d).filter(col("vec_id") =!= 0)
          .join(en, Seq("vec_id"), "left_semi")
        Rag.knn(cand, "vec_id", "embedding", queryVec(s, d), k = 10, minScore = 0.0)
          .select(col("vec_id"), round(col("score"), 6).as("score"))
          .orderBy(col("score").desc, col("vec_id"))
      },
      Some("""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
             |en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
             |pairs AS (SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qv)::DOUBLE AS y
             |          FROM embeddings e JOIN en ON e.vec_id = en.doc_id, q
             |          WHERE e.vec_id <> 0),
             |scores AS (SELECT vec_id, SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS s
             |           FROM pairs GROUP BY vec_id),
             |topk AS (SELECT vec_id, s FROM scores ORDER BY s DESC, vec_id LIMIT 10)
             |SELECT vec_id, round(s, 6) AS score FROM topk WHERE s >= 0.0
             |ORDER BY score DESC, vec_id""".stripMargin)),

    // ordered conversion funnel signup → view → purchase: step i completes
    // at the first qualifying ts AFTER step i-1's completion; the oracle
    // mirrors the cascaded gated mins
    "x14_funnel" -> Q(
      (s, d) => Relational.funnel(
          TestData.events(s, d)
            .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms")),
          "user_id", "event_type", "ms", Seq("signup", "view", "purchase"))
        .orderBy(col("user_id")),
      Some("""WITH e AS (SELECT user_id, event_type,
             |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events
             |  WHERE event_type IN ('signup', 'view', 'purchase')),
             |s1 AS (SELECT user_id, min(ms) FILTER (WHERE event_type = 'signup') AS step_1_ts
             |       FROM e GROUP BY user_id),
             |s2 AS (SELECT e.user_id, min(ms) AS step_2_ts
             |       FROM e JOIN s1 ON e.user_id = s1.user_id
             |       WHERE event_type = 'view' AND ms >= step_1_ts
             |       GROUP BY e.user_id),
             |s3 AS (SELECT e.user_id, min(ms) AS step_3_ts
             |       FROM e JOIN s2 ON e.user_id = s2.user_id
             |       WHERE event_type = 'purchase' AND ms >= step_2_ts
             |       GROUP BY e.user_id)
             |SELECT s1.user_id, step_1_ts, step_2_ts, step_3_ts,
             |  CAST(CASE WHEN step_1_ts IS NULL THEN 0 ELSE 1 END
             |     + CASE WHEN step_2_ts IS NULL THEN 0 ELSE 1 END
             |     + CASE WHEN step_3_ts IS NULL THEN 0 ELSE 1 END AS INT) AS steps_completed
             |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
             |        LEFT JOIN s3 ON s1.user_id = s3.user_id
             |ORDER BY s1.user_id""".stripMargin)),

    // weekly retention cohorts: distinct users active N weeks after their
    // first-seen week; integer period division, no epoch-float rounding
    "x15_retention" -> Q(
      (s, d) => Relational.retentionCohorts(
          TestData.events(s, d)
            .select(col("user_id"), unix_millis(col("ts")).as("ms")),
          "user_id", "ms", periodMs = 604800000L)
        .orderBy(col("cohort_p"), col("offset")),
      Some("""WITH e AS (SELECT user_id,
             |    epoch_ms(CAST(ts AS TIMESTAMP)) // 604800000 AS p FROM events),
             |f AS (SELECT user_id, min(p) AS cohort_p FROM e GROUP BY user_id)
             |SELECT cohort_p, p - cohort_p AS "offset",
             |  count(DISTINCT user_id) AS n_active
             |FROM e JOIN f USING (user_id)
             |GROUP BY cohort_p, "offset" ORDER BY cohort_p, "offset"""".stripMargin)),

    // event transition matrix (1st-order Markov counts): consecutive event
    // pairs per user via a lead window — one key shuffle feeds the window,
    // the (from, to) rollup is a tiny aggregate over |event types|² groups
    "x16_transitions" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ms"), col("event_id"))
        TestData.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_millis(col("ts")).as("ms"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
             |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
             |p AS (SELECT event_type AS from_type,
             |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS to_type
             |  FROM e)
             |SELECT from_type, to_type, count(*) AS n
             |FROM p WHERE to_type IS NOT NULL
             |GROUP BY from_type, to_type ORDER BY from_type, to_type""".stripMargin)),

    // per-group least-squares fit: one aggregation pass of second moments
    // (map-side partials) — price-vs-quantity slope per return flag
    "a17_regression" -> Q(
      (s, d) => T(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
             |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
             |  regr_count(l_extendedprice, l_quantity) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // pairwise co-occurrence mining (market-basket support): distinct
    // (basket, item) FIRST bounds the self-join at |baskets|·|items|² —
    // the frequent-pair shape that never goes all-pairs over raw rows
    "x17_cooccurrence" -> Q(
      (s, d) => {
        val items = TestData.events(s, d)
          .select(col("user_id"), col("event_type")).distinct()
        items.select(col("user_id"), col("event_type").as("item_a"))
          .join(items.select(col("user_id"), col("event_type").as("item_b")),
            Seq("user_id"))
          .filter(col("item_a") < col("item_b"))
          .groupBy(col("item_a"), col("item_b"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 10)
          .orderBy(col("item_a"), col("item_b"))
      },
      Some("""WITH it AS (SELECT DISTINCT user_id, event_type FROM events)
             |SELECT a.event_type AS item_a, b.event_type AS item_b,
             |  count(*) AS support
             |FROM it a JOIN it b
             |  ON a.user_id = b.user_id AND a.event_type < b.event_type
             |GROUP BY 1, 2 HAVING count(*) >= 10
             |ORDER BY item_a, item_b""".stripMargin)),

    // exact substring dedup at stride granularity: docs sharing any exact
    // 20-token span; md5 window fingerprints, distinct-first, maxDf
    // boilerplate cap before the bucket self-join
    "dd_span_pairs" -> Q(
      (s, d) => Dedup.sharedSpanPairs(T(s, d, "documents"), "doc_id", "text",
          w = 20, stride = 10, maxDf = 50)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH base AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(text, '\s+'), x -> length(x) > 0) AS t
             |  FROM documents),
             |wins AS (SELECT DISTINCT doc_id,
             |    md5(array_to_string(t[CAST(s + 1 AS INT):CAST(s + 20 AS INT)], ' ')) AS fp
             |  FROM (SELECT doc_id, t,
             |          unnest(range(0, len(t) - 20 + 1, 10)) AS s
             |        FROM base WHERE len(t) >= 20)),
             |freq AS (SELECT fp FROM wins GROUP BY fp HAVING count(*) <= 50),
             |b AS (SELECT w.doc_id, w.fp FROM wins w JOIN freq USING (fp))
             |SELECT a.doc_id AS id_a, c.doc_id AS id_b, count(*) AS shared_windows
             |FROM b a JOIN b c ON a.fp = c.fp AND a.doc_id < c.doc_id
             |GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin)),

    // Duplicate-span REMOVAL (the rewrite, not just the report): w-token
    // windows at stride 1 shared by >= 2 docs are dropped from every doc
    // and the corpus is re-assembled — exact-substring dedup applied as a
    // transformation. Linear explode, combiner'd df-count, anti-join on
    // (id, pos); no pair join anywhere.
    "dd_span_removal" -> Q(
      (s, d) => Dedup.removeSharedSpans(T(s, d, "documents"), "doc_id", "text",
          w = 20, minDf = 2)
        .orderBy(col("doc_id")),
      Some("""WITH base AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(text, '\s+'), x -> length(x) > 0) AS t
             |  FROM documents),
             |wins AS (SELECT doc_id, CAST(s AS INT) AS start,
             |    md5(array_to_string(t[CAST(s AS INT):CAST(s + 19 AS INT)], ' ')) AS fp
             |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 20 + 2)) AS s
             |        FROM base WHERE len(t) >= 20)),
             |dup AS (SELECT fp FROM wins GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
             |cov AS (SELECT DISTINCT w.doc_id, CAST(p AS INT) AS pos
             |  FROM wins w JOIN dup USING (fp), unnest(range(w.start, w.start + 20)) AS u(p)),
             |tok AS (SELECT doc_id, CAST(p AS INT) AS pos, t[CAST(p AS INT)] AS tok
             |  FROM base, unnest(range(1, len(t) + 1)) AS u(p)),
             |kept AS (SELECT tok.doc_id, tok.pos, tok.tok
             |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
             |  WHERE cov.doc_id IS NULL),
             |agg AS (SELECT doc_id, count(*) AS n_kept,
             |    string_agg(tok, ' ' ORDER BY pos) AS clean_text
             |  FROM kept GROUP BY 1)
             |SELECT b.doc_id, CAST(len(b.t) AS BIGINT) AS n_tokens,
             |  CAST(len(b.t) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
             |  coalesce(a.clean_text, '') AS clean_text
             |FROM base b LEFT JOIN agg a USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // per-source quantile normalization: each source's score distribution
    // maps to percentile space so thresholds compare across sources —
    // the comparability step before a cross-source quality gate or mix
    // Source-interleaved training order (round-11): global positions
    // cycle through the live sources round-robin (per-source shuffled
    // round number + windowless arithmetic global position from a
    // broadcast count frame — no single-partition window). The oracle
    // computes the same order with a plain row_number over (rn, source),
    // so the hash compare proves the arithmetic IS the global numbering.
    "cu_interleave" -> Q(
      (s, d) => graft.ops.Curation.interleaveBySource(
          T(s, d, "documents").select(col("doc_id"), col("source")),
          "doc_id", "source")
        .select(col("doc_id"), col("source"), col("__rn"), col("pos"))
        .orderBy(col("pos")),
      Some("""WITH r AS (SELECT doc_id, source,
             |    CAST(row_number() OVER (PARTITION BY source
             |      ORDER BY md5('inter|' || doc_id), doc_id) AS INT) AS "__rn"
             |  FROM documents)
             |SELECT doc_id, source, "__rn",
             |  CAST(row_number() OVER (ORDER BY "__rn", source) AS BIGINT) AS pos
             |FROM r ORDER BY pos""".stripMargin)),

    // A/B experiment analysis (round-11): deterministic hash-split arms
    // (the assignment every experimentation platform uses — stable under
    // reruns and late-arriving data), per-user conversion (> 13 clicks —
    // the dense event fixture gives every user every event type, so a
    // has-event metric saturates and degenerates the z denominator), and
    // the pooled two-proportion z-test with a 1.96 significance flag —
    // exact arithmetic both engines replay. Two aggregates (user rollup,
    // arm rollup), one final scalar row.
    "x19_ab_test" -> Q(
      (s, d) => {
        import graft.ops.Curation
        val users = TestData.events(s, d)
          .select(col("user_id"),
            when(Curation.hashUniform(col("user_id"), "arm") < 0.5, "A")
              .otherwise("B").as("arm"),
            (col("event_type") === "click").cast("int").as("is_click"))
          .groupBy(col("user_id"), col("arm"))
          .agg((sum(col("is_click")) > 13).cast("int").as("converted"))
        val agg = users.agg(
          sum(when(col("arm") === "A", 1).otherwise(0)).cast("long").as("n_a"),
          sum(when(col("arm") === "A", col("converted")).otherwise(0))
            .cast("long").as("c_a"),
          sum(when(col("arm") === "B", 1).otherwise(0)).cast("long").as("n_b"),
          sum(when(col("arm") === "B", col("converted")).otherwise(0))
            .cast("long").as("c_b"))
        val pPool = (col("c_a") + col("c_b")).cast("double") /
          (col("n_a") + col("n_b"))
        val z = (col("c_a") / col("n_a").cast("double") -
            col("c_b") / col("n_b").cast("double")) /
          sqrt(pPool * (lit(1.0) - pPool) *
            (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
        agg.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
          round(z, 6).as("z"), (abs(z) > 1.96).as("significant"))
      },
      Some("""WITH u AS (SELECT user_id,
             |    CASE WHEN CAST(('0x' || substr(md5('arm|' || user_id), 1, 15)) AS BIGINT)
             |           % 10000 / 10000.0 < 0.5 THEN 'A' ELSE 'B' END AS arm,
             |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) > 13
             |         AS INT) AS converted
             |  FROM events GROUP BY 1, 2),
             |a AS (SELECT
             |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(sum(CASE WHEN arm = 'A' THEN converted ELSE 0 END) AS BIGINT) AS c_a,
             |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(sum(CASE WHEN arm = 'B' THEN converted ELSE 0 END) AS BIGINT) AS c_b
             |  FROM u)
             |SELECT n_a, c_a, n_b, c_b,
             |  round((c_a * 1.0 / n_a - c_b * 1.0 / n_b)
             |    / sqrt(((c_a + c_b) * 1.0 / (n_a + n_b))
             |           * (1 - (c_a + c_b) * 1.0 / (n_a + n_b))
             |           * (1.0 / n_a + 1.0 / n_b)), 6) AS z,
             |  abs((c_a * 1.0 / n_a - c_b * 1.0 / n_b)
             |    / sqrt(((c_a + c_b) * 1.0 / (n_a + n_b))
             |           * (1 - (c_a + c_b) * 1.0 / (n_a + n_b))
             |           * (1.0 / n_a + 1.0 / n_b))) > 1.96 AS significant
             |FROM a""".stripMargin)),

    // Duplication-based oversampling (round-11): minority sources rise
    // ABOVE keep-all via deterministic replication — floor(rate) copies +
    // one more with probability frac(rate) by the portable hash-Bernoulli
    // (the epoch-count up-weighting of published training mixes; closes
    // the gap temperatureMix's own doc defers to). One explode on the
    // scan; the oracle replays copies via range(n).
    "cu_oversample" -> Q(
      (s, d) => graft.ops.Curation.oversample(
          T(s, d, "documents").select(col("doc_id"), col("source")),
          "doc_id", "source",
          rates = Map("src0" -> 2.5, "src1" -> 0.5), defaultRate = 1.0)
        .orderBy(col("doc_id"), col("__copy")),
      Some("""WITH r AS (SELECT doc_id, source,
             |    CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.5
             |                ELSE 1.0 END AS rate,
             |    CAST(('0x' || substr(md5('over|' || doc_id), 1, 15)) AS BIGINT)
             |      % 10000 / 10000.0 AS u
             |  FROM documents),
             |c AS (SELECT doc_id, source,
             |    CAST(floor(rate) + CASE WHEN u < rate - floor(rate)
             |                            THEN 1 ELSE 0 END AS INT) AS n
             |  FROM r)
             |SELECT doc_id, source, CAST(unnest(range(n)) AS INT) AS "__copy"
             |FROM c WHERE n > 0 ORDER BY doc_id, "__copy" """.stripMargin)),

    // Budgeted target-proportion mix (round-13): "rebalance the corpus to
    // 40% src0 / 25% src1 / 10% src2 at its own size" — rates solve to
    // total·p_s/n_s per source (thinning below 1, epoch replication above),
    // broadcast back by source; unlisted sources drop. Oracle replays the
    // count → rate → floor+Bernoulli → unnest(range) chain exactly.
    "cu_target_mix" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents").select(col("doc_id"), col("source"))
        // corpus size as the budget: a bounded driver scalar (one count),
        // so the same proportions exercise both thinning and replication
        // at every SF
        val n = docs.count()
        graft.ops.Curation.targetMix(docs, "doc_id", "source",
            targets = Map("src0" -> 0.4, "src1" -> 0.25, "src2" -> 0.1),
            totalRows = n)
          .orderBy(col("doc_id"), col("__copy"))
      },
      Some("""WITH tot AS (SELECT count(*) AS total FROM documents),
             |c AS (SELECT source, count(*) AS ns FROM documents GROUP BY 1),
             |r AS (SELECT source, round(total *
             |        CASE source WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.25
             |                    WHEN 'src2' THEN 0.1 ELSE 0.0 END / ns, 6)
             |        AS "__rate"
             |      FROM c, tot),
             |b AS (SELECT doc_id, d.source, "__rate",
             |        CAST(floor("__rate") + CASE WHEN
             |          CAST(('0x' || substr(md5('tmix|' || doc_id), 1, 15))
             |            AS BIGINT) % 10000 / 10000.0
             |            < "__rate" - floor("__rate")
             |          THEN 1 ELSE 0 END AS INT) AS nc
             |      FROM documents d JOIN r USING (source))
             |SELECT doc_id, source, "__rate",
             |  CAST(unnest(range(nc)) AS INT) AS "__copy"
             |FROM b WHERE nc > 0 ORDER BY doc_id, "__copy" """.stripMargin)),

    // dataset-card generator (round-11): the per-source summary a curation
    // run publishes alongside the corpus — doc/token/char volumes, corpus
    // share, mean entropy, language spread and majority language. One
    // tokenStats pass (the fused operator, reused) + two tiny aggregates;
    // the corpus total rides as a broadcast scalar, the majority language
    // is a WindowGroupLimit top-1 over per-(source, lang) counts.
    "cu_dataset_card" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import graft.text.TextAnalysis
        val docs = T(s, d, "documents")
        val stats = TextAnalysis.tokenStats(docs, "doc_id", "text")
        val bySrc = docs.join(stats, Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("n_tokens")), lit(0L)).cast("long").as("total_tokens"),
            sum(length(col("text")).cast("long")).as("total_chars"),
            round(avg(col("entropy")), 6).as("mean_entropy"),
            count_distinct(col("lang")).as("n_langs"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("__n").desc, col("lang"))
        val topLang = docs.groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("__n"))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .select(col("source"), col("lang").as("top_lang"))
        val total = docs.agg(count(lit(1)).cast("double").as("__total"))
        bySrc.join(topLang, "source")
          .crossJoin(broadcast(total))
          .select(col("source"), col("n_docs"),
            round(col("n_docs") / col("__total"), 6).as("corpus_share"),
            col("total_tokens"), col("total_chars"),
            col("mean_entropy"), col("n_langs"), col("top_lang"))
          .orderBy(col("source"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                                    t -> length(t) > 0)) AS tok
             |  FROM documents),
             |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
             |ent AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |          round(ln(CAST(sum(c) AS BIGINT))
             |            - sum(c * ln(c)) / CAST(sum(c) AS BIGINT), 6) AS entropy
             |        FROM tc GROUP BY 1),
             |base AS (SELECT d.source, d.lang, length(d.text) AS n_chars,
             |           e.n_tokens, e.entropy
             |         FROM documents d LEFT JOIN ent e USING (doc_id)),
             |agg AS (SELECT source, count(*) AS n_docs,
             |          CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS total_tokens,
             |          CAST(sum(n_chars) AS BIGINT) AS total_chars,
             |          round(avg(entropy), 6) AS mean_entropy,
             |          count(DISTINCT lang) AS n_langs
             |        FROM base GROUP BY 1),
             |tl AS (SELECT source, lang AS top_lang FROM (
             |         SELECT source, lang, row_number() OVER (
             |           PARTITION BY source ORDER BY count(*) DESC, lang) AS rn
             |         FROM documents GROUP BY source, lang) t WHERE rn = 1),
             |tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM documents)
             |SELECT a.source, a.n_docs,
             |  round(a.n_docs / tot.total, 6) AS corpus_share,
             |  a.total_tokens, a.total_chars, a.mean_entropy, a.n_langs, tl.top_lang
             |FROM agg a JOIN tl USING (source), tot ORDER BY a.source""".stripMargin)),

    "cu_score_norm" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_chars"), col("doc_id"))
        T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"),
            round(percent_rank().over(w), 6).as("pct_in_source"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, source, n_chars,
             |  round(percent_rank() OVER (PARTITION BY source
             |                             ORDER BY n_chars, doc_id), 6) AS pct_in_source
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // RLHF/DPO preference-pair assembly: per source, the highest- and
    // lowest-quality docs form one (chosen, rejected) training pair with
    // the score margin. Quality = distinct-token ratio (a repetition
    // signal; exact integer counts, one double division shared by both
    // engines). The arg-extremes are single-pass max_by/min_by aggregates
    // with the tie-break INSIDE the ordering key (score, ∓doc_id) — one
    // keyed shuffle on source, no window over the corpus, so "build pairs
    // per domain over 100 TB" costs what a groupBy costs.
    "cu_preference_pairs" -> Q(
      (s, d) => {
        import graft.text.TextAnalysis
        val scored = T(s, d, "documents")
          .select(col("doc_id"), col("source"),
            TextAnalysis.tokens(col("text")).as("ts"))
          .filter(size(col("ts")) > 0)
          .select(col("doc_id"), col("source"),
            (size(array_distinct(col("ts"))).cast("double") / size(col("ts")))
              .as("score"))
        scored.groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            max_by(struct(col("doc_id"), col("score")),
              struct(col("score"), (-col("doc_id")).as("tb"))).as("ch"),
            min_by(struct(col("doc_id"), col("score")),
              struct(col("score"), col("doc_id"))).as("rj"))
          .filter(col("n_docs") >= 2)
          .select(col("source"), col("n_docs"),
            col("ch.doc_id").as("chosen_id"),
            col("rj.doc_id").as("rejected_id"),
            round(col("ch.score") - col("rj.score"), 6).as("margin"))
          .orderBy(col("source"))
      },
      Some("""WITH toks AS (SELECT doc_id, source,
             |    unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                       t -> length(t) > 0)) AS tok
             |  FROM documents),
             |sc AS (SELECT doc_id, any_value(source) AS source,
             |    count(DISTINCT tok)::DOUBLE / count(tok) AS score
             |  FROM toks GROUP BY doc_id),
             |ch AS (SELECT source, doc_id AS chosen_id, score AS cs FROM (
             |    SELECT source, doc_id, score, row_number() OVER (
             |      PARTITION BY source ORDER BY score DESC, doc_id) AS rn
             |    FROM sc) t WHERE rn = 1),
             |rj AS (SELECT source, doc_id AS rejected_id, score AS rs FROM (
             |    SELECT source, doc_id, score, row_number() OVER (
             |      PARTITION BY source ORDER BY score ASC, doc_id) AS rn
             |    FROM sc) t WHERE rn = 1),
             |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
             |        FROM sc GROUP BY source)
             |SELECT ch.source, cnt.n_docs, chosen_id, rejected_id,
             |  round(cs - rs, 6) AS margin
             |FROM ch JOIN rj USING (source) JOIN cnt ON cnt.source = ch.source
             |WHERE cnt.n_docs >= 2 ORDER BY ch.source""".stripMargin))
  )
}
