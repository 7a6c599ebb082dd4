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
private[graft] object TextQueries {

  def defs: Seq[(String, Q)] = Seq(

    "ta_doc_stats" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"),
          length(col("text")).as("n_chars"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          round(coalesce(TextAnalysis.typeTokenRatio(col("text")), lit(0.0)), 6).as("ttr"),
          round(coalesce(TextAnalysis.avgTokenLen(col("text")), lit(0.0)), 6).as("avg_token_len"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
             |  CAST(len(toks) AS INT) AS n_tokens,
             |  round(CASE WHEN len(toks) > 0 THEN len(list_distinct(toks)) * 1.0 / len(toks) ELSE 0 END, 6) AS ttr,
             |  round(CASE WHEN len(toks) > 0 THEN list_sum(list_transform(toks, t -> length(t))) * 1.0 / len(toks) ELSE 0 END, 6) AS avg_token_len,
             |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
             |FROM (SELECT doc_id, text,
             |        list_filter(regexp_split_to_array(text, '\s+'), t -> length(t) > 0) AS toks
             |      FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // Composite heuristic quality gate (Gopher/C4-style rule set): per-rule
    // booleans + the verdict + the FIRST failing rule as reject_reason —
    // the keep/drop decision a curation pipeline acts on, not just the raw
    // stats. Pure per-row scalar expressions: zero shuffles before the
    // oracle ORDER BY, so it costs exactly one scan at any corpus size.
    "ta_quality_gate" -> Q(
      (s, d) => TextAnalysis.qualityGate(
          T(s, d, "documents").select(col("doc_id"), col("text")), "text")
        .select(col("doc_id"), col("n_tokens"), col("ttr"), col("avg_token_len"),
          col("stop_ratio"), col("ok_len"), col("ok_word_len"),
          col("ok_diversity"), col("ok_stopwords"), col("keep"),
          col("reject_reason"))
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(text, '\s+'),
             |                x -> length(x) > 0) AS toks,
             |    list_filter(regexp_split_to_array(lower(text), '\s+'),
             |                x -> length(x) > 0) AS ltoks
             |  FROM documents),
             |m AS (
             |  SELECT doc_id, len(toks) AS n,
             |    CASE WHEN len(toks) > 0
             |         THEN len(list_distinct(toks)) * 1.0 / len(toks) END AS ttr,
             |    CASE WHEN len(toks) > 0
             |         THEN list_sum(list_transform(toks, x -> length(x))) * 1.0
             |              / len(toks) END AS awl,
             |    CASE WHEN len(ltoks) > 0
             |         THEN len(list_filter(ltoks,
             |                x -> x IN ('the', 'a', 'of', 'and'))) * 1.0
             |              / len(ltoks) END AS sw
             |  FROM t)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
             |  round(coalesce(ttr, 0), 6) AS ttr,
             |  round(coalesce(awl, 0), 6) AS avg_token_len,
             |  round(coalesce(sw, 0), 6) AS stop_ratio,
             |  n BETWEEN 20 AND 90 AS ok_len,
             |  awl BETWEEN 3.8 AND 5.2 AS ok_word_len,
             |  ttr >= 0.45 AS ok_diversity,
             |  sw >= 0.02 AS ok_stopwords,
             |  (n BETWEEN 20 AND 90) AND (awl BETWEEN 3.8 AND 5.2)
             |    AND ttr >= 0.45 AND sw >= 0.02 AS keep,
             |  CASE WHEN NOT (n BETWEEN 20 AND 90) THEN 'length_band'
             |       WHEN NOT (awl BETWEEN 3.8 AND 5.2) THEN 'word_len'
             |       WHEN NOT (ttr >= 0.45) THEN 'low_diversity'
             |       WHEN NOT (sw >= 0.02) THEN 'no_stopwords'
             |  END AS reject_reason
             |FROM m ORDER BY doc_id""".stripMargin)),

    // Repetition profile: boilerplate/degenerate-text signal (explode →
    // per-token counts → max per doc; both aggregations map-side combined)
    "ta_repetition" -> Q(
      (s, d) => TextAnalysis.repetitionStats(
          T(s, d, "documents").filter(col("doc_id") < 300), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          round(col("repetition_ratio"), 6).as("repetition_ratio"),
          col("max_tok_freq"))
        .orderBy(col("doc_id")),
      Some("""WITH base AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(text, '\s+'), t -> length(t) > 0) AS toks
             |  FROM documents WHERE doc_id < 300),
             |stats AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
             |                 CAST(len(list_distinct(toks)) AS INT) AS n_distinct
             |          FROM base),
             |freq AS (SELECT doc_id, tok, count(*) AS c
             |         FROM (SELECT doc_id, unnest(toks) AS tok FROM base) GROUP BY 1, 2),
             |top AS (SELECT doc_id, max(c) AS max_tok_freq FROM freq GROUP BY 1)
             |SELECT s.doc_id, s.n_tokens, s.n_distinct,
             |  round(CASE WHEN s.n_tokens > 0
             |             THEN 1.0 - s.n_distinct / CAST(s.n_tokens AS DOUBLE)
             |             ELSE 0.0 END, 6) AS repetition_ratio,
             |  CAST(coalesce(t.max_tok_freq, 0) AS BIGINT) AS max_tok_freq
             |FROM stats s LEFT JOIN top t USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    "ta_language_id" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.languageId(col("text"), langProfiles).as("lang_pred"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CASE WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
             |       WHEN s_es >= s_fr THEN 'es'
             |       ELSE 'fr' END AS lang_pred
             |FROM (
             |  SELECT doc_id,
             |    CASE WHEN len(toks) > 0 THEN len(list_filter(toks, t -> list_contains(['the','and','of'], t))) * 1.0 / len(toks) ELSE 0 END AS s_en,
             |    CASE WHEN len(toks) > 0 THEN len(list_filter(toks, t -> list_contains(['key','row','scan'], t))) * 1.0 / len(toks) ELSE 0 END AS s_es,
             |    CASE WHEN len(toks) > 0 THEN len(list_filter(toks, t -> list_contains(['merge','join','sort'], t))) * 1.0 / len(toks) ELSE 0 END AS s_fr
             |  FROM (SELECT doc_id,
             |          list_filter(regexp_split_to_array(lower(text), '\s+'), t -> length(t) > 0) AS toks
             |        FROM documents) x) y
             |ORDER BY doc_id""".stripMargin)),

    "ta_lang_rollup" -> Q(
      (s, d) => T(s, d, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("total_tokens"),
          sum(length(col("text")).cast("long")).as("total_chars"))
        .orderBy(col("lang")),
      Some("""SELECT lang, count(*) AS n_docs,
             |  CAST(sum(len(list_filter(regexp_split_to_array(text, '\s+'), t -> length(t) > 0))) AS BIGINT) AS total_tokens,
             |  CAST(sum(length(text)) AS BIGINT) AS total_chars
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // BPE-ish token count — match-counting formulation is RE2-safe, so the
    // DuckDB oracle computes the identical count
    "ta_bpe_tokens" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.bpeIshTokenCount(col("text")).as("n_bpe"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // capstone: the full curation pipeline in ONE declarative query —
    // scrub → length gate → exact-dedup (min-id survivor) → per-language
    // rollup. Every stage is also verified standalone; this entry pins the
    // composition end-to-end against the same chain in DuckDB.
    // End-to-end data-prep chain built from this round's operators: quality
    // gate (keep) → duplicate-span removal on the survivors → per-source
    // token-budget fill ranked by the CLEANED text's diversity. One
    // declarative plan: the gate fuses into the scans, span removal stays
    // join-light, and the budget is one partitioned window — no stage ever
    // materializes to the driver.
    "pipeline_dataprep" -> Q(
      (s, d) => {
        // stage 1: the SAME composite gate as ta_quality_gate / the
        // streaming twin — one implementation, three surfaces; the unused
        // metric columns are pruned by Catalyst since only `keep` is read
        val gated = TextAnalysis.qualityGate(
            T(s, d, "documents").select(col("doc_id"), col("source"), col("text")),
            "text")
          .filter(col("keep"))
          .select(col("doc_id"), col("source"), col("text"))
        val cleanedDocs = Dedup.removeSharedSpans(gated, "doc_id", "text",
            w = 20, minDf = 2)
          .join(gated.select(col("doc_id"), col("source")), Seq("doc_id"))
          .select(col("doc_id"), col("source"),
            (col("n_tokens") - col("n_removed")).as("kept_tokens"),
            coalesce(TextAnalysis.typeTokenRatio(col("clean_text")), lit(0.0))
              .as("__score"))
        graft.ops.Curation.tokenBudget(cleanedDocs, "doc_id", "source",
            col("kept_tokens"), col("__score"), budget = 300L)
          .select(col("doc_id"), col("source"), col("kept_tokens"),
            col("cum_weight"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, source, text,
             |    list_filter(regexp_split_to_array(text, '\s+'), x -> length(x) > 0) AS toks,
             |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> length(x) > 0) AS ltoks
             |  FROM documents),
             |gated AS (SELECT doc_id, source, toks FROM t
             |  WHERE len(toks) BETWEEN 20 AND 90
             |    AND (CASE WHEN len(toks) > 0
             |         THEN list_sum(list_transform(toks, x -> length(x))) * 1.0
             |              / len(toks) END) BETWEEN 3.8 AND 5.2
             |    AND (CASE WHEN len(toks) > 0
             |         THEN len(list_distinct(toks)) * 1.0 / len(toks) END) >= 0.45
             |    AND (CASE WHEN len(ltoks) > 0
             |         THEN len(list_filter(ltoks,
             |                x -> x IN ('the', 'a', 'of', 'and'))) * 1.0
             |              / len(ltoks) END) >= 0.02),
             |wins AS (SELECT doc_id, CAST(s AS INT) AS start,
             |    md5(array_to_string(toks[CAST(s AS INT):CAST(s + 19 AS INT)], ' ')) AS fp
             |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 20 + 2)) AS s
             |        FROM gated WHERE len(toks) >= 20)),
             |dup AS (SELECT fp FROM wins GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
             |cov AS (SELECT DISTINCT w.doc_id, CAST(p AS INT) AS pos
             |  FROM wins w JOIN dup USING (fp), unnest(range(w.start, w.start + 20)) AS u(p)),
             |tok AS (SELECT doc_id, CAST(p AS INT) AS pos, toks[CAST(p AS INT)] AS tok
             |  FROM gated, unnest(range(1, len(toks) + 1)) AS u(p)),
             |kept AS (SELECT tok.doc_id, tok.pos, tok.tok
             |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
             |  WHERE cov.doc_id IS NULL),
             |agg AS (SELECT doc_id, count(*) AS n_kept,
             |    string_agg(tok, ' ' ORDER BY pos) AS clean_text
             |  FROM kept GROUP BY 1),
             |clean AS (SELECT g.doc_id, g.source,
             |    CAST(coalesce(a.n_kept, 0) AS BIGINT) AS kept_tokens,
             |    coalesce(a.clean_text, '') AS clean_text
             |  FROM gated g LEFT JOIN agg a USING (doc_id)),
             |scored AS (SELECT doc_id, source, kept_tokens,
             |    coalesce(CASE WHEN len(ct) > 0
             |                  THEN len(list_distinct(ct)) * 1.0 / len(ct) END, 0) AS score
             |  FROM (SELECT clean.*, list_filter(regexp_split_to_array(clean_text, '\s+'),
             |                x -> length(x) > 0) AS ct FROM clean)),
             |runsum AS (SELECT doc_id, source, kept_tokens,
             |    CAST(sum(kept_tokens) OVER (PARTITION BY source
             |      ORDER BY score DESC, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_weight
             |  FROM scored)
             |SELECT doc_id, source, kept_tokens, cum_weight
             |FROM runsum WHERE cum_weight <= 300 ORDER BY doc_id""".stripMargin)),

    "pipeline_curation" -> Q(
      (s, d) => {
        val cleaned = T(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            graft.text.TextAnalysis.scrub(col("text")).as("clean"))
          .filter(length(col("clean")) > 50)
        val survivors = cleaned
          .groupBy(col("clean"))
          .agg(min(col("doc_id")).as("doc_id"))
        survivors.join(cleaned, Seq("doc_id", "clean"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("clean"))).as("total_chars"))
          .orderBy(col("lang"))
      },
      Some("""WITH cleaned AS (
             |  SELECT doc_id, lang,
             |    trim(regexp_replace(
             |      regexp_replace(
             |        regexp_replace(
             |          regexp_replace(text, '<[^>]*>', '', 'g'),
             |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             |        'https?://[^\s]+', '[URL]', 'g'),
             |      '\s+', ' ', 'g')) AS clean
             |  FROM documents),
             |gated AS (SELECT * FROM cleaned WHERE length(clean) > 50),
             |survivors AS (SELECT clean, min(doc_id) AS doc_id FROM gated GROUP BY clean)
             |SELECT lang, count(*) AS n_docs, CAST(sum(length(clean)) AS BIGINT) AS total_chars
             |FROM survivors JOIN gated USING (doc_id, clean)
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // corpus scrubbing: strip HTML → redact emails/URLs → normalize ws.
    // Synthetic dirt is injected from columns so the transform is provably
    // non-trivial; RE2-compatible patterns make the DuckDB oracle exact.
    // PII governance: deterministic synthetic PII appended per doc (both
    // engines build the identical text) so redaction/profiling run against
    // real pattern shapes, never a vacuous clean corpus
    "gov_pii_redact" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"),
          concat(col("text"),
            lit(" Contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com or +1 (555) 010-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
            lit(" from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
            lit(".7, card 4111 1111 1111 1111.")).as("t"))
        .select(col("doc_id"),
          md5(graft.text.Governance.redactPii(col("t"))).as("h"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, md5(
             |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             |    text || ' Contact user' || doc_id::VARCHAR
             |         || '@mail.example.com or +1 (555) 010-'
             |         || lpad((doc_id % 10000)::VARCHAR, 4, '0')
             |         || ' from 10.0.' || (doc_id % 256)::VARCHAR
             |         || '.7, card 4111 1111 1111 1111.',
             |    '\b(?:\d[ -]?){12,15}\d\b', '[CARD]', 'g'),
             |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IP]', 'g'),
             |    '\+?\d[\d().\s-]{6,}\d', '[PHONE]', 'g'),
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             |    'https?://[^\s]+', '[URL]', 'g')) AS h
             |FROM documents ORDER BY doc_id""".stripMargin)),

    "gov_pii_profile" -> Q(
      (s, d) => graft.text.Governance.piiProfile(
          T(s, d, "documents")
            .select(col("doc_id"),
              concat(col("text"),
                lit(" Contact user"), col("doc_id").cast("string"),
                lit("@mail.example.com or +1 (555) 010-"),
                lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
                lit(" from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
                lit(".7, card 4111 1111 1111 1111.")).as("t")),
          "doc_id", "t")
        .agg(sum(col("n_cards")).cast("long").as("cards"),
          sum(col("n_ips")).cast("long").as("ips"),
          sum(col("n_phones")).cast("long").as("phones"),
          sum(col("n_emails")).cast("long").as("emails"),
          sum(col("n_urls")).cast("long").as("urls"),
          count(lit(1)).as("n_docs")),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    text || ' Contact user' || doc_id::VARCHAR
             |         || '@mail.example.com or +1 (555) 010-'
             |         || lpad((doc_id % 10000)::VARCHAR, 4, '0')
             |         || ' from 10.0.' || (doc_id % 256)::VARCHAR
             |         || '.7, card 4111 1111 1111 1111.' AS t
             |  FROM documents),
             |staged AS (
             |  SELECT t,
             |    regexp_replace(t, '\b(?:\d[ -]?){12,15}\d\b', '[CARD]', 'g') AS after_cards
             |  FROM t),
             |staged2 AS (
             |  SELECT t, after_cards,
             |    regexp_replace(after_cards, '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IP]', 'g') AS after_ips
             |  FROM staged)
             |SELECT
             |  CAST(sum(length(regexp_extract_all(t, '\b(?:\d[ -]?){12,15}\d\b'))) AS BIGINT) AS cards,
             |  CAST(sum(length(regexp_extract_all(after_cards, '\b(?:\d{1,3}\.){3}\d{1,3}\b'))) AS BIGINT) AS ips,
             |  CAST(sum(length(regexp_extract_all(after_ips, '\+?\d[\d().\s-]{6,}\d'))) AS BIGINT) AS phones,
             |  CAST(sum(length(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS emails,
             |  CAST(sum(length(regexp_extract_all(t, 'https?://[^\s]+'))) AS BIGINT) AS urls,
             |  count(*) AS n_docs
             |FROM staged2""".stripMargin)),

    // Keyed pseudonymization survives joins/group-bys: per-customer order
    // counts keyed by the anonymized name match the cleartext grouping
    "gov_pseudonymize" -> Q(
      (s, d) => T(s, d, "orders")
        .join(T(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(graft.text.Governance.pseudonymize(col("c_name"), "k1").as("p"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("p"))
        .limit(20),
      Some("""SELECT substr(md5('k1|' || c_name), 1, 16) AS p, count(*) AS n_orders
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY n_orders DESC, p LIMIT 20""".stripMargin)),

    // BM25 keyword retrieval over documents — the lexical twin of v3 knn.
    // Scores round to 6 decimals BEFORE ranking in both engines, so
    // double-sum jitter can't reorder the boundary
    "ta_bm25_search" -> Q(
      (s, d) => graft.text.Bm25.search(
        T(s, d, "documents"), "doc_id", "text",
        queryTerms = Seq("join", "vector", "shard"), k = 15),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                                    t -> length(t) > 0)) AS tok
             |  FROM documents),
             |stats AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
             |corpus AS (SELECT count(*) AS n_docs, avg(len) AS avg_len FROM stats),
             |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
             |       WHERE tok IN ('join', 'vector', 'shard') GROUP BY 1, 2),
             |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
             |scores AS (
             |  SELECT doc_id,
             |    sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             |        * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len / avg_len))) AS s
             |  FROM tf JOIN dfreq USING (tok) JOIN stats USING (doc_id), corpus
             |  GROUP BY doc_id)
             |SELECT doc_id, round(s, 6) AS score FROM scores
             |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin)),

    // Index-backed BM25: build the bucket-partitioned inverted index, then
    // answer the same query reading ONLY the query terms' partitions.
    // Bit-identical to the direct path → same oracle SQL
    "ta_bm25_index" -> Q(
      (s, d) => {
        val root = FixtureRoot.fresh("bm25")
        graft.text.Bm25.buildIndex(T(s, d, "documents"), "doc_id", "text",
          root.toString + "/idx")
        graft.text.Bm25.searchIndex(s, root.toString + "/idx",
          queryTerms = Seq("join", "vector", "shard"), k = 15)
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
             |scores AS (
             |  SELECT doc_id,
             |    sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             |        * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len / avg_len))) AS s
             |  FROM tf JOIN dfreq USING (tok) JOIN stats USING (doc_id), corpus
             |  GROUP BY doc_id)
             |SELECT doc_id, round(s, 6) AS score FROM scores
             |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin)),

    // Token-budget sequence packing (concat-and-chunk): deterministic md5
    // order, two-phase distributed running sum, pack = floor(start/budget).
    // The oracle recomputes the same order and offsets with one global
    // window — small-engine semantics, big-engine plan
    "cu_pack_sequences" -> Q(
      (s, d) => graft.ops.Curation.packSequences(
        T(s, d, "documents").select(col("doc_id"),
          graft.text.TextAnalysis.tokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", budget = 4096L),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
             |                         x -> length(x) > 0)) AS BIGINT) AS n_tokens,
             |    md5(CAST(doc_id AS VARCHAR)) AS k
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, n_tokens,
             |    CAST(sum(n_tokens) OVER (ORDER BY k, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      - n_tokens AS BIGINT) AS start_offset
             |  FROM t)
             |SELECT doc_id, n_tokens, start_offset,
             |  CAST(floor(start_offset / 4096.0) AS BIGINT) AS pack_id
             |FROM c""".stripMargin)),

    // boilerplate detection: word bigrams shared by >=10 distinct docs of
    // the same source are crawl debris; per-doc contamination ratio
    "ta_boilerplate" -> Q(
      (s, d) => graft.text.TextAnalysis.boilerplate(
        T(s, d, "documents"), "doc_id", "text", "source", n = 2, minDocs = 10),
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    list_filter(regexp_split_to_array(text, '\s+'), x -> length(x) > 0) AS toks
             |  FROM documents),
             |g AS (SELECT doc_id, source,
             |    unnest(list_transform(range(1, CAST(greatest(len(toks) - 1, 0) AS INT) + 1),
             |           i -> array_to_string(toks[i:i+1], ' '))) AS gram
             |  FROM t),
             |b AS (SELECT source, gram
             |      FROM (SELECT DISTINCT doc_id, source, gram FROM g) dg
             |      GROUP BY source, gram HAVING count(*) >= 10),
             |pd AS (SELECT g.doc_id, count(*) AS n_boiler
             |       FROM g JOIN b USING (source, gram) GROUP BY 1),
             |base AS (SELECT doc_id,
             |           CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n_grams FROM t)
             |SELECT base.doc_id, n_grams,
             |  coalesce(pd.n_boiler, 0) AS n_boiler,
             |  coalesce(round(pd.n_boiler * 1.0 / nullif(n_grams, 0), 6), 0.0) AS boiler_ratio
             |FROM base LEFT JOIN pd ON base.doc_id = pd.doc_id""".stripMargin)),

    // CAPSTONE: the modern pretraining data pipeline composed end-to-end
    // from this round's operators — quality gates (entropy + unigram LM)
    // → exact dedup survivors → temperature rebalance → train/val/test
    // split → per-(split, source) doc and token counts. Every stage's
    // oracle block was proven individually; this checks the COMPOSITION
    // (gate thresholds compare round-6 values, so the cascade is stable)
    "pipeline_pretraining" -> Q(
      (s, d) => {
        import graft.ops.Curation
        import graft.text.TextAnalysis
        val docs = T(s, d, "documents")
        // tokenize ONCE (round-11): the fused tokenStats pass feeds the
        // entropy gate, the LM gate, AND the final token-count aggregate
        // (n_tokens rides the pipeline as a column) — the previous
        // three-explode composition was the battery's worst scale slope
        val stats = TextAnalysis.tokenStats(docs, "doc_id", "text")
        // persist the gated corpus: four downstream consumers (survivor
        // keep-set, survivor join, mix rates, final agg) re-reference this
        // frame, and without a stage boundary each re-derivation re-runs
        // the tokenize pass (column pruning differentiates the subtrees,
        // so exchange reuse cannot dedup them) — the materialization is
        // the fan-out boundary a production pipeline would write anyway
        val gated = docs.join(stats, "doc_id")
          .filter(col("entropy") >= 2.8 && col("avg_logp") >= -3.5)
          .drop("entropy", "avg_logp")
          .persist()
        val surv = Dedup.exactSurvivors(gated, "doc_id", "text")
        val mixed = Curation.temperatureMix(surv, "doc_id", "source",
            tau = 0.5, targetFrac = 0.5)
          .filter(col("__keep")).drop("__keep", "__keep_rate")
        Curation.splitAssign(mixed, "doc_id",
            Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)))
          .groupBy(col("split"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("n_tokens"))
          .orderBy(col("split"), col("source"))
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'),
             |                                    t -> length(t) > 0)) AS tok
             |  FROM documents),
             |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
             |ent AS (SELECT doc_id, round(ln(CAST(sum(c) AS BIGINT))
             |          - sum(c * ln(c)) / CAST(sum(c) AS BIGINT), 6) AS entropy
             |        FROM tc GROUP BY 1),
             |vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
             |lm AS (SELECT doc_id, round(avg(ln(cnt)) - ln(total), 6) AS avg_logp
             |       FROM toks JOIN vocab USING (tok), tot GROUP BY doc_id, total),
             |gated AS (SELECT d.* FROM documents d
             |          JOIN ent USING (doc_id) JOIN lm USING (doc_id)
             |          WHERE entropy >= 2.8 AND avg_logp >= -3.5),
             |surv AS (SELECT g.* FROM gated g
             |         JOIN (SELECT text, min(doc_id) AS doc_id
             |               FROM gated GROUP BY text) k ON g.doc_id = k.doc_id),
             |c AS (SELECT source, count(*) AS n FROM surv GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS total_n, sum(pow(n, 0.5)) AS z FROM c),
             |r AS (SELECT source, round(least(1.0,
             |        0.5 * total_n * pow(n, 0.5) / z / n), 6) AS keep_rate FROM c, t),
             |mixed AS (SELECT s.* FROM surv s JOIN r USING (source)
             |          WHERE CAST('0x' || substr(md5('temp|' || s.doc_id), 1, 15) AS BIGINT)
             |            % 10000 / 10000.0 < r.keep_rate),
             |sp AS (SELECT *, CASE WHEN u < 0.9 THEN 'train'
             |                      WHEN u < 0.95 THEN 'val'
             |                      ELSE 'test' END AS split
             |       FROM (SELECT m.*, CAST('0x' || substr(md5('split|' || doc_id), 1, 15) AS BIGINT)
             |               % 10000 / 10000.0 AS u FROM mixed m))
             |SELECT split, source, count(*) AS n_docs,
             |  CAST(sum(len(list_filter(regexp_split_to_array(text, '\\s+'),
             |                           x -> length(x) > 0))) AS BIGINT) AS n_tokens
             |FROM sp GROUP BY 1, 2 ORDER BY split, source""".stripMargin)),

    // CAPSTONE (near-dup-aware): the pretraining pipeline with its dedup
    // stage upgraded from exact-text to the full near-dup reduction — the
    // dedup a real corpus-curation run uses (minhash → banded LSH pairs →
    // connected components → longest-text survivor per cluster), chained
    // BEFORE the temperature mix and split. Same gates and downstream
    // stages as pipeline_pretraining, so diffing the two shows exactly what
    // near-dup awareness removes. Composition of proven pieces: LSH join
    // only on (band, bucket) — never all-pairs — and min-label components
    // with per-round lineage truncation; scale argument is the sum of the
    // stages' individual ones (SCALE.md dedup section). Oracle replays the
    // whole cascade, closing the identical md5 LSH pairs with the
    // recursive-CTE pattern proven in dd_cluster_survivors. The gate and
    // final token counts all derive from ONE fused tokenStats pass
    // (round-11).
    "pipeline_neardup_pretraining" -> Q(
      (s, d) => {
        import graft.ops.Curation
        import graft.text.TextAnalysis
        val docs = T(s, d, "documents")
        // tokenize-once gate + n_tokens carried as a column (round-11),
        // same rationale as pipeline_pretraining
        val stats = TextAnalysis.tokenStats(docs, "doc_id", "text")
        // persisted fan-out boundary, same rationale as pipeline_pretraining
        val gated = docs.join(stats, "doc_id")
          .filter(col("entropy") >= 2.8 && col("avg_logp") >= -3.5)
          .drop("entropy", "avg_logp")
          .persist()
        val sig = Dedup.minhashSignature(gated, "doc_id", "text", 5, 4)
        val pairs = Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 4, bands = 2)
        // min-label components, KEPT after a round-11 A/B vs the O(log d)
        // star contraction: on this capstone's clique-like near-dup graph
        // min-label's 1-hop-min seed converges in ~2 rounds while stars
        // pays two grouped phases per alternation — measured 19.7 s vs
        // 22.2 s at sf0.1. Stars (dd_cluster_stars) stays the deep-diameter
        // scale path; swap it in when components are chain-shaped.
        val labels = Dedup.connectedComponents(
          pairs, gated.select(col("doc_id")), "doc_id")
        val surv = Dedup.dedupByCluster(gated, labels, "doc_id", length(col("text")))
          .drop("cluster")
        val mixed = Curation.temperatureMix(surv, "doc_id", "source",
            tau = 0.5, targetFrac = 0.5)
          .filter(col("__keep")).drop("__keep", "__keep_rate")
        Curation.splitAssign(mixed, "doc_id",
            Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)))
          .groupBy(col("split"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("n_tokens"))
          .orderBy(col("split"), col("source"))
      },
      Some(s"""WITH RECURSIVE toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'),
             |                                    t -> length(t) > 0)) AS tok
             |  FROM documents),
             |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
             |ent AS (SELECT doc_id, round(ln(CAST(sum(c) AS BIGINT))
             |          - sum(c * ln(c)) / CAST(sum(c) AS BIGINT), 6) AS entropy
             |        FROM tc GROUP BY 1),
             |vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
             |lm AS (SELECT doc_id, round(avg(ln(cnt)) - ln(total), 6) AS avg_logp
             |       FROM toks JOIN vocab USING (tok), tot GROUP BY doc_id, total),
             |gated AS (SELECT d.* FROM documents d
             |          JOIN ent USING (doc_id) JOIN lm USING (doc_id)
             |          WHERE entropy >= 2.8 AND avg_logp >= -3.5),
             |sh AS (SELECT DISTINCT doc_id, substr(text, CAST(s + 1 AS INT), 5) AS shingle
             |  FROM (SELECT doc_id, text,
             |          unnest(range(0, greatest(length(text) - 5, 0) + 1)) AS s
             |        FROM gated) t),
             |sig AS (SELECT doc_id,
             |    min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
             |    min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3
             |  FROM sh GROUP BY doc_id),
             |b AS (SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM sig
             |      UNION ALL
             |      SELECT doc_id, 1 AS band, md5(h2 || '|' || h3) AS bucket FROM sig),
             |pairs AS (SELECT DISTINCT a.doc_id AS id_a, c2.doc_id AS id_b
             |  FROM b a JOIN b c2 ON a.band = c2.band AND a.bucket = c2.bucket
             |    AND a.doc_id < c2.doc_id),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |reach AS (SELECT doc_id AS id, doc_id AS m FROM gated
             |      UNION
             |      SELECT e.src, reach.m FROM edges e JOIN reach ON e.dst = reach.id),
             |lbl AS (SELECT id AS doc_id, min(m) AS cluster FROM reach GROUP BY id),
             |ranked AS (SELECT g.doc_id, g.text, g.source,
             |    row_number() OVER (PARTITION BY l.cluster
             |                       ORDER BY length(g.text) DESC, g.doc_id) AS rn
             |  FROM gated g JOIN lbl l USING (doc_id)),
             |surv AS (SELECT doc_id, text, source FROM ranked WHERE rn = 1),
             |c AS (SELECT source, count(*) AS n FROM surv GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS total_n, sum(pow(n, 0.5)) AS z FROM c),
             |kr AS (SELECT source, round(least(1.0,
             |        0.5 * total_n * pow(n, 0.5) / z / n), 6) AS keep_rate FROM c, t),
             |mixed AS (SELECT s.* FROM surv s JOIN kr USING (source)
             |          WHERE CAST('0x' || substr(md5('temp|' || s.doc_id), 1, 15) AS BIGINT)
             |            % 10000 / 10000.0 < kr.keep_rate),
             |sp AS (SELECT *, CASE WHEN u < 0.9 THEN 'train'
             |                      WHEN u < 0.95 THEN 'val'
             |                      ELSE 'test' END AS split
             |       FROM (SELECT m.*, CAST('0x' || substr(md5('split|' || doc_id), 1, 15) AS BIGINT)
             |               % 10000 / 10000.0 AS u FROM mixed m))
             |SELECT split, source, count(*) AS n_docs,
             |  CAST(sum(len(list_filter(regexp_split_to_array(text, '\\s+'),
             |                           x -> length(x) > 0))) AS BIGINT) AS n_tokens
             |FROM sp GROUP BY 1, 2 ORDER BY split, source""".stripMargin)),

    // token-distribution entropy per doc: ln n - sum(c ln c)/n —
    // repetitive/templated text scores low
    "ta_entropy" -> Q(
      (s, d) => graft.text.TextAnalysis.tokenEntropy(
        T(s, d, "documents"), "doc_id", "text"),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                                    t -> length(t) > 0)) AS tok
             |  FROM documents),
             |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
             |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |        sum(c * ln(c)) AS s FROM tc GROUP BY 1)
             |SELECT doc_id, n_tokens,
             |  round(ln(n_tokens) - s / n_tokens, 6) AS entropy
             |FROM a""".stripMargin)),

    // winsorization: clip the value tails at exact p05/p95 percentiles,
    // cutpoints as broadcast literals, clip as a scan-level scalar
    "dq_winsorize" -> Q(
      (s, d) => graft.quality.DataQuality.winsorize(
          TestData.events(s, d), "value", pLow = 0.05, pHigh = 0.95)
        .select(col("event_id"), col("value"), col("winsorized")),
      Some("""WITH q AS (SELECT quantile_cont(value, 0.05) AS lo,
             |                  quantile_cont(value, 0.95) AS hi FROM events)
             |SELECT event_id, value,
             |  round(greatest(least(value, hi), lo), 6) AS winsorized
             |FROM events, q""".stripMargin)),

    // unigram-LM quality score (in-engine KenLM-perplexity stand-in):
    // avg token log-probability under corpus-trained frequencies
    "ta_unigram_lm" -> Q(
      (s, d) => graft.text.TextAnalysis.unigramLmScore(
        T(s, d, "documents"), "doc_id", "text"),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                                    t -> length(t) > 0)) AS tok
             |  FROM documents),
             |vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
             |s AS (SELECT doc_id, count(*) AS n_tokens, avg(ln(cnt)) AS a
             |      FROM toks JOIN vocab USING (tok) GROUP BY 1)
             |SELECT doc_id, n_tokens, round(a - ln(total), 6) AS avg_logp
             |FROM s, tot""".stripMargin)),

    // Unicode text canonicalization (round-13): norm_text (NFC + control
    // strip + [ \t\n\r]+ collapse + trim) and strip_accents (NFD − Mn →
    // NFC), both native codegen expressions (expr/NormalizeText.scala) —
    // the canonical-form pass every dedup fingerprint and match key runs
    // first. The corpus fixture is pure ASCII, so the query injects a
    // deterministic dirty suffix (decomposed accents, a control char,
    // tab/space runs) IDENTICALLY on both engines; the oracle replays the
    // contract with nfc_normalize/strip_accents + the same regex classes.
    "ta_unicode_norm" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        val dirty = concat(lit("  "), substring(col("text"), 1, 48),
          lit("\t\tCafe\u0301\u0007 stru\u0308m  "))
        T(s, d, "documents")
          .select(col("doc_id"), GraftFunctions.normText(dirty).as("norm"),
            GraftFunctions.stripAccents(GraftFunctions.normText(dirty)).as("folded"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH dirty AS (
             |  SELECT doc_id,
             |    '  ' || substr(text, 1, 48) || chr(9) || chr(9) || 'Cafe'
             |      || chr(769) || chr(7) || ' stru' || chr(776) || 'm  ' AS dt
             |  FROM documents),
             |n AS (
             |  SELECT doc_id,
             |    trim(regexp_replace(regexp_replace(nfc_normalize(dt),
             |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
             |      '[ \t\n\r]+', ' ', 'g')) AS norm
             |  FROM dirty)
             |SELECT doc_id, norm, strip_accents(norm) AS folded
             |FROM n ORDER BY doc_id""".stripMargin)),

    // Flesch reading-ease (round-11): the classic readability gate as one
    // codegen'd scalar — vowel-group syllables, [.!?]-run sentences, both
    // RE2-safe so the oracle computes the identical arithmetic
    "ta_readability" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"),
          graft.text.TextAnalysis.tokenCount(col("text")).as("n_words"),
          graft.text.TextAnalysis.readability(col("text")).as("flesch"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
             |                       t -> length(t) > 0)) AS INT) AS n_words,
             |  CASE WHEN len(list_filter(regexp_split_to_array(text, '\s+'),
             |                            t -> length(t) > 0)) > 0 THEN
             |    round(206.835
             |      - 1.015 * len(list_filter(regexp_split_to_array(text, '\s+'),
             |                                t -> length(t) > 0))
             |        / greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
             |      - 84.6 * greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
             |        / len(list_filter(regexp_split_to_array(text, '\s+'),
             |                          t -> length(t) > 0)), 6)
             |  END AS flesch
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // fused token statistics (round-11): n_tokens + entropy + unigram-LM
    // log-prob from ONE tokenize/explode pass — the pretraining gate's
    // plan, pinned standalone so the fusion's parity with the separate
    // ta_entropy / ta_unigram_lm operators is oracle-checked directly
    "ta_token_stats" -> Q(
      (s, d) => graft.text.TextAnalysis.tokenStats(
        T(s, d, "documents"), "doc_id", "text"),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                                    t -> length(t) > 0)) AS tok
             |  FROM documents),
             |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
             |vocab AS (SELECT tok, CAST(sum(c) AS BIGINT) AS cnt FROM tc GROUP BY 1),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
             |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |        sum(c * ln(c)) AS s, sum(c * ln(cnt)) AS l
             |      FROM tc JOIN vocab USING (tok) GROUP BY 1)
             |SELECT doc_id, n_tokens,
             |  round(ln(n_tokens) - s / n_tokens, 6) AS entropy,
             |  round(l / n_tokens - ln(total), 6) AS avg_logp
             |FROM a, tot""".stripMargin)),

    // TF-IDF keyword extraction: top-5 terms per doc, rounded-then-ranked
    // so the window boundary is jitter-proof in both engines
    "ta_keywords" -> Q(
      (s, d) => graft.text.TextAnalysis.keywords(
        T(s, d, "documents"), "doc_id", "text", k = 5),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                                    t -> length(t) > 0)) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
             |wd AS (SELECT doc_id, term, tf,
             |         count(*) OVER (PARTITION BY term) AS df FROM tf),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |s AS (SELECT doc_id, term,
             |        round(tf * ln(n_docs / df), 6) AS score,
             |        row_number() OVER (PARTITION BY doc_id
             |          ORDER BY round(tf * ln(n_docs / df), 6) DESC, term) AS rank
             |      FROM wd, n)
             |SELECT doc_id, term, score, CAST(rank AS INT) AS rank
             |FROM s WHERE rank <= 5""".stripMargin)),

    // BPE tokenizer training: distributed word-freq pass + deterministic
    // driver merge loop. Hash oracle: the merge loop unrolled into
    // materialized chained CTEs (the g3_pagerank pattern) — each round
    // recomputes pair counts, picks best by (count desc, pair asc), and
    // replays the greedy left-to-right merge via islands-parity positions
    // (a run of k equal symbols merges at even offsets = floor(k/2) pairs,
    // exactly the Scala loop's overlap rule); pinned also in BpeSpec.
    "ta_bpe_train" -> Q(
      (s, d) => {
        val model = graft.text.Bpe.train(T(s, d, "documents"), "text", numMerges = 30)
        import s.implicits._
        model.merges.zipWithIndex
          .map { case ((a, b), r) => (r, a, b) }
          .toDF("rank", "left", "right")
          .orderBy(col("rank"))
      },
      Some(bpeTrainOracleSql(numMerges = 30, topWords = 50000))),

    "ta_scrub" -> Q(
      (s, d) => T(s, d, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          TextAnalysis.scrub(concat(
            lit("<p>"), col("text"), lit("</p> contact: user"),
            col("doc_id").cast("string"),
            lit("@example.com  see https://example.org/d/"),
            col("doc_id").cast("string"))).as("clean"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  trim(regexp_replace(
             |    regexp_replace(
             |      regexp_replace(
             |        regexp_replace(
             |          '<p>' || text || '</p> contact: user' || doc_id ||
             |          '@example.com  see https://example.org/d/' || doc_id,
             |          '<[^>]*>', '', 'g'),
             |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             |      'https?://[^\s]+', '[URL]', 'g'),
             |    '\s+', ' ', 'g')) AS clean
             |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin)),

    // Zipf rank-frequency fit (round-13): slope of ln(freq) over ln(rank)
    // across the vocabulary — natural text sits near −1; a corpus whose
    // slope drifts is template-spam or degenerate generation. The global
    // rank is TWO-LEVEL so no single-partition window exists (the
    // battery-wide contract pin): frequency-range bins from broadcast
    // cutpoints (equal counts always share a bin, so cross-bin order is
    // total), a PARTITIONED row_number within each bin, and driver-side
    // bin offsets (≤33 longs) joined back broadcast.
    "ta_zipf" -> Q(
      (s, d) => {
        import s.implicits._
        val counts = T(s, d, "documents")
          .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("n"))
          // two consumers (bin sizes collect + the ranked fit): RDD-storage
          // checkpoint instead of .persist() so the blocks auto-release
          // when the frame is garbage (no CacheManager residue per call)
          .localCheckpoint()
        val cuts = graft.ops.Curation.percentileCutpoints(counts, col("n"), n = 32)
        val binned = graft.ops.Curation.binByCutpoints(counts, col("n"), cuts)
        val sizes = binned.groupBy(col("bin")).agg(count(lit(1)).as("c"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        // offset(b) = #types in bins holding LARGER counts (higher bin idx)
        val offs = sizes.keys.toSeq
          .map(b => (b, sizes.filter(_._1 > b).values.sum)).toDF("bin", "__off")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("bin")).orderBy(col("n").desc, col("tok"))
        binned.withColumn("__lr", row_number().over(w))
          .join(broadcast(offs), "bin")
          .withColumn("rank", col("__off") + col("__lr"))
          .agg(
            round(regr_slope(log(col("n")), log(col("rank"))), 4).as("zipf_slope"),
            round(regr_intercept(log(col("n")), log(col("rank"))), 4).as("zipf_intercept"),
            count(lit(1)).as("n_types"))
      },
      Some("""WITH c AS (
             |  SELECT tok, count(*) AS n FROM (
             |    SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                              t -> length(t) > 0)) AS tok
             |    FROM documents) GROUP BY 1),
             |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rank FROM c)
             |SELECT round(regr_slope(ln(n), ln(rank)), 4) AS zipf_slope,
             |  round(regr_intercept(ln(n), ln(rank)), 4) AS zipf_intercept,
             |  count(*) AS n_types
             |FROM r""".stripMargin))
  )
}
