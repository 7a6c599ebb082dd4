package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operator family for training-data pipelines: token stats,
 * quality scoring, n-gram-heuristic language ID, token counting
 * (whitespace + BPE-ish regex), and document fingerprinting.
 *
 * Everything is a built-in-function Column expression — codegen'd, no UDFs,
 * so a 100 TB documents scan stays in one WholeStageCodegen span with the
 * parquet reader's column pruning (only `text` is read when only `text` is
 * used).
 */
object TextAnalysis {

  /** Non-empty whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /**
   * Normalize an undersplit input ahead of CPU-heavy per-row work: when the
   * frame has fewer partitions than half the cluster's cores, hash-spread
   * it on `key` so tokenize/explode stages parallelize. On a real 100 TB
   * scan the file splits already exceed the core count and this is the
   * identity — the guard exists because a SMALL parquet file arrives as one
   * split, and a single-task regex/explode stage was measured 2.2× slower
   * than the spread run on 32 local cores (ta_boilerplate, sf0.1).
   */
  private[graft] def spreadIfUndersplit(df: DataFrame, key: Column): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    // EXPLICIT partition count, deliberately: a bare repartition(key) is
    // REPARTITION_BY_COL, which AQE coalesces by shuffle BYTES — a 1.5 MB
    // text shuffle collapses right back to one partition, and the explode
    // that multiplies work per row downstream stays single-threaded (the
    // exact pathology this helper exists to fix; measured 3.6 s vs 0.7 s
    // on the boilerplate gram stage). Byte-blind coalescing is wrong
    // whenever per-row CPU, not bytes, is the cost.
    if (df.rdd.getNumPartitions * 2 < cores) df.repartition(cores, key) else df
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /**
   * Composite per-document quality gate (the `ta_quality_gate` operator,
   * factored here so the batch query and the streaming twin run the SAME
   * expressions — parity is structural, not re-implemented). Appends to
   * every input row: `n_tokens`, `ttr`, `avg_token_len`, `stop_ratio`,
   * per-rule flags `ok_len`/`ok_word_len`/`ok_diversity`/`ok_stopwords`,
   * the composite `keep`, and the first-failing `reject_reason` (null when
   * kept). Pure scalar expressions over two tokenizations — no shuffle, no
   * state: runs identically on a static frame and on a stream's
   * micro-batches, and at 100 TB cost is one codegen'd scan.
   */
  def qualityGate(df: DataFrame, textCol: String): DataFrame = {
    val sw = array(Seq("the", "a", "of", "and").map(lit): _*)
    // tokenize ONCE per row (two arrays), then derive every metric from
    // the materialized arrays: CollapseProject keeps multi-referenced
    // non-cheap aliases, so the split never re-runs per metric
    // null text must REJECT, not slip through with all-null flags: under
    // ANSI semantics size(null)=null makes every rule and reject_reason
    // null, and a downstream coalesce would misread that as "kept".
    // Empty-string semantics give n=0 → length_band rejection.
    val txt = coalesce(col(textCol), lit(""))
    val base = df
      .withColumn("__toks", tokens(txt))
      .withColumn("__ltoks", tokens(lower(txt)))
    val n = size(col("__toks"))
    val metrics = base
      .withColumn("__n", n)
      .withColumn("__ttr", when(n > 0,
        size(array_distinct(col("__toks"))).cast("double") / n.cast("double")))
      .withColumn("__awl", when(n > 0,
        aggregate(col("__toks"), lit(0L), (acc, t) => acc + length(t)).cast("double")
          / n.cast("double")))
      .withColumn("__sw", when(size(col("__ltoks")) > 0,
        size(filter(col("__ltoks"), t => array_contains(sw, t))).cast("double")
          / size(col("__ltoks")).cast("double")))
    val fLen = col("__n").between(20, 90)
    val fWl = col("__awl").between(3.8, 5.2)
    val fTtr = col("__ttr") >= 0.45
    val fSw = col("__sw") >= 0.02
    metrics
      .withColumn("n_tokens", col("__n").cast("long"))
      .withColumn("ttr", round(coalesce(col("__ttr"), lit(0.0)), 6))
      .withColumn("avg_token_len", round(coalesce(col("__awl"), lit(0.0)), 6))
      .withColumn("stop_ratio", round(coalesce(col("__sw"), lit(0.0)), 6))
      .withColumn("ok_len", fLen)
      .withColumn("ok_word_len", fWl)
      .withColumn("ok_diversity", fTtr)
      .withColumn("ok_stopwords", fSw)
      .withColumn("keep", fLen && fWl && fTtr && fSw)
      .withColumn("reject_reason",
        when(!fLen, lit("length_band")).when(!fWl, lit("word_len"))
          .when(!fTtr, lit("low_diversity")).when(!fSw, lit("no_stopwords")))
      .drop("__toks", "__ltoks", "__n", "__ttr", "__awl", "__sw")
  }

  /**
   * BPE-ish token estimate: alphanumeric runs + individual non-space
   * punctuation marks (a GPT-2-style pre-tokenizer shape), cheap proxy for
   * a real subword tokenizer at scan speed. Match-counting equals the
   * lookaround-split formulation under full-whitespace trimming
   * (#alnum runs + #non-ws punctuation chars; pinned in the spec) while
   * staying RE2-safe — any engine with regexp_extract_all computes the
   * identical count, which is what gives `ta_bpe_tokens` its DuckDB
   * oracle. (The earlier Column form used Spark `trim`, which strips only
   * spaces, so a bare tab/newline piece counted as a token — a defect this
   * formulation also fixes.)
   */
  def bpeIshTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Distinct-token ratio (type/token ratio) — repetition signal. */
  def typeTokenRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
  }

  /**
   * Per-document repetition profile — the curation signal that catches
   * boilerplate and degenerate generations: token count, distinct-token
   * count, repetition ratio (1 − type/token), and the frequency of the most
   * repeated token. The max-frequency part can't be a scalar expression
   * without building a per-row map, so it's the classic explode →
   * count-per-(doc, token) → max-per-doc aggregation: two shuffles on the
   * doc id, both map-side-combined, no token list ever held whole.
   */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val base = df.select(col(idCol), size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"))
    val topFreq = df
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max(col("c")).as("max_tok_freq"))
    base.join(topFreq, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        when(col("n_tokens") > 0,
          lit(1.0) - col("n_distinct").cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)).as("repetition_ratio"),
        coalesce(col("max_tok_freq"), lit(0L)).as("max_tok_freq"))
  }

  /** Mean token length. */
  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks).cast("double"))
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double")
        / length(text).cast("double"))

  /** Fraction of tokens found in `stopwords` (lowercased membership). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(w => lit(w.toLowerCase)): _*)
    val toks = tokens(lower(text))
    when(size(toks) > 0,
      size(filter(toks, t => array_contains(sw, t))).cast("double")
        / size(toks).cast("double"))
  }

  /**
   * Quality score in [0,1]: weighted blend of length band, stopword
   * presence, type/token ratio, and low punctuation noise — the standard
   * heuristic-filter shape (C4/Gopher-style) as a single scan expression.
   */
  def qualityScore(text: Column, stopwords: Seq[String],
                   minChars: Int = 80, maxChars: Int = 20000): Column = {
    val lenOk = when(length(text).between(minChars, maxChars), 1.0).otherwise(0.0)
    val sw = coalesce(stopwordRatio(text, stopwords), lit(0.0))
    val ttr = coalesce(typeTokenRatio(text), lit(0.0))
    val punct = coalesce(punctRatio(text), lit(0.0))
    round(
      lenOk * 0.3 + least(sw * 4.0, lit(1.0)) * 0.3 + ttr * 0.2 +
        (lit(1.0) - least(punct * 5.0, lit(1.0))) * 0.2, 6)
  }

  /**
   * N-gram-heuristic language ID: score = stopword-hit ratio per language;
   * winner = argmax (ties → lexicographic language order for determinism).
   * Profiles are data, not code — pass marker-word lists per language.
   */
  def languageId(text: Column, profiles: Map[String, Seq[String]]): Column = {
    // struct compares field-by-field: max score first, then higher -idx
    // (= earlier language alphabetically) — deterministic tie-break
    val scored = profiles.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((langName, words), idx) =>
        struct(coalesce(stopwordRatio(text, words), lit(0.0)).as("score"),
          lit(-idx).as("rank"), lit(langName).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }

  /** Stable 128-bit content fingerprint (md5 of case/whitespace-normalized text). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /**
   * Rolling-hash window fingerprints: xxhash64 of each `w`-token window
   * stride `stride` — the winnowing-style local fingerprint set.
   */
  def rollingFingerprints(text: Column, w: Int = 8, stride: Int = 4): Column = {
    val toks = tokens(text)
    val starts = sequence(lit(0), greatest(size(toks) - w, lit(0)), lit(stride))
    transform(starts, s => xxhash64(concat_ws(" ", slice(toks, s + 1, lit(w)))))
  }

  // ── corpus scrubbing (pre-training cleanup) ────────────────────────────
  // Patterns stay in the RE2-compatible subset (no backrefs/lookaround) so
  // the same regex runs in Spark (java.util.regex) and DuckDB (RE2) — which
  // is also what makes the DuckDB oracle for these possible.

  /** Replace email addresses with a placeholder token. */
  def redactEmails(text: Column, token: String = "[EMAIL]"): Column =
    regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", token)

  /** Replace http(s) URLs with a placeholder token. */
  def redactUrls(text: Column, token: String = "[URL]"): Column =
    regexp_replace(text, "https?://[^\\s]+", token)

  /** Strip HTML/XML tags (boilerplate removal). */
  def stripHtml(text: Column): Column =
    regexp_replace(text, "<[^>]*>", "")

  /** Collapse whitespace runs to single spaces and trim. */
  def normalizeWhitespace(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** The standard scrub chain: strip tags → redact → normalize. */
  def scrub(text: Column): Column =
    normalizeWhitespace(redactUrls(redactEmails(stripHtml(text))))

  /** Full per-document stats row (one projection over the scan). */
  def documentStats(df: DataFrame, idCol: String, textCol: String,
                    stopwords: Seq[String]): DataFrame =
    df.select(col(idCol),
      length(col(textCol)).as("n_chars"),
      tokenCount(col(textCol)).as("n_tokens"),
      bpeIshTokenCount(col(textCol)).as("n_bpe_tokens"),
      round(coalesce(typeTokenRatio(col(textCol)), lit(0.0)), 6).as("ttr"),
      round(coalesce(avgTokenLen(col(textCol)), lit(0.0)), 6).as("avg_token_len"),
      qualityScore(col(textCol), stopwords).as("quality"),
      fingerprint(col(textCol)).as("fingerprint"))

  /** Word n-grams as space-joined strings; empty array when the doc has
    * fewer than n tokens. */
  private def wordGrams(textCol: Column, n: Int): Column = {
    val toks = tokens(textCol)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /**
   * Boilerplate detection, CCNet/RefinedWeb style adapted to n-grams: a
   * word n-gram that appears in ≥ `minDocs` DISTINCT documents of the
   * same source is boilerplate (header/footer/nav debris repeats across a
   * crawl source; real prose does not). Returns per-doc
   * (idCol, n_grams, n_boiler, boiler_ratio) — the gate column a curation
   * pipeline thresholds on before tokenization.
   *
   * Scale shape: ONE explode of the corpus n-grams into a per-(doc, gram)
   * occurrence aggregate; document frequency is a count-over-(source,
   * gram) window on that same (much smaller) frame, and the per-doc
   * boiler count is a filtered re-aggregation — three shuffles of
   * strictly shrinking size, no join, and the corpus text is never
   * re-exploded. `n_grams` per doc is size arithmetic in the scan
   * projection.
   */
  def boilerplate(df: DataFrame, idCol: String, textCol: String,
                  sourceCol: String, n: Int = 5, minDocs: Int = 3): DataFrame = {
    require(n >= 1 && minDocs >= 2, s"need n >= 1, minDocs >= 2; got n=$n minDocs=$minDocs")
    import org.apache.spark.sql.expressions.Window
    // one explicit shuffle on (source, gram) serves BOTH the per-doc
    // occurrence aggregate (partitioning on a subset of its group keys
    // satisfies its distribution) and the df window — the gram strings
    // cross the wire exactly once. The scan is spread first when the file
    // arrives undersplit: the tokenize+explode is the CPU-heavy stage and
    // must not run in one task (see spreadIfUndersplit).
    val tf = spreadIfUndersplit(df, col(idCol))
      .select(col(idCol), col(sourceCol),
        explode(wordGrams(col(textCol), n)).as("gram"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col(sourceCol), col("gram"))
      .groupBy(col(idCol), col(sourceCol), col("gram"))
      .agg(count(lit(1)).as("__tf"))
    val perDoc = tf
      .withColumn("__df", count(lit(1)).over(
        Window.partitionBy(col(sourceCol), col("gram"))))
      .filter(col("__df") >= minDocs)
      .groupBy(col(idCol)).agg(sum(col("__tf")).as("n_boiler"))
    df.select(col(idCol),
        greatest(size(tokens(col(textCol))) - (n - 1), lit(0))
          .cast("long").as("n_grams"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        coalesce(round(col("n_boiler") / nullif(col("n_grams"), lit(0)), 6),
          lit(0.0)).as("boiler_ratio"))
  }

  /**
   * Per-doc Shannon entropy of the token distribution, in nats:
   * H = ln n − (Σ c·ln c)/n. Low entropy = repetitive/templated text
   * (complements [[repetitionStats]]'s exact-repeat view with a
   * distribution-shape one). One explicit repartition on the doc id
   * serves both the (doc, token) count and the per-doc reduction — the
   * token stream shuffles once, and nothing is corpus-global.
   * Returns (idCol, n_tokens, entropy), docs with ≥1 token.
   */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // repartition the TEXT (one row per doc) before the explode, not the
    // token stream after it: same single shuffle serving both aggregates
    // (hashpartitioning(id) clusters (id, tok) too), but it moves corpus
    // bytes once instead of per-token AND the tokenize+explode stage
    // parallelizes even when the file arrives as one split
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(col("__c") * log(col("__c"))).as("__s"))
      .select(col(idCol), col("n_tokens"),
        round(log(col("n_tokens")) - col("__s") / col("n_tokens"), 6).as("entropy"))

  /**
   * Unigram-LM quality score: the in-engine version of the KenLM
   * perplexity filter (CCNet) — train token frequencies on the corpus
   * itself, score each doc by its mean token log-probability
   * avg(ln p(t)). Gibberish and off-distribution docs score low.
   *
   * avg(ln(cnt/total)) decomposes to avg(ln cnt) − ln(total), so the
   * corpus total is size() arithmetic on the scan (one broadcast scalar,
   * never a third pass) and only ln(cnt) rides through the aggregate. The
   * token→count join shuffles on the token — at production scale the
   * vocab is a materialized artifact (build it like [[Bm25.buildIndex]]'s
   * postings); in-query it costs one extra explode.
   * Returns (idCol, n_tokens, avg_logp), docs with ≥1 token.
   */
  def unigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val total = df.agg(sum(size(tokens(col(textCol)))).cast("long").as("total"))
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    toks.join(vocab, Seq("tok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), avg(log(col("cnt"))).as("__a"))
      .crossJoin(broadcast(total))
      .select(col(idCol), col("n_tokens"),
        round(col("__a") - log(col("total")), 6).as("avg_logp"))
  }

  /**
   * Fused per-document token statistics: ONE tokenize+explode pass
   * producing `n_tokens`, [[tokenEntropy]]'s Shannon entropy, AND
   * [[unigramLmScore]]'s mean token log-probability together. The
   * pretraining gate needs all three, and composing the standalone
   * operators explodes the corpus three times (entropy, LM, and the final
   * token-count aggregate) — at 100× scale that is three full
   * explode+shuffle passes where one suffices, and it was the worst
   * measured scale slope in the battery (0.62 tail) before this fusion.
   *
   * Plan shape: the corpus repartitions on the doc id ONCE (text bytes
   * move once, and the tokenize+explode stage parallelizes even from a
   * single file split); the (doc, tok) count pre-aggregate rides that
   * partitioning. Corpus token frequencies come from a `sum over
   * (partition by tok)` window on the count frame — one shuffle of the
   * (doc, tok) pairs, no separate vocab join — and the per-doc reduction
   * derives all three outputs from the same grouped pass:
   * H = ln n − Σc·ln c / n and avg_logp = Σc·ln cnt / n − ln(total).
   * The corpus total is size() arithmetic on a map-only re-scan broadcast
   * as a 1-row scalar (the [[unigramLmScore]] pattern — never a third
   * explode). Returns (idCol, n_tokens, entropy, avg_logp), docs with
   * ≥1 token; values match the standalone operators' rounded outputs.
   */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val total = df.agg(sum(size(tokens(col(textCol)))).cast("long").as("total"))
    val tc = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("__c"))
    tc.withColumn("cnt", sum(col("__c")).over(Window.partitionBy(col("tok"))))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(col("__c") * log(col("__c"))).as("__s"),
        sum(col("__c") * log(col("cnt"))).as("__l"))
      .crossJoin(broadcast(total))
      .select(col(idCol), col("n_tokens"),
        round(log(col("n_tokens")) - col("__s") / col("n_tokens"), 6).as("entropy"),
        round(col("__l") / col("n_tokens") - log(col("total")), 6).as("avg_logp"))
  }

  /**
   * Flesch reading-ease score with the classic vowel-group syllable
   * heuristic (Flesch 1948; the readability gate of several public corpus
   * filters): 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words).
   * Sentences = runs of [.!?] (floored at 1, so fragments still score);
   * syllables = runs of [aeiouy] in the lowercased text (floored at 1).
   * Both counters are RE2-safe regexp_extract_all sizes, so the DuckDB
   * oracle computes the identical value — and the whole score is one
   * codegen'd scalar on the scan: no shuffle, composes with pruning.
   * NULL for token-less text (no words → no score, mirroring the other
   * per-doc operators' ≥1-token contract).
   */
  def readability(text: Column): Column = {
    val words = tokenCount(text).cast("double")
    val sentences =
      greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1))
        .cast("double")
    val syllables =
      greatest(size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0))), lit(1))
        .cast("double")
    when(words > 0,
      round(lit(206.835) - lit(1.015) * words / sentences
        - lit(84.6) * syllables / words, 6))
  }

  /**
   * Bigram language-model scoring with add-k smoothing — the next step up
   * from [[unigramLmScore]] as an in-engine fluency/perplexity filter:
   * avg_logp = mean ln P(w2|w1), P = (c(w1,w2)+k) / (c(w1)+k·V).
   * Lower = less corpus-predictable text (gibberish or rare content).
   *
   * Scale shape: bigrams come from ONE pure array expression per doc
   * (transform over token indices — no self-join of postings at pos+1),
   * then a single explode. Both corpus counts ride ONE shuffle: the
   * context count windows on w1, and the pair count's (w1, w2) clustering
   * is already satisfied by the w1 partitioning, so Catalyst plans the
   * second window without another Exchange. V broadcasts as a 1-row
   * distinct aggregate. Docs with < 2 tokens have no bigrams and drop out.
   */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
                    addK: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = tokens(col(textCol))
    val idxs = when(size(t) >= 2, sequence(lit(1), size(t) - 1))
      .otherwise(array().cast("array<int>"))
    val bi = df
      .select(col(idCol), explode(transform(idxs,
        i => struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2"))))
        .as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val vocab = df
      .select(explode(tokens(col(textCol))).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    bi
      .withColumn("c1", count(lit(1)).over(Window.partitionBy(col("w1"))))
      .withColumn("c2", count(lit(1)).over(Window.partitionBy(col("w1"), col("w2"))))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(log((col("c2") + lit(addK)) / (col("c1") + lit(addK) * col("v"))))
          .as("__a"))
      .select(col(idCol), col("n_bigrams"), round(col("__a"), 6).as("avg_logp"))
  }

  /**
   * Top-k keywords per document by tf·idf (idf = ln(N/df), scores rounded
   * to 6 decimals BEFORE ranking; ties break by term).
   *
   * Scale shape: ONE explode of the corpus feeding the (doc, term) tf
   * aggregate; df is a `count over (partition by term)` window on that
   * same postings set — one extra shuffle of the postings, but the corpus
   * is never re-scanned or re-exploded for a df rollup join. N broadcasts
   * as a 1-row aggregate, and the per-doc top-k is a rank-limit window
   * (Spark 4 WindowGroupLimit prunes partials map-side).
   */
  def keywords(df: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", round(col("tf") * log(col("n_docs") / col("df")), 6))
      .withColumn("rank", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("score").desc, col("term"))))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("score"), col("rank"))
  }
}
