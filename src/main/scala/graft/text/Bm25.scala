package graft.text

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/**
 * BM25 keyword retrieval (Robertson & Zaragoza, "The Probabilistic
 * Relevance Framework: BM25 and Beyond", FnTIR 2009) — the lexical
 * counterpart of the vector/ANN search family: sparse term match with
 * tf-saturation and length normalization.
 *
 * Scale design:
 *  - Document length is `size(tokens)` — computed per-row inside the scan
 *    projection, never by exploding and re-grouping the token stream. The
 *    corpus-stats aggregate then reduces one (len) row per document to a
 *    single row map-side.
 *  - The token ARRAY is filtered to the query terms BEFORE the explode
 *    (`filter(toks, t.isin(query))`), so the generator emits only matching
 *    postings — the per-(doc, term) groupBy shuffles |hits| rows, never
 *    the corpus token stream, and docs with no hit are dropped pre-explode.
 *  - Per-term document frequencies ride in the SAME one-row corpus-stats
 *    aggregate (conditional sums over `array_contains` — query terms are
 *    literals), so idf needs no vocabulary shuffle and no join: the stats
 *    row broadcasts and df is a map lookup. The final top-k is
 *    TakeOrderedAndProject.
 *  - Scores are rounded BEFORE ranking so cross-engine double-sum jitter
 *    (~1 ulp) cannot reorder the boundary — ties break by doc id.
 */
object Bm25 {

  /**
   * Top-k BM25 scores of `queryTerms` over whitespace-tokenized text.
   * Returns (idCol, score) with score = Σ_t idf(t) · tf·(k1+1) /
   * (tf + k1·(1 − b + b·len/avgLen)), idf = ln((N − df + ½)/(df + ½) + 1).
   */
  def search(df: DataFrame, idCol: String, textCol: String,
             queryTerms: Seq[String], k: Int,
             k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val withLen = df.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("len", size(col("toks")))

    // Corpus stats AND per-term document frequencies in ONE map-side
    // aggregate: query terms are literals, so df(t) is a conditional sum
    // over array_contains — no vocabulary-wide shuffle, no df join. The
    // result is a single broadcast row.
    val dfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains(col("toks"), t), 1L).otherwise(0L)).as(s"df_$i")
    }
    val corpus = withLen.agg(count(lit(1)).as("n_docs"),
      avg(col("len")).as("avg_len") +: dfCols: _*)
    val dfByTerm = map(queryTerms.zipWithIndex.flatMap { case (t, i) =>
      Seq(lit(t), col(s"df_$i"))
    }: _*)

    // Prune to matching postings BEFORE the generator runs: docs with no
    // hit never explode, and the explode emits only query-term tokens.
    val tf = withLen
      .withColumn("hits", filter(col("toks"), t => t.isin(queryTerms: _*)))
      .filter(size(col("hits")) > 0)
      .select(col(idCol), col("len"), explode(col("hits")).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"), first(col("len")).as("len"))

    tf.crossJoin(broadcast(corpus))
      .withColumn("df", element_at(dfByTerm, col("tok")))
      .withColumn("contrib",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("len") / col("avg_len"))))
      .groupBy(col(idCol))
      .agg(round(sum(col("contrib")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /**
   * Materialize an inverted index at `base` — the design a 100 TB corpus
   * actually needs: tokenize ONCE at write time, then every query reads
   * only its own terms' postings.
   *
   *  - `postings/` is partitioned by `bucket = pmod(xxhash64(term), n)`,
   *    so a query's terms map to a handful of partition directories and
   *    the scan prunes everything else (plan-pinned `PartitionFilters`).
   *  - Doc length is denormalized into each posting (impact-style), so
   *    scoring never joins a doc-stats table.
   *  - `stats/` holds one row (n_docs, avg_len, n_buckets) — the only
   *    corpus-wide state a query needs.
   *  - The postings write repartitions by bucket first so each task owns
   *    whole buckets — without it every task writes a file into every
   *    partition directory (the small-files trap).
   */
  def buildIndex(df: DataFrame, idCol: String, textCol: String,
                 base: String, nBuckets: Int = 64): Unit = {
    // NOT spread-normalized: withLen is consumed by TWO actions (stats
    // write, postings write), so an added exchange executes twice and
    // costs more than the single-task tokenize saves (measured +0.5 s at
    // sf0.1); the postings write's own repartition provides downstream
    // parallelism
    val withLen = df.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("len", size(col("toks")))
    withLen.agg(count(lit(1)).as("n_docs"), avg(col("len")).as("avg_len"),
        lit(nBuckets).as("n_buckets"))
      .write.mode("overwrite").parquet(s"$base/stats")
    withLen.select(col("doc_id"), col("len"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), first(col("len")).as("len"))
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets.toLong)).cast("int"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$base/postings")
  }

  /**
   * BM25 top-k over a [[buildIndex]] index. Reads ONLY the query terms'
   * bucket partitions (+ a 1-row stats read); df per term is an exact
   * count over the pruned postings, broadcast back. Scores match
   * [[search]] bit-for-bit (same formula, same round-before-rank).
   */
  def searchIndex(spark: SparkSession, base: String,
                  queryTerms: Seq[String], k: Int,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val stats = spark.read.parquet(s"$base/stats").collect()(0)
    val nDocs = stats.getAs[Long]("n_docs")
    val avgLen = stats.getAs[Double]("avg_len")
    val nBuckets = stats.getAs[Int]("n_buckets")

    // Evaluate the terms' bucket ids with the same Catalyst xxhash64 the
    // build used (|terms| local rows — a bounded query-time constant).
    val buckets = spark.createDataset(queryTerms)(Encoders.STRING).toDF("term")
      .select(pmod(xxhash64(col("term")), lit(nBuckets.toLong)).cast("int"))
      .collect().map(_.getInt(0)).toSeq.distinct

    val postings = spark.read.parquet(s"$base/postings")
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(queryTerms: _*))
    val dfreq = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))

    postings.join(broadcast(dfreq), Seq("term"))
      .withColumn("contrib",
        log((lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("len") / lit(avgLen))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
