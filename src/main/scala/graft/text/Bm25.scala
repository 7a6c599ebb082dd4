package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * BM25 keyword retrieval (Robertson & Zaragoza, "The Probabilistic
 * Relevance Framework: BM25 and Beyond", FnTIR 2009) — the lexical
 * counterpart of the vector/ANN search family: sparse term match with
 * tf-saturation and length normalization.
 *
 * Scale design:
 *  - The postings pass filters tokens to the QUERY terms before any
 *    aggregation — the expensive explode feeds a `isin(query)` filter
 *    that drops ~all tokens at the scan stage, so the per-(doc, term)
 *    groupBy aggregates only matching postings, never the corpus
 *    vocabulary.
 *  - Document lengths + corpus stats are one aggregation (at write time a
 *    real index materializes `doc_len` once; here it is a second pass over
 *    the text column).
 *  - df/idf are computed on the tiny query-term posting set, joined back
 *    by term (|query| rows — broadcast by construction), and the final
 *    top-k is TakeOrderedAndProject.
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
    val toks = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))

    val docLen = toks.groupBy(col(idCol)).agg(count(lit(1)).as("len"))
    val corpus = docLen.agg(count(lit(1)).as("n_docs"),
      avg(col("len")).as("avg_len"))

    val tf = toks.filter(col("tok").isin(queryTerms: _*))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))

    tf.join(broadcast(dfreq), Seq("tok"))
      .join(docLen, Seq(idCol))
      .crossJoin(broadcast(corpus))
      .withColumn("contrib",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("len") / col("avg_len"))))
      .groupBy(col(idCol))
      .agg(round(sum(col("contrib")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
