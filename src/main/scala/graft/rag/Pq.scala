package graft.rag

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * Product quantization — the memory-compression scale path for V3
 * similarity search, completing the ANN family (brute-force rerank, LSH
 * prune in `Rag.annKnn`, IVF cells in [[Ivf]]).
 *
 * Standard PQ (Jégou et al., "Product Quantization for Nearest Neighbor
 * Search", IEEE TPAMI 2011, §II-III): split the D-dim vector into `m`
 * contiguous sub-vectors, k-means each subspace into `ks` centroids, and
 * store per vector only the `m` centroid codes (m bytes at ks ≤ 256 vs
 * 4·D bytes of floats). Query-side scoring is Asymmetric Distance
 * Computation (ADC): the query precomputes its dot product against every
 * subspace centroid once (an m × ks table, KiB-sized), and each row's
 * approximate score is the sum of `m` table LOOKUPS — no per-row float
 * arithmetic at all.
 *
 * Scale design (100 TB):
 *  - Training touches a deterministic hash-sample (same recipe as
 *    [[Ivf.train]]); codebooks are m·ks·(D/m) floats — KiB.
 *  - [[encode]] is a pure `functions._` composition (slice → codegen'd
 *    dot_product argmax), run once at WRITE time; the scan thereafter
 *    reads only the tiny `codes` array column — a 100 TB float corpus
 *    becomes ~TB-scale codes, often memory-resident.
 *  - [[adcScore]] embeds the query's lookup table as an array literal:
 *    scoring rides whole-stage codegen, shuffles nothing, and the top-k
 *    is TakeOrderedAndProject. An exact rerank of the ADC top-`rerank`
 *    (fetching true vectors only for those ids) recovers brute-force
 *    quality — the classic two-stage retrieve.
 */
object Pq {

  /** Trained product quantizer: `books(s)(c)(d)` = dim d of centroid c of
    * subspace s. Subspace s covers original dims [s·subDim, (s+1)·subDim). */
  final case class Model(books: Array[Array[Array[Float]]], subDim: Int) {
    def m: Int = books.length
    def ks: Int = books(0).length

    /** The ADC lookup table for a query: table(s)(c) = dot(q_s, books(s)(c)). */
    def adcTable(q: Array[Float]): Array[Array[Double]] =
      Array.tabulate(m) { s =>
        val qs = q.slice(s * subDim, (s + 1) * subDim)
        books(s).map(c => Ivf.dotLocal(c, qs))
      }
  }

  /**
   * Train per-subspace codebooks with Lloyd's iterations on a deterministic
   * hash-sample (plain k-means per subspace — sub-vectors are not
   * normalized, so the metric is the raw dot against the query sub-vector;
   * summing sub-dots reconstructs the full dot exactly when quantization is
   * lossless, which the spec pins).
   */
  def train(emb: DataFrame, idCol: String, vecCol: String,
            m: Int, ks: Int, sampleCap: Int = 1024, iters: Int = 8): Model = {
    val sample: Array[Array[Float]] = emb
      .filter(col(vecCol).isNotNull)
      .orderBy(xxhash64(col(idCol).cast("string")), col(idCol).cast("string"))
      .limit(sampleCap)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "PQ training sample is empty")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val subDim = dim / m

    val books = Array.tabulate(m) { s =>
      val sub = sample.map(_.slice(s * subDim, (s + 1) * subDim))
      val k = math.min(ks, sub.distinct.length)
      var centroids = Array.tabulate(k)(c => sub((c * sub.length) / k).clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(k)(Array.fill(subDim)(0.0))
        val counts = Array.fill(k)(0)
        sub.foreach { v =>
          val best = nearest(centroids, v)
          counts(best) += 1
          var d = 0
          while (d < subDim) { sums(best)(d) += v(d); d += 1 }
        }
        centroids = Array.tabulate(k) { c =>
          if (counts(c) == 0) centroids(c)
          else sums(c).map(x => (x / counts(c)).toFloat)
        }
      }
      centroids
    }
    Model(books, subDim)
  }

  /** Index of the l2-nearest centroid, ties to the lowest index. */
  private def nearest(centroids: Array[Array[Float]], v: Array[Float]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      var d2 = 0.0; var i = 0
      while (i < v.length) {
        val d = centroids(c)(i).toDouble - v(i).toDouble
        d2 += d * d; i += 1
      }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  /**
   * Code-assignment column: for each subspace, argmin of l2 distance to its
   * centroids (ties to the lowest code), as a pure `functions._`
   * composition over codegen'd dot products — ‖c−v‖² = ‖c‖² − 2·c·v + ‖v‖²,
   * and ‖v‖² is constant within a subspace, so argmin_c ‖c−v‖² =
   * argmax_c (c·v − ‖c‖²/2). Write-time step: store `codes`, drop (or
   * cold-store) the float vectors.
   */
  def codesFor(vecCol: Column, model: Model): Column = {
    GraftFunctions.register(org.apache.spark.sql.SparkSession.active)
    val subCodes = (0 until model.m).map { s =>
      val sub = slice(vecCol, s * model.subDim + 1, model.subDim)
      val scores = array(model.books(s).map { c =>
        val norm2 = Ivf.dotLocal(c, c)
        GraftFunctions.dotProduct(sub, lit(c).cast("array<float>")) - lit(norm2 / 2.0)
      }: _*)
      (array_position(scores, array_max(scores)) - 1).cast("int")
    }
    array(subCodes: _*)
  }

  /** Materialize PQ codes (write-time; the search path reads only these). */
  def withCodes(df: DataFrame, vecCol: String, model: Model,
                outCol: String = "codes"): DataFrame =
    df.withColumn(outCol, codesFor(col(vecCol), model))

  /**
   * ADC score column: Σ over subspaces of the query's precomputed
   * centroid-dot table, indexed by this row's code — m array lookups into
   * literals, zero float math per row, fully codegen'd.
   */
  def adcScore(codesCol: Column, model: Model, q: Array[Float]): Column = {
    val table = model.adcTable(q)
    (0 until model.m).map { s =>
      element_at(lit(table(s)), element_at(codesCol, s + 1) + 1)
    }.reduce(_ + _)
  }

  /**
   * PQ top-k: rank ALL rows by ADC (TakeOrderedAndProject over the codes
   * scan — the float vectors are never read), keep the top `rerank`
   * candidates, then exact-rerank those with the true cosine. With
   * `rerank ≥ corpus` this equals brute force exactly (spec-pinned); at
   * scale rerank is a small multiple of k, so exact scoring touches
   * `rerank` rows, not the corpus.
   */
  def pqKnn(embWithCodes: DataFrame, idCol: String, vecCol: String,
            q: Array[Float], model: Model, k: Int,
            rerank: Int = 100, codesCol: String = "codes"): DataFrame = {
    val candidates = embWithCodes
      .withColumn("__adc", adcScore(col(codesCol), model, q))
      .orderBy(col("__adc").desc, col(idCol))
      .limit(math.max(k, rerank))
      .drop("__adc")
    Rag.knn(candidates, idCol, vecCol, q, k, minScore = -1.0)
  }
}
