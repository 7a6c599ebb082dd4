package graft.rag

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * IVF (inverted-file) ANN index — the second scale path for V3 similarity
 * search, alongside the hyperplane-LSH prune in [[Rag.annKnn]].
 *
 * Standard IVF construction (Jégou et al., "Product Quantization for Nearest
 * Neighbor Search", IEEE TPAMI 2011, §IV-A): train a small coarse quantizer
 * (k-means over a bounded sample), assign every vector to its nearest
 * centroid ("cell"), and at query time search only the `nProbe` cells whose
 * centroids are closest to the query, reranking those candidates exactly.
 *
 * Scale design (100 TB):
 *  - Training touches only a deterministic hash-sample of ≤ `sampleCap`
 *    vectors (collected to the driver — centroids are KiB-sized; sampling a
 *    fixed-size train set is how every production IVF index is built).
 *  - Cell assignment is a pure codegen'd column expression (argmax of
 *    `dot_product` against centroid literals) — materialize `cell` at write
 *    time and partition/z-order the table by it, and the probe filter
 *    becomes file-level pruning: a query touches nProbe/nCells of the data.
 *  - The exact rerank reuses [[Rag.knn]] (per-partition top-k,
 *    TakeOrderedAndProject — no global sort, no full-scan shuffle).
 *
 * Everything is seed-deterministic so tests and the correctness battery are
 * reproducible run-to-run and engine-to-engine.
 */
object Ivf {

  /** Trained coarse quantizer: `centroids(c)(d)` is dim d of centroid c. */
  final case class Model(centroids: Array[Array[Float]]) {
    def nCells: Int = centroids.length

    /** Driver-side nearest-centroid ranking for a query vector. */
    def probesFor(q: Array[Float], nProbe: Int): Seq[Int] =
      centroids.zipWithIndex
        .map { case (c, i) => (i, dotLocal(c, q)) }
        .sortBy { case (i, s) => (-s, i) }
        .take(math.max(1, nProbe))
        .map(_._1)
        .toSeq
  }

  private[rag] def dotLocal(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length && i < b.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Sidecar directory for the path-convention index catalog: a table
    * whose `cell` column was materialized with [[withCell]] stores its
    * coarse quantizer at `<table>/_graft_ivf/centroids.txt` (one centroid
    * per line, comma-separated floats). The underscore prefix keeps
    * Spark/Hadoop file listings from reading it as data. KiB-sized
    * (K×dim); written/read driver-side through the Hadoop FileSystem API
    * so the convention works on any supported scheme (file, hdfs, s3a).
    * [[graft.plans.AnnRewrite]] resolves it automatically, making plain
    * `orderBy(cosine).limit(k)` probe-pruned with zero caller code. */
  val SidecarDir = "_graft_ivf"
  private val SidecarFile = "centroids.txt"

  /** Write `model` as the table's sidecar quantizer (overwrites). */
  def saveModel(spark: org.apache.spark.sql.SparkSession, tablePath: String,
                model: Model): Unit = {
    val p = new org.apache.hadoop.fs.Path(tablePath, s"$SidecarDir/$SidecarFile")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(model.centroids.map(_.mkString(","))
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Load the table's sidecar quantizer, if one was saved. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                tablePath: String): Option[Model] = {
    val p = new org.apache.hadoop.fs.Path(tablePath, s"$SidecarDir/$SidecarFile")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val cents = txt.split("\n").filter(_.nonEmpty)
        .map(_.split(",").map(_.toFloat))
      if (cents.isEmpty) None else Some(Model(cents))
    }
  }

  /**
   * Train the coarse quantizer with Lloyd's iterations on a deterministic
   * sample. Vectors are expected l2-normalized (cosine == dot); assignment
   * maximizes dot product, centroids are re-normalized each round so the
   * same metric applies at train and search time (spherical k-means).
   */
  def train(emb: DataFrame, idCol: String, vecCol: String, nCells: Int,
            sampleCap: Int = 1024, iters: Int = 8): Model = {
    val sample: Array[Array[Float]] = emb
      .filter(col(vecCol).isNotNull)
      // deterministic, data-independent-ish sample: order by a hash of the id
      .orderBy(xxhash64(col(idCol).cast("string")), col(idCol).cast("string"))
      .limit(sampleCap)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "IVF training sample is empty")

    val k = math.min(nCells, sample.length)
    val dim = sample.head.length
    // k-means++-free deterministic init: spread over the hash-ordered sample
    var centroids = Array.tabulate(k)(c => sample((c * sample.length) / k).clone())

    def normalize(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(x => (x / n).toFloat) else v.map(_.toFloat)
    }

    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(Array.fill(dim)(0.0))
      val counts = Array.fill(k)(0)
      sample.foreach { v =>
        var best = 0; var bestS = Double.MinValue
        var c = 0
        while (c < k) {
          val s = dotLocal(centroids(c), v)
          if (s > bestS) { bestS = s; best = c }
          c += 1
        }
        counts(best) += 1
        var d = 0
        while (d < dim) { sums(best)(d) += v(d); d += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) // keep empty cells stable
        else normalize(sums(c))
      }
    }
    Model(centroids)
  }

  /**
   * Cell-assignment column: argmax over centroid dot products, ties to the
   * lowest cell id. Pure `functions._` composition (array of codegen'd
   * dot_products → array_position of the max) — stays in whole-stage
   * codegen, no UDF.
   */
  def cellFor(vecCol: Column, model: Model): Column = {
    GraftFunctions.register(org.apache.spark.sql.SparkSession.active)
    val dots = array(model.centroids.map(c =>
      GraftFunctions.dotProduct(vecCol, lit(c).cast("array<float>"))): _*)
    (array_position(dots, array_max(dots)) - 1).cast("int")
  }

  /** Materialize the cell id (write-time step; partition the table by it). */
  def withCell(df: DataFrame, vecCol: String, model: Model,
               outCol: String = "cell"): DataFrame =
    df.withColumn(outCol, cellFor(col(vecCol), model))

  /**
   * Distributed Lloyd refinement over the FULL corpus — closes the
   * sample-vs-corpus gap of the driver-side `train`: each iteration assigns
   * cells with the codegen'd argmax, aggregates per-(cell, dim) sums in one
   * distributed pass (posexplode → groupBy — the shuffle carries
   * nCells × dim rows, not the corpus), and renormalizes the KiB-sized
   * centroid set on the driver (spherical k-means step; the collect is
   * k × dim scalars, bounded and tiny by construction). The spherical
   * Lloyd objective (mean best-dot) is non-decreasing per iteration —
   * pinned in IvfSpec.
   */
  def refine(emb: DataFrame, vecCol: String, model: Model, iters: Int = 1): Model = {
    var m = model
    val vecs = emb.filter(col(vecCol).isNotNull)
    for (_ <- 0 until iters) {
      val dim = m.centroids.head.length
      val sums = withCell(vecs, vecCol, m)
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("d", "x")))
        .groupBy(col("cell"), col("d"))
        .agg(sum(col("x").cast("double")).as("s"))
        .collect()
      val acc = Array.fill(m.nCells)(Array.fill(dim)(0.0))
      sums.foreach(r => acc(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      m = Model(Array.tabulate(m.nCells) { c =>
        val n = math.sqrt(acc(c).map(x => x * x).sum)
        if (n > 0) acc(c).map(x => (x / n).toFloat) else m.centroids(c) // empty cell: keep stable
      })
    }
    m
  }

  /**
   * IVF top-k: filter to the `nProbe` nearest cells, exact cosine rerank.
   * With `nProbe == model.nCells` this is exhaustive and exactly equals
   * [[Rag.knn]] (pinned in IvfSpec); at scale use nProbe ≪ nCells.
   */
  def ivfKnn(embWithCell: DataFrame, idCol: String, vecCol: String,
             q: Array[Float], model: Model, k: Int, minScore: Double,
             nProbe: Int = 2, cellCol: String = "cell"): DataFrame = {
    val probes = model.probesFor(q, nProbe)
    val candidates = embWithCell.filter(col(cellCol).isin(probes: _*))
    Rag.knn(candidates, idCol, vecCol, q, k, minScore)
  }
}
