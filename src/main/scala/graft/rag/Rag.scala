package graft.rag

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * Vector-RAG core (SURVEY.md §2.9, V1–V5): cosine top-k search, the
 * best-match cache gate, and context retrieval, re-expressed Spark-first.
 *
 * Reference semantics: /root/reference/openai_agents/memory/neo4j_rag.py —
 * vector index query (256-297), best-match gate k=1 t=0.8 (305-331), context
 * retrieval k=3 t=0.5 with truncate(2000)+format+join (333-375). The
 * reference applies the score threshold AFTER the index top-k (so fewer than
 * k rows may return); `knn` preserves that order exactly.
 *
 * Scale design (100 TB): the hot loop is a codegen'd Catalyst expression
 * (`cosine_sim`), the top-k is planned as TakeOrderedAndProject (no global
 * sort, no shuffle of the full scan — each partition keeps k rows, the
 * driver merges). The ANN path pre-normalizes vectors at write time (cosine
 * == dot product), computes a random-hyperplane sign signature, and prunes
 * candidates by Hamming distance on the signature before the exact rerank —
 * a scan-level filter that skips ~(1 - probeFraction) of a 100 TB table and
 * co-partitions by signature for bucket-local search.
 */
object Rag {

  /** Brute-force score column against a literal query vector. */
  def scored(emb: DataFrame, vecCol: String, q: Array[Float]): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    emb.withColumn("score",
      GraftFunctions.cosineSim(col(vecCol), lit(q).cast("array<float>")))
  }

  /**
   * V3 — cosine top-k, threshold applied AFTER the top-k (neo4j_rag.py
   * :256-297 + SURVEY §2.6 ordering note). Ties broken by id for
   * determinism. `orderBy.limit` plans as TakeOrderedAndProject.
   */
  def knn(emb: DataFrame, idCol: String, vecCol: String, q: Array[Float],
          k: Int, minScore: Double): DataFrame =
    scored(emb, vecCol, q)
      .filter(col("score").isNotNull)
      .orderBy(desc("score"), col(idCol))
      .limit(k)
      .filter(col("score") >= minScore)

  /**
   * Batch top-k cosine JOIN: every row of `queries` gets its `k` nearest
   * rows of `corpus` — the many-queries-at-once retrieval shape (eval-set
   * scoring, semdedup seeding, recommendation batch fill) where [[knn]]
   * serves a single vector.
   *
   * Scale shape: the query batch is BOUNDED by contract and broadcasts;
   * the corpus scans ONCE with the codegen'd cosine scoring |Q| columns
   * per row, and the per-query top-k is a rank-≤-k window over query_id —
   * Spark's WindowGroupLimit prunes it map-side, so each task forwards at
   * most |Q|·k rows into the single query-keyed exchange (never the
   * |Q|·|C| score matrix). Ranking is on the 6dp-rounded score with id
   * tie-break, making the result (and the cross-engine hash) exact.
   * Null/zero-norm/mismatched vectors score null and are dropped before
   * ranking on both sides.
   */
  def knnJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
              corpus: DataFrame, cIdCol: String, cVecCol: String,
              k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(queries.sparkSession)
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("__qv"))
      .filter(col("__qv").isNotNull)
    corpus
      .filter(col(cVecCol).isNotNull)
      .join(org.apache.spark.sql.functions.broadcast(q), lit(true))
      .withColumn("score",
        round(GraftFunctions.cosineSim(col(cVecCol), col("__qv")), 6))
      .filter(col("score").isNotNull)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col(cIdCol))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(cIdCol), col("score"), col("rank"))
  }

  /**
   * SQ8 (scalar int8 quantization) approximate top-k: every vector is
   * quantized to int8 with a per-vector scale (max|x|/127), and cosine is
   * computed ENTIRELY in the quantized domain — per-vector scales cancel
   * in cosine, so no dequantization happens at query time. This is the 4×
   * memory-compression operating point between brute force (4 bytes/dim)
   * and PQ (sub-byte/dim): at 100 TB the embedding column is often the
   * widest, and int8 storage quarters both the scan bytes and the cache
   * footprint while keeping recall near 1 (measured by `v9_recall`).
   * Rounding is explicit floor(x/scale + 0.5) so the DuckDB oracle
   * reproduces identical codes; built-in HOFs only (codegen, no UDF);
   * `orderBy.limit` plans as TakeOrderedAndProject.
   */
  def sq8Knn(emb: DataFrame, idCol: String, vecCol: String, q: Array[Float],
             k: Int): DataFrame =
    sq8KnnIndexed(withSq8(emb, vecCol), idCol, q, k)

  /**
   * Write-time half of SQ8: append the int8 code column `q8`
   * (`array<tinyint>`, 1 byte/dim vs the float column's 4). Persisting the
   * indexed table lets every later search scan ONLY `q8` — column pruning
   * reaches the parquet reader, so query-time scan bytes drop 4× along
   * with the storage (pinned in RagSpec via the scan's ReadSchema).
   */
  def withSq8(df: DataFrame, vecCol: String): DataFrame = {
    val sc = {
      val m = aggregate(col(vecCol), lit(0.0d), (acc, x) =>
        greatest(acc, abs(x.cast("double"))))
      when(m === 0.0, lit(1.0)).otherwise(m / 127.0)
    }
    df.withColumn("q8", transform(col(vecCol),
      x => floor(x.cast("double") / sc + lit(0.5)).cast("tinyint")))
  }

  /** Query-time half of SQ8: rank by quantized cosine reading only the
    * `q8` code column (see [[sq8Knn]] for the math — per-vector scales
    * cancel in cosine, so codes alone suffice). */
  def sq8KnnIndexed(indexed: DataFrame, idCol: String, q: Array[Float],
                    k: Int): DataFrame = {
    val qAbs = q.map(x => math.abs(x.toDouble)).max
    val qSc = if (qAbs == 0.0) 1.0 else qAbs / 127.0
    val q8 = q.map(x => math.floor(x / qSc + 0.5))
    val qNorm = math.sqrt(q8.map(v => v * v).sum)
    val q8Col = array(q8.map(lit): _*)
    indexed
      .withColumn("__dot", aggregate(
        zip_with(col("q8"), q8Col, (a, b) => a.cast("double") * b),
        lit(0.0d), (acc, x) => acc + x))
      .withColumn("__n2", aggregate(col("q8"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double")))
      .filter(col("__n2") > 0.0)
      .withColumn("score", col("__dot") / (sqrt(col("__n2")) * lit(qNorm)))
      .drop("__dot", "__n2")
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /**
   * V4/D1 — best-match cache gate (k=1, min_score=0.8 —
   * interactive_research_workflow.py:41-46): Some(row) = cache hit, skip the
   * whole research pipeline. Driver-side scalar by design (a conditional on
   * one collected row, not a distributed op).
   */
  def bestMatch(emb: DataFrame, idCol: String, vecCol: String,
                q: Array[Float], minScore: Double = 0.8): Option[Row] =
    knn(emb, idCol, vecCol, q, k = 1, minScore).collect().headOption

  /**
   * MMR-diversified retrieval (Carbonell & Goldstein, SIGIR 1998): greedy
   * re-rank of the cosine top-`poolSize` pool by
   * λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s).
   *
   * The pool retrieval is the fully distributed [[knn]] path (or swap in
   * the ANN/IVF/PQ variants upstream); the greedy step is O(pool²) on the
   * BOUNDED collected pool — the standard retrieve-then-rerank split, same
   * driver-side budget as [[bestMatch]]. Every comparison happens on
   * values rounded to 6 decimals (rel, pairwise sims, and the combined
   * score), ties to the lower id, so the selection is reproducible
   * bit-for-bit across engines — that is what lets a chained-CTE SQL twin
   * hash-match the greedy loop. Returns (idCol, mmr_rank, rel) in
   * selection order.
   */
  def mmr(emb: DataFrame, idCol: String, vecCol: String, q: Array[Float],
          k: Int, lambda: Double = 0.7, poolSize: Int = 20): DataFrame = {
    require(k >= 1 && poolSize >= k, s"need poolSize >= k >= 1, got k=$k pool=$poolSize")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val sp = emb.sparkSession
    import sp.implicits._
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    def cosD(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val pool = knn(emb, idCol, vecCol, q, poolSize, minScore = Double.MinValue)
      .select(col(idCol).cast("long"), col(vecCol), round(col("score"), 6))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
    val sim = scala.collection.mutable.Map.empty[(Long, Long), Double]
    def simOf(a: (Long, Array[Float], Double), b: (Long, Array[Float], Double)): Double =
      sim.getOrElseUpdate((a._1 min b._1, a._1 max b._1), r6(cosD(a._2, b._2)))
    val mu = 1.0 - lambda
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double)]
    var chosen = List.empty[(Long, Array[Float], Double)]
    var remaining = pool.toList
    var rank = 1
    while (rank <= k && remaining.nonEmpty) {
      val best =
        if (chosen.isEmpty) remaining.minBy(c => (-c._3, c._1))
        else remaining.minBy { c =>
          val m = r6(lambda * c._3 - mu * chosen.map(simOf(c, _)).max)
          (-m, c._1)
        }
      selected += ((best._1, rank, best._3))
      chosen ::= best
      remaining = remaining.filterNot(_._1 == best._1)
      rank += 1
    }
    selected.toSeq.toDF(idCol, "mmr_rank", "rel")
  }

  /**
   * V5 — context retrieval (k=3, t=0.5): top-k → truncate(2000)+"..." →
   * "Title/Summary/Content/(Similarity: %.2f)" block → concat_ws with
   * "\n\n---\n\n" in DESC score order (neo4j_rag.py:333-375). Returns a
   * 1-row frame (context string + n_contexts).
   */
  def contextRetrieval(results: DataFrame, idCol: String, vecCol: String,
                       titleCol: Column, summaryCol: Column, contentCol: Column,
                       q: Array[Float], k: Int = 3, minScore: Double = 0.5,
                       truncateAt: Int = 2000): DataFrame = {
    val top = knn(results, idCol, vecCol, q, k, minScore)
    val block = GraftFunctions.formatContext(
      titleCol, summaryCol,
      GraftFunctions.truncateText(contentCol, truncateAt), col("score"))
    top
      .withColumn("ctx", block)
      // collect_list on a 1-group agg of ≤k rows; sort by (-score, id) inside
      // the struct to keep DESC-score order deterministic post-shuffle.
      .select(struct((-col("score")).as("neg"), col(idCol).cast("string").as("id"),
        col("ctx").as("ctx")).as("s"))
      .agg(
        concat_ws("\n\n---\n\n", transform(array_sort(collect_list(col("s"))),
          x => x.getField("ctx"))).as("context"),
        count(lit(1)).cast("long").as("n_contexts"))
  }

  /**
   * V1 stand-in with REAL plumbing: a deterministic bag-of-hashed-tokens
   * pseudo-embedding as a pure column expression — each token hashes to a
   * dimension bucket with a ±1 sign, the vector is l2-normalized. Not a
   * semantic model (the reference calls OpenAI here, neo4j_rag.py:67-92 —
   * an external-service batch UDF in production); what this gives the
   * engine is a fully-distributed chunk→embed→index→search path whose
   * geometry behaves like an embedding (identical text ⇒ identical vector,
   * token overlap ⇒ cosine proximity) with zero external calls.
   */
  def pseudoEmbed(text: Column, dim: Int = 64): Column =
    pseudoEmbedWith(text, dim, t => xxhash64(t))

  /**
   * Portable twin of `pseudoEmbed`: the token hash is the first 15 hex
   * chars of md5(token) parsed as a 60-bit integer — reproducible in any
   * engine with md5, which is what gives the chunk→embed→search pipeline a
   * DuckDB oracle (bucket sums are ±1 integers, so every intermediate is
   * exact; only the final /norm float cast rounds, identically on both
   * sides).
   */
  def pseudoEmbedPortable(text: Column, dim: Int = 64): Column =
    pseudoEmbedWith(text, dim, portableTokenHash)

  /** md5-derived 60-bit token hash (always non-negative). */
  private def portableTokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  private def pseudoEmbedWith(text: Column, dim: Int, hashFn: Column => Column): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    val hashed = transform(toks, t => hashFn(t))
    val counts = (0 until dim).map { d =>
      aggregate(hashed, lit(0.0d), (acc, h) =>
        acc + when(pmod(h, lit(dim)) === d,
          when(pmod(h, lit(2 * dim)) < dim, 1.0d).otherwise(-1.0d)).otherwise(0.0d))
    }
    val arr = array(counts: _*)
    val norm = sqrt(aggregate(arr, lit(0.0d), (a, x) => a + x * x))
    when(norm > 0.0d, transform(arr, x => (x / norm).cast("float")))
  }

  /**
   * Bulk twin of `pseudoEmbed` for scans (same output, different plan):
   * explode tokens → hash → per-(doc, dim-bucket) codegen'd sums → dense
   * vector assembly + normalization. One shuffle on the id; use this for
   * corpus-scale embedding, the Column form for ad-hoc/driver-side use.
   */
  def pseudoEmbedBulk(df: DataFrame, idCols: Seq[String], textCol: String,
                      dim: Int = 64, portable: Boolean = false): DataFrame = {
    val ids = idCols.map(col)
    val toks = df.select(ids :+
      explode(filter(split(lower(col(textCol)), "\\s+"), t => length(t) > 0)).as("tok"): _*)
    val hashExpr = if (portable) portableTokenHash(col("tok")) else xxhash64(col("tok"))
    val buckets = toks
      .select(ids :+ hashExpr.as("h"): _*)
      .withColumn("d", pmod(col("h"), lit(dim)).cast("int"))
      .withColumn("v", when(pmod(col("h"), lit(2 * dim)) < dim, 1.0d).otherwise(-1.0d))
      .groupBy(ids :+ col("d"): _*)
      .agg(sum(col("v")).as("v"))
    val dense = buckets
      .groupBy(ids: _*)
      .agg(map_from_entries(collect_list(struct(col("d"), col("v")))).as("m"))
      .withColumn("raw", transform(sequence(lit(0), lit(dim - 1)),
        i => coalesce(element_at(col("m"), i), lit(0.0d))))
    val norm = sqrt(aggregate(col("raw"), lit(0.0d), (a, x) => a + x * x))
    dense.select(ids :+
      when(norm > 0.0d, transform(col("raw"), x => (x / norm).cast("float")))
        .as("embedding"): _*)
  }

  // ─── ANN scale path ───────────────────────────────────────────────────────

  /** Pre-normalize at write time; on normalized vectors cosine == dot. */
  def withNormalized(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, GraftFunctions.l2Normalize(col(vecCol)))

  /** Deterministic random hyperplanes (xorshift-free LCG, seed-stable). */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 42L): Array[Array[Float]] = {
    var s = seed
    def next(): Float = {
      s = s * 6364136223846793005L + 1442695040888963407L
      // top 24 bits → (-1, 1)
      ((s >>> 40).toInt / 8388608.0f) - 1.0f
    }
    Array.fill(nBits)(Array.fill(dim)(next()))
  }

  /**
   * Random-hyperplane (SimHash-style) signature: bit b = sign(v · plane_b).
   * For cosine similarity, P[bit match] = 1 - angle/π — Hamming distance on
   * the signature approximates angular distance (Charikar, STOC'02).
   */
  def signature(vecCol: Column, planes: Array[Array[Float]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val dot = GraftFunctions.dotProduct(vecCol, lit(p).cast("array<float>"))
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _).as("sig")
  }

  def withSignature(df: DataFrame, vecCol: String, planes: Array[Array[Float]]): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.withColumn("sig", signature(col(vecCol), planes))
  }

  private def sigOf(q: Array[Float], planes: Array[Array[Float]]): Long =
    planes.zipWithIndex.map { case (p, i) =>
      val dot = p.zip(q).map { case (a, b) => a.toDouble * b.toDouble }.sum
      if (dot >= 0) 1L << i else 0L
    }.sum

  /**
   * ANN top-k: prune by signature Hamming distance ≤ maxHamming, then exact
   * cosine rerank on the survivors. On a table pre-materialized with `sig`
   * (and partitioned/z-ordered by it), the prune is a scan filter — the
   * exact rerank touches only the candidate fraction.
   */
  def annKnn(embWithSig: DataFrame, idCol: String, vecCol: String,
             q: Array[Float], planes: Array[Array[Float]], k: Int,
             minScore: Double, maxHamming: Int = 8): DataFrame = {
    val qSig = sigOf(q, planes)
    val candidates = embWithSig.filter(
      bit_count(col("sig").bitwiseXOR(lit(qSig))) <= maxHamming)
    knn(candidates, idCol, vecCol, q, k, minScore)
  }

  /**
   * Hybrid retrieval: reciprocal-rank fusion of several result lists
   * (lexical BM25, vector cosine, …). rrf(d) = Σᵢ 1/(k0 + rankᵢ(d)), a
   * document absent from a list contributes nothing from it, and the
   * classic k0 = 60 damps the head so one list can't dominate.
   *
   * Each input must carry (idCol, scoreCol) and be ALREADY REDUCED to a
   * top-N list — ranking within each list runs as a bounded broadcast
   * self-join (rank = 1 + #rows strictly ahead by (score desc, id asc);
   * ≤N² pairs, no single-partition WindowExec), so at 100 TB the heavy
   * lifting happened inside the per-list retrievals (BM25 postings
   * pruning, ANN signature prune) and the fusion joins k-sized lists.
   * Contributions are summed in fixed input order (no AGG reorder), so the
   * fused score is bit-deterministic and oracle-reproducible; ties break
   * by id. Rank equals row_number because ids are unique per list, making
   * (score desc, id asc) a total order.
   */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, scoreCol: String,
              k0: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val ranked = rankings.zipWithIndex.map { case (df, i) =>
      // null scores would contribute zero "ahead" rows to the count-based
      // rank and surface at rank 1; drop them (nulls-last ⇒ no contribution,
      // matching the row_number-over-ORDER-BY semantics this replaced)
      val in = df.select(col(idCol), col(scoreCol)).filter(col(scoreCol).isNotNull)
      in.join(broadcast(in.select(col(idCol).as("__pid"), col(scoreCol).as("__ps"))),
          col("__ps") > col(scoreCol) ||
            (col("__ps") === col(scoreCol) && col("__pid") < col(idCol)), "left")
        .groupBy(col(idCol))
        .agg((count(col("__pid")) + 1).cast("int").as(s"__r$i"))
    }
    val joined = ranked.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val contrib = rankings.indices
      .map(i => coalesce(lit(1.0) / (lit(k0) + col(s"__r$i")), lit(0.0)))
      .reduce(_ + _)
    joined.select(col(idCol), round(contrib, 9).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(topK)
  }

  /**
   * Recall@k of an approximate top-k list against the exact one:
   * |approx ∩ exact| / k — the first question a user asks of any
   * approximate index ("recall at what cost"). Both inputs are top-k
   * lists (bounded), so the semi join and the single-row aggregate are
   * driver-cheap regardless of corpus size; the expensive part was
   * producing the lists. Returns one row: (n_hits, recall).
   */
  def recallAtK(approx: DataFrame, exact: DataFrame, idCol: String,
                k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    approx.select(col(idCol)).limit(k)
      .join(exact.select(col(idCol)).limit(k), Seq(idCol), "left_semi")
      .agg(count(lit(1)).as("n_hits"),
        round(count(lit(1)).cast("double") / k, 6).as("recall"))
  }
}
