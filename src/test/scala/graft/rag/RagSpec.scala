package graft.rag

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** V3–V5 semantics: threshold AFTER top-k, gate, context assembly, ANN parity. */
class RagSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // unit vectors at known angles to the query (1, 0)
  private val emb = Seq(
    (1L, Seq(1.0f, 0.0f)),     // cos 1.0
    (2L, Seq(0.9f, 0.4359f)),  // cos ≈ 0.9
    (3L, Seq(0.6f, 0.8f)),     // cos 0.6
    (4L, Seq(0.0f, 1.0f)),     // cos 0.0
    (5L, Seq(-1.0f, 0.0f))     // cos -1.0
  ).toDF("id", "vec").withColumn("vec", col("vec").cast("array<float>"))
  private val q = Array(1.0f, 0.0f)

  test("V3: top-k then threshold — fewer than k rows can return (neo4j_rag.py:256-297)") {
    // k=4 picks cos {1.0, 0.9, 0.6, 0.0}; threshold 0.5 then keeps 3
    val r = Rag.knn(emb, "id", "vec", q, k = 4, minScore = 0.5)
      .select("id").as[Long].collect().toSeq
    assert(r == Seq(1L, 2L, 3L))
  }

  test("V3: threshold-after-top-k differs from filter-then-limit (ordering pinned)") {
    // filter(≥0.5)-then-limit(2) would also give {1,2}; but k=2 t=0.0 must NOT
    // return id=3 even though it passes the threshold — the top-k ran first
    val r = Rag.knn(emb, "id", "vec", q, k = 2, minScore = 0.0)
      .select("id").as[Long].collect().toSeq
    assert(r == Seq(1L, 2L))
  }

  test("V4: best-match gate k=1 — hit above threshold, miss below") {
    assert(Rag.bestMatch(emb, "id", "vec", q, minScore = 0.8).map(_.getLong(0)) == Some(1L))
    val farQuery = Array(-0.7071f, 0.7071f)
    assert(Rag.bestMatch(emb, "id", "vec", farQuery, minScore = 0.95).isEmpty)
  }

  test("V5: context blocks joined desc-by-score with the reference separator") {
    val docs = emb.withColumn("title", concat(lit("T"), col("id")))
      .withColumn("summary", concat(lit("S"), col("id")))
      .withColumn("content", concat(lit("C"), col("id")))
    val out = Rag.contextRetrieval(docs, "id", "vec",
      col("title"), col("summary"), col("content"), q, k = 2, minScore = 0.0)
      .select("context").as[String].collect().head
    val blocks = out.split("\n\n---\n\n")
    assert(blocks.length == 2)
    assert(blocks(0).startsWith("Title: T1\nSummary: S1\nContent: C1\n(Similarity: 1.00)"))
    assert(blocks(1).startsWith("Title: T2\nSummary: S2\nContent: C2\n(Similarity: 0.90)"))
  }

  test("V5: content truncated at limit with '...' inside the block") {
    val docs = emb.filter(col("id") === 1)
      .withColumn("content", lit("x" * 30))
    val out = Rag.contextRetrieval(docs, "id", "vec",
      lit("t"), lit("s"), col("content"), q, k = 1, minScore = 0.0, truncateAt = 10)
      .select("context").as[String].collect().head
    assert(out.contains("Content: " + "x" * 10 + "...\n"))
  }

  test("ANN: signature prune + exact rerank agrees with brute force on the top hit") {
    val planes = Rag.hyperplanes(dim = 2, nBits = 16, seed = 7)
    val sigged = Rag.withSignature(emb, "vec", planes)
    val ann = Rag.annKnn(sigged, "id", "vec", q, planes, k = 1, minScore = 0.0,
      maxHamming = 8).select("id").as[Long].collect()
    assert(ann.headOption == Some(1L))
  }

  test("SQ8: int8-quantized cosine preserves the brute-force order on spread vectors") {
    // int8 error ~1/127 ≪ the cosine gaps in the fixture, so the full
    // ranking (not just the top hit) must survive quantization
    val s = Rag.sq8Knn(emb, "id", "vec", q, k = 5)
      .select("id").as[Long].collect().toSeq
    assert(s == Seq(1L, 2L, 3L, 4L, 5L))
    // scores stay within int8 error of the exact cosine
    val sc = Rag.sq8Knn(emb, "id", "vec", q, k = 5)
      .select("id", "score").as[(Long, Double)].collect().toMap
    assert(math.abs(sc(1L) - 1.0) < 0.02 && math.abs(sc(4L)) < 0.02,
      s"sq8 scores drifted: $sc")
    // a zero vector must not divide by zero — it is filtered out
    val withZero = emb.union(Seq((9L, Seq(0.0f, 0.0f)))
      .toDF("id", "vec").withColumn("vec", col("vec").cast("array<float>")))
    assert(!Rag.sq8Knn(withZero, "id", "vec", q, k = 10)
      .select("id").as[Long].collect().contains(9L))
  }

  test("SQ8 indexed search scans only the 1-byte code column, not the floats") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sq8").toString + "/idx"
    Rag.withSq8(emb, "vec").write.mode("overwrite").parquet(dir)
    val indexed = spark.read.parquet(dir).select("id", "q8")
    val ranked = Rag.sq8KnnIndexed(indexed, "id", q, k = 3)
    assert(ranked.select("id").as[Long].collect().toSeq == Seq(1L, 2L, 3L))
    val plan = ranked.queryExecution.executedPlan.toString
    // column pruning must reach the parquet reader: the scan's ReadSchema
    // carries q8 only — the 4×-wider float column is never read
    assert(plan.contains("q8") && !plan.contains("vec:"),
      s"float column leaked into the scan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }

  test("hyperplanes are deterministic for a seed") {
    val a = Rag.hyperplanes(4, 8, seed = 42)
    val b = Rag.hyperplanes(4, 8, seed = 42)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("MMR with lambda=1 degenerates to relevance order (knn)") {
    val r = Rag.mmr(emb, "id", "vec", q, k = 3, lambda = 1.0, poolSize = 5)
      .select("id", "mmr_rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
    assert(r.map(_._1) == Seq(1L, 2L, 3L))
  }

  test("MMR penalizes redundancy: the near-duplicate of pick 1 is deferred") {
    // doc 1 at +11° to the query, doc 2 at +12° (near-dup of 1), doc 3 at
    // −25°: rel(2) ≈ rel(1) but sim(2,1) ≈ 1, while doc 3 trades a little
    // relevance for real diversity (sim(3,1) = cos 36° ≈ 0.81)
    val dup = Seq(
      (1L, Seq(0.9816f, 0.1908f)),
      (2L, Seq(0.9781f, 0.2079f)),
      (3L, Seq(0.9063f, -0.4226f))
    ).toDF("id", "vec").withColumn("vec", col("vec").cast("array<float>"))
    val diversified = Rag.mmr(dup, "id", "vec", q, k = 2, lambda = 0.5, poolSize = 3)
      .select("id", "mmr_rank").as[(Long, Int)].collect().toMap.map(_.swap)
    assert(diversified(1) == 1L && diversified(2) == 3L) // 2 skipped for 3
    val plain = Rag.mmr(dup, "id", "vec", q, k = 2, lambda = 1.0, poolSize = 3)
      .select("id", "mmr_rank").as[(Long, Int)].collect().toMap.map(_.swap)
    assert(plain(2) == 2L) // relevance-only keeps the duplicate
  }

  test("MMR stops at the pool: k beyond pool size returns pool-size rows") {
    val r = Rag.mmr(emb, "id", "vec", q, k = 5, lambda = 0.7, poolSize = 5)
    assert(r.count() == 5)
    val ranks = r.select("mmr_rank").as[Int].collect().toSeq.sorted
    assert(ranks == (1 to 5))
  }

  test("rrfFuse: agreement outranks a single-list hit, absence adds zero") {
    val lex = Seq((10L, 5.0), (20L, 4.0), (30L, 3.0)).toDF("id", "score")
    val vec = Seq((20L, 0.9), (40L, 0.8)).toDF("id", "score")
    val fused = Rag.rrfFuse(Seq(lex, vec), "id", "score", k0 = 60, topK = 10)
      .as[(Long, Double)].collect()
    val byId = fused.toMap
    // 20 appears in both lists (ranks 2 and 1) → top fused score
    assert(fused.head._1 == 20L)
    assert(math.abs(byId(20L) - (1.0 / 62 + 1.0 / 61)) < 1e-9)
    // 10 only lexical rank 1, 40 only vector rank 2
    assert(math.abs(byId(10L) - 1.0 / 61) < 1e-9)
    assert(math.abs(byId(40L) - 1.0 / 62) < 1e-9)
    assert(fused.length == 4)
  }

  test("rrfFuse truncates to topK with deterministic tie-break") {
    val a = (1L to 8L).map(i => (i, 10.0 - i)).toDF("id", "score")
    val out = Rag.rrfFuse(Seq(a, a), "id", "score", k0 = 60, topK = 3)
      .as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
  }

  test("recallAtK: identical lists 1.0, disjoint 0.0, partial the exact fraction") {
    def lst(ids: Long*) = ids.map(Tuple1(_)).toDF("vec_id")
    val exact = lst(1, 2, 3, 4, 5)
    assert(Rag.recallAtK(lst(1, 2, 3, 4, 5), exact, "vec_id", 5)
      .as[(Long, Double)].head() == ((5L, 1.0)))
    assert(Rag.recallAtK(lst(6, 7, 8, 9, 10), exact, "vec_id", 5)
      .as[(Long, Double)].head() == ((0L, 0.0)))
    assert(Rag.recallAtK(lst(1, 2, 9, 10, 11), exact, "vec_id", 5)
      .as[(Long, Double)].head() == ((2L, 0.4)))
    // an approx list shorter than k (a too-aggressive prune) still reports
    assert(Rag.recallAtK(lst(1), exact, "vec_id", 5)
      .as[(Long, Double)].head() == ((1L, 0.2)))
  }

  test("knnJoin: each query gets its own planted nearest, nulls dropped, map-side group limit") {
    // orthogonal-ish plant: q1 ≈ c10, q2 ≈ c20; c30 is noise, c40 null
    val queries = Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(0f, 1f, 0f))).toDF("qid", "qv")
    val corpus = Seq(
      (10L, Some(Seq(0.9f, 0.1f, 0f))), (20L, Some(Seq(0.1f, 0.9f, 0f))),
      (30L, Some(Seq(0.5f, 0.5f, 0.7f))), (40L, Option.empty[Seq[Float]]))
      .toDF("cid", "cv")
      .withColumn("cv", col("cv").cast("array<float>"))
    val qf = queries.withColumn("qv", col("qv").cast("array<float>"))
    val out = Rag.knnJoin(qf, "qid", "qv", corpus, "cid", "cv", k = 1)
      .select("query_id", "cid", "rank").as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 10L, 1), (2L, 20L, 1)), out.toString)
    // k larger than the non-null corpus: 3 rows per query, ranked densely
    val all = Rag.knnJoin(qf, "qid", "qv", corpus, "cid", "cv", k = 10)
    assert(all.groupBy("query_id").count().as[(Long, Long)].collect().toMap
      == Map(1L -> 3L, 2L -> 3L))
    // the per-query top-k is a WindowGroupLimit (map-side heap), and the
    // query batch rides a broadcast, never a shuffle of the corpus. Assert
    // on the k=1 frame: with a k ≥ known-maxRows local fixture Spark
    // rightly skips the group limit as useless, which the k=10 frame hits
    val plan = Rag.knnJoin(qf, "qid", "qv", corpus, "cid", "cv", k = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
