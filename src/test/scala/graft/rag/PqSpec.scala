package graft.rag

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.TestData

/** Product-quantization ANN: lossless-codebook exactness, ADC = table sum,
  * rerank parity with brute force, recall on real embeddings. */
class PqSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = TestData.embeddings(spark, sf)
    .filter(col("vec_id") =!= 0 && col("embedding").isNotNull)
  private lazy val q: Array[Float] = TestData.embeddings(spark, sf)
    .filter(col("vec_id") === 0).select(col("embedding"))
    .head().getSeq[Float](0).toArray

  test("training is deterministic; codes are in range, one per subspace") {
    val m1 = Pq.train(emb, "vec_id", "embedding", m = 4, ks = 8, sampleCap = 256)
    val m2 = Pq.train(emb, "vec_id", "embedding", m = 4, ks = 8, sampleCap = 256)
    assert(m1.books.map(_.map(_.toSeq).toSeq).toSeq ==
      m2.books.map(_.map(_.toSeq).toSeq).toSeq)
    val codes = Pq.withCodes(emb, "embedding", m1)
      .select(col("codes")).as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
  }

  test("lossless codebook: ADC equals the exact dot product exactly") {
    // vectors drawn FROM a tiny per-subspace codebook (2 sub-vectors per
    // subspace, ks covers them) → quantization is lossless → the ADC sum
    // of table lookups must reconstruct the full dot bit-for-bit (modulo
    // double-sum association, which is fixed here: m ordered adds)
    val subs = Map(0 -> Seq(Seq(1f, 0f), Seq(0f, 1f)), 1 -> Seq(Seq(0.5f, 0.5f), Seq(-0.5f, 0.5f)))
    val rows = for (a <- 0 to 1; b <- 0 to 1)
      yield ((a * 2 + b).toLong, (subs(0)(a) ++ subs(1)(b)).toArray)
    val df = rows.toDF("vec_id", "embedding")
    val model = Pq.train(df, "vec_id", "embedding", m = 2, ks = 4, sampleCap = 16, iters = 8)
    val qv = Array(0.25f, -1.5f, 2.0f, 0.75f)
    val got = Pq.withCodes(df, "embedding", model)
      .withColumn("adc", Pq.adcScore(col("codes"), model, qv))
      .select(col("vec_id"), col("adc")).as[(Long, Double)].collect().toMap
    rows.foreach { case (id, v) =>
      val exact = v.zip(qv).map { case (x, y) => x.toDouble * y.toDouble }.sum
      assert(math.abs(got(id) - exact) < 1e-9, s"vec $id: adc ${got(id)} vs exact $exact")
    }
  }

  test("pqKnn with corpus-wide rerank equals brute-force knn exactly") {
    val model = Pq.train(emb, "vec_id", "embedding", m = 4, ks = 8, sampleCap = 256)
    val coded = Pq.withCodes(emb, "embedding", model)
    val n = emb.count().toInt
    val pq = Pq.pqKnn(coded, "vec_id", "embedding", q, model, k = 10, rerank = n)
      .select(col("vec_id"), round(col("score"), 6).as("score"))
      .as[(Long, Double)].collect().toSeq
    val brute = Rag.knn(emb, "vec_id", "embedding", q, k = 10, minScore = -1.0)
      .select(col("vec_id"), round(col("score"), 6).as("score"))
      .as[(Long, Double)].collect().toSeq
    assert(pq == brute)
  }

  test("ADC-only ranking has high top-10 recall on real embeddings") {
    val model = Pq.train(emb, "vec_id", "embedding", m = 16, ks = 32, sampleCap = 512)
    val coded = Pq.withCodes(emb, "embedding", model)
    // modest rerank (5x k) — the production shape
    val pq = Pq.pqKnn(coded, "vec_id", "embedding", q, model, k = 10, rerank = 50)
      .select("vec_id").as[Long].collect().toSet
    val brute = Rag.knn(emb, "vec_id", "embedding", q, k = 10, minScore = -1.0)
      .select("vec_id").as[Long].collect().toSet
    val recall = (pq & brute).size / 10.0
    assert(recall >= 0.7, s"PQ recall@10 too low: $recall (pq=$pq brute=$brute)")
  }

  test("IVF cell-prune composes with PQ ADC + rerank (the staged funnel)") {
    val ivf = Ivf.train(emb, "vec_id", "embedding", nCells = 8, sampleCap = 256)
    val pq = Pq.train(emb, "vec_id", "embedding", m = 16, ks = 32, sampleCap = 512)
    val indexed = Pq.withCodes(Ivf.withCell(emb, "embedding", ivf), "embedding", pq)
    // stage 1: probe 6 of 8 cells; stage 2+3: ADC rank + exact rerank
    val probes = ivf.probesFor(q, nProbe = 6)
    val pruned = indexed.filter(col("cell").isin(probes: _*))
    val got = Pq.pqKnn(pruned, "vec_id", "embedding", q, pq, k = 10, rerank = 50)
      .select("vec_id").as[Long].collect().toSet
    val brute = Rag.knn(emb, "vec_id", "embedding", q, k = 10, minScore = -1.0)
      .select("vec_id").as[Long].collect().toSet
    val recall = (got & brute).size / 10.0
    assert(recall >= 0.6, s"IVF∘PQ recall@10: $recall (got=$got brute=$brute)")
    // exhaustive probes + corpus rerank collapse to exact brute force
    val exact = Pq.pqKnn(indexed, "vec_id", "embedding", q, pq,
        k = 10, rerank = emb.count().toInt)
      .select("vec_id").as[Long].collect().toSet
    assert(exact == brute)
  }

  test("the ADC scan never reads the float vector column") {
    val model = Pq.train(emb, "vec_id", "embedding", m = 4, ks = 8, sampleCap = 256)
    // codes-only table, as written at index time
    val codesOnly = Pq.withCodes(emb, "embedding", model).select("vec_id", "codes")
    val ranked = codesOnly
      .withColumn("adc", Pq.adcScore(col("codes"), model, q))
      .orderBy(col("adc").desc, col("vec_id")).limit(10)
    // executes fine without any vector column, and the plan is a top-k
    assert(ranked.count() == 10)
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }
}
