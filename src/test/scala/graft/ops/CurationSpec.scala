package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Curation operator invariants: deterministic mixing, exact heavy hitters,
  * total-order binning. */
class CurationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("hashUniform is deterministic, in [0,1), and salt-sensitive") {
    val ids = (1L to 200L).toDF("id")
    val u = ids.select(Curation.hashUniform(col("id"), "a").as("u")).as[Double].collect()
    val u2 = ids.select(Curation.hashUniform(col("id"), "a").as("u")).as[Double].collect()
    val v = ids.select(Curation.hashUniform(col("id"), "b").as("u")).as[Double].collect()
    assert(u.toSeq == u2.toSeq)           // pure function of (salt, id)
    assert(u.forall(x => x >= 0.0 && x < 1.0))
    assert(u.toSeq != v.toSeq)            // different salt, different stream
  }

  test("weightedMix keeps ~rate per source and is idempotent on re-run") {
    val docs = (0L until 2000L).map(i => (i, s"src${i % 2}")).toDF("id", "source")
    val mixed = Curation.weightedMix(docs, "id", "source",
      rates = Map("src0" -> 1.0), defaultRate = 0.25)
    val audit = Curation.mixAudit(mixed, "source")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(audit("src0") == ((1000L, 1000L)))           // rate 1.0 keeps all
    val kept1 = audit("src1")._2
    assert(kept1 > 150 && kept1 < 350, s"src1 kept $kept1 of 1000 at rate 0.25")
    // re-running reproduces the exact same sample (no rand() anywhere)
    val again = Curation.mixAudit(
      Curation.weightedMix(docs, "id", "source", Map("src0" -> 1.0), 0.25),
      "source").collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(again("src1") == kept1)
  }

  test("heavyHitters returns exact top-k with deterministic tie order") {
    val words = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d")
    val r = Curation.heavyHitters(words.toDF("w"), col("w"), k = 3)
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r == Seq(("a", 5L), ("b", 3L), ("c", 3L))) // b before c on value tiebreak
  }

  test("quantileBins: bins are contiguous, sized within 1, ordered by score") {
    val docs = (1L to 103L).map(i => (i, (i * 7) % 101)).toDF("id", "score")
    val binned = Curation.quantileBins(docs, "id", col("score"), n = 10)
    val sizes = binned.groupBy("bin").count().as[(Int, Long)].collect().toMap
    assert(sizes.keySet == (1 to 10).toSet)
    assert(sizes.values.max - sizes.values.min <= 1) // ntile balance
    // bin boundaries never interleave: max(score) of bin k <= min of bin k+1
    val bounds = binned.groupBy("bin")
      .agg(min(col("score")).as("lo"), max(col("score")).as("hi"))
      .orderBy("bin").as[(Int, Long, Long)].collect()
    bounds.sliding(2).foreach {
      case Array((_, _, hi), (_, lo, _)) => assert(hi <= lo)
      case _ => ()
    }
  }
}
