package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BPE trainer/encoder: hand-computed merges, determinism, encode parity. */
class BpeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("merge loop learns the hand-computed rules with deterministic ties") {
    // {"aaab": 3}: pairs (a,a)=6 (overlapping), (a,b)=3 → merge (a,a).
    // then ["aa","a","b"]: (aa,a)=3, (a,b)=3 — count tie, (a,b) wins the
    // lexicographic tiebreak → merges [(a,a), (a,b)]
    val m = Bpe.trainLocal(Seq(("aaab", 3L)), numMerges = 2)
    assert(m.merges == Seq(("a", "a"), ("a", "b")))
  }

  test("training stops early when no pairs remain, never loops") {
    val m = Bpe.trainLocal(Seq(("ab", 1L)), numMerges = 10)
    assert(m.merges == Seq(("a", "b"))) // one possible merge, then done
  }

  test("classic Sennrich-style corpus: 'es'/'est' family merges first") {
    val freqs = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val m = Bpe.trainLocal(freqs, numMerges = 4)
    // (e,s)=9 and then (es,t)=9 dominate — the suffix family fuses first
    assert(m.merges.take(2) == Seq(("e", "s"), ("es", "t")))
  }

  test("distributed train == local train on the same corpus; deterministic") {
    val docs = Seq((1L, "low low low low low lower lower"),
      (2L, "newest newest newest newest newest newest"),
      (3L, "widest widest widest")).toDF("doc_id", "text")
    val dist = Bpe.train(docs, "text", numMerges = 6)
    val local = Bpe.trainLocal(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), 6)
    assert(dist.merges == local.merges)
    assert(Bpe.train(docs, "text", numMerges = 6).merges == dist.merges)
  }

  test("train's frequency floor drops hapax words before the top-k collect") {
    // "zq" appears ONCE; with the default minCount=2 its (z,q) pair must
    // not reach the merge loop — the floor is what keeps the top-k
    // gatherer's input O(non-hapax vocab) instead of O(all distinct words)
    // at corpus scale (round-8 verdict item). minCount=1 restores it.
    val docs = Seq((1L, "low low low zq"), (2L, "low low")).toDF("doc_id", "text")
    val floored = Bpe.train(docs, "text", numMerges = 8)
    assert(floored.merges == Bpe.trainLocal(Seq(("low", 5L)), 8).merges)
    assert(!floored.merges.contains(("z", "q")))
    val unfloored = Bpe.train(docs, "text", numMerges = 8, minCount = 1L)
    assert(unfloored.merges ==
      Bpe.trainLocal(Seq(("low", 5L), ("zq", 1L)), 8).merges)
    assert(unfloored.merges.contains(("z", "q")))
  }

  test("encodeWord applies merges by rank; encode counts pieces per doc") {
    val m = Bpe.Model(Seq(("a", "a"), ("a", "b")))
    assert(Bpe.encodeWord("aaab", m) == Vector("aa", "ab"))
    assert(Bpe.encodeWord("aab", m) == Vector("aa", "b")) // (a,a) outranks (a,b)
    assert(Bpe.encodeWord("xyz", m) == Vector("x", "y", "z")) // unseen: chars
    val out = Bpe.encode(Seq((7L, "aaab aab xyz"), (8L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"), "doc_id", "text", m)
      .orderBy("doc_id")
      .as[(Long, Seq[String], Int)].collect().toSeq
    assert(out == Seq(
      (7L, Seq("aa", "ab", "aa", "b", "x", "y", "z"), 7),
      (8L, Seq(), 0)))
  }

  test("encoding a word from training reproduces its trained segmentation") {
    val freqs = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val m = Bpe.trainLocal(freqs, numMerges = 8)
    // after enough merges the most frequent full word fuses to one piece
    assert(Bpe.encodeWord("newest", m).length <= 2)
    // greedy rank-order inference segments consistently (no crash, full cover)
    freqs.foreach { case (w, _) =>
      assert(Bpe.encodeWord(w, m).mkString == w)
    }
  }
}
