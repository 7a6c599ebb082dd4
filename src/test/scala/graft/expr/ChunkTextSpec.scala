package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.GraftFunctions

/**
 * Chunker semantics pinned to the reference
 * (/root/reference/openai_agents/memory/neo4j_rag.py:94-118, constants 42-43).
 */
class ChunkTextSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def chunk(text: String, size: Int, overlap: Int): Seq[(Int, Int, String)] =
    Seq(text).toDF("t")
      .select(GraftFunctions.chunkText(col("t"), size, overlap))
      .as[(Int, Int, String)].collect().toSeq

  test("text shorter than size yields exactly one chunk (the whole text)") {
    assert(chunk("hello", 1000, 200) == Seq((0, 0, "hello")))
  }

  test("text of exactly size yields one chunk") {
    val t = "x" * 1000
    assert(chunk(t, 1000, 200) == Seq((0, 0, t)))
  }

  test("empty string yields one empty chunk (reference while-loop never runs, single append)") {
    assert(chunk("", 1000, 200) == Seq((0, 0, "")))
  }

  test("step is size - overlap; trailing chunk may be short") {
    val t = "abcdefghij" // len 10
    // size 4, overlap 2 → step 2; starts 0,2,4,6,8
    val cs = chunk(t, 4, 2)
    assert(cs.map(_._2) == Seq(0, 2, 4, 6, 8))
    assert(cs.map(_._3) == Seq("abcd", "cdef", "efgh", "ghij", "ij"))
  }

  test("regression: chunk length equals `size`, not iterator self-consumption") {
    // with the round-1 `size` shadowing bug this produced garbage lengths
    val t = "a" * 2500
    val cs = chunk(t, 1000, 200)
    // python text[start:start+size] clips at the end: 2500-char text →
    // slices [0:1000], [800:1800], [1600:2600]→900, [2400:3400]→100
    assert(cs.map(_._3.length) == Seq(1000, 1000, 900, 100))
    assert(cs.map(_._2) == Seq(0, 800, 1600, 2400))
  }

  test("null input yields zero rows") {
    val n = Seq(Option.empty[String]).toDF("t")
      .select(GraftFunctions.chunkText(col("t"), 10, 2)).count()
    assert(n == 0)
  }

  test("property: de-overlapped chunk concat reconstructs the original (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    // run the sweep in ONE Spark job: build all cases as rows
    val cases = (1 to 60).map { i =>
      val len = rnd.nextInt(300)
      val s = Iterator.continually(rnd.nextPrintableChar()).take(len).mkString
      val size = 2 + rnd.nextInt(49)
      val overlap = rnd.nextInt(size)
      (i, s, size, overlap)
    }
    cases.foreach { case (_, s, size, overlap) =>
      val cs = chunk(s, size, overlap)
      val step = size - overlap
      assert(cs.forall(_._3.length <= size))
      if (s.length <= size) assert(cs == Seq((0, 0, s)))
      else {
        val rebuilt = cs.map(_._3).zipWithIndex.map {
          case (c, 0) => c
          case (c, _) => c.drop(overlap min c.length)
        }.mkString
        assert(rebuilt == s, s"size=$size overlap=$overlap len=${s.length}")
        assert(cs.head._2 == 0 && cs.map(_._2).sliding(2).forall {
          case Seq(a, b) => b - a == step; case _ => true })
      }
    }
  }
}
