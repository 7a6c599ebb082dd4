package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BM25 ranking invariants on a hand-checkable corpus. */
class Bm25Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark spark spark engine"),   // tf-heavy on 'spark'
    (2L, "spark engine"),               // both terms, short doc
    (3L, "engine engine engine engine engine engine"), // long, off-term heavy
    (4L, "completely unrelated words here"),
    (5L, "spark")                        // shortest match
  ).toDF("doc_id", "text")

  test("matching docs rank above non-matching; non-matching are absent") {
    val r = Bm25.search(corpus, "doc_id", "text", Seq("spark"), k = 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(r.toSet == Set(1L, 2L, 5L)) // doc 3/4 never match 'spark'
  }

  test("tf saturation: more occurrences score higher, sublinearly") {
    val r = Bm25.search(corpus, "doc_id", "text", Seq("spark"), k = 10)
      .as[(Long, Double)].collect().toMap
    assert(r(1L) > r(5L)) // 3 occurrences beat 1 at comparable length
    // saturation: tripling tf must not triple the score
    assert(r(1L) < 3 * r(5L) * 1.5)
  }

  test("length normalization: same tf, shorter doc wins") {
    val r = Bm25.search(corpus, "doc_id", "text", Seq("engine"), k = 10)
      .as[(Long, Double)].collect().toMap
    // doc 2 (len 2, tf 1) vs doc 1 (len 4, tf 1): shorter doc scores higher
    assert(r(2L) > r(1L))
  }

  test("multi-term query sums contributions; rarer term contributes more idf") {
    val r = Bm25.search(corpus, "doc_id", "text", Seq("spark", "unrelated"), k = 10)
      .as[(Long, Double)].collect().toMap
    assert(r.contains(4L)) // matches the rare term only
    // 'unrelated' (df=1) out-idfs 'spark' (df=3): doc 4's single rare term
    // beats doc 5's single common term at comparable length ratios
    assert(r(4L) > r(5L))
  }

  test("index-backed search matches the direct path bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25idx")
    try {
      Bm25.buildIndex(corpus, "doc_id", "text", dir.toString, nBuckets = 8)
      val terms = Seq("spark", "engine")
      val direct = Bm25.search(corpus, "doc_id", "text", terms, k = 10)
        .as[(Long, Double)].collect().toSeq
      val viaIdx = Bm25.searchIndex(spark, dir.toString, terms, k = 10)
        .as[(Long, Double)].collect().toSeq
      assert(viaIdx == direct)
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).forEach(rm(_))
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(dir)
    }
  }

  test("index search reads only the query terms' bucket partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25idx2")
    try {
      Bm25.buildIndex(corpus, "doc_id", "text", dir.toString, nBuckets = 8)
      val p = Bm25.searchIndex(spark, dir.toString, Seq("spark"), k = 10)
        .queryExecution.executedPlan.toString
      // the bucket predicate must land in PartitionFilters (pruned dirs),
      // not in PushedFilters/post-scan Filter
      assert("PartitionFilters: \\[[^\\]]*bucket#\\d+ (=|IN)".r.findFirstIn(p).isDefined, p)
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).forEach(rm(_))
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(dir)
    }
  }

  test("deterministic: repeated runs produce identical rounded scores") {
    val a = Bm25.search(corpus, "doc_id", "text", Seq("spark", "engine"), k = 10)
      .as[(Long, Double)].collect().toSeq
    val b = Bm25.search(corpus, "doc_id", "text", Seq("spark", "engine"), k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(a == b)
  }
}
