package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** char_grams(text, k) must equal the builtin shape it replaced --
  * `transform(sequence(1, length(s)-k+1), i -> substring(s, i, k))` -- on
  * every reachable input (callers filter length(s) >= k), counting
  * CODE POINTS exactly like Spark's substring: multi-byte UTF-8, combining
  * marks (separate code points), and supplementary-plane characters
  * (single code point, 4 UTF-8 bytes) all included. Non-ASCII is written
  * as unicode escapes so the fixture is source-encoding-proof. */
class CharGramsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def builtin(k: Int) =
    expr(s"transform(sequence(1, length(t) - ${k - 1}), i -> substring(t, i, $k))")

  private val grin = "\ud83d\ude00"  // U+1F600, 4 UTF-8 bytes
  private val joy = "\ud83d\ude02"   // U+1F602
  private val fixtures = Seq(
    "abcdefgh",                                   // ASCII
    "ab",                                         // exactly k for k=2
    "a\u00e9b\u00e9c\u00e9d",                     // 2-byte code points
    "x\u0301y\u0308zw",                           // combining marks as own points
    s"${grin}ab${joy}cd$grin",                    // supplementary plane
    "\u4e2d\u6587\u6587\u672c\u6d4b\u8bd5",       // 3-byte CJK
    "  spaced  text  with  runs  ")

  test("char_grams equals transform(sequence, substring) for k in {2, 5, 8, 20}") {
    for (k <- Seq(2, 5, 8, 20)) {
      val df = fixtures.filter(s => s.codePointCount(0, s.length) >= k)
        .toDF("t")
        .select(col("t"), CharGrams(col("t"), k).as("fast"),
          builtin(k).as("slow"))
      val bad = df.filter(not(col("fast") <=> col("slow"))).collect()
      assert(bad.isEmpty, s"k=$k mismatch: ${bad.mkString("; ")}")
    }
  }

  test("null in, null out; shorter than k yields an empty array") {
    val r = Seq(Option("abc"), None).toDF("t")
      .select(CharGrams(col("t"), 5).as("g")).collect()
    assert(r.exists(_.isNullAt(0)))
    assert(r.exists(row => !row.isNullAt(0) && row.getSeq[String](0).isEmpty))
  }

  test("interpreted eval agrees with the DataFrame (codegen) path") {
    val gen = fixtures.toDF("t")
      .select(CharGrams(col("t"), 3).as("g")).collect()
      .map(_.getSeq[String](0))
    val interp = fixtures.map(s =>
      CharGramsUtil.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 3)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq)
    assert(gen.toSeq == interp.toSeq)
  }
}
