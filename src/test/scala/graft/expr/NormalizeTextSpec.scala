package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.GraftFunctions

/** norm_text / strip_accents semantics (canonical dedup-key form; both are
  * native codegen expressions -- the interpreted-vs-codegen parity case
  * pins that the two paths agree). All non-ASCII is written as unicode
  * escapes so the fixture is source-encoding-proof. */
class NormalizeTextSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val acute = "\u0301"      // combining acute
  private val diaer = "\u0308"      // combining diaeresis
  private val eAcute = "\u00e9"     // composed e-acute
  private val bell = "\u0007"
  private val nbsp = "\u00a0"

  private def norm(s: String): Option[String] =
    Seq(Option(s)).toDF("t")
      .select(GraftFunctions.normText(col("t")).as("n"))
      .as[Option[String]].collect().head

  private def fold(s: String): Option[String] =
    Seq(Option(s)).toDF("t")
      .select(GraftFunctions.stripAccents(col("t")).as("n"))
      .as[Option[String]].collect().head

  test("NFC composition: decomposed e + combining acute composes") {
    assert(norm("Cafe" + acute).contains("Caf" + eAcute))
  }

  test("controls stripped, whitespace runs collapsed, ends trimmed") {
    assert(norm("  ab\t\t c \r\n d  ").contains("ab c d"))
    // a control between spaces does not create a double space
    assert(norm("a " + bell + " b").contains("a b"))
    assert(norm("a" + bell + "b").contains("ab"))
  }

  test("already-canonical text is unchanged (fast path)") {
    assert(norm("plain ascii text.").contains("plain ascii text."))
  }

  test("non-ASCII Unicode spaces are NOT collapsed (matches the oracle's class)") {
    assert(norm("a" + nbsp + nbsp + "b").contains("a" + nbsp + nbsp + "b"))
  }

  test("null in, null out; empty and all-whitespace collapse to empty") {
    assert(norm(null).isEmpty)
    assert(norm("").contains(""))
    assert(norm("  \t \n ").contains(""))
  }

  test("strip_accents folds combining decompositions, keeps non-decomposable letters") {
    assert(fold("\u00e9 \u00fc \u00f1 \u00e7").contains("e u n c"))
    // o-slash and L-stroke have no canonical decomposition -- kept, same
    // as DuckDB's strip_accents
    assert(fold("\u00f8 \u0141").contains("\u00f8 \u0141"))
    // composed and decomposed inputs fold identically
    assert(fold("Caf" + eAcute) == fold("Cafe" + acute))
    assert(fold("Caf" + eAcute).contains("Cafe"))
  }

  test("codegen and interpreted paths agree") {
    val inputs = Seq("  Caf" + eAcute + "\t x  ", "a " + bell + " b",
      "stru" + diaer + "m", "", " \t ", "plain")
    val df = inputs.toDF("t")
    val viaCodegen = df
      .select(GraftFunctions.normText(col("t")).as("n"),
        GraftFunctions.stripAccents(col("t")).as("f"))
      .as[(String, String)].collect().toSeq
    val interpreted = inputs.map(s => (
      NormalizeTextUtil.normalize(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString,
      NormalizeTextUtil.stripAccents(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString))
    assert(viaCodegen == interpreted)
    // and the expression really is inside a WholeStageCodegen span (a
    // local Seq constant-folds to LocalTableScan, so assert over a range
    // scan, which plans as codegen)
    val plan = spark.range(4)
      .select(GraftFunctions.normText(
        concat(lit("  a  b" + bell), col("id").cast("string"))).as("n"))
      .queryExecution.executedPlan.toString
    // "*(1) Project [norm_text(..." — the asterisk is executedPlan
    // toString's WholeStageCodegen marker
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[norm_text.*"), plan)
  }
}
