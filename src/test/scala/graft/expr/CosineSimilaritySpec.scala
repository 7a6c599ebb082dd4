package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.GraftFunctions

/** Cosine/dot expression semantics (SURVEY §2.9 V3; zero-norm → null per §7.4). */
class CosineSimilaritySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def cos(a: Seq[Float], b: Seq[Float]): Option[Double] =
    Seq((a, b)).toDF("a", "b")
      .select(GraftFunctions.cosineSim(
        col("a").cast("array<float>"), col("b").cast("array<float>")).as("c"))
      .as[Option[Double]].collect().head

  test("cos(v, v) == 1") {
    assert(math.abs(cos(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)).get - 1.0) < 1e-12)
  }

  test("orthogonal vectors → 0") {
    assert(math.abs(cos(Seq(1f, 0f), Seq(0f, 1f)).get) < 1e-12)
  }

  test("opposite vectors → -1") {
    assert(math.abs(cos(Seq(1f, 0f), Seq(-1f, 0f)).get + 1.0) < 1e-12)
  }

  test("zero-norm vector → null (threshold filters drop it downstream)") {
    assert(cos(Seq(0f, 0f), Seq(1f, 2f)).isEmpty)
  }

  test("length mismatch → null, not an exception (malformed row must not poison a scan)") {
    assert(cos(Seq(1f, 2f), Seq(1f, 2f, 3f)).isEmpty)
  }

  test("null input → null") {
    val r = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]])).toDF("a", "b")
      .select(GraftFunctions.cosineSim(
        col("a").cast("array<float>"), col("b").cast("array<float>")).as("c"))
      .as[Option[Double]].collect().head
    assert(r.isEmpty)
  }

  test("known value: cos((1,0,1),(0,1,1)) == 0.5") {
    assert(math.abs(cos(Seq(1f, 0f, 1f), Seq(0f, 1f, 1f)).get - 0.5) < 1e-12)
  }

  test("dot product on l2-normalized vectors equals cosine") {
    val df = Seq((Seq(3f, 4f), Seq(6f, 8f))).toDF("a", "b")
      .withColumn("an", GraftFunctions.l2Normalize(col("a").cast("array<float>")))
      .withColumn("bn", GraftFunctions.l2Normalize(col("b").cast("array<float>")))
      .select(
        GraftFunctions.cosineSim(col("a").cast("array<float>"), col("b").cast("array<float>")).as("c"),
        GraftFunctions.dotProduct(col("an"), col("bn")).as("d"))
    val row = df.collect().head
    assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-6)
  }

  test("l2Normalize of the zero vector → null") {
    val r = Seq(Seq(0f, 0f)).toDF("v")
      .select(GraftFunctions.l2Normalize(col("v").cast("array<float>")).as("n"))
      .collect().head
    assert(r.isNullAt(0))
  }
}
