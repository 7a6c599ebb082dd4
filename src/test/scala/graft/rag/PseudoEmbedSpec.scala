package graft.rag

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** V1 pseudo-embedding: geometry + Column/bulk parity. */
class PseudoEmbedSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def embedOne(text: String, dim: Int = 32): Seq[Float] =
    Seq(text).toDF("t").select(Rag.pseudoEmbed(col("t"), dim).as("e"))
      .as[Seq[Float]].collect().head

  test("identical text → identical unit vector") {
    val a = embedOne("the quick brown fox")
    val b = embedOne("the quick brown fox")
    assert(a == b)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
  }

  test("token overlap → higher cosine than disjoint text") {
    def cos(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val base = embedOne("spark table scan merge join")
    val near = embedOne("spark table scan filter group")
    val far = embedOne("zebra quantum violin meadow")
    assert(cos(base, near) > cos(base, far))
  }

  test("bulk form produces the same vectors as the Column form") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon")).toDF("id", "t")
    val bulk = Rag.pseudoEmbedBulk(docs, Seq("id"), "t", dim = 16)
      .select("id", "embedding").as[(Long, Seq[Float])].collect().toMap
    val column = docs.select(col("id"), Rag.pseudoEmbed(col("t"), 16).as("e"))
      .as[(Long, Seq[Float])].collect().toMap
    assert(bulk.keySet == column.keySet)
    bulk.foreach { case (k, v) =>
      v.zip(column(k)).foreach { case (x, y) => assert(math.abs(x - y) < 1e-6f) }
    }
  }

  test("empty text → null embedding (zero vector is not emitted)") {
    val r = Seq("").toDF("t").select(Rag.pseudoEmbed(col("t"), 8).as("e")).collect().head
    assert(r.isNullAt(0))
  }
}
