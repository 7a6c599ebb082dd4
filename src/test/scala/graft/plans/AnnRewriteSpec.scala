package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.rag.Rag

/** The opt-in ANN optimizer rule: plan rewrite + result parity. */
class AnnRewriteSpec extends AnyFunSuite {

  private def withExtSession[T](f: SparkSession => T): T = {
    val prev = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder().master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  private def explainText(df: org.apache.spark.sql.DataFrame): String = {
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) { df.explain(true) }
    buf.toString("UTF-8")
  }

  test("rule injects bit_count prefilter when enabled, leaves plan alone when disabled") {
    withExtSession { s =>
      import s.implicits._
      val planes = Rag.hyperplanes(dim = 2, nBits = 16, seed = 42L)
      val emb = Seq(
        (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.95f, 0.3122f)),
        (3L, Seq(0.0f, 1.0f)), (4L, Seq(-1.0f, 0.0f))
      ).toDF("id", "vec").withColumn("vec", col("vec").cast("array<float>"))
      val sigged = Rag.withSignature(emb, "vec", planes).cache()
      sigged.count()
      val q = Array(1.0f, 0.05f)

      s.conf.set(AnnRewrite.EnabledKey, "false")
      val brute = Rag.knn(sigged, "id", "vec", q, k = 2, minScore = -1.0)
      assert(!explainText(brute).contains("bit_count"), "rule must not fire when disabled")
      val bruteIds = brute.select("id").as[Long].collect().toSeq

      s.conf.set(AnnRewrite.EnabledKey, "true")
      s.conf.set(AnnRewrite.BitsKey, "16")
      s.conf.set(AnnRewrite.SeedKey, "42")
      s.conf.set(AnnRewrite.MaxHammingKey, "4")
      val ann = Rag.knn(sigged, "id", "vec", q, k = 2, minScore = -1.0)
      val planText = explainText(ann)
      assert(planText.contains("bit_count"), s"expected prefilter in plan:\n$planText")
      val annIds = ann.select("id").as[Long].collect().toSeq
      // near-identical vectors share buckets: the true top-2 survive the prune
      assert(annIds == bruteIds, s"ann=$annIds brute=$bruteIds")
      s.conf.set(AnnRewrite.EnabledKey, "false")
    }
  }

  test("rule does not fire on sorts without a cosine score or without a sig column") {
    withExtSession { s =>
      import s.implicits._
      s.conf.set(AnnRewrite.EnabledKey, "true")
      try {
        // no sig column → untouched
        val emb = Seq((1L, Seq(1.0f, 0.0f))).toDF("id", "vec")
          .withColumn("vec", col("vec").cast("array<float>"))
        val plain = Rag.knn(emb, "id", "vec", Array(1.0f, 0.0f), k = 1, minScore = -1.0)
        assert(!explainText(plain).contains("bit_count"))
        assert(plain.count() == 1)
        // ordinary sort → untouched
        val df = Seq((3, "c"), (1, "a")).toDF("n", "s").orderBy(col("n").desc)
        assert(!explainText(df).contains("bit_count"))
        assert(df.select("n").as[Int].collect().toSeq == Seq(3, 1))
      } finally s.conf.set(AnnRewrite.EnabledKey, "false")
    }
  }
}
