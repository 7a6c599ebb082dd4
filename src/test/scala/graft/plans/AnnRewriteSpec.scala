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

  test("IVF path: plain orderBy(cos).limit(k) over a cell-indexed table gets the probe prune") {
    withExtSession { s =>
      import s.implicits._
      import graft.rag.Ivf
      // four well-separated directions → 4 clean cells
      val emb = Seq(
        (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.97f, 0.24f)),
        (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.24f, 0.97f)),
        (5L, Seq(-1.0f, 0.0f)), (6L, Seq(0.0f, -1.0f))
      ).toDF("id", "vec").withColumn("vec", col("vec").cast("array<float>"))
      val model = Ivf.train(emb, "id", "vec", nCells = 4, sampleCap = 16, iters = 4)
      val indexed = Ivf.withCell(emb, "vec", model).cache()
      indexed.count()
      val q = Array(1.0f, 0.1f)
      try {
        s.conf.set(AnnRewrite.EnabledKey, "true")
        s.conf.set(AnnRewrite.NProbeKey, "2")
        AnnRewrite.registerIvf(s, model)
        // the USER writes the brute-force shape; the rule must inject the
        // cell IN (<probes>) filter Ivf.ivfKnn would have written by hand
        val ann = Rag.knn(indexed, "id", "vec", q, k = 2, minScore = -1.0)
        val planText = explainText(ann)
        assert(planText.contains("cell#") && planText.matches("(?s).*cell#\\d+L? IN.*"),
          s"expected probe prune in plan:\n$planText")
        val annIds = ann.select("id").as[Long].collect().toSeq
        val handIds = Ivf.ivfKnn(indexed, "id", "vec", q, model,
          k = 2, minScore = -1.0, nProbe = 2).select("id").as[Long].collect().toSeq
        assert(annIds == handIds, s"rewrite=$annIds hand-written=$handIds")
        // without a registered model the rule must leave the plan alone
        AnnRewrite.unregisterIvf(s)
        val bare = Rag.knn(indexed, "id", "vec", q, k = 2, minScore = -1.0)
        assert(!explainText(bare).matches("(?s).*cell#\\d+L? IN.*"),
          "no registered quantizer → no probe prune")
      } finally {
        AnnRewrite.unregisterIvf(s)
        s.conf.set(AnnRewrite.EnabledKey, "false")
      }
    }
  }

  test("IVF path-convention sidecar: the probe prune fires with NO explicit registration") {
    withExtSession { s =>
      import s.implicits._
      import graft.rag.Ivf
      val emb = Seq(
        (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.97f, 0.24f)),
        (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.24f, 0.97f)),
        (5L, Seq(-1.0f, 0.0f)), (6L, Seq(0.0f, -1.0f))
      ).toDF("id", "vec").withColumn("vec", col("vec").cast("array<float>"))
      val model = Ivf.train(emb, "id", "vec", nCells = 4, sampleCap = 16, iters = 4)
      val dir = java.nio.file.Files.createTempDirectory("ivf-sidecar").toString
      val tbl = s"$dir/emb"
      // index build: materialize the cell column AND drop the sidecar —
      // after this, query-time needs no code at all
      Ivf.withCell(emb, "vec", model).write.parquet(tbl)
      Ivf.saveModel(s, tbl, model)
      assert(Ivf.loadModel(s, tbl).exists(_.centroids.map(_.toSeq).toSeq
        == model.centroids.map(_.toSeq).toSeq), "sidecar round-trips")
      val indexed = s.read.parquet(tbl)
      val q = Array(1.0f, 0.1f)
      try {
        s.conf.set(AnnRewrite.EnabledKey, "true")
        s.conf.set(AnnRewrite.NProbeKey, "2")
        AnnRewrite.invalidatePathCache()
        // NO registerIvf call — the rule must find the quantizer by path
        val ann = Rag.knn(indexed, "id", "vec", q, k = 2, minScore = -1.0)
        val planText = explainText(ann)
        assert(planText.matches("(?s).*cell#\\d+L? IN.*"),
          s"expected sidecar-derived probe prune in plan:\n$planText")
        val annIds = ann.select("id").as[Long].collect().toSeq
        val handIds = Ivf.ivfKnn(indexed, "id", "vec", q, model,
          k = 2, minScore = -1.0, nProbe = 2).select("id").as[Long].collect().toSeq
        assert(annIds == handIds, s"rewrite=$annIds hand-written=$handIds")
        // a parquet table WITHOUT a sidecar must stay untouched (negative
        // lookup, memoized)
        val bareTbl = s"$dir/bare"
        Ivf.withCell(emb, "vec", model).write.parquet(bareTbl)
        val bare = Rag.knn(s.read.parquet(bareTbl), "id", "vec", q,
          k = 2, minScore = -1.0)
        assert(!explainText(bare).matches("(?s).*cell#\\d+L? IN.*"),
          "no sidecar, no session model → no probe prune")
      } finally {
        s.conf.set(AnnRewrite.EnabledKey, "false")
        AnnRewrite.invalidatePathCache()
      }
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
