package graft.rag

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.TestData

/** IVF coarse-quantizer ANN: determinism, exhaustive-probe parity, recall. */
class IvfSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = TestData.embeddings(spark, sf)
    .filter(col("vec_id") =!= 0 && col("embedding").isNotNull)
  private lazy val q: Array[Float] = TestData.embeddings(spark, sf)
    .filter(col("vec_id") === 0).select(col("embedding"))
    .head().getSeq[Float](0).toArray

  test("training is deterministic and centroids are unit-norm") {
    val m1 = Ivf.train(emb, "vec_id", "embedding", nCells = 4, sampleCap = 256)
    val m2 = Ivf.train(emb, "vec_id", "embedding", nCells = 4, sampleCap = 256)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
    m1.centroids.foreach { c =>
      val n = math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(n - 1.0) < 1e-3, s"centroid norm $n")
    }
  }

  test("distributed refine: spherical Lloyd objective never decreases, deterministic") {
    import graft.functions.GraftFunctions
    val m0 = Ivf.train(emb, "vec_id", "embedding", nCells = 4, sampleCap = 64)
    def meanBestDot(m: Ivf.Model): Double = {
      GraftFunctions.register(spark)
      val dots = array(m.centroids.map(c =>
        GraftFunctions.dotProduct(col("embedding"), lit(c).cast("array<float>"))): _*)
      emb.select(avg(array_max(dots))).head().getDouble(0)
    }
    val before = meanBestDot(m0)
    val m1 = Ivf.refine(emb, "embedding", m0, iters = 2)
    val after = meanBestDot(m1)
    assert(after >= before - 1e-9,
      s"refinement must not worsen the objective: before=$before after=$after")
    // stable: re-refining reproduces the same centroids up to the float
    // noise of distributed double summation (partial-agg order varies)
    val m1b = Ivf.refine(emb, "embedding", m0, iters = 2)
    m1.centroids.zip(m1b.centroids).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-5, s"$x vs $y") }
    }
    m1.centroids.foreach { c =>
      val n = math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(n - 1.0) < 1e-3 || n == 0.0, s"refined centroid norm $n")
    }
  }

  test("every vector lands in exactly one cell, all cells in range") {
    val m = Ivf.train(emb, "vec_id", "embedding", nCells = 4, sampleCap = 256)
    val cells = Ivf.withCell(emb, "embedding", m)
    val total = emb.count()
    assert(cells.filter(col("cell").between(0, m.nCells - 1)).count() == total)
  }

  test("nProbe = nCells is exhaustive — exactly equals brute-force knn") {
    val m = Ivf.train(emb, "vec_id", "embedding", nCells = 4, sampleCap = 256)
    val cells = Ivf.withCell(emb, "embedding", m)
    val exact = Rag.knn(emb, "vec_id", "embedding", q, k = 10, minScore = -1.0)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val ivf = Ivf.ivfKnn(cells, "vec_id", "embedding", q, m, k = 10,
        minScore = -1.0, nProbe = m.nCells)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ivf == exact)
  }

  test("probed search returns a subset of its own cells with decent recall@10") {
    val m = Ivf.train(emb, "vec_id", "embedding", nCells = 8, sampleCap = 512)
    val cells = Ivf.withCell(emb, "embedding", m).cache()
    val exact = Rag.knn(emb, "vec_id", "embedding", q, k = 10, minScore = -1.0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val probed = Ivf.ivfKnn(cells, "vec_id", "embedding", q, m, k = 10,
        minScore = -1.0, nProbe = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact intersect probed).size / 10.0
    assert(recall >= 0.5, s"recall@10 was $recall")
    cells.unpersist()
  }

  test("probesFor ranks cells by query-centroid dot, deterministic ties") {
    val m = Ivf.Model(Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f), Array(-1.0f, 0.0f)))
    assert(m.probesFor(Array(0.9f, 0.1f), 2) == Seq(0, 1))
    assert(m.probesFor(Array(-1.0f, 0.0f), 1) == Seq(2))
  }

  test("cell-partitioned layout: the probe filter prunes to nProbe partitions at the scan") {
    // the scale claim behind ivfKnn: materialize `cell` at write time,
    // partition the table by it, and the probe filter becomes FILE-level
    // pruning — a query touches nProbe/nCells of the data, enforced by
    // the scan's partition filters, not a post-scan Filter
    val m = Ivf.train(emb, "vec_id", "embedding", nCells = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-layout").toString + "/t"
    Ivf.withCell(emb, "embedding", m).write.partitionBy("cell").parquet(dir)
    val table = spark.read.parquet(dir)
    val probes = m.probesFor(q, 2)
    val knn = Ivf.ivfKnn(table, "vec_id", "embedding", q, m, k = 10,
      minScore = -1.0, nProbe = 2)
    val plan = knn.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
    // physically verify: only the probed partitions' files are read
    val scanned = knn.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned.nonEmpty && scanned.forall(_ <= probes.length),
      s"expected <= ${probes.length} partitions scanned, got $scanned")
    // and the pruned search still returns the probed cells' true top-k
    assert(knn.count() == 10)
  }
}
