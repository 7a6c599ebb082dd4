package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/**
 * Plan-regression pins for the 100 TB checklist: pushdown reaches the scan,
 * small sides broadcast, top-k physicalizes as TakeOrderedAndProject, top-1
 * per group gets WindowGroupLimit. If an edit silently trades one of these
 * away, this spec fails before the bench does.
 */
class PlanAuditSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("p1_key_filter: predicate is pushed to the parquet scan") {
    val p = planOf("p1_key_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), LessThanOrEqual(l_orderkey,10)]"), p)
  }

  test("tpch_q6_forecast: every predicate reaches the scan, agg is partial+final") {
    val p = planOf("tpch_q6_forecast")
    // PushedFilters renders truncated in toString — assert via the Filter node
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    assert(p.contains("< 24.0"), p)
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("tpch_q5_region_revenue: dimension joins broadcast (no SMJ at dim size)") {
    val p = planOf("tpch_q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("tpch_q18_large_orders: the filtered aggregate side is the build side") {
    val p = planOf("tpch_q18_large_orders")
    assert(p.contains("BroadcastHashJoin"), p)
    // broadcast exchange must sit above the HAVING aggregate, not the orders scan
    val bIdx = p.indexOf("BroadcastExchange")
    assert(bIdx >= 0 && p.indexOf("HashAggregate", bIdx) >= 0, p)
  }

  test("w5_topk_score: top-k is TakeOrderedAndProject, never a global sort") {
    val p = planOf("w5_topk_score")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("w2_top1_per_group: Spark 4 WindowGroupLimit kicks in (partial+final)") {
    val p = planOf("w2_top1_per_group")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("w7_topk_per_group: k>1 still plans partial+final WindowGroupLimit") {
    val p = planOf("w7_topk_per_group")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial"), p)
  }

  test("v3_knn_cosine: scan → cosine → TakeOrderedAndProject, codegen'd hot loop") {
    val df = SparkEntry.queries("v3_knn_cosine")(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    // the cosine expression must participate in whole-stage codegen
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) { df.explain("codegen") }
    val cg = buf.toString("UTF-8")
    assert(cg.contains("WholeStageCodegen"), cg.take(2000))
  }
}
