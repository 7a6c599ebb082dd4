package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CappedCollectListSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("collects complete groups at/under the cap; over-cap groups are NULL") {
    // force real partial/merge paths: many input partitions per group
    val df = (1L to 100L).map(i => (if (i <= 60) "hot" else s"g${i % 5}", i))
      .toDF("k", "v").repartition(16)
    val got = df.groupBy($"k")
      .agg(CappedCollectList(col("v"), 10).as("ids"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1)))
      .toMap
    assert(got("hot").isEmpty, "df=60 > cap=10 must evaluate to NULL")
    // the 8 per-key survivors (61..100 over 5 groups = 8 each) come back
    // complete, order-insensitive
    (0 until 5).foreach { g =>
      val ids = got(s"g$g").get.toSet
      assert(ids.size == 8 && ids.forall(_ > 60L), s"g$g -> $ids")
    }
  }

  test("ignores NULL values but still counts non-null ones exactly") {
    val df = Seq(("a", Some(1L)), ("a", None), ("a", Some(2L)),
      ("b", None)).toDF("k", "v").repartition(4)
    val got = df.groupBy($"k")
      .agg(CappedCollectList(col("v"), 2).as("ids"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1))).toMap
    assert(got("a").get.toSet == Set(1L, 2L))
    assert(got("b").isEmpty, "all-null group has no values -> NULL")
  }

  test("string elements round-trip the serialize/merge path") {
    val df = (1 to 40).map(i => ("k", s"val$i")).toDF("k", "v").repartition(8)
    val under = df.groupBy($"k")
      .agg(CappedCollectList(col("v"), 40).as("ids")).head.getSeq[String](1)
    assert(under.toSet == (1 to 40).map(i => s"val$i").toSet)
    val over = df.groupBy($"k")
      .agg(CappedCollectList(col("v"), 39).as("ids")).head
    assert(over.isNullAt(1), "41st... no: 40 > 39 must be NULL")
  }
}
