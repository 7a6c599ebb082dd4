package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector: `Test/runMain graft.tools.ExplainMain <key> <sfDir>`
  * prints the formatted physical plan of one SparkEntry query. Test scope —
  * a diagnostics harness, not part of the library surface. */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(key)(spark, sfDir)
    // scalastyle:off println
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    // scalastyle:on println
    spark.stop()
  }
}
