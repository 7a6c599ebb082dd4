package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming twins of the batch pipeline operators that matter at ingest
 * time: bounded-state exact dedup and stream-static dimension enrichment.
 *
 * At 100 TB/day ingest these are the two operators that decide whether the
 * pipeline holds: dedup state must be bounded by a watermark (unbounded
 * `dropDuplicates` state grows forever), and dimension joins must broadcast
 * the static side (a stream-stream shuffle join for a lookup table is the
 * classic self-inflicted bottleneck).
 */
object StreamOps {

  /**
   * Exact dedup on a stream with bounded state: keeps one row per key among
   * rows whose event times fall within the watermark delay of each other,
   * and drops key-state once the watermark passes — state is O(keys per
   * watermark window), not O(all keys ever).
   */
  def dedupWithinWatermark(events: DataFrame, tsCol: String, delay: String,
                           keyCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /**
   * Stream-static enrichment join: the static side is read per micro-batch
   * (so slowly-changing dimensions refresh without restarting the query) and
   * explicitly broadcast — the stream side never shuffles.
   */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
                       joinCols: Seq[String]): DataFrame =
    stream.join(broadcast(dim), joinCols, "left")

  /**
   * Watermarked stream-stream interval join: right rows within
   * [leftTs - lowerMs, leftTs + upperMs] of a left row on the same key.
   * Both watermarks + the two-sided time bound are what let Spark expire
   * join state — without them a stream-stream join buffers forever. State
   * per side is O(rows inside the watermark+interval horizon).
   *
   * Callers set the watermarks (delay ≥ expected disorder) BEFORE calling;
   * the right side's key/ts columns come back prefixed `r_` so both sides'
   * columns survive.
   */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   lowerMs: Long, upperMs: Long): DataFrame = {
    val r = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"r_$c"))
    left.join(r,
      col(key) === col(s"r_$key") &&
        col(s"r_$rightTs") >= col(leftTs) - expr(s"INTERVAL $lowerMs MILLISECOND") &&
        col(s"r_$rightTs") <= col(leftTs) + expr(s"INTERVAL $upperMs MILLISECOND"))
  }
}
