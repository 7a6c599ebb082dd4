package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming twins of the batch pipeline operators that matter at ingest
 * time: bounded-state exact dedup, stream-static dimension enrichment, and
 * banded-SimHash NEAR-dup candidate detection.
 *
 * At 100 TB/day ingest these are the operators that decide whether the
 * pipeline holds: dedup state must be bounded by a watermark (unbounded
 * `dropDuplicates` state grows forever), and dimension joins must broadcast
 * the static side (a stream-stream shuffle join for a lookup table is the
 * classic self-inflicted bottleneck).
 */
object StreamOps {

  /** Input doc for streaming near-dup detection. */
  final case class Doc(doc_id: String, ts: java.sql.Timestamp, text: String)

  /** A near-dup candidate: `doc_id` arrived near-identical to `matched_id`. */
  final case class NearDupHit(doc_id: String, matched_id: String, hamming: Int)

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

  /** One tracked counter of [[spaceSavingTopK]]: `est` never undercounts the
    * true count, and `est - err` never overcounts it. */
  final case class SSCounter(shard: Int, value: String, est: Long, err: Long)

  /**
   * Streaming heavy hitters with bounded state — the streaming twin of
   * `Curation.cmTopK`, via the space-saving algorithm: each shard (values
   * are hash-sharded, so a value lives in exactly one shard's state) keeps
   * at most `m` counters. A tracked arrival increments its counter; an
   * untracked one evicts the minimum counter (count ties broken by value
   * for determinism), inheriting its count as the new counter's error
   * bound. Classic guarantees, pinned in the spec: `est ≥ true ≥ est −
   * err` for every tracked value, and any value with true count >
   * N_shard/m is guaranteed tracked.
   *
   * Emits every shard's full counter set each micro-batch (Update mode):
   * the global top-k is the query-side `ORDER BY est DESC LIMIT k` over
   * the latest snapshot — no cross-shard merge is needed because shards
   * partition the value space. State is O(numShards · m) forever, by
   * construction — no watermark or timeout required; at cluster scale
   * `numShards` spreads the counter maps across executors and is the
   * only shuffle.
   */
  def spaceSavingTopK(values: DataFrame, valueCol: String,
                      m: Int, numShards: Int = 32): Dataset[SSCounter] = {
    val spark = values.sparkSession
    import spark.implicits._
    values
      .select(col(valueCol).cast("string").as("value"),
        pmod(xxhash64(lit("ss"), col(valueCol).cast("string")), lit(numShards.toLong))
          .cast("int").as("shard"))
      .as[(String, Int)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Map[String, (Long, Long)], SSCounter](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard, rows, state: GroupState[Map[String, (Long, Long)]]) =>
          var counters = state.getOption.getOrElse(Map.empty) // value -> (est, err)
          rows.foreach { case (v, _) =>
            counters.get(v) match {
              case Some((est, err)) => counters = counters.updated(v, (est + 1, err))
              case None if counters.size < m => counters = counters.updated(v, (1L, 0L))
              case None =>
                val (minV, (minEst, _)) = counters.minBy { case (cv, (ce, _)) => (ce, cv) }
                counters = (counters - minV).updated(v, (minEst + 1, minEst))
            }
          }
          state.update(counters)
          counters.iterator.map { case (v, (est, err)) => SSCounter(shard, v, est, err) }
      }
  }

  /**
   * Streaming NEAR-dup candidate detection — the streaming twin of
   * `Dedup.simhashNearDup`: each doc's 64-bit SimHash splits into `bands`
   * band buckets; per (band, bucket), recent signatures are held in keyed
   * state, and an arriving doc emits a `NearDupHit` against every stored
   * doc within `maxHamming` and `horizonMs`. Same banding guarantee as the
   * batch path: a pair with Hamming < bands shares at least one intact
   * band, so it is found with certainty.
   *
   * Scale: state per bucket is O(docs in the horizon window ∕ 2^(64/bands))
   * and is evicted both inline (entries older than `ms − horizonMs`) and by
   * event-time timeout when a bucket goes idle — bounded regardless of
   * stream length. The signature is computed in a typed map with the
   * plain-JVM `simhash64Local` (the Column HOF form evaluates interpreted —
   * wrong for a per-row streaming hot path; parity is pinned in DedupSpec);
   * because a typed map re-derives attributes, the op re-applies the
   * watermark itself from `watermarkDelay` (delay ≥ expected disorder) —
   * callers do NOT pre-watermark. The one shuffle is the keyed-state
   * partitioning on (band, bucket). The same pair can surface from two
   * bands — downstream `dropDuplicates("doc_id", "matched_id")` per
   * micro-batch if exact-once pair emission matters.
   */
  def nearDupCandidates(docs: Dataset[Doc], horizonMs: Long, maxHamming: Int,
                        bands: Int = 4,
                        watermarkDelay: String = "10 minutes"): Dataset[NearDupHit] = {
    require(bands > 0 && 64 % bands == 0, s"bands ($bands) must divide 64")
    val spark = docs.sparkSession
    import spark.implicits._
    val width = 64 / bands
    val mask = (1L << width) - 1
    val bandCols = (0 until bands).map { i =>
      struct(lit(i).as("band"),
        shiftrightunsigned(col("sig"), i * width).bitwiseAND(lit(mask)).as("bucket"))
    }
    val exploded = docs
      .map(d => (d.doc_id, d.ts, graft.dedup.Dedup.simhash64Local(d.text)))
      .toDF("doc_id", "ts", "sig")
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"), col("sig"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("ts"), col("sig"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .as[(String, java.sql.Timestamp, Long, Int, Long)]

    exploded
      .groupByKey { case (_, _, _, band, bucket) => (band, bucket) }
      .flatMapGroupsWithState[List[(String, Long, Long)], NearDupHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_, rows, state: GroupState[List[(String, Long, Long)]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var entries = state.getOption.getOrElse(Nil) // (doc_id, ms, sig)
            val hits = Vector.newBuilder[NearDupHit]
            var maxMs = entries.foldLeft(0L)((m, e) => math.max(m, e._2))
            rows.toVector.sortBy(_._2.getTime).foreach { case (id, ts, sig, _, _) =>
              val ms = ts.getTime
              entries.foreach { case (oid, oms, osig) =>
                val h = java.lang.Long.bitCount(sig ^ osig)
                if (oid != id && math.abs(ms - oms) <= horizonMs && h <= maxHamming)
                  hits += NearDupHit(id, oid, h)
              }
              entries = (id, ms, sig) :: entries
              maxMs = math.max(maxMs, ms)
            }
            // inline eviction: nothing older than the horizon behind the
            // newest entry can ever match a future in-watermark arrival
            entries = entries.filter(_._2 >= maxMs - horizonMs)
            state.update(entries)
            state.setTimeoutTimestamp(maxMs + horizonMs)
            hits.result().iterator
          }
      }
  }

  /**
   * Streaming twin of the composite quality gate — the operator a
   * production corpus runs ON ARRIVAL: every incoming doc is gated by the
   * SAME scalar expressions as the batch `ta_quality_gate`
   * ([[graft.text.TextAnalysis.qualityGate]] — parity is structural, one
   * implementation), then per-rule outcomes are counted in event-time
   * windows. Stateless scalar gate + one watermarked windowed aggregate:
   * state is O(open windows × 5 rules), emitted in Append mode when the
   * watermark closes a window. Returns
   * (window_start, rule ∈ {kept, length_band, word_len, low_diversity,
   * no_stopwords}, n).
   */
  def qualityGateCounters(docs: DataFrame, tsCol: String, textCol: String,
                          windowDur: String,
                          watermarkDelay: String): DataFrame =
    graft.text.TextAnalysis.qualityGate(docs.withWatermark(tsCol, watermarkDelay), textCol)
      .groupBy(window(col(tsCol), windowDur),
        coalesce(col("reject_reason"), lit("kept")).as("rule"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("rule"), col("n"))
}
