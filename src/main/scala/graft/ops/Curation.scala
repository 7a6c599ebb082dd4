package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators: the sampling/mixing/profiling steps a
 * large-scale training-data pipeline runs between dedup and tokenization.
 *
 * Determinism rule: every sampling decision is a pure function of the row
 * (portable md5-derived uniform), never of `rand()` — re-running the
 * pipeline on the same corpus reproduces the same mixture bit-for-bit on
 * any engine (the DuckDB oracles recompute the identical hash), and a
 * backfill on added data never resamples old rows.
 */
object Curation {

  /** Portable uniform in [0, 1): first 15 hex chars of md5 (a 60-bit int,
    * sign-safe) modulo 10^4, scaled. Matches DuckDB
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) % 10000 / 10000.0`. */
  def hashUniform(key: Column, salt: String): Column =
    (conv(substring(md5(concat(lit(salt + "|"), key.cast("string"))), 1, 15), 16, 10)
      .cast("long") % 10000).cast("double") / 10000.0

  /**
   * Domain mixing: keep each row with its source's rate (deterministic
   * Bernoulli by row hash). The core knob of corpus composition — "100% of
   * books, 25% of web" — applied in one scan with zero shuffles: the
   * decision is a scalar expression, so it pushes through to wherever the
   * scan runs and composes with partition pruning.
   */
  def weightedMix(df: DataFrame, idCol: String, sourceCol: String,
                  rates: Map[String, Double], defaultRate: Double,
                  salt: String = "mix"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    df.withColumn("__keep", hashUniform(col(idCol), salt) < rate)
  }

  /**
   * Temperature rebalancing (the multilingual/source-balance knob of
   * multilingual LM training, cf. mBERT/XLM-R exponential smoothing):
   * target share q_s ∝ n_s^τ, so τ=1 keeps natural proportions and τ→0
   * flattens toward uniform, up-weighting minority sources. Each source's
   * keep-rate is min(1, targetFrac·N·q_s/n_s), rounded to 6 decimals, and
   * rows keep via the same deterministic hash-Bernoulli as [[weightedMix]]
   * — [[hashUniform]] < rate.
   *
   * Plan: one tiny per-source aggregate (+ its 1-row total) broadcasts
   * back; the keep decision is then a scalar on the scan. No corpus
   * shuffle. Note τ<1 cannot UP-sample a minority beyond keeping all of
   * it (rate caps at 1); duplication-based oversampling is the separate,
   * explicit [[oversample]] step.
   */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
                     tau: Double, targetFrac: Double,
                     salt: String = "temp"): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    require(targetFrac > 0.0 && targetFrac <= 1.0,
      s"targetFrac must be in (0,1], got $targetFrac")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
    // per-source counts are a tiny frame; the two corpus totals are a
    // 1-row driver scalar (same budget as percentileCutpoints)
    val t = counts.agg(sum(col("__n")), sum(pow(col("__n"), tau))).head()
    val (nTotal, z) = (t.getLong(0), t.getDouble(1))
    val rates = counts
      .withColumn("__keep_rate", round(least(lit(1.0),
        lit(targetFrac) * lit(nTotal) * pow(col("__n"), tau) / lit(z) / col("__n")), 6))
      .select(col(sourceCol), col("__keep_rate"))
    df.join(broadcast(rates), Seq(sourceCol))
      .withColumn("__keep", hashUniform(col(idCol), salt) < col("__keep_rate"))
  }

  /**
   * Duplication-based oversampling — the explicit up-weighting step
   * [[temperatureMix]]'s scaladoc defers to (a keep-rate caps at 1; only
   * replication can raise a minority source ABOVE keeping all of it,
   * epoch-style, cf. the per-source epoch counts of the Pile / ROOTS
   * training mixes). Each row is emitted `floor(rate)` times plus one
   * more with probability `frac(rate)` via the deterministic
   * hash-Bernoulli, so the expected per-source multiplier is exactly its
   * rate, replication is reproducible row-by-row, and a rate ≤ 1
   * degenerates to [[weightedMix]]'s thinning. Copies are numbered in
   * `__copy` (0 = the original) so downstream packing/splitting can
   * treat them as distinct examples with a stable derived id.
   *
   * Plan: rates broadcast as a tiny map literal; the replication is ONE
   * `explode(sequence(...))` on the scan — no shuffle, no join, and the
   * output size is Σ n_s·rate_s by construction (never a blowup a skewed
   * join could produce).
   */
  def oversample(df: DataFrame, idCol: String, sourceCol: String,
                 rates: Map[String, Double], defaultRate: Double = 1.0,
                 salt: String = "over"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(_ >= 0.0),
      "oversample rates must be non-negative")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    val copies = (floor(rate) +
      when(hashUniform(col(idCol), salt) < (rate - floor(rate)), 1).otherwise(0))
      .cast("int")
    df.withColumn("__n", copies)
      .filter(col("__n") > 0)
      .withColumn("__copy", explode(sequence(lit(0), col("__n") - 1)))
      .drop("__n")
  }

  /**
   * Budgeted target-proportion mixing — "make me a `totalRows`-example
   * corpus that is 40% src0, 25% src1, …": the mixing verb a training-mix
   * spec states directly, where [[weightedMix]] wants per-source RATES
   * and [[temperatureMix]] a smoothing exponent. Each source's rate
   * solves to totalRows·p_s/n_s — BELOW 1 it thins like weightedMix,
   * ABOVE 1 it replicates epoch-style like [[oversample]] (floor copies +
   * deterministic hash-Bernoulli remainder), so the expected per-source
   * output is exactly totalRows·p_s whether the source is over- or
   * under-supplied. Sources not named in `targets` get proportion 0 and
   * drop out.
   *
   * Scale shape: the only aggregation is the per-source count (one
   * map-side-combined groupBy over a 2-column projection); the rates ride
   * back on a BROADCAST join keyed by source (a source-count-sized
   * dimension, never the corpus), and the replication is the same single
   * explode(sequence) on the scan as oversample — no corpus shuffle
   * anywhere. Rates are rounded to 6dp so the Bernoulli boundary against
   * the 1e-4 uniform grid replays identically on any engine. Output: the
   * input columns + (__rate, __copy) with `__copy` = 0 for the original.
   */
  def targetMix(df: DataFrame, idCol: String, sourceCol: String,
                targets: Map[String, Double], totalRows: Long,
                salt: String = "tmix"): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ >= 0.0),
      "target proportions must be non-negative")
    require(targets.values.sum <= 1.0 + 1e-9,
      s"target proportions must sum to <= 1, got ${targets.values.sum}")
    require(totalRows > 0, s"totalRows must be positive, got $totalRows")
    val tgt = targets.foldLeft(lit(0.0)) { case (acc, (src, p)) =>
      when(col("__src") === src, lit(p)).otherwise(acc)
    }
    val rates = df.groupBy(col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__rate",
        round(lit(totalRows.toDouble) * tgt / col("__n"), 6))
      .select(col("__src"), col("__rate"))
    val copies = (floor(col("__rate")) +
      when(hashUniform(col(idCol), salt) <
        (col("__rate") - floor(col("__rate"))), 1).otherwise(0))
      .cast("int")
    df.join(broadcast(rates), col(sourceCol) === col("__src"))
      .withColumn("__nc", copies)
      .filter(col("__nc") > 0)
      .withColumn("__copy", explode(sequence(lit(0), col("__nc") - 1)))
      .drop("__src", "__nc")
  }

  /**
   * Deterministic train/val/test assignment: the portable uniform of the
   * row id lands in cumulative-weight intervals. A row's split is a pure
   * function of (salt, id) — stable under reruns, backfills, and engine
   * changes, and rows added later never flip existing assignments (the
   * property `randomSplit` cannot give you). Zero shuffles: the label is
   * a scalar chain on the scan.
   */
  def splitAssign(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)],
                  salt: String = "split"): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.forall(_._2 > 0), "split weights must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val u = hashUniform(col(idCol), salt)
    // cumulative thresholds in DECIMAL so 0.9 + 0.05 is exactly 0.95: the
    // uniform lands on a 1e-4 grid, and a binary-float cumsum artifact
    // (0.9500000000000001) straddles grid points differently across
    // engines — decimal sums make boundary comparisons reproducible
    val cum = splits.map(s => BigDecimal.valueOf(s._2))
      .scanLeft(BigDecimal(0))(_ + _).tail.map(_.toDouble)
    val expr = splits.init.zip(cum.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), t)) =>
        Some(acc.fold(when(u < t, name))(_.when(u < t, name)))
      }.get.otherwise(splits.last._1)
    df.withColumn("split", expr)
  }

  /**
   * Leakage-safe train/val/test split: assignment at duplicate-CLUSTER
   * granularity, so every member of a near-dup cluster lands in the SAME
   * split. Splitting by document id leaks: a train doc's near-duplicate
   * in the val set scores as generalization what is actually recall.
   * `clusters` is the `(id, cluster)` frame of
   * [[graft.dedup.Dedup.connectedComponents]] over near-dup pairs
   * (singletons carry their own id as label, so on a clean corpus this
   * degenerates to [[splitAssign]]); documents absent from the frame
   * also fall back to their own id. Cost at 100 TB: one equi-join on the
   * id (the cluster frame is corpus-sized but narrow — two ids), then
   * the same zero-shuffle deterministic scalar chain as [[splitAssign]],
   * keyed on the cluster label.
   */
  def leakageSafeSplit(df: DataFrame, idCol: String, clusters: DataFrame,
                       splits: Seq[(String, Double)],
                       salt: String = "split"): DataFrame = {
    val lbl = clusters.select(col("id").as(idCol), col("cluster").as("__cluster"))
    splitAssign(
      df.join(lbl, Seq(idCol), "left")
        .withColumn("__cluster", coalesce(col("__cluster"), col(idCol))),
      "__cluster", splits, salt).drop("__cluster")
  }

  /**
   * Dataset diff card: the per-source delta between two corpus versions —
   * what a curation review actually signs off on ("web shrank 12%, books
   * gained 40k docs, net −1.2B tokens"). Per source: old/new doc counts,
   * ADDED and REMOVED doc counts (id-level anti-joins — a source can gain
   * and lose simultaneously, which the net alone hides), and the token
   * delta. Sources present on one side only appear with zeros on the
   * other.
   *
   * Scale: two corpus aggregations (map-side combined, |sources| rows
   * out) plus two anti-joins on the narrow (id, source) projection —
   * the text column never shuffles.
   */
  def datasetDiff(old: DataFrame, cur: DataFrame, idCol: String,
                  sourceCol: String, tokensCol: Column): DataFrame = {
    def agg(df: DataFrame, p: String) =
      df.groupBy(col(sourceCol))
        .agg(count(lit(1)).as(s"${p}_docs"),
          sum(tokensCol).cast("long").as(s"${p}_tokens"))
    def only(a: DataFrame, b: DataFrame, name: String) =
      a.select(col(idCol), col(sourceCol))
        .join(b.select(col(idCol)), Seq(idCol), "left_anti")
        .groupBy(col(sourceCol)).agg(count(lit(1)).as(name))
    val zero = lit(0L)
    agg(old, "old").join(agg(cur, "new"), Seq(sourceCol), "full_outer")
      .join(only(cur, old, "added"), Seq(sourceCol), "left_outer")
      .join(only(old, cur, "removed"), Seq(sourceCol), "left_outer")
      .select(col(sourceCol),
        coalesce(col("old_docs"), zero).as("old_docs"),
        coalesce(col("new_docs"), zero).as("new_docs"),
        coalesce(col("added"), zero).as("added"),
        coalesce(col("removed"), zero).as("removed"),
        (coalesce(col("new_tokens"), zero) - coalesce(col("old_tokens"), zero))
          .as("token_delta"))
  }

  /** Per-source audit of a [[weightedMix]] pass: totals, kept counts, and
    * the realized rate (one aggregation over the mixed frame). */
  def mixAudit(mixed: DataFrame, sourceCol: String): DataFrame =
    mixed.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"))
      .select(col(sourceCol), col("n_total"), col("n_kept"),
        (col("n_kept").cast("double") / col("n_total").cast("double"))
          .as("realized_rate"))

  /**
   * Exact corpus-wide heavy hitters: top-k most frequent values of `expr`
   * with counts. GroupBy + TakeOrderedAndProject: the count is map-side
   * combined, and the top-k never sorts the full distinct set. For
   * cardinalities where even the distinct set is too large, the documented
   * scale path is count-min over a sample; this exact form is the oracle.
   */
  def heavyHitters(df: DataFrame, value: Column, k: Int): DataFrame =
    df.select(value.as("value"))
      .groupBy(col("value")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value"))
      .limit(k)

  // ── count-min sketch (the heavy-hitter scale path) ───────────────────────

  /** Bucket of `value` in sketch row `d`: xxhash64 (codegen'd, 64-bit) taken
    * positively modulo `width`. Deterministic across runs and partitionings —
    * the sketch is a pure function of the multiset of values. */
  private def cmBucket(value: Column, d: Int, width: Int, salt: String): Column =
    pmod(xxhash64(lit(s"$salt|$d"), value.cast("string")), lit(width.toLong)).cast("int")

  /**
   * Count-min sketch of a value stream: `depth × width` counters, one
   * DataFrame row per NON-EMPTY cell (`d`, `w`, `cnt`). Built in one scan —
   * each input row explodes to its `depth` cells, then a map-side-combined
   * groupBy folds them — so memory is O(depth·width) regardless of input
   * size or cardinality, and two sketches merge by unioning and re-summing
   * cells ([[cmMerge]]). Estimates are one-sided: min over a value's cells
   * never undercounts ([[cmEstimate]]).
   */
  def countMinSketch(df: DataFrame, value: Column,
                     depth: Int = 4, width: Int = 4096,
                     salt: String = "cm"): DataFrame = {
    val cells = array((0 until depth).map(d =>
      struct(lit(d).as("d"), cmBucket(value, d, width, salt).as("w"))): _*)
    df.select(explode(cells).as("cell"))
      .groupBy(col("cell.d").as("d"), col("cell.w").as("w"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches built with the same (depth, width, salt): cell-wise sum. */
  def cmMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ union _)
      .groupBy(col("d"), col("w")).agg(sum(col("cnt")).as("cnt"))

  /**
   * Point-estimate each candidate value against a sketch: min over its
   * `depth` cells. Candidates that truly occurred always have all their
   * cells present, so the inner join is lossless for them; a value the
   * sketch never saw may lose cells — treat absence as 0 by left join.
   */
  def cmEstimate(candidates: DataFrame, valueCol: String, sketch: DataFrame,
                 depth: Int = 4, width: Int = 4096,
                 salt: String = "cm"): DataFrame = {
    val cells = array((0 until depth).map(d =>
      struct(lit(d).as("d"), cmBucket(col(valueCol), d, width, salt).as("w"))): _*)
    candidates.select(col(valueCol), explode(cells).as("cell"))
      .select(col(valueCol), col("cell.d").as("d"), col("cell.w").as("w"))
      .join(sketch, Seq("d", "w"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /**
   * Heavy hitters at sketch scale: the architecture that replaces
   * [[heavyHitters]] when the distinct set itself is too large to group.
   * Three bounded passes, none of which materializes the full distinct set
   * with exact counts:
   *   1. candidates = distinct values of a deterministic row-sample
   *      (`rowKey`-hashed Bernoulli — frequent values are in the sample
   *      w.h.p., and re-runs pick the identical sample);
   *   2. estimate every candidate from the O(depth·width) sketch;
   *   3. keep the top-k by estimate, then one exact semi-join count pass
   *      over only those k values, so the OUTPUT counts are exact — the
   *      sketch decides *what* to count, never what to report.
   * Output (value, n), ordered n desc then value. Matches [[heavyHitters]]
   * exactly whenever the sample catches the head and sketch noise does not
   * reorder the top-k boundary — the exact form is the oracle. Candidate
   * recall needs `sampleRate` ≳ a-few / count(k-th hitter): the head of any
   * distribution worth sketching has counts far above 1/rate.
   */
  def cmTopK(df: DataFrame, rowKey: Column, value: Column, k: Int,
             depth: Int = 4, width: Int = 4096,
             sampleRate: Double = 0.1, salt: String = "cm"): DataFrame = {
    val vals = df.select(value.as("value"), rowKey.as("__rk"))
    val sketch = countMinSketch(vals, col("value"), depth, width, salt)
    val candidates = vals
      .filter(pmod(xxhash64(lit(s"$salt|sample"), col("__rk").cast("string")),
        lit(1000000L)) < (sampleRate * 1000000L).toLong)
      .select(col("value")).distinct()
    val selected = cmEstimate(candidates, "value", sketch, depth, width, salt)
      .orderBy(col("est").desc, col("value")).limit(k)
    vals.join(broadcast(selected.select(col("value"))), Seq("value"), "left_semi")
      .groupBy(col("value")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value"))
  }

  /**
   * Quantile binning (curriculum/quality tiers): ntile over a total order.
   * The ORDER BY includes the id as tiebreak so bin assignment is
   * deterministic — ntile over a non-total order would hash-differ run to
   * run. Single window over one range shuffle; at 100 TB prefer binning by
   * pre-computed approx quantile cutpoints (one pass + a broadcast) — this
   * exact form is the semantics pin and the oracle.
   */
  def quantileBins(df: DataFrame, idCol: String, score: Column, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(score.asc, col(idCol).asc)
    df.withColumn("bin", ntile(n).over(w))
  }

  /**
   * Per-source QUOTA sampling: keep exactly min(quota, |source|) rows per
   * source, chosen by portable hash order — the fixed-COUNT companion to
   * [[weightedMix]]'s fixed-RATE Bernoulli ("at most 1M docs per domain").
   * Deterministic and stable under corpus growth: a doc's hash never
   * changes, so adding new docs can only displace the largest-hash
   * survivors, never reshuffle the whole sample. Plans as rank ≤ k over a
   * per-source window, which Spark 4 executes with partial+final
   * WindowGroupLimit — each map task forwards at most `quota` rows per
   * source, so the shuffle carries O(sources · quota), not the corpus.
   */
  def quotaSample(df: DataFrame, idCol: String, sourceCol: String, quota: Int,
                  salt: String = "quota"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(md5(concat(lit(salt + "|"), col(idCol).cast("string"))).asc,
        col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= quota)
      .drop("__rk")
  }

  /**
   * Greedy per-group token-budget selection: within each group (source /
   * domain), take documents in `scoreCol`-descending order until the
   * cumulative `weightCol` (token count) would exceed `budget` — "fill
   * 1 B tokens per domain with the best documents first", the knapsack-ish
   * selection every pretraining mix does after quality scoring. A document
   * is kept iff the running total INCLUDING it fits the budget — i.e. the
   * selection is the maximal prefix of the per-group ranking whose total
   * fits (weights are non-negative, so the running sum is monotone; ties
   * break on id for determinism).
   *
   * One partitioned running-sum window per group — a single hash shuffle on
   * the group key, no global ordering anywhere, so group count x group size
   * scales the way groupBy does. Output: input columns + `cum_weight`.
   */
  def tokenBudget(df: DataFrame, idCol: String, groupCol: String,
                  weightCol: Column, scoreCol: Column, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(scoreCol.desc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("cum_weight", sum(weightCol).over(w))
      .filter(col("cum_weight") <= budget)
  }

  /**
   * Deterministic corpus shuffle: a distributed range-partitioned sort by
   * portable row hash — the "random but reproducible" global ordering a
   * training run wants for its data loader. Same salt → identical order on
   * any engine or cluster layout; rotate the salt per epoch.
   */
  /**
   * Source-interleaved training order: every row gets a deterministic
   * global position such that consecutive positions CYCLE through the
   * live sources — round 1 holds each source's first (shuffled) row in
   * source order, round 2 the second rows, and so on, sources dropping
   * out as they exhaust. The ordering a data loader wants so no training
   * batch sees a long single-source run (gradient batches stay
   * source-diverse without runtime shuffling).
   *
   * Scale shape: the whole position pipeline runs on a THREE-COLUMN
   * projection (id, source, __rn) — the within-source epoch number is one
   * window partitioned by source, and the GLOBAL position is pure
   * arithmetic, not a single-partition window: all rows of earlier rounds
   * precede this one (Σ_s min(cnt_s, rn−1)), plus this source's 1-based
   * rank among sources still alive in round rn — both terms from ONE
   * broadcast non-equi join against the per-source count frame (a
   * source-count-sized dimension, never the corpus). The payload joins
   * back by id at the end, so the full row (document text included)
   * crosses exactly ONE exchange instead of riding the window AND the
   * position groupBy as part of a wide grouping key (round-11 advisor
   * item). Requires `idCol` non-null and unique: a NULL id FAILS FAST at
   * execution (assert_true folded into the shuffle hash — zero extra
   * scan) rather than silently vanishing through the inner join-back,
   * and a duplicate id would silently multiply rows / corrupt positions
   * (detecting it needs a full groupBy-count pass, so it is a documented
   * contract, not a runtime check — run `dd_exact_groups` upstream if
   * unsure). Returns the input plus (__rn, pos); write sorted by pos for
   * the loader.
   */
  def interleaveBySource(df: DataFrame, idCol: String, sourceCol: String,
                         salt: String = "inter"): DataFrame = {
    // assert_true(id IS NOT NULL) returns NULL when passing; coalesce to ""
    // keeps the hash bytes identical to md5(salt|id) while making a NULL id
    // raise with a named error instead of dropping through the join-back
    val idGuard = coalesce(
      assert_true(col(idCol).isNotNull,
        lit(s"interleaveBySource requires non-null $idCol")).cast("string"),
      lit(""))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(concat(lit(salt + "|"), idGuard,
        col(idCol).cast("string"))).asc,
        col(idCol).asc)
    val rn = df.select(col(idCol), col(sourceCol))
      .withColumn("__rn", row_number().over(w))
    val counts = df.groupBy(col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("__cnt"))
    val pos = rn.join(broadcast(counts), lit(true))
      .groupBy(col(idCol), col(sourceCol), col("__rn"))
      .agg((sum(least(col("__cnt"), col("__rn") - 1)) +
        sum(when(col("__cnt") >= col("__rn") &&
          col("__src") <= col(sourceCol), 1).otherwise(0))).cast("long").as("pos"))
    df.join(pos.select(col(idCol), col("__rn"), col("pos")), Seq(idCol))
      .select(df.columns.map(col) :+ col("__rn") :+ col("pos"): _*)
  }

  def corpusShuffle(df: DataFrame, idCol: String, salt: String = "shuffle"): DataFrame =
    df.orderBy(md5(concat(lit(salt + "|"), col(idCol).cast("string"))).asc,
      col(idCol).asc)

  /**
   * First `k` positions of the deterministic [[corpusShuffle]] order, WITH
   * their 1-based position — "the head of this epoch's permutation" (the
   * sample a data-loader smoke test or a curriculum preview reads).
   *
   * Scale shape: selection is a global top-k on the hash key
   * (TakeOrderedAndProject — per-partition heaps of k, then a k-sized
   * merge), and position numbering runs as a bounded broadcast self-join
   * over the k survivors (pos = 1 + #rows strictly earlier; ≤k² pairs).
   * No single-partition WindowExec anywhere: at 100 TB every task forwards
   * at most k rows, and only k ever reach one place. Output: (idCol, pos).
   */
  def shuffleHead(df: DataFrame, idCol: String, k: Int,
                  salt: String = "shuffle"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val head = df
      .select(col(idCol),
        md5(concat(lit(salt + "|"), col(idCol).cast("string"))).as("__k"))
      .orderBy(col("__k").asc, col(idCol).asc)
      .limit(k)
    head
      .join(broadcast(head.select(col("__k").as("__pk"), col(idCol).as("__pid"))),
        col("__pk") < col("__k") ||
          (col("__pk") === col("__k") && col("__pid") < col(idCol)), "left")
      .groupBy(col(idCol), col("__k"))
      .agg((count(col("__pid")) + 1).cast("int").as("pos"))
      .drop("__k")
  }

  /**
   * Interior quantile cutpoints i/n (i = 1..n-1) of `score`: exact
   * interpolated percentiles (same semantics as DuckDB `quantile_cont`),
   * one aggregation pass, collected as n-1 doubles on the driver. At
   * 100 TB swap `percentile` for `percentile_approx` with a tight
   * accuracy — the shape (one pass, tiny driver result) is unchanged.
   */
  def percentileCutpoints(df: DataFrame, score: Column, n: Int): Seq[Double] = {
    require(n >= 2, s"need at least 2 bins, got $n")
    val pcts = array((1 until n).map(i => lit(i.toDouble / n)): _*)
    val row = df.agg(percentile(score.cast("double"), pcts).as("cuts")).head()
    require(!row.isNullAt(0),
      "percentileCutpoints: no non-null scores to compute cutpoints from")
    row.getSeq[Double](0)
  }

  /**
   * Bin by precomputed cutpoints: bin = 1 + #cutpoints strictly below the
   * score, as a pure scalar expression. This is [[quantileBins]]'s scale
   * path — no global window sort, no shuffle at all: the cutpoints ride
   * along as literals (broadcast by construction), so binning fuses into
   * whatever scan or stage produces the rows. Ties sit in the lower bin;
   * unlike ntile, bins need not be exactly equal-sized under ties.
   */
  def binByCutpoints(df: DataFrame, score: Column, cuts: Seq[Double]): DataFrame = {
    require(cuts == cuts.sorted, "cutpoints must be ascending")
    val bin = cuts.foldLeft(lit(1)) { (acc, c) =>
      acc + when(score.cast("double") > c, 1).otherwise(0)
    }
    df.withColumn("bin", bin)
  }

  /**
   * Token-budget sequence packing: assign every document a `pack_id` so
   * that concatenating docs in deterministic md5 order and cutting every
   * `budget` tokens yields the training sequences ("concat-and-chunk").
   * pack_id = floor(start_offset / budget) where start_offset is the
   * doc's position in the concatenated token stream — a doc straddling a
   * boundary belongs to the pack it starts in (overflow < its own
   * length); docs longer than the budget should be chunked upstream
   * ([[graft.expr.ChunkText]]).
   *
   * Scale design — the global running sum is TWO-PHASE, never a single
   * unpartitioned window:
   *  1. rows bucket by the first hex byte of their md5 order key, so
   *     bucket order IS key order (fixed-width lowercase hex);
   *  2. one tiny aggregate (≤256 rows) computes per-bucket totals, whose
   *     prefix sum runs as a bounded broadcast self-join (Σ of strictly
   *     earlier buckets — ≤256² pairs, no single-partition WindowExec
   *     anywhere in the plan) and broadcasts back;
   *  3. the per-row running sum windows WITHIN each bucket (distributed)
   *     and adds the bucket's broadcast base offset.
   * Output: (idCol, n_tokens, start_offset, pack_id).
   */
  def packSequences(df: DataFrame, idCol: String, nTokensCol: String,
                    budget: Long, buckets: Int = 256): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(buckets >= 1 && buckets <= 256, "buckets must be in [1, 256]")
    val hexChars = math.max(1, math.ceil(math.log(buckets.toDouble) / math.log(16)).toInt)
    val keyed = df.select(col(idCol),
      col(nTokensCol).cast("long").as("n_tokens"))
      .withColumn("__k", md5(col(idCol).cast("string")))
      .withColumn("__bkt", substring(col("__k"), 1, hexChars))
    val totals = keyed.groupBy(col("__bkt"))
      .agg(sum(col("n_tokens")).as("__bt"))
    val base = totals
      .join(broadcast(totals.select(col("__bkt").as("__pbkt"), col("__bt").as("__pbt"))),
        col("__pbkt") < col("__bkt"), "left")
      .groupBy(col("__bkt"))
      .agg(coalesce(sum(col("__pbt")), lit(0L)).as("__base"))
    keyed.join(broadcast(base), Seq("__bkt"))
      .withColumn("start_offset", col("__base") +
        sum(col("n_tokens")).over(Window.partitionBy(col("__bkt"))
          .orderBy(col("__k"), col(idCol))) - col("n_tokens"))
      .withColumn("pack_id",
        floor(col("start_offset") / lit(budget.toDouble)).cast("long"))
      .select(col(idCol), col("n_tokens"), col("start_offset"), col("pack_id"))
  }

  /**
   * Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
   * every row gets key = -ln(u) / w with u its deterministic md5-uniform,
   * and the k smallest keys are the sample. Inclusion probability is
   * proportional to weight, the draw is exact without-replacement
   * semantics, and — the scale property — selection is a global TOP-K
   * (TakeOrderedAndProject: per-partition heaps of k, then a k-sized
   * merge on the driver), never a full sort or a single-partition window.
   *
   * The key is rounded to 9 dp before comparison so the selected SET is
   * reproducible bit-for-bit on any engine computing the same md5 (the
   * DuckDB oracle recomputes it); ties break by id.
   *
   * u is clamped away from 0 (ln(0) = -inf) and from 1 (key 0 would make
   * zero-weight rows competitive); weights must be strictly positive.
   */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int,
                     salt: String = "wsample"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = greatest(hashUniform(col(idCol), salt), lit(1e-4))
    val key = round(-log(u) / weight.cast("double"), 9)
    df.withColumn("samp_key", key)
      .orderBy(col("samp_key").asc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Length-bucketed batch assignment for training: bin rows into
   * `nBuckets` length-quantile buckets (cutpoints from
   * [[percentileCutpoints]] — one aggregate, then a pure scalar
   * expression, NO global sort), deterministically shuffle within each
   * bucket (md5 order), and cut every `batchSize` rows into a batch.
   *
   * Batches then contain near-equal-length sequences, so per-batch padding
   * waste is bounded by the bucket's quantile spread instead of the
   * corpus-wide max length. The only shuffle is the per-bucket window —
   * partitioned by bucket, never corpus-global — and batch ids are
   * deterministic: same corpus + salt ⇒ same batches on any engine.
   * Output: (idCol, n_tokens, bucket, batch_id, pos_in_batch).
   */
  def lengthBatches(df: DataFrame, idCol: String, lenCol: Column,
                    nBuckets: Int, batchSize: Int,
                    salt: String = "batch"): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val cuts = percentileCutpoints(df, lenCol, nBuckets)
    val binned = binByCutpoints(
      df.select(col(idCol), lenCol.cast("long").as("n_tokens")),
      col("n_tokens"), cuts)
    val w = Window.partitionBy(col("bin"))
      .orderBy(md5(concat(lit(salt + "|"), col(idCol).cast("string"))).asc,
        col(idCol).asc)
    binned
      .withColumn("__rn", row_number().over(w) - 1)
      .select(col(idCol), col("n_tokens"), col("bin").as("bucket"),
        (col("bin").cast("long") * lit(1000000L) +
          (col("__rn") / batchSize).cast("long")).as("batch_id"),
        (col("__rn") % batchSize).cast("int").as("pos_in_batch"))
  }

  /** Hashed-n-gram features of DSIR: unigrams + bigrams of whitespace
    * tokens, md5-bucketed into `buckets` ids (portable: DuckDB replays
    * `CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) % buckets`).
    * One explode per corpus; one row per gram OCCURRENCE (multinomial
    * counts, not presence). */
  private def hashedGrams(df: DataFrame, idCol: String, textCol: String,
                          buckets: Int): DataFrame = {
    val t = graft.text.TextAnalysis.tokens(col(textCol))
    val bis = when(size(t) >= 2, transform(sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
      .otherwise(array().cast("array<string>"))
    graft.text.TextAnalysis.spreadIfUndersplit(
        df.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol), explode(concat(t, bis)).as("gram"))
      .select(col(idCol),
        (conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long")
          % buckets).as("bucket"))
  }

  /**
   * DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
   * arXiv:2302.03169): score every raw document by how much more likely
   * its hashed-n-gram bag is under a TARGET (in-domain) corpus than under
   * the raw corpus itself,
   *
   *   log w(x) = Σ_b count_b(x) · [ln p̂_t(b) − ln p̂_r(b)]
   *
   * with add-`alpha` smoothed multinomials over `buckets` hashed features
   * (unigrams + bigrams). Output: (idCol, n_grams, log_w), log_w rounded
   * to 6 dp — documents with zero tokens are absent (no feature mass).
   *
   * Scale shape — the reason hashed DSIR works at 100 TB where an LM
   * scorer doesn't: each corpus is exploded ONCE. The raw side's
   * (doc, bucket, n) aggregate is checkpointed (MEMORY_AND_DISK RDD
   * blocks, ContextCleaner-released) because it feeds THREE consumers
   * (raw marginal, its total, the final per-doc sum) whose grouping keys
   * differ — exchange reuse cannot dedup them (measured: without the
   * materialization the raw corpus is tokenized 3× and
   * the target 2×, 5 scans per query). It is at most one row per
   * (doc, distinct bucket) — min(tokens, buckets) per doc, far below
   * token count — and spills to disk if the corpus outruns memory. The
   * target's marginal is persisted AFTER its ≤`buckets`-row aggregate
   * (KiB-sized). Both distribution estimates collapse to ≤`buckets`
   * rows, the per-bucket log-ratio table broadcasts (≤`buckets` rows
   * regardless of corpus size), and only the FINAL per-doc sum is
   * rounded (6 dp): a
   * pre-rounded λ would make the sum an exact multiple of the grid and
   * park it ON the half-way rounding boundary (measured: 4/500 docs
   * flipped at 1e-6 with an 8 dp λ), while raw doubles differ across
   * engines by ≤1 ulp per ln and never straddle the boundary.
   */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, idCol: String,
                     textCol: String, buckets: Int = 4096,
                     alpha: Double = 1.0): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    // RDD-storage checkpoint, not .persist(): same MEMORY_AND_DISK blocks
    // and the same single-tokenize guarantee, but the blocks are owned by
    // the RDD and auto-released by the ContextCleaner once the returned
    // frame is garbage — a .persist() here is a CacheManager entry nothing
    // ever drops, accumulating across invocations in a long session
    // (round-13 advisor item).
    val rawDB = hashedGrams(raw, idCol, textCol, buckets)
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val rc = rawDB.groupBy(col("bucket")).agg(sum(col("n")).as("rc"))
    val tc = hashedGrams(target, idCol, textCol, buckets)
      .groupBy(col("bucket")).agg(count(lit(1)).as("tc"))
      .localCheckpoint()
    val rTot = rc.agg(sum(col("rc")).as("rt"))
    val tTot = tc.agg(sum(col("tc")).as("tt"))
    val aB = lit(alpha * buckets)
    val lam = rc.join(tc, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(rTot)).crossJoin(broadcast(tTot))
      .select(col("bucket"),
        (log((coalesce(col("tc"), lit(0L)) + alpha) / (col("tt") + aB))
          - log((coalesce(col("rc"), lit(0L)) + alpha) / (col("rt") + aB)))
          .as("lam"))
    rawDB.join(broadcast(lam), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_grams"),
        round(sum(col("n") * col("lam")), 6).as("log_w"))
  }

  /**
   * DSIR selection: Gumbel-top-k over [[dsirLogWeights]] — adding i.i.d.
   * Gumbel(0,1) noise to log-weights and taking the top k draws an exact
   * without-replacement sample with inclusion ∝ softmax(log w), the
   * paper's resampling step. The Gumbel is DETERMINISTIC per row
   * (−ln(−ln u) with u the portable md5-uniform nudged off 0/1 by +0.5 on
   * the 1e-4 grid), so the selected set replays on any engine, and
   * selection is a global TOP-K (TakeOrderedAndProject — per-partition
   * heaps of k, no full sort). Ties break by id.
   */
  def dsirResample(raw: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, k: Int, buckets: Int = 4096,
                   alpha: Double = 1.0, salt: String = "dsir"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h = conv(substring(md5(concat(lit(salt + "|"),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long") % 10000
    val u = (h.cast("double") + 0.5) / 10000.0
    dsirLogWeights(raw, target, idCol, textCol, buckets, alpha)
      .withColumn("samp_key", round(col("log_w") - log(-log(u)), 6))
      .orderBy(col("samp_key").desc, col(idCol).asc)
      .limit(k)
  }
}
