package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed graph operators over edge-list DataFrames.
 *
 * The reference system is a graph store (conversation nodes linked by
 * NEXT/CONTAINS/result_links edges — neo4j_memory's data model), and its
 * traversal surface is point lookups plus short multi-hop walks. These
 * operators re-express that surface Spark-first: an edge list is just a
 * DataFrame, a hop is a join, and iterative algorithms follow the same
 * cache/materialize/unpersist discipline as [[graft.dedup.Dedup.connectedComponents]].
 *
 * Scale notes (100 TB lens):
 *  - Every round is ONE shuffle join on the frontier plus an anti-join on the
 *    visited set; there is no all-pairs step anywhere.
 *  - Frontiers are materialized per round (count) so convergence is a driver
 *    scalar, and previous rounds are unpersisted as soon as the next one is
 *    pinned — the BFS working set is one frontier + one visited set.
 *  - PageRank's dangling-node mass is a one-scalar aggregate per iteration
 *    (the standard treatment), not a broadcast of the rank vector.
 */
object Graph {

  /** Iterations the most recent [[pageRank]]/[[personalizedPageRank]] run
    * on this thread actually executed — lets tests pin that the
    * `earlyExitTol` path really stops early (the loop runs on the calling
    * thread, so a ThreadLocal is race-free under parallel suites). */
  private[graft] val lastIterations = new ThreadLocal[Integer]

  /**
   * Min-hop BFS: nodes reachable from `start` within `maxHops` directed hops.
   * Returns (node, hops) with hops = the minimum distance (start nodes at 0).
   * For an undirected walk, symmetrize the edge list first
   * (`edges.union(edges.select(dst, src))`).
   */
  def kHop(edges: DataFrame, srcCol: String, dstCol: String,
           start: DataFrame, startCol: String, maxHops: Int): DataFrame = {
    // pin the edge list once: the caller's edge expression is often itself a
    // join/distinct pipeline, and every hop joins against it — without the
    // cache each round re-executes the whole upstream build (at sf0.1 that
    // tripled g1's wall time)
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")).cache()
    var visited = start.select(col(startCol).as("node")).distinct()
      .withColumn("hops", lit(0)).cache()
    var visitedCount = visited.count()
    var frontier = visited
    var hop = 0
    var done = false
    while (hop < maxHops && !done) {
      hop += 1
      val next = frontier.join(e, frontier("node") === e("__src"))
        .select(col("__dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("hops", lit(hop))
        .cache()
      // ONE action per hop: counting the union materializes BOTH caches
      // (the union consumes `next`, populating its blocks for the next
      // round's frontier), and an unchanged count IS the emptiness test —
      // the separate isEmpty probe job was half of every hop's latency
      val nextVisited = visited.unionByName(next).cache()
      val newCount = nextVisited.count()
      done = newCount == visitedCount
      if (!done) {
        visited.unpersist(false)
        frontier.unpersist(false)
        visited = nextVisited
        visitedCount = newCount
        frontier = next
      } else {
        nextVisited.unpersist(false)
        next.unpersist(false)
      }
    }
    e.unpersist(false)
    // return over an RDD-storage checkpoint and drop the CacheManager
    // entry — a returned .cache() frame would pin executor memory for the
    // session's lifetime (round-13 advisor item, harmonicCentrality twin)
    val out = visited.localCheckpoint()
    visited.unpersist(false)
    out
  }

  /**
   * PageRank by power iteration: rank = (1-d)/n + d * (Σ in-contribs +
   * dangling-mass/n). Fixed `iters` rounds — rank deltas are double sums
   * whose partition order varies run to run, so a convergence epsilon would
   * be nondeterministic where a fixed iteration count is reproducible
   * (modulo last-bit float noise; see GraphSpec's tolerance pins).
   *
   * `roundPerIter = Some(dp)` rounds every iteration's ranks to dp
   * decimals: numerically immaterial at dp ≥ 9 (sub-ulp-noise scale) but
   * it pins the fixed point bit-for-bit across engines and partitionings,
   * which is what makes the DuckDB chained-CTE oracle possible.
   *
   * `earlyExitTol = Some(t)` stops once the L1 rank delta between rounds
   * is ≤ t (the delta rides the per-round dangling-mass aggregate — no
   * extra job, one extra node-sized join). With roundPerIter set, t = 0 is
   * the EXACT determinism-preserving choice: a zero delta at the pinned
   * precision is a true fixed point, so the early-exited ranks equal the
   * full fixed-iteration run's (GraphSpec pins this). Unrounded or t > 0
   * is the conventional approximate stop — nondeterministic at the float
   * margin, so keep it out of hash oracles.
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 10, damping: Double = 0.85,
               roundPerIter: Option[Int] = None,
               earlyExitTol: Option[Double] = None): DataFrame = {
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")).cache()
    // sink flag folded into the node frame ONCE: the per-round dangling
    // mass becomes a plain aggregate over the rank frame instead of a
    // per-round semi-join against a sink set (round-12: one fewer join in
    // every iteration's scalar job)
    val nodes = e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node"))).distinct()
    val nodeBase = nodes
      .join(e.select(col("__src").as("node")).distinct()
        .withColumn("__out", lit(true)), Seq("node"), "left")
      .select(col("node"), col("__out").isNull.as("__sink")).cache()
    val n = nodeBase.count().toDouble
    val outDeg = e.groupBy(col("__src").as("node")).agg(count(lit(1)).as("outdeg"))
    // out-degree is static — fold it into the edge list ONCE so each
    // iteration joins the rank vector against a single cached relation
    // instead of re-joining (edges ⋈ ranks ⋈ outDeg) every round. The cache
    // is hash-partitioned on the join key (__src), so the per-iteration join
    // shuffles only the rank side; at cluster scale the heavy edge relation
    // never moves again after this one repartition.
    val ew = e.join(outDeg.withColumnRenamed("node", "__src"), "__src")
      .select(col("__src"), col("__dst"), col("outdeg"))
      .repartition(e.sparkSession.sparkContext.defaultParallelism, col("__src")).cache()
    // Every round's rank frame is localCheckpoint'd (lineage truncated,
    // node-sized blocks) and MATERIALIZED by the round's own scalars
    // aggregate -- a full pass -- before its predecessor is unpersisted,
    // so the unpersist can never strand a successor whose cached blocks
    // would need the dropped frame to recompute (round-11 advisor item;
    // lazy variant round-18 -- one job per round instead of two, the
    // connectedComponents pattern). Spark still logs a cosmetic
    // "cannot be recomputed after unpersisting" WARN on each unpersist --
    // safe here precisely because nothing downstream references the frame.
    var ranks = nodeBase.withColumn("rank", lit(1.0 / n)).localCheckpoint(false)
    // One tiny scalar job per iteration over the freshly checkpointed
    // blocks reads the dangling mass — and, when `earlyExitTol` is set,
    // the L1 rank delta in the SAME aggregate. (Measured note: folding the
    // scalar into the plan as a broadcast 1-row aggregate was consistently
    // ~1.5-2x slower at sf0.1 — a BroadcastExchange per iteration costs
    // more than a tiny driver job.)
    def scalarsOf(r: DataFrame, withDelta: Boolean): (Double, Double) = {
      val aggs = sum(when(col("__sink"), col("rank"))).as("__dang") +:
        (if (withDelta) Seq(sum(abs(col("rank") - col("__prev"))).as("__delta"))
         else Seq.empty)
      val row = r.agg(aggs.head, aggs.tail: _*).head()
      def d(i: Int): Double = row.getAs[Any](i) match {
        case null => 0.0
        case v: Double => v
      }
      (d(0), if (withDelta) d(1) else Double.PositiveInfinity)
    }
    // With roundPerIter set, the dangling/n scalar is itself rounded to dp
    // BEFORE injection (mirrored in the SQL oracle): the dangling sum is an
    // unordered float reduction, and an unrounded scalar within ulp noise
    // of a 0.5e-dp boundary could flip a rank digit mid-iteration. Rounding
    // both sides pins the injected value; the residual risk (the scalar's
    // OWN rounding landing on a boundary) is ~2^-52/0.5e-dp per iteration.
    def injected(dang: Double): Double = {
      val raw = dang / n // NaN on an empty graph (n = 0) — plan stays valid
      roundPerIter.filter(_ => !raw.isNaN && !raw.isInfinite).fold(raw)(dp =>
        BigDecimal(raw).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val trackDelta = earlyExitTol.isDefined
    var dangling = scalarsOf(ranks, withDelta = false)._1
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      val contribs = ew.join(
          ranks.select(col("node").as("__src"), col("rank")), "__src")
        .select(col("__dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_mass"))
      val rawRank = lit((1.0 - damping) / n) +
        lit(damping) * (coalesce(col("in_mass"), lit(0.0)) + lit(injected(dangling)))
      val joined = nodeBase.join(contribs, Seq("node"), "left")
      val withPrev =
        if (trackDelta)
          joined.join(ranks.select(col("node"), col("rank").as("__prev")),
            Seq("node"))
        else joined
      val next0 = withPrev.select(
        Seq(col("node"), col("__sink"),
          roundPerIter.fold(rawRank)(dp => round(rawRank, dp)).as("rank")) ++
          (if (trackDelta) Seq(col("__prev")) else Seq.empty): _*)
      // LAZY checkpoint (round-18, the connectedComponents pattern): the
      // scalars aggregate below is a FULL pass over the frame, so it
      // materializes the checkpointed blocks itself -- one job per round
      // instead of an eager-materialize job plus the scalar job. The
      // predecessor is still only unpersisted AFTER that materialization.
      val next = next0.localCheckpoint(false)
      val (dang, delta) = scalarsOf(next, withDelta = trackDelta)
      dangling = dang
      ranks.unpersist(false)
      ranks = next
      // With roundPerIter pinning each stored rank, delta == 0 is an EXACT
      // fixed point: every further iteration reproduces the same frame, so
      // earlyExitTol = Some(0.0) returns results identical to the full
      // fixed-iteration run (the property GraphSpec pins). Positive tol is
      // the conventional approximate stop — results then differ from the
      // fixed-iteration run and no hash oracle should wrap it.
      converged = earlyExitTol.exists(delta <= _)
      i += 1
    }
    lastIterations.set(i)
    ew.unpersist(false)
    nodeBase.unpersist(false)
    e.unpersist(false)
    ranks.select(col("node"), col("rank"))
  }

  /**
   * Exact triangle count on an undirected graph. Edges are canonicalized to
   * a < b, then the classic two-join enumeration (a<b<c) counts each
   * triangle exactly once. At scale the joins shuffle on node id; the
   * canonical orientation halves the edge set and kills 2-cycles.
   */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val e1 = und.select(col("a").as("x"), col("b").as("y"))
    val e2 = und.select(col("a").as("y"), col("b").as("z"))
    val e3 = und.select(col("a").as("x"), col("b").as("z"))
    e1.join(e2, "y").join(e3, Seq("x", "z"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /**
   * Personalized PageRank (Jeh/Widom 2003's topic-sensitive variant of
   * the power iteration): teleport mass — the (1−d) restart AND the
   * dangling-node mass — returns to the RESTART SET instead of spreading
   * uniformly, so ranks measure proximity to the set. rank =
   * (1−d)·s(v) + d·(Σ in-contribs + dangling·s(v)), with s(v) = 1/|S| on
   * the restart set, 0 elsewhere; init rank = s.
   *
   * Same scale discipline as [[pageRank]]: the out-degree-annotated edge
   * list is cached hash-partitioned once, each iteration is one join +
   * one grouped sum, the dangling mass is a driver scalar, and
   * `roundPerIter` pins the fixed point for the cross-engine oracle.
   * Nodes unreachable from the restart set legitimately settle at 0.
   */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           sources: DataFrame, sourceCol: String,
                           iters: Int = 10, damping: Double = 0.85,
                           roundPerIter: Option[Int] = None,
                           earlyExitTol: Option[Double] = None): DataFrame = {
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")).cache()
    val nodes = e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node"))).distinct()
    val src = sources.select(col(sourceCol).as("node")).distinct()
    val nS = src.count().toDouble
    require(nS > 0, "personalizedPageRank needs a non-empty restart set")
    // teleport weight AND sink flag as columns on the node frame: 1/|S| on
    // the restart set, 0 elsewhere — computed once; the sink flag makes
    // the per-round dangling mass a plain aggregate (see [[pageRank]])
    val tn = nodes
      .join(src.withColumn("__s", lit(1.0 / nS)), Seq("node"), "left")
      .join(e.select(col("__src").as("node")).distinct()
        .withColumn("__out", lit(true)), Seq("node"), "left")
      .select(col("node"), coalesce(col("__s"), lit(0.0)).as("tele"),
        col("__out").isNull.as("__sink")).cache()
    val outDeg = e.groupBy(col("__src").as("node")).agg(count(lit(1)).as("outdeg"))
    val ew = e.join(outDeg.withColumnRenamed("node", "__src"), "__src")
      .select(col("__src"), col("__dst"), col("outdeg"))
      .repartition(e.sparkSession.sparkContext.defaultParallelism, col("__src")).cache()
    // per-round localCheckpoint, lazily materialized by the round's own
    // scalars pass before the predecessor unpersists — see [[pageRank]]
    var ranks = tn.select(col("node"), col("tele"), col("__sink"),
      col("tele").as("rank")).localCheckpoint(false)
    def scalarsOf(r: DataFrame, withDelta: Boolean): (Double, Double) = {
      val aggs = sum(when(col("__sink"), col("rank"))).as("__dang") +:
        (if (withDelta) Seq(sum(abs(col("rank") - col("__prev"))).as("__delta"))
         else Seq.empty)
      val row = r.agg(aggs.head, aggs.tail: _*).head()
      def d(i: Int): Double = row.getAs[Any](i) match {
        case null => 0.0
        case v: Double => v
      }
      (d(0), if (withDelta) d(1) else Double.PositiveInfinity)
    }
    def injected(dang: Double): Double =
      roundPerIter.filter(_ => !dang.isNaN && !dang.isInfinite).fold(dang)(dp =>
        BigDecimal(dang).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val trackDelta = earlyExitTol.isDefined
    var dangling = scalarsOf(ranks, withDelta = false)._1
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      val contribs = ew.join(
          ranks.select(col("node").as("__src"), col("rank")), "__src")
        .select(col("__dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_mass"))
      val rawRank = lit(1.0 - damping) * col("tele") +
        lit(damping) * (coalesce(col("in_mass"), lit(0.0)) +
          lit(injected(dangling)) * col("tele"))
      val joined = tn.join(contribs, Seq("node"), "left")
      val withPrev =
        if (trackDelta)
          joined.join(ranks.select(col("node"), col("rank").as("__prev")),
            Seq("node"))
        else joined
      val next0 = withPrev.select(
        Seq(col("node"), col("tele"), col("__sink"),
          roundPerIter.fold(rawRank)(dp => round(rawRank, dp)).as("rank")) ++
          (if (trackDelta) Seq(col("__prev")) else Seq.empty): _*)
      // lazy checkpoint materialized by the scalars pass — see [[pageRank]]
      val next = next0.localCheckpoint(false)
      val (dang, delta) = scalarsOf(next, withDelta = trackDelta)
      dangling = dang
      ranks.unpersist(false)
      ranks = next
      // exact fixed-point exit under roundPerIter — see [[pageRank]]
      converged = earlyExitTol.exists(delta <= _)
      i += 1
    }
    lastIterations.set(i)
    val out = ranks.select(col("node"), col("rank"))
    ew.unpersist(false)
    tn.unpersist(false)
    e.unpersist(false)
    out
  }

  /**
   * Synchronous label propagation (Raghavan/Albert/Kumara 2007) for
   * community detection, run for at most `iters` rounds — with an EXACT
   * early exit the moment a round changes no label (the update is
   * deterministic, so a fixed point repeats forever; stopping there is
   * output-identical to running all remaining rounds) — and fully
   * deterministic semantics so the result is oracle-able: every node
   * simultaneously adopts the most frequent label among its undirected
   * neighbors, ties broken toward the SMALLEST label; labels start as the
   * node's own id. (Classic LPA randomizes update order and tie-breaks —
   * that converges faster but is irreproducible; the synchronous
   * deterministic variant is what a lineage-audited pipeline wants.)
   *
   * Scale shape: each round is ONE grouped count of (node, neighbor-label)
   * pairs over the edge list plus a WindowGroupLimit top-1 — per-round
   * cost is one shuffle of the edges and one of the node-sized label
   * frame, never quadratic. The label frame is eagerly localCheckpoint'd
   * per round (same lineage-truncation discipline as
   * [[graft.dedup.Dedup.connectedComponents]]).
   * Returns (node, label); a community is the set of nodes sharing a
   * label — the PARTITION is the output, not the label names: with
   * min-tie-breaking, label ids migrate across bridges (GraphSpec pins a
   * case where a clique settles on an imported id), so compare groups,
   * never expect label == community-minimum.
   */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    import org.apache.spark.sql.expressions.Window
    val und = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .filter(col("u") =!= col("v"))
      .distinct().cache()
    val nodes = und.select(col("u").as("node")).distinct().cache()
    var labels = nodes.select(col("node"), col("node").as("label"))
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      val nbr = und
        .join(labels.select(col("node").as("v"), col("label").as("nl")), "v")
        .groupBy(col("u").as("node"), col("nl"))
        .agg(count(lit(1)).as("__c"))
      val w = Window.partitionBy(col("node"))
        .orderBy(col("__c").desc, col("nl"))
      val top = nbr.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("node"), col("nl").as("label"))
      // every node in `und` has >= 1 neighbor, but keep the left-join so a
      // caller-provided degenerate edge list cannot silently drop nodes.
      // The __chg flag (did this node's label move?) rides the SAME
      // checkpointed frame, so the convergence test below scans cached
      // node-sized blocks instead of paying its own round.
      val prev = labels.select(col("node"), col("label").as("__pl"))
      val next = nodes.join(top, Seq("node"), "left")
        .join(prev, Seq("node"), "left")
        .select(col("node"), coalesce(col("label"), col("node")).as("label"),
          col("__pl"))
        .withColumn("__chg", !(col("label") <=> col("__pl")))
        .drop("__pl")
        .localCheckpoint()
      // EXACT early exit: synchronous LPA is deterministic, so a round
      // that changes no label fixes every later round — identical output
      // to running the remaining iterations (the oracle pins N rounds;
      // convergence before N yields the same frame).
      converged = next.filter(col("__chg")).limit(1).isEmpty
      labels = next.drop("__chg")
      i += 1
    }
    lastIterations.set(i)
    und.unpersist(false)
    nodes.unpersist(false)
    labels
  }

  /** Out-degree / in-degree / total per node — the profile that sizes skew
    * (a hot node is a skewed join key in every traversal).
    *
    * One pass: each edge explodes into its two (node, role) halves and a
    * single grouped sum folds both degrees — ONE scan of the edge frame,
    * ONE shuffle, no join. The former per-side-aggregate + full-outer
    * shape evaluated the edge lineage twice (at 100 TB that is two reads
    * of the edge table; on the bench backbone it recomputed the 5-way
    * lineitem join chain twice — the round-12 g4 watch item) and paid a
    * third exchange for the join; zero-fill now falls out of the sums. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges
      .select(explode(array(
        struct(col(srcCol).as("node"), lit(1L).as("o"), lit(0L).as("i")),
        struct(col(dstCol).as("node"), lit(0L).as("o"), lit(1L).as("i")))).as("x"))
      .select(col("x.node").as("node"), col("x.o").as("o"), col("x.i").as("i"))
      .groupBy(col("node"))
      .agg(sum(col("o")).as("out_deg"), sum(col("i")).as("in_deg"),
        count(lit(1)).as("degree"))

  /**
   * Link prediction over the undirected graph: for every NON-adjacent
   * pair (u, v) sharing at least `minCommon` neighbors, the three
   * classic scores — common-neighbor count, Adamic–Adar
   * (Σ_{w ∈ N(u)∩N(v)} 1/ln deg(w); Adamic & Adar 2003), and Jaccard
   * (|N(u)∩N(v)| / |N(u)∪N(v)|) — the "related entities you are not yet
   * linked to" primitive of recommendation and knowledge-graph
   * completion.
   *
   * Scale shape: candidate pairs are generated ONLY through a shared
   * neighbor (adjacency self-joined on the neighbor id, u < v) — never
   * an all-pairs product. Each neighbor w contributes deg(w)² pairs, so
   * super-hubs are excluded by `maxDegree` BEFORE the self-join (the
   * standard cap: a w with deg > maxDegree contributes ≈ nothing to
   * Adamic–Adar anyway — 1/ln deg — while costing deg² shuffle rows; at
   * corpus scale this is the difference between |E|·d̄ and |E|·d_max
   * join output). One shuffle keys the self-join on w, one groupBy on
   * (u, v) folds the scores map-side, and the already-linked filter is a
   * LeftAnti against the canonical edge set. deg(w) ≥ 2 for any common
   * neighbor, so the 1/ln term never divides by zero.
   */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
                     maxDegree: Int = 10000, minCommon: Long = 1): DataFrame = {
    // the canonical edge set feeds SIX downstream consumers (adjacency ×2,
    // degree ×3 through adj, the LeftAnti) — eagerly localCheckpoint it so
    // the caller's edge lineage (often a multi-join chain) runs ONCE and
    // every consumer reads edge-sized blocks (the pageRank/CC discipline;
    // blocks are reclaimed by the context cleaner when the frame is
    // unreachable)
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val adj = und.select(col("a").as("node"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("node"), col("a").as("nbr")))
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val capped = adj.select(col("nbr").as("w"), col("node").as("u"))
      .join(deg.select(col("node").as("w"), col("deg")), "w")
      .filter(col("deg") <= maxDegree)
    val pairs = capped
      .join(capped.select(col("w"), col("u").as("v")), "w")
      .filter(col("u") < col("v"))
    val scored = pairs.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common"),
        sum(lit(1.0) / log(col("deg"))).as("aa"))
      .filter(col("common") >= minCommon)
    scored
      .join(und.select(col("a").as("u"), col("b").as("v")),
        Seq("u", "v"), "left_anti")
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(col("u"), col("v"), col("common"),
        round(col("aa"), 6).as("adamic_adar"),
        round(col("common").cast("double") /
          (col("du") + col("dv") - col("common")), 6).as("jaccard"))
  }

  /**
   * K-CORE decomposition by parallel peeling: repeatedly delete every
   * node whose degree in the SURVIVING subgraph is < k until a fixpoint —
   * what remains is the (unique, maximal) k-core. Returns (node,
   * core_degree) where core_degree is the node's degree INSIDE the core
   * subgraph (≥ k by construction); nodes outside the core are absent.
   *
   * The dense-cohesion primitive the curation stack wants for "find the
   * tightly-interlinked cluster" (spam rings, boilerplate families,
   * citation cores). Per round: one degree aggregation + two semi-joins,
   * all keyed on the node — no all-pairs anywhere, and the edge set only
   * SHRINKS, so every round is cheaper than the last. Rounds = parallel
   * peel depth (bounded by the graph's degeneracy peel sequence; small in
   * practice — each round removes EVERY currently-underweight node, not
   * one). Per-round localCheckpoint truncates lineage; the fixpoint test
   * rides the same count() that sizes the next round's edge set — one
   * scalar action per round, the PageRank/CC discipline.
   */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k-core needs k >= 1, got $k")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("node"))
        .unionByName(e.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    var cur = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    var n = cur.count()
    var done = n == 0L
    while (!done) {
      val alive = degrees(cur).filter(col("deg") >= k)
      val next = cur
        .join(alive.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("node").as("b")), Seq("b"), "left_semi")
        .localCheckpoint()
      val m = next.count()
      done = m == n
      cur = next
      n = m
    }
    degrees(cur).select(col("node"), col("deg").as("core_degree"))
  }

  /**
   * Per-node triangle counts by DEGREE-RANK ORIENTATION (the
   * compact-forward / Latapy shape — the standard distributed triangle
   * algorithm, cf. Suri & Vassilvitskii's MR formulation): each
   * undirected edge is directed from its lower-(degree, node) endpoint to
   * the higher, wedges are generated only at a triangle's LOWEST-rank
   * apex, and a wedge closes iff its (v, w) pair is itself a directed
   * edge (one semi-join). Orientation bounds every node's out-degree by
   * O(√m) regardless of its true degree, so wedge volume is O(m^1.5)
   * TOTAL — a hub with degree d contributes nothing as an apex beyond
   * rank-ordered neighbors, where the naive neighbor self-join pays
   * Σ deg² and dies on the first celebrity node at corpus scale. Each
   * triangle is emitted exactly once and credited to all three corners.
   *
   * Returns (node, triangles, clustering) for every node of the
   * undirected graph (zero-triangle nodes included — the profile surface
   * wants them); `clustering` is the local clustering coefficient
   * 2T / (deg·(deg−1)), rounded 6dp for cross-engine replay, 0 for
   * degree-1 nodes.
   */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // one canonical edge set feeds degree, orientation, wedge join (×2),
    // the closing semi-join, and the zero-fill — checkpoint the caller's
    // lineage once (same discipline as linkPrediction)
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val adj = und.select(col("a").as("node"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("node"), col("a").as("nbr")))
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // rank = (deg, node): a total order, so orientation is acyclic and
    // every triangle has exactly one source-of-two-edges apex
    val ranked = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    val ra = struct(col("da").as("d"), col("a").as("n"))
    val rb = struct(col("db").as("d"), col("b").as("n"))
    val dir = ranked.select(
        when(ra < rb,
          struct(col("a").as("lo"), col("b").as("hi"), rb.as("hirnk")))
          .otherwise(
            struct(col("b").as("lo"), col("a").as("hi"), ra.as("hirnk"))).as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"), col("e.hirnk").as("hirnk"))
      .localCheckpoint()
    // wedges at the apex: (lo, v, w) with rank(v) < rank(w) — the only
    // shuffle keys on `lo`; hub apexes were already demoted by orientation
    val wedges = dir.select(col("lo"), col("hi").as("v"), col("hirnk").as("vrnk"))
      .join(dir.select(col("lo"), col("hi").as("w"), col("hirnk").as("wrnk")), "lo")
      .filter(col("vrnk") < col("wrnk"))
    val tri = wedges
      .join(dir.select(col("lo").as("v"), col("hi").as("w")),
        Seq("v", "w"), "left_semi")
      .select(col("lo").as("u"), col("v"), col("w"))
    val corners = tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    val t = coalesce(col("triangles"), lit(0L))
    deg.join(corners, Seq("node"), "left_outer")
      .select(col("node"), t.as("triangles"),
        // local clustering coefficient: closed wedges at the node over
        // possible wedges; degree-1 nodes have no wedges → 0 by convention
        when(col("deg") < 2, lit(0.0))
          .otherwise(round(t * 2.0 / (col("deg") * (col("deg") - 1)), 6))
          .as("clustering"))
  }

  /**
   * Harmonic centrality from a source sample (the Eppstein–Wang
   * estimator shape): H(v) = Σ over sources s ≠ v with d(s,v) < ∞ of
   * 1/d(s,v). All |S| BFS waves advance SIMULTANEOUSLY as one
   * (src, node, d) relation — one frontier→edge join and one anti-join
   * per round for the whole sample, never a per-source traversal, and
   * each round's frontier is exactly the newly reached (src, node)
   * pairs (their `d` is minimal by construction, BFS level order).
   * Edges are treated as undirected (the centrality convention).
   *
   * Scale shape: state is at most |S|·|V| pairs — the reason S is a
   * SAMPLE at 100 TB (error O(1/√|S|) for normalized centrality; pass
   * every node to make it exact on small graphs). Rounds stop at the
   * sample's eccentricity or `maxHops`, whichever is first, with the
   * kHop one-action-per-round discipline (the union count is both the
   * materialization and the emptiness test).
   *
   * `termDp = Some(dp)` quantizes each 1/d term to dp decimals and sums
   * in DECIMAL — numerically immaterial at dp ≥ 6 for hop counts, but
   * it makes the sum exact and order-independent, which is what lets a
   * cross-engine oracle hash-match (the [[pageRank]] roundPerIter move).
   */
  def harmonicCentrality(edges: DataFrame, srcCol: String, dstCol: String,
                         sources: DataFrame, sourceCol: String,
                         maxHops: Int, termDp: Option[Int] = None): DataFrame = {
    val e0 = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
    val e = e0.union(e0.select(col("__b").as("__a"), col("__a").as("__b")))
      .distinct().cache()
    var dist = sources.select(col(sourceCol).as("src")).distinct()
      .select(col("src"), col("src").as("node"), lit(0).as("d")).cache()
    var distCount = dist.count()
    var frontier = dist
    var hop = 0
    var done = false
    while (hop < maxHops && !done) {
      hop += 1
      val next = frontier.join(e, frontier("node") === e("__a"))
        .select(col("src"), col("__b").as("node")).distinct()
        .join(dist.select("src", "node"), Seq("src", "node"), "left_anti")
        .withColumn("d", lit(hop))
        .cache()
      val nextDist = dist.unionByName(next).cache()
      val newCount = nextDist.count()
      done = newCount == distCount
      if (!done) {
        dist.unpersist(false)
        frontier.unpersist(false)
        dist = nextDist
        distCount = newCount
        frontier = next
      } else {
        nextDist.unpersist(false)
        next.unpersist(false)
      }
    }
    e.unpersist(false)
    // hand the result back over an RDD-storage checkpoint (auto-cleaned
    // by the ContextCleaner when the frame is GC'd) and release the
    // CacheManager entry, which would otherwise outlive the call — the
    // long-session accumulation the round-13 advisor flagged
    val finalDist = dist.localCheckpoint()
    dist.unpersist(false)
    val term = termDp match {
      case Some(dp) => round(lit(1.0) / col("d"), dp).cast(s"decimal(18,$dp)")
      case None => lit(1.0) / col("d")
    }
    finalDist.filter(col("d") > 0)
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_reached"),
        sum(term).cast("double").as("harmonic"))
  }
}
