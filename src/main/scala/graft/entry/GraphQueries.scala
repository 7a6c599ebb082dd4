package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.GraftFunctions
import graft.model.Schemas
import graft.ops.Relational
import graft.rag.Rag
import graft.sources.TestData
import graft.streaming.Events
import graft.text.TextAnalysis

import graft.entry.Shared._

/** Query family split out of SparkEntry (round-12); see Shared. */
private[graft] object GraphQueries {

  def defs: Seq[(String, Q)] = Seq(

    // Personalized PageRank (round-11): teleport + dangling mass return to
    // the restart set, so ranks measure proximity to it — the
    // recommendation/related-entities primitive. Oracle unrolls the
    // iterations with the teleport column replacing the uniform term.
    "g6_personalized_pagerank" -> Q(
      (s, d) => {
        val sources = T(s, d, "nation")
          .filter(col("n_name").isin("NATION_0", "NATION_1"))
          .select(col("n_name"))
        graft.ops.Graph.personalizedPageRank(tradeEdges(s, d, 120), "a", "b",
            sources, "n_name", iters = 10, roundPerIter = Some(9),
            earlyExitTol = Some(0.0))
          .select(col("node"), round(col("rank"), 6).as("rank"))
          .orderBy(col("node"))
      },
      Some(pprOracleSql(120, Seq("NATION_0", "NATION_1"),
        iters = 10, damping = 0.85, dp = 9))),

    // Min-hop BFS over the (thinned) customer↔supplier bipartite graph —
    // the reference's multi-hop traversal surface. Oracle = bounded
    // recursive CTE with per-level dedup, min(hops) per node.
    "g1_khop_reachability" -> Q(
      (s, d) => {
        val e = T(s, d, "lineitem").filter(col("l_quantity") >= 49)
          .join(T(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c:"), col("o_custkey").cast("string")).as("src"),
            concat(lit("s:"), col("l_suppkey").cast("string")).as("dst"))
          .distinct()
        val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
        // start set comes from the table, not a literal — a foldable start
        // constant-propagates into the first hop and degrades it to a
        // nested-loop join (PlanAuditSpec pins the hash-join shape)
        val start = T(s, d, "customer").filter(col("c_custkey") === 0)
          .select(concat(lit("c:"), col("c_custkey").cast("string")).as("node"))
        graft.ops.Graph.kHop(sym, "src", "dst", start, "node", maxHops = 3)
          .orderBy(col("hops"), col("node"))
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT DISTINCT 'c:' || o_custkey AS src, 's:' || l_suppkey AS dst
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_quantity >= 49),
             |sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
             |walk AS (
             |  SELECT 'c:0' AS node, 0 AS hops
             |  UNION
             |  SELECT sym.dst, walk.hops + 1 FROM walk
             |  JOIN sym ON walk.node = sym.src WHERE walk.hops < 3)
             |SELECT node, CAST(min(hops) AS INT) AS hops
             |FROM walk GROUP BY 1 ORDER BY hops, node""".stripMargin)),

    // Link prediction (round-13): Adamic–Adar / common-neighbors /
    // Jaccard over NON-adjacent nation pairs of the trade backbone —
    // candidates generated only through shared neighbors (hub-capped
    // self-join, never all-pairs). Oracle replays the identical CTE
    // chain; both engines round the float sums at 6dp.
    // Edge rule is scale-RELATIVE (strictly above the average pair volume),
    // not a fixed lineitem floor: a fixed floor saturates the 25-node
    // backbone at larger SFs (every pair qualifies → no non-adjacent pairs
    // to predict). avg(bigint) is an exact integer sum over an exact count
    // in both engines, so the single-double comparison is portable. The
    // 1-row average joins in as a broadcast scalar (the x18 pattern), not
    // a window.
    "g7_link_prediction" -> Q(
      (s, d) => {
        val pairs = T(s, d, "lineitem")
          .join(broadcast(T(s, d, "supplier")
            .join(T(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
            .select(col("s_suppkey"), col("n_name").as("a"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(T(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(T(s, d, "customer")
            .join(T(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
            .select(col("c_custkey"), col("n_name").as("b"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
          .filter(col("a") =!= col("b"))
          // nation-pair-sized frame consumed twice (average + filter):
          // checkpoint so the lineitem join chain runs once
          .localCheckpoint()
        val edges = pairs
          .join(broadcast(pairs.agg(avg(col("n")).as("nbar"))), lit(true))
          .filter(col("n") > col("nbar"))
          .select(col("a"), col("b"))
        graft.ops.Graph.linkPrediction(edges, "a", "b")
          .orderBy(col("u"), col("v"))
      },
      Some(s"""WITH rawpairs AS (
              |  SELECT n1.n_name AS a, n2.n_name AS b, count(*) AS n
              |  FROM lineitem
              |  JOIN supplier ON l_suppkey = s_suppkey
              |  JOIN nation n1 ON supplier.s_nationkey = n1.n_nationkey
              |  JOIN orders ON l_orderkey = o_orderkey
              |  JOIN customer ON o_custkey = c_custkey
              |  JOIN nation n2 ON customer.c_nationkey = n2.n_nationkey
              |  GROUP BY 1, 2 HAVING n1.n_name <> n2.n_name),
              |edges AS (SELECT a, b FROM rawpairs
              |          WHERE n > (SELECT avg(n) FROM rawpairs)),
              |und AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
              |        FROM edges WHERE a <> b),
              |adj AS (SELECT a AS node, b AS nbr FROM und
              |        UNION ALL SELECT b, a FROM und),
              |deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY 1),
              |cap AS (SELECT adj.nbr AS w, adj.node AS u, deg.deg
              |        FROM adj JOIN deg ON adj.nbr = deg.node
              |        WHERE deg.deg <= 10000),
              |pairs AS (SELECT c1.u AS u, c2.u AS v, c1.deg
              |          FROM cap c1 JOIN cap c2 ON c1.w = c2.w
              |          WHERE c1.u < c2.u),
              |scored AS (SELECT u, v, count(*) AS common,
              |             sum(1.0 / ln(deg)) AS aa
              |           FROM pairs GROUP BY 1, 2 HAVING count(*) >= 1),
              |cand AS (SELECT * FROM scored s
              |         WHERE NOT EXISTS (SELECT 1 FROM und
              |                           WHERE s.u = und.a AND s.v = und.b))
              |SELECT u, v, CAST(common AS BIGINT) AS common,
              |  round(aa, 6) AS adamic_adar,
              |  round(CAST(common AS DOUBLE) / (du.deg + dv.deg - common), 6)
              |    AS jaccard
              |FROM cand JOIN deg du ON cand.u = du.node
              |          JOIN deg dv ON cand.v = dv.node
              |ORDER BY u, v""".stripMargin)),

    // Exact triangle count on the undirected trade backbone (canonical
    // a<b<c two-join enumeration — each triangle counted once)
    "g2_trade_triangles" -> Q(
      (s, d) => graft.ops.Graph.triangleCount(tradeEdges(s, d, 120), "a", "b"),
      Some(s"""WITH ${tradeEdgeSql(120)},
              |und AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
              |        FROM edges WHERE a <> b)
              |SELECT count(*) AS n_triangles
              |FROM und e1 JOIN und e2 ON e1.b = e2.a
              |WHERE EXISTS (SELECT 1 FROM und e3
              |              WHERE e3.a = e1.a AND e3.b = e2.b)""".stripMargin)),

    // K-core decomposition (round-13): parallel peel to fixpoint. The
    // oracle unrolls the peel as chained CTEs — on a ≤25-node graph every
    // non-fixpoint round removes ≥1 node, so 25 unrolled rounds provably
    // REACH the fixpoint and further rounds are no-ops; Spark runs the
    // true fixpoint loop. Cascade matters: the sf0.01 backbone has degrees
    // 3..24 and the k=8 peel removes six nodes in waves as removals expose
    // new light nodes (k=10 would cascade all the way to empty).
    // Harmonic centrality (round-13): all |V| BFS waves advance as one
    // (src, node, d) relation — sources = every trade-graph node, so the
    // estimator is exact here; the sampling knob is the 100 TB path.
    // Oracle unrolls 6 min-plus BFS levels (trade graph diameter < 6)
    // with the 1/d terms quantized to 6dp and summed in DECIMAL.
    "g10_harmonic" -> Q(
      (s, d) => {
        // pin the 5-way edge build once: it feeds BOTH the source-node
        // census and the BFS edge relation (same move as g7)
        val e = tradeEdges(s, d, 120).localCheckpoint()
        val nodes = e.select(col("a").as("n"))
          .union(e.select(col("b").as("n"))).distinct()
        graft.ops.Graph.harmonicCentrality(e, "a", "b", nodes, "n",
            maxHops = 6, termDp = Some(6))
          .orderBy(col("node"))
      },
      Some(harmonicOracleSql(120, rounds = 6))),

    "g9_kcore" -> Q(
      (s, d) => graft.ops.Graph.kCore(tradeEdges(s, d, 120), "a", "b", 8)
        .orderBy(col("node")),
      Some(kcoreOracleSql(120, k = 8, rounds = 25))),

    // Per-node triangle counts + local clustering coefficient (round-13):
    // degree-rank orientation bounds wedge generation at O(m^1.5) where
    // g2's canonical a<b apex pays the hub's full Σ deg². Oracle
    // enumerates each triangle once (a<b<c) and credits all three
    // corners; both engines round clustering at 6dp.
    "g8_triangle_counts" -> Q(
      (s, d) => graft.ops.Graph.triangleCounts(tradeEdges(s, d, 120), "a", "b")
        .orderBy(col("node")),
      Some(s"""WITH ${tradeEdgeSql(120)},
              |und AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
              |        FROM edges WHERE a <> b),
              |deg AS (SELECT node, count(*) AS deg FROM
              |        (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
              |        GROUP BY 1),
              |tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
              |        FROM und e1 JOIN und e2 ON e1.a = e2.a AND e1.b < e2.b
              |        JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
              |corners AS (SELECT u AS node FROM tri
              |            UNION ALL SELECT v FROM tri
              |            UNION ALL SELECT w FROM tri)
              |SELECT deg.node AS node, count(corners.node) AS triangles,
              |  CASE WHEN deg.deg < 2 THEN 0.0
              |       ELSE round(count(corners.node) * 2.0
              |                  / (deg.deg * (deg.deg - 1)), 6)
              |  END AS clustering
              |FROM deg LEFT JOIN corners ON deg.node = corners.node
              |GROUP BY deg.node, deg.deg
              |ORDER BY deg.node""".stripMargin)),

    // PageRank on the directed trade backbone — double mass sums are
    // partition-order dependent, so no bit-exact SQL twin exists; the
    // analytic/power-iteration pins live in GraphSpec (rows-only here)
    // per-iteration 1e-9 rounding (numerically immaterial, sub-noise-scale)
    // pins the power iteration bit-for-bit across engines → a real hash
    // oracle instead of rows-only; GraphSpec pins the unrounded default
    "g3_pagerank" -> Q(
      (s, d) => graft.ops.Graph.pageRank(tradeEdges(s, d, 120), "a", "b",
          iters = 10, roundPerIter = Some(9), earlyExitTol = Some(0.0))
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy(col("node")),
      Some(pageRankOracleSql(120, iters = 10, damping = 0.85, dp = 9))),

    // Synchronous label-propagation communities (round-11): 3 fixed
    // rounds, most-frequent-neighbor label with smallest-label ties —
    // fully deterministic, so the oracle unrolls the iterations as
    // chained CTEs (the g3_pagerank pattern)
    "g5_label_prop" -> Q(
      (s, d) => graft.ops.Graph.labelPropagation(tradeEdges(s, d, 120),
          "a", "b", iters = 3)
        .orderBy(col("node")),
      Some {
        val rounds = (1 to 3).map { i =>
          s"""r$i AS (SELECT und.u AS node, l${i - 1}.label AS nl, count(*) AS c
             |  FROM und JOIN l${i - 1} ON und.v = l${i - 1}.node GROUP BY 1, 2),
             |l$i AS (SELECT node, nl AS label FROM (
             |  SELECT node, nl, row_number() OVER (
             |    PARTITION BY node ORDER BY c DESC, nl) AS rn FROM r$i) t
             |  WHERE rn = 1)""".stripMargin
        }.mkString(",\n")
        s"""WITH ${tradeEdgeSql(120)},
           |und AS (SELECT a AS u, b AS v FROM edges WHERE a <> b
           |        UNION SELECT b, a FROM edges WHERE a <> b),
           |l0 AS (SELECT DISTINCT u AS node, u AS label FROM und),
           |$rounds
           |SELECT node, label FROM l3 ORDER BY node""".stripMargin
      }),

    // Degree profile of the trade backbone (out/in/total per node) — the
    // skew census every traversal planner needs
    "g4_degrees" -> Q(
      (s, d) => graft.ops.Graph.degrees(tradeEdges(s, d, 120), "a", "b")
        .orderBy(col("node")),
      Some(s"""WITH ${tradeEdgeSql(120)},
              |o AS (SELECT a AS node, count(*) AS out_deg FROM edges GROUP BY 1),
              |i AS (SELECT b AS node, count(*) AS in_deg FROM edges GROUP BY 1)
              |SELECT node,
              |  CAST(coalesce(out_deg, 0) AS BIGINT) AS out_deg,
              |  CAST(coalesce(in_deg, 0) AS BIGINT) AS in_deg,
              |  CAST(coalesce(out_deg, 0) + coalesce(in_deg, 0) AS BIGINT) AS degree
              |FROM o FULL OUTER JOIN i USING (node)
              |ORDER BY node""".stripMargin))
  )
}
