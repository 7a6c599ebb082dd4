package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Graph operator invariants: BFS min-hops, PageRank (analytic + local
  * power-iteration parity), triangle enumeration, degree census. */
class GraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def edges(pairs: (String, String)*) =
    pairs.toDF("src", "dst")

  test("kHop: min-hop distances on a path graph, early-stop past the frontier") {
    // a -> b -> c -> d, plus a shortcut a -> c: c is at hop 1, not 2
    val e = edges("a" -> "b", "b" -> "c", "c" -> "d", "a" -> "c")
    val start = Seq("a").toDF("node")
    val r = Graph.kHop(e, "src", "dst", start, "node", maxHops = 5)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(r == Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 2))
  }

  test("kHop: maxHops bounds the walk; unreachable nodes are absent") {
    val e = edges("a" -> "b", "b" -> "c", "x" -> "y")
    val r = Graph.kHop(e, "src", "dst", Seq("a").toDF("node"), "node", maxHops = 1)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(r == Map("a" -> 0, "b" -> 1)) // c beyond bound; x/y unreachable
  }

  test("pageRank: ranks sum to ~1 and match the star graph's analytic fixpoint") {
    // star: three leaves all pointing at the hub (the hub is dangling, so
    // its mass redistributes uniformly). Fixpoint: L = (1-d)/4 + dH/4 with
    // H = 1 - 3L  =>  L = 1/(4 + 3d), H = 1 - 3L. Error contracts by
    // (3d/4)^k, so 60 iterations pins ~1e-12.
    val d = 0.85
    val e = edges("l1" -> "hub", "l2" -> "hub", "l3" -> "hub")
    val r = Graph.pageRank(e, "src", "dst", iters = 60, damping = d)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val leaf = 1.0 / (4 + 3 * d)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(math.abs(r("l1") - leaf) < 1e-9)
    assert(math.abs(r("l2") - r("l3")) < 1e-12)
    assert(math.abs(r("hub") - (1 - 3 * leaf)) < 1e-9)
  }

  test("pageRank: matches a driver-side power iteration on a small digraph") {
    val pairs = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c", "d" -> "a")
    val iters = 12
    val d = 0.85
    // plain-Scala reference power iteration (same dangling treatment)
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val n = nodes.size
    val out = pairs.groupBy(_._1).view.mapValues(_.size).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val dangling = nodes.filterNot(out.contains).map(rank).sum
      val contribs = pairs.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / out(s) }.sum).toMap
      rank = nodes.map(v =>
        v -> ((1 - d) / n + d * (contribs.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    val got = Graph.pageRank(edges(pairs: _*), "src", "dst", iters = iters, damping = d)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    nodes.foreach(v => assert(math.abs(got(v) - rank(v)) < 1e-9, s"node $v"))
  }

  test("triangleCount: counts each triangle once, ignores direction and 2-cycles") {
    // triangle a-b-c (mixed directions, one edge duplicated both ways),
    // plus a dangling edge and a 2-cycle d<->e
    val e = edges("a" -> "b", "b" -> "c", "c" -> "a", "b" -> "a",
      "d" -> "e", "e" -> "d", "c" -> "d")
    val n = Graph.triangleCount(e, "src", "dst").head().getLong(0)
    assert(n == 1L)
  }

  test("triangleCount: two triangles sharing an edge") {
    val e = edges("a" -> "b", "b" -> "c", "a" -> "c", "b" -> "d", "c" -> "d")
    assert(Graph.triangleCount(e, "src", "dst").head().getLong(0) == 2L)
  }

  test("personalizedPageRank: mass concentrates near the restart set, unreachable nodes get zero") {
    // component 1: s -> m -> t (reachable from restart {s});
    // component 2: x <-> y (unreachable from s)
    val e = edges("s" -> "m", "m" -> "t", "x" -> "y", "y" -> "x")
    val src = Seq("s").toDF("node")
    val r = Graph.personalizedPageRank(e, "src", "dst", src, "node", iters = 20)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("x") == 0.0 && r("y") == 0.0, s"unreachable must be 0, got $r")
    assert(r("s") > r("m") && r("m") > r("t"),
      s"rank must decay with distance from the restart set, got $r")
    // t is a sink: its mass teleports back to s, never leaks to x/y
    assert(r("s") + r("m") + r("t") > 0.99, s"mass must stay in the component, got $r")
    // uniform pageRank on the same graph gives x/y NON-zero — the
    // personalization is what zeroes them
    val uni = Graph.pageRank(e, "src", "dst", iters = 20)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(uni("x") > 0.0)
  }

  test("pageRank/personalizedPageRank: earlyExitTol=0 under pinned rounding stops early, ranks identical to the fixed run") {
    // 4-cycle: uniform ranks are the fixed point from round 1, so the
    // zero-delta exit fires almost immediately at dp=6
    val cyc = Seq((1, 2), (2, 3), (3, 4), (4, 1)).toDF("s", "d")
    val fixed = Graph.pageRank(cyc, "s", "d", iters = 40, roundPerIter = Some(6))
      .orderBy("node").as[(Int, Double)].collect().toSeq
    val early = Graph.pageRank(cyc, "s", "d", iters = 40, roundPerIter = Some(6),
        earlyExitTol = Some(0.0))
      .orderBy("node").as[(Int, Double)].collect().toSeq
    val ranRounds = Graph.lastIterations.get().intValue
    assert(early == fixed, "early-exited ranks must equal the fixed-iteration run")
    assert(ranRounds < 40, s"expected an early exit on the cycle, ran $ranRounds rounds")
    // personalized variant: damping 0.5 contracts geometrically, so the
    // dp=6 fixed point lands well inside 40 rounds
    val src = Seq(Tuple1(1)).toDF("n")
    val fixedP = Graph.personalizedPageRank(cyc, "s", "d", src, "n",
        iters = 40, damping = 0.5, roundPerIter = Some(6))
      .orderBy("node").as[(Int, Double)].collect().toSeq
    val earlyP = Graph.personalizedPageRank(cyc, "s", "d", src, "n",
        iters = 40, damping = 0.5, roundPerIter = Some(6),
        earlyExitTol = Some(0.0))
      .orderBy("node").as[(Int, Double)].collect().toSeq
    val ranP = Graph.lastIterations.get().intValue
    assert(earlyP == fixedP)
    assert(ranP < 40, s"expected an early exit for PPR, ran $ranP rounds")
  }

  test("labelPropagation: two cliques joined by a bridge settle into two communities") {
    // clique {a1,a2,a3}, clique {z1,z2,z3}, one bridge a3–z1. Round 1:
    // every node adopts its smallest neighbor; within a few synchronous
    // rounds each clique agrees on its own minimum and the bridge does not
    // merge them (z1 has two z-clique neighbors vs one a-side neighbor).
    val e = edges(
      "a1" -> "a2", "a1" -> "a3", "a2" -> "a3",
      "z1" -> "z2", "z1" -> "z3", "z2" -> "z3",
      "a3" -> "z1")
    val r = Graph.labelPropagation(e, "src", "dst", iters = 4)
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    // communities are the label PARTITION, not the label's name: with
    // min-tie-breaking, label ids migrate (here the z-clique settles on
    // the imported "a3" id) — what must hold is that each clique agrees
    // internally and the bridge does not merge them
    val aLabels = Set("a1", "a2", "a3").map(r)
    val zLabels = Set("z1", "z2", "z3").map(r)
    assert(aLabels.size == 1, s"a-clique must agree on one label, got $r")
    assert(zLabels.size == 1, s"z-clique must agree on one label, got $r")
    assert(aLabels != zLabels, s"bridge must not merge the cliques, got $r")
    // deterministic: identical reruns produce identical labelings
    val r2 = Graph.labelPropagation(e, "src", "dst", iters = 4)
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(r == r2)
  }

  test("labelPropagation: exact early exit — a fixed point stops the loop, output identical") {
    // two disjoint triangles converge in 2 rounds (round 1 reaches the
    // minimum everywhere, round 2 changes nothing); iters=25 must stop
    // right there and return the same frame the full run would
    val e = edges(
      "a1" -> "a2", "a1" -> "a3", "a2" -> "a3",
      "z1" -> "z2", "z1" -> "z3", "z2" -> "z3")
    val full = Graph.labelPropagation(e, "src", "dst", iters = 25)
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    val ran = Graph.lastIterations.get().intValue
    assert(ran < 25, s"converged graph must exit early, ran $ran rounds")
    val pinned = Graph.labelPropagation(e, "src", "dst", iters = ran)
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(full == pinned, "early exit must be output-identical")
    assert(full("a1") == full("a2") && full("a2") == full("a3"))
    assert(full("z1") == full("z2") && full("z2") == full("z3"))
  }

  test("degrees: out/in/total with zero-fill on one-sided nodes") {
    val e = edges("a" -> "b", "a" -> "c", "b" -> "c")
    val r = Graph.degrees(e, "src", "dst")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(r == Map(
      "a" -> ((2L, 0L, 2L)),
      "b" -> ((1L, 1L, 2L)),
      "c" -> ((0L, 2L, 2L))))
  }

  test("linkPrediction: path endpoints score via the middle node, adjacent pairs excluded") {
    // path a-b-c: only non-adjacent pair is (a,c), common neighbor b
    // (deg 2), so aa = 1/ln 2; jaccard = 1/(1+1-1) = 1
    val e = edges("a" -> "b", "b" -> "c")
    val r = Graph.linkPrediction(e, "src", "dst")
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getDouble(3), x.getDouble(4)))).toMap
    assert(r.keySet == Set(("a", "c")), r.toString)
    val (common, aa, jac) = r(("a", "c"))
    assert(common == 1L && jac == 1.0, r.toString)
    assert(math.abs(aa - BigDecimal(1.0 / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, aa.toString)
  }

  test("linkPrediction: higher-degree common neighbors contribute less; direction/duplicates ignored") {
    // (x,y) share hub h (deg 4: x,y,p,q) AND w (deg 2: x,y):
    // aa = 1/ln4 + 1/ln2; common=2; deg(x)=deg(y)=2 (h,w) → jaccard = 2/(2+2-2)=1
    val e = edges("x" -> "h", "h" -> "y", "p" -> "h", "h" -> "q",
      "x" -> "w", "y" -> "w", "w" -> "x") // duplicate reversed edge collapses
    val r = Graph.linkPrediction(e, "src", "dst")
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getDouble(3), x.getDouble(4)))).toMap
    val (common, aa, _) = r(("x", "y"))
    assert(common == 2L, r.toString)
    assert(math.abs(aa - (1.0 / math.log(4.0) + 1.0 / math.log(2.0))) < 1e-6, aa.toString)
    // p and q are adjacent only to h: (p,q),(p,x)... all score through h
    assert(r.contains(("p", "q")) && r(("p", "q"))._1 == 1L, r.toString)
  }

  test("linkPrediction: maxDegree cap removes super-hub pair generation") {
    // star of 5 leaves around hub S, plus one path leaf1-t: capping deg<=4
    // excludes S (deg 5), so only pairs through t-adjacent nodes survive
    val star = (1 to 5).map(i => s"l$i" -> "S")
    val e = edges(star :+ ("l1" -> "t") :+ ("t" -> "l2"): _*)
    val capped = Graph.linkPrediction(e, "src", "dst", maxDegree = 4)
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    // every S-MEDIATED pair (l_i, l_j through S) is gone; S survives as an
    // ENDPOINT — (S,t) scores through the low-degree commons l1/l2, which
    // is the cap's intent (hubs stop fanning out pairs, not being scored)
    assert(capped == Set(("S", "t"), ("l1", "l2")), capped.toString)
    val uncapped = Graph.linkPrediction(e, "src", "dst")
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(uncapped.size > 1 && uncapped.contains(("l3", "l4")), uncapped.toString)
  }

  test("kCore: cascade peel — pendant chain unravels, clique survives with core degrees") {
    // K4 on {a,b,c,d} plus a chain d-e-f-g: the 2-core is K4 ∪ nothing of
    // the chain (e has deg 2 until f peels, then cascades — the fixpoint
    // loop must keep peeling as removals expose new underweight nodes)
    val e = edges("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c",
      "b" -> "d", "c" -> "d", "d" -> "e", "e" -> "f", "f" -> "g")
    val core2 = Graph.kCore(e, "src", "dst", 2)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(core2 == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L), core2.toString)
    // 3-core identical here; 4-core empty (K4 is only 3-regular)
    assert(Graph.kCore(e, "src", "dst", 3)
      .collect().map(_.getString(0)).toSet == Set("a", "b", "c", "d"))
    assert(Graph.kCore(e, "src", "dst", 4).count() == 0L)
    // 1-core: everything with an edge survives, duplicate/reversed edges collapse
    val withDups = edges("a" -> "b", "b" -> "a", "a" -> "b", "b" -> "c")
    assert(Graph.kCore(withDups, "src", "dst", 1)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap ==
      Map("a" -> 1L, "b" -> 2L, "c" -> 1L))
  }

  test("kCore: matches the brute-force peel on a hashed random graph") {
    val n = 40
    def bit(i: Int, j: Int): Boolean =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j".getBytes("UTF-8"))(0) % 4 == 0
    val pairs = for {
      i <- 0 until n; j <- (i + 1) until n if bit(i, j)
    } yield (s"n$i", s"n$j")
    // brute-force sequential peel (order-independent result)
    val k = 3
    var adj = pairs.toSet
    var changed = true
    while (changed) {
      val deg = adj.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val dead = deg.filter(_._2 < k).keySet
      changed = dead.nonEmpty
      adj = adj.filterNot(p => dead(p._1) || dead(p._2))
    }
    val expected = adj.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val got = Graph.kCore(edges(pairs: _*), "src", "dst", k)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("triangleCounts: planted triangles credited to all corners, zero-fill, dup/direction collapse") {
    // K4 on {a,b,c,d} (4 triangles, each node in 3), a pendant p off a
    // (0 triangles), plus reversed + duplicate edges that must collapse
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c",
      "b" -> "d", "c" -> "d")
    val e = edges(k4 ++ Seq("a" -> "p", "b" -> "a", "c" -> "a"): _*)
    val r = Graph.triangleCounts(e, "src", "dst")
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r.view.mapValues(_._1).toMap ==
      Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L, "p" -> 0L), r.toString)
    // clustering: a has deg 4 (b,c,d,p) → 3/C(4,2) = 0.5; b,c,d are fully
    // clustered (3/3); the pendant has no wedge → 0 by convention
    assert(r.view.mapValues(_._2).toMap ==
      Map("a" -> 0.5, "b" -> 1.0, "c" -> 1.0, "d" -> 1.0, "p" -> 0.0), r.toString)
  }

  test("triangleCounts: matches the brute-force count on a hashed random graph") {
    // deterministic pseudo-random sparse graph: 40 nodes, edge (i,j) iff
    // md5-derived bit — brute-force all C(40,3) triples as the oracle
    val n = 40
    def bit(i: Int, j: Int): Boolean =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j".getBytes("UTF-8"))(0) % 4 == 0
    val pairs = for {
      i <- 0 until n; j <- (i + 1) until n if bit(i, j)
    } yield (s"n$i", s"n$j")
    val adj = pairs.toSet
    def linked(x: Int, y: Int) = adj.contains((s"n$x", s"n$y"))
    val expected = (for {
      i <- 0 until n; j <- (i + 1) until n if linked(i, j)
      k <- (j + 1) until n if linked(j, k) && linked(i, k)
    } yield Seq(i, j, k)).flatten
      .groupBy(identity).map { case (i, ts) => s"n$i" -> ts.size.toLong }
    val got = Graph.triangleCounts(edges(pairs: _*), "src", "dst")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      .filter(_._2 > 0L)
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("harmonicCentrality: exact on a path, sampled = per-source distances") {
    // path a-b-c-d-e: H(c) = 1/2+1+1+1/2 = 3, H(a) = 1+1/2+1/3+1/4
    val e = edges(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    val all = Seq("a", "b", "c", "d", "e", "zz").toDF("n") // zz: isolated
    val h = Graph.harmonicCentrality(e, "src", "dst", all, "n",
        maxHops = 6, termDp = Some(6))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
    val m = h.map(x => x._1 -> x._3).toMap
    assert(h.map(x => x._1 -> x._2).toMap ==
      Map("a" -> 4L, "b" -> 4L, "c" -> 4L, "d" -> 4L, "e" -> 4L),
      s"every path node reaches the other four: $h")
    assert(!m.contains("zz"), "an isolated source reaches nothing and is absent")
    assert(math.abs(m("c") - 3.0) < 1e-9, s"H(c): $m")
    assert(math.abs(m("a") - (1.0 + 0.5 + 0.333333 + 0.25)) < 1e-9, s"H(a): $m")
    assert(math.abs(m("a") - m("e")) < 1e-12 && math.abs(m("b") - m("d")) < 1e-12)
    // sampled: sources = {a} → H(v) = 1/d(a, v) only
    val s1 = Graph.harmonicCentrality(e, "src", "dst",
        Seq("a").toDF("n"), "n", maxHops = 6, termDp = Some(6))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(s1 == Map("b" -> 1.0, "c" -> 0.5, "d" -> 0.333333, "e" -> 0.25),
      s1.toString)
    // maxHops truncates the wave: d > 2 contributes nothing
    val s2 = Graph.harmonicCentrality(e, "src", "dst",
        Seq("a").toDF("n"), "n", maxHops = 2, termDp = Some(6))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(s2 == Map("b" -> 1.0, "c" -> 0.5), s2.toString)
  }
}
