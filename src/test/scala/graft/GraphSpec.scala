package graft

import org.apache.spark.sql.Row
import graft.operators.Graph

/** Link-graph operators: PageRank semantics pinned against an
  * independent driver-side reference implementation (same fold
  * order — plain Scala doubles), plus mass-conservation and
  * determinism invariants the oracle hash can't articulate. */
class GraphSpec extends SparkSpec {

  test("g_degree: weights balance — total out weight equals total in weight") {
    val rows = Graph.gDegree(spark, sf).collect()
    assert(rows.nonEmpty)
    val outW = rows.map(_.getLong(3)).sum
    val inW = rows.map(_.getLong(4)).sum
    assert(outW == inW, s"edge weight must be counted once per side: $outW != $inW")
    // every node participates in the graph
    assert(rows.forall(r => r.getLong(1) + r.getLong(2) > 0))
  }

  test("g_pagerank: matches an independent reference power iteration exactly") {
    // Reference: collect the (tiny at sf0.001) edge list and run the
    // same damped iteration in plain Scala — sorted folds in the same
    // order the operator pins, so agreement is exact (the rounding at
    // the end is shared via the same ⌊x·1e8+½⌋/1e8 chain).
    val e = Graph.edges(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.length
    val outw = e.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var pr: Map[String, Double] = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to Graph.Iterations) {
      val dm = nodes.filter(d => !outw.contains(d)).sorted
        .foldLeft(0.0)((a, d) => a + pr(d))
      val incoming = e.groupBy(_._2)
      pr = nodes.map { d =>
        val fold = incoming.getOrElse(d, Array.empty[(String, String, Long)])
          .sortBy(_._1)
          .foldLeft(0.0) { case (a, (s, _, w)) => a + (pr(s) / outw(s)) * w }
        d -> (0.15 / n + 0.85 * (dm / n) + 0.85 * fold)
      }.toMap
    }
    val expect = nodes.map(d =>
      d -> math.floor(pr(d) * 1e8 + 0.5) / 1e8).toMap
    val got = Graph.gPagerank(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.keySet == expect.keySet)
    val diffs = expect.collect {
      case (d, v) if got(d) != v => s"$d: got ${got(d)} want $v"
    }
    assert(diffs.isEmpty, diffs.mkString("; "))
  }

  test("g_pagerank: rank mass is conserved and strictly positive") {
    val rows = Graph.gPagerank(spark, sf).collect()
    val total = rows.map(_.getDouble(2)).sum
    assert(math.abs(total - 1.0) < 1e-6, s"mass drifted: $total")
    assert(rows.forall(_.getDouble(2) > 0.0), "every node keeps teleport mass")
  }

  test("g_pagerank: deterministic across runs") {
    def run(): Seq[Row] = Graph.gPagerank(spark, sf).collect().toSeq
    assert(run() == run())
  }

  test("floatMode=free: rank-identical to parity, no collect_list in either plan") {
    // The order-free mode is the 100 TB shape (plain partial-aggregated
    // sums — no per-destination neighborhood ever collects into one
    // row). It must agree with parity mode to float-noise tolerance,
    // produce the identical ranking, and its plan must carry no
    // collect_list anywhere (parity's skew hazard is exactly that).
    def byDomain(df: org.apache.spark.sql.DataFrame, vcol: Int) =
      df.collect().map(r => r.getString(0) -> r.getDouble(vcol)).toMap
    val parityPr = byDomain(Graph.gPagerank(spark, sf), 2)
    val parityHits = Graph.gHits(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    spark.conf.set("graft.graph.floatMode", "free")
    try {
      val freeDf = Graph.gPagerank(spark, sf)
      val plan = freeDf.queryExecution.optimizedPlan.toString
      assert(!plan.contains("collect_list"),
        s"free mode must not collect neighborhoods:\n${plan.take(2000)}")
      val freePr = byDomain(freeDf, 2)
      assert(freePr.keySet == parityPr.keySet)
      freePr.foreach { case (d, v) =>
        assert(math.abs(v - parityPr(d)) < 1e-9, s"$d: $v vs ${parityPr(d)}")
      }
      // identical ranking, not just close values
      assert(freePr.toSeq.sortBy { case (d, v) => (-v, d) }.map(_._1) ==
        parityPr.toSeq.sortBy { case (d, v) => (-v, d) }.map(_._1))
      val freeHitsDf = Graph.gHits(spark, sf)
      val hitsPlan = freeHitsDf.queryExecution.optimizedPlan.toString
      assert(!hitsPlan.contains("collect_list"),
        s"free mode must not collect neighborhoods:\n${hitsPlan.take(2000)}")
      val freeHits = freeHitsDf.collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(freeHits.keySet == parityHits.keySet)
      freeHits.foreach { case (d, (h, a)) =>
        assert(math.abs(h - parityHits(d)._1) < 1e-9, s"$d hub: $h")
        assert(math.abs(a - parityHits(d)._2) < 1e-9, s"$d auth: $a")
      }
    } finally spark.conf.unset("graft.graph.floatMode")
  }

  test("floatMode: a typo'd value fails loudly") {
    spark.conf.set("graft.graph.floatMode", "fast")
    try intercept[IllegalArgumentException] {
      Graph.gPagerank(spark, sf)
    } finally spark.conf.unset("graft.graph.floatMode")
  }

  test("g_hits: matches an independent reference iteration; scores L1-normalize") {
    val e = Graph.edges(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.length
    val bySrc = e.groupBy(_._1)
    val byDst = e.groupBy(_._2)
    var hub: Map[String, Double] = nodes.map(_ -> 1.0 / n).toMap
    var auth: Map[String, Double] = Map.empty
    for (_ <- 1 to Graph.HitsIterations) {
      val aRaw = byDst.map { case (d, es) =>
        d -> es.sortBy(_._1).foldLeft(0.0) { case (acc, (s, _, w)) =>
          acc + hub(s) * w
        }
      }
      val aTot = aRaw.toSeq.sortBy(_._1).foldLeft(0.0)(_ + _._2)
      auth = aRaw.map { case (d, v) => d -> v / aTot }
      val hRaw = bySrc.map { case (s, es) =>
        s -> es.sortBy(_._2).foldLeft(0.0) { case (acc, (_, d, w)) =>
          acc + auth(d) * w
        }
      }
      val hTot = hRaw.toSeq.sortBy(_._1).foldLeft(0.0)(_ + _._2)
      hub = hRaw.map { case (s, v) => s -> v / hTot }
    }
    def rnd8(x: Double): Double = math.floor(x * 1e8 + 0.5) / 1e8
    val got = Graph.gHits(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet == nodes.toSet)
    nodes.foreach { d =>
      val (gh, ga) = got(d)
      assert(gh == rnd8(hub.getOrElse(d, 0.0)), s"$d hub: $gh")
      assert(ga == rnd8(auth.getOrElse(d, 0.0)), s"$d authority: $ga")
    }
    // each side is a probability vector (L1 = 1) up to rounding
    val hs = got.values.map(_._1).sum
    val as = got.values.map(_._2).sum
    assert(math.abs(hs - 1.0) < 1e-6 && math.abs(as - 1.0) < 1e-6,
      s"normalization drifted: hubs=$hs auths=$as")
  }

  test("g_cc: star contraction matches a driver-side union-find on the same backbone") {
    val e = Graph.edges(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    // same integer backbone rule the operator pins: w·ne ≥ Σw
    val ne = e.length.toLong
    val tw = e.map(_._3).sum
    val bb = e.filter { case (_, _, w) => w * ne >= tw }
    val parent = scala.collection.mutable.Map(nodes.map(d => d -> d): _*)
    def find(x: String): String =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    bb.foreach { case (s, d, _) =>
      val (rs, rd) = (find(s), find(d))
      if (rs != rd) parent(if (rs < rd) rd else rs) = if (rs < rd) rs else rd
    }
    // union-find roots are path-order-dependent; the CONTRACT is the
    // min member per component, so relabel each root to its min.
    val byRoot = nodes.groupBy(find)
    val expectComp = byRoot.flatMap { case (_, ms) =>
      val m = ms.min; ms.toSeq.map(_ -> m)
    }
    val expectSize = byRoot.map { case (_, ms) => ms.min -> ms.length.toLong }
    val got = Graph.gCc(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == nodes.toSeq, "one ordered row per node")
    got.foreach { case (d, comp, sz) =>
      assert(comp == expectComp(d), s"$d: comp $comp want ${expectComp(d)}")
      assert(sz == expectSize(comp), s"$d: size $sz want ${expectSize(comp)}")
    }
    // the gate corpus exercises both shapes: a real multi-node
    // component and singleton isolates
    assert(expectSize.values.max > 1, "backbone must keep a multi-node component")
    assert(expectSize.values.min == 1L, "thresholding must isolate someone")
  }

  test("star contraction: a 255-node chain (propagation's worst case) converges in O(log) rounds") {
    import SparkSpec.spark.implicits._
    // a pure path graph has diameter 254: min-label propagation would
    // need ~128 two-hop materialized rounds to carry label 0 to the
    // far end; contraction halves the structure every round
    val chain = (0 until 254).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    val (lbl, rounds) = graft.operators.Components.starLabelsRounds(chain)
    val got = lbl.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 255, s"one label per chain node, got ${got.size}")
    assert(got.values.forall(_ == 0L), "every node must label to the chain min")
    assert(rounds <= 10, s"contraction took $rounds rounds on a 254-diameter chain")
  }

  test("star contraction equals union-find on seeded random graphs of varied shape") {
    import SparkSpec.spark.implicits._
    val rng = new scala.util.Random(42)
    // shapes chosen to stress different contraction behavior: sparse
    // (forest-like, many components), dense (one giant component),
    // two chains + isolates via self-loops, and a clique
    val cases: Seq[Seq[(Long, Long)]] = Seq(
      // sparse random
      Seq.fill(40)((rng.nextInt(60).toLong, rng.nextInt(60).toLong)),
      // dense random
      Seq.fill(300)((rng.nextInt(50).toLong, rng.nextInt(50).toLong)),
      // two disjoint chains + self-loop isolates (the scaladoc's
      // singleton contract: a node with only self-edges still labels)
      (0L until 29L).map(i => (i, i + 1)) ++
        (100L until 129L).map(i => (i, i + 1)) ++
        Seq((500L, 500L), (501L, 501L)),
      // clique
      (for (i <- 0 until 12; j <- i + 1 until 12) yield (i.toLong, j.toLong)),
    )
    cases.zipWithIndex.foreach { case (edges, ci) =>
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      val parent = scala.collection.mutable.Map(nodes.map(d => d -> d): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x
        else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = nodes.groupBy(find).flatMap { case (_, ms) =>
        val m = ms.min; ms.map(_ -> m)
      }
      val got = graft.operators.Components
        .starLabels(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect,
        s"case $ci diverges: ${(got.toSet -- expect.toSet).take(5)} vs ${(expect.toSet -- got.toSet).take(5)}")
    }
  }

  test("g_cc_stats: sizes, intra-edge counts and density match a driver recompute") {
    val e = Graph.edges(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val ne = e.length.toLong
    val tw = e.map(_._3).sum
    val bb = e.filter { case (_, _, w) => w * ne >= tw }
      .map { case (s, d, _) => if (s < d) (s, d) else (d, s) }
      .filter { case (a, b) => a != b }.distinct
    val parent = scala.collection.mutable.Map(nodes.map(d => d -> d): _*)
    def find(x: String): String =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    bb.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (ra < rb) rb else ra) = if (ra < rb) ra else rb
    }
    val byComp = nodes.groupBy(find).map { case (_, ms) => ms.min -> ms }
    val compOf = byComp.flatMap { case (m, ms) => ms.toSeq.map(_ -> m) }
    val edgeCnt = bb.groupBy { case (a, _) => compOf(a) }
      .map { case (c, es) => c -> es.length.toLong }
    val got = Graph.gCcStats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == byComp.keySet.toSet)
    byComp.foreach { case (c, ms) =>
      val n = ms.length.toLong
      val m = edgeCnt.getOrElse(c, 0L)
      val density = if (n > 1) (2.0 * m) / (n * (n - 1)).toDouble else 0.0
      assert(got(c) == ((n, m, density)), s"$c: ${got(c)} want ($n, $m, $density)")
      // a backbone edge never crosses components, so m ≤ n(n−1)/2
      assert(2 * m <= n * (n - 1) || n == 1)
    }
    // the gate corpus has a dense multi-node component and singletons
    assert(got.values.exists(v => v._1 > 1 && v._3 > 0.0))
    assert(got.values.exists(v => v._1 == 1 && v._2 == 0 && v._3 == 0.0))
  }

  test("g_cc_diameter: double-sweep bound brackets the exact all-pairs diameter") {
    // Driver reference: exact per-component diameter by all-pairs BFS
    // over the same integer backbone (tiny at sf0.001). The operator's
    // double-sweep value must satisfy the estimator's guarantee:
    // diam/2 ≤ ecc(u) ≤ diam (ecc of ANY node is ≥ diam/2).
    val e = Graph.edges(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val ne = e.length.toLong
    val tw = e.map(_._3).sum
    val bb = e.filter { case (_, _, w) => w * ne >= tw }
      .map { case (s, d, _) => if (s < d) (s, d) else (d, s) }
      .filter { case (a, b) => a != b }.distinct
    val adj = (bb ++ bb.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSeq }
    def ecc(s: String): Int = {
      val dist = scala.collection.mutable.Map(s -> 0)
      var frontier = Seq(s)
      while (frontier.nonEmpty)
        frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
          .filterNot(dist.contains).distinct
          .map { n => dist(n) = dist(frontier.head) + 1; n }
      dist.values.max
    }
    val parent = scala.collection.mutable.Map(nodes.map(d => d -> d): _*)
    def find(x: String): String =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    bb.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (ra < rb) rb else ra) = if (ra < rb) ra else rb
    }
    val byComp = nodes.groupBy(find).map { case (_, ms) => ms.min -> ms }
    val exact = byComp.map { case (c, ms) =>
      c -> (if (ms.length == 1) 0 else ms.map(ecc).max)
    }
    val got = Graph.gCcDiameter(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == exact.keySet.toSet)
    exact.foreach { case (c, d) =>
      val (n, lb) = got(c)
      assert(n == byComp(c).length.toLong)
      assert(lb <= d && 2 * lb >= d,
        s"$c: double-sweep $lb outside [⌈$d/2⌉, $d]")
    }
    // the gate corpus must exercise a non-trivial diameter
    assert(exact.values.max >= 1, "backbone has no multi-node component")
  }

  test("graft.graph.bfsMaxRounds is strictly validated and actually caps the loop") {
    // strict-reader contract: malformed and below-min values throw
    // NAMING the key at query time, never run a silent default
    Seq("abc", "0", "-3").foreach { bad =>
      spark.conf.set("graft.graph.bfsMaxRounds", bad)
      try {
        val e = intercept[IllegalArgumentException](Graph.gCcDiameter(spark, sf).collect())
        assert(e.getMessage.contains("graft.graph.bfsMaxRounds"), e.getMessage)
      } finally spark.conf.unset("graft.graph.bfsMaxRounds")
    }
    // the cap is live: the gate backbone has eccentricity ≥ 2 (asserted
    // by the diameter test above), so a 1-round budget must fail LOUDLY
    // with the escape hatch named — never return a truncated distance
    spark.conf.set("graft.graph.bfsMaxRounds", "1")
    try {
      val e = intercept[IllegalStateException](Graph.gCcDiameter(spark, sf).collect())
      assert(e.getMessage.contains("graft.graph.bfsMaxRounds"), e.getMessage)
    } finally spark.conf.unset("graft.graph.bfsMaxRounds")
  }

  test("g_cc: labeling is a fixpoint — every backbone edge is intra-component") {
    val lbl = Graph.gCc(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val e = Graph.edges(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val ne = e.length.toLong
    val tw = e.map(_._3).sum
    e.filter { case (_, _, w) => w * ne >= tw }.foreach { case (s, d, _) =>
      assert(lbl(s) == lbl(d), s"backbone edge $s->$d crosses components")
    }
    // component labels are members of their own component
    lbl.values.toSet.foreach { (c: String) => assert(lbl(c) == c) }
  }

  test("g_triangles: degree-ordered wedges match brute-force triangle enumeration") {
    val adj = Graph.edges(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .flatMap { case (s, d) => Seq((s, d), (d, s)) }
      .groupBy(_._1)
      .map { case (v, arr) => v -> (arr.map(_._2).toSet - v) }
    // brute force: for every vertex, triangles among its neighbors
    val triOf = adj.map { case (v, ns) =>
      v -> (for {
        a <- ns.toSeq; b <- ns.toSeq if a < b && adj(a).contains(b)
      } yield 1).size.toLong
    }
    val got = Graph.gTriangles(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSet == adj.keySet)
    got.foreach { case (v, deg, tri, cc) =>
      assert(deg == adj(v).size.toLong, s"$v degree")
      assert(tri == triOf(v), s"$v triangles: got $tri want ${triOf(v)}")
      val want = if (deg >= 2)
        math.floor(2.0 * tri / (deg * (deg - 1)) * 1e6 + 0.5) / 1e6 else 0.0
      assert(cc == want, s"$v clustering")
    }
    // the fixture must exercise actual triangles and a mix of densities
    assert(got.map(_._3).sum > 0, "fixture degenerate: no triangles at all")
    // global consistency: per-vertex counts sum to 3× the triangle count
    assert(got.map(_._3).sum % 3 == 0)
  }

  test("g_labelprop: matches an independent synchronous LPA reference") {
    // Reference: collect the weighted undirected adjacency and run
    // the same synchronous sweeps in plain Scala — integer vote
    // weights, (max weight, min label) tie order. Exact agreement.
    val und = Graph.edges(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .flatMap { case (s, d, w) => Seq(((s, d), w), ((d, s), w)) }
      .groupBy(_._1).map { case ((a, b), ws) => (a, b, ws.map(_._2).sum) }
      .toSeq
    val nodes = (und.map(_._1) ++ und.map(_._2)).distinct
    var lab: Map[String, String] = nodes.map(n => n -> n).toMap
    for (_ <- 1 to Graph.LpRounds) {
      val byNode = und.groupBy(_._1)
      lab = nodes.map { n =>
        val votes = byNode.getOrElse(n, Seq.empty)
          .groupBy { case (_, b, _) => lab(b) }
          .map { case (l, es) => (l, es.map(_._3).sum) }
        val (best, _) = votes.minBy { case (l, w) => (-w, l) }
        n -> best
      }.toMap
    }
    val sizes = lab.values.groupBy(identity).map { case (l, v) => l -> v.size.toLong }
    val got = Graph.gLabelprop(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.map(_._1).toSet == nodes.toSet)
    got.foreach { case (n, c, sz) =>
      assert(c == lab(n), s"$n community: got $c want ${lab(n)}")
      assert(sz == sizes(c), s"$n community size")
    }
    // the fixture must actually coalesce: fewer communities than nodes
    assert(sizes.size < nodes.size, "LPA degenerate: nothing propagated")
    assert(sizes.size > 1, "LPA degenerate: one giant community")
  }

  test("g_modularity: matches a driver recompute; grades the labelprop clustering") {
    // independent recompute: LPA labels (reusing the labelprop
    // reference from the test above via the operator itself — the
    // label assignment is already pinned there), then Newman Q per
    // community from the raw undirected adjacency
    val und = Graph.edges(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .flatMap { case (s, d, w) => Seq(((s, d), w), ((d, s), w)) }
      .groupBy(_._1).map { case ((a, b), ws) => (a, b, ws.map(_._2).sum) }
      .toSeq
    val lab = Graph.gLabelprop(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val twoM = und.map(_._3).sum
    val int2 = und.filter { case (a, b, _) => lab(a) == lab(b) }
      .groupBy(t => lab(t._1)).map { case (c, es) => c -> es.map(_._3).sum }
    val wdeg = und.groupBy(_._1).map { case (a, es) => a -> es.map(_._3).sum }
    val want = lab.values.toSeq.distinct.map { c =>
      val members = lab.collect { case (n, l) if l == c => n }
      val dsum = members.map(wdeg).sum
      val i2 = int2.getOrElse(c, 0L)
      val q = i2.toDouble / twoM -
        (dsum.toDouble / twoM) * (dsum.toDouble / twoM)
      c -> (members.size.toLong, i2, dsum, math.floor(q * 1e6 + 0.5) / 1e6)
    }.toMap
    val got = Graph.gModularity(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == want)
    // Newman bound: ΣQ_c ∈ [-1, 1]. On the derived fixture the LPA
    // labeling honestly scores slightly BELOW chance (≈ -0.05): the
    // src→dst link derivation is near-bipartite, so LPA's blocks have
    // low internal density — the e_silhouette-style negative
    // diagnostic ("don't curate by these communities here"), which is
    // exactly what the report exists to say. Pin the bound and that
    // the structure columns carry signal, not a sign the fixture
    // cannot justify.
    val total = got.values.map(_._4).sum
    assert(total >= -1.0 && total <= 1.0, s"global modularity $total")
    assert(got.values.exists(_._2 > 0L), "no community has internal edges")
    assert(got.size > 1, "degenerate: one community")
  }

  test("g_jaccard: matches brute-force common-neighbor Jaccard; cap binds wedges") {
    val adj = Graph.edges(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .flatMap { case (s, d) => Seq((s, d), (d, s)) }
      .groupBy(_._1)
      .map { case (v, arr) => v -> (arr.map(_._2).toSet - v) }
    // brute force over all pairs (the operator must agree while
    // generating candidates only through wedges)
    val vs = adj.keys.toSeq.sorted
    // capped-neighborhood Jaccard: numerator AND denominator over
    // N'(v) = {n ∈ N(v) : deg(n) ≤ cap} — the operator's documented
    // semantics (plain Jaccard when the cap doesn't bind, as here)
    def cadj(v: String): Set[String] =
      adj(v).filter(n => adj(n).size <= Graph.LinkPredMaxDeg)
    val want = (for {
      a <- vs; b <- vs if a < b
      common = (cadj(a) & cadj(b)).size
      if common >= 2
    } yield {
      val union = cadj(a).size + cadj(b).size - common
      ((a, b), (common.toLong, cadj(a).size.toLong, cadj(b).size.toLong,
        math.floor(common.toDouble / union * 1e6 + 0.5) / 1e6))
    }).toMap
    val got = Graph.gJaccard(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got == want)
    assert(got.nonEmpty, "fixture degenerate: no similar pairs")
    // cap semantics: with a cap of 0 no wedge centers survive
    val capped = adj.count { case (_, ns) => ns.size > Graph.LinkPredMaxDeg }
    assert(capped == 0, "fixture should exercise the UNCAPPED semantics")
  }

  test("g_assortativity matches a driver Pearson recompute; regular graph is NULL") {
    import SparkSpec.spark.implicits._
    // driver recompute over the same symmetric endpoint-degree pairs
    val adj = Graph.edges(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .map { case (s, d) => if (s < d) (s, d) else (d, s) }.distinct
    val deg = (adj.map(_._1) ++ adj.map(_._2)).groupBy(identity)
      .map { case (v, vs) => v -> vs.length.toLong }
    val pairs = adj.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val m = pairs.length.toLong
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxy = pairs.map(p => p._1 * p._2).sum
    val (sxx, syy) = (pairs.map(p => p._1 * p._1).sum, pairs.map(p => p._2 * p._2).sum)
    // mirror the operator's op tree exactly: integer products stay
    // exact longs until the subtraction promotes them
    val want = math.floor((m.toDouble * sxy - (sx * sy)) /
      math.sqrt((m.toDouble * sxx - (sx * sx)) *
        (m.toDouble * syy - (sy * sy))) * 1e6 + 0.5) / 1e6
    val row = Graph.gAssortativity(spark, sf).head()
    assert(row.getLong(0) == m, s"edge-end count ${row.getLong(0)} != $m")
    assert(row.getDouble(1) == want, s"r ${row.getDouble(1)} != $want")
    // the derived crawl graph must read DISassortative (hubs → leaves)
    assert(row.getDouble(1) < 0.0, "crawl-shaped fixture should be disassortative")
    // degree-regular graph (a 4-cycle: every degree 2) → zero variance
    // → NULL, never NaN
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    val reg = Graph.assortativityOf(spark, cyc).head()
    assert(reg.isNullAt(1), s"regular graph must report NULL, got $reg")
  }

  test("g_reciprocity matches a driver recompute; mutual and empty fixtures pin the edges") {
    import SparkSpec.spark.implicits._
    val es = Graph.edges(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val set = es.toSet
    val wantR = es.count { case (a, b) => set.contains((b, a)) }.toLong
    val row = Graph.gReciprocity(spark, sf).head()
    assert(row.getLong(0) == es.length.toLong && row.getLong(1) == wantR,
      s"counts: $row vs (${es.length}, $wantR)")
    assert(row.getDouble(2) ==
      math.floor(wantR.toDouble / es.length * 1e6 + 0.5) / 1e6)
    assert(wantR > 0, "fixture should contain SOME mutual links")
    // fully-mutual pair → 1.0; empty edge table → NULL (never NaN)
    val mutual = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    assert(Graph.reciprocityOf(spark, mutual).head().getDouble(2) == 1.0)
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    assert(Graph.reciprocityOf(spark, empty).head().isNullAt(2))
  }

  test("g_jaccard capped mode: hub excluded from numerator AND denominator") {
    import SparkSpec.spark.implicits._
    // hub h neighbors everyone; a and b share non-hub neighbors c1,c2.
    // With cap=3 the hub (deg 4) is excluded: N'(a)=N'(b)={c1,c2},
    // jaccard(a,b) = 2/2 = 1.0 — a mixed capped-numerator/full-
    // denominator ratio would report 2/(3+3-2) = 0.5 instead.
    val e = Seq(
      ("h", "a"), ("h", "b"), ("h", "c1"), ("h", "c2"),
      ("a", "c1"), ("a", "c2"), ("b", "c1"), ("b", "c2"))
      .toDF("src", "dst")
    val got = Graph.jaccardOf(spark, e, maxDeg = 3).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got(("a", "b")) == ((2L, 2L, 2L, 1.0)),
      s"capped Jaccard must score over hub-excluded neighborhoods: $got")
    // c1/c2 see each other through centers a and b (both deg 3 ≤ cap)
    assert(got(("c1", "c2"))._1 == 2L, s"wedges through non-hubs survive: $got")
  }
}
