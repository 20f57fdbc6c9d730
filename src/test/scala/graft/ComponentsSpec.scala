package graft

import graft.dedup.Components
import org.apache.spark.sql.functions.{col, lit}

class ComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  test("connectedComponents labels each component with its min id") {
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("ida", "idb")
    val cc = Components.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("long chains converge (diameter > a few rounds)") {
    val edges = (1L until 30L).map(i => (i, i + 1)).toDF("ida", "idb")
    val cc = Components.connectedComponents(edges, maxIter = 40).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 30 && cc.values.forall(_ == 1L))
  }

  test("cleanCorpus broadcast and shuffle anti-join paths agree") {
    val docs = (1L to 12L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters {1,2,3} and {7,8}: drop 2,3,8 → keep 9 docs
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("ida", "idb")
    val viaBroadcast = Components.cleanCorpus(docs, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val viaShuffle = Components.cleanCorpus(docs, pairs, "doc_id",
        broadcastDropLimit = 0L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(viaBroadcast.toSeq == Seq(1L, 4L, 5L, 6L, 7L, 9L, 10L, 11L, 12L))
    assert(viaShuffle.toSeq == viaBroadcast.toSeq)
  }

  test("cleanCorpusBest keeps the top-scoring member, ties to lower id") {
    import org.apache.spark.sql.functions.col
    // scores: cluster {1,2,3} → 3 wins on score; cluster {7,8} → tie on
    // score → 7 (lower id) wins; 4,5,6 are singletons and always survive
    val docs = Seq(
      (1L, 10L), (2L, 20L), (3L, 30L),
      (4L, 1L), (5L, 1L), (6L, 1L),
      (7L, 5L), (8L, 5L)
    ).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("ida", "idb")
    val kept = Components.cleanCorpusBest(docs, pairs, "doc_id",
        col("quality")).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(3L, 4L, 5L, 6L, 7L))
    // equal scores everywhere → identical to min-id cleanCorpus
    val flat = Components.cleanCorpusBest(
        docs.withColumn("quality", org.apache.spark.sql.functions.lit(1L)),
        pairs, "doc_id", col("quality"),
        broadcastDropLimit = 0L) // exercise the shuffle path too
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val minId = Components.cleanCorpus(docs, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(flat == minId)
  }

  test("connectedComponents honors numPartitions") {
    val edges = Seq((1L, 2L), (3L, 4L)).toDF("ida", "idb")
    val cc = Components.connectedComponents(edges, numPartitions = 2)
    assert(cc.rdd.getNumPartitions <= 2)
    assert(cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("driver union-find and distributed propagation agree exactly") {
    val rnd = new scala.util.Random(7)
    // random graph: 200 nodes, 150 edges → many components, some chains
    val edges = (0 until 150)
      .map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("ida", "idb")
    val fast = Components.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val distributed = Components
      .connectedComponents(edges, maxIter = 50, driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == distributed)
    assert(fast.nonEmpty)
  }

  test("large/small-star matches min-label and union-find on random graphs") {
    val rnd = new scala.util.Random(13)
    // 300 nodes, 220 edges: a mix of singleton pairs, trees and cycles
    val edges = (0 until 220)
      .map(_ => (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
      .toDF("ida", "idb")
    val unionFind = Components.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = Components
      .connectedComponents(edges, driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val minLabel = Components.minLabelComponents(edges, maxIter = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == unionFind && minLabel == unionFind)
    assert(star.nonEmpty)
  }

  test("large/small-star converges on a long chain in O(log diameter) rounds") {
    // a 200-node chain has diameter 199: one-hop propagation needs ~200
    // rounds, the star iteration a dozen — maxIter 15 FAILS for the
    // former and passes for the latter, proving the logarithmic hop
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("ida", "idb")
    val star = Components
      .connectedComponents(chain, maxIter = 15, driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star.size == 200 && star.values.forall(_ == 1L))
    // two disjoint chains keep distinct labels
    val two = ((1L until 50L).map(i => (i, i + 1)) ++
      (1000L until 1050L).map(i => (i, i + 1))).toDF("ida", "idb")
    val cc = Components.connectedComponents(two, maxIter = 15,
        driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.filter(_._1 < 1000L).values.forall(_ == 1L))
    assert(cc.filter(_._1 >= 1000L).values.forall(_ == 1000L))
  }

  test("dupClusters marks exactly one canonical per cluster") {
    val edges = Seq((5L, 6L), (6L, 7L), (100L, 101L)).toDF("ida", "idb")
    val rows = Components.dupClusters(edges).collect()
    val canonicals = rows.filter(_.getAs[Int]("is_canonical") == 1)
      .map(_.getLong(0)).sorted
    assert(canonicals.toSeq == Seq(5L, 100L))
    assert(rows.length == 5)
  }

  test("triangleCounts: K4 plus a pendant edge and a hub star") {
    // K4 on {1,2,3,4}: 4 triangles, each node in 3. Pendant edge 4-5
    // and a star 10-{11,12,13} (no closing edges): zero triangles.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (10L, 11L), (10L, 12L), (10L, 13L)
    ).toDF("ida", "idb")
    val rows = Components.triangleCounts(edges).collect()
    val got = rows.map(r => r.getLong(0) -> r.getAs[Long]("n_triangles")).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val cc = rows.map(r => r.getLong(0) -> r.getAs[Double]("clustering")).toMap
    // nodes 1-3: deg 3, all pairs closed → 1.0; node 4: deg 4 (pendant
    // edge to 5 opens wedges) → 2·3/(4·3) = 0.5
    assert(cc(1L) == 1.0 && cc(2L) == 1.0 && cc(3L) == 1.0)
    assert(cc(4L) == 0.5)
  }

  test("triangleCounts: two triangles sharing an edge") {
    // {1,2,3} and {2,3,4}: nodes 2,3 in two triangles, 1,4 in one
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("ida", "idb")
    val got = Components.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_triangles")).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  /** Independent driver-side implementation of pageRank's exact integer
    * recurrence — same floor divisions, same op order, written against
    * plain Scala maps so it shares nothing with the Spark path.
    */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          scale: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((s, d) <- edges) contrib(d) += r(s) / outdeg(s)
      val dmass = nodes.filterNot(outdeg.contains).map(r).sum
      r = nodes.map(id => id ->
        ((15L * scale) / (100L * n) +
          (85L * (contrib(id) + dmass / n)) / 100L)).toMap
    }
    r
  }

  /** Independent driver-side twin of Components.personalizedPageRank. */
  private def refPpr(edges: Seq[(Long, Long)], seeds: Seq[Long], iters: Int,
                     scale: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val sSet = seeds.distinct.toSet
    val nS = sSet.size
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    def seed(id: Long): Long = if (sSet(id)) 1L else 0L
    var r = nodes.map(id => id -> seed(id) * (scale / nS)).toMap
    for (_ <- 1 to iters) {
      val contrib = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((s, d) <- edges) contrib(d) += r(s) / outdeg(s)
      val dmass = nodes.filterNot(outdeg.contains).map(r).sum
      r = nodes.map(id => id ->
        (seed(id) * ((15L * scale) / (100L * nS)) +
          (85L * (contrib(id) + seed(id) * (dmass / nS))) / 100L)).toMap
    }
    r
  }

  test("personalizedPageRank: recurrence parity, tail bound, unreachable zeros") {
    // chain 1→2→3→4 plus a disconnected pair 10→11; seed {1}
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    val got = Components.personalizedPageRank(
        raw.toDF("src", "dst"), Seq(1L), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPpr(raw, Seq(1L), 5), "diverged from reference")
    // finite-iteration scores are a damped WAVE from the seed (not yet
    // monotone near it), but the far end must sit strictly below the
    // seed and total mass stays bounded by scale
    assert(got(1L) > got(4L) && got(2L) > got(4L),
      s"chain tail not below the seed region: $got")
    assert(got.values.sum <= 1000000000000L, s"mass exceeds scale: $got")
    // nodes unreachable from the seed score exactly 0
    assert(got(10L) == 0L && got(11L) == 0L, s"unreachable not zero: $got")
    // multi-seed: the union of walks — both components now score
    val got2 = Components.personalizedPageRank(
        raw.toDF("src", "dst"), Seq(1L, 10L), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == refPpr(raw, Seq(1L, 10L), 5))
    assert(got2(11L) > 0L, "second seed's component still dark")
    // random directed graph with dangling nodes: exact parity again
    val rnd = new scala.util.Random(41)
    val edges = (1 to 100).map(_ =>
      (rnd.nextInt(30).toLong + 1, rnd.nextInt(40).toLong + 1))
      .filter(e => e._1 != e._2).distinct
    // seeds restricted to nodes actually present (the operator rejects
    // absent seeds rather than silently deflating restart mass)
    val present = (edges.map(_._1) ++ edges.map(_._2)).toSet
    val seeds = Seq(3L, 17L).filter(present)
    val gotR = Components.personalizedPageRank(
        edges.toDF("src", "dst").repartition(7), seeds, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotR == refPpr(edges, seeds, 4),
      "random-graph divergence from reference recurrence")
  }

  test("pageRank matches the independent integer recurrence exactly") {
    // hub-and-spoke into 1, a 2-cycle, and a DANGLING node 9 (no
    // out-edge) so the dangling-mass redistribution is exercised
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L), (2L, 3L),
      (3L, 9L)).toDF("src", "dst")
    val got = Components.pageRank(edges, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = refPageRank(Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L),
      (2L, 3L), (3L, 9L)), iters = 5)
    assert(got == want, s"got $got want $want")
    // node 4 sources an edge but receives only the dangling share — it
    // must rank strictly below the hub (3 in-links)
    assert(got(4L) < got(1L))
  }

  test("pageRankWeighted: uniform weights reproduce pageRank bit-exactly; weight shifts mass") {
    val raw = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L), (2L, 3L), (3L, 9L))
    // r·w div (w·outdeg) = r div outdeg exactly at any uniform w — the
    // comparison target is the INDEPENDENT driver recurrence (pageRank
    // itself now delegates to the weighted impl, so comparing the two
    // operators would test one code path against itself)
    for (w <- Seq(1L, 7L)) {
      val wdf = raw.map { case (a, b) => (a, b, w) }.toDF("src", "dst", "w")
      val got = Components.pageRankWeighted(wdf, iters = 5).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refPageRank(raw, 5),
        s"uniform w=$w diverged from the independent recurrence")
    }
    // node 1 splits to {2, 3}: weighting the 1→3 edge 9:1 must rank 3
    // above its unweighted self and 2 below
    val skew = Seq((1L, 2L, 1L), (1L, 3L, 9L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val sg = Components.pageRankWeighted(skew, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ug = Components.pageRank(
        Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)).toDF("src", "dst"),
        iters = 5).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ug(2L) == ug(3L), "sanity: unweighted splits evenly")
    assert(sg(3L) > ug(3L) && sg(2L) < ug(2L),
      s"weighted split did not shift mass: $sg vs $ug")
    // non-positive and overflowing weights are rejected
    intercept[IllegalArgumentException] {
      Components.pageRankWeighted(
        Seq((1L, 2L, 0L)).toDF("src", "dst", "w"), iters = 1)
    }
    intercept[IllegalArgumentException] {
      Components.pageRankWeighted(
        Seq((1L, 2L, Long.MaxValue / 1000L)).toDF("src", "dst", "w"),
        iters = 1)
    }
  }

  test("pageRank conserves mass up to bounded floor loss") {
    val e = (1L to 20L).flatMap(i => Seq((i, i % 20 + 1), (i, (i + 6) % 20 + 1)))
    val got = Components.pageRank(e.toDF("src", "dst"), iters = 8).collect()
      .map(_.getLong(1))
    val scale = 1000000000000L
    val total = got.sum
    // per iteration loss < |E| + 4N ulps (per-edge div remainders sum
    // to < E; dangling share, base term, and the damped div-100 each
    // lose < 1 per node) — microscopic at 1e12 scale
    val bound = 8L * (e.size + 4 * 20)
    assert(total <= scale && total >= scale - bound,
      s"total $total vs scale $scale (bound $bound)")
  }

  /** Independent driver-side twin of Components.hits' exact recurrence. */
  private def refHits(edges: Seq[(Long, Long)], iters: Int,
                      scale: Long = 1000000000L): Map[Long, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    var h = nodes.map(_ -> scale / n).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val ar = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((s, d) <- edges) ar(d) += h(s)
      val sa = ar.values.sum
      a = nodes.map(id => id -> ar(id) * scale / sa).toMap
      val hr = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((s, d) <- edges) hr(s) += a(d)
      val sh = hr.values.sum
      h = nodes.map(id => id -> hr(id) * scale / sh).toMap
    }
    nodes.map(id => id -> ((a(id), h(id)))).toMap
  }

  test("hits matches the independent recurrence; hubs and authorities separate") {
    // pure hubs 1,2,3 pointing into pure authorities 10,11,12 with
    // nested out-sets: hub order 1>2>3, authority order 10>11>12
    val raw = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L),
      (3L, 10L))
    val got = Components.hits(raw.toDF("src", "dst"), iters = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == refHits(raw, 5), s"got $got want ${refHits(raw, 5)}")
    // authorities: only the 10s; hubs: only the 1s
    assert(got(10L)._1 > got(11L)._1 && got(11L)._1 > got(12L)._1)
    assert(got(1L)._2 > got(2L)._2 && got(2L)._2 > got(3L)._2)
    assert(got(1L)._1 == 0L && got(10L)._2 == 0L)
  }

  test("hits on a cycle converges to uniform scores") {
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = Components.hits(raw.toDF("src", "dst"), iters = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == refHits(raw, 4))
    assert(got.values.map(_._1).toSet.size == 1, "cycle authorities uniform")
    assert(got.values.map(_._2).toSet.size == 1, "cycle hubs uniform")
  }

  /** Independent driver-side twin of Components.labelPropagation:
    * synchronous majority vote, ties (cnt desc, lbl asc).
    */
  private def refLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2).distinct
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var l = adj.keys.map(id => id -> id).toMap
    for (_ <- 1 to iters) {
      l = adj.map { case (id, nbrs) =>
        val votes = nbrs.groupBy(l).view.mapValues(_.size).toSeq
        id -> votes.minBy { case (lbl, cnt) => (-cnt, lbl) }._1
      }
    }
    l
  }

  test("labelPropagation matches the independent recurrence on a random graph") {
    val rnd = new scala.util.Random(11)
    // canonical a<b unique pairs (parallel edges would weight the vote)
    val edges = (1 to 120).map(_ =>
      (rnd.nextInt(30).toLong + 1, rnd.nextInt(30).toLong + 1))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val got = Components.labelPropagation(
        edges.toDF("src", "dst").repartition(7), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refLpa(edges, 5), s"diverged from reference recurrence")
  }

  test("labelPropagationWeighted: unit weights delegate; weight flips a vote") {
    // path 1-2, 2-3 with node 2 voting between labels 1 and 3: at unit
    // weights the tie goes to the SMALLER label (1); weighting the 2-3
    // edge 5x flips node 2's community to 3's side
    val raw = Seq((1L, 2L), (2L, 3L))
    val unit = Components.labelPropagation(raw.toDF("src", "dst"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unit(2L) == 1L, s"tie must break to the smaller label: $unit")
    val weighted = Components.labelPropagationWeighted(
        Seq((1L, 2L, 1L), (2L, 3L, 5L)).toDF("src", "dst", "w"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(weighted(2L) == 3L, s"5x weight must win the vote: $weighted")
    // random graph: the unit-weight WEIGHTED path must match the
    // INDEPENDENT driver recurrence (comparing it to labelPropagation
    // would be vacuous — the unweighted entry now delegates here)
    val rnd = new scala.util.Random(67)
    val edges = (1 to 90).map(_ =>
      (rnd.nextInt(25).toLong + 1, rnd.nextInt(25).toLong + 1))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val b = Components.labelPropagationWeighted(
        edges.map(e => (e._1, e._2, 1L)).toDF("src", "dst", "w"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b == refLpa(edges, 4),
      "unit-weight LPA diverged from the independent recurrence")
  }

  test("labelPropagation splits bridged cliques where components cannot") {
    // two 5-cliques joined by ONE bridge edge: connectivity sees one
    // island; majority vote keeps each clique on its own min label
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = clique(1L to 5L) ++ clique(11L to 15L) :+ (5L, 11L)
    val df = edges.toDF("src", "dst")
    val lpa = Components.labelPropagation(df, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa == refLpa(edges, 5))
    val c1 = (1L to 5L).map(lpa).toSet
    val c2 = (11L to 15L).map(lpa).toSet
    assert(c1.size == 1 && c2.size == 1 && c1 != c2,
      s"cliques must land in two distinct communities, got $lpa")
    val cc = Components.connectedComponents(
        df.select($"src".as("ida"), $"dst".as("idb")))
      .collect().map(_.getLong(1)).toSet
    assert(cc.size == 1, "sanity: the bridge makes ONE connected component")
  }

  test("kCore: transitive demotion, random-graph peel parity, round bound") {
    // 4-clique with a pendant chain 4-100-101: plain degree>=3 keeps
    // nothing of the chain anyway, but node 4 must KEEP its clique
    // degree after the chain peels; k=3 core = exactly the clique
    val clique = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val edges = clique ++ Seq((4L, 100L), (100L, 101L))
    val got = Components.kCore(edges.toDF("src", "dst"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
    // transitive case at k=2: chain 1-2-3-4-5 peels COMPLETELY (each
    // round demotes the new endpoints), even though 2,3,4 start at deg 2
    val chain = (1L to 4L).map(i => (i, i + 1))
    val got2 = Components.kCore(chain.toDF("src", "dst"), k = 2)
      .collect()
    assert(got2.isEmpty, s"chain must peel to nothing at k=2: ${got2.toSeq}")
    // random graph: exact parity with a driver-side peel
    val rnd = new scala.util.Random(59)
    val re = (1 to 150).map(_ =>
      (rnd.nextInt(40).toLong + 1, rnd.nextInt(40).toLong + 1))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val sym = re ++ re.map(_.swap)
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var nodes = adj.keySet
    var stable = false
    while (!stable) {
      val drop = nodes.filter(v => (adj(v) & nodes).size < 3)
      stable = drop.isEmpty
      nodes = nodes -- drop
    }
    val want = nodes.map(v => v -> (adj(v) & nodes).size.toLong).toMap
    val gotR = Components.kCore(re.toDF("src", "dst").repartition(7), k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotR == want, s"diverged from driver peel: got $gotR want $want")
    // an insufficient round bound fails loudly, never silently partial
    intercept[IllegalArgumentException] {
      Components.kCore(chain.toDF("src", "dst"), k = 2, maxRounds = 1)
    }
  }

  test("bfsDistancesWeighted: cheap detour beats direct edge; unit = hops") {
    // 1→3 direct costs 10; 1→2→3 costs 2+3=5 — the weighted metric
    // must pick the 2-hop detour that unit-hop distance cannot see
    val w = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L))
    val got = Components.bfsDistancesWeighted(
        w.toDF("src", "dst", "w"), Seq(1L), maxHops = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 2L, 3L -> 5L), s"got $got")
    // a 1-hop bound can only see the direct edge
    val h1 = Components.bfsDistancesWeighted(
        w.toDF("src", "dst", "w"), Seq(1L), maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(h1(3L) == 10L, s"hop bound must exclude the detour: $h1")
    // unit weights reproduce bfsDistances' hop counts exactly
    val rnd = new scala.util.Random(97)
    val edges = (1 to 80).map(_ =>
      (rnd.nextInt(25).toLong + 1, rnd.nextInt(25).toLong + 1))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val unit = Components.bfsDistancesWeighted(
        edges.map(e => (e._1, e._2, 1L)).toDF("src", "dst", "w"),
        Seq(1L, 7L), maxHops = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val hops = Components.bfsDistances(
        edges.toDF("src", "dst"), Seq(1L, 7L), maxHops = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(unit == hops, "unit-weight costs diverged from hop counts")
    // null, non-positive, overflowing, and fractional weights rejected
    intercept[IllegalArgumentException] {
      Components.bfsDistancesWeighted(
        Seq((1L, 2L, 0L)).toDF("src", "dst", "w"), Seq(1L))
    }
    intercept[IllegalArgumentException] { // null weight (failed cast path)
      Components.bfsDistancesWeighted(
        Seq((1L, 2L, null.asInstanceOf[java.lang.Long]))
          .toDF("src", "dst", "w"), Seq(1L))
    }
    intercept[IllegalArgumentException] { // cost would wrap long
      Components.bfsDistancesWeighted(
        Seq((1L, 2L, Long.MaxValue / 2)).toDF("src", "dst", "w"), Seq(1L),
        maxHops = 3)
    }
    intercept[IllegalArgumentException] { // fractional weights truncate
      Components.bfsDistancesWeighted(
        Seq((1L, 2L, 1.9)).toDF("src", "dst", "w"), Seq(1L))
    }
  }

  test("bfsPathCounts: diamond multiplicity, chain stability, random parity") {
    // diamond 1-{2,3}-4 plus tail 4-5: sigma(4)=2 via two routes,
    // sigma(5)=2 inherited; distances match bfsDistances
    val raw = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val got = Components.bfsPathCounts(raw.toDF("src", "dst"), Seq(1L), 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(1L -> ((0L, 1L)), 2L -> ((1L, 1L)), 3L -> ((1L, 1L)),
      4L -> ((2L, 2L)), 5L -> ((3L, 2L))), s"got $got")
    // stability: extra rounds beyond the diameter must not inflate sigma
    // (the carried-row double-count bug this recurrence avoids)
    val more = Components.bfsPathCounts(raw.toDF("src", "dst"), Seq(1L), 12)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(more == got, s"sigma not stable under extra rounds: $more")
    // random graph: parity with a driver-side BFS sigma computation
    val rnd = new scala.util.Random(83)
    val edges = (1 to 120).map(_ =>
      (rnd.nextInt(30).toLong + 1, rnd.nextInt(30).toLong + 1))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    def bfsSigma(lm: Long, hops: Int): Map[Long, (Long, Long)] = {
      var dist = Map(lm -> 0L); var sigma = Map(lm -> 1L)
      var frontier = Seq(lm)
      for (h <- 1 to hops) {
        val nxt = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        frontier.foreach(u =>
          adj.getOrElse(u, Seq.empty).foreach { v =>
            if (!dist.contains(v)) nxt(v) += sigma(u)
          })
        nxt.foreach { case (v, s) => dist += v -> h.toLong; sigma += v -> s }
        frontier = nxt.keys.toSeq
      }
      dist.map { case (v, d) => v -> ((d, sigma(v))) }
    }
    val lms = Seq(2L, 9L)
    val want = lms.flatMap(lm =>
      bfsSigma(lm, 4).map { case (v, ds) => (v, lm) -> ds }).toMap
    val gotR = Components.bfsPathCounts(
        edges.toDF("src", "dst").repartition(7), lms, 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(gotR == want, "diverged from driver-side BFS sigma")
  }

  test("modularityParts: hand-derived values on bridged cliques; bound holds") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = clique(1L to 5L) ++ clique(11L to 15L) :+ (5L, 11L)
    val df = edges.toDF("src", "dst")
    val comm = Components.labelPropagation(df, iters = 5)
    val parts = Components.modularityParts(df, comm).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // m = 21 edges; each community: 10 intra edges; degree sums: clique
    // degrees 4 each + 1 bridge endpoint -> D_c = 5*4 + 1 = 21
    // q_num = 4*21*10 - 21^2 = 840 - 441 = 399 per community
    assert(parts.keySet == Set(1L, 11L), s"got ${parts.keySet}")
    parts.values.foreach { case (n, intra, dsum, m, q) =>
      assert(n == 5L && intra == 10L && dsum == 21L && m == 21L && q == 399L,
        s"got ($n, $intra, $dsum, $m, $q)")
    }
    // global bound: Q <= 1 <=> sum(q_num) <= 4m^2; here Q = 798/1764
    assert(parts.values.map(_._5).sum <= 4 * 21 * 21)
    // degenerate partition (everything one community) scores LOWER than
    // the LPA split: 4m*21 - (2m)^2 = 4*21*21 - 42^2 = 0 < 798
    val one = comm.select(col("id"), lit(1L).as("community"))
    val qOne = Components.modularityParts(df, one).collect()
      .map(_.getLong(5)).sum
    assert(qOne < parts.values.map(_._5).sum,
      s"one-community partition must score below the split, got $qOne")
  }

  test("bfsDistances: hand-checked chain bound + random-graph BFS parity") {
    // chain 1-2-...-7, landmark 1, 3 hops: nodes 1..4 settle at 0..3,
    // nodes 5..7 are ABSENT (beyond the bound), never null/infinite
    val chain = (1L to 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Components.bfsDistances(chain, Seq(1L), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L), s"got $got")
    // random graph, 2 landmarks: exact parity with driver-side BFS
    val rnd = new scala.util.Random(23)
    val edges = (1 to 80).map(_ =>
      (rnd.nextInt(25).toLong + 1, rnd.nextInt(25).toLong + 1))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val lms = Seq(1L, 7L)
    val hops = 4
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def bfs(lm: Long): Map[Long, Long] = {
      var dist = Map(lm -> 0L)
      var frontier = Set(lm)
      for (h <- 1 to hops) {
        val nxt = frontier.flatMap(adj.getOrElse(_, Set.empty))
          .filterNot(dist.contains)
        dist ++= nxt.map(_ -> h.toLong)
        frontier = nxt
      }
      dist
    }
    val want = lms.flatMap(lm => bfs(lm).map { case (id, h) => (id, lm) -> h })
      .toMap
    val dd = Components.bfsDistances(
        edges.toDF("src", "dst").repartition(5), lms, hops)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(dd == want, "diverged from driver-side BFS")
  }

  test("bfsDistancesFrontier: full-diameter chain drains early; " +
    "exact parity with the bounded loop at a shared bound") {
    // chain 1-…-12, landmark 1, bound 200 (far past the diameter): the
    // frontier drains after 11 rounds and every node settles at its
    // exact hop count — the full-closure contract the bounded loop
    // would pay 200 full-table rounds for
    val chain = (1L to 11L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Components.bfsDistancesFrontier(chain, Seq(1L), maxHops = 200)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == (1L to 12L).map(i => i -> (i - 1L)).toMap, s"got $got")
    // random graph, 2 landmarks, SHARED bound: first-discovery depths
    // must equal the bounded loop's min-relaxation distances row for
    // row — the common-oracle contract q_graph_distances_frontier
    // hash-checks cross-engine
    val rnd = new scala.util.Random(31)
    val edges = (1 to 90).map(_ =>
      (rnd.nextInt(30).toLong + 1, rnd.nextInt(30).toLong + 1))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val lms = Seq(1L, 9L)
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bounded = canon(Components.bfsDistances(
      edges.toDF("src", "dst").repartition(5), lms, maxHops = 4))
    val frontier = canon(Components.bfsDistancesFrontier(
      edges.toDF("src", "dst").repartition(5), lms, maxHops = 4))
    assert(frontier == bounded,
      "frontier diverged from the bounded loop at a shared bound")
    // landmark isolated from part of the graph: unreached pairs ABSENT
    val split = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val sp = Components.bfsDistancesFrontier(split, Seq(1L), maxHops = 10)
      .collect().map(r => r.getLong(0)).toSet
    assert(sp == Set(1L, 2L), s"got $sp")
    // the closeness aggregate composes identically over either route
    def cl(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cb = cl(Components.harmonicCloseness(
      edges.toDF("src", "dst"), lms, maxHops = 4))
    val cf = cl(Components.harmonicClosenessFull(
      edges.toDF("src", "dst"), lms, maxHops = 4))
    assert(cf == cb, "closeness diverged between bounded and frontier")
  }

  test("bfsBetweenness: hand-derived path graph and diamond; landmark excluded") {
    val S = 100000L
    // path 1-2-3-4, landmark 1: delta(3) = (1*(S+0))div 1 = S;
    // delta(2) = (1*(S+S))div 1 = 2S; landmark 1 itself excluded.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Components.bfsBetweenness(path, Seq(1L), maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 2 * S, 3L -> S), s"got $got")
    // diamond 1-{2,3}-4 with tail 4-5, landmark 1: sigma(4)=2;
    // delta(4) = (2*(S+0)) div 2 = S (from 5);
    // delta(2) = delta(3) = (1*(S+S)) div 2 = S
    val dia = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val gd = Components.bfsBetweenness(dia, Seq(1L), maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gd == Map(2L -> S, 3L -> S, 4L -> S), s"got $gd")
    // two landmarks sum their dependencies: path 1-2-3 from {1, 3} gives
    // node 2 delta S from each side
    val p3 = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val g2 = Components.bfsBetweenness(p3, Seq(1L, 3L), maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g2 == Map(2L -> 2 * S), s"got $g2")
  }

  test("bfsBetweenness: random-graph parity with a driver-side recurrence") {
    val S = 100000L
    val hops = 4
    val rnd = new scala.util.Random(41)
    val edges = (1 to 90).map(_ =>
      (rnd.nextInt(22).toLong + 1, rnd.nextInt(22).toLong + 1))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val lms = Seq(1L, 5L, 9L)
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // forward: BFS levels + sigma per landmark
    def forward(lm: Long): (Map[Long, Long], Map[Long, Long]) = {
      var dist = Map(lm -> 0L); var sigma = Map(lm -> 1L)
      var frontier = Seq(lm)
      for (h <- 1 to hops) {
        val nxt = frontier.flatMap(adj.getOrElse(_, Set.empty))
          .filterNot(dist.contains).distinct
        val sg = nxt.map(v => v -> adj(v).filter(u =>
          dist.get(u).contains(h - 1L)).toSeq.map(sigma).sum).toMap
        dist ++= nxt.map(_ -> h.toLong); sigma ++= sg
        frontier = nxt
      }
      (dist, sigma)
    }
    val want = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (lm <- lms) {
      val (dist, sigma) = forward(lm)
      val delta = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for (h <- (hops - 1) to 0 by -1;
           v <- dist.collect { case (v, d) if d == h => v }) {
        val succ = adj.getOrElse(v, Set.empty)
          .filter(u => dist.get(u).contains(h + 1L))
        if (succ.nonEmpty)
          delta(v) = succ.toSeq
            .map(u => (sigma(v) * (S + delta(u))) / sigma(u)).sum
      }
      for ((v, d) <- delta if v != lm && d != 0L) want(v) += d
    }
    val got = Components.bfsBetweenness(
        edges.toDF("src", "dst").repartition(5), lms, maxHops = hops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want.toMap.filter(_._2 != 0L),
      s"diverged from driver recurrence:\n got  $got\n want $want")
  }

  test("coreness: hand cases, h-index recurrence parity, kCore cross-law") {
    // 4-clique {1..4} + pendant chain 4-5-6 + triangle {7,8,9}:
    // clique nodes coreness 3, chain 1, triangle 2
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = clique(1L to 4L) ++ Seq((4L, 5L), (5L, 6L)) ++
      clique(Seq(7L, 8L, 9L))
    val got = Components.coreness(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 1L, 6L -> 1L, 7L -> 2L, 8L -> 2L, 9L -> 2L), s"got $got")
    // random graph: parity with the driver-side h-index fixpoint AND
    // the cross-operator law {coreness >= k} == kCore(k) node set
    val rnd = new scala.util.Random(67)
    val re = (1 to 120).map(_ =>
      (rnd.nextInt(28).toLong + 1, rnd.nextInt(28).toLong + 1))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = (re ++ re.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def hIndex(vals: Seq[Long]): Long = {
      val s = vals.sorted.reverse
      s.zipWithIndex.map { case (v, i) => math.min(v, i + 1L) }
        .foldLeft(0L)(math.max)
    }
    var est = adj.map { case (v, ns) => v -> ns.size.toLong }
    var stable = false
    while (!stable) {
      val ne = adj.map { case (v, ns) => v -> hIndex(ns.toSeq.map(est)) }
      stable = ne == est; est = ne
    }
    val gr = Components.coreness(re.toDF("src", "dst").repartition(5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gr == est, s"diverged from driver h-index fixpoint")
    for (k <- Seq(2, 3)) {
      val coreSet = Components.kCore(re.toDF("src", "dst"), k = k)
        .collect().map(_.getLong(0)).toSet
      assert(gr.filter(_._2 >= k).keySet == coreSet,
        s"coreness >= $k diverged from kCore($k)")
    }
    // an insufficient round bound fails loudly, never silently partial
    intercept[IllegalArgumentException] {
      Components.coreness((1L to 40L).map(i => (i, i + 1)).toDF("src", "dst"),
        maxRounds = 2)
    }
  }

  test("harmonicCloseness: hand-derived chain; parity with bfsDistances") {
    val S = 100000L
    // chain 1-2-3-4, landmarks {1, 4}: node 2 → S/1 + S/2; node 3 →
    // S/2 + S/1; node 1 → only landmark 4 at d=3 (self-row excluded);
    // landmark coverage counted in n_reached
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Components.harmonicCloseness(chain, Seq(1L, 4L), maxHops = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map(
      1L -> ((S / 3, 1L)), 2L -> ((S + S / 2, 2L)),
      3L -> ((S / 2 + S, 2L)), 4L -> ((S / 3, 1L))), s"got $got")
    // disconnected node: absent, never an infinity convention
    val disc = Seq((1L, 2L), (7L, 8L)).toDF("src", "dst")
    val gd = Components.harmonicCloseness(disc, Seq(1L), maxHops = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gd == Map(2L -> S), s"got $gd")
    // random graph: equals the aggregate recomputed off bfsDistances
    val rnd = new scala.util.Random(53)
    val edges = (1 to 70).map(_ =>
      (rnd.nextInt(20).toLong + 1, rnd.nextInt(20).toLong + 1))
      .filter(e => e._1 != e._2).distinct.toDF("src", "dst")
    val want = Components.bfsDistances(edges, Seq(2L, 9L), maxHops = 4)
      .collect().filter(_.getLong(2) > 0)
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> ((rows.map(r => S / r.getLong(2)).sum, rows.size.toLong)) }
    val g2 = Components.harmonicCloseness(edges, Seq(2L, 9L), maxHops = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(g2 == want, "diverged from the bfsDistances aggregate")
  }

  test("weighted ops reject fractional weight columns (silent truncation)") {
    // cast("long") would floor 1.9 → 1 and corrupt ranks/votes with no
    // downstream symptom — every weighted entry point must intercept
    val frac = Seq((1L, 2L, 1.9)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      Components.pageRankWeighted(frac, iters = 1)
    }
    intercept[IllegalArgumentException] {
      Components.labelPropagationWeighted(frac, iters = 1)
    }
    // integral weights of non-long type are fine (cast is lossless)
    val ints = Seq((1, 2, 3), (2, 3, 1)).toDF("src", "dst", "w")
    assert(Components.pageRankWeighted(ints, iters = 1).count() == 3)
    assert(Components.labelPropagationWeighted(ints, iters = 1).count() == 3)
  }

  test("kCore: duplicate and pre-symmetrized edges do not inflate degrees") {
    // simple-graph 2-core of a single edge is EMPTY; a multiplicity-
    // sensitive degree count would give both nodes degree 2 and keep them
    val dup = Seq((1L, 2L), (1L, 2L)).toDF("src", "dst")
    assert(Components.kCore(dup, k = 2).count() == 0,
      "duplicated edge survived the 2-core peel")
    val sym = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    assert(Components.kCore(sym, k = 2).count() == 0,
      "pre-symmetrized edge survived the 2-core peel")
    // and a real triangle still survives k=2 with in-core degree 2
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 3L)).toDF("src", "dst")
    val got = Components.kCore(tri, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"got $got")
  }

  test("modularityParts: isolated labeled nodes count in n_nodes, degree 0") {
    // an external partition may label a node with no incident edge: it
    // must appear in its community's n_nodes (degree 0), not be dropped
    val df = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val comm = Seq((1L, 1L), (2L, 1L), (3L, 1L), (99L, 7L))
      .toDF("id", "community")
    val parts = Components.modularityParts(df, comm).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))))
      .toMap
    // community 1: the triangle (3 nodes, 3 intra, degree sum 6,
    // q_num = 4*3*3 - 36 = 0); community 7: the isolate (1 node, 0
    // intra, degree 0, q_num = 0)
    assert(parts == Map(
      1L -> ((3L, 3L, 6L, 0L)),
      7L -> ((1L, 0L, 0L, 0L))), s"got $parts")
  }

  test("pageRank: one-round values are hand-derivable") {
    // iters=1 on an edgeless-in-one-direction pair: 2 never sources an
    // edge → dangling; exact values hand-derivable: n=2, r0=5e11 each;
    // contrib(2)=5e11, dmass=5e11, share=2.5e11
    val got = Components.pageRank(Seq((1L, 2L)).toDF("src", "dst"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = (15L * 1000000000000L) / 200L
    assert(got(1L) == base + (85L * 250000000000L) / 100L)
    assert(got(2L) == base + (85L * (500000000000L + 250000000000L)) / 100L)
  }
}
