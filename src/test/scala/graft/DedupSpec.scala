package graft

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  // Driver-side 120-bit simhash reference (bit-equal to the Spark
  // expressions per TextHashExprSpec) — shared by the constructed-chain
  // and hub-capture fixtures, which SEARCH token space for signatures
  // with specific hamming/chunk structure.
  private def digest(tk: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(tk.getBytes("UTF-8"))
    .map(b => f"$b%02x").mkString
  private def votesOf(tk: String): Array[Int] = {
    val hex = digest(tk)
    val v = new Array[Int](120)
    for (d <- 0 until 15; b <- 0 until 4) {
      v(d * 4 + b) =
        (Integer.parseInt(hex.charAt(d).toString, 16) >> (3 - b)) & 1
      v(60 + d * 4 + b) =
        (Integer.parseInt(hex.charAt(15 + d).toString, 16) >> (3 - b)) & 1
    }
    v
  }
  private def sig(votes: Array[Int], n: Int): (Long, Long) = {
    var h1 = 0L; var h2 = 0L
    for (b <- 0 until 60) {
      if (votes(b) * 2 > n) h1 |= 1L << (59 - b)
      if (votes(60 + b) * 2 > n) h2 |= 1L << (59 - b)
    }
    (h1, h2)
  }
  private def ham(x: (Long, Long), y: (Long, Long)): Int =
    java.lang.Long.bitCount(x._1 ^ y._1) +
      java.lang.Long.bitCount(x._2 ^ y._2)
  private def chunks(s: (Long, Long)): Seq[Long] = {
    val m = (1L << 30) - 1
    Seq(s._1 & m, (s._1 >> 30) & m, s._2 & m, (s._2 >> 30) & m)
  }

  // d1/d2 exact dups modulo case+whitespace; d3 near-dup of d1 (one word
  // changed); d4 unrelated.
  private lazy val docs: DataFrame = Seq(
    (1L, "The quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the QUICK brown   fox jumps over the lazy dog near the river bank"),
    (3L, "The quick brown fox jumps over the lazy cat near the river bank"),
    (4L, "completely different content about gpu clusters and telemetry data")
  ).toDF("doc_id", "body")

  test("exactGroups collapses case/whitespace duplicates") {
    val g = Dedup.exactGroups(docs, "body", "doc_id").collect()
    assert(g.length == 3) // {1,2}, {3}, {4}
    val dup = g.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("canonical_id") == 1L)
  }

  test("jaccardPairs finds the near-dup pair above threshold") {
    val p = Dedup.jaccardPairs(docs, "body", "doc_id", threshold = 0.5,
      maxShingleFreq = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.contains((1L, 2L))) // exact dup → jaccard 1.0
    assert(p.contains((1L, 3L))) // one word differs in 13 → high overlap
    assert(!p.exists(t => t._1 == 4L || t._2 == 4L))
  }

  test("jaccard of exact dup is 1.0") {
    val j = Dedup.jaccardPairs(docs, "body", "doc_id", threshold = 0.99,
      maxShingleFreq = 0)
      .where($"ida" === 1 && $"idb" === 2).collect()
    assert(j.length == 1 && j(0).getAs[Double]("jaccard") == 1.0)
  }

  test("minhashLshPairs finds exact dup and skips unrelated docs") {
    val p = Dedup.minhashLshPairs(docs, "body", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.contains((1L, 2L)))
    assert(!p.exists(t => t._1 == 4L || t._2 == 4L))
  }

  test("simhash: identical docs hash equal; near-dups within small hamming") {
    val h = Dedup.simhashDocs(docs, "body", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L)) // tokens identical after normalization
    val hamming13 = java.lang.Long.bitCount(h(1L) ^ h(3L))
    val hamming14 = java.lang.Long.bitCount(h(1L) ^ h(4L))
    assert(hamming13 < hamming14)
  }

  test("simhashPairs returns the trivial pair at hamming 0") {
    val p = Dedup.simhashPairs(docs, "body", "doc_id", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p == Set((1L, 2L)))
  }

  test("exactBagGroups collapses token-permuted copies; exactGroups cannot") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"),  // permuted copy of 1
      (3L, "alpha beta gamma delta"),  // exact copy of 1
      (4L, "completely different text here"))
      .toDF("doc_id", "body")
    val bag = Dedup.exactBagGroups(df, "body", "doc_id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(bag.size == 2, s"got $bag")
    assert(bag.values.toSet == Set((1L, 3L), (4L, 1L)),
      s"permuted copy not collapsed: $bag")
    // order-sensitive exactGroups keeps the permuted doc separate
    val exact = Dedup.exactGroups(df, "body", "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(exact == Set((1L, 2L), (2L, 1L), (4L, 1L)), s"got $exact")
  }

  test("simhashPairsWide: exact dup at hamming 0; unrelated doc excluded") {
    val p = Dedup.simhashPairsWide(docs, "body", "doc_id", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p == Set((1L, 2L)), s"got $p")
    // at a loose bound the wide signature must stay a SUBSET of 60-bit
    // candidates' semantics: 120-bit hamming >= 60-bit hamming for the
    // same pair can differ, but the identical-doc pair survives both
    val p3 = Dedup.simhashPairsWide(docs, "body", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p3.contains((1L, 2L)))
    assert(!p3.exists(t => t._1 == 4L || t._2 == 4L),
      "unrelated doc paired by the wide signature")
  }

  test("simhashStarPairsWide: subset of all-pairs; tight clusters get " +
    "identical components; verify values match the all-pairs route") {
    // a planted 4-copy cluster (identical bodies → hamming 0 throughout)
    // plus the base docs: the star route must (a) emit a SUBSET of the
    // all-pairs output with identical hamming values on shared pairs,
    // and (b) produce the SAME connected components for the tight
    // cluster — the blow-up case it exists for, where all members sit
    // within maxHamming of the bucket min.
    val clustered = docs.unionByName(Seq(
      (10L, "stamped template body shared by every replica of this doc"),
      (11L, "stamped template body shared by every replica of this doc"),
      (12L, "stamped template body shared by every replica of this doc"),
      (13L, "stamped template body shared by every replica of this doc"))
      .toDF("doc_id", "body"))
    def pairSet(df: DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val all = pairSet(
      Dedup.simhashPairsWide(clustered, "body", "doc_id", maxHamming = 3))
    val star = pairSet(
      Dedup.simhashStarPairsWide(clustered, "body", "doc_id", maxHamming = 3))
    assert(star.keySet.subsetOf(all.keySet),
      s"star emitted a pair all-pairs did not: ${star.keySet -- all.keySet}")
    star.foreach { case (k, h) =>
      assert(all(k) == h, s"hamming disagreement on $k: star $h vs ${all(k)}")
    }
    // star candidates for the 4-copy cluster: 3 pairs (min 10 ↔ each),
    // vs 6 all-pairs — and identical components either way
    val clusterStar = star.keySet.filter(_._1 >= 10L)
    assert(clusterStar == Set((10L, 11L), (10L, 12L), (10L, 13L)),
      s"got $clusterStar")
    def comps(pairs: Set[(Long, Long)]) = {
      import graft.dedup.Components
      Components.connectedComponents(
          pairs.toSeq.toDF("ida", "idb")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(comps(star.keySet) == comps(all.keySet),
      "tight-cluster components must not differ between star and all-pairs")
  }

  test("simhashStarPairsWideClosed: components == all-pairs on drift chains " +
    "the plain star under-merges; pairs sandwiched between star and all-pairs") {
    // random-walk corpora (each doc = previous doc with a few token
    // substitutions) manufacture hamming CHAINS a−b−c where the
    // endpoints drift past maxHamming — exactly the regime where the
    // plain star loses component links (its measured 0.47-1.74%
    // survivor gap). The closed route must (a) stay a SUBSET of
    // all-pairs with identical hamming values, (b) contain every star
    // pair, and (c) produce IDENTICAL components to all-pairs on every
    // fixture — the equivalence theorem. The sweep must also contain at
    // least one fixture where the PLAIN star's components differ, or it
    // never exercised the regime it exists for.
    import graft.dedup.Components
    val vocab = ("alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi " +
      "psi omega one two three four five six seven eight nine ten").split(" ")
    def walk(seed: Int, docsN: Int, editsPerStep: Int): DataFrame = {
      val rnd = new scala.util.Random(seed)
      val base = Array.fill(24)(vocab(rnd.nextInt(vocab.length)))
      val rows = Iterator.iterate(base) { prev =>
        val next = prev.clone()
        (0 until editsPerStep).foreach { _ =>
          next(rnd.nextInt(next.length)) = vocab(rnd.nextInt(vocab.length))
        }
        next
      }.take(docsN).zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }.toSeq
      rows.toDF("doc_id", "body")
    }
    def pairSet(df: DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    def comps(pairs: Set[(Long, Long)]): Map[Long, Long] =
      if (pairs.isEmpty) Map.empty
      else Components.connectedComponents(pairs.toSeq.toDF("ida", "idb"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (seed <- Seq(1, 2, 3, 4); edits <- Seq(1, 2)) {
      val corpus = walk(seed, 14, edits)
      val all = pairSet(Dedup.simhashPairsWide(corpus, "body", "doc_id", 3))
      val star = pairSet(
        Dedup.simhashStarPairsWide(corpus, "body", "doc_id", 3))
      val closed = pairSet(
        Dedup.simhashStarPairsWideClosed(corpus, "body", "doc_id", 3))
      assert(closed.keySet.subsetOf(all.keySet),
        s"seed=$seed edits=$edits: closed emitted a non-pair " +
          s"${closed.keySet -- all.keySet}")
      closed.foreach { case (k, h) => assert(all(k) == h,
        s"seed=$seed edits=$edits: hamming disagreement on $k") }
      assert(star.keySet.subsetOf(closed.keySet),
        s"seed=$seed edits=$edits: star pair missing from closed " +
          s"${star.keySet -- closed.keySet}")
      assert(comps(closed.keySet) == comps(all.keySet),
        s"seed=$seed edits=$edits: closed components diverged from all-pairs")
    }
  }

  test("simhashStarPairsWideClosed repairs a CONSTRUCTED hamming chain the " +
    "plain star provably under-merges") {
    // Build a−b−c deterministically: b = a + one appended token, c = b +
    // one more, searched (driver-side 120-bit vote reference, the same
    // one TextHashExprSpec proves bit-equal to the Spark exprs) so that
    // ham(a,b) ≤ 3 < ham(a,c), every chunk b shares with c is also a's
    // (so the only hub c ever sees is a, at distance > 3), and a is the
    // min id. Plain star then leaves c edgeless; the closed route's
    // failed-member patch finds the b−c link inside a's bucket and the
    // components equal all-pairs — the theorem on a worst case, not a
    // random draw.
    import graft.dedup.Components
    val baseToks = ("alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon").split(" ").toSeq
    val baseVotes = baseToks.map(votesOf)
      .foldLeft(new Array[Int](120))((acc, v) => {
        for (i <- 0 until 120) acc(i) += v(i); acc
      })
    val sa = sig(baseVotes, baseToks.size)
    val vocab = (0 until 400).map(i => s"w$i")
    val found = (for {
      x <- vocab.iterator
      vx = votesOf(x)
      bv = baseVotes.clone().zipWithIndex.map { case (s, i) => s + vx(i) }
      sb = sig(bv, baseToks.size + 1)
      if ham(sa, sb) >= 1 && ham(sa, sb) <= 3
      y <- vocab.iterator if y != x
      vy = votesOf(y)
      cv = bv.zipWithIndex.map { case (s, i) => s + vy(i) }
      sc = sig(cv, baseToks.size + 2)
      if ham(sb, sc) >= 1 && ham(sb, sc) <= 3
      if ham(sa, sc) >= 4
      // every chunk b shares with c must also be a's chunk, so the only
      // hub c can reach is a (distance > 3 → star leaves c edgeless)
      if chunks(sb).zip(chunks(sc)).zip(chunks(sa))
        .forall { case ((cb, cc), ca) => cb != cc || ca == cb }
    } yield (x, y)).nextOption()
    assert(found.nonEmpty,
      "search space exhausted without a chain witness — widen the vocab")
    val (x, y) = found.get
    val corpus = Seq(
      (0L, baseToks.mkString(" ")),
      (1L, (baseToks :+ x).mkString(" ")),
      (2L, (baseToks :+ x :+ y).mkString(" "))).toDF("doc_id", "body")
    def pairs(df: DataFrame) = df.select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = pairs(Dedup.simhashPairsWide(corpus, "body", "doc_id", 3))
    val star = pairs(Dedup.simhashStarPairsWide(corpus, "body", "doc_id", 3))
    val closed = pairs(
      Dedup.simhashStarPairsWideClosed(corpus, "body", "doc_id", 3))
    assert(all == Set((0L, 1L), (1L, 2L)), s"all-pairs=$all")
    assert(star == Set((0L, 1L)), s"star=$star — expected c edgeless")
    assert(closed == all, s"closed=$closed")
    def comps2(ps: Set[(Long, Long)]): Map[Long, Long] =
      Components.connectedComponents(ps.toSeq.toDF("ida", "idb"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps2(closed) == comps2(all) &&
      comps2(closed).values.toSet == Set(0L),
      "closed must merge the whole chain into one component")
    assert(comps2(star) != comps2(all),
      "the constructed chain no longer diverges under plain star — " +
        "fixture invalid")
  }

  test("simhashPairsWideAdaptive: dispatch boundary — bound ∞ ≡ all-pairs, " +
    "bound 0 ≡ closed, mixed bound strictly sandwiched with identical " +
    "components") {
    // Designed so bound = 4 splits the dispatch: a 6-copy template
    // cluster (every chunk bucket population 6 > 4 → closed-star branch)
    // plus a 3-copy cluster (population 3 ≤ 4 → all-pairs branch) plus
    // the unrelated base docs. The strict sandwich is then witnessed
    // pair-by-pair: the small cluster's non-hub pair (21,22) is in
    // adaptive but NOT in corpus-wide closed (passed members pair only
    // with their hub there), and the hot cluster's non-hub pair (11,12)
    // is in all-pairs but NOT in adaptive — while components match
    // all-pairs exactly on both clusters.
    import graft.dedup.Components
    val template = "stamped template body shared by every replica of this doc"
    val small = "tiny replicated notice body appearing exactly three times"
    val corpus = docs.unionByName(
      ((10L to 15L).map(i => (i, template)) ++
        (20L to 22L).map(i => (i, small))).toDF("doc_id", "body"))
    def pairSet(df: DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val all = pairSet(Dedup.simhashPairsWide(corpus, "body", "doc_id", 3))
    val closed = pairSet(
      Dedup.simhashStarPairsWideClosed(corpus, "body", "doc_id", 3))
    val adaptive = pairSet(Dedup.simhashPairsWideAdaptive(
      corpus, "body", "doc_id", 3, bucketBound = 4))
    // boundary identities: bound ∞ IS all-pairs, pair for pair. Bound 0
    // is guaranteed COMPONENT-equal to the closed route in general (the
    // two pick different hubs — mode-signature min id vs bucket min id);
    // on THIS fixture the hubs coincide (exact-replica buckets put the
    // mode's min id at the bucket min), so the stronger pair-level
    // equality is assertable here — it is a property of the fixture,
    // not of the operator (see the Scaladoc contract).
    assert(pairSet(Dedup.simhashPairsWideAdaptive(
      corpus, "body", "doc_id", 3, bucketBound = Int.MaxValue)) == all,
      "bound ∞ must reproduce simhashPairsWide exactly")
    assert(pairSet(Dedup.simhashPairsWideAdaptive(
      corpus, "body", "doc_id", 3, bucketBound = 0)) == closed,
      "bound 0 must reproduce the closed route on coinciding-hub fixtures")
    // strict sandwich at the mixed bound
    assert(closed.keySet.subsetOf(adaptive.keySet) &&
      adaptive.keySet.subsetOf(all.keySet),
      s"sandwich violated: closed ⊆ adaptive ⊆ all expected")
    adaptive.foreach { case (k, h) => assert(all(k) == h,
      s"hamming disagreement on $k: adaptive $h vs ${all(k)}") }
    assert(adaptive.contains((21L, 22L)) && !closed.contains((21L, 22L)),
      "small-bucket all-pairs branch did not fire")
    assert(all.contains((11L, 12L)) && !adaptive.contains((11L, 12L)),
      "hot-bucket closed branch did not fire")
    // the exactness theorem at the mixed bound
    def comps(pairs: Set[(Long, Long)]): Map[Long, Long] =
      Components.connectedComponents(pairs.toSeq.toDF("ida", "idb"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(adaptive.keySet) == comps(all.keySet),
      "adaptive components diverged from all-pairs")
  }

  test("simhashPairsWideAdaptive: components == all-pairs across drift-walk " +
    "corpora at a bound that forces mixed dispatch") {
    // the same random-walk chain fixtures the closed route is proven on,
    // at bucketBound = 2 so hot buckets go closed while sparse ones stay
    // all-pairs — component equality must hold at ANY bound
    import graft.dedup.Components
    val vocab = ("alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi " +
      "psi omega one two three four five six seven eight nine ten").split(" ")
    def walk(seed: Int, docsN: Int, editsPerStep: Int): DataFrame = {
      val rnd = new scala.util.Random(seed)
      val base = Array.fill(24)(vocab(rnd.nextInt(vocab.length)))
      val rows = Iterator.iterate(base) { prev =>
        val next = prev.clone()
        (0 until editsPerStep).foreach { _ =>
          next(rnd.nextInt(next.length)) = vocab(rnd.nextInt(vocab.length))
        }
        next
      }.take(docsN).zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }.toSeq
      rows.toDF("doc_id", "body")
    }
    def pairSet(df: DataFrame) = df.select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def comps(pairs: Set[(Long, Long)]): Map[Long, Long] =
      if (pairs.isEmpty) Map.empty
      else Components.connectedComponents(pairs.toSeq.toDF("ida", "idb"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (seed <- Seq(1, 2, 3); edits <- Seq(1, 2)) {
      val corpus = walk(seed, 14, edits)
      val all = pairSet(Dedup.simhashPairsWide(corpus, "body", "doc_id", 3))
      val adaptive = pairSet(Dedup.simhashPairsWideAdaptive(
        corpus, "body", "doc_id", 3, bucketBound = 2))
      assert(adaptive.subsetOf(all),
        s"seed=$seed edits=$edits: adaptive emitted a non-pair")
      assert(comps(adaptive) == comps(all),
        s"seed=$seed edits=$edits: adaptive components diverged")
    }
  }

  test("simhashPairsWideAdaptive MODE hub resists low-id stranger capture: " +
    "linear star where the min-id hub degenerates to quadratic patch") {
    // The planted-template-fixture pathology (BASELINE.md r16), as a
    // deterministic witness: 20 IDENTICAL template copies (high ids)
    // share one tight bucket; ONE low-id stranger — searched so its
    // signature fails the hamming verify (ham ≥ 4) yet shares ≥ 1
    // 30-bit chunk with the template, i.e. it lands in the bucket. A
    // min-id hub (the closed route's rule) is CAPTURED by the stranger:
    // every copy fails its hub verify and the patch re-enumerates the
    // whole bucket — the emitted pair count equals all-pairs (190).
    // The adaptive route's MODE-signature hub is a template copy, so
    // enumeration stays linear: exactly n−1 = 19 star pairs. Exactness
    // is hub-independent — components equal all-pairs on every route.
    import graft.dedup.Components
    val baseToks = ("cluster telemetry agent records utilization samples " +
      "for every accelerator and forwards them to the aggregation tier " +
      "where daily marts summarize thermal pressure").split(" ").toSeq
    val baseVotes = baseToks.map(votesOf)
      .foldLeft(new Array[Int](120))((acc, v) => {
        for (i <- 0 until 120) acc(i) += v(i); acc
      })
    val st = sig(baseVotes, baseToks.size)
    val vocab = (0 until 400).map(i => s"q$i")
    val found = (for {
      x <- vocab.iterator
      vx = votesOf(x)
      y <- vocab.iterator if y != x
      vy = votesOf(y)
      sv = baseVotes.clone().zipWithIndex
        .map { case (s0, i) => s0 + vx(i) + vy(i) }
      ss = sig(sv, baseToks.size + 2)
      if ham(st, ss) >= 4 && ham(st, ss) <= 10
      if chunks(st).zip(chunks(ss)).exists { case (a, b) => a == b }
    } yield (x, y)).nextOption()
    assert(found.nonEmpty,
      "search space exhausted without a capture witness — widen the vocab")
    val (x, y) = found.get
    val template = baseToks.mkString(" ")
    val corpus = (Seq((0L, (baseToks :+ x :+ y).mkString(" "))) ++
      (10L to 29L).map(i => (i, template))).toDF("doc_id", "body")
    def pairs(df: DataFrame) = df.select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = pairs(Dedup.simhashPairsWide(corpus, "body", "doc_id", 3))
    val closed = pairs(
      Dedup.simhashStarPairsWideClosed(corpus, "body", "doc_id", 3))
    val adaptive = pairs(Dedup.simhashPairsWideAdaptive(
      corpus, "body", "doc_id", 3, bucketBound = 4))
    assert(all.size == 190, s"all-pairs=${all.size}") // C(20,2), no stranger
    assert(closed.size == 190,
      s"closed=${closed.size} — the capture degradation witness moved")
    assert(adaptive == (11L to 29L).map(j => (10L, j)).toSet,
      s"adaptive=${adaptive.size} pairs — mode hub did not hold")
    def comps(ps: Set[(Long, Long)]): Map[Long, Long] =
      Components.connectedComponents(ps.toSeq.toDF("ida", "idb"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(adaptive) == comps(all),
      "adaptive components diverged under the capture fixture")
  }

  test("simhashPairsWideAdaptive quad branch: a provably majority-failed " +
    "bucket executes the complete-enumeration reroute without spurious pairs") {
    // Deterministic quad-branch execution: two single-token docs whose
    // signatures COLLIDE on chunk 0 (single-token simhash = the token's
    // md5 bit pattern exactly, so a birthday search over ~40k tokens
    // finds a 30-bit chunk collision) but sit ~60 bits apart overall.
    // At bucketBound = 1 their 2-member bucket takes the big branch;
    // every member fails a hub verify against the other (f = 1, n = 2,
    // f·2 > n) so the SECOND-LEVEL dispatch must reroute to complete
    // enumeration — which verifies the pair, finds hamming ≫ 3, and
    // emits NOTHING. A near-dup pair elsewhere in the corpus must
    // still surface. This pins the reroute's execution and its
    // no-spurious-pairs contract; the COST side of the reroute (the
    // 790 s → all-pairs-scale collapse on the captured 10⁴ template
    // bucket) is the committed t10k probe's evidence (BASELINE.md r16).
    val collision = {
      val seen = scala.collection.mutable.HashMap.empty[Long, String]
      var found: Option[(String, String)] = None
      var i = 0
      while (found.isEmpty && i < 200000) {
        val t = s"col$i"
        val s0 = sig(votesOf(t), 1) // single-token sig = its md5 bits
        val c0 = chunks(s0).head
        seen.get(c0) match {
          case Some(prev) if ham(sig(votesOf(prev), 1), s0) > 6 =>
            found = Some((prev, t))
          case None => seen(c0) = t
          case _ => ()
        }
        i += 1
      }
      found
    }
    assert(collision.nonEmpty, "no chunk-0 collision within 200k tokens")
    val (ta, tb) = collision.get
    val corpus = Seq(
      (0L, ta), (1L, tb), // the colliding far pair — quad bucket at bound 1
      (10L, "shared near dup body alpha beta gamma delta"),
      (11L, "shared near dup body alpha beta gamma delta")
    ).toDF("doc_id", "body")
    def pairs(df: DataFrame) = df.select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = pairs(Dedup.simhashPairsWide(corpus, "body", "doc_id", 3))
    val adaptive = pairs(Dedup.simhashPairsWideAdaptive(
      corpus, "body", "doc_id", 3, bucketBound = 1))
    assert(all == Set((10L, 11L)), s"all=$all")
    assert(adaptive == all,
      s"quad reroute emitted spurious or missing pairs: $adaptive")
  }

  test("simhashPairsWideAdaptive at bound 1: every multi-member bucket " +
    "takes the big branch and components still equal all-pairs") {
    // bound 1 maximizes second-level dispatch coverage on the drift-walk
    // corpora: 2-member buckets whose pair fails verify are majority-
    // failed (f·2 > n) and reroute to complete enumeration, passing
    // buckets stay closed-side — component equality must survive any
    // branch mix the data produces.
    import graft.dedup.Components
    val vocab = ("alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi " +
      "psi omega one two three four five six seven eight nine ten").split(" ")
    def walk(seed: Int, docsN: Int, editsPerStep: Int): DataFrame = {
      val rnd = new scala.util.Random(seed)
      val base = Array.fill(24)(vocab(rnd.nextInt(vocab.length)))
      val rows = Iterator.iterate(base) { prev =>
        val next = prev.clone()
        (0 until editsPerStep).foreach { _ =>
          next(rnd.nextInt(next.length)) = vocab(rnd.nextInt(vocab.length))
        }
        next
      }.take(docsN).zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }.toSeq
      rows.toDF("doc_id", "body")
    }
    def pairSet(df: DataFrame) = df.select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def comps(pairs: Set[(Long, Long)]): Map[Long, Long] =
      if (pairs.isEmpty) Map.empty
      else Components.connectedComponents(pairs.toSeq.toDF("ida", "idb"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (seed <- Seq(2, 5); edits <- Seq(2, 3)) {
      val corpus = walk(seed, 12, edits)
      val all = pairSet(Dedup.simhashPairsWide(corpus, "body", "doc_id", 3))
      val adaptive = pairSet(Dedup.simhashPairsWideAdaptive(
        corpus, "body", "doc_id", 3, bucketBound = 1))
      assert(adaptive.subsetOf(all),
        s"seed=$seed edits=$edits: adaptive emitted a non-pair")
      assert(comps(adaptive) == comps(all),
        s"seed=$seed edits=$edits: adaptive components diverged at bound 1")
    }
  }

  test("simhashPairsWideAdaptive star pairs are canonically ordered when a " +
    "passing member's id is LOWER than the mode-signature hub's") {
    // The r16 ADVICE finding: the mode hub is the min id within its
    // SIGNATURE, not the bucket min, so a verified member with a lower
    // id used to emit (hub, id) with ida > idb — breaking the ida < idb
    // invariant every sibling route guarantees. Fixture: 20 identical
    // template copies at ids 10..29 (mode signature, hub = 10) plus 5
    // identical one-token-appended near-dups at ids 1..5 whose signature
    // sits 1-3 hamming bits from the template (searched; a shared chunk
    // is then automatic — ≤ 3 flips over 4 chunks leaves one intact).
    // In the shared buckets the near-dups PASS the hub verify with ids
    // below the hub: the star branch must emit least/greatest, and the
    // whole output must stay duplicate-free and component-exact.
    import graft.dedup.Components
    val baseToks = ("cluster telemetry agent records utilization samples " +
      "for every accelerator and forwards them to the aggregation tier " +
      "where daily marts summarize thermal pressure").split(" ").toSeq
    val baseVotes = baseToks.map(votesOf)
      .foldLeft(new Array[Int](120))((acc, v) => {
        for (i <- 0 until 120) acc(i) += v(i); acc
      })
    val st = sig(baseVotes, baseToks.size)
    val x = (0 until 5000).iterator.map(i => s"q$i").find { t =>
      val vt = votesOf(t)
      val sv = baseVotes.clone().zipWithIndex.map { case (s0, i) => s0 + vt(i) }
      val h = ham(st, sig(sv, baseToks.size + 1))
      h >= 1 && h <= 3
    }
    assert(x.nonEmpty, "no 1-3-hamming one-token append within 5k tokens")
    val template = baseToks.mkString(" ")
    val nearDup = (baseToks :+ x.get).mkString(" ")
    val corpus = ((10L to 29L).map(i => (i, template)) ++
      (1L to 5L).map(i => (i, nearDup))).toDF("doc_id", "body")
    val rows = Dedup.simhashPairsWideAdaptive(
      corpus, "body", "doc_id", 3, bucketBound = 4)
      .select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.forall { case (a, b) => a < b },
      s"unordered star pairs leaked: ${rows.filter(p => p._1 >= p._2).toSeq}")
    assert(rows.length == rows.toSet.size,
      "duplicate undirected pairs survived the final dedup")
    assert(rows.exists { case (a, b) => a <= 5L && b == 10L },
      "fixture regressed: no low-id member paired with the hub")
    def comps(ps: Set[(Long, Long)]): Map[Long, Long] =
      Components.connectedComponents(ps.toSeq.toDF("ida", "idb"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val all = Dedup.simhashPairsWide(corpus, "body", "doc_id", 3)
      .select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(comps(rows.toSet) == comps(all),
      "adaptive components diverged on the low-id-passer fixture")
  }

  test("simhashPairsWideAdaptive supports a STRING idCol end to end " +
    "(mode-hub selection must not arithmetically transform the id)") {
    // The r16 ADVICE finding: hub selection via max(struct(sc, -sid))
    // implicitly cast a string sid to double under non-ANSI semantics,
    // yielding a NULL hub — the withHub inner join then silently dropped
    // every hot-bucket member, losing all pairs with no error. With the
    // min_by rule the id is never transformed: a 20-copy template
    // cluster keyed by string ids must come out fully connected.
    val template = "stamped template body shared by every replica of this doc"
    val corpus = ((10 to 29).map(i => (f"doc-$i%03d", template)) :+
      (("doc-999", "completely unrelated body about accelerator thermals")))
      .toDF("doc_id", "body")
    val pairs = Dedup.simhashPairsWideAdaptive(
      corpus, "body", "doc_id", 3, bucketBound = 4)
      .select("ida", "idb").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pairs.nonEmpty, "hot-bucket pairs vanished — null hub regression")
    assert(pairs.forall { case (a, b) => a < b }, "ordering invariant broken")
    // driver-side union-find: all 20 replicas must land in one component
    val parent = scala.collection.mutable.HashMap.empty[String, String]
    def find(u: String): String = {
      val p = parent.getOrElseUpdate(u, u)
      if (p == u) u else { val r = find(p); parent(u) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val roots = (10 to 29).map(i => find(f"doc-$i%03d")).toSet
    assert(roots.size == 1,
      s"template cluster fragmented into ${roots.size} components")
    assert(!parent.contains("doc-999") || find("doc-999") != roots.head,
      "unrelated doc merged into the template cluster")
  }

  test("simhashPairsWideAdaptive fails loudly when the hot-bucket list " +
    "would not be driver-small, naming bucketBound as the knob") {
    // The broadcast contract, enforced (round 17): many distinct
    // clusters each over the bound means the corpus's NORMAL bucket
    // population exceeds bucketBound — the pinned+broadcast hot list
    // would grow with the corpus. 8 distinct 2-copy clusters at
    // bound 1 yield ~32 hot buckets (4 chunks each, md5-distinct
    // values); maxHotBuckets = 10 must trip the guard BEFORE any
    // routing join is built, and the default budget must accept it.
    val corpus = (0 until 8).flatMap { c =>
      val body = s"replicated notice body variant number $c for the guard " +
        "fixture with enough tokens to hash"
      Seq((c * 10L, body), (c * 10L + 1L, body))
    }.toDF("doc_id", "body")
    val ex = intercept[IllegalArgumentException] {
      Dedup.simhashPairsWideAdaptive(corpus, "body", "doc_id", 3,
        bucketBound = 1, maxHotBuckets = 10L)
    }
    assert(ex.getMessage.contains("bucketBound=1") &&
      ex.getMessage.contains("maxHotBuckets=10"),
      s"guard message must name the knobs: ${ex.getMessage}")
    // same corpus under the default budget: dispatch proceeds and each
    // 2-copy cluster surfaces as one exact pair
    val ok = Dedup.simhashPairsWideAdaptive(
      corpus, "body", "doc_id", 3, bucketBound = 1)
      .select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ok == (0 until 8).map(c => (c * 10L, c * 10L + 1L)).toSet,
      s"guarded dispatch changed the emitted pairs: $ok")
  }

  test("adaptive guard histogram is memoized per (pinned sketch, bound): " +
    "a repeat call re-uses the decision without a new entry") {
    import graft.operators.Artifacts
    val template = "memo fixture body replicated across the bucket bound"
    val corpus = ((0 to 6).map(i => (i.toLong, template)) :+
      ((9L, "some unrelated body text about thermal telemetry marts")))
      .toDF("doc_id", "body")
    def run() = Dedup.simhashPairsWideAdaptive(
      corpus, "body", "doc_id", 3, bucketBound = 4).count()
    val before = Artifacts.memoized(spark)
    val first = run()
    val afterFirst = Artifacts.memoized(spark)
    assert(afterFirst == before + 1,
      s"first call must add exactly one memo entry ($before -> $afterFirst)")
    val second = run()
    assert(Artifacts.memoized(spark) == afterFirst,
      "repeat call with the same sketch plan + bound must hit the memo")
    assert(first == second, "memoized dispatch changed the result")
    // a DIFFERENT bound is a different decision: new entry
    Dedup.simhashPairsWideAdaptive(
      corpus, "body", "doc_id", 3, bucketBound = 2).count()
    assert(Artifacts.memoized(spark) == afterFirst + 1,
      "per-bound keying lost: a new bound must re-measure")
  }

  test("cleanCorpusBest over star pairs equals the all-pairs route on " +
    "tight clusters — the downstream contract the pipeline swap relies on") {
    // same planted replica cluster as above; the clean stage consumes
    // pairs ONLY through connected components, so identical components
    // must yield the identical survivor SET (round 15: PipelineBench's
    // neardup_pairs stage defaults to the star route on this contract)
    import graft.dedup.Components
    val clustered = docs.unionByName(Seq(
      (10L, "stamped template body shared by every replica of this doc"),
      (11L, "stamped template body shared by every replica of this doc"),
      (12L, "stamped template body shared by every replica of this doc"),
      (13L, "stamped template body shared by every replica of this doc"))
      .toDF("doc_id", "body"))
    // score = id: keep-best must keep the HIGHEST id per cluster — the
    // opposite of the min-id canonical, so a wrong winner is visible
    def survivors(pairs: DataFrame) = Components.cleanCorpusBest(
        clustered, pairs.select("ida", "idb"), "doc_id", score = $"doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val star = survivors(
      Dedup.simhashStarPairsWide(clustered, "body", "doc_id", maxHamming = 3))
    val all = survivors(
      Dedup.simhashPairsWide(clustered, "body", "doc_id", maxHamming = 3))
    assert(star == all, s"survivor sets diverged: star $star vs all $all")
    // the best (highest-score) replica survives, not the min-id one
    assert(star.contains(13L) && !star.contains(10L), s"got $star")
  }

  test("winnowPairs maxFpPop drops stop-fingerprint-only pairs") {
    // 6 docs sharing one identical LONG boilerplate block (so the
    // window-min fingerprints land in the shared region, df=6) plus two
    // docs sharing a rare longer overlap
    val boiler = "this agreement is provided as is without warranty of " +
      "any kind either express or implied including fitness for purpose"
    val rows = (1L to 6L).map(i => (i, s"unique$i " + boiler)) ++
      Seq((7L, "alpha beta gamma delta epsilon zeta eta theta"),
        (8L, "alpha beta gamma delta epsilon zeta eta iota"))
    val df = rows.toDF("doc_id", "body")
    val uncapped = Dedup.winnowPairs(df, "body", "doc_id", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // boilerplate docs pair up quadratically without the cut
    assert(uncapped.count(t => t._1 <= 6 && t._2 <= 6) >= 10,
      s"expected dense boilerplate pairs, got $uncapped")
    val capped = Dedup.winnowPairs(df, "body", "doc_id", minShared = 1,
        maxFpPop = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists(t => t._1 <= 6 && t._2 <= 6),
      s"stop-fingerprint pairs survived the cut: $capped")
    assert(capped.contains((7L, 8L)),
      s"rare-overlap pair lost by the cut: $capped")
  }

  test("jaccardPairs with maxShingleFreq drops ubiquitous shingles") {
    // cap=1: every shared shingle is dropped, so no pairs survive
    val p = Dedup.jaccardPairs(docs, "body", "doc_id", threshold = 0.1,
      maxShingleFreq = 1).collect()
    assert(p.isEmpty)
  }

  test("crossExactMatches finds eval docs copied into the corpus") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over it"),
      (2L, "совершенно unrelated document body"),
      (3L, "THE  Quick   Brown fox jumps over it") // normalized dup of 1
    ).toDF("doc_id", "text")
    val evalSet = Seq(
      (100L, "the quick brown fox jumps over it"), // leaked verbatim
      (101L, "clean eval question nobody saw")
    ).toDF("doc_id", "text")
    val got = Dedup.crossExactMatches(corpus, evalSet, "text", "doc_id")
      .select("eval_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // eval 100 matches BOTH corpus copies (case/whitespace normalized)
    assert(got == Set((100L, 1L), (100L, 3L)))
  }

  test("crossNearMatches flags paraphrased leakage, skips clean eval docs") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = Seq(
      (1L, base),
      (2L, "wholly different text about storage engines and columnar files")
    ).toDF("doc_id", "text")
    val evalSet = Seq(
      (100L, base + " phi"),                       // near-dup of corpus 1
      (101L, "independent eval prompt with fresh content words only")
    ).toDF("doc_id", "text")
    val got = Dedup.crossNearMatches(corpus, evalSet, "text", "doc_id",
        threshold = 0.7).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 100L && got(0).getLong(1) == 1L)
    assert(got(0).getDouble(2) >= 0.7)
  }

  test("spanDupStats: shared 5-token span counted, within-doc repeats once") {
    val d = Seq(
      (1L, "one two three four five alpha beta"),   // 7 tokens → 3 spans
      (2L, "one two three four five gamma delta"),  // shares span #1 with d1
      (3L, "totally unrelated text with nothing shared here at"), // 8 → 4 spans
      (4L, "x y z w v x y z w v")  // 10 tokens, 6 windows but 5 DISTINCT spans
    ).toDF("doc_id", "text")
    val got = Dedup.spanDupStats(d, "text", "doc_id", w = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((3L, 1L, 0.333333)))  // only "one..five" duplicated
    assert(got(2L) == ((3L, 1L, 0.333333)))
    assert(got(3L) == ((4L, 0L, 0.0)))
    // the repeated window inside doc 4 dedups per-doc and does NOT make
    // the doc self-duplicated
    assert(got(4L) == ((5L, 0L, 0.0)))
  }

  test("stripDupSpans drops cross-doc spans, keeps rows and order") {
    val d = Seq(
      (1L, "one two three four five alpha beta"),  // span 0 shared → pos 0-4 cut
      (2L, "one two three four five gamma delta"),
      (3L, "totally unrelated text with nothing shared here at"),
      (4L, "x y z w v x y z w v"),      // within-doc repeat only → untouched
      (5L, "one two three four five"),  // fully covered → empty but PRESENT
      (6L, "tiny doc")                  // < w tokens → passes through whole
    ).toDF("doc_id", "text")
    val got = Dedup.stripDupSpans(d, "text", "doc_id", w = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getLong(3)))).toMap
    assert(got(1L) == (("alpha beta", 7, 2L)))
    assert(got(2L) == (("gamma delta", 7, 2L)))
    assert(got(3L) ==
      (("totally unrelated text with nothing shared here at", 8, 8L)))
    assert(got(4L) == (("x y z w v x y z w v", 10, 10L)))
    assert(got(5L) == (("", 5, 0L)))
    assert(got(6L) == (("tiny doc", 2, 2L)))
  }

  test("stripDupSpans w-granularity contract vs exact-substring dedup: " +
    "sub-w shared phrases survive, ≥w shared runs removed exactly") {
    // The suffix-array contrast pinned as behavior (scaladoc contract,
    // round 16): with w playing the minimum-match-length θ,
    //  - a sub-w (3-token) shared phrase generates NO matching 5-span —
    //    kept on both sides (what the formulation does NOT catch);
    //  - an exactly-w shared phrase is removed with nothing else (the
    //    straddling windows mix non-shared context and cannot match);
    //  - an L = 7 > w shared run is removed IN FULL (the 3 interior
    //    windows' position union covers all 7 tokens) with its distinct
    //    neighbors intact — no over-removal beyond the duplicated run.
    val d = Seq(
      (1L, "red green blue white pre1 pre2 one two three four five post1"),
      (2L, "red green blue black mid1 one two three four five mid2 mid3"),
      (3L, "head1 head2 s1 s2 s3 s4 s5 s6 s7 tail1 tail2"),
      (4L, "other1 other2 s1 s2 s3 s4 s5 s6 s7 other3 other4")
    ).toDF("doc_id", "text")
    val got = Dedup.stripDupSpans(d, "text", "doc_id", w = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getLong(3)))).toMap
    // docs 1/2 share the sub-w prefix "red green blue" (3 < 5 tokens —
    // must survive) AND the exactly-w run "one two three four five"
    // (must go, alone)
    assert(got(1L) ==
      (("red green blue white pre1 pre2 post1", 12, 7L)),
      s"got ${got(1L)}")
    assert(got(2L) ==
      (("red green blue black mid1 mid2 mid3", 12, 7L)),
      s"got ${got(2L)}")
    // docs 3/4 share a 7-token run: removed in full, neighbors intact
    assert(got(3L) == (("head1 head2 tail1 tail2", 11, 4L)),
      s"got ${got(3L)}")
    assert(got(4L) == (("other1 other2 other3 other4", 11, 4L)),
      s"got ${got(4L)}")
  }

  test("stripDupSpans exactVerify: a non-token-aligned char run the span " +
    "hash misses is removed on the FLAGGED pair only") {
    // The round-17 opt-in verify: docs 1/2 share (a) a 5-token span —
    // the FLAG, removed by the token path in both modes — and (b) a
    // 4-aligned-token run (below w = 5, invisible to the span hash)
    // whose CHARACTER run clears minMatchChars because the left edge
    // continues mid-token: doc1's "prefixed" sits whole inside doc2's
    // "xprefixed", so the shared char run is
    // "prefixed wonderful synthetic duplicated boilerplate fragment"
    // (doc-1-token-aligned on the left, mid-token on both right edges).
    // exactVerify = false keeps all of it; = true drops every token
    // whose chars are FULLY covered (doc1: prefixed + the 4 interior;
    // doc2: the 4 interior only — "xprefixed"/"fragmentb" are partially
    // covered and must stay, the token-aligned output contract).
    val flag = "alpha beta gamma delta epsilon"
    val d = Seq(
      (1L, s"one unique opening $flag middle prefixed wonderful synthetic " +
        "duplicated boilerplate fragmenta closing words here"),
      (2L, s"totally different start $flag then xprefixed wonderful " +
        "synthetic duplicated boilerplate fragmentb other ending tokens"),
      (3L, "completely unrelated prose about telemetry marts and shuffles")
    ).toDF("doc_id", "body")
    def cm(df: DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val off = cm(Dedup.stripDupSpans(d, "body", "doc_id", w = 5))
    val on = cm(Dedup.stripDupSpans(d, "body", "doc_id", w = 5,
      exactVerify = true, minMatchChars = 25))
    // the flag span goes in BOTH modes (token path)
    Seq(off, on).foreach { m =>
      assert(!m(1L).contains("alpha") && !m(2L).contains("epsilon"), m(1L))
    }
    // OFF: the sub-w aligned run survives — the stated recall gap
    Seq("wonderful", "synthetic", "duplicated", "boilerplate").foreach { t =>
      assert(off(1L).contains(t) && off(2L).contains(t), s"$t missing OFF")
    }
    assert(off(1L).contains("prefixed"))
    // ON: fully-covered tokens dropped on both sides of the pair
    Seq("wonderful", "synthetic", "duplicated", "boilerplate").foreach { t =>
      assert(!on(1L).contains(t) && !on(2L).contains(t), s"$t kept ON")
    }
    assert(!on(1L).contains("prefixed"),
      "doc1's edge token sits whole inside doc2's — must drop")
    assert(on(2L).contains("xprefixed") && on(2L).contains("fragmentb") &&
      on(1L).contains("fragmenta"),
      "partially-covered edge tokens must stay (token-aligned output)")
    // unique prose and the unflagged doc untouched
    assert(on(1L).contains("closing") && on(2L).contains("ending"))
    assert(on(3L) == off(3L) && on(3L).contains("unrelated"))
  }

  test("stripSelfRepeats keeps first occurrence, drops later repeats") {
    val d = Seq(
      (1L, "x y z w v x y z w v"),          // exact self-repeat → first kept
      (2L, "one two three four five six"),  // no repeats → untouched
      (3L, "tiny"),                         // < w → untouched
      // cross-doc sharing is NOT intra-doc repetition: doc 4 repeats
      // nothing within itself even though doc 1 contains its text
      (4L, "x y z w v")
    ).toDF("doc_id", "text")
    val got = Dedup.stripSelfRepeats(d, "text", "doc_id", w = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getLong(3)))).toMap
    assert(got(1L) == (("x y z w v", 10, 5L)))
    assert(got(2L) == (("one two three four five six", 6, 6L)))
    assert(got(3L) == (("tiny", 1, 1L)))
    assert(got(4L) == (("x y z w v", 5, 5L)))
  }

  test("stripSelfRepeats native kernel matches the shuffled formulation") {
    // parity on the real fixture WITH the planted repetition the driver
    // query uses (docs id%4==1 repeat their own first six tokens), plus
    // overlapping-repeat and all-covered shapes the synthetic rows add
    import graft.text.TextFunctions.tokens
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val planted = docs.withColumn("text",
      when(col("doc_id") % 4 === 1,
        concat(col("text"), lit(" "),
          concat_ws(" ", slice(tokens(col("text")), 1, 6))))
      .otherwise(col("text")))
    val extra = Seq(
      (900001L, "a b c d e a b c d e a b c d e"),   // triple repeat
      (900002L, "p q r s t u p q r s t u"),         // overlapping w-spans
      (900003L, "m m m m m m m m m m m m")          // degenerate 1-token vocab
    ).toDF("doc_id", "text")
    val in = planted.select("doc_id", "text").unionByName(extra)
    val fast = Dedup.stripSelfRepeats(in, "text", "doc_id", w = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getLong(3)))).toMap
    val ref = Dedup.stripSelfRepeatsShuffled(in, "text", "doc_id", w = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getLong(3)))).toMap
    assert(fast.keySet == ref.keySet)
    val diff = fast.keys.filter(k => fast(k) != ref(k))
    assert(diff.isEmpty,
      s"native/shuffled divergence on ids ${diff.take(5).toSeq}: " +
        diff.take(2).map(k => s"$k fast=${fast(k)} ref=${ref(k)}").mkString("; "))
    // and the plan really is shuffle-free: no exchange anywhere
    val plan = Dedup.stripSelfRepeats(in, "text", "doc_id", w = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"stripSelfRepeats must be a pure map, found exchange in:\n${plan.take(800)}")
  }

  test("winnowing: a shared w+k-1 token run guarantees a shared fingerprint") {
    val shared = "quick brown fox jumps over lazily" // 6 = w + k - 1 tokens
    val d = Seq(
      (1L, s"unique opening words then $shared and unique tail one"),
      (2L, s"different prefix entirely $shared closing differently two"),
      (3L, "totally unrelated content about gpu telemetry and clusters")
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(d, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty) // the SIGMOD'03 guarantee
    // fingerprints are sparser than the gram stream (12 grams per doc)
    assert(fps(1L).size < 12)
    val pairs = Dedup.winnowPairs(d, "text", "doc_id", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(t => t._1 == 3L || t._2 == 3L))
  }

  test("containmentPairs catches subset duplication jaccard misses") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon"), // all 3 shingles inside doc 2
      (2L, "alpha beta gamma delta epsilon plus lots of extra unrelated " +
        "words here to dilute jaccard badly"),
      (3L, "completely different text with nothing shared at all")
    ).toDF("doc_id", "text")
    // symmetric jaccard (3/14 ≈ 0.21) never fires at 0.5 …
    assert(Dedup.jaccardPairs(d, "text", "doc_id", threshold = 0.5,
      maxShingleFreq = 0).isEmpty)
    // … but containment(1 ⊆ 2) = 3/3 = 1.0 does, directionally
    val c = Dedup.containmentPairs(d, "text", "doc_id", threshold = 0.9,
      maxShingleFreq = 0).collect()
    assert(c.length == 1)
    assert(c(0).getLong(0) == 1L && c(0).getLong(1) == 2L)
    assert(c(0).getDouble(2) == 1.0)
  }

  test("crossSpanMatches flags train docs containing an eval span") {
    val ev = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "alpha beta gamma delta epsilon unrelated tail")  // shares span 0
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro words alpha beta gamma delta epsilon closing remark"),
      (2L, "nothing shared at all here with the eval set ok")
    ).toDF("doc_id", "text")
    val got = Dedup.crossSpanMatches(corpus, ev, "text", "doc_id", w = 5)
      .collect()
    // doc 1: 9 tokens → 5 spans, exactly one ("alpha…epsilon") in the
    // eval span set — counted ONCE though two eval docs contain it;
    // doc 2 clean → absent
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L)
    assert(got(0).getInt(1) == 5 && got(0).getLong(2) == 1L)
    assert(got(0).getDouble(3) == 0.2)
  }

  test("lshPlan hits the requested threshold within the hash budget") {
    val (b, r, tStar) = Dedup.lshPlan(0.7, maxHashes = 128)
    assert(b * r <= 128 && math.abs(tStar - 0.7) < 0.02, s"($b, $r, $tStar)")
    // the planner's curve formula: t* = (1/b)^(1/r)
    assert(math.abs(tStar - math.pow(1.0 / b, 1.0 / r)) < 1e-12)
    // tighter budgets land farther from the target, never above it in cost
    val (b2, r2, t2) = Dedup.lshPlan(0.7, maxHashes = 12)
    assert(b2 * r2 <= 12 && math.abs(t2 - 0.7) <= 0.2, s"($b2, $r2, $t2)")
    intercept[IllegalArgumentException] { Dedup.lshPlan(1.0) }
  }

  test("jaccardPairsPrefix == exact jaccardPairs on randomized corpora") {
    val rng = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    // random docs + planted near-dup copies (one word changed)
    val base = (1L to 30L).map { i =>
      (i, Seq.fill(8 + rng.nextInt(8))(vocab(rng.nextInt(vocab.size)))
        .mkString(" "))
    }
    val copies = base.take(8).map { case (i, t) =>
      (i + 100L, t.split(" ").updated(0, "changed").mkString(" "))
    }
    val df = (base ++ copies).toDF("doc_id", "body")
    for (thr <- Seq(0.5, 0.7, 0.8); byDf <- Seq(true, false)) {
      def pairs(d: DataFrame) = d.select("ida", "idb", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val exact = pairs(Dedup.jaccardPairs(df, "body", "doc_id", thr, 0))
      val pref = pairs(Dedup.jaccardPairsPrefix(df, "body", "doc_id", thr,
        dfOrder = byDf))
      assert(pref == exact, s"thr=$thr dfOrder=$byDf prefix=$pref exact=$exact")
    }
  }

  test("incrementalNearDups == full-batch pairs minus old-old pairs") {
    // old corpus: 1,2 are dups of each other; new batch: 5 dups 1 (and
    // therefore 2), 6 dups 7 (new-new), 8 unrelated
    val old = Seq(
      (1L, "The quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the QUICK brown fox jumps over the lazy dog near the river bank"),
      (4L, "completely different content about gpu clusters and telemetry data")
    ).toDF("doc_id", "body")
    val fresh = Seq(
      (5L, "The quick brown fox jumps over the lazy dog near the river bank"),
      (6L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"),
      (7L, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu"),
      (8L, "nothing in common with anything else in either batch at all")
    ).toDF("doc_id", "body")
    def pairSet(df: DataFrame) = df.select("ida", "idb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val incr = pairSet(Dedup.incrementalNearDups(old, fresh,
      Dedup.bandIndex(old, "body", "doc_id"), "body", "doc_id", 0.7))
    val full = pairSet(Dedup.minhashLshPairs(
      old.unionByName(fresh), "body", "doc_id", 0.7))
    val oldOld = pairSet(Dedup.minhashLshPairs(old, "body", "doc_id", 0.7))
    assert(incr == (full -- oldOld), s"incr=$incr full=$full oldOld=$oldOld")
    // must include old-new (1,5) and new-new (6,7), and never re-report (1,2)
    assert(incr.contains((1L, 5L)) && incr.contains((6L, 7L)))
    assert(!incr.contains((1L, 2L)))
  }

  test("incrementalNearDups: collected-candidate route == distributed fallback, and pushes ids to the scan") {
    val old = Seq(
      (1L, "The quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the QUICK brown fox jumps over the lazy dog near the river bank"),
      (4L, "completely different content about gpu clusters and telemetry data")
    ).toDF("doc_id", "body")
    val fresh = Seq(
      (5L, "The quick brown fox jumps over the lazy dog near the river bank"),
      (6L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"),
      (7L, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu")
    ).toDF("doc_id", "body")
    val idx = Dedup.bandIndex(old, "body", "doc_id")
    def pairSet(df: DataFrame) = df.select("ida", "idb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // collectCandLimit = 0 can never hold a nonempty candidate set →
    // exercises the distributed semi-join fallback on the same input
    val pushed = pairSet(Dedup.incrementalNearDups(
      old, fresh, idx, "body", "doc_id", 0.7))
    val fallback = pairSet(Dedup.incrementalNearDups(
      old, fresh, idx, "body", "doc_id", 0.7, collectCandLimit = 0))
    assert(pushed == fallback && pushed.contains((1L, 5L)))
    // with a parquet-backed corpus the literal id predicate must reach
    // the scan (row-group pruning is what converts the per-epoch corpus
    // touch from O(history bytes) to O(candidate row groups))
    val dir = java.nio.file.Files.createTempDirectory("graft-incr-push").toString
    old.write.mode("overwrite").parquet(dir)
    val lakeCorpus = spark.read.parquet(dir)
    val out = Dedup.incrementalNearDups(
      lakeCorpus, fresh, idx, "body", "doc_id", 0.7)
    assert(pairSet(out) == pushed)
    // AQE hides scan nodes from executedPlan.collect; the plan STRING
    // renders the full tree (same technique as PlanSpec's q16/q6)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [In(doc_id") ||
      p.contains("PushedFilters: [IsNotNull(doc_id), In(doc_id"),
      "candidate-id In predicate not pushed to the corpus scan\n" +
        p.linesIterator.filter(_.contains("PushedFilters"))
          .mkString("\n"))
  }

  test("editDistancePairs finds pairs within threshold, with exact distances") {
    val fuzz = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // dist 3 to 1
      (3L, "the quick brown fox jumped over the lazy dog"), // dist 2 to 1
      (4L, "a completely unrelated string about telemetry")
    ).toDF("doc_id", "body")
    val got = Dedup.editDistancePairs(fuzz, "body", "doc_id", maxDist = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got((1L, 2L)) == 3)
    assert(got((1L, 3L)) == 2)
    // 2↔3 differ by cat/dog AND jumps/jumped: distance 5 > 4 — excluded
    assert(!got.contains((2L, 3L)))
    assert(!got.keys.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("editDistancePairs length blocking catches pairs straddling a band edge") {
    // len("abcdefgh") = 8 → band 1 at maxDist=3 (width 4 ⇒ 8/4 = 2)…
    // pick strings whose lengths fall in ADJACENT bands: len 7 (band 1)
    // vs len 8 (band 2) at width 4; dist 1 must still be found, in both
    // id orders.
    val edge = Seq(
      (10L, "abcdefg"), (11L, "abcdefgh"), // adjacent bands, dist 1
      (12L, "abcdefgx")                    // same band as 11, dist 1 to 11
    ).toDF("doc_id", "body")
    val got = Dedup.editDistancePairs(edge, "body", "doc_id", maxDist = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got((10L, 11L)) == 1)
    assert(got((11L, 12L)) == 1)
    assert(got((10L, 12L)) == 1) // insert trailing x
  }

  test("editDistanceVerify over LSH candidates matches the self-contained operator") {
    val fuzz = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "the quick brown fox jumped over the lazy dog"),
      (4L, "a completely unrelated string about telemetry")
    ).toDF("doc_id", "body")
    // candidates from the exact inverted shingle index (deterministic
    // full recall at this threshold) — banding recall is not the
    // variable under test; the verify stage's recall is exactly its
    // candidate stream's
    val cands = Dedup.jaccardPairs(fuzz, "body", "doc_id",
      threshold = 0.2, maxShingleFreq = 0)
    val viaLsh = Dedup.editDistanceVerify(cands, fuzz, "body", "doc_id",
        maxDist = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val direct = Dedup.editDistancePairs(fuzz, "body", "doc_id", maxDist = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(viaLsh == direct, s"viaLsh=$viaLsh direct=$direct")
    assert(viaLsh.contains((1L, 2L)) && viaLsh.contains((1L, 3L)))
  }

  test("editDistancePairs: band-population guard reroutes a single-band corpus via LSH") {
    // Every doc is 30 four-char digit words => identical length 149 =>
    // ONE length band holds the whole corpus (the adversarial shape the
    // maxBandPop contract exists for). 20 planted near-dups at dist 1.
    def doc(i: Int): String =
      (0 until 30).map(j => f"${(i * 31 + j * 7 + i * j) % 9000 + 1000}%04d")
        .mkString(" ")
    val corpus = ((0 until 240).map(i => (i.toLong, doc(i))) ++
      (0 until 20).map(i => (1000L + i, doc(i).init + "x")))
      .toDF("doc_id", "body")

    val guarded = Dedup.editDistancePairs(corpus, "body", "doc_id",
      maxDist = 2, maxBandPop = 50)
    // the reroute is visible in the plan: LSH banding posexplodes band keys
    assert(guarded.queryExecution.optimizedPlan.toString.contains("posexplode"),
      "guard should have routed candidates through LSH banding")
    val exact = Dedup.editDistancePairs(corpus, "body", "doc_id",
      maxDist = 2, maxBandPop = 0)
    assert(!exact.queryExecution.optimizedPlan.toString.contains("posexplode"),
      "maxBandPop = 0 must keep the lossless length-band join")

    val got = guarded.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = exact.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(want.size == 20 && want.forall(_._3 == 1))
    assert(got == want)
  }

  test("editDistancePairs: sub-3-token docs survive the LSH reroute (no shingle blind spot)") {
    // 260 two-token docs of identical length — one band, no 3-shingles:
    // the adversarial shape where pure LSH banding would be ABSOLUTELY
    // blind (not S-curve-lossy). 10 planted distance-0 duplicates and
    // one short-vs-long pair within distance 2 must all survive the
    // guard's reroute.
    def code(i: Int): String = f"${i % 997}%04d ${(i * 7) % 997}%04d"
    val corpus = ((0 until 260).map(i => (i.toLong, code(i))) ++
      (0 until 10).map(i => (1000L + i, code(i))) ++          // exact dups
      Seq((2000L, code(0) + " x"))                            // short-long
      ).toDF("doc_id", "body")

    val guarded = Dedup.editDistancePairs(corpus, "body", "doc_id",
      maxDist = 2, maxBandPop = 50)
    val exact = Dedup.editDistancePairs(corpus, "body", "doc_id",
      maxDist = 2, maxBandPop = 0)
    val got = guarded.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = exact.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert((0 until 10).forall(i =>
      want.contains((i.toLong, 1000L + i, 0))), want)
    assert(want.contains((0L, 2000L, 2)), "short-long pair missing from exact")
    assert(got == want, s"reroute lost pairs: ${(want -- got).take(5)}")
  }

  test("lshRouteCandidates (the q_dedup_fuzzy_lsh generator) covers sub-3-token docs") {
    // The query-facing generator must be the SAME one the reroute uses:
    // a fixture regenerated with short docs would otherwise silently
    // split q_dedup_fuzzy_lsh (pure banding, blind to <3-token docs)
    // from its lossless oracle. Verify through the full verify tail.
    val corpus = Seq(
      (1L, "ab cd"), (2L, "ab ce"),                       // short-short, dist 1
      (3L, "one two three four five"), (4L, "one two three four fivx"),
      (5L, "zq pr")                                       // short, no partner
    ).toDF("doc_id", "body")
    val got = Dedup.editDistanceVerify(
        Dedup.lshRouteCandidates(corpus, "body", "doc_id", maxDist = 2),
        corpus, "body", "doc_id", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = Dedup.editDistancePairs(corpus, "body", "doc_id",
        maxDist = 2, maxBandPop = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(exact.contains((1L, 2L, 1)), exact)
    assert(got == exact, s"route lost pairs: ${exact -- got}")
  }

  test("editDistancePairs: exact duplicates come back at distance 0") {
    val same = Seq((1L, "identical text"), (2L, "identical text"))
      .toDF("doc_id", "body")
    val got = Dedup.editDistancePairs(same, "body", "doc_id", maxDist = 2)
      .collect()
    assert(got.length == 1 && got(0).getInt(2) == 0)
  }
}
