package graft

import graft.ml.IsolationForest
import graft.telemetry.{Gold, Silver}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen

/** Property tests promised in SURVEY.md §5: invariants that must hold for
  * ARBITRARY inputs, not just the fixtures. Raw ScalaCheck generators with
  * fixed per-case seeds (the scalatestplus bridge isn't on the offline
  * classpath) — 20 generated cases per property, reproducible.
  */
class PropertySpec extends SparkSpecBase {

  private def cases[T](gen: Gen[T], n: Int = 20): Seq[T] =
    (0 until n).flatMap { i =>
      gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
    }

  private val jobSchema = StructType(Seq(
    StructField("job_name", StringType),
    StructField("inst_id", StringType),
    StructField("user", StringType),
    StructField("status", StringType),
    StructField("start_time", LongType),
    StructField("end_time", LongType)))

  private val jobGen: Gen[(String, Long, Option[Long])] = for {
    name <- Gen.identifier.map(_.take(8))
    start <- Gen.choose(0L, 10_000_000L)
    dur <- Gen.option(Gen.choose(0L, 500_000L))
  } yield (name, start, dur.map(start + _))

  test("run_time_sec is non-negative when end >= start, NULL when running") {
    for (jobs <- cases(Gen.listOfN(30, jobGen)) if jobs.nonEmpty) {
      {
        val rows = jobs.map { case (n, st, end) =>
          Row(n, s"i-$n", "u", end.fold("Running")(_ => "Terminated"),
            st, end.orNull)
        }
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(rows), jobSchema)
        val out = Silver.jobs(df).collect()
        out.foreach { r =>
          val idx = r.fieldIndex("run_time_sec")
          if (r.isNullAt(r.fieldIndex("end_time"))) assert(r.isNullAt(idx))
          else assert(r.getLong(idx) >= 0)
        }
      }
    }
  }

  private val metricGen: Gen[(Long, Option[Double], Double)] = for {
    ts <- Gen.choose(0L, 86400L * 30)
    gpu <- Gen.option(Gen.choose(0.0, 100.0))
    cpu <- Gen.choose(0.0, 100.0)
  } yield (ts, gpu, cpu)

  test("gold daily: one row per distinct day, p95 between min and max") {
    for (ms <- cases(Gen.listOfN(60, metricGen), 10) if ms.exists(_._2.isDefined)) {
      {
        import spark.implicits._
        val df = ms.map { case (ts, gpu, cpu) =>
          ("m1", "w1", ts, gpu.map(Double.box).orNull, cpu)
        }.toDF("machine_id", "worker_name", "ts", "gpu_util_pct", "cpu_util_pct")
          .selectExpr("machine_id", "worker_name", "ts",
            "CAST(gpu_util_pct AS DOUBLE) gpu_util_pct", "cpu_util_pct")
        val out = Gold.clusterUtilDaily(df).collect()
        val validDays = ms.filter(_._2.isDefined).map(_._1 / 86400L).distinct
        assert(out.length == validDays.length)
        val byDay = ms.filter(_._2.isDefined).groupBy(_._1 / 86400L)
        out.foreach { r =>
          val vals = byDay(r.getTimestamp(0).toInstant.getEpochSecond / 86400L)
            .flatMap(_._2)
          val p95 = r.getDouble(r.fieldIndex("p95_gpu_util"))
          assert(p95 >= vals.min - 1e-9 && p95 <= vals.max + 1e-9)
        }
      }
    }
  }

  test("isolation forest: transform preserves rows, flags are 0/1, rate tracks contamination") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val data = Seq.fill(200)((rng.nextGaussian(), rng.nextGaussian())).toDF("a", "b")
    val model = IsolationForest.fit(data, Seq("a", "b"), contamination = 0.1)
    val scored = model.transform(data).collect()
    assert(scored.length == 200)
    val flags = scored.map(_.getAs[Int]("anomaly_flag"))
    assert(flags.forall(f => f == 0 || f == 1))
    val rate = flags.sum.toDouble / flags.length
    assert(rate >= 0.02 && rate <= 0.25, s"flag rate $rate far from contamination 0.1")
  }

  test("scored output preserves dt uniqueness (contract of the scored table)") {
    import spark.implicits._
    val gold = (1 to 40).map(d =>
      (s"2024-01-$d", 30.0 + d % 7, 50.0 + d % 11, 40.0 + d % 5))
      .toDF("dt", "avg_gpu_util", "p95_gpu_util", "avg_cpu_util")
    val model = IsolationForest.fit(gold,
      Seq("avg_gpu_util", "p95_gpu_util", "avg_cpu_util"))
    val scored = model.transform(gold)
    assert(scored.count() == 40)
    assert(scored.select("dt").distinct().count() == 40)
  }

  test("packing partitions every doc exactly once; fill never exceeds budget+straddle") {
    import spark.implicits._
    val docGen: Gen[List[Int]] = Gen.listOfN(40, Gen.choose(0, 30))
    for (tokenCounts <- cases(docGen, n = 10) if tokenCounts.nonEmpty) {
      val docs = tokenCounts.zipWithIndex
        .map { case (nt, i) => (i.toLong, Seq.fill(nt)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val budget = 50
      val stats = graft.text.Packing
        .packStats(docs, "doc_id", "text", budget).collect()
      // partition property: every doc in exactly one pack
      assert(stats.map(_.getLong(1)).sum == tokenCounts.length)
      // token conservation: packs carry exactly the corpus token count
      assert(stats.map(_.getLong(2)).sum == tokenCounts.map(_.toLong).sum)
      // fill bound: a pack holds < budget tokens that STARTED in it plus
      // at most one straddling tail; since every doc here is ≤ 30 tokens,
      // no pack can exceed budget + 30 - 1
      assert(stats.forall(_.getLong(2) <= budget + 29),
        stats.map(r => (r.getLong(0), r.getLong(2))).toSeq.toString)
      // contiguity: pack ids of consecutive docs are non-decreasing
      val perDoc = graft.text.Packing
        .packBySize(docs, "doc_id", "text", budget)
        .orderBy("doc_id").collect().map(_.getLong(3))
      assert(perDoc.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    }
  }

  test("attribution join equals the brute-force pair filter on random streams") {
    import spark.implicits._
    val evGen: Gen[(Long, Long, Long, Boolean)] = for {
      id <- Gen.choose(0L, 100000L)
      user <- Gen.choose(1L, 5L)
      t <- Gen.choose(0L, 7200L) // two hours of seconds
      isClick <- Gen.oneOf(true, false)
    } yield (id, user, t, isClick)
    for (evs0 <- cases(Gen.listOfN(60, evGen), n = 5)) {
      val evs = evs0.distinctBy(_._1) // unique event ids
      val horizon = 1800L
      def frame(rows: Seq[(Long, Long, Long, Boolean)]) = rows
        .map { case (id, u, t, _) =>
          (id, new java.sql.Timestamp(t * 1000L), u, 1.0) }
        .toDF("event_id", "ts", "user_id", "value")
      val clicks = evs.filter(_._4)
      val purchases = evs.filterNot(_._4)
      if (clicks.nonEmpty && purchases.nonEmpty) {
        val got = graft.streaming.StreamingTelemetry.attributionJoin(
            frame(clicks), frame(purchases), "30 minutes")
          .select("click_id", "purchase_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = (for {
          c <- clicks; p <- purchases
          if c._2 == p._2 && p._3 >= c._3 && p._3 <= c._3 + horizon
        } yield (c._1, p._1)).toSet
        assert(got == want, s"attribution mismatch: got ${got.size}, want ${want.size}")
      }
    }
  }

  test("int8 quantization: error bounded by scale/2 per dimension, extremes in [-127,127]") {
    import spark.implicits._
    val vecGen: Gen[List[Double]] =
      Gen.listOfN(16, Gen.choose(-100.0, 100.0))
    for ((vec, i) <- cases(vecGen, n = 20).zipWithIndex if vec.exists(_ != 0.0)) {
      val df = Seq((i.toLong, vec)).toDF("id", "vec")
      val r = graft.similarity.VectorOps.quantizeInt8Stats(df).collect()(0)
      val scale = vec.map(math.abs).max / 127.0
      assert(r.getLong(3) >= -127L && r.getLong(4) <= 127L)
      // round() is within half a step per dimension
      assert(r.getDouble(5) <= 16 * scale / 2.0 + 1e-9,
        s"recon_err ${r.getDouble(5)} vs bound ${16 * scale / 2.0}")
    }
  }

  test("token budget: kept ≤ budget + one overshoot doc, kept set monotone in budget") {
    import spark.implicits._
    val rowGen: Gen[List[(String, Long, Long)]] = Gen.listOfN(40, for {
      key <- Gen.oneOf("a", "b", "c")
      id <- Gen.choose(1L, 1000000L)
      w <- Gen.choose(1L, 500L)
    } yield (key, id, w))
    for (rows0 <- cases(rowGen, n = 10) if rows0.nonEmpty) {
      val rows = rows0.distinctBy(_._2) // ids must be unique
      val df = rows.toDF("key", "id", "w")
      val maxW = rows.map(_._3).max
      def kept(budget: Long): Map[String, Seq[Long]] = graft.sampling.Sampling
        .tokenBudgetPerKey(df, "key", "w", budget,
          org.apache.spark.sql.functions.col("id"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      val k1 = kept(800L)
      // per-key kept weight never exceeds budget + (last doc's overshoot)
      val weightOf = rows.map(r => r._2 -> r._3).toMap
      k1.foreach { case (key, ids) =>
        val tot = ids.map(weightOf).sum
        assert(tot < 800L + maxW, s"key $key kept $tot")
      }
      // monotone: a larger budget keeps a superset per key
      val k2 = kept(1600L)
      k1.foreach { case (key, ids) =>
        assert(ids.toSet.subsetOf(k2.getOrElse(key, Nil).toSet))
      }
    }
  }

  test("containment dominates jaccard; winnow pairs share a real shingle") {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    val docGen = Gen.listOfN(12, Gen.oneOf(vocab)).map(_.mkString(" "))
    for (texts <- cases(Gen.listOfN(12, docGen), n = 5) if texts.nonEmpty) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // containment(a ⊆ b) = inter/na ≥ inter/(na+nb-inter) = jaccard,
      // so every jaccard-θ pair must reappear (both directions checked)
      val j = graft.dedup.Dedup.jaccardPairs(docs, "text", "doc_id",
        threshold = 0.6, maxShingleFreq = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val c = graft.dedup.Dedup.containmentPairs(docs, "text", "doc_id",
        threshold = 0.6, maxShingleFreq = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(j.forall(p => c.contains(p) || c.contains(p.swap)),
        s"jaccard pair missing from containment: ${j.diff(c)}")
      // winnowed fingerprints are a subset of the k-gram hash stream, so
      // winnow pairs can only link docs that share at least one shingle
      val sh = graft.dedup.Dedup.jaccardPairs(docs, "text", "doc_id",
        threshold = 0.0, maxShingleFreq = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = graft.dedup.Dedup.winnowPairs(docs, "text", "doc_id",
        minShared = 1).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(w.subsetOf(sh), s"winnow-only pairs: ${w.diff(sh)}")
    }
  }

  test("corpusDiff: identical snapshots diff empty; diff inverts on swap") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, s"doc number $i content"))
      .toDF("doc_id", "text")
    assert(graft.operators.Cdc.corpusDiff(docs, docs, "text", "doc_id")
      .isEmpty)
    val newer = docs.filter($"doc_id" =!= 7L)
    val d1 = graft.operators.Cdc.corpusDiff(docs, newer, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val d2 = graft.operators.Cdc.corpusDiff(newer, docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d1 == Set((7L, "removed")) && d2 == Set((7L, "added")))
  }

  test("temperature thresholds: in (0, 10000], monotone non-increasing in weight") {
    import spark.implicits._
    val wGen: Gen[List[Long]] = Gen.listOfN(8, Gen.choose(1L, 100000L))
    for (ws <- cases(wGen, n = 10) if ws.nonEmpty) {
      val df = ws.zipWithIndex.map { case (w, i) => (s"k$i", 1L, w) }
        .toDF("key", "id", "w")
      val thr = graft.sampling.Sampling
        .temperatureThresholds(df, "key", "w")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val byKey = ws.zipWithIndex.map { case (w, i) => s"k$i" -> w }.toMap
      thr.values.foreach(t => assert(t > 0 && t <= 10000, thr))
      // heavier key → no larger threshold
      for (a <- byKey.keys; b <- byKey.keys if byKey(a) < byKey(b))
        assert(thr(a) >= thr(b), s"$a(${byKey(a)}) vs $b(${byKey(b)}): $thr")
      // the lightest key keeps everything
      val minKey = byKey.minBy(kv => (kv._2, kv._1))._1
      assert(thr(minKey) == 10000L)
    }
  }

  test("threshold sweep: tp/fp non-increasing and fn non-decreasing in threshold; " +
      "counts partition the holdout; best row comes from the sweep") {
    import spark.implicits._
    val docGen: Gen[List[(Boolean, Double)]] = Gen.listOfN(40, for {
      pos <- Gen.oneOf(true, false)
      s <- Gen.choose(0, 1000).map(_ / 1000.0)
    } yield (pos, s))
    for (docs <- cases(docGen, n = 10) if docs.nonEmpty) {
      val df = docs.map { case (p, s) => ("k", p, s) }
        .toDF("source", "pos", "q_score")
      val sweep = graft.text.HashClassifier
        .thresholdSweep(df, "source", "pos", stepPct = 10)
      val rows = sweep.collect()
        .map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1)
      val nPos = docs.count(_._1).toLong
      val nNeg = docs.size - nPos
      rows.foreach { case (_, (tp, fp, fn)) =>
        assert(tp + fn == nPos, "tp+fn must partition the positives")
        assert(fp <= nNeg)
      }
      // raising the threshold can only shed kept docs
      rows.sliding(2).foreach {
        case Array((_, (tp1, fp1, fn1)), (_, (tp2, fp2, fn2))) =>
          assert(tp2 <= tp1 && fp2 <= fp1 && fn2 >= fn1,
            s"monotonicity violated: $rows")
        case _ =>
      }
      val best = graft.text.HashClassifier.bestThresholds(sweep, "source")
        .collect()
      assert(best.length == 1)
      val sweepSet = sweep.collect()
        .map(r => (r.getInt(1), r.getDouble(7))).toSet
      assert(sweepSet.contains((best.head.getInt(1), best.head.getDouble(7))),
        "chosen row must exist in the sweep")
      assert(best.head.getDouble(7) ==
        sweep.collect().map(_.getDouble(7)).max, "chosen row must be max F1")
    }
  }

  test("graph family conservation laws hold on arbitrary random graphs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val graphGen: Gen[Seq[(Long, Long)]] = for {
      n <- Gen.choose(8, 30)
      m <- Gen.choose(n, 4 * n)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(1L, n.toLong); b <- Gen.choose(1L, n.toLong)
      } yield (a, b))
    } yield es.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    cases(graphGen, 8).filter(_.nonEmpty).foreach { edges =>
      val df = edges.toDF("src", "dst")
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.size
      val m = edges.size.toLong
      // modularity conservation: Σ degree_sum = 2m, Σ n_nodes = |V|,
      // Σ intra ≤ m, Σ q_num ≤ 4m²
      val comm = graft.dedup.Components.labelPropagation(df, iters = 3)
      val parts = graft.dedup.Components.modularityParts(df, comm)
        .select("n_nodes", "intra_edges", "degree_sum", "q_num_4m2")
        .as[(Long, Long, Long, Long)].collect()
      assert(parts.map(_._3).sum == 2 * m, "Σ degree_sum != 2m")
      assert(parts.map(_._1).sum == nodes, "Σ n_nodes != |V|")
      assert(parts.map(_._2).sum <= m, "Σ intra_edges > m")
      assert(parts.map(_._4).sum <= 4 * m * m, "Σ q_num > 4m²")
      // k-core: the core is a subset of nodes with raw degree ≥ k, and
      // every survivor's in-core degree honors the bound
      val core = graft.dedup.Components.kCore(df, k = 2)
        .as[(Long, Long)].collect().toMap
      val rawDeg = (edges ++ edges.map(_.swap)).groupBy(_._1)
        .view.mapValues(_.size).toMap
      core.foreach { case (id, d) =>
        assert(d >= 2, s"core node $id below k")
        assert(rawDeg(id) >= d, s"core degree of $id exceeds raw degree")
      }
      // pageRank mass never exceeds scale (floor losses only shrink it)
      val pr = graft.dedup.Components.pageRank(df, iters = 3)
        .select(col("rank_e12")).as[Long].collect()
      assert(pr.sum <= 1000000000000L, "pageRank mass exceeds scale")
    }
  }

  test("betweenness on random trees equals scale × strict-descendant counts") {
    import spark.implicits._
    // On a TREE, every σ is 1 and Brandes' recurrence telescopes
    // exactly: δ_s(v) = Σ_children (scale + δ_s(c)) = scale ×
    // #strict descendants of v (within the hop bound) — the closed
    // form that pins the whole fixed-point back-propagation with zero
    // floor slack (every div is by σ = 1).
    val S = 100000L
    val hops = 6
    val treeGen: Gen[Seq[(Long, Long)]] = for {
      n <- Gen.choose(5, 28)
      parents <- Gen.sequence[List[Long], Long](
        (2 to n).map(i => Gen.choose(1L, (i - 1).toLong)))
    } yield parents.zipWithIndex.map { case (p, idx) => (p, (idx + 2).toLong) }
    cases(treeGen, 8).filter(_.nonEmpty).foreach { edges =>
      val children = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      // depth-bounded strict-descendant counts from the root (node 1)
      val want = {
        val desc = collection.mutable.Map.empty[Long, Long]
        def fill(v: Long, d: Int): Long = {
          val cs = if (d >= hops) Seq.empty
            else children.getOrElse(v, Seq.empty)
          val tot = cs.map(c => 1L + fill(c, d + 1)).sum
          desc(v) = tot; tot
        }
        fill(1L, 0)
        desc.toMap.filter { case (v, d) => v != 1L && d > 0 }
          .map { case (v, d) => v -> d * S }
      }
      val got = graft.dedup.Components.bfsBetweenness(
          edges.toDF("src", "dst"), Seq(1L), maxHops = hops)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want,
        s"tree law violated:\n got  $got\n want $want\n edges $edges")
    }
  }

  test("lang_quality_profile derivations == HOF forms on random text " +
    "(whitespace variants, markers, punct, unicode)") {
    // the HOF forms define the DuckDB-oracle semantics; the one-pass
    // native profile must match them on ARBITRARY strings, not just the
    // hand-picked tricky list in TextHashExprSpec
    import spark.implicits._
    val piece: Gen[String] = Gen.frequency(
      6 -> Gen.oneOf("the", "and", "of", "to", "a", "in", "le", "la", "et",
        "les", "des", "un", "el", "los", "que", "y", "de", "der", "die",
        "und", "das", "ein", "zu"),
      4 -> Gen.alphaNumStr.map(_.take(6)),
      2 -> Gen.oneOf(".", ",", "!", "?", ";", ":", "...", "?!"),
      1 -> Gen.oneOf("über", "naïve", "café", "𝖙𝖊𝖝𝖙", "ЖЗИ", "一二三"),
      1 -> Gen.oneOf("THE", "And", "uN", "Des", "zU"))
    val sep: Gen[String] = Gen.oneOf(" ", "  ", "\t", "\n", "\r", " \t ",
      "", "\f")
    val textGen: Gen[String] = for {
      n <- Gen.choose(0, 25)
      ps <- Gen.listOfN(n, piece)
      ss <- Gen.listOfN(n + 1, sep)
    } yield (ss.head +: ps.zip(ss.tail).flatMap { case (p, s) => Seq(p, s) })
      .mkString
    val texts = cases(textGen, 120)
    val df = texts.toDF("t")
    import graft.text.TextFunctions
    import org.apache.spark.sql.functions._
    val bad = df.select(
        TextFunctions.textProfile(col("t")).getField("n_tokens").as("np"),
        TextFunctions.tokenCount(col("t")).as("nh"),
        TextFunctions.qualityFromProfile(
          TextFunctions.textProfile(col("t"))).as("qp"),
        TextFunctions.qualityScore(col("t")).as("qh"),
        TextFunctions.langIdFromProfile(
          TextFunctions.textProfile(col("t"))).as("lp"),
        TextFunctions.langIdHeuristic(col("t")).as("lh"),
        col("t"))
      .filter(col("np") =!= col("nh") || col("qp") =!= col("qh") ||
        col("lp") =!= col("lh"))
      .collect()
    assert(bad.isEmpty,
      s"profile/HOF divergence on ${bad.length} random texts, first: " +
        bad.headOption.map(_.toString).getOrElse(""))
  }
}
