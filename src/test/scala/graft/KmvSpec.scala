package graft

import graft.operators.Kmv
import org.apache.spark.sql.functions._

/** KMV sketch properties the oracle comparison can't isolate on its own:
  * exactness below k, the lossless-merge invariant under adversarial
  * grains/partitionings, the estimator error bound, and overlap
  * estimates against ground-truth set algebra.
  */
class KmvSpec extends SparkSpecBase {
  import spark.implicits._

  private def keys(n: Int, tag: String) =
    (1 to n).map(i => s"$tag-key-$i")

  test("estimate is EXACT below k and within 4 sigma above it") {
    val k = 128
    // below k: 100 distinct keys, duplicated 3x to exercise the distinct
    val small = keys(100, "s").flatMap(x => Seq.fill(3)(x)).toDF("key")
      .withColumn("g", lit("a"))
    val se = Kmv.mart(small, Seq("g"), col("key"), k)
      .select(Kmv.estimate("kmv", k)).as[Long].head()
    assert(se == 100L, s"below-k estimate must be exact, got $se")
    // above k: 20000 distinct, RSE ~ 1/sqrt(k-2) = 8.9% -> 4 sigma = 36%
    val n = 20000
    val big = keys(n, "b").toDF("key").withColumn("g", lit("a"))
    val be = Kmv.mart(big, Seq("g"), col("key"), k)
      .select(Kmv.estimate("kmv", k)).as[Long].head()
    assert(math.abs(be - n).toDouble / n < 0.36,
      s"estimate $be vs exact $n breaks the 4-sigma bound")
  }

  test("rollup of a fine mart is BIT-EQUAL to a direct coarse mart") {
    val k = 64
    // 3 groups x 40 days, keys deliberately shared across days so the
    // same hash sits in many fine sketches; shuffled partitioning
    val rows = for {
      g <- Seq("x", "y", "z"); d <- 1 to 40; i <- 1 to 30
    } yield (g, d, s"$g-${(i * d) % 211}") // collisions across days
    val df = rows.toDF("g", "d", "key").repartition(7)
    val fine = Kmv.mart(df, Seq("g", "d"), col("key"), k)
    val rolled = Kmv.rollup(fine, Seq("g"), k)
      .orderBy("g").select("g", "kmv").as[(String, Seq[Long])].collect()
    val direct = Kmv.mart(df, Seq("g"), col("key"), k)
      .orderBy("g").select("g", "kmv").as[(String, Seq[Long])].collect()
    assert(rolled.toSeq == direct.toSeq,
      "mart merge must be lossless: rollup(fine) != direct coarse sketch")
  }

  test("overlap: exact set algebra below k, bounded estimate above") {
    val k = 128
    // |A|=60, |B|=50, |A inter B|=20 -> the UNION (90) stays below k,
    // so both key sets are fully enumerated and the exact path fires
    val a = (1 to 60).map(i => ("a", s"m-$i")).toDF("g", "key")
    val b = ((41 to 60) ++ (1001 to 1030)).map(i => ("b", s"m-$i"))
      .toDF("g", "key")
    val sk = Kmv.mart(a.union(b), Seq("g"), col("key"), k)
    val pair = sk.filter(col("g") === "a").select(col("kmv").as("ka"))
      .crossJoin(sk.filter(col("g") === "b").select(col("kmv").as("kb")))
    val (u, i) = Kmv.withOverlap(pair, "ka", "kb", k)
      .select(col("union_est"), col("inter_est")).as[(Long, Long)].head()
    assert(u == 90L, s"exact union 60+50-20=90, got $u")
    assert(i == 20L, s"exact intersection 20, got $i")
    // above k: |A|=|B|=6000 with 3000 shared -> union 9000, inter 3000
    val ba = (1 to 6000).map(i => ("a", s"big-$i")).toDF("g", "key")
    val bb = (3001 to 9000).map(i => ("b", s"big-$i")).toDF("g", "key")
    val bsk = Kmv.mart(ba.union(bb), Seq("g"), col("key"), k)
    val bpair = bsk.filter(col("g") === "a").select(col("kmv").as("ka"))
      .crossJoin(bsk.filter(col("g") === "b").select(col("kmv").as("kb")))
    val (bu, bi) = Kmv.withOverlap(bpair, "ka", "kb", k)
      .select(col("union_est"), col("inter_est")).as[(Long, Long)].head()
    assert(math.abs(bu - 9000).toDouble / 9000 < 0.36,
      s"union estimate $bu vs 9000 breaks the 4-sigma bound")
    // intersection adds matching-fraction noise on top of the union's;
    // allow a wider (but still discriminating) band
    assert(bi > 1500 && bi < 4500,
      s"intersection estimate $bi vs 3000 out of band")
  }

  test("null keys are dropped, not sketch-poisoning") {
    // a null key's null hash would win an ascending heap slot but
    // vanish from collect_list, leaving a k-1 'exact-looking' sketch
    val k = 16
    val df = ((1 to 200).map(i => ("g", s"nk-$i")) :+ (("g", null)))
      .toDF("g", "key")
    val (sk, est) = Kmv.mart(df, Seq("g"), col("key"), k)
      .select(col("kmv"), Kmv.estimate("kmv", k))
      .as[(Seq[Long], Long)].head()
    assert(sk.size == k, s"sketch lost a slot to a null key: ${sk.size}")
    assert(est > 100, s"null key forced the below-k 'exact' branch: $est")
  }

  test("rollup above the mart's build-k fails loudly, not silently biased") {
    // a rolled sketch with k > build-k would fill its extra slots with
    // non-minima and under-estimate with no symptom — the mart carries
    // kmv_k so the guard can fire at execution time
    val df = keys(300, "bk").map(k => (k.hashCode % 3, k)).toDF("g", "key")
    val mart = Kmv.mart(df, Seq("g"), col("key"), k = 64)
    assert(mart.columns.contains("kmv_k"))
    assert(mart.select("kmv_k").distinct().collect().map(_.getInt(0)).toSeq
      == Seq(64))
    // same-k and smaller-k roll up fine (and smaller-k is still lossless)
    assert(Kmv.rollup(mart, Seq.empty, k = 64).count() == 1)
    assert(Kmv.rollup(mart, Seq.empty, k = 32).count() == 1)
    val bad = Kmv.rollup(mart, Seq.empty, k = 128)
    val ex = intercept[Exception] { bad.collect() }
    assert(ex.getMessage.contains("build-k") ||
      Option(ex.getCause).exists(_.getMessage.contains("build-k")),
      s"wrong failure: ${ex.getMessage}")
    // a legacy mart without kmv_k is UNGUARDED (documented contract):
    // a smaller-k rollup — provably lossless (sketch sizes > k prove
    // k < build-k) — must NOT be blocked, and the harmful k > build-k
    // direction is observably indistinguishable from small groups
    val legacy = mart.drop("kmv_k")
    val small = Kmv.rollup(legacy, Seq.empty, 32)
    assert(small.count() == 1)
    assert(small.select(size(col("kmv"))).collect()(0).getInt(0) == 32)
  }

  test("sketches are partitioning-invariant and parquet round-trip") {
    val k = 32
    val df = (1 to 500).map(i => ("g", s"p-$i")).toDF("g", "key")
    val s1 = Kmv.mart(df.repartition(1), Seq("g"), col("key"), k)
      .select("kmv").as[Seq[Long]].head()
    val s13 = Kmv.mart(df.repartition(13), Seq("g"), col("key"), k)
      .select("kmv").as[Seq[Long]].head()
    assert(s1 == s13, "sketch depends on partitioning")
    assert(s1 == s1.sorted && s1.distinct.size == s1.size && s1.size == k,
      "sketch must be k sorted distinct hashes")
    val dir = java.nio.file.Files.createTempDirectory("kmv").toString
    Kmv.mart(df, Seq("g"), col("key"), k).write.mode("overwrite")
      .parquet(s"$dir/m")
    val back = spark.read.parquet(s"$dir/m").select("kmv")
      .as[Seq[Long]].head()
    assert(back == s1, "kmv column must round-trip parquet bit-exactly")
  }
}
