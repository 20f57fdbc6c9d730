package graft.operators

import graft.plans.TopKPerKey
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-minimum-values distinct sketches (Bar-Yossef et al., RANDOM'02;
  * Beyer et al., SIGMOD'07) — the mergeable AND INTERSECTABLE
  * distinct-count sketch the HLL mart (Sketches.scala) cannot be.
  *
  * HLL union is lossless, but HLL fundamentally cannot intersect: its
  * registers carry no membership. A KMV sketch is the k smallest hash
  * values of the key set — a uniform SAMPLE of the key space — so two
  * sketches support set algebra: the k smallest of A∪B's hashes are a
  * subset of kmv(A) ∪ kmv(B) (lossless union), and the fraction of the
  * union sketch present in BOTH input sketches estimates the Jaccard
  * similarity, which times the union estimate gives |A ∩ B| (Beyer et
  * al. §4). That is the audience-overlap question (users active in
  * segment X and Y) a 100-TB mart must answer without rescanning raw
  * data — and without a quadratic distinct-join.
  *
  * Everything here is INTEGER arithmetic on a deterministic 52-bit
  * md5-prefix hash (the repo's cross-engine hash family, Sampling.scala):
  * the sketch, the union, and both estimators are bit-reproducible
  * across engines, partitionings and runs, so the whole two-level
  * mart→rollup→estimate path is hash-ORACLED against DuckDB computing
  * the same k-mins directly from raw rows — the oracle equality IS the
  * proof that the merge is lossless. 52 bits (13 hex digits) rather
  * than 60 keeps (k-1)·2^52 inside a long for k ≤ 1024, so the
  * estimator is a single exact `div` — no decimals, no doubles.
  * Hash-collision bias at 52 bits is ~n²/2^53 expected collisions
  * (≈1e-6 relative at n=1e9) — noise next to the sketch's own
  * ~1/sqrt(k-2) relative standard error.
  *
  * Estimator: with h_k the k-th smallest hash as a fraction of the hash
  * space, E[h_k] = k/(n+1), so n̂ = (k-1)·2^52 div h_k is the standard
  * unbiased KMV estimate; when a group has fewer than k distinct hashes
  * the sketch IS the key set and the count is exact.
  *
  * Scale shape: building the mart is one (grain, hash)-distinct shuffle
  * (the same class as countDistinct, map-side combined) feeding the
  * native TopKPerKey heap operator — bounded k-row state per group, no
  * window sort. Rollups and overlaps then read k longs per group:
  * kilobytes standing in for the petabytes that built them.
  */
object Kmv {

  /** Hash-space size: 52-bit hashes in [0, 2^52). */
  val MaxHash: Long = 1L << 52

  /** First 13 md5 hex digits of the key as a 52-bit long — the same
    * md5-prefix hash family as Sampling.hash32, but UNSALTED (both this
    * and the query oracles hash the bare key); DuckDB twin:
    * `('0x' || substr(md5(key), 1, 13))::BIGINT`.
    */
  def hash52(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 13), 16, 10).cast("long")

  private def requireK(k: Int): Unit =
    require(k >= 2 && k <= 1024,
      s"Kmv: k $k out of [2, 1024] ((k-1)*2^52 must fit a long)")

  /** Fine-grain KMV mart: one row per `grainCols` group with `kmv` =
    * sorted array of the k smallest distinct hashes of `key`, plus
    * `kmv_k` = the build-k (4 bytes/row next to the k×8-byte sketch) —
    * persisted so rollup() can ENFORCE its k ≤ build-k contract instead
    * of documenting it: a mismatched caller would otherwise get
    * plausible-looking under-estimates with no error. NULL keys are
    * dropped (like Quantiles.histMart's null values): a null hash would
    * win a heap slot (ascending = nulls first) but vanish from
    * collect_list, leaving a k-1 sketch that estimate() would misread
    * as exact. array<long> round-trips parquet exactly.
    */
  def mart(df: DataFrame, grainCols: Seq[String], key: Column,
           k: Int = 128): DataFrame = {
    requireK(k)
    val hashed = df
      .select(grainCols.map(col) :+ hash52(key).as("h"): _*)
      .filter(col("h").isNotNull)
      .distinct() // one shuffle, map-side combined — countDistinct's cost
    TopKPerKey.perKey(hashed, grainCols, Seq(("h", true)), k)
      .groupBy(grainCols.map(col): _*)
      .agg(sort_array(collect_list(col("h"))).as("kmv"))
      .withColumn("kmv_k", lit(k))
  }

  /** Roll a KMV mart to a coarser grain. LOSSLESS: every hash in the
    * coarse group's true k-mins is ≤ its fine group's k-th min, so it
    * survives into some input sketch — k-mins of the unioned sketch
    * rows equal k-mins computed from raw data (the property the oracle
    * hash-checks). Input is the mart: at 100 TB this reads kilobytes.
    *
    * `k` MUST be ≤ the k the mart was built with (losslessness needs
    * every fine sketch to have retained at least the coarse top-k; a
    * LARGER k here silently biases estimates low, because the rolled
    * sketch fills its extra slots with hashes that are not the true
    * minima). ENFORCED when the mart carries its build-k (`kmv_k`,
    * present since mart() started emitting it) by a LAZY per-row guard
    * (`raise_error` on the explode input — query fails loudly at
    * execution), not an eager aggregate: rollup often runs on a
    * still-lazy mart frame (the q_sketch_* queries) or a streaming one,
    * where a validation action would double the mart build / be
    * illegal. Per-row means ROLLED ROWS ONLY: a caller whose filter is
    * pushed below the explode can prune the offending groups and the
    * over-k rollup succeeds on the remainder — when every group must be
    * validated regardless of downstream pruning, use Sketches.rollup,
    * whose eager min(kmv_k) read is the strict entry point.
    * A legacy mart without the column stays on the documented
    * caller obligation, UNGUARDED: no sound observable check exists —
    * a sketch of s hashes only proves build-k ≥ s, and the harmful
    * direction (k > build-k) is indistinguishable from a mart of
    * groups that simply had ≤ s distinct keys, while sketches LARGER
    * than k indicate a k < build-k rollup, which is lossless.
    */
  def rollup(mart: DataFrame, toCols: Seq[String], k: Int = 128): DataFrame = {
    requireK(k)
    val guarded =
      if (mart.columns.contains("kmv_k"))
        when(col("kmv_k") >= k, col("kmv"))
          .otherwise(raise_error(format_string(
            s"Kmv.rollup: k $k exceeds the mart's build-k %s — the rolled " +
              "sketch would silently under-estimate; rebuild the mart " +
              "with a larger k or roll up at k <= build-k",
            col("kmv_k"))))
      else col("kmv")
    val exploded = mart
      .select(toCols.map(col) :+ explode(guarded).as("h"): _*)
      .distinct() // same hash can sit in several fine-grain sketches
    TopKPerKey.perKey(exploded, toCols, Seq(("h", true)), k)
      .groupBy(toCols.map(col): _*)
      .agg(sort_array(collect_list(col("h"))).as("kmv"))
      .withColumn("kmv_k", lit(k))
  }

  /** Distinct-count estimate off a sketch COLUMN NAME (name-based so the
    * divide can be the exact integral `div` — Spark's Column API has no
    * integral-divide, and a decimal round-then-floor could disagree with
    * the oracle's `//` by one in the last place). Exact when the group
    * has fewer than k distinct keys.
    */
  def estimate(kmvName: String, k: Int): Column = {
    requireK(k)
    val num = (k - 1).toLong * MaxHash
    when(size(col(kmvName)) < k, size(col(kmvName)).cast("long"))
      .otherwise(expr(s"$num div element_at($kmvName, $k)"))
  }

  /** Pairwise set-algebra over two sketch columns `aName`/`bName` of
    * `pairs` (one row per group pair): appends `union_est` and
    * `inter_est` (Beyer et al. §4 — ρ = |union-sketch ∩ both| / k,
    * |A∩B| ≈ ρ · |A∪B|). When the union sketch holds fewer than k
    * hashes both key sets are fully enumerated and both outputs are
    * exact set sizes. All-integer, hash-oracleable.
    */
  def withOverlap(pairs: DataFrame, aName: String, bName: String,
                  k: Int = 128): DataFrame = {
    requireK(k)
    Seq("uu", "union_est", "inter_est").foreach(c =>
      require(!pairs.columns.contains(c),
        s"withOverlap: input already has a '$c' column — it would be " +
          "silently overwritten"))
    pairs
      .withColumn("uu",
        slice(array_sort(array_distinct(concat(col(aName), col(bName)))), 1, k))
      .withColumn("union_est", estimate("uu", k))
      .withColumn("inter_est",
        when(size(col("uu")) < k,
          size(array_intersect(col(aName), col(bName))).cast("long"))
          .otherwise(expr(
            s"(size(filter(uu, x -> array_contains($aName, x) " +
              s"AND array_contains($bName, x))) * union_est) div $k")))
      .drop("uu")
  }
}
