package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once co-order edge mart — the sketch-mart pattern (SURVEY §11:
  * persist once, answer forever) applied to the graph family.
  *
  * The graph-analytics queries all run over the same derived graph: parts
  * co-ordered together (edge src→dst, src < dst, weighted by the number
  * of DISTINCT shared orders). Deriving it is the expensive step — a
  * lineitem self-join plus a countDistinct shuffle — and rebuilding it
  * per query is exactly the rescan-raw pattern the sketch marts exist to
  * kill: at 100 TB the self-join reads the whole fact table, while the
  * edge list it produces is ~graph-sized (millions of rows, not
  * billions). So the mart is the persistence unit:
  *
  *  - [[coOrderCounts]] is the PERSISTED form — UNFILTERED pair counts,
  *    so the mart stays incrementally maintainable (a pair seen once
  *    today can be promoted past any minCo by tomorrow's orders; a
  *    pre-filtered mart would have forgotten it).
  *  - [[edges]] applies the minCo cut at READ time (the filter is a
  *    contract of the query, not of the storage).
  *  - [[mergeCounts]] is the merge-on-read maintenance step (the
  *    Kmv-sink pattern): new ORDER-COMPLETE batches fold in by pair-key
  *    sum, bit-equal to a from-scratch rebuild (spec-pinned).
  *  - [[write]]/[[read]] persist bucket-style: repartitioned by src and
  *    sorted within files, so every graph op's first src-keyed shuffle
  *    reads locality-friendly input; [[writeBucketed]] is the
  *    metastore-table variant whose bucketing survives into Catalyst
  *    (joins/aggs on src skip the exchange entirely).
  *  - [[cachedEdges]] is the in-session form the driver-facing queries
  *    share: built ONCE per (session, fixture dir) and eagerly
  *    localCheckpointed — 12 graph queries, one self-join. One query
  *    (q_graph_triangles) deliberately bypasses the cache as the
  *    build-cost witness, so the bench always shows what a cold build
  *    costs next to the mart-fed reads.
  *
  * Correctness posture: the mart changes WHERE the edge list comes from,
  * never what it is — every graph oracle recomputes the same co-order
  * CTE from raw lineitem in DuckDB, so the 13 graph-query hashes are the
  * proof the mart path is lossless.
  */
object GraphMart {

  /** Unfiltered co-order pair counts (src, dst, w) with src < dst and
    * w = count of DISTINCT orders containing both parts — DISTINCT so an
    * order listing a part on two lineitems doesn't double-count the
    * edge. One self-join reusing a single l_orderkey exchange for both
    * sides, then a map-side-combined countDistinct; linear shuffle in
    * co-occurrence volume (orders × parts-per-order²), never all-pairs
    * over the part dimension.
    */
  def coOrderCounts(lineitem: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_orderkey"), col("l_partkey"))
    li.join(li.select(col("l_orderkey").as("ok2"), col("l_partkey").as("pb")),
        col("l_orderkey") === col("ok2") && col("l_partkey") < col("pb"))
      .groupBy(col("l_partkey").as("src"), col("pb").as("dst"))
      .agg(countDistinct(col("l_orderkey")).as("w"))
  }

  /** The query-facing edge list: the minCo strength cut applied at read
    * time (src, dst, w), w ≥ minCo.
    */
  def edges(counts: DataFrame, minCo: Long = 2L): DataFrame = {
    require(minCo >= 1L, s"GraphMart.edges: minCo $minCo must be >= 1")
    counts.filter(col("w") >= minCo)
  }

  /** Merge-on-read maintenance: fold a new ORDER-COMPLETE batch's counts
    * into the mart by pair-key sum. Contract: each l_orderkey's
    * lineitems must be entirely in one input — a straddling order would
    * count a shared pair in both halves (double) or split it across
    * them (missed). With order-complete batches the merge is bit-equal
    * to rebuilding from the concatenated raw data (GraphMartSpec).
    */
  def mergeCounts(mart: DataFrame, delta: DataFrame): DataFrame =
    mart.select("src", "dst", "w")
      .unionAll(delta.select("src", "dst", "w"))
      .groupBy("src", "dst").agg(sum(col("w")).as("w"))

  /** Persist the mart as src-clustered parquet: repartitioned by src
    * (each part's edges land in one file) and sorted (src, dst) within
    * files — min/max row-group stats make src-range reads prunable, and
    * the graph ops' first src-keyed exchange reads pre-clustered input.
    */
  def write(counts: DataFrame, path: String, numFiles: Int = 8): Unit =
    counts.repartition(numFiles, col("src"))
      .sortWithinPartitions("src", "dst")
      .write.mode("overwrite").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Merge-on-read over an epoch-partitioned STREAMED mart dir (the
    * StreamingTelemetry.streamEdgeMart sink): pair counts add across
    * epochs, so one keyed sum reconstitutes the exact batch-built mart
    * (mergeCounts generalized to n inputs — same order-complete
    * contract).
    */
  def readMerged(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy("src", "dst").agg(sum(col("w")).as("w"))

  /** Metastore-table variant: bucketBy(src) registers the clustering in
    * the catalog, so Catalyst elides the exchange for src-keyed joins
    * and aggregations over the mart (the bucketed-layout posture
    * Layouts/SkewAndLayoutSpec establish for the fact tables).
    */
  def writeBucketed(counts: DataFrame, table: String, buckets: Int = 8): Unit =
    counts.write.mode("overwrite")
      .bucketBy(buckets, "src").sortBy("src", "dst")
      .format("parquet").saveAsTable(table)

  // ---------------------------------------------------------------------
  // In-session cache: one build per (session, fixture dir).

  // WeakHashMap keyed by the SESSION OBJECT itself: identity semantics
  // with no hash-collision risk (an identityHashCode key could collide
  // across GC'd sessions and serve a frame bound to a stopped
  // SparkContext), and a stopped session's entries vanish with it.
  private val cache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.HashMap[String, DataFrame]]()

  /** The minCo=2 co-order edge list for a fixture dir, built from
    * `$dir/lineitem.parquet` ONCE per (session, dir) and eagerly
    * localCheckpointed (src-repartitioned, the layout every downstream
    * op's first shuffle wants). All q_graph_* queries share this.
    * Contract: the fixture dir is immutable for the session's lifetime
    * (the cache is keyed by PATH — rewriting the file mid-session would
    * silently serve the pre-rewrite graph; use a new path or session).
    * The build runs OUTSIDE the cache lock (it is a multi-second Spark
    * job — holding a global monitor across it would serialize unrelated
    * callers); two racing first callers may both build, the first
    * insert wins and the loser's checkpoint is GC-reclaimed.
    */
  def cachedEdges(spark: SparkSession, dir: String,
                  numPartitions: Int = 8): DataFrame = {
    val hit = cache.synchronized {
      cache.computeIfAbsent(spark,
        _ => scala.collection.mutable.HashMap.empty).get(dir)
    }
    hit.getOrElse {
      val built = edges(
          coOrderCounts(spark.read.parquet(s"$dir/lineitem.parquet")))
        .repartition(numPartitions, col("src"))
        .localCheckpoint(true)
      cache.synchronized {
        val perSession = cache.computeIfAbsent(spark,
          _ => scala.collection.mutable.HashMap.empty)
        perSession.getOrElseUpdate(dir, built)
      }
    }
  }
}
