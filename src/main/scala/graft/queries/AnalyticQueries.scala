package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions, multi-dimensional grouping, distinct aggregation and
  * set operations (SURVEY.md §2.7 — absent from the reference, first-class
  * here as the "efficiency marts" its README plans).
  *
  * Scale notes: every window below partitions by a key (customer) — one hash
  * shuffle, then a per-partition sort; no global sort, no skew (customer
  * cardinality scales with data). rollup/cube expand rows map-side then
  * aggregate — fine as long as the grouping-key product stays small, which
  * these (flag×status) do at any scale. Window ORDER BY always carries a
  * unique tiebreak column so results are deterministic.
  */
object AnalyticQueries extends QueryPack {

  private val perCust = Window
    .partitionBy(col("o_custkey"))
    .orderBy(col("o_orderdate"), col("o_orderkey"))

  /** The graph's `n` smallest node ids — the deterministic seed/landmark
    * pick the PPR and BFS queries share (a bounded n-row collect; real
    * callers pass a chosen seed list instead).
    */
  private def smallestNodeIds(edges: org.apache.spark.sql.DataFrame,
                              n: Int): Seq[Long] =
    edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id")))
      .distinct().orderBy("id").limit(n)
      .collect().map(_.getLong(0)).toSeq

  /** The parts-co-ordered-together graph shared by the graph-analytics
    * queries: edge src→dst when two parts (src < dst) share >= 2 distinct
    * orders. Served by the co-order edge MART (operators.GraphMart):
    * built from lineitem ONCE per (session, dir), eagerly checkpointed,
    * and read by every graph query — the lineitem self-join that
    * dominated each query now runs once per session instead of 12
    * times. q_graph_triangles deliberately bypasses the cache as the
    * build-cost witness.
    */
  private def coOrderPairs(s: org.apache.spark.sql.SparkSession, d: String) =
    coOrderPairsW(s, d).select("src", "dst")

  /** Weighted variant: keeps the co-order count as edge weight `w`. */
  private def coOrderPairsW(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.operators.GraphMart.cachedEdges(s, d)

  /** Scale-adaptive per-round shuffle width for the iterative graph
    * operators (round 18): derived from the mart's measured edge count
    * (GraphMart.edgePartitions — ~2M edge rows ≈ 100 MB per partition)
    * instead of the operators' constant-8 default, which paid 8 tasks
    * of scheduling per exchange per round on the sf0.1 graph's 3,573
    * edges and would under-partition a 100-TB graph. Pure execution
    * width: every operator below is partitioning-independent by
    * construction (integer keyed aggregations, synchronous rounds), so
    * results are bit-identical at any width — the oracle hashes pin it.
    */
  private def graphParts(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.operators.GraphMart.edgePartitions(s, d)

  val queries: Map[String, Q] = Map(
    // Per-node triangle counts on the parts-co-ordered-together graph
    // (edge = two parts sharing >= 2 orders): Components.triangleCounts
    // with the degree-ordered wedge orientation (Suri & Vassilvitskii,
    // WWW'11) — out-degrees bounded O(sqrt(m)), so no hub node ever
    // owns a quadratic wedge set. DELIBERATELY bypasses the session
    // edge-mart cache: this is the graph family's build-cost WITNESS —
    // the one query whose bench time always includes the cold lineitem
    // self-join, so mart-fed read times stay honest next to it.
    "q_graph_triangles" -> ((s, d) => {
      // The witness contract is ONE cold mart build per execution — but
      // the lazy edge frame was referenced 13× inside the wedge plan
      // (round-18 plan dump), so every pass planned (and, where AQE
      // stage reuse missed, re-ran) the lineitem self-join repeatedly.
      // An eager checkpoint keeps the witness honest (the build still
      // runs cold on every timed pass — this query stays eager_rebuilt)
      // while the wedge enumeration reads the materialized edges once.
      val edges = graft.operators.GraphMart
        .edges(graft.operators.GraphMart.coOrderCounts(Tables.lineitem(s, d)))
        .select(col("src").as("ida"), col("dst").as("idb"))
        .localCheckpoint(true)
      // wedge width from the just-materialized witness build's own
      // count (the mart's edgePartitions would force the session mart
      // this query exists to bypass); one bounded count job on the
      // checkpoint
      val width = math.max(1L, (edges.count() +
        graft.operators.GraphMart.EdgeRowsPerPartition - 1) /
        graft.operators.GraphMart.EdgeRowsPerPartition).toInt
      graft.dedup.Components.triangleCounts(edges, width).orderBy("id")
    }),

    // Fixed-point PageRank over the same co-order graph, directed
    // lower→higher part id (citation-style: max-id nodes never source an
    // edge, so the dangling-mass redistribution is genuinely exercised).
    // Integer arithmetic end to end — the result hashes bit-exact against
    // the oracle's unrolled recurrence with zero float-rounding slack.
    "q_graph_pagerank" -> ((s, d) =>
      graft.dedup.Components.pageRank(coOrderPairs(s, d), iters = 5,
        numPartitions = graphParts(s, d))
        .orderBy("id")),

    // HITS on the same directed graph: authorities (in-link quality) and
    // hubs (out-link quality) as exact e9 fixed-point longs — the L1
    // normalization each half-step is `v * scale div sum`, so the oracle
    // hash has zero float slack here too.
    "q_graph_hits" -> ((s, d) =>
      graft.dedup.Components.hits(coOrderPairs(s, d), iters = 5,
        numPartitions = graphParts(s, d))
        .orderBy("id")),

    // Label-propagation communities on the same graph (symmetrized
    // inside the operator): majority-vote label per node per round,
    // ties to the smallest label — synchronous and integer-only, so the
    // oracle's unrolled recurrence hashes bit-exact. Where
    // connectedComponents gives connectivity islands, this splits the
    // co-order graph along its sparse cuts into purchase communities.
    "q_graph_communities" -> ((s, d) =>
      graft.dedup.Components.labelPropagation(coOrderPairs(s, d), iters = 5,
        numPartitions = graphParts(s, d))
        .orderBy("id")),

    // Weight-proportional PageRank: the SAME graph but rank splits over
    // out-edges by co-order strength (n_co) instead of uniformly —
    // frequently-co-bought pairs pull more mass. Strict generalization
    // (uniform weights reproduce q_graph_pagerank bit-exactly, pinned
    // in ComponentsSpec); hash-matches the weighted recurrence oracle.
    "q_graph_pagerank_weighted" -> ((s, d) =>
      graft.dedup.Components.pageRankWeighted(coOrderPairsW(s, d), iters = 5,
        numPartitions = graphParts(s, d))
        .orderBy("id")),

    // Personalized PageRank from the graph's 3 smallest node ids as the
    // teleport set: seed-proximity relevance over the co-order graph
    // (the "parts related to THESE parts" primitive a global pageRank
    // flattens). Unreachable nodes score exactly 0. Integer end to end;
    // hash-matches the unrolled seeded recurrence. The seed collect and
    // the operator share the session mart's one checkpointed build.
    "q_graph_ppr" -> ((s, d) => {
      val edges = coOrderPairs(s, d)
      graft.dedup.Components
        .personalizedPageRank(edges, smallestNodeIds(edges, 3), iters = 5,
          numPartitions = graphParts(s, d))
        .orderBy("id")
    }),

    // Weighted communities: the SAME recurrence but votes sum co-order
    // strength (n_co) — a strongly co-bought neighbor pulls harder.
    // Unit weights reproduce q_graph_communities exactly (delegation-
    // pinned); hash-matches the weight-summed vote oracle.
    "q_graph_communities_weighted" -> ((s, d) =>
      graft.dedup.Components
        .labelPropagationWeighted(coOrderPairsW(s, d), iters = 5,
          numPartitions = graphParts(s, d))
        .orderBy("id")),

    // Modularity readout of that community partition: per community the
    // EXACT integer numerator q_num = 4m*L_c - D_c^2 (= Q_c*4m^2), so
    // the quality of the LPA split is itself hash-oracled — positive
    // q_num means denser than the degree-preserving random expectation.
    // The session mart's checkpointed edges feed BOTH the LPA rounds
    // and the modularity joins (the co-order self-join is the expensive
    // part; building it twice would double the query).
    "q_graph_modularity" -> ((s, d) => {
      val edges = coOrderPairs(s, d)
      graft.dedup.Components.modularityParts(edges,
        graft.dedup.Components.labelPropagation(edges, iters = 5,
          numPartitions = graphParts(s, d)))
        .orderBy("community")
    }),

    // 3-core of the co-order graph: the maximal subgraph where every
    // part keeps >= 3 co-order partners INSIDE the subgraph — the dense
    // purchase core that plain degree thresholding overstates (removing
    // a weak node demotes neighbors transitively). The operator peels
    // to the fixpoint; the oracle unrolls a fixed 40 rounds, exact
    // because peeling is idempotent after convergence (11 rounds on the
    // sf0.01 fixture — deep margin against fixture regeneration).
    // maxRounds is pinned to the ORACLE's unroll (both 41) so every
    // case is a hash MATCH or a LOUD operator failure, never a silent
    // mismatch: peels of <= 40 dropping rounds converge and match the
    // fixpoint; a 41-round peel to EMPTY converges via the n2==0 arm
    // and matches the oracle's (also empty) n41; a 41-round peel to a
    // nonzero fixpoint (or anything longer) throws not-converged
    // before a row is emitted.
    "q_graph_kcore" -> ((s, d) =>
      graft.dedup.Components.kCore(coOrderPairs(s, d), k = 3, maxRounds = 41,
        numPartitions = graphParts(s, d))
        .orderBy("id")),

    // FULL core decomposition of the co-order graph: every part's
    // coreness (largest k whose k-core keeps it) via the Montresor
    // h-index fixpoint — the density stratification q_graph_kcore's
    // single-k extraction can't give. maxRounds pinned to the ORACLE's
    // unroll (both 30; 10 rounds converge on the fixture — deep margin)
    // so every case is a hash MATCH or a LOUD not-converged failure,
    // the kcore discipline. Spec-pinned law: {coreness >= k} ==
    // kCore(k)'s node set.
    "q_graph_coreness" -> ((s, d) =>
      graft.dedup.Components.coreness(coOrderPairs(s, d), maxRounds = 30,
        numPartitions = graphParts(s, d))
        .orderBy("id")),

    // Landmark BFS hop distances on the same graph from its 3 smallest
    // node ids (a bounded 3-row collect — the landmark set is a chosen
    // seed list in practice). Exact integer distances within 5 hops;
    // unreached pairs absent. Hash-matches the unrolled bounded-round
    // Bellman-Ford oracle. Edges come checkpointed from the session mart.
    "q_graph_distances" -> ((s, d) => {
      val edges = coOrderPairs(s, d)
      graft.dedup.Components
        .bfsDistances(edges, smallestNodeIds(edges, 3), maxHops = 5,
          numPartitions = graphParts(s, d))
        .orderBy("id", "landmark")
    }),

    // FULL-DIAMETER distances from the same 3 landmarks via the
    // delta-frontier loop (round 15): bound 30 is a safety net, not a
    // round budget — the loop stops the round its frontier drains, so
    // the result is the complete reachability closure. The oracle
    // unrolls the SAME bounded Bellman-Ford to 30 rounds (idempotent
    // once every reachable pair settles), so the hash match proves the
    // early-stopped frontier expansion == the fixpoint of the full
    // recurrence — cross-engine, at full diameter, which is exactly
    // the contract the bounded 5-hop query can't exercise.
    "q_graph_distances_frontier" -> ((s, d) => {
      val edges = coOrderPairs(s, d)
      graft.dedup.Components
        .bfsDistancesFrontier(edges, smallestNodeIds(edges, 3),
          maxHops = 30, numPartitions = graphParts(s, d))
        .orderBy("id", "landmark")
    }),

    // WEIGHTED distances from the same 3 landmarks: minimum total edge
    // cost within 5 hops, with cost = the standard similarity→distance
    // flip of co-order strength (greatest(1, 11 − least(n_co, 10)) —
    // strong ties are SHORT edges), so the metric reads "how closely
    // co-purchased", not hop count. A cheap 2-hop route through strong
    // ties beats a weak direct edge — what unit-hop distance can't see.
    "q_graph_distances_weighted" -> ((s, d) => {
      // the cost flip is a narrow map over the mart's checkpointed rows
      val edges = coOrderPairsW(s, d)
        .withColumn("w",
          greatest(lit(1L), lit(11L) - least(col("w"), lit(10L))))
      graft.dedup.Components
        .bfsDistancesWeighted(edges, smallestNodeIds(edges, 3), maxHops = 5,
          numPartitions = graphParts(s, d))
        .orderBy("id", "landmark")
    }),

    // Shortest-path MULTIPLICITY from the same 3 landmarks: how many
    // distinct shortest routes reach each part (connection robustness —
    // a one-bridge connection vs hundreds of parallel routes), exact
    // integer sigma per Brandes. Shares the distances query's shape and
    // the session mart's checkpointed edges.
    "q_graph_path_counts" -> ((s, d) => {
      val edges = coOrderPairs(s, d)
      graft.dedup.Components
        .bfsPathCounts(edges, smallestNodeIds(edges, 3), maxHops = 5,
          numPartitions = graphParts(s, d))
        .orderBy("id", "landmark")
    }),

    // The mart's READ-side answer query — "parts bought with THIS part":
    // per part its top-3 strongest co-order partners by weight (ties →
    // smallest partner id), the item-item recommendation primitive the
    // whole edge mart exists to serve. Symmetrized read of the
    // checkpointed mart into TopKPerKey heaps (bounded k-row state per
    // part, never a window sort) — at 100 TB this query reads the
    // persisted mart, not the fact table.
    "q_graph_related" -> ((s, d) => {
      val e = coOrderPairsW(s, d)
      val sym = e.unionAll(
          e.select(col("dst").as("src"), col("src").as("dst"), col("w")))
        .select(col("src").as("part"), col("dst").as("related"), col("w"))
      graft.plans.TopKPerKey
        .perKey(sym, Seq("part"), Seq(("w", false), ("related", true)), 3)
        .orderBy("part", "related")
    }),

    // Harmonic closeness from the same 3 landmarks: Σ scale div hops
    // over reached landmarks — "how near the trusted seeds" as ONE
    // number per part (near-many-landmarks ranks above near-one), with
    // n_reached carrying the support. Unreached landmarks contribute 0
    // naturally (the harmonic trick — classic closeness needs an ∞
    // convention); pure composition over the distances machinery, one
    // extra keyed aggregate.
    "q_graph_closeness" -> ((s, d) => {
      val edges = coOrderPairs(s, d)
      graft.dedup.Components
        .harmonicCloseness(edges, smallestNodeIds(edges, 3), maxHops = 5,
          numPartitions = graphParts(s, d))
        .orderBy("id")
    }),

    // UNTRUNCATED harmonic closeness (round 15): the same aggregate
    // over the frontier BFS's full reachability closure — the real
    // centrality (a node 7 hops out contributes scale/7 instead of
    // vanishing at the 5-hop feature bound), at the early-drain cost
    // profile the frontier A/B measured. Oracle = the shared distance
    // CTEs unrolled past the diameter + the same aggregate.
    "q_graph_closeness_full" -> ((s, d) => {
      val edges = coOrderPairs(s, d)
      graft.dedup.Components
        .harmonicClosenessFull(edges, smallestNodeIds(edges, 3),
          maxHops = 30, numPartitions = graphParts(s, d))
        .orderBy("id")
    }),

    // Landmark-sampled betweenness centrality from the same 3 landmarks
    // — the Brandes completion: sigma counted paths REACHING a part;
    // the dependency back-propagation scores paths THROUGH it (broker
    // parts whose removal disconnects co-purchase routes — what degree
    // and pagerank both miss: a low-degree bridge can carry every
    // shortest route). Fixed-point integers (delta scaled 1e5), exact
    // per landmark, summed over the sample; hash-matches the unrolled
    // backward-level oracle. maxHops=4 keeps sigma*delta inside long
    // headroom (operator-guarded).
    "q_graph_betweenness" -> ((s, d) => {
      val edges = coOrderPairs(s, d)
      graft.dedup.Components
        .bfsBetweenness(edges, smallestNodeIds(edges, 3), maxHops = 4,
          numPartitions = graphParts(s, d))
        .orderBy("id")
    }),

    // row_number / rank / dense_rank per customer by price.
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .orderBy("o_custkey", "rn")
    }),

    // lag/lead: gap in days between a customer's consecutive orders.
    "q_window_lag_lead" -> ((s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(perCust).as("prev_date"),
          lead(col("o_orderdate"), 1).over(perCust).as("next_date"),
          datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(perCust))
            .as("days_since_prev"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")),

    // Running totals + sliding average (frame clauses).
    "q_window_running" -> ((s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice"))
            .over(perCust.rowsBetween(Window.unboundedPreceding, 0)), 2)
            .as("running_spend"),
          round(avg(col("o_totalprice"))
            .over(perCust.rowsBetween(-2, 0)), 6)
            .as("avg_last3"))
        .orderBy("o_custkey", "o_orderkey")),

    // The remaining rank-family window functions: quartile bucket,
    // relative rank, cumulative distribution, and an absolute-position
    // value (2nd-highest price per priority) over a full frame. Unique
    // (price desc, orderkey) ordering keeps every one deterministic —
    // and since round 12 makes them DERIVABLE: o_orderpriority has 5
    // distinct values, so `Window.partitionBy(priority)` is a
    // parallelism-5 cliff (each priority's full sort in ONE task — the
    // worst entry of the 100× relational probe at 17.9×). The scalable
    // form reconstructs all four functions from the two-phase global
    // positions of operators.DistributedRank (range-sorted, offset-
    // joined — every task bounded by partition sizing, not by key
    // cardinality): rank-unique ⇒ percent_rank = (pos−1)/(n−1),
    // cume_dist = pos/n, ntile via integral bucket math, nth_value(2) =
    // the pos=2 row broadcast back. DistributedRankSpec pins frame
    // equality against the plain Window formulation; the oracle is
    // unchanged (DuckDB runs the actual window functions).
    "q_window_rank_family" -> ((s, d) => {
      val pos = graft.operators.DistributedRank.withPositions(
        Tables.orders(s, d)
          .select("o_orderpriority", "o_orderkey", "o_totalprice"),
        "o_orderpriority",
        Seq(col("o_totalprice").desc, col("o_orderkey")))
      // nth_value(2) == the pos=2 row under the total order. Deriving it
      // by filtering `pos` re-executed the whole two-phase positioned
      // plan a second time just to build this broadcast (round 18); the
      // same row falls out of a bounded TopKPerKey(2) heap pass over the
      // RAW input — partial-aggregable, no window, no second positioned
      // run. Among the top-2 under (price DESC, okey ASC) the 2nd is the
      // struct-min of (price, -okey); a group with fewer than 2 rows
      // yields NULL, nth_value's contract.
      val top2 = graft.plans.TopKPerKey.perKey(
        Tables.orders(s, d)
          .select("o_orderpriority", "o_orderkey", "o_totalprice"),
        Seq("o_orderpriority"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 2)
      val second = top2
        .groupBy(col("o_orderpriority").as("__p2"))
        .agg(count(lit(1)).as("__n2"),
          min(struct(col("o_totalprice").as("p"),
            (-col("o_orderkey")).as("nk"))).as("__m"))
        .select(col("__p2"),
          when(col("__n2") >= 2, col("__m.p")).as("second_highest"))
      pos.join(broadcast(second),
          col("o_orderpriority") === col("__p2"), "left")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          graft.operators.DistributedRank.ntileFromPos(4).as("quartile"),
          round(when(col("n") > 1,
            (col("pos") - 1).cast("double") / (col("n") - 1))
            .otherwise(0.0), 6).as("pct_rank"),
          round(col("pos").cast("double") / col("n"), 6).as("cume"),
          col("second_highest"))
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    // RANGE-frame window (value-based, not row-count): per user, event
    // count and value sum over the trailing 1-hour event-time window —
    // the "rolling rate/sum" shape rows-frames can't express when event
    // spacing is irregular. Ordered on epoch seconds so the frame bound
    // is plain numeric range arithmetic in both engines.
    "q_window_range_1h" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts_sec"))
        .rangeBetween(-3600L, 0L)
      graft.Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          col("ts").cast("long").as("ts_sec"), col("value"))
        .withColumn("n_events_1h", count(lit(1)).over(w))
        .withColumn("sum_value_1h", round(sum(col("value")).over(w), 4))
        .select("event_id", "user_id", "ts_sec", "n_events_1h", "sum_value_1h")
        .orderBy("event_id")
    }),

    // Top-k per group: each customer's 3 priciest orders.
    "q_window_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    }),

    // ROLLUP over (returnflag, linestatus) with grouping flags.
    "q_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).as("g_flag"),
          grouping(col("l_linestatus")).as("g_status"))
        .orderBy(col("g_flag"), col("g_status"),
          coalesce(col("l_returnflag"), lit("")),
          coalesce(col("l_linestatus"), lit("")))),

    // CUBE over (orderstatus, orderpriority).
    "q_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          round(sum("o_totalprice"), 2).as("revenue"),
          count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).as("g_status"),
          grouping(col("o_orderpriority")).as("g_prio"))
        .orderBy(col("g_status"), col("g_prio"),
          coalesce(col("o_orderstatus"), lit("")),
          coalesce(col("o_orderpriority"), lit("")))),

    // Native top-k-per-key: the custom TopKPerKeyPlan/Exec operator
    // (bounded heaps, map-side partial prune) — result must equal the
    // window row_number formulation, which is the DuckDB oracle.
    "q_topk_native" -> ((s, d) =>
      graft.plans.TopKPerKey.perKey(graft.Tables.orders(s, d),
          Seq("o_custkey"),
          Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "o_orderkey")),

    // Pivot (crosstab): documents per (source, lang), langs as columns.
    // Explicit value list keeps the output schema static — at scale an
    // inferred pivot would need an extra distinct pass over the data.
    "q_pivot" -> ((s, d) =>
      graft.Tables.documents(s, d)
        .groupBy(col("source"))
        .pivot("lang", Seq("en", "fr", "es", "de"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("en", "fr", "es", "de"))
        .orderBy("source")),

    // Sketch-based distinct (HLL++): approx user/type cardinalities per
    // day. Sketches are mergeable → one pass, bounded memory, streamable;
    // the exact twin (q_distinct_agg) is the accuracy baseline. Sketch
    // estimates are engine-specific → rows-only check; ApproxDistinctSpec
    // pins the error bound against exact.
    "q_approx_distinct" -> ((s, d) =>
      graft.Tables.events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("dt"))
        .agg(
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          approx_count_distinct(col("event_type"), 0.02).as("approx_types"),
          count(lit(1)).as("n_events"))
        .orderBy("dt")),

    // Sketch-based per-day quantiles (approx_percentile's t-digest-style
    // summary): the streaming/mergeable twin of the exact percentile in
    // q_gold_daily. Exact interpolated percentiles need a per-group sort
    // (ObjectHashAggregate holding all values); the sketch is a bounded
    // buffer with map-side partial merge — the only formulation whose
    // memory stands at 100 TB per-day row counts. Deterministic for a
    // fixed accuracy parameter, but engine-specific → rows-only check;
    // SketchSpec bounds its error against the exact percentile.
    "q_approx_quantile" -> ((s, d) =>
      graft.Tables.events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("dt"))
        .agg(
          approx_percentile(col("value"), lit(0.5), lit(1000))
            .as("p50_approx"),
          approx_percentile(col("value"), lit(0.95), lit(1000))
            .as("p95_approx"),
          count(lit(1)).as("n_events"))
        .orderBy("dt")),

    // Exact daily twin of q_approx_distinct: same grouping, exact
    // count-distincts — oracles the deterministic surface (dt, exact
    // cardinalities, n_events) that the sketch query can't hash-check.
    "q_distinct_daily" -> ((s, d) =>
      graft.Tables.events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("dt"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("event_type")).as("n_types"),
          count(lit(1)).as("n_events"))
        .orderBy("dt")),

    // Ordered string aggregation (group-concat): per source, the sorted
    // distinct language list as one string. collect_set → array_sort →
    // array_join makes the concatenation order deterministic — the only
    // way a string agg can be engine-comparable.
    "q_group_concat" -> ((s, d) =>
      graft.Tables.documents(s, d)
        .groupBy("source")
        .agg(
          array_join(array_sort(collect_set(col("lang"))), ",").as("langs"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy("source")),

    // Fixed-width histogram of the event value distribution: integral
    // bin arithmetic (floor of value/width) so both engines bucket
    // identically; one partial-aggregated shuffle on the bin key.
    "q_histogram" -> ((s, d) =>
      graft.Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(floor(col("value") / 10.0).cast("long").as("bin"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"))
        .withColumn("lo", col("bin") * 10.0)
        .select("bin", "lo", "n")
        .orderBy("bin")),

    // Multi-quantile grid in ONE aggregation pass (the array form of
    // percentile shares a single sorted buffer across the five points —
    // five separate percentile calls would sort five times).
    "q_quantile_grid" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(percentile(col("l_extendedprice"),
          array(lit(0.1), lit(0.25), lit(0.5), lit(0.75), lit(0.9))).as("q"))
        .select(col("l_returnflag"),
          round(element_at(col("q"), 1), 4).as("p10"),
          round(element_at(col("q"), 2), 4).as("p25"),
          round(element_at(col("q"), 3), 4).as("p50"),
          round(element_at(col("q"), 4), 4).as("p75"),
          round(element_at(col("q"), 5), 4).as("p90"))
        .orderBy("l_returnflag")),

    // Statistical aggregates: correlation / covariance / dispersion of
    // price vs quantity per return flag (feature-engineering surface).
    "q_stats_corr" -> ((s, d) =>
      graft.Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(corr("l_quantity", "l_extendedprice"), 6).as("corr_qty_price"),
          round(covar_pop("l_quantity", "l_extendedprice"), 4).as("covar_qty_price"),
          round(var_pop("l_discount"), 8).as("var_discount"),
          round(stddev_pop("l_tax"), 8).as("sd_tax"))
        .orderBy("l_returnflag")),

    // Distinct aggregation: distinct suppliers/parts per return flag.
    "q_distinct_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_parts"),
          round(sum_distinct(col("l_quantity")), 4).as("sum_distinct_qty"))
        .orderBy("l_returnflag")),

    // DISTINCT projection (reference has no distinct — NEW).
    "q_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")),

    // UNION ALL of two filtered projections + aggregate.
    "q_set_union" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val hi = o.filter(col("o_totalprice") > 400000)
        .select(col("o_custkey"), lit("hi").as("bucket"))
      val lo = o.filter(col("o_totalprice") < 50000)
        .select(col("o_custkey"), lit("lo").as("bucket"))
      hi.unionAll(lo)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), countDistinct(col("o_custkey")).as("n_cust"))
        .orderBy("bucket")
    }),

    // INTERSECT: customers appearing in both value buckets.
    "q_set_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_totalprice") > 400000).select(col("o_custkey"))
        .intersect(o.filter(col("o_totalprice") < 50000).select(col("o_custkey")))
        .orderBy("o_custkey")
    }),

    // EXCEPT: high-value-only customers.
    "q_set_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_totalprice") > 400000).select(col("o_custkey"))
        .except(o.filter(col("o_totalprice") < 50000).select(col("o_custkey")))
        .orderBy("o_custkey")
    }),

    // Persisted-sketch rollup (DataSketches HLL): per-(day, event_type)
    // sketch mart unioned up to per-event_type distinct users — the
    // two-level plan is exactly the 100-TB shape (raw data aggregated
    // ONCE at fine grain; every coarser rollup reads sketches, not
    // events). Estimates are engine-specific → rows-only at the driver;
    // q_sketch_rollup_exact is the hash-checked twin and SketchSpec pins
    // the parquet round-trip, merge-vs-direct equality and error bound.
    "q_sketch_rollup" -> ((s, d) => {
      val mart = graft.operators.Sketches.hllMart(
        Tables.events(s, d)
          .withColumn("dt", to_date(date_trunc("day", col("ts")))),
        Seq("dt", "event_type"), "user_id")
      graft.operators.Sketches.rollupMart(mart, Seq("event_type"))
        .select(
          col("event_type"),
          graft.operators.Sketches.estimate(col("hll")).as("users_est"),
          col("n_rows").as("n_events"))
        .orderBy("event_type")
    }),

    // Exact twin of q_sketch_rollup: same grouping, exact distinct — the
    // deterministic surface DuckDB can hash-check (and the accuracy
    // baseline the sketch estimate is bounded against in SketchSpec).
    "q_sketch_rollup_exact" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    // KMV sketch mart → rollup → estimate, END-TO-END HASH-ORACLED: the
    // daily-active (user, day) audience per event type, sketched at
    // (dt, event_type) grain and rolled up to event_type. The oracle
    // computes the k-mins DIRECTLY from raw rows — hash equality is the
    // proof the mart merge is lossless (operators/Kmv.scala). Contrast
    // q_sketch_rollup: the HLL estimate is engine-internal (rows-only);
    // the integer KMV estimate is exactly reproducible.
    "q_sketch_kmv" -> ((s, d) => {
      val mart = graft.operators.Kmv.mart(
        Tables.events(s, d).withColumn("dt", to_date(col("ts"))),
        Seq("dt", "event_type"),
        concat(col("user_id").cast("string"), lit(":"),
          col("dt").cast("string")),
        k = 128)
      graft.operators.Kmv.rollup(mart, Seq("event_type"), k = 128)
        .select(
          col("event_type"),
          graft.operators.Kmv.estimate("kmv", 128).as("user_days_est"),
          size(col("kmv")).cast("long").as("n_mins"))
        .orderBy("event_type")
    }),

    // Third leg of the sketch-mart trio: QUANTILES off a persisted
    // fixed-width histogram mart (operators/Quantiles.scala). Built at
    // (dt, event_type) grain, merged to event_type by summing bin
    // counts (trivially lossless — and the oracle proves it by
    // computing the histogram directly from raw rows), quantile =
    // smallest bin reaching ceil(q*total) via integer cross-multiply,
    // reported at the bin's upper edge. At 100 TB every re-slice of the
    // latency/utilization distribution reads this kilobyte mart, never
    // the events table.
    "q_quantile_mart" -> ((s, d) => {
      val mart = graft.operators.Quantiles.histMart(
        Tables.events(s, d).withColumn("dt", to_date(col("ts"))),
        Seq("dt", "event_type"), col("value"), binWidth = 5.0)
      graft.operators.Quantiles.quantiles(
        graft.operators.Quantiles.rollup(mart, Seq("event_type")),
        Seq("event_type"), binWidth = 5.0,
        Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
        .orderBy("event_type")
    }),

    // What HLL cannot do: pairwise AUDIENCE OVERLAP between event types
    // (user-days active in X ∩ Y) from the same 128-hash sketches — no
    // raw-data rescan, no distinct-join. Sketch frames are k longs per
    // type, so the pair join is a broadcast over kilobytes; union and
    // intersection estimates are exact integer arithmetic, hash-checked
    // against DuckDB's list-algebra twin.
    "q_sketch_kmv_overlap" -> ((s, d) => {
      val mart = graft.operators.Kmv.mart(
        Tables.events(s, d).withColumn("dt", to_date(col("ts"))),
        Seq("dt", "event_type"),
        concat(col("user_id").cast("string"), lit(":"),
          col("dt").cast("string")),
        k = 128)
      val sk = graft.operators.Kmv.rollup(mart, Seq("event_type"), k = 128)
      val a = sk.select(col("event_type").as("ta"), col("kmv").as("ka"))
      val b = sk.select(col("event_type").as("tb"), col("kmv").as("kb"))
      graft.operators.Kmv
        .withOverlap(a.join(broadcast(b), col("ta") < col("tb")),
          "ka", "kb", k = 128)
        .select("ta", "tb", "union_est", "inter_est")
        .orderBy("ta", "tb")
    }))

  /** Unrolled twin of Components.pageRank's integer recurrence (iters
    * chained CTE rounds). Same floor `//` divisions, same op order —
    * every value BIGINT, so the hash comparison has zero float slack.
    * DuckDB widens sum(BIGINT) to HUGEINT; every sum is cast back so the
    * schema hashes against Spark's longs.
    */
  private def pagerankOracleSql(iters: Int): String = {
    val base =
      """WITH li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem),
        |cp AS MATERIALIZED (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |         count(DISTINCT a.l_orderkey) AS n_co
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |e AS MATERIALIZED (SELECT src, dst FROM cp WHERE n_co >= 2),
        |nodes AS MATERIALIZED (SELECT DISTINCT id
        |          FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
        |outd AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        |ew AS MATERIALIZED (SELECT e.src, e.dst, outd.outdeg FROM e JOIN outd USING (src)),
        |dang AS MATERIALIZED (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM e)),
        |r0 AS MATERIALIZED (SELECT id, (1000000000000 // n) AS r FROM nodes, nn)""".stripMargin
    val rounds = (1 to iters).map { i =>
      val p = i - 1
      s"""c$i AS MATERIALIZED (SELECT ew.dst AS id, sum(r$p.r // ew.outdeg)::BIGINT AS contrib
        |  FROM ew JOIN r$p ON ew.src = r$p.id GROUP BY ew.dst),
        |d$i AS MATERIALIZED (SELECT coalesce(sum(r$p.r), 0)::BIGINT AS dmass
        |  FROM r$p JOIN dang USING (id)),
        |r$i AS MATERIALIZED (SELECT nodes.id,
        |    ((15 * 1000000000000) // (100 * n)) +
        |    ((85 * (coalesce(c$i.contrib, 0) + (d$i.dmass // n))) // 100) AS r
        |  FROM nodes LEFT JOIN c$i ON nodes.id = c$i.id, nn, d$i)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"$base$rounds\nSELECT id, r AS rank_e12 FROM r$iters ORDER BY id"
  }

  /** Unrolled twin of Components.hits — per round: authority raw sums,
    * 1-row L1 total, normalize; then the same for hubs off the fresh
    * authorities. All BIGINT.
    */
  private def hitsOracleSql(iters: Int): String = {
    val base =
      """WITH li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem),
        |cp AS MATERIALIZED (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |         count(DISTINCT a.l_orderkey) AS n_co
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |e AS MATERIALIZED (SELECT src, dst FROM cp WHERE n_co >= 2),
        |nodes AS MATERIALIZED (SELECT DISTINCT id
        |          FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
        |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
        |h0 AS MATERIALIZED (SELECT id, (1000000000 // n) AS v FROM nodes, nn)""".stripMargin
    val rounds = (1 to iters).map { i =>
      val p = i - 1
      s"""ar$i AS MATERIALIZED (SELECT e.dst AS id, sum(h$p.v)::BIGINT AS v
        |  FROM e JOIN h$p ON e.src = h$p.id GROUP BY e.dst),
        |sa$i AS MATERIALIZED (SELECT sum(v)::BIGINT AS s FROM ar$i),
        |a$i AS MATERIALIZED (SELECT nodes.id, coalesce((ar$i.v * 1000000000) // sa$i.s, 0) AS v
        |  FROM nodes LEFT JOIN ar$i ON nodes.id = ar$i.id, sa$i),
        |hr$i AS MATERIALIZED (SELECT e.src AS id, sum(a$i.v)::BIGINT AS v
        |  FROM e JOIN a$i ON e.dst = a$i.id GROUP BY e.src),
        |sh$i AS MATERIALIZED (SELECT sum(v)::BIGINT AS s FROM hr$i),
        |h$i AS MATERIALIZED (SELECT nodes.id, coalesce((hr$i.v * 1000000000) // sh$i.s, 0) AS v
        |  FROM nodes LEFT JOIN hr$i ON nodes.id = hr$i.id, sh$i)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"$base$rounds\nSELECT id, a$iters.v AS authority_e9, " +
      s"h$iters.v AS hub_e9 FROM a$iters JOIN h$iters USING (id) ORDER BY id"
  }

  /** Unrolled twin of Components.labelPropagation: symmetrized co-order
    * edges, then `iters` rounds of synchronous majority vote with the
    * (cnt DESC, lbl ASC) tie order — all BIGINT, MATERIALIZED CTEs (the
    * recurrence inlines exponentially otherwise, like pageRank's).
    */
  private def communitiesOracleSql(iters: Int): String =
    s"${communitiesCtes(iters)}\n" +
      s"SELECT id, lbl AS community FROM l$iters ORDER BY id"

  /** Unrolled twin of labelPropagationWeighted on the co-order graph:
    * the SAME shared CTE builder, weighted vote selected by flag — the
    * anti-drift rule communitiesCtes exists for applies here too.
    */
  private def communitiesWeightedOracleSql(iters: Int): String =
    s"${communitiesCtes(iters, weighted = true)}\n" +
      s"SELECT id, lbl AS community FROM l$iters ORDER BY id"

  /** The shared CTE prefix (graph build + `iters` LPA rounds ending at
    * l<iters>) — communitiesOracleSql, the weighted twin and the
    * modularity oracle all extend the same recurrence, so none can
    * drift. `weighted` carries n_co as `w` and sums it into the vote
    * (count(*) ≡ sum of 1s otherwise).
    */
  private def communitiesCtes(iters: Int,
                              weighted: Boolean = false): String = {
    val wSel = if (weighted) ", n_co AS w" else ""
    val wSym = if (weighted) ", w" else ""
    val vote = if (weighted) "sum(e.w)::BIGINT" else "count(*)::BIGINT"
    val base =
      """WITH li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem),
        |cp AS MATERIALIZED (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |         count(DISTINCT a.l_orderkey) AS n_co
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |e0 AS MATERIALIZED (SELECT src, dst""".stripMargin +
      s"""$wSel FROM cp WHERE n_co >= 2),
        |e AS MATERIALIZED (SELECT src, dst$wSym FROM e0
        |                   UNION ALL SELECT dst AS src, src AS dst$wSym FROM e0),
        |l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS lbl FROM e)""".stripMargin
    val rounds = (1 to iters).map { i =>
      val p = i - 1
      s"""c$i AS MATERIALIZED (SELECT e.dst AS id, l$p.lbl AS lbl, $vote AS cnt
        |  FROM e JOIN l$p ON e.src = l$p.id GROUP BY 1, 2),
        |l$i AS MATERIALIZED (SELECT id, lbl FROM (
        |  SELECT id, lbl,
        |         row_number() OVER (PARTITION BY id ORDER BY cnt DESC, lbl ASC) AS rn
        |  FROM c$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"$base$rounds"
  }

  /** Modularity oracle: the same LPA recurrence, then the exact-integer
    * per-community decomposition q_num = 4m·L_c − D_c² off l<iters>.
    */
  private def modularityOracleSql(iters: Int): String =
    s"""${communitiesCtes(iters)},
      |deg AS MATERIALIZED (SELECT src AS id, count(*)::BIGINT AS deg
      |  FROM e GROUP BY src),
      |mm AS MATERIALIZED (SELECT count(*)::BIGINT AS m FROM e0),
      |ea AS (SELECT la.lbl AS ca, lb.lbl AS cb FROM e0
      |  JOIN l$iters la ON e0.src = la.id
      |  JOIN l$iters lb ON e0.dst = lb.id),
      |lc AS (SELECT ca AS community, count(*)::BIGINT AS intra
      |  FROM ea WHERE ca = cb GROUP BY 1),
      |dc AS (SELECT l$iters.lbl AS community, sum(deg)::BIGINT AS degree_sum,
      |         count(*)::BIGINT AS n_nodes
      |       FROM l$iters JOIN deg ON l$iters.id = deg.id GROUP BY 1)
      |SELECT dc.community, n_nodes,
      |  coalesce(intra, 0)::BIGINT AS intra_edges, degree_sum, m,
      |  (4 * m * coalesce(intra, 0) - degree_sum * degree_sum)::BIGINT AS q_num_4m2
      |FROM dc LEFT JOIN lc ON dc.community = lc.community, mm
      |ORDER BY 1""".stripMargin

  /** Shared CTE prefix for the unit-weight landmark-distance twins
    * (bfsDistances and its harmonicCloseness aggregate): symmetrized
    * edges, d0 = the 3 smallest node ids at distance 0 to themselves,
    * then `maxHops` bounded Bellman-Ford rounds (min over settled ∪
    * relaxed), ending at d<maxHops>.
    */
  private def distancesCtes(maxHops: Int): String = {
    val base =
      """WITH li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem),
        |cp AS MATERIALIZED (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |         count(DISTINCT a.l_orderkey) AS n_co
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |e0 AS MATERIALIZED (SELECT src, dst FROM cp WHERE n_co >= 2),
        |e AS MATERIALIZED (SELECT src, dst FROM e0
        |                   UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |lms AS MATERIALIZED (SELECT DISTINCT src AS id FROM e ORDER BY id LIMIT 3),
        |d0 AS MATERIALIZED (SELECT id, id AS lm, 0::BIGINT AS dist FROM lms)""".stripMargin
    val rounds = (1 to maxHops).map { i =>
      val p = i - 1
      s"""d$i AS MATERIALIZED (SELECT id, lm, min(dist)::BIGINT AS dist FROM (
        |  SELECT id, lm, dist FROM d$p
        |  UNION ALL
        |  SELECT e.dst AS id, d.lm, d.dist + 1 AS dist
        |  FROM e JOIN d$p d ON e.src = d.id) GROUP BY id, lm)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"$base$rounds"
  }

  /** Unrolled twin of Components.coreness: degree seeds, then `rounds`
    * synchronous h-index rounds (per node: rank neighbor estimates
    * desc, coreness = max(least(rank, value)) — tie order irrelevant to
    * an h-index). Idempotent once converged, so the fixed unroll equals
    * the operator's convergence stop (the kcore oracle discipline).
    */
  private def corenessOracleSql(rounds: Int): String = {
    val base =
      """WITH li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem),
        |cp AS MATERIALIZED (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |         count(DISTINCT a.l_orderkey) AS n_co
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |e0 AS MATERIALIZED (SELECT src, dst FROM cp WHERE n_co >= 2),
        |e AS MATERIALIZED (SELECT src, dst FROM e0
        |                   UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |c0 AS MATERIALIZED (SELECT src AS id, count(*)::BIGINT AS c
        |                    FROM e GROUP BY 1)""".stripMargin
    val rnds = (1 to rounds).map { i =>
      val p = i - 1
      s"""c$i AS MATERIALIZED (SELECT id, max(least(rn, cn))::BIGINT AS c FROM (
        |  SELECT e.src AS id, pc.c AS cn,
        |         row_number() OVER (PARTITION BY e.src ORDER BY pc.c DESC) AS rn
        |  FROM e JOIN c$p pc ON e.dst = pc.id) GROUP BY id)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"$base$rnds\nSELECT id, c AS coreness FROM c$rounds ORDER BY id"
  }

  /** Unrolled twin of Components.bfsDistances off the shared prefix. */
  private def distancesOracleSql(maxHops: Int): String =
    s"${distancesCtes(maxHops)}\nSELECT id, lm AS landmark, dist AS hops " +
      s"FROM d$maxHops ORDER BY id, landmark"

  /** Unrolled twin of Components.harmonicCloseness: the SAME bounded
    * Bellman-Ford CTEs as distancesOracleSql (shared builder — the
    * anti-drift rule), then one aggregate: Σ scale // dist over dist>0
    * rows per node.
    */
  private def closenessOracleSql(maxHops: Int, scale: Long): String =
    s"""${distancesCtes(maxHops)}
      |SELECT id, sum($scale // dist)::BIGINT AS harmonic_scaled,
      |       count(*)::BIGINT AS n_reached
      |FROM d$maxHops WHERE dist > 0 GROUP BY id ORDER BY id""".stripMargin

  /** Unrolled twin of Components.personalizedPageRank: directed co-order
    * edges, seeds = 3 smallest node ids, restart AND dangling mass
    * teleporting to seeds, all floor `//` — every value BIGINT.
    */
  private def pprOracleSql(iters: Int): String = {
    val base =
      """WITH li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem),
        |cp AS MATERIALIZED (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |         count(DISTINCT a.l_orderkey) AS n_co
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |e AS MATERIALIZED (SELECT src, dst FROM cp WHERE n_co >= 2),
        |nodes AS MATERIALIZED (SELECT DISTINCT id
        |          FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |sd AS MATERIALIZED (SELECT id FROM nodes ORDER BY id LIMIT 3),
        |ns AS MATERIALIZED (SELECT count(*) AS ns FROM sd),
        |f AS MATERIALIZED (SELECT nodes.id,
        |       CASE WHEN sd.id IS NOT NULL THEN 1 ELSE 0 END AS is_seed
        |     FROM nodes LEFT JOIN sd ON nodes.id = sd.id),
        |outd AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        |ew AS MATERIALIZED (SELECT e.src, e.dst, outd.outdeg FROM e JOIN outd USING (src)),
        |dang AS MATERIALIZED (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM e)),
        |r0 AS MATERIALIZED (SELECT id, (is_seed * (1000000000000 // ns))::BIGINT AS r
        |     FROM f, ns)""".stripMargin
    val rounds = (1 to iters).map { i =>
      val p = i - 1
      s"""c$i AS MATERIALIZED (SELECT ew.dst AS id, sum(r$p.r // ew.outdeg)::BIGINT AS contrib
        |  FROM ew JOIN r$p ON ew.src = r$p.id GROUP BY ew.dst),
        |d$i AS MATERIALIZED (SELECT coalesce(sum(r$p.r), 0)::BIGINT AS dmass
        |  FROM r$p JOIN dang USING (id)),
        |r$i AS MATERIALIZED (SELECT f.id,
        |    (f.is_seed * ((15 * 1000000000000) // (100 * ns)) +
        |     (85 * (coalesce(c$i.contrib, 0) + f.is_seed * (d$i.dmass // ns))) // 100
        |    )::BIGINT AS r
        |  FROM f LEFT JOIN c$i ON f.id = c$i.id, ns, d$i)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"$base$rounds\nSELECT id, r AS ppr_e12 FROM r$iters ORDER BY id"
  }

  /** Unrolled twin of Components.kCore(k): symmetrized edges, `rounds`
    * peel rounds (idempotent once converged — rounds is a deep margin,
    * not a semantic), then the final in-core degree per survivor.
    */
  private def kcoreOracleSql(k: Int, rounds: Int): String = {
    val base =
      """WITH li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem),
        |cp AS MATERIALIZED (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |         count(DISTINCT a.l_orderkey) AS n_co
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |e0 AS MATERIALIZED (SELECT src, dst FROM cp WHERE n_co >= 2),
        |e AS MATERIALIZED (SELECT src, dst FROM e0
        |                   UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |n0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM e)""".stripMargin
    val rnds = (1 to rounds).map { i =>
      val p = i - 1
      s"""n$i AS MATERIALIZED (SELECT e.src AS id FROM e
        |  JOIN n$p a ON e.src = a.id JOIN n$p b ON e.dst = b.id
        |  GROUP BY e.src HAVING count(*) >= $k)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$base$rnds
      |SELECT e.src AS id, count(*)::BIGINT AS core_degree FROM e
      |JOIN n$rounds a ON e.src = a.id JOIN n$rounds b ON e.dst = b.id
      |GROUP BY e.src ORDER BY id""".stripMargin
  }

  /** Unrolled twin of Components.pageRankWeighted: contribution =
    * (r·w) // Σw(src), weights = co-order counts; otherwise identical
    * to pagerankOracleSql.
    */
  private def pagerankWeightedOracleSql(iters: Int): String = {
    val base =
      """WITH li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem),
        |cp AS MATERIALIZED (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |         count(DISTINCT a.l_orderkey) AS n_co
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |e AS MATERIALIZED (SELECT src, dst, n_co AS w FROM cp WHERE n_co >= 2),
        |nodes AS MATERIALIZED (SELECT DISTINCT id
        |          FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
        |outw AS MATERIALIZED (SELECT src, sum(w)::BIGINT AS sw FROM e GROUP BY src),
        |ew AS MATERIALIZED (SELECT e.src, e.dst, e.w, outw.sw FROM e JOIN outw USING (src)),
        |dang AS MATERIALIZED (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM e)),
        |r0 AS MATERIALIZED (SELECT id, (1000000000000 // n) AS r FROM nodes, nn)""".stripMargin
    val rounds = (1 to iters).map { i =>
      val p = i - 1
      s"""c$i AS MATERIALIZED (SELECT ew.dst AS id, sum((r$p.r * ew.w) // ew.sw)::BIGINT AS contrib
        |  FROM ew JOIN r$p ON ew.src = r$p.id GROUP BY ew.dst),
        |d$i AS MATERIALIZED (SELECT coalesce(sum(r$p.r), 0)::BIGINT AS dmass
        |  FROM r$p JOIN dang USING (id)),
        |r$i AS MATERIALIZED (SELECT nodes.id,
        |    ((15 * 1000000000000) // (100 * n)) +
        |    ((85 * (coalesce(c$i.contrib, 0) + (d$i.dmass // n))) // 100) AS r
        |  FROM nodes LEFT JOIN c$i ON nodes.id = c$i.id, nn, d$i)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"$base$rounds\nSELECT id, r AS rank_e12 FROM r$iters ORDER BY id"
  }

  /** Unrolled twin of Components.bfsDistancesWeighted: symmetrized
    * co-order edges with the similarity→distance cost flip, d0 = 3
    * smallest node ids at cost 0, bounded weighted Bellman-Ford rounds.
    */
  private def distancesWeightedOracleSql(maxHops: Int): String = {
    val base =
      """WITH li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem),
        |cp AS MATERIALIZED (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |         count(DISTINCT a.l_orderkey) AS n_co
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |e0 AS MATERIALIZED (SELECT src, dst,
        |         GREATEST(1, 11 - LEAST(n_co, 10))::BIGINT AS w
        |       FROM cp WHERE n_co >= 2),
        |e AS MATERIALIZED (SELECT src, dst, w FROM e0
        |  UNION ALL SELECT dst AS src, src AS dst, w FROM e0),
        |lms AS MATERIALIZED (SELECT DISTINCT src AS id FROM e ORDER BY id LIMIT 3),
        |d0 AS MATERIALIZED (SELECT id, id AS lm, 0::BIGINT AS cost FROM lms)""".stripMargin
    val rounds = (1 to maxHops).map { i =>
      val p = i - 1
      s"""d$i AS MATERIALIZED (SELECT id, lm, min(cost)::BIGINT AS cost FROM (
        |  SELECT id, lm, cost FROM d$p
        |  UNION ALL
        |  SELECT e.dst AS id, d.lm, d.cost + e.w AS cost
        |  FROM e JOIN d$p d ON e.src = d.id) GROUP BY id, lm)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"$base$rounds\nSELECT id, lm AS landmark, cost " +
      s"FROM d$maxHops ORDER BY id, landmark"
  }

  /** The shared forward-Brandes CTE prefix (graph build + landmark seeds
    * + `maxHops` sigma rounds ending at s<maxHops> with columns (id, lm,
    * dist, sigma)) — pathCountsOracleSql and betweennessOracleSql both
    * extend the same recurrence so neither can drift, the
    * communitiesCtes anti-drift rule.
    */
  private def sigmaCtes(maxHops: Int): String = {
    val base =
      """WITH li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem),
        |cp AS MATERIALIZED (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |         count(DISTINCT a.l_orderkey) AS n_co
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |e0 AS MATERIALIZED (SELECT src, dst FROM cp WHERE n_co >= 2),
        |e AS MATERIALIZED (SELECT src, dst FROM e0
        |                   UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |lms AS MATERIALIZED (SELECT DISTINCT src AS id FROM e ORDER BY id LIMIT 3),
        |s0 AS MATERIALIZED (SELECT id, id AS lm, 0::BIGINT AS dist,
        |                           1::BIGINT AS sigma FROM lms)""".stripMargin
    val rounds = (1 to maxHops).map { i =>
      val p = i - 1
      s"""g$i AS MATERIALIZED (SELECT id, lm, dist, sum(sigma)::BIGINT AS sigma FROM (
        |  SELECT e.dst AS id, s.lm, s.dist + 1 AS dist, s.sigma
        |  FROM e JOIN s$p s ON e.src = s.id
        |  UNION ALL SELECT id, lm, dist, sigma FROM s0) GROUP BY 1, 2, 3),
        |s$i AS MATERIALIZED (SELECT id, lm, dist, sigma FROM (
        |  SELECT id, lm, dist, sigma,
        |         row_number() OVER (PARTITION BY id, lm ORDER BY dist) AS rn
        |  FROM g$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"$base$rounds"
  }

  /** Unrolled twin of Components.bfsPathCounts: per round, seed rows ∪
    * edge relaxations, (id,lm,dist) sigma sums, then argmin by dist.
    */
  private def pathCountsOracleSql(maxHops: Int): String =
    s"${sigmaCtes(maxHops)}\nSELECT id, lm AS landmark, dist AS hops, " +
      s"sigma AS n_paths FROM s$maxHops ORDER BY id, landmark"

  /** Unrolled twin of Components.bfsBetweenness: the sigmaCtes forward
    * phase, then one backward dependency level per hop (bl<h> computed
    * off level h+1's deltas — fixed-point Brandes back-propagation,
    * every term the same single floor `//` as the operator), then the
    * per-node sum over landmarks excluding each landmark itself.
    */
  private def betweennessOracleSql(maxHops: Int, scale: Long): String = {
    val levels = ((maxHops - 1) to 0 by -1).map { h =>
      val (joinPrev, du) =
        if (h == maxHops - 1) ("", "0")
        else (s"\n  LEFT JOIN bl${h + 1} b ON b.id = u.id AND b.lm = u.lm",
          "coalesce(b.delta, 0)")
      s"""bl$h AS MATERIALIZED (
        |  SELECT v.id, v.lm,
        |         sum((v.sigma * ($scale + $du)) // u.sigma)::BIGINT AS delta
        |  FROM s$maxHops v
        |  JOIN e ON e.src = v.id
        |  JOIN s$maxHops u ON u.id = e.dst AND u.lm = v.lm
        |    AND u.dist = v.dist + 1$joinPrev
        |  WHERE v.dist = $h
        |  GROUP BY v.id, v.lm)""".stripMargin
    }.mkString(",\n", ",\n", "")
    val union = (0 until maxHops)
      .map(h => s"SELECT id, lm, delta FROM bl$h")
      .mkString(" UNION ALL ")
    s"""${sigmaCtes(maxHops)}$levels
      |SELECT id, sum(delta)::BIGINT AS betweenness_scaled
      |FROM ($union) WHERE id <> lm GROUP BY id
      |HAVING sum(delta) <> 0 ORDER BY id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_graph_pagerank" -> pagerankOracleSql(5),
    "q_graph_pagerank_weighted" -> pagerankWeightedOracleSql(5),
    "q_graph_path_counts" -> pathCountsOracleSql(5),
    "q_graph_betweenness" -> betweennessOracleSql(4, 100000L),
    "q_graph_closeness" -> closenessOracleSql(5, 100000L),
    // shared CTE builder unrolled past the fixture diameter (the
    // q_graph_distances_frontier idempotence argument) + one aggregate
    "q_graph_closeness_full" -> closenessOracleSql(30, 100000L),
    "q_graph_related" ->
      """WITH li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem),
        |cp AS MATERIALIZED (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |         count(DISTINCT a.l_orderkey) AS n_co
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |e0 AS MATERIALIZED (SELECT src, dst, n_co AS w FROM cp WHERE n_co >= 2),
        |sym AS (SELECT src AS part, dst AS related, w FROM e0
        |        UNION ALL SELECT dst AS part, src AS related, w FROM e0)
        |SELECT part, related, w FROM (
        |  SELECT part, related, w,
        |         row_number() OVER (PARTITION BY part
        |                            ORDER BY w DESC, related ASC) AS rn
        |  FROM sym) WHERE rn <= 3
        |ORDER BY part, related""".stripMargin,
    "q_graph_distances_weighted" -> distancesWeightedOracleSql(5),
    "q_graph_ppr" -> pprOracleSql(5),
    "q_graph_kcore" -> kcoreOracleSql(3, 41),
    "q_graph_coreness" -> corenessOracleSql(30),
    "q_graph_hits" -> hitsOracleSql(5),
    "q_graph_communities" -> communitiesOracleSql(5),
    "q_graph_communities_weighted" -> communitiesWeightedOracleSql(5),
    "q_graph_modularity" -> modularityOracleSql(5),
    "q_graph_distances" -> distancesOracleSql(5),
    // same shared CTE builder, unrolled past the fixture diameter: the
    // recurrence is idempotent once settled, so d30 == the fixpoint the
    // early-stopping frontier loop computes
    "q_graph_distances_frontier" -> distancesOracleSql(30),
    "q_sketch_rollup_exact" ->
      """SELECT event_type,
        |       count(DISTINCT user_id) AS n_users,
        |       count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // KMV twins: the oracle computes k-mins DIRECTLY from raw rows (no
    // mart level) with the same 52-bit md5-prefix hash and the same
    // integer estimator — hash equality proves the Spark-side two-level
    // mart→rollup merge lossless. 127 * 2^52 = 571957152676052992.
    "q_sketch_kmv" ->
      """WITH h AS (SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(user_id::VARCHAR || ':' || (ts::DATE)::VARCHAR),
        |             1, 13))::BIGINT AS h FROM events),
        |r AS (SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
        |sk AS (SELECT event_type, count(*) AS n_mins, max(h) AS hk
        |       FROM r WHERE rn <= 128 GROUP BY event_type)
        |SELECT event_type,
        |  (CASE WHEN n_mins < 128 THEN n_mins
        |        ELSE 571957152676052992 // hk END)::BIGINT AS user_days_est,
        |  n_mins::BIGINT AS n_mins
        |FROM sk ORDER BY event_type""".stripMargin,
    // Histogram-mart twin computed DIRECTLY from raw rows (no mart
    // level): hash equality proves the bin-count merge lossless. Same
    // integer ceil-threshold cross-multiply (cum*den >= num*total).
    "q_quantile_mart" ->
      """WITH h AS (SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bin,
        |         count(*) AS n
        |       FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |c AS (SELECT event_type, bin, n,
        |        sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |        sum(n) OVER (PARTITION BY event_type) AS total FROM h)
        |SELECT event_type,
        |  round((min(CASE WHEN cum * 2 >= total * 1 THEN bin END) + 1) * 5.0, 6) AS p50,
        |  round((min(CASE WHEN cum * 10 >= total * 9 THEN bin END) + 1) * 5.0, 6) AS p90,
        |  round((min(CASE WHEN cum * 100 >= total * 99 THEN bin END) + 1) * 5.0, 6) AS p99,
        |  max(total)::BIGINT AS n_values
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sketch_kmv_overlap" ->
      """WITH h AS (SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(user_id::VARCHAR || ':' || (ts::DATE)::VARCHAR),
        |             1, 13))::BIGINT AS h FROM events),
        |r AS (SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
        |sk AS (SELECT event_type, list_sort(list(h)) AS kmv
        |       FROM r WHERE rn <= 128 GROUP BY event_type),
        |pr AS (SELECT a.event_type AS ta, b.event_type AS tb,
        |              a.kmv AS ka, b.kmv AS kb
        |       FROM sk a JOIN sk b ON a.event_type < b.event_type),
        |u AS (SELECT ta, tb, ka, kb,
        |        list_sort(list_distinct(list_concat(ka, kb)))[1:128] AS uu FROM pr),
        |m AS (SELECT ta, tb, ka, kb, uu, len(uu) AS nu, uu[len(uu)] AS hku,
        |        len(list_filter(uu, x -> list_contains(ka, x)
        |              AND list_contains(kb, x))) AS nb FROM u),
        |e2 AS (SELECT ta, tb, ka, kb, nu, nb,
        |        (CASE WHEN nu < 128 THEN nu
        |              ELSE 571957152676052992 // hku END)::BIGINT AS union_est
        |       FROM m)
        |SELECT ta, tb, union_est,
        |  (CASE WHEN nu < 128 THEN len(list_intersect(ka, kb))
        |        ELSE (nb * union_est) // 128 END)::BIGINT AS inter_est
        |FROM e2 ORDER BY ta, tb""".stripMargin,

    // Twin of q_graph_triangles: same co-order edges, id-ordered triangle
    // enumeration (orientation changes which node enumerates a wedge,
    // never the triangle set), same per-node explode.
    "q_graph_triangles" ->
      """WITH li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem),
        |cp AS MATERIALIZED (
        |  SELECT a.l_partkey AS ida, b.l_partkey AS idb,
        |         count(DISTINCT a.l_orderkey) AS n
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |pairs AS (SELECT ida, idb FROM cp WHERE n >= 2),
        |tri AS (
        |  SELECT e1.ida AS a, e1.idb AS b, e2.idb AS c
        |  FROM pairs e1 JOIN pairs e2 ON e2.ida = e1.idb
        |  JOIN pairs e3 ON e3.ida = e1.ida AND e3.idb = e2.idb),
        |deg AS (
        |  SELECT id, count(*) AS deg
        |  FROM (SELECT unnest([ida, idb]) AS id FROM pairs) GROUP BY id),
        |nodes AS MATERIALIZED (SELECT unnest([a, b, c]) AS id FROM tri),
        |tc AS (SELECT id, count(*) AS n_triangles FROM nodes GROUP BY id)
        |SELECT id, deg, n_triangles,
        |       round(2.0 * n_triangles / (deg * (deg - 1)), 6) AS clustering
        |FROM tc JOIN deg USING (id) ORDER BY id""".stripMargin,
    "q_topk_native" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_stats_corr" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_qty_price,
        |  round(var_pop(l_discount), 8) AS var_discount,
        |  round(stddev_pop(l_tax), 8) AS sd_tax
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // pivot ≡ conditional aggregation — semantically identical crosstab
    "q_pivot" ->
      """SELECT source,
        |  count(*) FILTER (lang = 'en') AS en,
        |  count(*) FILTER (lang = 'fr') AS fr,
        |  count(*) FILTER (lang = 'es') AS es,
        |  count(*) FILTER (lang = 'de') AS de
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       row_number() OVER w AS rn,
        |       rank() OVER w AS rnk,
        |       dense_rank() OVER w AS drnk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_window_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       lag(o_orderdate, 1) OVER w AS prev_date,
        |       lead(o_orderdate, 1) OVER w AS next_date,
        |       date_diff('day', lag(o_orderdate, 1) OVER w, o_orderdate) AS days_since_prev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
        |       round(avg(o_totalprice) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS avg_last3
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       count(*) AS n,
        |       CAST(grouping(l_returnflag) AS TINYINT) AS g_flag,
        |       CAST(grouping(l_linestatus) AS TINYINT) AS g_status
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status,
        |         coalesce(l_returnflag, ''), coalesce(l_linestatus, '')""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       round(sum(o_totalprice), 2) AS revenue,
        |       count(*) AS n,
        |       CAST(grouping(o_orderstatus) AS TINYINT) AS g_status,
        |       CAST(grouping(o_orderpriority) AS TINYINT) AS g_prio
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_prio,
        |         coalesce(o_orderstatus, ''), coalesce(o_orderpriority, '')""".stripMargin,
    "q_window_rank_family" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  nth_value(o_totalprice, 2) OVER
        |    (PARTITION BY o_orderpriority
        |     ORDER BY o_totalprice DESC, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS second_highest
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q_window_range_1h" ->
      """WITH t AS (
        |  SELECT event_id, user_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, value
        |  FROM events)
        |SELECT event_id, user_id, ts_sec,
        |       count(*) OVER w AS n_events_1h,
        |       round(sum(value) OVER w, 4) AS sum_value_1h
        |FROM t
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_group_concat" ->
      """SELECT source,
        |       string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs,
        |       count(DISTINCT lang) AS n_langs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin,
        |       CAST(floor(value / 10.0) AS BIGINT) * 10.0 AS lo,
        |       count(*) AS n
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_quantile_grid" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_extendedprice, 0.1), 4) AS p10,
        |       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        |       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_distinct_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS dt,
        |       count(DISTINCT user_id) AS n_users,
        |       count(DISTINCT event_type) AS n_types,
        |       count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY dt""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_suppkey) AS n_supp,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       round(sum(DISTINCT l_quantity), 4) AS sum_distinct_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_set_union" ->
      """SELECT bucket, count(*) AS n, count(DISTINCT o_custkey) AS n_cust FROM (
        |  SELECT o_custkey, 'hi' AS bucket FROM orders WHERE o_totalprice > 400000
        |  UNION ALL
        |  SELECT o_custkey, 'lo' AS bucket FROM orders WHERE o_totalprice < 50000) t
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_totalprice < 50000
        |ORDER BY o_custkey""".stripMargin,
    "q_set_except" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice < 50000
        |ORDER BY o_custkey""".stripMargin)
}
