package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Diversity sampling for training corpora: greedy k-center coreset
  * selection over an embedding column (Gonzalez 1985's 2-approximation
  * to the k-center cover; "farthest-point sampling"). Picks k vectors
  * such that every selected point is, at its selection time, the point
  * FARTHEST from the already-selected set — the standard deduplicated-
  * diversity subset a fine-tuning pipeline draws from a large corpus
  * (maximize coverage of embedding space with a fixed budget), and the
  * classic seeding step for k-means++-style initialization.
  *
  * Determinism contract (what makes it hash-oracleable cross-engine):
  * the seed is the SMALLEST id; each round selects by the min-distance-
  * to-centers ROUNDED to 6 decimals, ties broken to the smallest id.
  * Rounding commutes with min (round is monotone), so "round each
  * distance then min" and "min then round" are the same value — the
  * DuckDB oracle may carry per-round rounded minima while this
  * implementation recomputes, and both land on identical selections.
  * Distance = round(sqrt(Σ(xᵢ−yᵢ)²), 6), the same sequential double
  * loop DuckDB's `list_distance` runs (the list_cosine_similarity
  * parity precedent from the ANN oracles).
  *
  * Scale design: centers live on the DRIVER (bounded: k ≤ 64 — the Pq
  * ≤1024-sample posture), injected into the plan as array LITERALS, so
  * every round is ONE job: a stateless map over the corpus scan
  * (distance to each center, least, round) feeding a partial-aggregable
  * global `max(struct(dist, -id, vec))` — the only exchange is the
  * 1-row-per-partition partial gather, zero checkpoints, nothing
  * corpus-sized ever materialized or shuffled. The
  * winning vector rides the 1-row aggregate back to the driver (one
  * embedding, not a collect). Total cost = k linear passes ≈ n·k²/2
  * distance evaluations; the per-element HOF (`zip_with`+`aggregate`)
  * is fine here because the work is n·k, never a pair join — the n²
  * regime where the native VecDot expression earns its keep (VectorOps
  * scaladoc) doesn't arise.
  */
object Coreset {

  /** Maximum selectable centers — bounds driver state AND the literal
    * expression size each round's plan carries (k vectors × dim).
    */
  val MaxK = 64

  /** Greedy k-center selection over `corpus` (`id` long, `vec`
    * array<double>). Returns exactly k rows (rank, id, dist): rank 1 is
    * the smallest id at dist 0.0; rank i > 1 maximizes the rounded
    * min-distance to ranks 1..i−1 (tie → smallest id), `dist` being
    * that min-distance — a non-increasing sequence whose last value is
    * the covering radius achieved by the selection. Fails loudly if the
    * corpus has fewer than k rows.
    */
  def kCenterGreedy(corpus: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= MaxK, s"kCenterGreedy: k $k out of [1,$MaxK]")
    val base = corpus.select(col("id").cast("long").as("id"), col("vec"))
    val seed = base.orderBy("id").select("id", "vec").head()
    extend(base, List((seed.getLong(0),
      seed.getSeq[Double](1).toArray, 0.0d)), k)
  }

  /** INCREMENTAL extension — the maintenance entry (the coreset twin of
    * `Ivf.topKIvfIndexed` / `Pq.topKPqIndexed`): continue the greedy
    * selection from an EXISTING center table (`centers`: rank, id, vec,
    * dist — [[saveCenters]] output) up to `k` total. Greedy selection
    * is a deterministic recurrence in its prefix: extending the first
    * j centers of a run IS rounds j+1..k of the full run, so a grown
    * budget (or a corpus-refresh re-cover) never re-pays the first j
    * passes — and the exact-equivalence proof is free:
    * extend(load(save(greedy(j))), k) ≡ greedy(k), which is what
    * q_coreset_incremental hash-checks against the SAME oracle.
    */
  def kCenterGreedyExtend(corpus: DataFrame, centers: DataFrame,
                          k: Int): DataFrame = {
    require(k >= 1 && k <= MaxK,
      s"kCenterGreedyExtend: k $k out of [1,$MaxK]")
    val base = corpus.select(col("id").cast("long").as("id"), col("vec"))
    val prior = centers.select("rank", "id", "vec", "dist")
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getSeq[Double](2).toArray,
        r.getDouble(3)))
      .toList
    require(prior.nonEmpty && prior.size <= k,
      s"kCenterGreedyExtend: ${prior.size} prior centers, k=$k")
    extend(base, prior.reverse, k)
  }

  /** Persist a selection WITH its vectors (the reload-and-extend
    * contract needs them; doubles round-trip parquet bit-identically).
    */
  def saveCenters(selection: DataFrame, corpus: DataFrame,
                  path: String): Unit =
    selection.join(corpus.select(col("id").cast("long").as("id"),
        col("vec")), "id")
      .select("rank", "id", "vec", "dist")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)

  /** `chosenRev` is newest-first (id, vec, dist-at-selection). */
  private def extend(base: DataFrame,
                     chosenRev: List[(Long, Array[Double], Double)],
                     k: Int): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    // each greedy round is ONE global aggregate whose parallelism comes
    // from the corpus scan's input partitions, not shuffle partitions —
    // running the rounds on the narrow session (graft.operators
    // .NarrowExec) removes AQE's extra stage job per round (k rounds =
    // k fewer jobs; the 1-row final merge is single-partition either
    // way, at any scale)
    val nbase = graft.operators.NarrowExec.narrowed(base, 1)

    def distTo(center: Array[Double]): Column = {
      val c = array(center.map(lit): _*)
      sqrt(aggregate(zip_with(col("vec"), c,
        (x, y) => (x - y) * (x - y)), lit(0.0d), _ + _))
    }

    var chosen = chosenRev
    for (_ <- chosen.size + 1 to k) {
      val md = round(chosen.map(c => distTo(c._2)).reduce(least(_, _)), 6)
      val winner = nbase
        .filter(!col("id").isInCollection(chosen.map(_._1)))
        .agg(max(struct(md.as("d"), (-col("id")).as("nid"),
          col("vec").as("v"))).as("m"))
        .head().getStruct(0)
      require(winner != null,
        s"kCenterGreedy: corpus has fewer than $k rows")
      chosen ::= ((-winner.getLong(1),
        winner.getSeq[Double](2).toArray, winner.getDouble(0)))
    }
    chosen.reverse.zipWithIndex
      .map { case ((id, _, d), i) => (i + 1, id, d) }
      .toDF("rank", "id", "dist")
  }
}
