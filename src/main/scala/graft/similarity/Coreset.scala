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
  * global `max(struct(dist, -id, vec))` — zero exchanges, zero
  * checkpoints, nothing corpus-sized ever materialized or shuffled. The
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
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(col("id").cast("long").as("id"), col("vec"))

    def distTo(center: Array[Double]): Column = {
      val c = array(center.map(lit): _*)
      sqrt(aggregate(zip_with(col("vec"), c,
        (x, y) => (x - y) * (x - y)), lit(0.0d), _ + _))
    }

    val seed = base.orderBy("id").select("id", "vec").head()
    var chosen = List((seed.getLong(0),
      seed.getSeq[Double](1).toArray, 0.0d))
    for (_ <- 2 to k) {
      val md = round(chosen.map(c => distTo(c._2)).reduce(least(_, _)), 6)
      val winner = base
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
