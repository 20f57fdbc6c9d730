package graft.similarity

import graft.plans.TopKPerKey
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared top-k ranking tail for every ANN path: exact (score desc, id
  * asc) rank per query WITHOUT a per-key Window.
  *
  * The previous formulation — `row_number().over(Window.partitionBy(
  * "qid"))` — funnels each query's entire candidate stream through one
  * task and fully sorts it before discarding all but k rows. Invisible
  * at sf0.1; at 100× a single query's candidates (the whole corpus for
  * brute force / PQ-ADC, nprobe/nlist of it for IVF) sort on one
  * partition. Here instead:
  *
  *  1. `plans.TopKPerKey` prunes to ≤k rows per key with bounded heaps —
  *     the map-side partial pass cuts each input partition to ≤k rows
  *     per key BEFORE the exchange, so shuffle volume is k·keys·
  *     partitions instead of the candidate count, and nothing ever
  *     sorts a whole group.
  *  2. The rank materializes by sorting the ≤k survivors per key inside
  *     one `sort_array(collect_list(struct(-score, id, …)))` + posexplode
  *     — an aggregate over ≤k-element arrays, not a Window, and the
  *     aggregate reuses TopKPerKey's key-clustered exchange (no extra
  *     shuffle).
  *
  * Determinism matches the window formulation exactly: rank by rounded
  * score descending, id ascending (struct comparison on (-score, id) is
  * that order for the numeric ids used throughout).
  */
private[similarity] object Ranking {

  /** Rank `scored` to the top `k` rows per `keyCol` by (`scoreCol` desc,
    * `idCol` asc), emitting (keyCol, rnCol, idCol, scoreCol, carry…).
    * `carry` columns ride the struct through the sort unchanged.
    */
  def topKRanked(scored: DataFrame, keyCol: String, scoreCol: String,
                 idCol: String, k: Int, rnCol: String = "rn",
                 carry: Seq[String] = Nil): DataFrame = {
    val pruned = TopKPerKey.perKey(
      scored.select((Seq(keyCol, scoreCol, idCol) ++ carry).map(col): _*),
      Seq(keyCol), Seq((scoreCol, false), (idCol, true)), k)
    val entry = struct(
      (col(scoreCol) * lit(-1)).as("_neg") +: col(idCol).as("_tid") +:
        col(scoreCol).as("_s") +: carry.map(col): _*)
    pruned
      .groupBy(keyCol)
      .agg(sort_array(collect_list(entry)).as("_arr"))
      .select(col(keyCol), posexplode(col("_arr")).as(Seq("_pos", "_e")))
      .select(col(keyCol) +: (col("_pos") + 1).as(rnCol) +:
        col("_e._tid").as(idCol) +: col("_e._s").as(scoreCol) +:
        carry.map(c => col(s"_e.$c").as(c)): _*)
  }

  /** Shortlist variant: top `k` ids per key, rank discarded — just the
    * bounded-heap prune, no rank materialization at all.
    */
  def topKIds(scored: DataFrame, keyCol: String, scoreCol: String,
              idCol: String, k: Int): DataFrame =
    TopKPerKey.perKey(scored.select(col(keyCol), col(scoreCol), col(idCol)),
        Seq(keyCol), Seq((scoreCol, false), (idCol, true)), k)
      .select(keyCol, idCol)
}
