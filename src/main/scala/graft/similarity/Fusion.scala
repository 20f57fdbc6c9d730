package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a lexical (BM25) and one
  * or more semantic (ANN) ranked lists into one ranking, the standard
  * final step of a hybrid search stack.
  *
  * Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR'09):
  * fused(d) = Σ_lists 1/(k0 + rank_list(d)), with k0=60 the published
  * constant. Score-free by design — it never compares BM25 scores with
  * cosines, only ranks, which is why it needs no per-source calibration.
  *
  * Computed here as exact integers: each contribution is
  * `scale div (k0 + rank)` (floor), summed as longs — the fused score is
  * bit-identical under any partitioning or engine, so downstream ties
  * and hashes can't drift the way float 1/(60+r) sums can. At the
  * default 1e6 scale the floor loses < 1e-6 of a contribution — far
  * below the gap between adjacent ranks (1/(60+r) - 1/(61+r) ≈ 2.4e-4
  * at r=1).
  *
  * Distributed shape: the inputs are already top-k lists (bounded: k
  * rows per key), so the fusion full-outer joins k-sized fragments on
  * (keys, id) — shuffle bounded by Σ lists' k, independent of corpus
  * size. Nothing here touches the corpus again.
  */
object Fusion {

  /** Fuse named ranked lists. Each input df carries `keyCols` (query
    * identity), `idCol` (the ranked item) and `rankCol` (1-based rank;
    * only rows with rank >= 1 should be present). Emits one row per
    * (keys, id) seen in ANY list with:
    *   rn_<name>  — that list's rank, 0 when the list missed the item
    *   rrf_e6     — Σ scale div (k0 + rank) over lists that ranked it
    */
  def rrf(lists: Seq[(String, DataFrame)], keyCols: Seq[String],
          idCol: String, rankCol: String = "rn", k0: Int = 60,
          scale: Long = 1000000L): DataFrame = {
    require(lists.nonEmpty, "rrf: no input lists")
    require(lists.map(_._1).distinct.size == lists.size,
      "rrf: duplicate list names")
    require(k0 >= 1 && scale >= 1000L, s"rrf: degenerate k0=$k0 scale=$scale")
    val joinCols = keyCols :+ idCol
    val prepared = lists.map { case (name, df) =>
      name -> df.select(
        joinCols.map(col) ++ Seq(
          col(rankCol).as(s"rn_$name"),
          expr(s"$scale div ($k0 + $rankCol)").as(s"_c_$name")): _*)
    }
    val joined = prepared.map(_._2).reduce(_.join(_, joinCols, "full_outer"))
    val names = lists.map(_._1)
    joined.select(
      joinCols.map(col) ++
        names.map(n => coalesce(col(s"rn_$n"), lit(0)).as(s"rn_$n")) :+
        names.map(n => coalesce(col(s"_c_$n"), lit(0L)))
          .reduce(_ + _).as("rrf_e6"): _*)
  }
}
