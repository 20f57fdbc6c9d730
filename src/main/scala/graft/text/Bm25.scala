package graft.text

import graft.plans.TopKPerKey
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Okapi BM25 full-text retrieval (Robertson & Zaragoza 2009) — the
  * lexical search half of a training-data pipeline: seed-corpus mining
  * ("find documents like these quality seeds"), eval-set provenance
  * lookups, and the keyword leg of hybrid (BM25 + ANN) retrieval.
  * Complements q_tfidf_top_terms (corpus-level term profiles): this is
  * query→ranked-documents, not term→weight.
  *
  * Distributed shape — classic inverted-index retrieval, no per-query
  * corpus scan:
  *  1. `postings` builds (term, doc, tf, dl) with one explode + one
  *     keyed aggregation — shuffle linear in token count, the same cost
  *     class as a word count. At 100 TB the postings frame is the thing
  *     you persist (bucketed by term) and reuse across query batches.
  *  2. The query set is tiny and BROADCAST onto the postings, so only
  *     postings of query terms survive the probe — corpus rows with no
  *     query term are never shuffled.
  *  3. Per-(query, doc) scores aggregate exactly (see below) in one
  *     hash aggregation, then the ranked tail rides TopKPerKey's bounded
  *     heaps + a sort_array over <=k survivors — no Window, nothing
  *     sorts a whole candidate list.
  *
  * Determinism: the per-term BM25 contribution is computed in ONE fixed
  * floating-point expression (identical op order in the DuckDB oracle,
  * fractional literals cast to DOUBLE there so DuckDB's decimal literals
  * can't change rounding), then scaled to an e9 fixed-point LONG. The
  * per-document score is the exact integer sum of those longs — immune
  * to shuffle-arrival summation order, which is what lets the ranked
  * output hash bit-exact cross-engine (ties broken by doc id on equal
  * score_e9, also exact).
  */
object Bm25 {

  /** Inverted postings: (id, dl, term, tf) — doc length rides the
    * grouping (functionally dependent on id) so scoring needs no second
    * join back to the corpus.
    */
  def postings(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("w"))
      .select(col("id"), size(col("w")).as("dl"), explode(col("w")).as("term"))
      .groupBy("id", "dl", "term")
      .agg(count(lit(1)).as("tf"))

  /** Top-`topK` documents per query by BM25. `queries` is (query_id,
    * term) with distinct terms per query. Emits (query_id, rn, id,
    * score_e9, score); queries matching no document emit no rows.
    *
    * k1/b are the standard defaults; idf is the +1-saturated form
    * ln(1 + (N - df + 0.5)/(df + 0.5)) — always positive, so stopword
    * terms dilute rather than invert rankings.
    */
  def search(docs: DataFrame, queries: DataFrame, topK: Int = 5,
             idCol: String = "doc_id", textCol: String = "text",
             k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val post = postings(docs, idCol, textCol)
    val dfT = post.groupBy("term").agg(count(lit(1)).as("df"))
    // corpus stats (N, total tokens) in one 1-row broadcast; zero-token
    // docs still count toward N/avgdl (corpus stats are corpus stats)
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(size(TextFunctions.tokens(col(textCol)))), lit(0L))
        .as("sum_dl"))
    val contrib = broadcast(queries)
      .join(post, "term")
      .join(dfT, "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("id"),
        round(
          log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
            (col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
              lit(b) * col("dl") / (col("sum_dl").cast("double") / col("n_docs")))) *
            lit(1e9))
          .cast("long").as("c"))
    val scored = contrib
      .groupBy("query_id", "id")
      .agg(sum(col("c")).as("score_e9"))
    val pruned = TopKPerKey.perKey(scored, Seq("query_id"),
      Seq(("score_e9", false), ("id", true)), topK)
    // rank materialization over <=topK survivors per key: an aggregate
    // on tiny arrays reusing TopKPerKey's key-clustered exchange, not a
    // Window (same tail as similarity.Ranking.topKRanked)
    val entry = struct((col("score_e9") * lit(-1L)).as("_neg"),
      col("id").as("_id"), col("score_e9").as("_s"))
    pruned
      .groupBy("query_id")
      .agg(sort_array(collect_list(entry)).as("_arr"))
      .select(col("query_id"), posexplode(col("_arr")).as(Seq("_pos", "_e")))
      .select(col("query_id"), (col("_pos") + 1).as("rn"),
        col("_e._id").as(idCol), col("_e._s").as("score_e9"),
        // readable float twin derived FROM the exact long — identical
        // on both engines by construction
        round(col("_e._s") / lit(1e9), 6).as("score"))
  }
}
