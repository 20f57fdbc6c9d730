package graft.text

import graft.text.TextFunctions.tokenCount
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the training-data step that concatenates a corpus
  * in a deterministic order and slices it into fixed token-budget
  * sequences ("packs"); every document is assigned to the pack its first
  * token lands in.
  *
  * This is the prefix-sum ("concatenate then chunk") packing used when
  * documents are joined with a separator token and cut into max-length
  * training sequences. Unlike greedy bin packing (which closes a bin when
  * the next item would overflow — inherently sequential state), the
  * chunk boundary is a pure function of the exclusive prefix sum of token
  * counts, so it is expressible as ONE window cumsum: distributed,
  * deterministic, and oracle-checkable in any engine.
  *
  * Scale note: the exclusive prefix sum is computed by
  * DistributedRank.globalPositions since round 12 — a parallel range
  * sort of (id, n_tokens) pairs (text is tokenized away first; PlanSpec
  * asserts it) plus a bounded per-partition subtotal pass — so there is
  * NO single-partition stage anywhere: the globally-contiguous pack
  * order is now the 100-TB posture outright, not a documented
  * trade-off. (Sharded packing still composes: pass each shard's frame
  * here and every shard packs independently.)
  */
object Packing {

  /** Per-document pack assignment: (id, n_tokens, tokens_before,
    * pack_id), ordered by `idCol`. `packTokens` is the per-pack token
    * budget (sequence length). `tokenCounter` maps the text column to
    * its token count — default is the whitespace tokenizer; pass
    * `c => Bpe.bpeMergeCount(TextFunctions.tokens(c))` to pack on exact
    * tokenizer counts.
    */
  def packBySize(docs: DataFrame, idCol: String, textCol: String,
                 packTokens: Int,
                 tokenCounter: Column => Column = tokenCount): DataFrame = {
    require(packTokens > 0, s"packTokens must be positive, got $packTokens")
    graft.operators.DistributedRank.globalPositions(
        docs.select(col(idCol),
          tokenCounter(col(textCol)).cast("long").as("n_tokens")),
        Seq(col(idCol)), sumCol = "n_tokens")
      // exclusive prefix = inclusive running sum minus own count
      .withColumn("tokens_before", col("cum") - col("n_tokens"))
      // integral `div`, not floor(double /): exact for every budget, and
      // bit-identical to the oracle's `//`
      .withColumn("pack_id", expr(s"tokens_before div $packTokens"))
      .select(col(idCol), col("n_tokens"), col("tokens_before"),
        col("pack_id"))
  }

  /** Pack-level summary: docs per pack, token fill, id span. A full pack
    * carries ~`packTokens` tokens (the last doc of a pack may spill into
    * the next — by construction only the FIRST token position decides
    * membership, matching the concatenate-then-chunk semantics).
    */
  def packStats(docs: DataFrame, idCol: String, textCol: String,
                packTokens: Int,
                tokenCounter: Column => Column = tokenCount): DataFrame =
    packBySize(docs, idCol, textCol, packTokens, tokenCounter)
      .groupBy("pack_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))
}
