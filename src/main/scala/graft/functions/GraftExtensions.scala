package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers graft's native Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT simhash60(...)")`
  * works next to the DataFrame API. Enable with
  *
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  *
  * Integer parameters (k, bands, n, …) arrive as SQL literals and are
  * bound at resolution time — the expressions themselves carry them as
  * constructor fields, which keeps codegen free of per-row parameter
  * reads.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def register(ext: SparkSessionExtensions, name: String,
                       usage: String, builder: FunctionBuilder): Unit =
    ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator surface: top-k-per-key partial/final physical plan
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // optimizer surface: rewrite row_number()<=k idiom onto that operator
    ext.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
    register(ext, "vec_dot",
      "vec_dot(a array<double>, b array<double>) - dot product",
      { case Seq(a, b) => VecDot(a, b) })
    register(ext, "simhash60",
      "simhash60(tokens array<string>) - 60-bit majority-vote SimHash",
      { case Seq(t) => SimHash60(t) })
    register(ext, "minhash_sig",
      "minhash_sig(shingles array<string>, k int) - k-component MinHash signature",
      { case Seq(s, k) => MinHashSig(s, intArg(k, "minhash_sig", 1)) })
    register(ext, "lsh_band_keys",
      "lsh_band_keys(shingles array<string>, bands int, r int) - LSH band bucket keys",
      { case Seq(s, b, r) =>
        LshBandKeys(s, intArg(b, "lsh_band_keys", 1), intArg(r, "lsh_band_keys", 2)) })
    register(ext, "word_shingles",
      "word_shingles(tokens array<string>, n int) - distinct word n-grams",
      { case Seq(t, n) => WordShingles(t, intArg(n, "word_shingles", 1)) })
    register(ext, "text_stats",
      "text_stats(text string) - struct(n_tokens, avg_word_len, fp)",
      { case Seq(t) => TextStats(t) })
    register(ext, "deflate_ratio",
      "deflate_ratio(text string) - DEFLATE compressed/raw byte ratio " +
        "(low = repetitive/boilerplate, ~1 = high-entropy)",
      { case Seq(t) => DeflateRatio(t) })
    register(ext, "nfc_normalize",
      "nfc_normalize(text string) - Unicode NFC canonical composition",
      { case Seq(t) => NfcNormalize(t) })
    register(ext, "sign_lsh_band_keys",
      "sign_lsh_band_keys(vec array<double>, bands int, r int) - banded " +
        "random-hyperplane LSH keys for cosine near-dup search",
      { case Seq(v, b, r) => SignLshBandKeys(v,
        intArg(b, "sign_lsh_band_keys", 1), intArg(r, "sign_lsh_band_keys", 2)) })
    register(ext, "random_project",
      "random_project(vec array<double>, k int) - Johnson-Lindenstrauss " +
        "projection to k dims over the md5-parity hyperplane family",
      { case Seq(v, k) => RandomProject(v, intArg(k, "random_project", 1)) })
    register(ext, "winnow_fps",
      "winnow_fps(tokens array<string>, k int, w int) - winnowing " +
        "fingerprint values (min k-gram hash per w-window, MOSS-style)",
      { case Seq(t, k, w) =>
        WinnowFps(t, intArg(k, "winnow_fps", 1), intArg(w, "winnow_fps", 2)) })
    // merges tables are tokenizer state, not SQL literals — the SQL
    // surface binds the session default (graft.text.Bpe.defaultMerges);
    // other tables go through the DataFrame API
    register(ext, "bpe_merge_count",
      "bpe_merge_count(tokens array<string>) - exact BPE token count " +
        "under the default merges table",
      { case Seq(t) => BpeMergeCount(t, graft.text.Bpe.defaultMerges) })
    register(ext, "bpe_merge_segment",
      "bpe_merge_segment(tokens array<string>) - BPE pieces under the " +
        "default merges table",
      { case Seq(t) => BpeMergeSegment(t, graft.text.Bpe.defaultMerges) })
    register(ext, "sorted_intersect_count",
      "sorted_intersect_count(a array<string>, b array<string>) - " +
        "intersection size of two SORTED string arrays (linear merge; " +
        "the PPJoin verify primitive)",
      { case Seq(a, b) => SortedIntersectCount(a, b) })
    register(ext, "char_hist27",
      "char_hist27(text string) - 27-bin character histogram (a-z + " +
        "other), one pass; compute per doc, never per pair",
      { case Seq(t) => CharHist27(t) })
    register(ext, "l1_dist",
      "l1_dist(a array<int>, b array<int>) - element-wise L1 distance " +
        "(null-free arrays; pairs with char_hist27 as the edit-distance " +
        "count filter)",
      { case Seq(a, b) => L1Dist(a, b) })
    // hash_feature_sum is NOT SQL-registered on purpose: its weight
    // vector is model state bound at construction (like the BPE merge
    // tables), but unlike the merges there is no meaningful session
    // default — models come from HashClassifier.fit. DataFrame API only.
  }
}
