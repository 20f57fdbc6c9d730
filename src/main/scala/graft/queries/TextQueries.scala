package graft.queries

import graft.Tables
import graft.text.TextFunctions._
import org.apache.spark.sql.functions._

/** Text-analysis operators over the documents corpus (training-data
  * pipeline surface: token stats, quality scoring, language ID,
  * fingerprinting). All are narrow per-row transforms built from
  * codegen'd higher-order functions — they scale embarrassingly (no
  * shuffle except the final oracle-determinism sort).
  */
object TextQueries extends QueryPack {

  /** Shared fit(train)→score(holdout) frame for the calibration queries:
    * train = doc_id % 5 != 4, holdout = the remaining 20%, label planted
    * as doc_id % 3 = 0 (the same deterministic fixture label the
    * classifier query trains on). A disjoint holdout matters even for a
    * closed-form fit — thresholds tuned on training scores overstate
    * precision at the operating point.
    */
  private def calibScored(s: org.apache.spark.sql.SparkSession,
                          d: String): org.apache.spark.sql.DataFrame = {
    val labeled = Tables.documents(s, d)
      .withColumn("pos", col("doc_id") % 3 === 0)
    val w = graft.text.HashClassifier.collectWeights(
      graft.text.HashClassifier.fit(
        labeled.filter(col("doc_id") % 5 =!= 4), "text", "pos", dim = 256),
      dim = 256)
    graft.text.HashClassifier.score(
      labeled.filter(col("doc_id") % 5 === 4), "text", w)
  }

  /** Planted-HTML wrap for the extraction fixture: real markup around the
    * raw document text with every boilerplate category represented —
    * head/title, a style block, a script block (containing '<' and a fake
    * tag, so wholesale block removal is exercised), a nav menu, an HTML
    * comment, a heading, list chrome, and an entity-bearing footer. The
    * body text is the ONLY line with >= 5 words (the fixture's documents
    * all have >= 10), so `extractMainText` must recover exactly the
    * original text — which the q_text_extract round_trip column proves
    * on both engines.
    */
  private[queries] def plantedHtml: org.apache.spark.sql.Column = concat(
    lit("<html><head><title>Doc "), col("doc_id").cast("string"),
    lit(" fixture</title><style>body { margin: 0; }</style>" +
      "<script type=\"text/javascript\">var x = 1 < 2; // <p>skip</p></script>" +
      "</head><body><nav>Home About</nav><!-- boilerplate note -->" +
      "<div class=\"main\"><h1>Doc "),
    col("doc_id").cast("string"),
    lit(" heading</h1><p>"), col("text"),
    lit("</p><ul><li>"), col("lang"), lit("</li><li>"), col("source"),
    lit("</li></ul></div><footer>&copy; 2026 Example</footer></body></html>"))

  /** DuckDB twin of `Curation.extractMainText(plantedHtml, 5)` as a full
    * SELECT over `documents`, exposing (doc_id, text, lang, source) with
    * `text` replaced by the extraction — reused verbatim by the
    * q_text_extract oracle and as the source CTE of the corpus-funnel
    * oracle. Patterns are the Java-regex ∩ RE2 common subset, identical
    * strings to the Scala side ('g' flag because DuckDB replaces only
    * the first match by default).
    */
  private[queries] val extractedDocsSql: String = {
    def rr(x: String, pat: String, rep: String) =
      s"regexp_replace($x, '$pat', $rep, 'g')"
    val noBlocks = rr(rr(rr("html",
      """(?is)<script[^>]*>.*?</script>""", "''"),
      """(?is)<style[^>]*>.*?</style>""", "''"),
      """(?s)<!--.*?-->""", "''")
    val lineBroken = rr(noBlocks,
      """(?i)<(?:br|hr)[^>]*>|</(?:p|div|li|h[1-6]|tr|table|ul|ol""" +
        """|blockquote|title|section|article|header|footer|nav|td|th)[^>]*>""",
      "chr(10)")
    val untagged = rr(lineBroken, """(?s)<[^>]*>""", "' '")
    val decoded = Seq("&lt;" -> "'<'", "&gt;" -> "'>'", "&quot;" -> "'\"'",
        "&#39;" -> "''''", "&nbsp;" -> "' '", "&amp;" -> "'&'")
      .foldLeft(untagged) { case (x, (e, c)) => s"replace($x, '$e', $c)" }
    val norm = rr(rr(decoded, """[ \t\r\f]+""", "' '"),
      """(?m)^ | $""", "''")
    val pruned = rr(norm, """(?m)^(?:\S+(?: \S+){0,3})?$""", "''")
    val squeezed =
      s"trim(${rr(pruned, """\n+""", "chr(10)")}, ' ' || chr(10))"
    val htmlExpr =
      """'<html><head><title>Doc ' || doc_id::VARCHAR || ' fixture</title>""" +
        """<style>body { margin: 0; }</style>""" +
        """<script type="text/javascript">var x = 1 < 2; // <p>skip</p></script>""" +
        """</head><body><nav>Home About</nav><!-- boilerplate note -->""" +
        """<div class="main"><h1>Doc ' || doc_id::VARCHAR || """ +
        """' heading</h1><p>' || text || '</p><ul><li>' || lang || """ +
        """'</li><li>' || source || '</li></ul></div>""" +
        """<footer>&copy; 2026 Example</footer></body></html>'"""
    s"""SELECT doc_id, raw_text, $squeezed AS text, lang, source
       |FROM (SELECT doc_id, text AS raw_text, $htmlExpr AS html, lang, source
       |      FROM documents)""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    // HTML main-content extraction over the planted-markup fixture:
    // script/style/comment removal, block-boundary line breaks, tag
    // stripping, entity decode, and the boilerpipe-style short-line cut
    // (Curation.extractMainText). round_trip proves the extraction
    // recovers the original body text exactly on BOTH engines.
    "q_text_extract" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          graft.text.Curation.extractMainText(plantedHtml).as("main_text"))
        .select(col("doc_id"), col("main_text"),
          length(col("main_text")).as("n_chars_main"),
          (col("main_text") === col("text")).cast("int").as("round_trip"))
        .orderBy("doc_id")),

    // Token counting + punctuation + word-length stats + content
    // fingerprint per document. One native tokenizer pass feeds the three
    // token-derived stats (graft.functions.TextStats — bit-identical to
    // the TextFunctions HOF versions, which remain the oracle semantics).
    "q_text_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          graft.functions.TextHashExpressions.textStats(col("text")).as("ts"))
        .select(
          col("doc_id"),
          col("ts.n_tokens").as("n_tokens"),
          length(col("text")).as("n_chars_measured"),
          punctRatio(col("text")).as("punct_ratio"),
          round(col("ts.avg_word_len"), 6).as("avg_word_len"),
          col("ts.fp").as("fp"))
        .orderBy("doc_id")),

    // Language-ID heuristic via marker-token counts, strict priority.
    // One native tokenize pass (textProfile) instead of five markerCount
    // re-tokenizations — round 14; values bit-identical (TextHashExprSpec
    // parity + the unchanged DuckDB oracle hash).
    "q_text_langid" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("__p", graft.text.TextFunctions.textProfile(col("text")))
        .select(
          col("doc_id"),
          col("__p.en").as("en_hits"),
          col("__p.fr").as("fr_hits"),
          col("__p.es").as("es_hits"),
          col("__p.de").as("de_hits"),
          graft.text.TextFunctions.langIdFromProfile(col("__p"))
            .as("lang_pred"))
        .orderBy("doc_id")),

    // Script detection over a deterministically multilingual-ized corpus
    // (the raw fixture is all-Latin, so two doc subsets are re-scripted
    // via 1:1 translate — Cyrillic lookalikes and CJK — exactly
    // reproducibly in both engines): per-doc script char counts and the
    // dominant script, the routing signal that runs BEFORE token-level
    // langid in a multilingual pipeline.
    "q_text_scripts" -> ((s, d) => {
      import graft.text.TextFunctions._
      Tables.documents(s, d)
        .withColumn("t",
          when(col("doc_id") % 7 === 2,
            translate(col("text"), "aeost", "аеост"))
          .when(col("doc_id") % 7 === 3,
            translate(col("text"), "aeost", "安营送天爱"))
          .otherwise(col("text")))
        .select(col("doc_id"),
          latinCount(col("t")).as("n_latin"),
          cyrillicCount(col("t")).as("n_cyrillic"),
          cjkCount(col("t")).as("n_cjk"),
          arabicCount(col("t")).as("n_arabic"),
          dominantScript(col("t")).as("script"))
        .orderBy("doc_id")
    }),

    // Rolling-hash fingerprint (order-sensitive) + BPE-ish sub-word token
    // count per document.
    "q_text_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          rollingHash(col("text")).as("rolling_fp"),
          bpeTokenCount(col("text")).as("n_bpe_tokens"))
        .orderBy("doc_id")),

    // Composite quality score (length/punct/stopword mix).
    // qualityScore composes three tokenizations (length, punct,
    // stopword legs); the profile derivation is one — bit-identical
    // (TextHashExprSpec + unchanged oracle).
    "q_text_quality" -> ((s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"), col("lang"),
          graft.text.TextFunctions.qualityFromProfile(
            graft.text.TextFunctions.textProfile(col("text")))
            .as("quality"))
        .orderBy("doc_id")),

    // fastText-style hashed-feature NB classifier (HashClassifier):
    // train log-odds weights on a planted boolean label (doc_id % 3 = 0
    // — the label is arbitrary; the query proves the exact train→score
    // path cross-engine), then score EVERY doc as sigmoid of its mean
    // token weight via the codegen'd hash_feature_sum. Model dim 256.
    "q_quality_classifier" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labeled = docs.withColumn("pos", col("doc_id") % 3 === 0)
      val w = graft.text.HashClassifier.collectWeights(
        graft.text.HashClassifier.fit(labeled, "text", "pos", dim = 256),
        dim = 256)
      graft.text.HashClassifier.score(docs, "text", w)
        .select("doc_id", "q_score")
        .orderBy("doc_id")
    }),

    // Threshold CALIBRATION for the classifier: fit on the train split
    // (doc_id % 5 != 4), score the held-out 20%, sweep an integer-percent
    // threshold grid per source — one (source, thr_pct) row with
    // confusion counts and precision/recall/F1. This is the missing step
    // between score and the keep filter: nothing in fit/score selects an
    // operating point; the sweep is what does.
    "q_quality_threshold_sweep" -> ((s, d) => {
      val scored = calibScored(s, d)
      graft.text.HashClassifier.thresholdSweep(scored, "source", "pos")
        .orderBy("source", "thr_pct")
    }),

    // The chosen per-source operating points: max-F1 row of the sweep,
    // ties toward the LOWEST threshold (keep more data when quality is
    // indistinguishable). Window-free per-key argmax (broadcast-joined
    // tiny aggregates) — composes with capPerKey / tokenBudgetPerKey as
    // the keep-filter's per-source threshold table.
    "q_quality_calibration" -> ((s, d) => {
      val scored = calibScored(s, d)
      graft.text.HashClassifier.bestThresholds(
          graft.text.HashClassifier.thresholdSweep(scored, "source", "pos"),
          "source")
        .orderBy("source")
    }),

    // Deterministic stratified sampling: hash-mod membership per lang
    // (reproducible across engines/runs — the oracle reproduces the
    // EXACT sample, which rand()-based sampling never could).
    "q_sample_stratified" -> ((s, d) =>
      graft.sampling.Sampling.stratifiedSample(
          Tables.documents(s, d), "doc_id", "lang",
          Map("en" -> 0.5, "fr" -> 0.25), defaultFraction = 0.1)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")),

    // Weighted sampling without replacement (Efraimidis-Spirakis race),
    // 3 docs per source with probability ∝ n_chars — the "sample long
    // documents preferentially" knob. Scores round identically on both
    // engines; selection rides the TopKPerKey bounded-heap operator
    // (PlanSpec pins the plan), and the oracle reproduces the exact
    // winners via the same md5-seeded race.
    "q_sample_weighted" -> ((s, d) =>
      graft.sampling.Sampling.weightedSamplePerKey(
          Tables.documents(s, d).select("source", "doc_id", "n_chars"),
          "source", "doc_id", "n_chars", k = 3, salt = "wsamp")
        .orderBy("source", "score", "doc_id")),

    // Dataset mixing: the per-SOURCE sampling weights a training-data
    // recipe assigns (upsample high-quality sources, downsample the
    // rest) applied as one deterministic stratified filter; output is
    // the per-source surviving mixture. Same hash-mod membership as all
    // sampling here — the oracle reproduces the exact row set.
    "q_sample_mixture" -> ((s, d) =>
      graft.sampling.Sampling.stratifiedSample(
          Tables.documents(s, d), "doc_id", "source",
          Map("src0" -> 0.9, "src1" -> 0.6, "src2" -> 0.3),
          defaultFraction = 0.1, salt = "mixture")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_sum"))
        .orderBy("source")),

    // DSIR-style importance weights (LmScore.importanceWeights): every
    // non-English doc scored by how English-like its bigram distribution
    // is relative to the raw pool — the likelihood-ratio data-selection
    // signal (target = the corpus's English docs as curated exemplars).
    // High logw = select first.
    "q_dsir_weights" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.text.LmScore.importanceWeights(
          raw = docs.filter(col("lang") =!= "en"),
          target = docs.filter(col("lang") === "en"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Distribution drift (Population Stability Index) between the full
    // corpus and its quality-filtered survivors: per-bin token-count
    // fractions and PSI terms over fixed split bounds
    // (operators.Drift.psiBins) — the "did my filter shift the length
    // distribution?" check an ongoing pipeline runs per batch. Two
    // corpus scans, bin-keyed tiny shuffles, nothing else.
    "q_corpus_drift" -> ((s, d) => {
      import graft.text.TextFunctions._
      val docs = Tables.documents(s, d)
      val ref = docs.select(tokenCount(col("text")).cast("double").as("v"))
      // cur needs quality + token count — one profile pass (round 14)
      val cur = docs
        .withColumn("__p", graft.text.TextFunctions.textProfile(col("text")))
        .filter(graft.text.TextFunctions.qualityFromProfile(col("__p")) >= 0.4)
        .select(col("__p.n_tokens").cast("double").as("v"))
      graft.operators.Drift.psiBins(ref, cur, "v",
        Seq(20.0, 40.0, 60.0, 80.0, 100.0))
    }),

    // Deterministic per-epoch global shuffle (Export.epochShuffle): the
    // trainer-facing order for epoch 1 — a pure md5(seed:epoch:id) total
    // order, bit-reproducible cross-engine, re-keyed (not re-seeded) per
    // epoch. The key column is kept in the output so the oracle compare
    // pins the ORDER itself, not just the row set.
    "q_epoch_shuffle" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.sources.Export.epochKey(col("doc_id"), epoch = 1).as("k"))
        .orderBy("k")),

    // Deterministic train/eval split (20% eval by id hash): per-split
    // count + id checksum attest the EXACT membership cross-engine —
    // a row never migrates between splits under appends.
    "q_train_eval_split" -> ((s, d) => {
      val (train, eval) = graft.sampling.Sampling.trainEvalSplit(
        Tables.documents(s, d), "doc_id", evalFraction = 0.2)
      train.select(lit("train").as("split"), col("doc_id"))
        .union(eval.select(lit("eval").as("split"), col("doc_id")))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_sum"))
        .orderBy("split")
    }),

    // Sequence packing: concatenate-then-chunk assignment of docs to
    // fixed 512-token training packs via one global window cumsum
    // (graft.text.Packing — see its scaladoc for the 100-TB sharding
    // posture), summarized per pack.
    "q_seq_packing" -> ((s, d) =>
      graft.text.Packing.packStats(Tables.documents(s, d), "doc_id",
          "text", packTokens = 512)
        .orderBy("pack_id")),

    // Exact merges-driven BPE token counts (graft.text.Bpe): per doc the
    // word count, the replayed-merges token count, and their ratio. The
    // oracle refolds the committed merges table as a replace() chain
    // over separator-joined code points — an independent second
    // implementation of the same published algorithm (Sennrich ACL'16).
    "q_text_bpe_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .select(col("doc_id"),
          size(col("w")).as("n_words"),
          graft.text.Bpe.bpeMergeCount(col("w")).cast("long")
            .as("n_bpe_tokens"))
        .withColumn("tokens_per_word",
          round(col("n_bpe_tokens").cast("double") /
            greatest(col("n_words"), lit(1)), 6))
        .orderBy("doc_id")),

    // The SEGMENTATION itself, piece by piece: every doc's BPE pieces in
    // document order, positional — the strongest cross-engine check of
    // the merge replay (counts could agree by accident; the exact piece
    // sequence cannot). This is the surface a piece→id vocab join turns
    // into trainer token ids.
    "q_text_bpe_pieces" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          graft.text.Bpe.bpeMergePieces(tokens(col("text"))).as("pieces"))
        .select(col("doc_id"), posexplode(col("pieces")).as(Seq("pos", "piece")))
        .orderBy("doc_id", "pos")),

    // BPE TRAINING itself: one corpus pass for the word-frequency
    // dictionary (the only corpus-sized work), then the classic
    // pair-frequency merge loop driver-side over the vocab-sized state —
    // the sentencepiece/HF split of the problem. HASH-ORACLED since
    // round 10: the merge-argmax recurrence unrolls as 32 materialized
    // CTE rounds (bpeTrainOracleSql — greedy non-overlap via the
    // parity-within-run rule), the same discipline as the graph
    // recurrences; BpeSpec additionally pins that this exact trainer
    // reproduces the committed bpe_merges.txt bit-for-bit on its sf0.1
    // training corpus, and that fixture is itself DuckDB-refold-oracled
    // via q_text_bpe_tokens — trainer → merges → replay → oracle.
    "q_text_bpe_train" -> ((s, d) => {
      import s.implicits._
      val merges = graft.text.Bpe.trainMerges(
        graft.text.Bpe.wordFrequencies(Tables.documents(s, d), "text"), 32)
      merges.zipWithIndex
        .map { case ((l, r), i) => (i, l, r) }
        .toDF("rank", "left", "right")
        .orderBy("rank")
    }),

    // Trainer token IDS: pieces mapped through the merges-induced
    // vocabulary (base symbols then merge products, id = position) —
    // the final surface a training pipeline exports. Oracle maps the
    // same pieces through a VALUES table built from the same vocab.
    "q_text_token_ids" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          graft.text.Bpe.tokenIds(tokens(col("text"))).as("ids"))
        .select(col("doc_id"), posexplode(col("ids")).as(Seq("pos", "tid")))
        .orderBy("doc_id", "pos")),

    // Sequence packing on EXACT tokenizer counts: Packing.packBySize
    // with the Bpe counter plugged in — proves the packing operators
    // accept a swapped token counter end-to-end against an oracle that
    // refolds the merges inside the same prefix-sum arithmetic.
    "q_seq_packing_bpe" -> ((s, d) =>
      graft.text.Packing.packStats(Tables.documents(s, d), "doc_id",
          "text", packTokens = 512,
          tokenCounter = c => graft.text.Bpe.bpeMergeCount(tokens(c)))
        .orderBy("pack_id")),

    // TF-IDF top-5 terms per source: term frequency within source ×
    // inverse source frequency (ln(n_sources/df)), ranked on the
    // ROUNDED score with term tiebreak so both engines rank
    // identically. The (source, term) tf table is the source-vocab-sized
    // model artifact: pinned so the df derivation and the scoring join
    // share ONE corpus explode (lazily each branch re-tokenized the
    // corpus). The ranked tail is TopKPerKey + the Bm25 rank pattern,
    // not a Window: partitionBy(source) has ~20 keys with vocab-sized
    // partitions — the low-cardinality window cliff the round-12 sweep
    // removed everywhere else (parallelism |sources| forever, per-task
    // rows growing with the vocabulary).
    "q_tfidf_top_terms" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tf = graft.operators.Artifacts.pinEager(
        docs
          .select(col("source"), explode(tokens(col("text"))).as("term"))
          .groupBy("source", "term")
          .agg(count(lit(1)).as("tf")),
        "tfidf.tf") // materialize once; both consumers read the cache
      // tf has one row per (source, term), so counting rows per term IS
      // the number of sources containing the term
      val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nSrc = docs.agg(countDistinct(col("source")).as("n_src"))
      val scored = tf.join(dfT, "term")
        .crossJoin(broadcast(nSrc))
        .withColumn("score",
          round(col("tf") * log(col("n_src").cast("double") / col("df")), 6))
        .select("source", "term", "tf", "df", "score")
      // scores are >= 0 (df <= n_src), so negation is a safe descending
      // key; rank materializes over <= 5 survivors per source
      val pruned = graft.plans.TopKPerKey.perKey(scored, Seq("source"),
        Seq(("score", false), ("term", true)), 5)
      val entry = struct((col("score") * lit(-1.0)).as("_neg"),
        col("term").as("_term"), col("tf").as("_tf"), col("df").as("_df"),
        col("score").as("_score"))
      pruned
        .groupBy("source")
        .agg(sort_array(collect_list(entry)).as("_arr"))
        .select(col("source"), posexplode(col("_arr")).as(Seq("_pos", "_e")))
        .select(col("source"), (col("_pos") + 1).as("rn"),
          col("_e._term").as("term"), col("_e._tf").as("tf"),
          col("_e._df").as("df"), col("_e._score").as("score"))
        .orderBy("source", "rn")
    }),

    // BM25 retrieval: fixed query set → top-5 documents each, over the
    // inverted postings with the query terms broadcast (only postings of
    // query terms are ever shuffled) and the ranked tail on TopKPerKey
    // heaps. Scores are exact e9-scaled longs (see Bm25) so the ranking
    // and the hash are bit-stable cross-engine; query 4 carries a term
    // absent from the corpus (contributes nothing — the no-match path).
    "q_text_bm25" -> ((s, d) => {
      import s.implicits._
      val q = Seq(
        (1, "hash"), (1, "join"),
        (2, "window"), (2, "sort"), (2, "spark"),
        (3, "scan"), (3, "filter"), (3, "column"),
        (4, "stream"), (4, "batch"), (4, "merge"), (4, "vector"),
        (4, "zzz_unseen")).toDF("query_id", "term")
      graft.text.Bm25.search(Tables.documents(s, d), q, topK = 5)
        .orderBy("query_id", "rn")
    }),

    // Gopher-style repetition signals: most-frequent-token share and
    // duplicate-bigram share per doc — the boilerplate/keyword-stuffing
    // detector that length/punct scoring misses. Distributed as explode +
    // two keyed aggregations (linear shuffle), NOT a per-row O(n²) pass.
    "q_text_repetition" -> ((s, d) =>
      graft.text.Curation.repetitionStats(Tables.documents(s, d),
          "text", "doc_id")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // PII redaction audit over a corpus with DETERMINISTICALLY planted
    // PII (the raw fixture has none, and a redaction query that can only
    // return zero rows would prove nothing): plant an email on every 7th
    // doc and a phone on every 11th, then count matches and fingerprint
    // the redacted text — the fingerprint proves the replacement output,
    // not just the counts, agrees cross-engine.
    "q_text_redact" -> ((s, d) => {
      import graft.text.Curation._
      val emailRe = defaultPiiPatterns(0)._1
      val phoneRe = defaultPiiPatterns(1)._1
      val planted = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com now")))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" or call 555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
              lit(" today")))
            .otherwise(lit(""))).as("ptext"))
      planted.select(col("doc_id"),
          piiCount(col("ptext"), emailRe).as("n_emails"),
          piiCount(col("ptext"), phoneRe).as("n_phones"),
          md5(redact(col("ptext"))).as("redacted_fp"))
        .filter(col("n_emails") + col("n_phones") > 0)
        .orderBy("doc_id")
    }),

    // Token-window chunking (size 20, stride 16): the pretraining/RAG
    // chunker. Fingerprints prove the window CONTENT agrees cross-engine.
    "q_text_chunks" -> ((s, d) =>
      graft.text.Curation.chunkTokens(Tables.documents(s, d),
          "text", "doc_id", chunkSize = 20, stride = 16)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "chunk_idx")),

    // CCNet-style bigram-LM quality scoring: per-doc average negative
    // log-likelihood under the corpus's own bigram model (see
    // graft.text.LmScore for the 100-TB shuffle shape). The model-based
    // sibling of the rule-based qualityScore filter.
    "q_text_lm_score" -> ((s, d) =>
      graft.text.LmScore.scoreDocs(Tables.documents(s, d))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // Tokenizer-budget curve: smallest frequency-ranked vocab reaching
    // 50/75/90/95/99% cumulative token coverage (Curation.vocabCoverage;
    // exact integer cum/total so both engines agree bit-for-bit).
    "q_vocab_coverage" -> ((s, d) =>
      graft.text.Curation.vocabCoverage(Tables.documents(s, d))),

    // Per-source cap (corpus balancing): keep the 20 best-quality docs
    // per source (quality desc, doc_id tiebreak — Sampling.capPerKey),
    // summarized as kept-count/id-checksum/quality cutoff per source.
    // The fixture has ~25 docs per source, so the cap genuinely drops
    // rows and the cutoff is a real interior quantile.
    "q_source_cap" -> ((s, d) => {
      val q = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          qualityScore(col("text")).as("q"))
      graft.sampling.Sampling
        .capPerKey(q, "source", 20, col("q").desc, col("doc_id"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_kept"),
          sum("doc_id").as("id_sum"),
          round(min("q"), 6).as("cutoff_quality"))
        .orderBy("source")
    }),

    // Per-source TOKEN budget (Sampling.tokenBudgetPerKey): each source
    // contributes at most 800 tokens, filled greedily in deterministic
    // hash order — the token-level mixture knob (doc caps weigh a tweet
    // and a book the same; training loss is paid per token). Fixture
    // sources carry ~1300-1550 tokens, so the budget genuinely cuts.
    "q_token_budget" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          tokenCount(col("text")).as("n_tok"),
          graft.sampling.Sampling.bucket(col("doc_id"), "budget").as("b"))
      graft.sampling.Sampling
        .tokenBudgetPerKey(docs, "source", "n_tok", budget = 800L,
          col("b"), col("doc_id"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tok").as("kept_tokens"),
          sum("doc_id").as("id_sum"))
        .orderBy("source")
    }),

    // Adaptive per-language quality gate: keep each language's top
    // quartile by quality — thresholds that FLOAT with the language
    // (a fixed global cutoff over-filters whichever language the scorer
    // is hardest on). Rank-based membership (quality desc, doc_id
    // tiebreak over the already-rounded score) so the cut is integer
    // logic both engines reproduce exactly — a value-interpolated
    // quantile threshold would put the boundary doc at the mercy of
    // last-bit float disagreement.
    "q_quality_gate" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("quality").desc, col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          qualityScore(col("text")).as("quality"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("lang")))
        .filter(col("rn") * 4 <= col("n"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_kept"),
          round(min("quality"), 6).as("min_quality"),
          sum("doc_id").as("id_sum"))
        .orderBy("lang")
    }),

    // DEFLATE compression-ratio entropy signal (native DeflateRatio
    // expression — Gopher-family): boilerplate compresses far below
    // natural prose. The raw fixture is all mid-entropy (ratios
    // 0.39-0.91), so every 13th doc is REPLACED by stamped-out
    // repetition of its own prefix — the flag must fire on exactly
    // those. No DuckDB zlib surface → rows-only check; the spec pins
    // low/high-entropy behavior on constructed fixtures.
    "q_text_compress" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          when(col("doc_id") % 13 === 0,
            repeat(substring(col("text"), 1, 40), 40))
            .otherwise(col("text")).as("ptext"))
        .select(col("doc_id"), col("source"),
          graft.functions.TextHashExpressions.deflateRatio(col("ptext"))
            .as("deflate_ratio"))
        .withColumn("is_low_entropy",
          (col("deflate_ratio") < 0.35).cast("int"))
        .orderBy("doc_id")),

    // Temperature-scaled mixture (alpha = 0.5): per-source keep rates
    // ∝ sqrt(w_min/w_source) flatten the token distribution toward the
    // mT5/XLM-R temperature target — the smallest source keeps all its
    // docs, heavy sources are cut. sqrt is IEEE-correctly-rounded, so
    // the oracle reproduces the EXACT thresholds and membership.
    "q_temperature_mix" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          tokenCount(col("text")).as("n_tok"))
      graft.sampling.Sampling
        .temperatureSample(tok, "doc_id", "source", "n_tok")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tok").as("kept_tokens"),
          sum("doc_id").as("id_sum"),
          min("thr").as("thr"))
        .orderBy("source")
    }),

    // Unicode NFC normalization audit (native NfcNormalize — same name
    // and spec as DuckDB's built-in): decomposed sequences ("e"+combining
    // acute) are the SAME text as their precomposed forms but different
    // bytes, so un-normalized fingerprints split identical docs. The
    // ASCII fixture is NFC-trivial, so every 9th doc gets PLANTED
    // decomposed suffixes — byte length must shrink and the normalized
    // fingerprint must agree cross-engine on exactly those docs.
    "q_text_normalize" -> ((s, d) => {
      val nfc = graft.functions.TextHashExpressions.nfcNormalize _
      val planted = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 9 === 0,
          concat(col("text"),
            lit(" cafe\u0301 nai\u0308ve re\u0301sume\u0301")))
          .otherwise(col("text")).as("ptext"))
      planted.select(col("doc_id"),
          octet_length(col("ptext")).cast("long").as("raw_bytes"),
          octet_length(nfc(col("ptext"))).cast("long").as("nfc_bytes"),
          md5(nfc(col("ptext"))).as("nfc_fp"))
        .withColumn("changed",
          (col("raw_bytes") =!= col("nfc_bytes")).cast("int"))
        .orderBy("doc_id")
    }),

    // Count-min-sketch heavy hitters: the fixed-memory frequency sketch
    // for streams/corpora whose vocabulary doesn't fit an exact groupBy
    // — a (depth × width) counter grid replaces per-key state, built by
    // one distributed pass (counter sums commute, so the estimate is
    // deterministic under any partitioning/merge order; seed pinned).
    // Output: the exact top-20 tokens with exact vs sketch counts —
    // overcount ≥ 0 by construction (CMS never undercounts), bounded by
    // eps·total w.h.p. The exact agg exists here only as ground truth;
    // at 100 TB only the sketch pass runs. Sketch estimates have no
    // DuckDB surface → rows-only; SketchSpec pins the bounds.
    "q_heavy_hitters" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("tok"))
      val cms = toks.stat.countMinSketch("tok",
        eps = 0.001, confidence = 0.99, seed = 42)
      val bc = s.sparkContext.broadcast(cms)
      val est = udf((t: String) => bc.value.estimateCount(t))
      toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok"))
        .limit(20)
        .withColumn("est_cnt", est(col("tok")))
        .withColumn("overcount", col("est_cnt") - col("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok"))
    }),

    // Data card: the per-source release profile (docs, token mass,
    // length distribution, quality, language mix, low-quality share) in
    // ONE aggregation over one narrow projection — each signal is a
    // one-pass aggregate of per-row expressions, so the whole card costs
    // a single scan + single exchange at any corpus size.
    "q_corpus_report" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("__p", graft.text.TextFunctions.textProfile(col("text")))
        .select(col("source"),
          col("__p.n_tokens").cast("int").as("nt"),
          graft.text.TextFunctions.qualityFromProfile(col("__p")).as("q"),
          (graft.text.TextFunctions.langIdFromProfile(col("__p")) === "en")
            .cast("int").as("is_en"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("nt").as("n_tokens"),
          round(avg("nt"), 6).as("avg_tokens"),
          round(percentile(col("nt"), lit(0.5)), 6).as("p50_tokens"),
          round(avg("q"), 6).as("avg_quality"),
          round(avg((col("q") < 0.4).cast("int")), 6).as("low_quality_frac"),
          round(avg("is_en"), 6).as("en_frac"))
        .orderBy("source")),

    // Corpus-level quality profile per source.
    "q_text_quality_by_source" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("__p", graft.text.TextFunctions.textProfile(col("text")))
        .select(col("source"),
          graft.text.TextFunctions.qualityFromProfile(col("__p")).as("q"),
          col("__p.n_tokens").as("nt"))
        .groupBy("source")
        .agg(
          round(avg("q"), 6).as("avg_quality"),
          round(percentile(col("q"), lit(0.5)), 6).as("median_quality"),
          round(avg("nt"), 6).as("avg_tokens"),
          count(lit(1)).as("n_docs"))
        .orderBy("source")),

    // Per-source lexical-diversity profile — the distinct-n /
    // type-token-ratio signal a pretraining mix uses to spot templated
    // or machine-spun sources (low trigram diversity = heavy internal
    // repetition). Totals come free from per-doc token counts (no
    // explode); the two cross-doc DISTINCT counts are the real work —
    // partial-distinct aggregation on (source, gram), shuffle linear in
    // the distinct-gram volume, never the token volume. wordShingles
    // emits per-doc-distinct trigrams, which leaves the cross-doc
    // distinct count unchanged while shrinking the explode.
    "q_ngram_diversity" -> ((s, d) => {
      import graft.functions.TextHashExpressions.wordShingles
      val docs = Tables.documents(s, d)
        .select(col("source"), tokens(col("text")).as("w"))
      val totals = docs
        .select(col("source"), size(col("w")).as("n_tok"),
          greatest(size(col("w")) - lit(2), lit(0)).as("n_tri"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          sum(col("n_tri")).as("total_trigrams"))
      val dTok = docs.select(col("source"), explode(col("w")).as("tok"))
        .groupBy("source")
        .agg(countDistinct(col("tok")).as("distinct_tokens"))
      val dTri = docs
        .select(col("source"), explode(wordShingles(col("w"), 3)).as("tri"))
        .groupBy("source")
        .agg(countDistinct(col("tri")).as("distinct_trigrams"))
      totals.join(dTok, Seq("source")).join(dTri, Seq("source"))
        .select(col("source"), col("n_docs"), col("total_tokens"),
          col("distinct_tokens"), col("total_trigrams"),
          col("distinct_trigrams"),
          round(col("distinct_tokens") / col("total_tokens"), 6).as("ttr"),
          round(col("distinct_trigrams") / col("total_trigrams"), 6)
            .as("trigram_diversity"))
        .orderBy("source")
    }))

  /** DuckDB twin of TextFunctions.qualityScore over a CTE exposing
    * (text, w) — interpolated everywhere the oracle needs the score so
    * the formula cannot drift between queries (it must also stay in
    * lockstep with the Scala side).
    */
  private val qualitySql =
    """round(least(len(w)::DOUBLE / 100.0, 1.0) * 0.5
      |   + (1.0 - least(round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
      |         / greatest(length(text), 1), 6) * 10.0, 1.0)) * 0.2
      |   + least(len(list_filter(w, x -> x IN ('the','and','of','to','a','in')))::DOUBLE / 5.0, 1.0) * 0.3, 6)""".stripMargin

  private val tokensSql =
    """list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')"""

  /** Shared oracle prefix for the calibration queries: the classifier
    * twin restricted to the train split (doc_id % 5 <> 4), holdout scores
    * for the remaining 20%, and the per-(source, thr_pct) confusion sweep
    * with precision/recall/F1 — CTE `m` is the sweep both final SELECTs
    * consume. Integer-percent grid (generate_series(5, 95, 5)) matches
    * thresholdSweep's `stepPct until 100 by stepPct` exactly; tp/fp/fn
    * cast to BIGINT so the schema hashes against Spark's longs.
    */
  private val calibSweepSql =
    s"""WITH toks AS (SELECT doc_id, source, $tokensSql AS w FROM documents),
      |occ AS (
      |  SELECT (t.doc_id % 3 = 0) AS pos,
      |    ('0x' || substr(md5(u.tok), 1, 8))::BIGINT % 256 AS b
      |  FROM toks t, unnest(t.w) AS u(tok) WHERE t.doc_id % 5 <> 4),
      |cnt AS (
      |  SELECT b, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS cp,
      |         sum(CASE WHEN pos THEN 0 ELSE 1 END) AS cn
      |  FROM occ GROUP BY b),
      |tot AS (SELECT sum(cp) AS tp, sum(cn) AS tn FROM cnt),
      |wts AS (
      |  SELECT g.b,
      |    round(ln((COALESCE(cnt.cp, 0) + 1.0) / (tot.tp + 256.0))
      |        - ln((COALESCE(cnt.cn, 0) + 1.0) / (tot.tn + 256.0)), 9) AS wt
      |  FROM generate_series(0, 255) AS g(b)
      |  LEFT JOIN cnt ON cnt.b = g.b, tot),
      |warr AS (SELECT list(wt ORDER BY b) AS arr FROM wts),
      |sc AS (
      |  SELECT t.source, (t.doc_id % 3 = 0) AS pos,
      |    round(1.0 / (1.0 + exp(-(CASE WHEN len(t.w) = 0 THEN 0.0
      |      ELSE list_sum(list_transform(t.w, tk ->
      |        arr[(('0x' || substr(md5(tk), 1, 8))::BIGINT % 256)::INT + 1]))
      |        / len(t.w) END))), 9) AS s
      |  FROM toks t, warr WHERE t.doc_id % 5 = 4),
      |sweep AS (
      |  SELECT source, g.thr_pct::INT AS thr_pct,
      |    sum(CASE WHEN pos AND s >= g.thr_pct / 100.0 THEN 1 ELSE 0 END)::BIGINT AS tp,
      |    sum(CASE WHEN NOT pos AND s >= g.thr_pct / 100.0 THEN 1 ELSE 0 END)::BIGINT AS fp,
      |    sum(CASE WHEN pos AND NOT (s >= g.thr_pct / 100.0) THEN 1 ELSE 0 END)::BIGINT AS fn
      |  FROM sc, generate_series(5, 95, 5) AS g(thr_pct)
      |  GROUP BY source, g.thr_pct),
      |m AS (
      |  SELECT source, thr_pct, tp, fp, fn,
      |    round(tp / greatest(tp + fp, 1), 6) AS "precision",
      |    round(tp / greatest(tp + fn, 1), 6) AS recall,
      |    round(2 * tp / greatest(2 * tp + fp + fn, 1), 6) AS f1
      |  FROM sweep)""".stripMargin

  /** DuckDB expression computing the exact BPE token count of word `wd`
    * under the committed merges table: code points joined by chr(1),
    * then one literal replace() per merge rule in priority order —
    * leftmost non-overlapping, the same semantics as String.replace in
    * the native expression — then separators + 1.
    */
  private val bpeFoldSql: String = {
    val start = """rtrim(regexp_replace(wd, '(.)', '\1' || chr(1), 'g'), chr(1))"""
    graft.text.Bpe.defaultMerges.foldLeft(start) {
      case (x, (a, b)) => s"replace($x, '$a' || chr(1) || '$b', '$a$b')"
    }
  }
  private val bpeCountSql: String =
    s"length($bpeFoldSql) - length(replace($bpeFoldSql, chr(1), '')) + 1"

  /** Unrolled twin of Bpe.trainMerges: `nMerges` materialized CTE rounds
    * of the pair-frequency argmax recurrence — the same anti-drift
    * discipline as the graph oracles, applied to the one formerly
    * rows-only query with an implementable oracle.
    *
    * Per round off seg<p> (one row per (word, pos, symbol), frequency c):
    *  - pc: adjacent-pair frequencies (self-join pos+1, weight c);
    *  - best: argmax with the trainer's exact total order (f DESC, then
    *    lexicographically smallest (l, r)), gated on minPairFreq=2 — an
    *    empty best makes every later round a no-op, reproducing the
    *    trainer's early stop;
    *  - mg: positions the GREEDY left-to-right merge takes. Overlaps
    *    only arise when l = r (mergeable at i and i+1 needs sym(i+1) =
    *    l = r); within each maximal run of consecutive mergeable
    *    positions the greedy scan takes the 1st, 3rd, … — the
    *    parity-within-run rule, expressed as gaps-and-islands (run id =
    *    pos − row_number) + odd row_number within the run;
    *  - seg<i>: rebuild — merged position concatenates its successor,
    *    the consumed successor row drops, positions renumber.
    * Output: (rank, left, right) over the non-empty bests.
    */
  private def bpeTrainOracleSql(nMerges: Int): String = {
    val base =
      """WITH toks AS MATERIALIZED (
        |  SELECT w, count(*)::BIGINT AS c FROM (
        |    SELECT unnest(""".stripMargin + tokensSql +
        """) AS w
        |    FROM documents) GROUP BY w),
        |seg0 AS MATERIALIZED (
        |  SELECT w, c, pos, substring(w, pos, 1) AS sym FROM (
        |    SELECT w, c, unnest(range(1, length(w)+1)) AS pos FROM toks))""".stripMargin
    val rounds = (1 to nMerges).map { i =>
      val p = i - 1
      s"""pc$i AS MATERIALIZED (
        |  SELECT a.sym AS l, b.sym AS r, sum(a.c)::BIGINT AS f
        |  FROM seg$p a JOIN seg$p b ON a.w = b.w AND b.pos = a.pos + 1
        |  GROUP BY 1, 2),
        |best$i AS MATERIALIZED (
        |  SELECT l, r FROM pc$i WHERE f >= 2 ORDER BY f DESC, l ASC, r ASC LIMIT 1),
        |mg$i AS MATERIALIZED (
        |  SELECT w, pos FROM (
        |    SELECT w, pos, row_number() OVER (PARTITION BY w, run ORDER BY pos) AS rr
        |    FROM (
        |      SELECT a.w, a.pos,
        |             a.pos - row_number() OVER (PARTITION BY a.w ORDER BY a.pos) AS run
        |      FROM seg$p a JOIN seg$p b ON a.w = b.w AND b.pos = a.pos + 1, best$i
        |      WHERE a.sym = best$i.l AND b.sym = best$i.r))
        |  WHERE rr % 2 = 1),
        |seg$i AS MATERIALIZED (
        |  SELECT w, c, row_number() OVER (PARTITION BY w ORDER BY opos) AS pos, sym FROM (
        |    SELECT s.w, s.c, s.pos AS opos,
        |           CASE WHEN m.pos IS NOT NULL THEN s.sym || nx.sym ELSE s.sym END AS sym
        |    FROM seg$p s
        |    LEFT JOIN mg$i m ON s.w = m.w AND s.pos = m.pos
        |    LEFT JOIN mg$i m2 ON s.w = m2.w AND s.pos = m2.pos + 1
        |    LEFT JOIN seg$p nx ON s.w = nx.w AND nx.pos = s.pos + 1
        |    WHERE m2.pos IS NULL))""".stripMargin
    }.mkString(",\n", ",\n", "")
    val union = (1 to nMerges)
      .map(i => s"SELECT ${i - 1} AS rank, l, r FROM best$i")
      .mkString("\n  UNION ALL ")
    s"""$base$rounds
      |SELECT rank::INT AS rank, l AS "left", r AS "right" FROM (
      |  $union) ORDER BY rank""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_text_bpe_train" -> bpeTrainOracleSql(32),
    "q_text_bpe_tokens" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS w FROM documents),
        |c AS (SELECT doc_id, len(w) AS n_words,
        |        coalesce(list_sum(list_transform(w, wd -> $bpeCountSql)), 0)::BIGINT
        |          AS n_bpe_tokens
        |      FROM t)
        |SELECT doc_id, n_words, n_bpe_tokens,
        |       round(n_bpe_tokens::DOUBLE / greatest(n_words, 1), 6)
        |         AS tokens_per_word
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_text_token_ids" -> {
      val vocabValues = graft.text.Bpe.vocab().zipWithIndex
        .map { case (p, i) => s"('$p', $i)" }.mkString(", ")
      s"""WITH t AS (SELECT doc_id, $tokensSql AS w FROM documents
        |           WHERE doc_id < 100),
        |p AS (SELECT doc_id,
        |        flatten(list_transform(w,
        |          wd -> string_split($bpeFoldSql, chr(1)))) AS pieces
        |      FROM t),
        |e AS (SELECT doc_id, r.pos, r.piece FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(pieces)),
        |    i -> {'pos': i - 1, 'piece': pieces[i]})) AS r
        |  FROM p)),
        |vocab(piece, tid) AS (VALUES $vocabValues)
        |SELECT e.doc_id, e.pos, coalesce(v.tid, -1) AS tid
        |FROM e LEFT JOIN vocab v USING (piece)
        |ORDER BY doc_id, pos""".stripMargin
    },
    "q_text_bpe_pieces" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS w FROM documents
        |           WHERE doc_id < 100),
        |p AS (SELECT doc_id,
        |        flatten(list_transform(w,
        |          wd -> string_split($bpeFoldSql, chr(1)))) AS pieces
        |      FROM t)
        |SELECT doc_id, r.pos, r.piece FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(pieces)),
        |    i -> {'pos': i - 1, 'piece': pieces[i]})) AS r
        |  FROM p)
        |ORDER BY doc_id, r.pos""".stripMargin,
    "q_seq_packing_bpe" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    coalesce(list_sum(list_transform($tokensSql, wd -> $bpeCountSql)), 0)::BIGINT
        |      AS n_tokens
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS tokens_before
        |  FROM t)
        |SELECT (tokens_before // 512)::BIGINT AS pack_id,
        |       count(*) AS n_docs,
        |       sum(n_tokens)::BIGINT AS n_tokens,
        |       min(doc_id) AS first_doc,
        |       max(doc_id) AS last_doc
        |FROM p GROUP BY 1 ORDER BY pack_id""".stripMargin,
    "q_text_extract" ->
      s"""WITH x AS ($extractedDocsSql)
        |SELECT doc_id, text AS main_text, length(text) AS n_chars_main,
        |       (text = raw_text)::INT AS round_trip
        |FROM x ORDER BY doc_id""".stripMargin,
    // twin of Curation.repetitionStats: token counts via unnest+group,
    // bigram dup share via the scalar generate_series list (lateral
    // generate_series can't take column bounds in DuckDB)
    "q_text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS w FROM documents
        |           WHERE len($tokensSql) > 0),
        |tok AS (SELECT doc_id, unnest(w) AS tok FROM t),
        |tc AS (
        |  SELECT doc_id, sum(c)::BIGINT AS n_tokens, max(c) AS top_cnt
        |  FROM (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2)
        |  GROUP BY 1),
        |bc AS (
        |  SELECT doc_id,
        |    len(bgs) AS n_bigrams, len(list_distinct(bgs)) AS n_distinct
        |  FROM (SELECT doc_id,
        |          list_transform(generate_series(1, len(w) - 1),
        |            i -> w[i] || ' ' || w[i + 1]) AS bgs
        |        FROM t))
        |SELECT tc.doc_id, tc.n_tokens,
        |  round(tc.top_cnt::DOUBLE / tc.n_tokens, 6) AS top_token_frac,
        |  coalesce(round((bc.n_bigrams - bc.n_distinct)::DOUBLE
        |    / greatest(bc.n_bigrams, 1), 6), 0.0) AS dup_bigram_frac,
        |  CAST(tc.n_tokens >= 5 AND (
        |    round(tc.top_cnt::DOUBLE / tc.n_tokens, 6) > 0.3
        |    OR coalesce(round((bc.n_bigrams - bc.n_distinct)::DOUBLE
        |         / greatest(bc.n_bigrams, 1), 6), 0.0) > 0.08) AS INT)
        |    AS is_repetitive
        |FROM tc LEFT JOIN bc ON tc.doc_id = bc.doc_id
        |ORDER BY tc.doc_id""".stripMargin,
    // twin of q_text_redact: identical planted PII, patterns, and
    // replacement tags; 'g' makes DuckDB replace all matches like Spark
    "q_text_redact" ->
      s"""WITH planted AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 7 = 0
        |      THEN ' contact user' || doc_id || '@example.com now' ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0
        |      THEN ' or call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
        |        || ' today' ELSE '' END AS ptext
        |  FROM documents)
        |SELECT doc_id,
        |  length(regexp_extract_all(ptext,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
        |  length(regexp_extract_all(ptext, '\\b555-[0-9]{4}\\b')) AS n_phones,
        |  md5(regexp_replace(regexp_replace(regexp_replace(ptext,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\\b555-[0-9]{4}\\b', '<PHONE>', 'g'),
        |    '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g'))
        |    AS redacted_fp
        |FROM planted
        |WHERE length(regexp_extract_all(ptext,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
        |  + length(regexp_extract_all(ptext, '\\b555-[0-9]{4}\\b')) > 0
        |ORDER BY doc_id""".stripMargin,
    // twin of Curation.chunkTokens(20, 16): same starts, same slices,
    // same space-joined md5 fingerprints
    "q_text_chunks" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS w FROM documents
        |           WHERE len($tokensSql) > 0),
        |ch AS (
        |  SELECT doc_id,
        |    generate_series(0, len(w) - 1, 16) AS starts,
        |    list_transform(generate_series(0, len(w) - 1, 16),
        |      s -> len(w[s + 1 : s + 20])) AS lens,
        |    list_transform(generate_series(0, len(w) - 1, 16),
        |      s -> md5(array_to_string(w[s + 1 : s + 20], ' '))) AS fps
        |  FROM t)
        |SELECT doc_id, unnest(starts) // 16 AS chunk_idx,
        |       unnest(lens) AS n_chunk_tokens, unnest(fps) AS chunk_fp
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,
    // twin of Curation.vocabCoverage: same (count desc, token) rank
    // order, same exact cum/total coverage
    "q_vocab_coverage" ->
      s"""WITH tok AS (SELECT unnest($tokensSql) AS tok FROM documents),
        |c AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
        |r AS (SELECT tok, c,
        |        row_number() OVER (ORDER BY c DESC, tok) AS rank,
        |        sum(c) OVER (ORDER BY c DESC, tok
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM c),
        |tot AS (SELECT sum(c) AS total FROM c),
        |t AS (SELECT unnest([0.5, 0.75, 0.9, 0.95, 0.99]::DOUBLE[]) AS target),
        |j AS (SELECT t.target, r.rank, r.cum::DOUBLE / tot.total AS coverage
        |      FROM r, tot, t WHERE r.cum::DOUBLE / tot.total >= t.target)
        |SELECT target, min(rank) AS vocab_size,
        |       round(min_by(coverage, rank), 6) AS coverage
        |FROM j GROUP BY target ORDER BY target""".stripMargin,
    // twin of LmScore.scoreDocs: same bigram construction, exact integer
    // counts, ln on the identical c_bg/c_ctx ratio, weighted avg rounded
    // to 6 on both engines
    "q_text_lm_score" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS w FROM documents),
        |bgs AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i + 1])) AS bg
        |  FROM t),
        |bgc AS (SELECT bg, count(*) AS c_bg FROM bgs GROUP BY bg),
        |ctx AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c_bg) AS c_ctx
        |        FROM bgc GROUP BY 1),
        |pd AS (SELECT doc_id, bg, count(*) AS m FROM bgs GROUP BY 1, 2),
        |j AS (
        |  SELECT pd.doc_id, pd.m,
        |         -ln(bgc.c_bg::DOUBLE / ctx.c_ctx) AS nll
        |  FROM pd JOIN bgc USING (bg)
        |          JOIN ctx ON ctx.w1 = split_part(pd.bg, ' ', 1))
        |SELECT doc_id, sum(m)::BIGINT AS n_bigrams,
        |       round(sum(m * nll) / sum(m), 6) AS avg_nll
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, $tokensSql AS w FROM documents)
        |SELECT doc_id,
        |  len(w) AS n_tokens,
        |  length(text) AS n_chars_measured,
        |  round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
        |        / greatest(length(text), 1), 6) AS punct_ratio,
        |  round(list_sum(list_transform(w, x -> length(x)))::DOUBLE
        |        / greatest(len(w), 1), 6) AS avg_word_len,
        |  md5(array_to_string(w, ' ')) AS fp
        |FROM t ORDER BY doc_id""".stripMargin,
    // twin of q_dsir_weights: same bigram construction, add-one
    // smoothing over the joint vocabulary, identical log-ratio shape
    "q_dsir_weights" ->
      s"""WITH t AS (SELECT doc_id, lang, $tokensSql AS w FROM documents),
        |bgs AS (
        |  SELECT doc_id, lang,
        |    unnest(list_transform(generate_series(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i + 1])) AS bg
        |  FROM t),
        |pd AS (SELECT doc_id, bg, count(*) AS m FROM bgs
        |       WHERE lang <> 'en' GROUP BY 1, 2),
        |rc AS (SELECT bg, sum(m) AS c_r FROM pd GROUP BY bg),
        |tc AS (SELECT bg, count(*) AS c_t FROM bgs WHERE lang = 'en'
        |       GROUP BY bg),
        |consts AS (
        |  SELECT
        |    (SELECT count(*) FROM (SELECT bg FROM rc UNION SELECT bg FROM tc))::DOUBLE AS v,
        |    (SELECT sum(c_r) FROM rc)::DOUBLE AS tot_r,
        |    (SELECT sum(c_t) FROM tc)::DOUBLE AS tot_t),
        |j AS (
        |  SELECT pd.doc_id, pd.m,
        |    pd.m * (ln((coalesce(tc.c_t, 0) + 1.0) / (c.tot_t + c.v))
        |          - ln((rc.c_r + 1.0) / (c.tot_r + c.v))) AS term
        |  FROM pd JOIN rc USING (bg) LEFT JOIN tc USING (bg), consts c)
        |SELECT doc_id, sum(m)::BIGINT AS n_bigrams,
        |       round(sum(term) / sum(m), 6) AS logw
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // twin of q_corpus_drift: same quality formula as q_text_quality,
    // same fixed bin bounds, fractions floored at 1e-6 BEFORE the psi
    // product, rounding only on output
    "q_corpus_drift" ->
      s"""WITH t AS (SELECT doc_id, text, $tokensSql AS w FROM documents),
        |q AS (SELECT len(w)::DOUBLE AS v,
        |  round(least(len(w)::DOUBLE / 100.0, 1.0) * 0.5
        |    + (1.0 - least(round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
        |          / greatest(length(text), 1), 6) * 10.0, 1.0)) * 0.2
        |    + least(len(list_filter(w, x -> x IN ('the','and','of','to','a','in')))::DOUBLE / 5.0, 1.0) * 0.3, 6) AS quality
        |  FROM t),
        |bins AS (SELECT v, quality,
        |  (CASE WHEN v >= 20 THEN 1 ELSE 0 END + CASE WHEN v >= 40 THEN 1 ELSE 0 END
        |   + CASE WHEN v >= 60 THEN 1 ELSE 0 END + CASE WHEN v >= 80 THEN 1 ELSE 0 END
        |   + CASE WHEN v >= 100 THEN 1 ELSE 0 END) AS bin FROM q),
        |rf AS (SELECT bin, count(*)::DOUBLE / (SELECT count(*) FROM bins) AS rf
        |       FROM bins GROUP BY bin),
        |cf AS (SELECT bin, count(*)::DOUBLE / (SELECT count(*) FROM bins WHERE quality >= 0.4) AS cf
        |       FROM bins WHERE quality >= 0.4 GROUP BY bin),
        |j AS (SELECT bin,
        |        greatest(coalesce(rf, 0.0), 1e-6) AS rf,
        |        greatest(coalesce(cf, 0.0), 1e-6) AS cf
        |      FROM rf FULL OUTER JOIN cf USING (bin))
        |SELECT bin, round(rf, 6) AS ref_frac, round(cf, 6) AS cur_frac,
        |       round((cf - rf) * ln(cf / rf), 6) AS psi_term
        |FROM j ORDER BY bin""".stripMargin,
    // twin of q_epoch_shuffle: identical md5 epoch key and order
    "q_epoch_shuffle" ->
      """SELECT doc_id,
        |       md5('graft-epoch:1:' || doc_id::VARCHAR) AS k
        |FROM documents ORDER BY k""".stripMargin,
    // twin of q_text_scripts: same translate planting, single-char-class
    // regex counts over the same BMP ranges, same priority-ordered argmax
    "q_text_scripts" ->
      s"""WITH p AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 2 THEN translate(text, 'aeost', 'аеост')
        |         WHEN doc_id % 7 = 3 THEN translate(text, 'aeost', '安营送天爱')
        |         ELSE text END AS t
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(t, '[A-Za-z]')) AS n_latin,
        |    len(regexp_extract_all(t, '[\\x{0400}-\\x{04FF}]')) AS n_cyrillic,
        |    len(regexp_extract_all(t, '[\\x{4E00}-\\x{9FFF}]')) AS n_cjk,
        |    len(regexp_extract_all(t, '[\\x{0600}-\\x{06FF}]')) AS n_arabic
        |  FROM p)
        |SELECT doc_id, n_latin, n_cyrillic, n_cjk, n_arabic,
        |  CASE WHEN n_latin > 0 AND n_latin >= greatest(n_cyrillic, n_cjk, n_arabic) THEN 'latin'
        |       WHEN n_cyrillic > 0 AND n_cyrillic >= greatest(n_cjk, n_arabic) THEN 'cyrillic'
        |       WHEN n_cjk > 0 AND n_cjk >= n_arabic THEN 'cjk'
        |       WHEN n_arabic > 0 THEN 'arabic'
        |       ELSE 'unknown' END AS script
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_text_langid" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS w FROM documents),
        |c AS (SELECT doc_id,
        |  len(list_filter(w, x -> x IN ('the','and','of','to','a','in'))) AS en_hits,
        |  len(list_filter(w, x -> x IN ('le','la','et','les','des','un'))) AS fr_hits,
        |  len(list_filter(w, x -> x IN ('el','los','que','y','de','un'))) AS es_hits,
        |  len(list_filter(w, x -> x IN ('der','die','und','das','ein','zu'))) AS de_hits
        |  FROM t)
        |SELECT doc_id, en_hits, fr_hits, es_hits, de_hits,
        |  CASE WHEN en_hits > 0 AND en_hits >= greatest(fr_hits, es_hits, de_hits) THEN 'en'
        |       WHEN fr_hits > 0 AND fr_hits >= greatest(es_hits, de_hits) THEN 'fr'
        |       WHEN es_hits > 0 AND es_hits >= de_hits THEN 'es'
        |       WHEN de_hits > 0 THEN 'de'
        |       ELSE 'und' END AS lang_pred
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_text_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, text, $tokensSql AS w FROM documents)
        |SELECT doc_id,
        |  list_reduce(list_prepend(0::BIGINT, list_transform(w,
        |    t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
        |    (acc, th) -> (acc * 31 + th) % 1000000007) AS rolling_fp,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens
        |FROM t ORDER BY doc_id""".stripMargin,
    // Twin of weightedSamplePerKey(k=3, salt="wsamp"): same md5-seeded
    // u ∈ (0,1], same −ln(u)/w race rounded to 9 dp, same id tiebreak.
    "q_sample_weighted" ->
      """WITH s AS (
        |  SELECT source, doc_id, n_chars,
        |         round(-ln((('0x' || substr(md5('wsamp:' || doc_id::VARCHAR), 1, 8))::BIGINT + 1)
        |                   / 4294967296.0) / n_chars, 9) AS score
        |  FROM documents WHERE n_chars > 0),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY source ORDER BY score, doc_id) AS rn FROM s)
        |SELECT source, doc_id, n_chars, score FROM r WHERE rn <= 3
        |ORDER BY source, score, doc_id""".stripMargin,
    "q_sample_stratified" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |    ('0x' || substr(md5('graft:' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000 AS b
        |  FROM documents)
        |WHERE b < (CASE WHEN lang = 'en' THEN 5000
        |                WHEN lang = 'fr' THEN 2500 ELSE 1000 END)
        |ORDER BY doc_id""".stripMargin,
    // Twin of HashClassifier fit(dim=256, alpha=1) + score: same md5
    // bucket draw, same NB log-odds rounded 9 dp at the weight level,
    // same in-order mean-of-token-weights sigmoid. The dense weight
    // array materializes via generate_series so unseen buckets carry the
    // all-smoothing default exactly as collectWeights fills them.
    "q_quality_classifier" ->
      s"""WITH toks AS (SELECT doc_id, $tokensSql AS w FROM documents),
        |occ AS (
        |  SELECT (t.doc_id % 3 = 0) AS pos,
        |    ('0x' || substr(md5(u.tok), 1, 8))::BIGINT % 256 AS b
        |  FROM toks t, unnest(t.w) AS u(tok)),
        |cnt AS (
        |  SELECT b, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS cp,
        |         sum(CASE WHEN pos THEN 0 ELSE 1 END) AS cn
        |  FROM occ GROUP BY b),
        |tot AS (SELECT sum(cp) AS tp, sum(cn) AS tn FROM cnt),
        |wts AS (
        |  SELECT g.b,
        |    round(ln((COALESCE(cnt.cp, 0) + 1.0) / (tot.tp + 256.0))
        |        - ln((COALESCE(cnt.cn, 0) + 1.0) / (tot.tn + 256.0)), 9) AS wt
        |  FROM generate_series(0, 255) AS g(b)
        |  LEFT JOIN cnt ON cnt.b = g.b, tot),
        |warr AS (SELECT list(wt ORDER BY b) AS arr FROM wts),
        |m AS (
        |  SELECT t.doc_id,
        |    CASE WHEN len(t.w) = 0 THEN 0.0
        |      ELSE list_sum(list_transform(t.w, tk ->
        |        arr[(('0x' || substr(md5(tk), 1, 8))::BIGINT % 256)::INT + 1]))
        |        / len(t.w) END AS mean_w
        |  FROM toks t, warr)
        |SELECT doc_id, round(1.0 / (1.0 + exp(-mean_w)), 9) AS q_score
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_quality_threshold_sweep" ->
      s"""$calibSweepSql
        |SELECT * FROM m ORDER BY source, thr_pct""".stripMargin,
    "q_quality_calibration" ->
      s"""$calibSweepSql,
        |best AS (SELECT source, max(f1) AS bf FROM m GROUP BY source),
        |cand AS (
        |  SELECT m.* FROM m JOIN best
        |    ON m.source = best.source AND m.f1 = best.bf),
        |chosen AS (SELECT source, min(thr_pct) AS ct FROM cand GROUP BY source)
        |SELECT c.source, c.thr_pct, c.tp, c.fp, c.fn,
        |  c."precision", c.recall, c.f1
        |FROM cand c JOIN chosen ch
        |  ON c.source = ch.source AND c.thr_pct = ch.ct
        |ORDER BY c.source""".stripMargin,
    "q_text_quality" ->
      s"""WITH t AS (SELECT doc_id, lang, text, $tokensSql AS w FROM documents),
        |q AS (SELECT doc_id, lang,
        |  least(len(w)::DOUBLE / 100.0, 1.0) AS len_score,
        |  least(round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
        |        / greatest(length(text), 1), 6) * 10.0, 1.0) AS punct_pen,
        |  least(len(list_filter(w, x -> x IN ('the','and','of','to','a','in')))::DOUBLE / 5.0, 1.0) AS stop_score
        |  FROM t)
        |SELECT doc_id, lang,
        |  round(len_score * 0.5 + (1.0 - punct_pen) * 0.2 + stop_score * 0.3, 6) AS quality
        |FROM q ORDER BY doc_id""".stripMargin,
    "q_sample_mixture" ->
      """WITH b AS (
        |  SELECT doc_id, source,
        |    ('0x' || substr(md5('mixture:' || doc_id::VARCHAR), 1, 8))::BIGINT
        |      % 10000 AS bkt
        |  FROM documents)
        |SELECT source, count(*) AS n_docs, sum(doc_id)::BIGINT AS id_sum
        |FROM b
        |WHERE bkt < (CASE source WHEN 'src0' THEN 9000
        |                         WHEN 'src1' THEN 6000
        |                         WHEN 'src2' THEN 3000
        |                         ELSE 1000 END)
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_train_eval_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5('graft-split:' || doc_id::VARCHAR), 1, 8))::BIGINT
        |      % 10000 AS bkt
        |  FROM documents)
        |SELECT CASE WHEN bkt >= 2000 THEN 'train' ELSE 'eval' END AS split,
        |       count(*) AS n_docs,
        |       sum(doc_id)::BIGINT AS id_sum
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin,
    "q_seq_packing" ->
      s"""WITH t AS (SELECT doc_id, len($tokensSql) AS n_tokens FROM documents),
        |p AS (
        |  SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS tokens_before
        |  FROM t)
        |SELECT (tokens_before // 512)::BIGINT AS pack_id,
        |       count(*) AS n_docs,
        |       sum(n_tokens)::BIGINT AS n_tokens,
        |       min(doc_id) AS first_doc,
        |       max(doc_id) AS last_doc
        |FROM p GROUP BY 1 ORDER BY pack_id""".stripMargin,
    "q_tfidf_top_terms" ->
      s"""WITH toks AS (SELECT source, unnest($tokensSql) AS term FROM documents),
        |tf AS (SELECT source, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT source) AS n_src FROM documents),
        |scored AS (
        |  SELECT tf.source, tf.term, tf.tf, dfx.df,
        |         round(tf.tf * ln(n.n_src::DOUBLE / dfx.df), 6) AS score
        |  FROM tf JOIN dfx USING (term), n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |        ORDER BY score DESC, term) AS rn FROM scored)
        |SELECT source, rn, term, tf, df, score
        |FROM r WHERE rn <= 5 ORDER BY source, rn""".stripMargin,
    // Twin of q_text_bm25: same postings, same ONE-expression BM25
    // contribution with every fractional literal cast ::DOUBLE (DuckDB
    // float literals are DECIMAL by default — decimal-exact tf*2.2 would
    // convert to double differently than double-multiplying, flipping
    // the e9 rounding), k1+1 SUMMED at query time exactly as the Scala
    // side computes lit(k1 + 1.0), exact BIGINT score sum, same
    // (score desc, doc) tie-break.
    "q_text_bm25" ->
      s"""WITH q(query_id, term) AS (VALUES
        |    (1, 'hash'), (1, 'join'),
        |    (2, 'window'), (2, 'sort'), (2, 'spark'),
        |    (3, 'scan'), (3, 'filter'), (3, 'column'),
        |    (4, 'stream'), (4, 'batch'), (4, 'merge'), (4, 'vector'),
        |    (4, 'zzz_unseen')),
        |toks AS (SELECT doc_id, $tokensSql AS w FROM documents),
        |flat AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM toks),
        |post AS (SELECT doc_id, dl, term, count(*) AS tf
        |         FROM flat GROUP BY 1, 2, 3),
        |dfx AS (SELECT term, count(*) AS df FROM post GROUP BY term),
        |st AS (SELECT count(*) AS n_docs,
        |              coalesce(sum(len(w)), 0)::BIGINT AS sum_dl FROM toks),
        |contrib AS (
        |  SELECT q.query_id, post.doc_id,
        |    round(ln(1.0::DOUBLE + (st.n_docs - dfx.df + 0.5::DOUBLE)
        |               / (dfx.df + 0.5::DOUBLE))
        |      * (post.tf * (1.2::DOUBLE + 1.0::DOUBLE))
        |      / (post.tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
        |          + 0.75::DOUBLE * post.dl
        |            / (st.sum_dl::DOUBLE / st.n_docs)))
        |      * 1000000000.0::DOUBLE)::BIGINT AS c
        |  FROM q JOIN post USING (term) JOIN dfx USING (term), st),
        |scored AS (SELECT query_id, doc_id, sum(c)::BIGINT AS score_e9
        |           FROM contrib GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY score_e9 DESC, doc_id) AS rn FROM scored)
        |SELECT query_id, rn, doc_id, score_e9,
        |       round(score_e9 / 1000000000.0::DOUBLE, 6) AS score
        |FROM r WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin,
    // twin of q_text_normalize: identical decomposed plants (chr() =
    // the \u escapes), DuckDB's utf8proc NFC vs the JVM's — same spec,
    // same bytes; strlen is bytes on both sides
    "q_text_normalize" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 0
        |      THEN text || ' cafe' || chr(769) || ' nai' || chr(776) ||
        |           've re' || chr(769) || 'sume' || chr(769)
        |      ELSE text END AS ptext
        |  FROM documents)
        |SELECT doc_id,
        |  strlen(ptext) AS raw_bytes,
        |  strlen(nfc_normalize(ptext)) AS nfc_bytes,
        |  md5(nfc_normalize(ptext)) AS nfc_fp,
        |  CAST(strlen(ptext) <> strlen(nfc_normalize(ptext)) AS INT) AS changed
        |FROM p ORDER BY doc_id""".stripMargin,
    // twin of q_corpus_report: same per-row signals (tokens, quality,
    // en-vote), one grouped aggregation; quantile_cont matches Spark's
    // exact interpolated percentile
    "q_corpus_report" ->
      s"""WITH t AS (SELECT doc_id, source, text, $tokensSql AS w FROM documents),
        |sig AS (SELECT source, len(w) AS nt,
        |  $qualitySql AS q,
        |  CASE WHEN len(list_filter(w, x -> x IN ('the','and','of','to','a','in'))) > 0
        |         AND len(list_filter(w, x -> x IN ('the','and','of','to','a','in')))
        |           >= greatest(len(list_filter(w, x -> x IN ('le','la','et','les','des','un'))),
        |                       len(list_filter(w, x -> x IN ('el','los','que','y','de','un'))),
        |                       len(list_filter(w, x -> x IN ('der','die','und','das','ein','zu'))))
        |    THEN 1 ELSE 0 END AS is_en
        |  FROM t)
        |SELECT source, count(*) AS n_docs, sum(nt)::BIGINT AS n_tokens,
        |  round(avg(nt), 6) AS avg_tokens,
        |  round(quantile_cont(nt, 0.5), 6) AS p50_tokens,
        |  round(avg(q), 6) AS avg_quality,
        |  round(avg(CASE WHEN q < 0.4 THEN 1 ELSE 0 END), 6) AS low_quality_frac,
        |  round(avg(is_en), 6) AS en_frac
        |FROM sig GROUP BY source ORDER BY source""".stripMargin,
    // twin of Sampling.temperatureSample(alpha=0.5): identical integer
    // inputs → identical IEEE sqrt → identical thresholds + membership
    "q_temperature_mix" ->
      s"""WITH t AS (
        |  SELECT doc_id, source, len($tokensSql) AS n_tok FROM documents),
        |s AS (SELECT source, sum(n_tok)::DOUBLE AS w FROM t GROUP BY source),
        |m AS (SELECT min(w) AS w_min FROM s),
        |f AS (SELECT source,
        |        greatest(CAST(floor(round(sqrt(w_min / w), 6) * 10000) AS BIGINT),
        |                 1) AS thr
        |      FROM s, m),
        |k AS (
        |  SELECT t.doc_id, t.source, t.n_tok, f.thr
        |  FROM t JOIN f USING (source)
        |  WHERE ('0x' || substr(md5('temp:' || doc_id::VARCHAR), 1, 8))::BIGINT
        |          % 10000 < f.thr)
        |SELECT source, count(*) AS n_docs, sum(n_tok)::BIGINT AS kept_tokens,
        |       sum(doc_id)::BIGINT AS id_sum, min(thr) AS thr
        |FROM k GROUP BY source ORDER BY source""".stripMargin,
    // twin of Sampling.tokenBudgetPerKey: same md5 bucket order, same
    // greedy fill-to-budget (kept iff tokens consumed BEFORE the doc
    // are under budget)
    "q_token_budget" ->
      s"""WITH t AS (
        |  SELECT doc_id, source, len($tokensSql) AS n_tok,
        |    ('0x' || substr(md5('budget:' || doc_id::VARCHAR), 1, 8))::BIGINT
        |      % 10000 AS b
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tok,
        |    sum(n_tok) OVER (PARTITION BY source ORDER BY b, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT source, count(*) AS n_docs, sum(n_tok)::BIGINT AS kept_tokens,
        |  sum(doc_id)::BIGINT AS id_sum
        |FROM c WHERE cum - n_tok < 800
        |GROUP BY source ORDER BY source""".stripMargin,
    // twin of q_quality_gate: same rounded quality, same rank-based
    // top-quartile cut (rn*4 <= n — integer logic, no float threshold)
    "q_quality_gate" ->
      s"""WITH t AS (SELECT doc_id, lang, text, $tokensSql AS w FROM documents),
        |q AS (SELECT doc_id, lang,
        |  $qualitySql AS quality
        |  FROM t),
        |r AS (SELECT doc_id, lang, quality,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY quality DESC, doc_id) AS rn,
        |        count(*) OVER (PARTITION BY lang) AS n
        |      FROM q)
        |SELECT lang, count(*) AS n_kept, round(min(quality), 6) AS min_quality,
        |       sum(doc_id)::BIGINT AS id_sum
        |FROM r WHERE rn * 4 <= n
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // twin of q_source_cap: identical quality formula to q_text_quality,
    // same (quality DESC, doc_id) window rank, cap 20
    "q_source_cap" ->
      s"""WITH t AS (SELECT doc_id, source, text, $tokensSql AS w FROM documents),
        |q AS (SELECT doc_id, source,
        |  $qualitySql AS quality
        |  FROM t),
        |r AS (SELECT doc_id, source, quality,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY quality DESC, doc_id) AS rn
        |      FROM q)
        |SELECT source, count(*) AS n_kept, sum(doc_id)::BIGINT AS id_sum,
        |       round(min(quality), 6) AS cutoff_quality
        |FROM r WHERE rn <= 20
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_text_quality_by_source" ->
      s"""WITH t AS (SELECT doc_id, source, text, $tokensSql AS w FROM documents),
        |q AS (SELECT doc_id, source, len(w) AS nt,
        |  $qualitySql AS quality
        |  FROM t)
        |SELECT source,
        |  round(avg(quality), 6) AS avg_quality,
        |  round(quantile_cont(quality, 0.5), 6) AS median_quality,
        |  round(avg(nt), 6) AS avg_tokens,
        |  count(*) AS n_docs
        |FROM q GROUP BY source ORDER BY source""".stripMargin,

    // Twin of q_ngram_diversity: same tokenizer, same space-joined
    // trigrams (cross-doc DISTINCT makes per-doc list_distinct moot);
    // sums cast to BIGINT to match Spark's long (DuckDB sums to HUGEINT).
    "q_ngram_diversity" ->
      s"""WITH t AS (SELECT source, $tokensSql AS w FROM documents),
        |per AS (
        |  SELECT source, count(*) AS n_docs,
        |         sum(len(w))::BIGINT AS total_tokens,
        |         sum(greatest(len(w) - 2, 0))::BIGINT AS total_trigrams
        |  FROM t GROUP BY source),
        |dtok AS (
        |  SELECT source, count(DISTINCT tok) AS distinct_tokens
        |  FROM (SELECT source, unnest(w) AS tok FROM t) GROUP BY source),
        |dtri AS (
        |  SELECT source, count(DISTINCT tri) AS distinct_trigrams
        |  FROM (SELECT source, unnest(CASE WHEN len(w) >= 3 THEN
        |          list_transform(generate_series(1, len(w) - 2),
        |            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |          ELSE [] END) AS tri FROM t) GROUP BY source)
        |SELECT p.source, n_docs, total_tokens, distinct_tokens,
        |       total_trigrams, distinct_trigrams,
        |       round(distinct_tokens / total_tokens, 6) AS ttr,
        |       round(distinct_trigrams / total_trigrams, 6) AS trigram_diversity
        |FROM per p JOIN dtok USING (source) JOIN dtri USING (source)
        |ORDER BY source""".stripMargin)
}
