package graft.queries

import graft.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Deduplication operators over the documents corpus: exact fingerprint
  * dedup, n-gram Jaccard near-dup, and MinHash+LSH near-dup — each with a
  * full DuckDB oracle (same md5-salted hash family on both sides).
  * See graft.dedup.Dedup for the scale rationale.
  */
object DedupQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // Exact duplicate groups under normalization (fingerprint groupBy).
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exactGroups(Tables.documents(s, d), "text", "doc_id")
        .orderBy("fp")),

    // Bag-of-words exact groups: sorted-token fingerprint, so
    // token-PERMUTED copies collapse — the linear pre-pass that defuses
    // the c(c-1)/2 pair blow-up every near-dup enumerator pays on
    // permuted-copy clusters (24.8M pairs on the 100x fixture;
    // BASELINE.md round-10).
    "q_dedup_exact_bag" -> ((s, d) =>
      Dedup.exactBagGroups(Tables.documents(s, d), "text", "doc_id")
        .orderBy("fp")),

    // Corpus dup-rate summary: total docs vs distinct fingerprints.
    "q_dedup_exact_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .select(graft.text.TextFunctions.fingerprint(col("text")).as("fp"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_unique"),
          (count(lit(1)) - countDistinct(col("fp"))).as("n_dups"))),

    // n-gram Jaccard near-dup pairs via inverted shingle index —
    // EXACT semantics (maxShingleFreq = 0; the parameter is required, so
    // every caller picks exact-vs-df-cut explicitly).
    "q_dedup_jaccard" -> ((s, d) =>
      Dedup.jaccardPairs(Tables.documents(s, d), "text", "doc_id",
          threshold = 0.8, maxShingleFreq = 0)
        .orderBy("ida", "idb")),

    // The LOSSLESS fast exact path: prefix filtering (AllPairs/PPJoin
    // family) must reproduce q_dedup_jaccard's result bit-for-bit — the
    // two queries share one oracle — while indexing only (n − ⌈0.8n⌉ + 1)
    // shingles per doc under the df-ascending global order, with length
    // and position filters pruning narrow candidate rows before the
    // per-pair verify. Crossover measured (BASELINE.md round-7 table):
    // parity at sf0.1, 2.3× over the naive join at 10×, 3.2× at 20× —
    // the naive join grows quadratically in posting-list length, this
    // path near-linearly, WITHOUT the df-cut's lossiness.
    "q_dedup_jaccard_prefix" -> ((s, d) =>
      Dedup.jaccardPairsPrefix(Tables.documents(s, d), "text", "doc_id",
          threshold = 0.8)
        .orderBy("ida", "idb")),

    // The 100-TB jaccard path: same inverted index with the df-cut
    // engaged (shingles in > 5 docs dropped before the self-join — the
    // posting lists that would otherwise make it quadratic). The cap
    // sits above the fixture's dup-group sizes, so every uncapped pair
    // survives while the df-6/7 stop-shingles are cut; intersection
    // counts only surviving shingles but na/nb stay the full shingle
    // counts (jaccard is a lower bound under the cut, identically on
    // both engines).
    "q_dedup_jaccard_capped" -> ((s, d) =>
      Dedup.jaccardPairs(Tables.documents(s, d), "text", "doc_id",
          threshold = 0.8, maxShingleFreq = 5)
        .orderBy("ida", "idb")),

    // Directional containment pairs (Dedup.containmentPairs, exact
    // semantics): inner docs ≥ 90% of whose shingles appear in the outer
    // doc — the asymmetric overlap Jaccard misses (a short doc quoted
    // inside a long one).
    "q_dedup_containment" -> ((s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), "text", "doc_id",
          threshold = 0.9, maxShingleFreq = 0)
        .orderBy("inner_id", "outer_id")),

    // The PRODUCTION posture for containment at scale: the same df-cut
    // contract as jaccardPairs (one shared indexedShingles definition —
    // postings drop stop-shingles, per-doc shingle counts stay pre-cut).
    // The 10× scale table's ~12× uncut entry is the documented quadratic
    // posting-list model; this twin pins the capped route's semantics
    // cross-engine the way q_dedup_jaccard_capped does for Jaccard.
    "q_dedup_containment_capped" -> ((s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), "text", "doc_id",
          threshold = 0.9, maxShingleFreq = 5)
        .orderBy("inner_id", "outer_id")),

    // MinHash+LSH (12 hashes, 4 bands × 3 rows) with exact-Jaccard
    // verification of candidates.
    "q_dedup_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLshPairs(Tables.documents(s, d), "text", "doc_id",
          threshold = 0.7)
        .orderBy("ida", "idb")),

    // SimHash near-dups: 60-bit majority-vote hash, 4×15-bit chunk LSH,
    // Hamming ≤ 3.
    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(Tables.documents(s, d), "text", "doc_id",
          maxHamming = 3)
        .orderBy("ida", "idb")),

    // The 100-TB simhash twin: 120-bit signature (both md5 hex halves),
    // 4×30-bit chunk LSH — bucket space 2^30 per chunk vs 2^15, the
    // scale fix for the bucket SATURATION measured at 30× (every 15-bit
    // bucket > 20 docs, 2.6e8 candidates; BASELINE.md round-10). Same
    // pigeonhole guarantee at hamming ≤ 3, finer similarity semantic
    // (3/120 flipped bits vs 3/60). Full DuckDB twin oracle.
    "q_dedup_simhash_wide" -> ((s, d) =>
      Dedup.simhashPairsWide(Tables.documents(s, d), "text", "doc_id",
          maxHamming = 3)
        .orderBy("ida", "idb")),

    // The CLUSTERING route at dup-heavy scale: spanning-star candidates
    // (each bucket member pairs with the bucket MIN only — n−1 per
    // bucket instead of n(n−1)/2), same exact 120-bit hamming verify.
    // Exists because all-pairs candidates grow quadratically in GENUINE
    // cluster size (d300 probe: 31.1M candidates, hottest bucket 972
    // docs — BASELINE.md round 14); downstream connected components
    // only needs connectivity. Full DuckDB twin sharing the signature
    // CTE prefix with q_dedup_simhash_wide.
    "q_dedup_simhash_wide_star" -> ((s, d) =>
      Dedup.simhashStarPairsWide(Tables.documents(s, d), "text", "doc_id",
          maxHamming = 3)
        .orderBy("ida", "idb")),

    // The CONNECTIVITY-CLOSED star (round 15): star pairs + every
    // verified pair with a hub-failed endpoint — the bounded repair for
    // the star's measured one-sided under-merge (survivors +0.47% /
    // +0.90% / +1.74% at d100/d300/d1000). Oracle reproduces the
    // two-level enumeration on the shared signature CTEs.
    "q_dedup_simhash_wide_closed" -> ((s, d) =>
      Dedup.simhashStarPairsWideClosed(Tables.documents(s, d), "text",
          "doc_id", maxHamming = 3)
        .orderBy("ida", "idb")),

    // The PER-BUCKET ADAPTIVE dispatch (round 16): all-pairs enumeration
    // for buckets at or below the population bound, closed-star above —
    // the route that retires the corpus-wide choice. Bound 2 at verify
    // scale so BOTH branches execute against the oracle (sf0.01 bucket
    // histogram: 60 two-member buckets -> all-pairs branch, 8
    // three-member buckets -> closed branch); the oracle reproduces the dispatch —
    // population CTE, small-bucket self-join, big-bucket star + patch —
    // on the shared signature CTEs, so the exact emitted pair set is
    // cross-engine-pinned, not just its components.
    "q_dedup_simhash_wide_adaptive" -> ((s, d) =>
      Dedup.simhashPairsWideAdaptive(Tables.documents(s, d), "text",
          "doc_id", maxHamming = 3, bucketBound = 2)
        .orderBy("ida", "idb")),

    // The PIPELINE-ORDER composition: bag-exact dedup FIRST, wide
    // simhash near-dup on the canonical docs only. Permuted-copy
    // clusters contribute c(c-1)/2 output pairs to any direct near-dup
    // enumeration (the measured 100x blow-up) but collapse to one
    // canonical each here — near-dup time becomes a function of
    // DISTINCT content, not replication. Oracle restricts the wide
    // twin to the same min-id canonicals.
    "q_dedup_simhash_wide_canonical" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val canon = Dedup.exactBagGroups(docs, "text", "doc_id")
        .select(col("canonical_id").as("doc_id"))
      Dedup.simhashPairsWide(docs.join(canon, "doc_id"), "text", "doc_id",
          maxHamming = 3)
        .orderBy("ida", "idb")
    }),

    // Fuzzy (edit-distance) duplicate pairs: Levenshtein ≤ 8 found via
    // length blocking + lossless char-frequency L1 prefilter, verified
    // with the banded threshold DP (Dedup.editDistancePairs). dist cast
    // to long to match DuckDB levenshtein's BIGINT.
    // maxBandPop = 0 pins the LOSSLESS length-band route: this query's
    // oracle is the exact join, and a fixture whose hottest band crossed
    // the default bound would otherwise silently swap algorithms
    // mid-verify. The guard's reroute is what q_dedup_fuzzy_lsh checks.
    "q_dedup_fuzzy" -> ((s, d) =>
      Dedup.editDistancePairs(Tables.documents(s, d), "text", "doc_id",
          maxDist = 8, maxBandPop = 0)
        .select(col("ida"), col("idb"), col("dist").cast("long").as("dist"))
        .orderBy("ida", "idb")),

    // The 100-TB fuzzy-dedup composition as a first-class query:
    // Dedup.lshRouteCandidates — MinHash-LSH banding over >=3-token docs
    // (linear shuffle, bounded by bucket population) UNIONED with the
    // lossless ±1-length-band probe for sub-3-token docs (which have no
    // 3-shingles and would be invisible to banding — the hard recall
    // hole, closed here exactly as in editDistancePairs' reroute) — then
    // editDistanceVerify's length block + L1 count filter + banded
    // threshold DP. This IS the route editDistancePairs takes when a
    // length band exceeds maxBandPop, via the same shared generator, so
    // a regenerated fixture with short docs cannot split the two paths.
    // The high-recall banding (16 bands × 2 rows, t* = 0.25) achieves
    // FULL recall on this fixture — verified by sharing q_dedup_fuzzy's
    // exact oracle, so a banding miss would show up as a hash mismatch.
    "q_dedup_fuzzy_lsh" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.editDistanceVerify(
          Dedup.lshRouteCandidates(docs, "text", "doc_id", maxDist = 8),
          docs, "text", "doc_id", maxDist = 8)
        .select(col("ida"), col("idb"), col("dist").cast("long").as("dist"))
        .orderBy("ida", "idb")
    }),

    // Within-doc repetition stripping (Dedup.stripSelfRepeats): repeated
    // 5-token spans inside ONE document keep their first occurrence and
    // lose the later ones. Repetition is PLANTED (docs with id % 4 == 1
    // get their own first six tokens appended) so the interesting path
    // runs cross-engine; untouched docs must round-trip bit-identically.
    "q_strip_self_repeats" -> ((s, d) => {
      import graft.text.TextFunctions.tokens
      val docs = Tables.documents(s, d)
      val planted = docs.withColumn("text",
        when(col("doc_id") % 4 === 1,
          concat(col("text"), lit(" "),
            concat_ws(" ", slice(tokens(col("text")), 1, 6))))
        .otherwise(col("text")))
      Dedup.stripSelfRepeats(planted, "text", "doc_id", w = 5)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Corpus snapshot diff (Cdc.corpusDiff): added/removed/modified docs
    // between two simulated corpus versions — identity is the
    // normalization-invariant fingerprint, each side reduces to
    // (id, fingerprint) before the full-outer join, text never shuffles.
    "q_corpus_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val old = docs.filter(col("doc_id") % 11 =!= 0)
      val neu = docs.filter(col("doc_id") % 7 =!= 3)
        .withColumn("text",
          when(col("doc_id") % 13 === 0,
            concat(col("text"), lit(" appended revision")))
          .otherwise(col("text")))
      graft.operators.Cdc.corpusDiff(old, neu, "text", "doc_id")
        .orderBy("doc_id")
    }),

    // Winnowing copy-detection pairs (Dedup.winnowPairs, MOSS-style):
    // docs sharing ≥ 2 winnowed fingerprints — the ~2/(w+1)-sparse index
    // with the ≥ w+k−1-token guaranteed-detection floor.
    "q_winnow_pairs" -> ((s, d) =>
      Dedup.winnowPairs(Tables.documents(s, d), "text", "doc_id",
          minShared = 2)
        .orderBy("ida", "idb")),

    // The production winnow twin: stop-fingerprints (df > 5) dropped
    // before the pair join — the MOSS boilerplate cut, bounding the
    // posting-list quadratic term the 30× run measured (pairs 347k →
    // 3.1e8 uncapped; BASELINE.md round-10). Lossy by contract (pairs
    // sharing ONLY stop-fps unreported, n_shared counts non-stop fps);
    // the oracle reproduces the identical cut.
    "q_winnow_pairs_capped" -> ((s, d) =>
      Dedup.winnowPairs(Tables.documents(s, d), "text", "doc_id",
          minShared = 2, maxFpPop = 5)
        .orderBy("ida", "idb")),

    // Span-level duplication profile (Lee-et-al-style substring dedup at
    // doc granularity): per doc, the fraction of its 5-token spans that
    // also occur in another document — the partial-copy signal pair
    // dedup misses. Two linear shuffles, no self-join (Dedup.spanDupStats).
    "q_dup_spans" -> ((s, d) =>
      Dedup.spanDupStats(Tables.documents(s, d), "text", "doc_id", w = 5)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // Span REMOVAL (the transformation q_dup_spans only profiles): every
    // token covered by a 5-token span occurring in another document is
    // dropped, the rest reassembled in order (Dedup.stripDupSpans). All
    // shuffles linear in corpus token count — no pair join anywhere.
    "q_strip_spans" -> ((s, d) =>
      Dedup.stripDupSpans(Tables.documents(s, d), "text", "doc_id", w = 5)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // The round-17 exact-substring verify, oracle-checked END TO END:
    // q_strip_spans' token path PLUS the char-level window-union over
    // span-flagged star pairs (stripDupSpans exactVerify — runs
    // beginning/ending mid-token and sub-w aligned runs ≥ 25 chars are
    // caught on flagged docs). The oracle reproduces the whole verify
    // in SQL: star pairs off the duplicated spans, 25-char gram match
    // between the pair's joined token strings, per-token full-coverage
    // check via window char offsets — so the UDF kernel's semantics
    // are cross-engine-pinned, not just spec'd.
    "q_strip_spans_verified" -> ((s, d) =>
      Dedup.stripDupSpans(Tables.documents(s, d), "text", "doc_id", w = 5,
          exactVerify = true, minMatchChars = 25)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // Eval-set decontamination: near-duplicate leakage between a
    // deterministic 15% eval split and the remaining training corpus —
    // MinHash band candidates (eval side drives the join), exact-Jaccard
    // verified. The check every training pipeline runs against its
    // benchmark sets; exact-match leakage is the crossExactMatches
    // operator (spec-covered — this fixture has no exact cross dups, and
    // a query that can only return empty would prove nothing).
    "q_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val b = graft.sampling.Sampling.bucket(col("doc_id"), "evalset")
      Dedup.crossNearMatches(
          corpus = docs.filter(b >= 1500),
          evalSet = docs.filter(b < 1500),
          "text", "doc_id", threshold = 0.7)
        .orderBy("eval_id", "corpus_id")
    }),

    // Span-granular decontamination (Dedup.crossSpanMatches, the
    // 13-gram-overlap check run at w=5 for this short-doc fixture):
    // training docs containing any 5-token span from the same
    // deterministic 15% eval split as q_contamination — catches partial
    // quoting that doc-level exact/near checks miss. Eval-driven join,
    // corpus side linear.
    "q_decontam_ngram" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val b = graft.sampling.Sampling.bucket(col("doc_id"), "evalset")
      Dedup.crossSpanMatches(
          corpus = docs.filter(b >= 1500),
          evalSet = docs.filter(b < 1500),
          "text", "doc_id", w = 5)
        .orderBy("corpus_id")
    }),

    // Incremental near-dup detection (Dedup.incrementalNearDups): docs
    // with doc_id % 5 == 0 play the arriving batch, the rest the
    // historical corpus with its persisted band index — output is every
    // near-dup pair touching the batch, which must equal the full-corpus
    // LSH pairs restricted to ≥1 new side (the oracle computes exactly
    // that, so the index probe provably loses nothing vs re-running
    // corpus-wide dedup).
    "q_dedup_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val old = docs.filter(col("doc_id") % 5 =!= 0)
      val fresh = docs.filter(col("doc_id") % 5 === 0)
      Dedup.incrementalNearDups(old, fresh,
          Dedup.bandIndex(old, "text", "doc_id"),
          "text", "doc_id", threshold = 0.7)
        .orderBy("ida", "idb")
    }),

    // Dedup-aware train/eval split (Sampling.leakageSafeSplit): split
    // membership hashes the near-dup CLUSTER so paraphrase leakage
    // between train and eval is structurally impossible; summarized as
    // per-split count + id checksum (exact membership cross-engine).
    "q_leakage_split" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id",
        threshold = 0.7)
      val (train, eval) = graft.sampling.Sampling.leakageSafeSplit(
        docs, "doc_id", pairs.select("ida", "idb"), evalFraction = 0.2)
      train.select(lit("train").as("split"), col("doc_id"))
        .union(eval.select(lit("eval").as("split"), col("doc_id")))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_sum"))
        .orderBy("split")
    }),

    // Bloom-prefiltered exact decontamination (crossExactMatchesBloom):
    // result is bit-identical to the plain fingerprint join — the Bloom
    // broadcast only gates corpus rows off the shuffle path, false
    // positives die in the exact join — so the DuckDB oracle verifies
    // the whole pipeline including the prefilter's soundness. The raw
    // fixture has zero exact cross-split dups (all 500 fingerprints are
    // distinct), so the eval set is PLANTED: every 10th doc re-cased to
    // upper (fingerprints are case/whitespace-normalized, so each copy
    // must match exactly its source and nothing else).
    "q_contamination_bloom" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val planted = docs.filter(col("doc_id") % 10 === 3)
        .select((col("doc_id") + 100000L).as("doc_id"),
          upper(col("text")).as("text"))
      Dedup.crossExactMatchesBloom(corpus = docs, evalSet = planted,
          "text", "doc_id")
        .orderBy("eval_id", "corpus_id")
    }),

    // The star route feeding its intended CONSUMER end-to-end: connected
    // components over the spanning-star simhash pairs (round 15 — the
    // d300 probe found all-pairs candidates quadratic in genuine cluster
    // size; the clustering route only needs connectivity, and the star
    // subgraph connects tight near-dup clusters identically). The oracle
    // reproduces the star enumeration AND the reachability closure in
    // DuckDB, so the component labels are cross-engine-proven on exactly
    // the pair set the scale path emits.
    "q_dedup_clusters_simhash_star" -> ((s, d) => {
      val pairs = Dedup.simhashStarPairsWide(Tables.documents(s, d), "text",
        "doc_id", maxHamming = 3)
      graft.dedup.Components.dupClusters(pairs.select("ida", "idb"))
        .orderBy("id")
    }),

    // The closed-star equivalence theorem as a cross-engine hash check:
    // Spark clusters the CLOSED pair set, the oracle clusters the
    // ALL-PAIRS set — hash equality proves the closed subgraph's
    // components equal the full near-dup graph's on real data, at the
    // star route's cost shape.
    "q_dedup_clusters_simhash_closed" -> ((s, d) => {
      val pairs = Dedup.simhashStarPairsWideClosed(Tables.documents(s, d),
        "text", "doc_id", maxHamming = 3)
      graft.dedup.Components.dupClusters(pairs.select("ida", "idb"))
        .orderBy("id")
    }),

    // The adaptive-dispatch exactness theorem as a cross-engine hash
    // check (round 16): Spark clusters the ADAPTIVE pair set (mixed
    // all-pairs / closed-star buckets at bound 2), the oracle clusters
    // the ALL-PAIRS set — hash equality proves per-bucket dispatch
    // preserves connected components at a bound that exercises both
    // branches on real data.
    "q_dedup_clusters_simhash_adaptive" -> ((s, d) => {
      val pairs = Dedup.simhashPairsWideAdaptive(Tables.documents(s, d),
        "text", "doc_id", maxHamming = 3, bucketBound = 2)
      graft.dedup.Components.dupClusters(pairs.select("ida", "idb"))
        .orderBy("id")
    }),

    // Duplicate clusters: connected components over the MinHash near-dup
    // pairs (min-label propagation), one canonical per cluster.
    "q_dedup_clusters" -> ((s, d) => {
      val pairs = Dedup.minhashLshPairs(Tables.documents(s, d), "text",
        "doc_id", threshold = 0.7)
      graft.dedup.Components.dupClusters(pairs.select("ida", "idb"))
        .orderBy("id")
    }),

    // The web-scale twin of q_dedup_clusters: the SAME pairs through the
    // distributed large-star/small-star iteration (driverEdgeLimit = 0
    // forces the path a 100-TB dup graph would take), against the same
    // recursive-CTE oracle — cross-engine proof the O(log diameter)
    // rounds land on identical labels, not just spec-level self-parity.
    "q_dedup_clusters_star" -> ((s, d) => {
      val pairs = Dedup.minhashLshPairs(Tables.documents(s, d), "text",
        "doc_id", threshold = 0.7)
      graft.dedup.Components
        .connectedComponents(pairs.select("ida", "idb"), driverEdgeLimit = 0L)
        .withColumn("is_canonical", (col("id") === col("component")).cast("int"))
        .orderBy("id")
    }),

    // The full training-data funnel in one query: HTML main-content
    // extraction → language filter → quality filter → near-dup removal
    // → deterministic 50% sample → per-source survivor counts. Each
    // stage is one of the library's operators; the composition stays a
    // single Catalyst plan (the only shuffles are the dedup
    // pair-generation and the final count). Docs enter as planted
    // markup and pass through Curation.extractMainText FIRST — the
    // crawl-real funnel shape; the oracle runs the identical extraction
    // chain, so the stage is cross-engine-verified inside the funnel,
    // not just by q_text_extract.
    "q_corpus_funnel" -> ((s, d) => {
      import graft.text.TextFunctions._
      // The extraction regex chain is the funnel's priciest expression
      // and docs feeds BOTH the pair-generation branch and the
      // clean-corpus anti-join branch; worse, predicate pushdown
      // substitutes the chain into the langid/quality filters (which
      // reference the text ~15 times each), so without a hard boundary
      // the extraction runs ~16× per row (measured: a 72-copy physical
      // plan). A repartition does NOT cut this — filters push straight
      // through RepartitionByExpression. The cache is the correct
      // boundary: it is exactly the bronze→silver materialization a
      // real pipeline has after extraction, projected to the
      // (doc_id, source, text) the funnel consumes, read by both
      // branches. The query fn cannot see the final action, so the
      // cache's lifetime is the session's (MBs at bench scale; LRU
      // evicts under pressure) — registered in the Artifacts registry
      // (round 14) so the harness sweep (or any embedding caller)
      // releases it explicitly instead of relying on LRU.
      val docs = graft.operators.Artifacts.pin(
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            graft.text.Curation.extractMainText(TextQueries.plantedHtml)
              .as("text")),
        "funnel.extract")
      val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id",
        threshold = 0.7)
      // one native tokenize pass for the lang+quality gate (round 14;
      // the HOF pair re-tokenized 7× — values bit-identical,
      // TextHashExprSpec parity, oracle unchanged)
      val kept = graft.dedup.Components
        .cleanCorpus(docs, pairs.select("ida", "idb"), "doc_id")
        .withColumn("__p", graft.text.TextFunctions.textProfile(col("text")))
        .filter(graft.text.TextFunctions.langIdFromProfile(col("__p")) === "en"
          && graft.text.TextFunctions.qualityFromProfile(col("__p")) >= 0.4)
      graft.sampling.Sampling.deterministicSample(kept, "doc_id", 0.5)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("source")
    }),

    // The funnel with its quality cut DRIVEN BY CALIBRATION instead of a
    // constant: bestThresholds' per-source operating points — swept on
    // the hash-split 20% eval slice of the EXTRACTED corpus with
    // qualityScore as the score and the planted doc_id%3 label —
    // broadcast-join the survivor stream, and the keep filter becomes
    // quality >= thr_pct/100 with a 0.4 fallback for any source absent
    // from the calibration table (left join + coalesce, so a regenerated
    // fixture can never empty a source silently). The eval slice is the
    // id-HASH split, not doc_id%5: fixture sources are doc_id%20, so a
    // modulus split would cover only 4 of 20 sources. Same funnel shape
    // as q_corpus_funnel; the constant is gone — the operating-point
    // step drives the pipeline it was built for.
    "q_corpus_funnel_calibrated" -> ((s, d) => {
      import graft.text.TextFunctions._
      // same registered extraction boundary as q_corpus_funnel — the
      // canonical plan is identical, so the two queries share ONE cache
      // entry and the registry holds one releasable handle each
      val docs = graft.operators.Artifacts.pin(
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            graft.text.Curation.extractMainText(TextQueries.plantedHtml)
              .as("text")),
        "funnel.extract")
      val holdout = graft.sampling.Sampling
        .trainEvalSplit(docs, "doc_id", 0.2)._2
      val calib = holdout.select(col("source"),
        (col("doc_id") % 3 === 0).as("pos"),
        qualityScore(col("text")).as("q_score"))
      val thr = graft.text.HashClassifier.bestThresholds(
          graft.text.HashClassifier.thresholdSweep(calib, "source", "pos"),
          "source")
        .select(col("source").as("__src"), col("thr_pct"))
      val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id",
        threshold = 0.7)
      // same one-pass gate as q_corpus_funnel (round 14)
      val kept = graft.dedup.Components
        .cleanCorpus(docs, pairs.select("ida", "idb"), "doc_id")
        .withColumn("__p", graft.text.TextFunctions.textProfile(col("text")))
        .filter(graft.text.TextFunctions.langIdFromProfile(col("__p")) === "en")
        .join(broadcast(thr), col("source") === col("__src"), "left")
        .filter(graft.text.TextFunctions.qualityFromProfile(col("__p")) >=
          coalesce(col("thr_pct").cast("double") / lit(100.0), lit(0.4)))
      graft.sampling.Sampling.deterministicSample(kept, "doc_id", 0.5)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("source")
    }),

    // Quality-aware dedup: per near-dup cluster keep the LONGEST member
    // (token count, ties to lower id) instead of the min-id one —
    // Components.cleanCorpusBest with a token-count score. Survivor set
    // differs from q_dedup_corpus_clean exactly where a cluster's longest
    // copy is not its lowest id.
    "q_dedup_keep_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id",
        threshold = 0.7)
      graft.dedup.Components
        .cleanCorpusBest(docs, pairs.select("ida", "idb"), "doc_id",
          size(graft.text.TextFunctions.tokens(col("text"))).cast("long"))
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    }),

    // End-to-end cleaned corpus: kept doc ids after dropping every
    // non-canonical near-dup cluster member (broadcast anti-join).
    "q_dedup_corpus_clean" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id",
        threshold = 0.7)
      graft.dedup.Components
        .cleanCorpus(docs, pairs.select("ida", "idb"), "doc_id")
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    }))

  private val tokensSql =
    """list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')"""

  /** Shared 120-bit simhash CTE prefix (tokens → per-token md5 bit
    * matrices → vote sums → (h1, h2) signatures → 4×30-bit chunk
    * explode `e`) for q_dedup_simhash_wide and its spanning-star twin —
    * one text, so the two oracles cannot drift in signature semantics.
    */
  private lazy val wideSimhashCtes =
    s"""t AS (
      |  SELECT doc_id AS id, w, len(w) AS n
      |  FROM (SELECT doc_id, $tokensSql AS w FROM documents)
      |  WHERE len(w) > 0),
      |tb1 AS (
      |  SELECT id, n,
      |    list_transform(w, tk -> flatten(list_transform(generate_series(1, 15), d -> [
      |      (('0x' || substr(md5(tk), d, 1))::INT // 8) % 2,
      |      (('0x' || substr(md5(tk), d, 1))::INT // 4) % 2,
      |      (('0x' || substr(md5(tk), d, 1))::INT // 2) % 2,
      |      ('0x' || substr(md5(tk), d, 1))::INT % 2 ]))) AS b1,
      |    list_transform(w, tk -> flatten(list_transform(generate_series(1, 15), d -> [
      |      (('0x' || substr(md5(tk), 15 + d, 1))::INT // 8) % 2,
      |      (('0x' || substr(md5(tk), 15 + d, 1))::INT // 4) % 2,
      |      (('0x' || substr(md5(tk), 15 + d, 1))::INT // 2) % 2,
      |      ('0x' || substr(md5(tk), 15 + d, 1))::INT % 2 ]))) AS b2
      |  FROM t),
      |v AS (
      |  SELECT id, n,
      |    list_reduce(b1, (x, y) -> list_transform(generate_series(1, 60), i -> x[i] + y[i])) AS v1,
      |    list_reduce(b2, (x, y) -> list_transform(generate_series(1, 60), i -> x[i] + y[i])) AS v2
      |  FROM tb1),
      |s AS (
      |  SELECT id,
      |    list_sum(list_transform(generate_series(1, 60), b ->
      |      CASE WHEN v1[b] * 2 > n THEN (2.0 ** (60 - b))::BIGINT ELSE 0 END))::BIGINT AS h1,
      |    list_sum(list_transform(generate_series(1, 60), b ->
      |      CASE WHEN v2[b] * 2 > n THEN (2.0 ** (60 - b))::BIGINT ELSE 0 END))::BIGINT AS h2
      |  FROM v),
      |e AS (
      |  SELECT id, h1, h2, c,
      |    CASE c WHEN 0 THEN h1 & 1073741823
      |           WHEN 1 THEN (h1 >> 30) & 1073741823
      |           WHEN 2 THEN h2 & 1073741823
      |           ELSE (h2 >> 30) & 1073741823 END AS cv
      |  FROM s, unnest([0, 1, 2, 3]) u(c))""".stripMargin
  // Twin of editDistancePairs(maxDist=8): same length block (|Δlen| ≤ 8),
  // same 27-bin char-frequency L1 ≤ 16 prefilter, same final
  // levenshtein ≤ 8 verify. AS MATERIALIZED is load-bearing twice: it
  // stops DuckDB inlining the histogram build into the join (recomputing
  // 27 replace() scans per PAIR) and stops the levenshtein predicate
  // being pushed below the L1 filter (evaluating the O(len²) DP on every
  // length-blocked pair — an ~80× slowdown measured at sf0.01). Shared by
  // q_dedup_fuzzy and q_dedup_fuzzy_lsh (the LSH route must match the
  // lossless result exactly).
  private val fuzzyOracleSql =
    """WITH h AS MATERIALIZED (
      |  SELECT doc_id, text, length(text) AS len,
      |         list_transform(string_split('abcdefghijklmnopqrstuvwxyz ', ''),
      |           ch -> length(text) - length(replace(text, ch, ''))) AS hist
      |  FROM documents),
      |cand AS MATERIALIZED (
      |  SELECT a.doc_id AS ida, b.doc_id AS idb, a.text AS ta, b.text AS tb
      |  FROM h a JOIN h b
      |    ON a.doc_id < b.doc_id AND abs(a.len - b.len) <= 8
      |  WHERE list_sum(list_transform(generate_series(1, 27),
      |          i -> abs(a.hist[i] - b.hist[i]))) <= 16)
      |SELECT ida, idb, levenshtein(ta, tb) AS dist FROM cand
      |WHERE levenshtein(ta, tb) <= 8
      |ORDER BY ida, idb""".stripMargin
  private val shinglesSql =
    s"""CASE WHEN len(w) >= 3 THEN
       | list_distinct(list_transform(generate_series(1, len(w) - 2),
       |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
       | ELSE [] END""".stripMargin
  private val spans5Sql =
    s"""CASE WHEN len(w) >= 5 THEN
       | list_distinct(list_transform(generate_series(1, len(w) - 4),
       |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))
       | ELSE [] END""".stripMargin

  /** Recursive-CTE prefix shared by the cluster-based oracles: minhash
    * pair generation + undirected reachability closure → cc(id, component).
    */
  /** Exact Jaccard ≥ 0.8 pairs — the shared oracle for the naive
    * inverted-index path and the prefix-filtered path (identical
    * results by the prefix-filter correctness guarantee).
    */
  private lazy val exactJaccardOracleSql =
    s"""WITH t AS (
      |  SELECT doc_id AS id, $shinglesSql AS sh
      |  FROM (SELECT doc_id, $tokensSql AS w FROM documents)),
      |e AS (SELECT id, len(sh) AS n_sh, unnest(sh) AS s FROM t),
      |p AS (
      |  SELECT a.id AS ida, b.id AS idb, a.n_sh AS na, b.n_sh AS nb,
      |         count(*) AS inter
      |  FROM e a JOIN e b ON a.s = b.s AND a.id < b.id
      |  GROUP BY 1, 2, 3, 4)
      |SELECT ida, idb,
      |       round(inter::DOUBLE / (na + nb - inter), 6) AS jaccard
      |FROM p WHERE round(inter::DOUBLE / (na + nb - inter), 6) >= 0.8
      |ORDER BY ida, idb""".stripMargin

  /** The minhash-LSH + recursive-components CTE chain over `src` (any
    * relation exposing doc_id/text) — shared by the cluster oracles
    * (src = documents) and the corpus funnel (src = the HTML-extracted
    * docs view, which must feed the SAME pair generation the Spark side
    * runs on extracted text).
    */
  private def clusterBody(src: String) =
    s"""t AS (
      |  SELECT doc_id AS id, $shinglesSql AS sh
      |  FROM (SELECT doc_id, $tokensSql AS w FROM $src)),
      |sg AS (
      |  SELECT id, sh,
      |    list_transform(generate_series(0, 11),
      |      i -> list_min(list_transform(sh, g -> md5(i::VARCHAR || ':' || g)))) AS sig
      |  FROM t WHERE len(sh) > 0),
      |banded AS (
      |  SELECT id, sh, band,
      |         md5(array_to_string(sig[band*3+1 : band*3+3], '|')) AS key
      |  FROM sg, unnest([0, 1, 2, 3]) AS u(band)),
      |cand AS (
      |  SELECT DISTINCT a.id AS ida, b.id AS idb
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.key = b.key AND a.id < b.id),
      |v AS (
      |  SELECT c.ida, c.idb,
      |         len(list_intersect(ta.sh, tb.sh)) AS inter,
      |         len(ta.sh) AS na, len(tb.sh) AS nb
      |  FROM cand c
      |  JOIN t ta ON ta.id = c.ida
      |  JOIN t tb ON tb.id = c.idb),
      |pairs AS (
      |  SELECT ida, idb FROM v
      |  WHERE round(inter::DOUBLE / (na + nb - inter), 6) >= 0.7),
      |edges AS (
      |  SELECT ida AS src, idb AS dst FROM pairs
      |  UNION SELECT idb, ida FROM pairs),
      |reach(id, root) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id),
      |cc AS (SELECT id, min(root) AS component FROM reach GROUP BY id)""".stripMargin

  private val clusterCte = s"WITH RECURSIVE ${clusterBody("documents")}"

  val oracle: Map[String, String] = Map(
    // twin of Dedup.spanDupStats(w=5): per-doc-distinct 5-token spans,
    // span df across docs, duplicated = df >= 2
    "q_dup_spans" ->
      s"""WITH t AS (SELECT doc_id AS id, $spans5Sql AS sh
        |           FROM (SELECT doc_id, $tokensSql AS w FROM documents)),
        |e AS (SELECT id, unnest(sh) AS s FROM t WHERE len(sh) > 0),
        |d AS (SELECT s, count(*) AS sdf FROM e GROUP BY s)
        |SELECT e.id AS doc_id, count(*) AS n_spans,
        |  sum(CASE WHEN d.sdf >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_spans,
        |  round(sum(CASE WHEN d.sdf >= 2 THEN 1 ELSE 0 END)::DOUBLE
        |        / count(*), 6) AS dup_frac
        |FROM e JOIN d USING (s)
        |GROUP BY e.id ORDER BY doc_id""".stripMargin,
    // twin of q_strip_self_repeats: same planting, per-(id, span)
    // min-start + occurrence count, later-occurrence coverage minus
    // first-occurrence coverage, positional reassembly
    "q_strip_self_repeats" ->
      s"""WITH raw AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 1
        |      THEN text || ' ' || array_to_string(($tokensSql)[1:6], ' ')
        |      ELSE text END AS text
        |  FROM documents),
        |tok AS (SELECT doc_id AS id, $tokensSql AS w FROM raw),
        |sp0 AS (
        |  SELECT id, unnest(list_transform(generate_series(1, len(w) - 4),
        |    i -> {'strt': i - 1,
        |          's': w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]})) AS u
        |  FROM tok WHERE len(w) >= 5),
        |sp AS (SELECT id, u.strt AS strt, u.s AS s FROM sp0),
        |fs AS (SELECT id, s, min(strt) AS fs, count(*) AS occ
        |       FROM sp GROUP BY 1, 2),
        |rep AS (SELECT sp.id, sp.strt, fs.fs FROM sp
        |        JOIN fs USING (id, s) WHERE fs.occ >= 2),
        |later AS (SELECT DISTINCT id, strt + d AS pos
        |          FROM rep, generate_series(0, 4) AS g(d) WHERE strt > fs),
        |frst AS (SELECT DISTINCT id, strt + d AS pos
        |         FROM rep, generate_series(0, 4) AS g(d) WHERE strt = fs),
        |dropped AS (
        |  SELECT l.id, l.pos FROM later l
        |  WHERE NOT EXISTS (SELECT 1 FROM frst f
        |                    WHERE f.id = l.id AND f.pos = l.pos)),
        |tp0 AS (
        |  SELECT id, unnest(list_transform(generate_series(1, len(w)),
        |    i -> {'pos': i - 1, 't': w[i]})) AS u
        |  FROM tok WHERE len(w) > 0),
        |tokpos AS (SELECT id, u.pos AS pos, u.t AS t FROM tp0),
        |kept AS (
        |  SELECT tp.id, string_agg(tp.t, ' ' ORDER BY tp.pos) AS clean_text,
        |         count(*) AS n_kept
        |  FROM tokpos tp
        |  WHERE NOT EXISTS (SELECT 1 FROM dropped dr
        |                    WHERE dr.id = tp.id AND dr.pos = tp.pos)
        |  GROUP BY tp.id)
        |SELECT tok.id AS doc_id,
        |       coalesce(kept.clean_text, '') AS clean_text,
        |       len(tok.w)::BIGINT AS n_tokens,
        |       coalesce(kept.n_kept, 0)::BIGINT AS n_kept_tokens
        |FROM tok LEFT JOIN kept ON kept.id = tok.id
        |ORDER BY doc_id""".stripMargin,
    // twin of q_corpus_diff: same snapshot construction, fingerprint
    // full-outer join, unchanged rows dropped
    "q_corpus_diff" ->
      s"""WITH oldc AS (
        |  SELECT doc_id, md5(array_to_string($tokensSql, ' ')) AS fp
        |  FROM documents WHERE doc_id % 11 <> 0),
        |newd AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' appended revision'
        |         ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 3),
        |newc AS (
        |  SELECT doc_id, md5(array_to_string($tokensSql, ' ')) AS fp
        |  FROM newd),
        |j AS (
        |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |         o.fp AS fp_old, n.fp AS fp_new
        |  FROM oldc o FULL OUTER JOIN newc n ON o.doc_id = n.doc_id)
        |SELECT doc_id,
        |  CASE WHEN fp_old IS NULL THEN 'added'
        |       WHEN fp_new IS NULL THEN 'removed'
        |       ELSE 'modified' END AS change
        |FROM j
        |WHERE fp_old IS NULL OR fp_new IS NULL OR fp_old <> fp_new
        |ORDER BY doc_id""".stripMargin,
    // twin of winnowPairs(k=3, w=4): positional 3-gram md5-prefix
    // hashes, min per 4-window (global min under 4 windows), distinct
    // values, shared-fingerprint pairs at >= 2
    "q_winnow_pairs_capped" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS tk FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(tk) >= 3 THEN
        |      list_transform(generate_series(1, len(tk) - 2),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
        |    ELSE [] END AS grams
        |  FROM t),
        |h AS (
        |  SELECT doc_id,
        |    list_transform(grams,
        |      g2 -> ('0x' || substr(md5(g2), 1, 8))::BIGINT) AS hs
        |  FROM g WHERE len(grams) > 0),
        |f AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(hs) >= 4 THEN
        |      list_transform(generate_series(1, len(hs) - 3),
        |        j -> list_min(hs[j:j+3]))
        |      ELSE [list_min(hs)] END) AS fps
        |  FROM h),
        |e0 AS (SELECT doc_id AS id, unnest(fps) AS fp FROM f),
        |pop AS (SELECT fp, count(*) AS p FROM e0 GROUP BY 1),
        |e AS (SELECT e0.id, e0.fp FROM e0 JOIN pop USING (fp) WHERE pop.p <= 5),
        |p AS (
        |  SELECT a.id AS ida, b.id AS idb, count(*) AS n_shared
        |  FROM e a JOIN e b ON a.fp = b.fp AND a.id < b.id
        |  GROUP BY 1, 2)
        |SELECT ida, idb, n_shared FROM p WHERE n_shared >= 2
        |ORDER BY ida, idb""".stripMargin,
    "q_winnow_pairs" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS tk FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(tk) >= 3 THEN
        |      list_transform(generate_series(1, len(tk) - 2),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
        |    ELSE [] END AS grams
        |  FROM t),
        |h AS (
        |  SELECT doc_id,
        |    list_transform(grams,
        |      g2 -> ('0x' || substr(md5(g2), 1, 8))::BIGINT) AS hs
        |  FROM g WHERE len(grams) > 0),
        |f AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(hs) >= 4 THEN
        |      list_transform(generate_series(1, len(hs) - 3),
        |        j -> list_min(hs[j:j+3]))
        |      ELSE [list_min(hs)] END) AS fps
        |  FROM h),
        |e AS (SELECT doc_id AS id, unnest(fps) AS fp FROM f),
        |p AS (
        |  SELECT a.id AS ida, b.id AS idb, count(*) AS n_shared
        |  FROM e a JOIN e b ON a.fp = b.fp AND a.id < b.id
        |  GROUP BY 1, 2)
        |SELECT ida, idb, n_shared FROM p WHERE n_shared >= 2
        |ORDER BY ida, idb""".stripMargin,
    // twin of Dedup.stripDupSpans(w=5): span occurrences with start
    // positions, per-doc-distinct df, covered positions strt..strt+4
    // for spans with df >= 2, anti-join against the token stream,
    // positional reassembly; fully-covered and sub-5-token docs keep
    // their row with the same coalesce defaults as the Spark side
    "q_strip_spans" ->
      s"""WITH tok AS (SELECT doc_id AS id, $tokensSql AS w FROM documents),
        |sp0 AS (
        |  SELECT id, unnest(list_transform(generate_series(1, len(w) - 4),
        |    i -> {'strt': i - 1,
        |          's': w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]})) AS u
        |  FROM tok WHERE len(w) >= 5),
        |sp AS (SELECT id, u.strt AS strt, u.s AS s FROM sp0),
        |sdf AS (
        |  SELECT s, count(*) AS df
        |  FROM (SELECT DISTINCT id, s FROM sp) GROUP BY s),
        |cov AS (
        |  SELECT DISTINCT sp.id, sp.strt + d AS pos
        |  FROM sp JOIN sdf USING (s), generate_series(0, 4) AS gg(d)
        |  WHERE sdf.df >= 2),
        |tp0 AS (
        |  SELECT id, unnest(list_transform(generate_series(1, len(w)),
        |    i -> {'pos': i - 1, 't': w[i]})) AS u
        |  FROM tok WHERE len(w) > 0),
        |tokpos AS (SELECT id, u.pos AS pos, u.t AS t FROM tp0),
        |kept AS (
        |  SELECT tp.id, string_agg(tp.t, ' ' ORDER BY tp.pos) AS clean_text,
        |         count(*) AS n_kept
        |  FROM tokpos tp
        |  WHERE NOT EXISTS (SELECT 1 FROM cov
        |                    WHERE cov.id = tp.id AND cov.pos = tp.pos)
        |  GROUP BY tp.id)
        |SELECT tok.id AS doc_id,
        |       coalesce(kept.clean_text, '') AS clean_text,
        |       len(tok.w)::BIGINT AS n_tokens,
        |       coalesce(kept.n_kept, 0)::BIGINT AS n_kept_tokens
        |FROM tok LEFT JOIN kept ON kept.id = tok.id
        |ORDER BY doc_id""".stripMargin,
    // the exact-substring verify reproduced in SQL on the same CTE
    // skeleton as q_strip_spans: flagged spans → min-id hubs → star
    // pairs (both directions via the sides UNION, mirroring the UDF's
    // two-sided emit) → 25-char gram match windows between joined token
    // strings → a token drops iff EVERY one of its chars (1-based
    // offsets off a windowed prefix sum) falls inside a matched window
    // — unioned with the token-level cov positions into one reassembly
    "q_strip_spans_verified" ->
      s"""WITH tok AS (SELECT doc_id AS id, $tokensSql AS w FROM documents),
        |sp0 AS (
        |  SELECT id, unnest(list_transform(generate_series(1, len(w) - 4),
        |    i -> {'strt': i - 1,
        |          's': w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]})) AS u
        |  FROM tok WHERE len(w) >= 5),
        |sp AS (SELECT id, u.strt AS strt, u.s AS s FROM sp0),
        |sdf AS (
        |  SELECT s, count(*) AS df
        |  FROM (SELECT DISTINCT id, s FROM sp) GROUP BY s),
        |cov AS (
        |  SELECT DISTINCT sp.id, sp.strt + d AS pos
        |  FROM sp JOIN sdf USING (s), generate_series(0, 4) AS gg(d)
        |  WHERE sdf.df >= 2),
        |fl AS (SELECT DISTINCT sp.id, sp.s
        |       FROM sp JOIN sdf USING (s) WHERE sdf.df >= 2),
        |hb AS (SELECT s, min(id) AS hub FROM fl GROUP BY s),
        |pairs AS (SELECT DISTINCT hb.hub AS ida, fl.id AS idb
        |          FROM fl JOIN hb USING (s) WHERE fl.id <> hb.hub),
        |sides AS (SELECT ida AS self, idb AS other FROM pairs
        |          UNION SELECT idb AS self, ida AS other FROM pairs),
        |js AS (SELECT id, array_to_string(w, ' ') AS st FROM tok
        |       WHERE id IN (SELECT self FROM sides)),
        |gr0 AS (SELECT id, unnest(list_transform(
        |          generate_series(1, len(st) - 24),
        |          i -> {'i': i, 'g': substr(st, i, 25)})) AS u
        |        FROM js WHERE len(st) >= 25),
        |gr AS (SELECT id, u.i AS i, u.g AS g FROM gr0),
        |wins AS (SELECT sd.self, sd.other, ga.i
        |         FROM sides sd
        |         JOIN gr ga ON ga.id = sd.self
        |         JOIN (SELECT DISTINCT id, g FROM gr) gb
        |           ON gb.id = sd.other AND gb.g = ga.g),
        |tp0 AS (SELECT id, unnest(list_transform(generate_series(1, len(w)),
        |          i -> {'pos': i - 1, 't': w[i]})) AS u
        |        FROM tok WHERE len(w) > 0),
        |tokpos AS (SELECT id, u.pos AS pos, u.t AS t FROM tp0),
        |toff AS (SELECT id, pos, t, len(t) AS tl,
        |           sum(len(t) + 1) OVER (PARTITION BY id ORDER BY pos)
        |             - len(t) - 1 AS cs
        |         FROM tokpos WHERE id IN (SELECT self FROM sides)),
        |tokchar AS (SELECT sd.self, sd.other, toff.pos, toff.tl,
        |              toff.cs + unnest(generate_series(1, toff.tl)) AS c
        |            FROM sides sd JOIN toff ON toff.id = sd.self),
        |covch AS (SELECT DISTINCT tc.self, tc.other, tc.pos, tc.tl, tc.c
        |          FROM tokchar tc JOIN wins w
        |            ON w.self = tc.self AND w.other = tc.other
        |           AND tc.c BETWEEN w.i AND w.i + 24),
        |vdrop AS (SELECT DISTINCT self AS id, pos
        |          FROM (SELECT self, other, pos, tl, count(*) AS nc
        |                FROM covch GROUP BY 1, 2, 3, 4)
        |          WHERE nc = tl),
        |allcov AS (SELECT id, pos FROM cov
        |           UNION SELECT id, pos FROM vdrop),
        |kept AS (
        |  SELECT tp.id, string_agg(tp.t, ' ' ORDER BY tp.pos) AS clean_text,
        |         count(*) AS n_kept
        |  FROM tokpos tp
        |  WHERE NOT EXISTS (SELECT 1 FROM allcov
        |                    WHERE allcov.id = tp.id AND allcov.pos = tp.pos)
        |  GROUP BY tp.id)
        |SELECT tok.id AS doc_id,
        |       coalesce(kept.clean_text, '') AS clean_text,
        |       len(tok.w)::BIGINT AS n_tokens,
        |       coalesce(kept.n_kept, 0)::BIGINT AS n_kept_tokens
        |FROM tok LEFT JOIN kept ON kept.id = tok.id
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_exact" ->
      s"""SELECT md5(array_to_string(w, ' ')) AS fp,
        |       min(doc_id) AS canonical_id,
        |       count(*) AS n_copies
        |FROM (SELECT doc_id, $tokensSql AS w FROM documents)
        |GROUP BY 1 ORDER BY fp""".stripMargin,
    "q_dedup_exact_bag" ->
      s"""SELECT md5(array_to_string(list_sort(w), ' ')) AS fp,
        |       min(doc_id) AS canonical_id,
        |       count(*) AS n_copies
        |FROM (SELECT doc_id, $tokensSql AS w FROM documents)
        |GROUP BY 1 ORDER BY fp""".stripMargin,
    "q_dedup_exact_stats" ->
      s"""SELECT count(*) AS n_docs,
        |       count(DISTINCT md5(array_to_string(w, ' '))) AS n_unique,
        |       count(*) - count(DISTINCT md5(array_to_string(w, ' '))) AS n_dups
        |FROM (SELECT doc_id, $tokensSql AS w FROM documents)""".stripMargin,
    // twin of containmentPairs(threshold = 0.9, exact): one pair
    // aggregation, both directions projected from it
    "q_dedup_containment" ->
      s"""WITH t AS (
        |  SELECT doc_id AS id, $shinglesSql AS sh
        |  FROM (SELECT doc_id, $tokensSql AS w FROM documents)),
        |e AS (SELECT id, len(sh) AS n_sh, unnest(sh) AS s FROM t
        |      WHERE len(sh) > 0),
        |p AS (
        |  SELECT a.id AS ida, b.id AS idb, a.n_sh AS na, b.n_sh AS nb,
        |         count(*) AS inter
        |  FROM e a JOIN e b ON a.s = b.s AND a.id < b.id
        |  GROUP BY 1, 2, 3, 4),
        |d AS (
        |  SELECT ida AS inner_id, idb AS outer_id,
        |         round(inter::DOUBLE / na, 6) AS containment FROM p
        |  UNION ALL
        |  SELECT idb, ida, round(inter::DOUBLE / nb, 6) FROM p)
        |SELECT inner_id, outer_id, containment FROM d
        |WHERE containment >= 0.9
        |ORDER BY inner_id, outer_id""".stripMargin,
    // capped-jaccard's df-cut CTE chain with the containment tail:
    // postings post-cut, n_sh pre-cut — indexedShingles semantics
    "q_dedup_containment_capped" ->
      s"""WITH t AS (
        |  SELECT doc_id AS id, $shinglesSql AS sh
        |  FROM (SELECT doc_id, $tokensSql AS w FROM documents)),
        |e0 AS (SELECT id, len(sh) AS n_sh, unnest(sh) AS s FROM t),
        |hot AS (
        |  SELECT s FROM (SELECT s, count(*) AS df FROM e0 GROUP BY s)
        |  WHERE df > 5),
        |e AS (SELECT * FROM e0 WHERE s NOT IN (SELECT s FROM hot)),
        |p AS (
        |  SELECT a.id AS ida, b.id AS idb, a.n_sh AS na, b.n_sh AS nb,
        |         count(*) AS inter
        |  FROM e a JOIN e b ON a.s = b.s AND a.id < b.id
        |  GROUP BY 1, 2, 3, 4),
        |d AS (
        |  SELECT ida AS inner_id, idb AS outer_id,
        |         round(inter::DOUBLE / na, 6) AS containment FROM p
        |  UNION ALL
        |  SELECT idb, ida, round(inter::DOUBLE / nb, 6) FROM p)
        |SELECT inner_id, outer_id, containment FROM d
        |WHERE containment >= 0.9
        |ORDER BY inner_id, outer_id""".stripMargin,
    "q_dedup_jaccard" -> exactJaccardOracleSql,
    // SAME oracle as q_dedup_jaccard on purpose: prefix filtering is a
    // lossless candidate-pruning rewrite, so the cross-engine hash
    // must be identical to the naive inverted index's
    "q_dedup_jaccard_prefix" -> exactJaccardOracleSql,
    // Twin of jaccardPairs(maxShingleFreq = 5): the hot CTE computes
    // shingle document frequency and the same df-cut is applied before
    // the self-join; na/nb remain the uncut shingle counts.
    "q_dedup_jaccard_capped" ->
      s"""WITH t AS (
        |  SELECT doc_id AS id, $shinglesSql AS sh
        |  FROM (SELECT doc_id, $tokensSql AS w FROM documents)),
        |e0 AS (SELECT id, len(sh) AS n_sh, unnest(sh) AS s FROM t),
        |hot AS (
        |  SELECT s FROM (SELECT s, count(*) AS df FROM e0 GROUP BY s)
        |  WHERE df > 5),
        |e AS (SELECT * FROM e0 WHERE s NOT IN (SELECT s FROM hot)),
        |p AS (
        |  SELECT a.id AS ida, b.id AS idb, a.n_sh AS na, b.n_sh AS nb,
        |         count(*) AS inter
        |  FROM e a JOIN e b ON a.s = b.s AND a.id < b.id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT ida, idb,
        |       round(inter::DOUBLE / (na + nb - inter), 6) AS jaccard
        |FROM p WHERE round(inter::DOUBLE / (na + nb - inter), 6) >= 0.8
        |ORDER BY ida, idb""".stripMargin,
    "q_dedup_minhash_lsh" ->
      s"""WITH t AS (
        |  SELECT doc_id AS id, $shinglesSql AS sh
        |  FROM (SELECT doc_id, $tokensSql AS w FROM documents)),
        |s AS (
        |  SELECT id, sh,
        |    list_transform(generate_series(0, 11),
        |      i -> list_min(list_transform(sh, g -> md5(i::VARCHAR || ':' || g)))) AS sig
        |  FROM t WHERE len(sh) > 0),
        |banded AS (
        |  SELECT id, sh, band,
        |         md5(array_to_string(sig[band*3+1 : band*3+3], '|')) AS key
        |  FROM s, unnest([0, 1, 2, 3]) AS u(band)),
        |cand AS (
        |  SELECT DISTINCT a.id AS ida, b.id AS idb
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.key = b.key AND a.id < b.id),
        |v AS (
        |  SELECT c.ida, c.idb,
        |         len(list_intersect(ta.sh, tb.sh)) AS inter,
        |         len(ta.sh) AS na, len(tb.sh) AS nb
        |  FROM cand c
        |  JOIN t ta ON ta.id = c.ida
        |  JOIN t tb ON tb.id = c.idb)
        |SELECT ida, idb,
        |       round(inter::DOUBLE / (na + nb - inter), 6) AS jaccard
        |FROM v WHERE round(inter::DOUBLE / (na + nb - inter), 6) >= 0.7
        |ORDER BY ida, idb""".stripMargin,
    // twin of q_decontam_ngram: same 15% eval bucket as q_contamination,
    // per-doc-distinct 5-token spans, eval span set distinct'd globally,
    // corpus hits counted per doc
    "q_decontam_ngram" ->
      s"""WITH t AS (
        |  SELECT doc_id, $spans5Sql AS sh,
        |    ('0x' || substr(md5('evalset:' || doc_id::VARCHAR), 1, 8))::BIGINT
        |      % 10000 AS b
        |  FROM (SELECT doc_id, $tokensSql AS w FROM documents)),
        |ev AS (SELECT DISTINCT unnest(sh) AS s FROM t WHERE b < 1500),
        |cs AS (SELECT doc_id AS corpus_id, len(sh) AS n_spans,
        |              unnest(sh) AS s
        |       FROM t WHERE b >= 1500 AND len(sh) > 0)
        |SELECT corpus_id, n_spans, count(*)::BIGINT AS n_hit_spans,
        |       round(count(*)::DOUBLE / n_spans, 6) AS hit_frac
        |FROM cs JOIN ev USING (s)
        |GROUP BY corpus_id, n_spans
        |ORDER BY corpus_id""".stripMargin,
    // twin of q_dedup_incremental: the full-corpus LSH pairs restricted
    // to pairs touching the batch (doc_id % 5 = 0) — band keys are
    // per-doc, so index ∪ fresh-bands ≡ banding the whole corpus and
    // the incremental probe must reproduce this set exactly
    "q_dedup_incremental" ->
      s"""WITH t AS (
        |  SELECT doc_id AS id, $shinglesSql AS sh
        |  FROM (SELECT doc_id, $tokensSql AS w FROM documents)),
        |s AS (
        |  SELECT id, sh,
        |    list_transform(generate_series(0, 11),
        |      i -> list_min(list_transform(sh, g -> md5(i::VARCHAR || ':' || g)))) AS sig
        |  FROM t WHERE len(sh) > 0),
        |banded AS (
        |  SELECT id, sh, band,
        |         md5(array_to_string(sig[band*3+1 : band*3+3], '|')) AS key
        |  FROM s, unnest([0, 1, 2, 3]) AS u(band)),
        |cand AS (
        |  SELECT DISTINCT a.id AS ida, b.id AS idb
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.key = b.key AND a.id < b.id),
        |v AS (
        |  SELECT c.ida, c.idb,
        |         len(list_intersect(ta.sh, tb.sh)) AS inter,
        |         len(ta.sh) AS na, len(tb.sh) AS nb
        |  FROM cand c
        |  JOIN t ta ON ta.id = c.ida
        |  JOIN t tb ON tb.id = c.idb)
        |SELECT ida, idb,
        |       round(inter::DOUBLE / (na + nb - inter), 6) AS jaccard
        |FROM v WHERE round(inter::DOUBLE / (na + nb - inter), 6) >= 0.7
        |  AND (ida % 5 = 0 OR idb % 5 = 0)
        |ORDER BY ida, idb""".stripMargin,
    // twin of q_leakage_split: cluster labels from the same recursive
    // closure, split membership by md5 of the cluster label (falling
    // back to the doc's own id for singletons)
    "q_leakage_split" ->
      s"""$clusterCte,
        |lab AS (
        |  SELECT d.doc_id, coalesce(cc.component, d.doc_id) AS grp
        |  FROM documents d LEFT JOIN cc ON cc.id = d.doc_id),
        |sp AS (
        |  SELECT doc_id,
        |    CASE WHEN ('0x' || substr(md5('graft-split:' || grp::VARCHAR), 1, 8))::BIGINT
        |           % 10000 < 2000
        |      THEN 'eval' ELSE 'train' END AS split
        |  FROM lab)
        |SELECT split, count(*) AS n_docs, sum(doc_id)::BIGINT AS id_sum
        |FROM sp GROUP BY split ORDER BY split""".stripMargin,
    // twin of q_contamination_bloom: the Bloom prefilter is semantically
    // invisible (FPs die in the exact join), so the oracle is the plain
    // fingerprint equi-join over the same planted upper-cased eval set
    "q_contamination_bloom" ->
      s"""WITH fpc AS (
        |  SELECT doc_id AS corpus_id,
        |    md5(array_to_string($tokensSql, ' ')) AS fp
        |  FROM documents),
        |fpe AS (
        |  SELECT doc_id + 100000 AS eval_id,
        |    md5(array_to_string(list_filter(
        |      string_split_regex(lower(trim(upper(text))), '\\s+'),
        |      x -> x <> ''), ' ')) AS fp
        |  FROM documents WHERE doc_id % 10 = 3)
        |SELECT eval_id, corpus_id, fp
        |FROM fpe JOIN fpc USING (fp)
        |ORDER BY eval_id, corpus_id""".stripMargin,
    // Twin of crossNearMatches over the same 15% eval split: identical
    // signature/band arithmetic, band join restricted to eval × corpus.
    "q_contamination" ->
      s"""WITH t0 AS (
        |  SELECT doc_id AS id, $shinglesSql AS sh,
        |    ('0x' || substr(md5('evalset:' || doc_id::VARCHAR), 1, 8))::BIGINT
        |      % 10000 AS b
        |  FROM (SELECT doc_id, $tokensSql AS w FROM documents)),
        |sg AS (
        |  SELECT id, sh, b,
        |    list_transform(generate_series(0, 11),
        |      i -> list_min(list_transform(sh, g -> md5(i::VARCHAR || ':' || g)))) AS sig
        |  FROM t0 WHERE len(sh) > 0),
        |banded AS (
        |  SELECT id, b, band,
        |         md5(array_to_string(sig[band*3+1 : band*3+3], '|')) AS key
        |  FROM sg, unnest([0, 1, 2, 3]) AS u(band)),
        |cand AS (
        |  SELECT DISTINCT e.id AS eval_id, c.id AS corpus_id
        |  FROM banded e JOIN banded c ON e.band = c.band AND e.key = c.key
        |  WHERE e.b < 1500 AND c.b >= 1500),
        |v AS (
        |  SELECT cand.eval_id, cand.corpus_id,
        |         len(list_intersect(te.sh, tc.sh)) AS inter,
        |         len(te.sh) AS na, len(tc.sh) AS nb
        |  FROM cand
        |  JOIN t0 te ON te.id = cand.eval_id
        |  JOIN t0 tc ON tc.id = cand.corpus_id)
        |SELECT eval_id, corpus_id,
        |       round(inter::DOUBLE / (na + nb - inter), 6) AS jaccard
        |FROM v WHERE round(inter::DOUBLE / (na + nb - inter), 6) >= 0.7
        |ORDER BY eval_id, corpus_id""".stripMargin,
    // minhash pair CTEs + recursive reachability closure
    "q_dedup_clusters" ->
      s"""$clusterCte
        |SELECT id, component, CAST(id = component AS INT) AS is_canonical
        |FROM cc ORDER BY id""".stripMargin,
    // same oracle as q_dedup_clusters: the star iteration must land on
    // the identical labels the recursive closure computes
    "q_dedup_clusters_star" ->
      s"""$clusterCte
        |SELECT id, component, CAST(id = component AS INT) AS is_canonical
        |FROM cc ORDER BY id""".stripMargin,
    "q_dedup_corpus_clean" ->
      s"""$clusterCte
        |SELECT doc_id, source, lang FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM cc WHERE id <> component)
        |ORDER BY doc_id""".stripMargin,
    // twin of cleanCorpusBest(score = token count): same cluster closure,
    // winner per component = highest token count then lowest id
    "q_dedup_keep_best" ->
      s"""$clusterCte,
        |m AS (
        |  SELECT cc.id, cc.component, len($tokensSql) AS score
        |  FROM cc JOIN documents d ON d.doc_id = cc.id),
        |w AS (
        |  SELECT component, id AS keep_id,
        |         row_number() OVER (PARTITION BY component
        |           ORDER BY score DESC, id) AS rn
        |  FROM m),
        |dropped AS (
        |  SELECT id FROM m
        |  WHERE id NOT IN (SELECT keep_id FROM w WHERE rn = 1))
        |SELECT doc_id, source, lang FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM dropped)
        |ORDER BY doc_id""".stripMargin,
    "q_corpus_funnel" ->
      s"""WITH RECURSIVE xdocs AS (
        |${TextQueries.extractedDocsSql}
        |), ${clusterBody("xdocs")},
        |kept AS (
        |  SELECT doc_id, source, text, $tokensSql AS w FROM xdocs
        |  WHERE doc_id NOT IN (SELECT id FROM cc WHERE id <> component)),
        |lang_ok AS (
        |  SELECT doc_id, source, text, w,
        |    len(list_filter(w, x -> x IN ('the','and','of','to','a','in'))) AS en_hits,
        |    len(list_filter(w, x -> x IN ('le','la','et','les','des','un'))) AS fr_hits,
        |    len(list_filter(w, x -> x IN ('el','los','que','y','de','un'))) AS es_hits,
        |    len(list_filter(w, x -> x IN ('der','die','und','das','ein','zu'))) AS de_hits
        |  FROM kept),
        |en_docs AS (
        |  SELECT doc_id, source, text, w, en_hits FROM lang_ok
        |  WHERE en_hits > 0 AND en_hits >= greatest(fr_hits, es_hits, de_hits)),
        |q AS (
        |  SELECT doc_id, source,
        |    round(least(len(w)::DOUBLE / 100.0, 1.0) * 0.5
        |     + (1.0 - least(round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
        |           / greatest(length(text), 1), 6) * 10.0, 1.0)) * 0.2
        |     + least(en_hits::DOUBLE / 5.0, 1.0) * 0.3, 6) AS quality
        |  FROM en_docs),
        |sampled AS (
        |  SELECT doc_id, source FROM q
        |  WHERE quality >= 0.4
        |    AND ('0x' || substr(md5('graft:' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < 5000)
        |SELECT source, count(*) AS n_docs FROM sampled
        |GROUP BY source ORDER BY source""".stripMargin,
    // same funnel chain, but the quality constant is replaced by the
    // per-source max-F1 operating point swept on the hash-split eval
    // slice (qualityScore as score, doc_id%3 label, grid 5..95 by 5,
    // ties toward the lowest threshold) with coalesce(thr/100, 0.4)
    "q_corpus_funnel_calibrated" ->
      s"""WITH RECURSIVE xdocs AS (
        |${TextQueries.extractedDocsSql}
        |), ${clusterBody("xdocs")},
        |calt AS (
        |  SELECT doc_id, source, text, $tokensSql AS w FROM xdocs
        |  WHERE ('0x' || substr(md5('graft-split:' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < 2000),
        |cal AS (
        |  SELECT source, (doc_id % 3 = 0) AS pos,
        |    round(least(len(w)::DOUBLE / 100.0, 1.0) * 0.5
        |     + (1.0 - least(round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
        |           / greatest(length(text), 1), 6) * 10.0, 1.0)) * 0.2
        |     + least(len(list_filter(w, x -> x IN ('the','and','of','to','a','in')))::DOUBLE / 5.0, 1.0) * 0.3, 6) AS s
        |  FROM calt),
        |sweep AS (
        |  SELECT source, g.thr_pct::INT AS thr_pct,
        |    sum(CASE WHEN pos AND s >= g.thr_pct / 100.0 THEN 1 ELSE 0 END)::BIGINT AS tp,
        |    sum(CASE WHEN NOT pos AND s >= g.thr_pct / 100.0 THEN 1 ELSE 0 END)::BIGINT AS fp,
        |    sum(CASE WHEN pos AND NOT (s >= g.thr_pct / 100.0) THEN 1 ELSE 0 END)::BIGINT AS fn
        |  FROM cal, generate_series(5, 95, 5) AS g(thr_pct)
        |  GROUP BY source, g.thr_pct),
        |f AS (SELECT source, thr_pct,
        |    round(2 * tp / greatest(2 * tp + fp + fn, 1), 6) AS f1 FROM sweep),
        |best AS (SELECT source, max(f1) AS bf FROM f GROUP BY source),
        |chosen AS (
        |  SELECT f.source, min(f.thr_pct) AS thr FROM f
        |  JOIN best ON f.source = best.source AND f.f1 = best.bf
        |  GROUP BY f.source),
        |kept AS (
        |  SELECT doc_id, source, text, $tokensSql AS w FROM xdocs
        |  WHERE doc_id NOT IN (SELECT id FROM cc WHERE id <> component)),
        |lang_ok AS (
        |  SELECT doc_id, source, text, w,
        |    len(list_filter(w, x -> x IN ('the','and','of','to','a','in'))) AS en_hits,
        |    len(list_filter(w, x -> x IN ('le','la','et','les','des','un'))) AS fr_hits,
        |    len(list_filter(w, x -> x IN ('el','los','que','y','de','un'))) AS es_hits,
        |    len(list_filter(w, x -> x IN ('der','die','und','das','ein','zu'))) AS de_hits
        |  FROM kept),
        |en_docs AS (
        |  SELECT doc_id, source, text, w, en_hits FROM lang_ok
        |  WHERE en_hits > 0 AND en_hits >= greatest(fr_hits, es_hits, de_hits)),
        |q AS (
        |  SELECT doc_id, source,
        |    round(least(len(w)::DOUBLE / 100.0, 1.0) * 0.5
        |     + (1.0 - least(round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
        |           / greatest(length(text), 1), 6) * 10.0, 1.0)) * 0.2
        |     + least(en_hits::DOUBLE / 5.0, 1.0) * 0.3, 6) AS quality
        |  FROM en_docs),
        |sampled AS (
        |  SELECT q.doc_id, q.source FROM q
        |  LEFT JOIN chosen ch ON q.source = ch.source
        |  WHERE q.quality >= coalesce(ch.thr / 100.0, 0.4)
        |    AND ('0x' || substr(md5('graft:' || q.doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < 5000)
        |SELECT source, count(*) AS n_docs FROM sampled
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_dedup_fuzzy" -> fuzzyOracleSql,
    // Same EXACT oracle on purpose: the LSH-composed route must reproduce
    // the lossless result bit-for-bit at fixture scale, proving the
    // banding's recall rather than assuming it.
    "q_dedup_fuzzy_lsh" -> fuzzyOracleSql,
    "q_dedup_simhash_wide_canonical" ->
      s"""WITH raw AS (SELECT doc_id, $tokensSql AS w FROM documents),
        |canon AS (
        |  SELECT min(doc_id) AS doc_id FROM raw
        |  GROUP BY md5(array_to_string(list_sort(w), ' '))),
        |t AS (
        |  SELECT doc_id AS id, w, len(w) AS n
        |  FROM raw JOIN canon USING (doc_id)
        |  WHERE len(w) > 0),
        |tb1 AS (
        |  SELECT id, n,
        |    list_transform(w, tk -> flatten(list_transform(generate_series(1, 15), d -> [
        |      (('0x' || substr(md5(tk), d, 1))::INT // 8) % 2,
        |      (('0x' || substr(md5(tk), d, 1))::INT // 4) % 2,
        |      (('0x' || substr(md5(tk), d, 1))::INT // 2) % 2,
        |      ('0x' || substr(md5(tk), d, 1))::INT % 2 ]))) AS b1,
        |    list_transform(w, tk -> flatten(list_transform(generate_series(1, 15), d -> [
        |      (('0x' || substr(md5(tk), 15 + d, 1))::INT // 8) % 2,
        |      (('0x' || substr(md5(tk), 15 + d, 1))::INT // 4) % 2,
        |      (('0x' || substr(md5(tk), 15 + d, 1))::INT // 2) % 2,
        |      ('0x' || substr(md5(tk), 15 + d, 1))::INT % 2 ]))) AS b2
        |  FROM t),
        |v AS (
        |  SELECT id, n,
        |    list_reduce(b1, (x, y) -> list_transform(generate_series(1, 60), i -> x[i] + y[i])) AS v1,
        |    list_reduce(b2, (x, y) -> list_transform(generate_series(1, 60), i -> x[i] + y[i])) AS v2
        |  FROM tb1),
        |s AS (
        |  SELECT id,
        |    list_sum(list_transform(generate_series(1, 60), b ->
        |      CASE WHEN v1[b] * 2 > n THEN (2.0 ** (60 - b))::BIGINT ELSE 0 END))::BIGINT AS h1,
        |    list_sum(list_transform(generate_series(1, 60), b ->
        |      CASE WHEN v2[b] * 2 > n THEN (2.0 ** (60 - b))::BIGINT ELSE 0 END))::BIGINT AS h2
        |  FROM v),
        |e AS (
        |  SELECT id, h1, h2, c,
        |    CASE c WHEN 0 THEN h1 & 1073741823
        |           WHEN 1 THEN (h1 >> 30) & 1073741823
        |           WHEN 2 THEN h2 & 1073741823
        |           ELSE (h2 >> 30) & 1073741823 END AS cv
        |  FROM s, unnest([0, 1, 2, 3]) u(c)),
        |cand AS (
        |  SELECT DISTINCT a.id AS ida, b.id AS idb,
        |         a.h1 AS ha1, a.h2 AS ha2, b.h1 AS hb1, b.h2 AS hb2
        |  FROM e a JOIN e b ON a.c = b.c AND a.cv = b.cv AND a.id < b.id)
        |SELECT ida, idb,
        |  (bit_count(xor(ha1, hb1)) + bit_count(xor(ha2, hb2)))::INT AS hamming
        |FROM cand
        |WHERE bit_count(xor(ha1, hb1)) + bit_count(xor(ha2, hb2)) <= 3
        |ORDER BY ida, idb""".stripMargin,
    "q_dedup_simhash_wide" ->
      s"""WITH $wideSimhashCtes,
        |cand AS (
        |  SELECT DISTINCT a.id AS ida, b.id AS idb,
        |         a.h1 AS ha1, a.h2 AS ha2, b.h1 AS hb1, b.h2 AS hb2
        |  FROM e a JOIN e b ON a.c = b.c AND a.cv = b.cv AND a.id < b.id)
        |SELECT ida, idb,
        |  (bit_count(xor(ha1, hb1)) + bit_count(xor(ha2, hb2)))::INT AS hamming
        |FROM cand
        |WHERE bit_count(xor(ha1, hb1)) + bit_count(xor(ha2, hb2)) <= 3
        |ORDER BY ida, idb""".stripMargin,
    // the spanning-star clustering twin: per (chunk, value) bucket every
    // member pairs with the bucket MIN only, same exact hamming verify —
    // shares the signature/explode CTE prefix with the all-pairs oracle
    // so the two cannot drift
    "q_dedup_simhash_wide_star" ->
      s"""WITH $wideSimhashCtes,
        |mn AS (SELECT c, cv, min(id) AS ida FROM e GROUP BY c, cv),
        |cand AS (
        |  SELECT DISTINCT mn.ida, e.id AS idb
        |  FROM e JOIN mn ON e.c = mn.c AND e.cv = mn.cv AND e.id <> mn.ida),
        |j AS (
        |  SELECT cand.ida, cand.idb, a.h1 AS ha1, a.h2 AS ha2,
        |         b.h1 AS hb1, b.h2 AS hb2
        |  FROM cand JOIN s a ON a.id = cand.ida JOIN s b ON b.id = cand.idb)
        |SELECT ida, idb,
        |  (bit_count(xor(ha1, hb1)) + bit_count(xor(ha2, hb2)))::INT AS hamming
        |FROM j
        |WHERE bit_count(xor(ha1, hb1)) + bit_count(xor(ha2, hb2)) <= 3
        |ORDER BY ida, idb""".stripMargin,
    // the closed-star route: star pairs + every verified pair with a
    // hub-failed endpoint, two-level enumeration on the shared
    // signature CTEs (a pair reachable via both routes carries the same
    // exact 120-bit hamming, so plain UNION dedups it)
    "q_dedup_simhash_wide_closed" ->
      s"""WITH $wideSimhashCtes,
        |mn AS (SELECT c, cv, min(id) AS hub FROM e GROUP BY c, cv),
        |wh AS (
        |  SELECT e.c, e.cv, e.id, e.h1, e.h2, mn.hub,
        |    bit_count(xor(e.h1, hs.h1)) + bit_count(xor(e.h2, hs.h2)) AS hham
        |  FROM e JOIN mn ON e.c = mn.c AND e.cv = mn.cv
        |         JOIN s hs ON hs.id = mn.hub),
        |star AS (
        |  SELECT DISTINCT hub AS ida, id AS idb, hham AS hamming
        |  FROM wh WHERE id <> hub AND hham <= 3),
        |fl AS (SELECT c, cv, id, h1, h2 FROM wh WHERE id <> hub AND hham > 3),
        |patch AS (
        |  SELECT DISTINCT least(f.id, o.id) AS ida,
        |    greatest(f.id, o.id) AS idb,
        |    bit_count(xor(f.h1, o.h1)) + bit_count(xor(f.h2, o.h2)) AS hamming
        |  FROM fl f JOIN e o ON f.c = o.c AND f.cv = o.cv AND f.id <> o.id
        |  WHERE bit_count(xor(f.h1, o.h1)) + bit_count(xor(f.h2, o.h2)) <= 3)
        |SELECT ida, idb, hamming::INT AS hamming
        |FROM (SELECT * FROM star UNION SELECT * FROM patch)
        |ORDER BY ida, idb""".stripMargin,
    // the adaptive dispatch reproduced in SQL on the shared signature
    // CTEs: signature-count + MODE-HUB selection (most frequent (h1,h2)
    // per bucket, min id within it — the capture-proof hub rule),
    // small-bucket all-pairs self-join (n ≤ 2), big-bucket star +
    // hub-failed patch under the SECOND-LEVEL f-dispatch (majority-
    // failed buckets reroute to complete per-bucket enumeration, the
    // quad CTE) — the UNION dedups pairs reachable via several
    // buckets/branches (hamming is the same exact 120-bit value on
    // every route)
    "q_dedup_simhash_wide_adaptive" ->
      s"""WITH $wideSimhashCtes,
        |sigc AS (SELECT c, cv, h1, h2, count(*) AS sc, min(id) AS sid
        |         FROM e GROUP BY c, cv, h1, h2),
        |pop AS (
        |  SELECT c, cv, n, sid AS hub FROM (
        |    SELECT c, cv, sum(sc) OVER (PARTITION BY c, cv) AS n, sid,
        |      row_number() OVER (PARTITION BY c, cv
        |                         ORDER BY sc DESC, sid ASC) AS rn
        |    FROM sigc) WHERE rn = 1),
        |eb AS (
        |  SELECT e.id, e.h1, e.h2, e.c, e.cv, pop.n, pop.hub
        |  FROM e JOIN pop ON e.c = pop.c AND e.cv = pop.cv),
        |small AS (
        |  SELECT DISTINCT a.id AS ida, b.id AS idb,
        |    bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) AS hamming
        |  FROM eb a JOIN eb b ON a.c = b.c AND a.cv = b.cv AND a.id < b.id
        |  WHERE a.n <= 2
        |    AND bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) <= 3),
        |wh AS (
        |  SELECT eb.c, eb.cv, eb.id, eb.h1, eb.h2, eb.hub, eb.n,
        |    bit_count(xor(eb.h1, hs.h1)) + bit_count(xor(eb.h2, hs.h2)) AS hham
        |  FROM eb JOIN s hs ON hs.id = eb.hub
        |  WHERE eb.n > 2),
        |fails AS (
        |  SELECT c, cv, count(*) AS f FROM wh
        |  WHERE id <> hub AND hham > 3 GROUP BY c, cv),
        |wf AS (
        |  SELECT wh.*, coalesce(fails.f, 0) AS f
        |  FROM wh LEFT JOIN fails ON wh.c = fails.c AND wh.cv = fails.cv),
        |star AS (
        |  SELECT DISTINCT least(hub, id) AS ida, greatest(hub, id) AS idb,
        |    hham AS hamming
        |  FROM wf WHERE f * 2 <= n AND id <> hub AND hham <= 3),
        |fl AS (SELECT c, cv, id, h1, h2 FROM wf
        |       WHERE f * 2 <= n AND id <> hub AND hham > 3),
        |patch AS (
        |  SELECT DISTINCT least(f.id, o.id) AS ida,
        |    greatest(f.id, o.id) AS idb,
        |    bit_count(xor(f.h1, o.h1)) + bit_count(xor(f.h2, o.h2)) AS hamming
        |  FROM fl f JOIN (SELECT c, cv, id, h1, h2 FROM wf
        |                  WHERE f * 2 <= n) o
        |    ON f.c = o.c AND f.cv = o.cv AND f.id <> o.id
        |  WHERE bit_count(xor(f.h1, o.h1)) + bit_count(xor(f.h2, o.h2)) <= 3),
        |quad AS (
        |  SELECT DISTINCT a.id AS ida, b.id AS idb,
        |    bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) AS hamming
        |  FROM wf a JOIN wf b ON a.c = b.c AND a.cv = b.cv AND a.id < b.id
        |  WHERE a.f * 2 > a.n
        |    AND bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) <= 3)
        |SELECT ida, idb, hamming::INT AS hamming
        |FROM (SELECT * FROM small UNION SELECT * FROM star
        |      UNION SELECT * FROM patch UNION SELECT * FROM quad)
        |ORDER BY ida, idb""".stripMargin,
    // the adaptive exactness theorem, cross-engine: the oracle clusters
    // the ALL-PAIRS verified graph (identical SQL to
    // q_dedup_clusters_simhash_closed's oracle) — hash equality with
    // Spark's mixed-dispatch clustering proves per-bucket routing
    // preserves components on real data
    "q_dedup_clusters_simhash_adaptive" ->
      s"""WITH RECURSIVE $wideSimhashCtes,
        |cand AS (
        |  SELECT DISTINCT a.id AS ida, b.id AS idb,
        |         a.h1 AS ha1, a.h2 AS ha2, b.h1 AS hb1, b.h2 AS hb2
        |  FROM e a JOIN e b ON a.c = b.c AND a.cv = b.cv AND a.id < b.id),
        |vp AS (
        |  SELECT ida, idb FROM cand
        |  WHERE bit_count(xor(ha1, hb1)) + bit_count(xor(ha2, hb2)) <= 3),
        |edges AS (
        |  SELECT ida AS src, idb AS dst FROM vp
        |  UNION SELECT idb, ida FROM vp),
        |reach(id, root) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e2.dst, r.root FROM reach r JOIN edges e2 ON e2.src = r.id),
        |cc AS (SELECT id, min(root) AS component FROM reach GROUP BY id)
        |SELECT id, component, CAST(id = component AS INT) AS is_canonical
        |FROM cc ORDER BY id""".stripMargin,
    // the closed-star equivalence theorem, cross-engine: the oracle
    // clusters the ALL-PAIRS verified graph (same cand CTE as
    // q_dedup_simhash_wide) — hash equality with Spark's closed-route
    // clustering proves component identity on real data
    "q_dedup_clusters_simhash_closed" ->
      s"""WITH RECURSIVE $wideSimhashCtes,
        |cand AS (
        |  SELECT DISTINCT a.id AS ida, b.id AS idb,
        |         a.h1 AS ha1, a.h2 AS ha2, b.h1 AS hb1, b.h2 AS hb2
        |  FROM e a JOIN e b ON a.c = b.c AND a.cv = b.cv AND a.id < b.id),
        |vp AS (
        |  SELECT ida, idb FROM cand
        |  WHERE bit_count(xor(ha1, hb1)) + bit_count(xor(ha2, hb2)) <= 3),
        |edges AS (
        |  SELECT ida AS src, idb AS dst FROM vp
        |  UNION SELECT idb, ida FROM vp),
        |reach(id, root) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e2.dst, r.root FROM reach r JOIN edges e2 ON e2.src = r.id),
        |cc AS (SELECT id, min(root) AS component FROM reach GROUP BY id)
        |SELECT id, component, CAST(id = component AS INT) AS is_canonical
        |FROM cc ORDER BY id""".stripMargin,
    // star pair enumeration (shared signature CTEs) + the same recursive
    // reachability closure the minhash cluster oracles use — the
    // component labels over the SPANNING pair set, end to end in SQL
    "q_dedup_clusters_simhash_star" ->
      s"""WITH RECURSIVE $wideSimhashCtes,
        |mn AS (SELECT c, cv, min(id) AS ida FROM e GROUP BY c, cv),
        |cand AS (
        |  SELECT DISTINCT mn.ida, e.id AS idb
        |  FROM e JOIN mn ON e.c = mn.c AND e.cv = mn.cv AND e.id <> mn.ida),
        |jh AS (
        |  SELECT cand.ida, cand.idb, a.h1 AS ha1, a.h2 AS ha2,
        |         b.h1 AS hb1, b.h2 AS hb2
        |  FROM cand JOIN s a ON a.id = cand.ida JOIN s b ON b.id = cand.idb),
        |vp AS (
        |  SELECT ida, idb FROM jh
        |  WHERE bit_count(xor(ha1, hb1)) + bit_count(xor(ha2, hb2)) <= 3),
        |edges AS (
        |  SELECT ida AS src, idb AS dst FROM vp
        |  UNION SELECT idb, ida FROM vp),
        |reach(id, root) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e2.dst, r.root FROM reach r JOIN edges e2 ON e2.src = r.id),
        |cc AS (SELECT id, min(root) AS component FROM reach GROUP BY id)
        |SELECT id, component, CAST(id = component AS INT) AS is_canonical
        |FROM cc ORDER BY id""".stripMargin,
    "q_dedup_simhash" ->
      s"""WITH t AS (
        |  SELECT doc_id AS id, w, len(w) AS n
        |  FROM (SELECT doc_id, $tokensSql AS w FROM documents)
        |  WHERE len(w) > 0),
        |tb AS (
        |  SELECT id, n,
        |    list_transform(w, tk -> flatten(list_transform(generate_series(1, 15), d -> [
        |      (('0x' || substr(md5(tk), d, 1))::INT // 8) % 2,
        |      (('0x' || substr(md5(tk), d, 1))::INT // 4) % 2,
        |      (('0x' || substr(md5(tk), d, 1))::INT // 2) % 2,
        |      ('0x' || substr(md5(tk), d, 1))::INT % 2 ]))) AS tbits
        |  FROM t),
        |v AS (
        |  SELECT id, n, list_reduce(tbits,
        |    (x, y) -> list_transform(generate_series(1, 60), i -> x[i] + y[i])) AS votes
        |  FROM tb),
        |s AS (
        |  SELECT id, list_sum(list_transform(generate_series(1, 60), b ->
        |    CASE WHEN votes[b] * 2 > n THEN (2.0 ** (60 - b))::BIGINT ELSE 0 END))::BIGINT AS simhash
        |  FROM v),
        |e AS (
        |  SELECT id, simhash, c, (simhash >> (15 * c)) & 32767 AS cv
        |  FROM s, unnest([0, 1, 2, 3]) u(c)),
        |cand AS (
        |  SELECT DISTINCT a.id AS ida, b.id AS idb,
        |         a.simhash AS ha, b.simhash AS hb
        |  FROM e a JOIN e b ON a.c = b.c AND a.cv = b.cv AND a.id < b.id)
        |SELECT ida, idb, bit_count(xor(ha, hb))::INT AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 3
        |ORDER BY ida, idb""".stripMargin)
}
