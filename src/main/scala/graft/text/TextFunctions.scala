package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis building blocks for large-scale training-data
  * pipelines: tokenization, quality scoring, language-ID heuristics,
  * shingling, MinHash signatures and fingerprints.
  *
  * Everything here is composed from codegen'd built-ins (`split`, `filter`,
  * `transform`, `aggregate`, `md5` …) — no Scala UDFs — so whole-stage
  * codegen spans stay intact and the same logic is expressible 1:1 in the
  * DuckDB oracle SQL. All hashing is md5-hex-based: deterministic and
  * engine-independent (unlike Spark's murmur `hash()`, which has no DuckDB
  * twin).
  */
object TextFunctions {

  /** Lower-cased whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Ratio of punctuation chars to total length (explicit class — regex
    * char-class semantics match across engines, unlike \p{Punct}).
    */
  def punctRatio(text: Column): Column = {
    val punct = length(text) - length(regexp_replace(text, "[.,!?;:]", ""))
    round(punct.cast("double") / greatest(length(text), lit(1)), 6)
  }

  def avgWordLen(text: Column): Column = {
    val t = tokens(text)
    round(
      aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        greatest(size(t), lit(1)), 6)
  }

  /** Occurrences of any of `markers` among the tokens. */
  def markerCount(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(lit(_)): _*)))

  val enMarkers = Seq("the", "and", "of", "to", "a", "in")
  val frMarkers = Seq("le", "la", "et", "les", "des", "un")
  val esMarkers = Seq("el", "los", "que", "y", "de", "un")
  val deMarkers = Seq("der", "die", "und", "das", "ein", "zu")

  /** n-gram-marker language ID heuristic with a strict priority order
    * (en > fr > es > de > und) so ties resolve deterministically.
    */
  def langIdHeuristic(text: Column): Column = {
    val en = markerCount(text, enMarkers)
    val fr = markerCount(text, frMarkers)
    val es = markerCount(text, esMarkers)
    val de = markerCount(text, deMarkers)
    when(en > 0 && en >= greatest(fr, es, de), "en")
      .when(fr > 0 && fr >= greatest(es, de), "fr")
      .when(es > 0 && es >= de, "es")
      .when(de > 0, "de")
      .otherwise("und")
  }

  /** Per-script character counts — the writing-system signal that runs
    * BEFORE token-level language ID in a multilingual pipeline (marker
    * tokens only exist for space-separated Latin-script languages; a
    * Cyrillic or CJK doc must be routed by script first). Counts are
    * single-char regexp matches over explicit BMP ranges so any
    * regex-capable engine reproduces them exactly.
    */
  def latinCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]"))
  def cyrillicCount(text: Column): Column =
    regexp_count(text, lit("[Ѐ-ӿ]"))
  def cjkCount(text: Column): Column =
    regexp_count(text, lit("[一-鿿]"))
  def arabicCount(text: Column): Column =
    regexp_count(text, lit("[؀-ۿ]"))

  /** Dominant script with a strict priority order (latin > cyrillic >
    * cjk > arabic > unknown) so ties resolve deterministically — the
    * same tie-break convention as langIdHeuristic.
    */
  def dominantScript(text: Column): Column = {
    val lat = latinCount(text); val cyr = cyrillicCount(text)
    val cjk = cjkCount(text);   val ara = arabicCount(text)
    when(lat > 0 && lat >= greatest(cyr, cjk, ara), "latin")
      .when(cyr > 0 && cyr >= greatest(cjk, ara), "cyrillic")
      .when(cjk > 0 && cjk >= ara, "cjk")
      .when(ara > 0, "arabic")
      .otherwise("unknown")
  }

  /** Composite quality score in [0,1]: length saturation + punctuation
    * sanity + stopword presence (proxy for natural prose).
    */
  def qualityScore(text: Column): Column = {
    val lenScore  = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val punctPen  = least(punctRatio(text) * 10.0, lit(1.0))
    val stopScore = least(markerCount(text, enMarkers).cast("double") / 5.0, lit(1.0))
    round(lenScore * 0.5 + (lit(1.0) - punctPen) * 0.2 + stopScore * 0.3, 6)
  }

  /** One-pass per-doc profile struct (n_chars, n_punct, n_tokens, en,
    * fr, es, de) — the native-expression route to every signal above
    * when a pipeline needs SEVERAL of them: the composed HOF spelling
    * re-tokenizes per signal (CollapseProject inlines the shared
    * `tokens` subtree and codegen subexpression elimination does not
    * recover it — measured 4.5× one tokenize at diversify-100×).
    * [[qualityFromProfile]] / [[langIdFromProfile]] derive the EXACT
    * same values as [[qualityScore]] / [[langIdHeuristic]] (parity
    * pinned in TextHashExprSpec); single-signal callers should keep the
    * HOF forms — they are oracle-mirrorable 1:1 in DuckDB SQL.
    */
  def textProfile(text: Column): Column =
    graft.functions.TextHashExpressions.langQualityProfile(text)

  /** [[qualityScore]] recomputed from a [[textProfile]] struct —
    * bit-identical, including punctRatio's intermediate round(…, 6)
    * BEFORE the ×10 clamp (skipping it shifts the 6th decimal of the
    * composite for some texts).
    */
  def qualityFromProfile(p: Column): Column = {
    val lenScore = least(p.getField("n_tokens").cast("double") / 100.0,
      lit(1.0))
    val pr = round(p.getField("n_punct").cast("double") /
      greatest(p.getField("n_chars"), lit(1)), 6)
    val punctPen = least(pr * 10.0, lit(1.0))
    val stopScore = least(p.getField("en").cast("double") / 5.0, lit(1.0))
    round(lenScore * 0.5 + (lit(1.0) - punctPen) * 0.2 + stopScore * 0.3, 6)
  }

  /** [[langIdHeuristic]] recomputed from a [[textProfile]] struct —
    * same strict priority order, same tie-breaks.
    */
  def langIdFromProfile(p: Column): Column = {
    val en = p.getField("en"); val fr = p.getField("fr")
    val es = p.getField("es"); val de = p.getField("de")
    when(en > 0 && en >= greatest(fr, es, de), "en")
      .when(fr > 0 && fr >= greatest(es, de), "fr")
      .when(es > 0 && es >= de, "es")
      .when(de > 0, "de")
      .otherwise("und")
  }

  /** Normalized content fingerprint: md5 over lower-cased,
    * whitespace-collapsed text. Equal fingerprint ⇔ exact duplicate modulo
    * case/whitespace.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** Polynomial rolling hash over the token stream:
    * h = fold(h * B + tokenHash(t)) mod P, with tokenHash = first 8 md5
    * hex digits as an int. Order-sensitive (unlike the set-based md5
    * fingerprint) — equal only for token-identical documents — and
    * engine-independent: every step stays < 2^63 (P ≈ 1e9+7, B = 31), so
    * no overflow-semantics divergence between engines.
    */
  def rollingHash(text: Column, B: Long = 31L, P: Long = 1000000007L): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => (acc * B + conv(substring(md5(t), 1, 8), 16, 10).cast("long")) % P)

  /** BPE-ish sub-word token count: runs of letters, runs of digits, and
    * single other non-space characters each count as one token — the
    * coarse pre-tokenization pass BPE vocabularies start from.
    */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(bpeTokenPattern))

  /** Word n-gram shingles (distinct), the unit for Jaccard/MinHash dedup. */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      array_distinct(transform(
        sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: k independent permutations simulated by salted md5;
    * component i = lexicographic min of md5(i + ":" + shingle).
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => coalesce(
        array_min(transform(shingleCol,
          s => md5(concat(i.cast("string"), lit(":"), s)))),
        // zero shingles → md5 of the bare salt (parity with the native
        // MinHashSig expression; never a null signature component)
        md5(concat(i.cast("string"), lit(":")))))

  /** LSH band keys over a minhash signature: bands of `r` rows, each
    * hashed to one bucket key. Docs sharing any band key are candidates.
    */
  def lshBands(sigCol: Column, bands: Int, r: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws("|",
        slice(sigCol, b * r + 1, lit(r)))))
}
