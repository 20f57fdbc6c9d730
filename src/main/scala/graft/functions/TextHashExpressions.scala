package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** Static helpers the generated code calls — one JVM method invocation per
  * row keeps whole-stage codegen spans intact while the md5-heavy loops
  * run as plain bytecode instead of per-element interpreted Catalyst
  * lambdas (the HOF formulation re-enters the expression interpreter for
  * EVERY array element; these are 20-40× faster on the dedup corpus).
  *
  * All outputs are BIT-IDENTICAL to the md5-hex SQL formulations in
  * graft.text.TextFunctions / graft.dedup.Dedup oracle SQL — same md5 of
  * UTF-8 bytes, same hex-digit bit extraction, same lexicographic min on
  * hex strings — so DuckDB oracle parity is preserved.
  */
object TextHashOps {

  private val hexChars = "0123456789abcdef".toCharArray

  // MessageDigest.getInstance does a provider lookup — far too costly for
  // a per-shingle hot loop; digest(bytes) resets the instance, so one
  // per thread is safe to reuse.
  private val md5Digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private def md5Hex(bytes: Array[Byte]): String = {
    val d = md5Digest.get().digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** 60-bit SimHash over a token array: per-token md5, first 15 hex digits
    * → 60 bits MSB-first, strict-majority vote per bit (ties → 0).
    * Identical to Dedup.simhashDocs's SQL tree and its DuckDB oracle.
    */
  def simhash60(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](60)
    var t = 0
    while (t < n) {
      val hex = md5Hex(tokens.getUTF8String(t).getBytes)
      var d = 0
      while (d < 15) {
        val c = hex.charAt(d)
        val v = if (c <= '9') c - '0' else c - 'a' + 10
        val base = d * 4
        votes(base) += (v >> 3) & 1
        votes(base + 1) += (v >> 2) & 1
        votes(base + 2) += (v >> 1) & 1
        votes(base + 3) += v & 1
        d += 1
      }
      t += 1
    }
    var h = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) * 2 > n) h |= 1L << (59 - b)
      b += 1
    }
    h
  }

  /** The TAIL 60 SimHash bits: the same strict-majority vote over md5
    * hex digits 16-30 (the half simhash60 doesn't read). Together the
    * two form a 120-bit SimHash whose 4×30-bit chunk LSH
    * (Dedup.simhashPairsWide) has 2^30-sized bucket space — the scale
    * fix for the 15-bit chunks' bucket saturation (measured: at ~66k
    * same-vocabulary docs EVERY 15-bit bucket exceeds pop 20 and
    * candidate volume goes quadratic).
    */
  def simhash60Tail(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](60)
    var t = 0
    while (t < n) {
      val hex = md5Hex(tokens.getUTF8String(t).getBytes)
      var d = 0
      while (d < 15) {
        val c = hex.charAt(15 + d)
        val v = if (c <= '9') c - '0' else c - 'a' + 10
        val base = d * 4
        votes(base) += (v >> 3) & 1
        votes(base + 1) += (v >> 2) & 1
        votes(base + 2) += (v >> 1) & 1
        votes(base + 3) += v & 1
        d += 1
      }
      t += 1
    }
    var h = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) * 2 > n) h |= 1L << (59 - b)
      b += 1
    }
    h
  }

  /** k-component MinHash signature: component i = lexicographic min over
    * shingles of md5Hex(i + ":" + shingle). Identical to
    * TextFunctions.minhashSignature and the DuckDB oracle's
    * list_min(list_transform(...)).
    */
  def minhashSignature(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    // extract shingle bytes once, not once per signature component
    val shingleBytes = new Array[Array[Byte]](n)
    var e = 0
    while (e < n) {
      shingleBytes(e) = shingles.getUTF8String(e).getBytes
      e += 1
    }
    val out = new Array[AnyRef](k)
    var i = 0
    while (i < k) {
      val prefix = (i.toString + ":").getBytes("UTF-8")
      var best: String = null
      var s = 0
      while (s < n) {
        val sb = shingleBytes(s)
        val buf = new Array[Byte](prefix.length + sb.length)
        System.arraycopy(prefix, 0, buf, 0, prefix.length)
        System.arraycopy(sb, 0, buf, prefix.length, sb.length)
        val h = md5Hex(buf)
        if (best == null || h.compareTo(best) < 0) best = h
        s += 1
      }
      // Zero shingles: md5 of the bare salt — deterministic and non-null,
      // honoring the containsNull=false output contract (a null here
      // would NPE lshBandKeys; empty arrays are legal SQL input).
      if (best == null) best = md5Hex(prefix)
      out(i) = UTF8String.fromString(best)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** LSH band keys over the k = bands*r MinHash signature: band b =
    * md5Hex(sig[b*r] + "|" + … + sig[b*r+r-1]) — identical to
    * TextFunctions.lshBands ∘ minhashSignature and the oracle's
    * md5(array_to_string(sig[b*r+1 : b*r+r], '|')). Computing the
    * signature inside ONE expression avoids Catalyst inlining the
    * signature subtree once per band.
    */
  def lshBandKeys(shingles: ArrayData, bands: Int, r: Int): ArrayData = {
    val sig = minhashSignature(shingles, bands * r)
    val out = new Array[AnyRef](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < r) {
        if (j > 0) sb.append('|')
        sb.append(sig.getUTF8String(b * r + j).toString)
        j += 1
      }
      out(b) = UTF8String.fromString(md5Hex(sb.toString.getBytes("UTF-8")))
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Tokenize exactly like TextFunctions.tokens: trim ASCII spaces
    * (StringTrim semantics), lower-case (UTF8String.toLowerCase — same
    * code path Spark's Lower uses), split on java-regex \s+, drop
    * empties.
    */
  def tokenize(text: UTF8String): Array[String] =
    text.trim().toLowerCase().toString.split("\\s+").filter(_.nonEmpty)

  /** One-pass token stats: (n_tokens, avg_word_len, fingerprint). Same
    * values as TextFunctions.{tokenCount, avgWordLen (pre-round),
    * fingerprint}: length in CODE POINTS (Spark's length()), md5 of the
    * single-space token join.
    */
  def tokenStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = tokenize(text)
    var lenSum = 0L
    var i = 0
    while (i < toks.length) {
      lenSum += toks(i).codePointCount(0, toks(i).length)
      i += 1
    }
    val avg = lenSum.toDouble / math.max(toks.length, 1)
    val fp = md5Hex(toks.mkString(" ").getBytes("UTF-8"))
    org.apache.spark.sql.catalyst.InternalRow(
      toks.length, avg, UTF8String.fromString(fp))
  }

  /** One-pass language/quality profile: every per-doc count the extract
    * stage's composed HOF formulation needs — (n_chars, n_punct,
    * n_tokens, en, fr, es, de marker hits). The HOF spelling
    * (qualityScore + langIdHeuristic + tokenCount) re-tokenizes the
    * text SEVEN times after CollapseProject inlining (codegen
    * subexpression elimination does not rescue the repeated
    * split+filter trees — measured 4.5× the single-tokenize cost at
    * diversify-100×, BASELINE.md round 14); this is the same counts in
    * ONE tokenize pass + one char scan. Semantics pinned to the HOF
    * originals bit-for-bit: n_chars = length(text) (code points),
    * n_punct = occurrences of [.,!?;:] (the explicit class punctRatio
    * uses), tokens = [[tokenize]] (trim → UTF8String.toLowerCase →
    * java-regex \s+ split → drop empties), marker hits = exact string
    * equality against the lower-cased token (isin semantics).
    */
  def langQualityProfile(text: UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    var punct = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.' || c == ',' || c == '!' || c == '?' || c == ';' ||
        c == ':') punct += 1
      i += 1
    }
    val nChars = s.codePointCount(0, s.length)
    val toks = tokenize(text)
    var en = 0; var fr = 0; var es = 0; var de = 0
    i = 0
    while (i < toks.length) {
      val t = toks(i)
      // the four marker sets are 6 short literals each — a chain of
      // equality checks beats hashing for strings this short
      t match {
        case "the" | "and" | "of" | "to" | "a" | "in" => en += 1
        case _ => ()
      }
      t match {
        case "le" | "la" | "et" | "les" | "des" => fr += 1
        case "un" => fr += 1; es += 1 // "un" is in BOTH marker lists
        case _ => ()
      }
      t match {
        case "el" | "los" | "que" | "y" | "de" => es += 1
        case _ => ()
      }
      t match {
        case "der" | "die" | "und" | "das" | "ein" | "zu" => de += 1
        case _ => ()
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      nChars, punct, toks.length, en, fr, es, de)
  }

  /** Per-doc repetition counts in one pass — (n_tokens, top token
    * count, bigram count, distinct bigram count), the four inputs of
    * the Gopher-style repetition signals. Replaces the explode + two
    * keyed aggregations + join formulation (Curation
    * .repetitionStatsShuffled, the parity reference): the signals are
    * per-DOCUMENT, so they are a map, not a shuffle.
    */
  def repetitionCounts(tokens: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = tokens.numElements()
    val cnt = new java.util.HashMap[UTF8String, Integer](n * 2)
    var top = 0
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      val prev = cnt.get(t)
      val c = if (prev == null) 1 else prev.intValue() + 1
      cnt.put(t, Integer.valueOf(c))
      if (c > top) top = c
      i += 1
    }
    var nBi = 0L
    var nDis = 0L
    if (n >= 2) {
      val bis = new java.util.HashSet[String](n * 2)
      i = 0
      while (i < n - 1) {
        val sb = new java.lang.StringBuilder()
        sb.append(tokens.getUTF8String(i)).append(' ')
          .append(tokens.getUTF8String(i + 1))
        bis.add(sb.toString)
        i += 1
      }
      nBi = (n - 1).toLong
      nDis = bis.size.toLong
    }
    org.apache.spark.sql.catalyst.InternalRow(n.toLong, top.toLong, nBi, nDis)
  }

  /** Distinct word n-grams joined by single spaces, first-occurrence
    * order — identical to TextFunctions.shingles
    * (array_distinct(transform(sequence, concat_ws(slice)))).
    */
  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val nTok = tokens.numElements()
    if (nTok < n) return new GenericArrayData(new Array[AnyRef](0))
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= nTok - n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(i + j).toString)
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  /** Intersection size of two SORTED string arrays by linear merge —
    * no per-row hash set, no boxing. Callers must pass arrays sorted in
    * UTF8String binary order (Spark's array_sort order for strings);
    * unsorted input silently undercounts, so this stays behind
    * operators that sort by construction.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      // null elements can't match anything — skip (array_sort puts them
      // last, so for sorted input this just drains the tail); without
      // the guard a containsNull=true input NPEs mid-merge
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  /** 27-bin char-frequency histogram (a-z + space) in ONE pass over the
    * UTF-8 bytes — the count-filtering signature for edit-distance joins
    * (Gravano et al., VLDB 2001). ASCII letters never collide with UTF-8
    * continuation bytes (all ≥ 0x80), so byte-level counting is exact for
    * any input. Bins: 0..25 = 'a'..'z', 26 = ' '.
    */
  def charHist27(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val counts = new Array[Int](27)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') counts(b - 'a') += 1
      else if (b == ' ') counts(26) += 1
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  /** L1 distance between two int arrays by a primitive loop — the
    * per-candidate count-filter check, codegen'd with no boxing and no
    * higher-order-function interpretation. Lengths must match (both sides
    * come from charHist27); extra elements on either side are ignored.
    */
  def l1Dist(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var d = 0
    while (i < n) { d += math.abs(a.getInt(i) - b.getInt(i)); i += 1 }
    d
  }

  /** Hash-feature linear score: Σ_token w[bucket(token)] in array order,
    * where bucket = first 8 md5 hex digits as a long, mod w.length — the
    * same engine-independent md5 draw every sampler/LSH op here uses (the
    * DuckDB twin is `('0x' || substr(md5(tok), 1, 8))::BIGINT % dim`).
    * One static call per doc; the weight table rides the codegen
    * references, so scoring a document is a tight primitive loop.
    */
  def hashFeatureSum(tokens: ArrayData, w: Array[Double]): Double = {
    val n = tokens.numElements()
    val dim = w.length
    var i = 0
    var s = 0.0
    while (i < n) {
      val hex = md5Hex(tokens.getUTF8String(i).getBytes)
      val h = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      s += w((h % dim).toInt)
      i += 1
    }
    s
  }

  /** Merges-driven BPE token count over a word-token array: each word
    * decomposes to code points, then every (left, right) rule applies IN
    * PRIORITY ORDER as a literal, leftmost, non-overlapping adjacent
    * replacement — the single in-order pass that replays BPE training
    * segmentation (on training-derived merges this coincides with the
    * GPT-2 iterated lowest-rank formulation, because each rule's parts
    * exist exactly when training created them). Words ride a U+0001
    * token separator so a rule is one literal String.replace of
    * "left<SEP>right" → "leftright", bit-identical to the DuckDB
    * oracle's replace() fold; the word's token count is separators + 1.
    *
    * `pats`/`reps` are the precompiled pattern/replacement strings (see
    * BpeMergeCount); the arrays ride the task closure once — at 50k
    * real-vocab merges swap the per-word rule scan for the rank-map
    * iteration, same contract.
    */
  def bpeMergeCount(tokens: ArrayData, pats: Array[String],
                    reps: Array[String]): Int = {
    var total = 0
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      val s = mergeWord(tokens.getUTF8String(t).toString, pats, reps)
      var c = 1; var p = 0
      while (p < s.length) { if (s.charAt(p) == '\u0001') c += 1; p += 1 }
      total += c
      t += 1
    }
    total
  }

  /** Merges-driven BPE SEGMENTATION: the pieces themselves, flattened
    * across words in document order — `bpeMergeCount` is exactly
    * `bpeMergeSegment(...).numElements()`, one definition of the merge
    * replay serves both (this is the tokenizer surface an id-mapping
    * join consumes).
    */
  def bpeMergeSegment(tokens: ArrayData, pats: Array[String],
                      reps: Array[String]): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      val s = mergeWord(tokens.getUTF8String(t).toString, pats, reps)
      var start = 0
      var p = 0
      while (p <= s.length) {
        if (p == s.length || s.charAt(p) == '\u0001') {
          out += UTF8String.fromString(s.substring(start, p))
          start = p + 1
        }
        p += 1
      }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** One word through the in-order merge replay; pieces separated by
    * U+0001. Shared by count and segment. */
  private def mergeWord(word: String, pats: Array[String],
                        reps: Array[String]): String = {
    val sb = new java.lang.StringBuilder(word.length * 2)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      if (i > 0) sb.append('\u0001')
      sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    var s = sb.toString
    var r = 0
    while (r < pats.length) {
      if (s.indexOf(pats(r)) >= 0) s = s.replace(pats(r), reps(r))
      r += 1
    }
    s
  }

  /** Winnowing fingerprint values (Schleimer et al., SIGMOD'03) over a
    * token array: positional k-gram md5-prefix hashes, min of each
    * w-hash window (global min when fewer than w hashes), first-
    * occurrence-distinct — BIT-IDENTICAL to the HOF formulation in
    * Dedup.winnowFingerprints (conv(substring(md5(gram),1,8),16,10) and
    * Spark's array_distinct order) and to the DuckDB oracle's values.
    * One JVM call per row replaces w array-slice lambdas per window
    * re-entering the expression interpreter. Returns an empty array for
    * docs under k tokens (callers filter, matching the HOF path).
    */
  def winnowFps(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val ng = n - k + 1
    val sep = UTF8String.fromString(" ")
    val hs = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      val hex = md5Hex(UTF8String.concatWs(sep, parts: _*).getBytes)
      hs(i) = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      i += 1
    }
    val out = new java.util.LinkedHashSet[Long]()
    if (ng < w) {
      var m = hs(0); var t = 1
      while (t < ng) { if (hs(t) < m) m = hs(t); t += 1 }
      out.add(m)
    } else {
      // O(ng·w) direct scan: w is a small constant (4-16) and the branch
      // is predictable — a deque would only help for large w
      var s = 0
      while (s + w <= ng) {
        var m = hs(s); var t = s + 1
        while (t < s + w) { if (hs(t) < m) m = hs(t); t += 1 }
        out.add(m)
        s += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    new GenericArrayData(arr)
  }

  /** Within-doc self-repeat stripping kernel: tokens NOT dropped by the
    * repeated-span rule — a position is dropped iff it is covered by a
    * LATER occurrence of a w-token span that also occurs earlier in the
    * SAME doc, and is not covered by any FIRST occurrence of its spans
    * (first-occurrence coverage protects the kept copy). Bit-identical
    * to the shuffled DataFrame formulation it replaces
    * (Dedup.stripSelfRepeatsShuffled — parity-pinned in DedupSpec) and
    * to the DuckDB oracle.
    *
    * Everything is per-document, so the whole operator is ONE map over
    * the corpus: O(n·w) span hashing + O(n) coverage marking per doc,
    * no shuffle at any scale — where the DataFrame formulation paid ~10
    * corpus-sized exchanges (explode → groupBy → join → anti-join →
    * collect_list). Docs under w tokens have no spans and pass through
    * whole.
    */
  def selfRepeatKeep(tokens: ArrayData, w: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < w) return tokens.copy() // no spans — every token kept
    val ns = n - w + 1
    val sep = UTF8String.fromString(" ")
    val keys = new Array[UTF8String](ns)
    var i = 0
    while (i < ns) {
      val parts = new Array[UTF8String](w)
      var j = 0
      while (j < w) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      keys(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    // span string -> (first start << 32 | occurrence count); starts
    // ascend, so first insert pins the min start
    val m = new java.util.HashMap[UTF8String, java.lang.Long](ns * 2)
    i = 0
    while (i < ns) {
      val prev = m.get(keys(i))
      if (prev == null) m.put(keys(i), (i.toLong << 32) | 1L)
      else m.put(keys(i), prev + 1L)
      i += 1
    }
    val laterCov = new Array[Boolean](n)
    val firstCov = new Array[Boolean](n)
    i = 0
    while (i < ns) {
      val packed = m.get(keys(i)).longValue()
      if ((packed & 0xffffffffL) >= 2L) {
        val cov = if (i == (packed >>> 32).toInt) firstCov else laterCov
        var p = i
        while (p < i + w) { cov(p) = true; p += 1 }
      }
      i += 1
    }
    var kept = 0
    var p = 0
    while (p < n) { if (!laterCov(p) || firstCov(p)) kept += 1; p += 1 }
    val out = new Array[Any](kept)
    p = 0
    var o = 0
    while (p < n) {
      // clone: the input array may alias a reused row buffer
      if (!laterCov(p) || firstCov(p)) {
        out(o) = tokens.getUTF8String(p).clone(); o += 1
      }
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Positional drop: tokens whose 0-based position is NOT in `drop` —
    * the per-doc tail of cross-doc span removal (Dedup.stripDupSpans).
    * Replaces the token-level posexplode → (id,pos) anti-join →
    * collect_list reassembly with one array op per doc: the only rows
    * that still shuffle are the dropped POSITIONS (∝ duplicated
    * content), never the token stream. Out-of-range or repeated drop
    * entries are ignored (the shuffled formulation's anti-join tested
    * existence, so duplicates were harmless there too).
    */
  def keepExcept(tokens: ArrayData, drop: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val nd = drop.numElements()
    if (nd == 0 || n == 0) return tokens.copy()
    val mask = new Array[Boolean](n)
    var dropped = 0
    var i = 0
    while (i < nd) {
      val p = drop.getInt(i)
      if (p >= 0 && p < n && !mask(p)) { mask(p) = true; dropped += 1 }
      i += 1
    }
    val out = new Array[Any](n - dropped)
    var o = 0
    i = 0
    while (i < n) {
      // clone: the input array may alias a reused row buffer
      if (!mask(i)) { out(o) = tokens.getUTF8String(i).clone(); o += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  // Deflater construction does native zlib setup; reset() re-arms an
  // existing stream, so one per thread. Fixed level (6) pins the output
  // length for a given zlib — the ratio is deterministic per runtime.
  private val deflater: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() =>
      new java.util.zip.Deflater(6, /* nowrap = */ true))

  /** DEFLATE compression ratio (compressed bytes / raw UTF-8 bytes,
    * rounded to 6 dp) — the Gopher/CCNet-family entropy signal: natural
    * prose sits around 0.3-0.6, keyword-stuffed or boilerplate text
    * compresses far below it, and random/encrypted bytes land near (or
    * above) 1.0. Empty text reports 1.0 (no evidence of redundancy).
    * Raw deflate (nowrap) excludes the 6-byte zlib header/checksum so
    * short strings aren't dominated by framing.
    */
  /** Unicode NFC normalization — the canonical-composition pass every
    * multilingual corpus runs before hashing/dedup: "é" as one code
    * point and "e"+combining-acute are the SAME text but different
    * bytes, so un-normalized fingerprints split identical documents.
    * java.text.Normalizer implements the Unicode spec, as does DuckDB's
    * nfc_normalize (utf8proc) — identical outputs, so this is
    * oracle-exact.
    */
  def nfcNormalize(text: UTF8String): UTF8String = {
    val s = text.toString
    // the common case (already-NFC ASCII/Latin) skips the rewrite
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  def deflateRatio(text: UTF8String): Double = {
    val bytes = text.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    math.rint(total.toDouble / bytes.length * 1e6) / 1e6
  }
}

/** simhash60(tokens: array<string>): bigint — native 60-bit SimHash. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"
  override def nullSafeEval(a: Any): Any =
    TextHashOps.simhash60(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.simhash60($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** simhash60_tail(tokens: array<string>): bigint — the md5-digit-16-30
  * half of the 120-bit wide SimHash (see TextHashOps.simhash60Tail).
  */
case class SimHash60Tail(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash60_tail requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60_tail"
  override def nullSafeEval(a: Any): Any =
    TextHashOps.simhash60Tail(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.simhash60Tail($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** minhash_sig(shingles: array<string>, k): array<string>. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(a: Any): Any =
    TextHashOps.minhashSignature(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashOps.minhashSignature($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** lsh_band_keys(shingles: array<string>, bands, r): array<string>. */
case class LshBandKeys(child: Expression, bands: Int, r: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"lsh_band_keys requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"
  override def nullSafeEval(a: Any): Any =
    TextHashOps.lshBandKeys(a.asInstanceOf[ArrayData], bands, r)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashOps.lshBandKeys($c, $bands, $r)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** word_shingles(tokens: array<string>, n): array<string>. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override def nullSafeEval(a: Any): Any =
    TextHashOps.shingles(a.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.shingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** winnow_fps(tokens: array<string>, k, w): array<bigint> — native
  * winnowing fingerprints (see TextHashOps.winnowFps).
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    // k/w arrive as SQL literals through the winnow_fps registration:
    // validate at analysis, not as an index error mid-job
    if (k < 1 || w < 1) TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires k >= 1 and w >= 1, got k=$k, w=$w")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"winnow_fps requires array<string>, got ${dt.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"
  override def nullSafeEval(a: Any): Any =
    TextHashOps.winnowFps(a.asInstanceOf[ArrayData], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.winnowFps($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** self_repeat_keep(tokens: array<string>, w): array<string> — tokens
  * surviving within-doc repeated-span stripping (see
  * TextHashOps.selfRepeatKeep). One JVM call per row replaces the
  * explode/groupBy/anti-join pipeline — the operator that makes
  * stripSelfRepeats shuffle-free.
  */
case class SelfRepeatKeep(child: Expression, w: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (w < 1) TypeCheckResult.TypeCheckFailure(
      s"self_repeat_keep requires w >= 1, got w=$w")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"self_repeat_keep requires array<string>, got ${dt.catalogString}")
    }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "self_repeat_keep"
  override def nullSafeEval(a: Any): Any =
    TextHashOps.selfRepeatKeep(a.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.selfRepeatKeep($c, $w)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** repetition_counts(tokens: array<string>): struct<n_tokens bigint,
  * top_cnt bigint, n_bigrams bigint, n_distinct bigint> — per-doc
  * repetition count signals (see TextHashOps.repetitionCounts).
  */
case class RepetitionCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"repetition_counts requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))
  override def prettyName: String = "repetition_counts"
  override def nullSafeEval(a: Any): Any =
    TextHashOps.repetitionCounts(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashOps.repetitionCounts($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** keep_except(tokens: array<string>, drop: array<int>): array<string> —
  * positional drop (see TextHashOps.keepExcept).
  */
case class KeepExcept(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"keep_except requires (array<string>, array<int>), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = left.dataType
  override def prettyName: String = "keep_except"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashOps.keepExcept(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHashOps.keepExcept($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** text_stats(text): struct<n_tokens int, avg_word_len double, fp string>
  * — one tokenizer pass feeding three stats (the HOF formulation
  * re-tokenizes per stat after CollapseProject inlining).
  */
case class TextStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"text_stats requires string, got ${dt.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("avg_word_len", DoubleType, nullable = false),
    StructField("fp", StringType, nullable = false)))
  override def prettyName: String = "text_stats"
  override def nullSafeEval(a: Any): Any =
    TextHashOps.tokenStats(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.tokenStats($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** lang_quality_profile(text): struct<n_chars int, n_punct int,
  * n_tokens int, en int, fr int, es int, de int> — one tokenize pass
  * feeding every extract-stage signal (see
  * TextHashOps.langQualityProfile).
  */
case class LangQualityProfile(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"lang_quality_profile requires string, got ${dt.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("en", IntegerType, nullable = false),
    StructField("fr", IntegerType, nullable = false),
    StructField("es", IntegerType, nullable = false),
    StructField("de", IntegerType, nullable = false)))
  override def prettyName: String = "lang_quality_profile"
  override def nullSafeEval(a: Any): Any =
    TextHashOps.langQualityProfile(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashOps.langQualityProfile($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** deflate_ratio(text: string): double — compression-ratio entropy
  * signal (see TextHashOps.deflateRatio). Not oracle-able: DuckDB ships
  * no zlib SQL surface, so queries over it are rows-only checked; the
  * spec pins behavior on constructed low/high-entropy fixtures instead.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio requires string, got ${dt.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"
  override def nullSafeEval(a: Any): Any =
    TextHashOps.deflateRatio(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.deflateRatio($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** nfc_normalize(text string): string — Unicode canonical composition
  * (see TextHashOps.nfcNormalize). Same name and semantics as DuckDB's
  * built-in, so oracle SQL reads identically.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${dt.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(a: Any): Any =
    TextHashOps.nfcNormalize(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.nfcNormalize($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** sorted_intersect_count(a: array<string>, b: array<string>): int —
  * linear-merge intersection size; BOTH inputs must be sorted (see
  * TextHashOps.sortedIntersectCount).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<string>, got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashOps.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHashOps.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** hash_feature_sum(tokens: array<string>): double — Σ w[md5-bucket(tok)]
  * under the weight vector bound at construction (see
  * TextHashOps.hashFeatureSum). The model is dim doubles — broadcast-safe
  * by definition; it rides the codegen references like the BPE merge
  * tables do.
  */
case class HashFeatureSum(child: Expression, weights: Array[Double])
    extends UnaryExpression {
  require(weights.nonEmpty, "hash_feature_sum needs a non-empty weight vector")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"hash_feature_sum requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hash_feature_sum"
  override def nullSafeEval(a: Any): Any =
    TextHashOps.hashFeatureSum(a.asInstanceOf[ArrayData], weights)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("hashFeatureWeights", weights, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashOps.hashFeatureSum($c, $wRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** char_hist27(text: string): array<int> — one-pass 27-bin character
  * histogram (see TextHashOps.charHist27). Compute once per DOC, never
  * per pair.
  */
case class CharHist27(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"char_hist27 requires string, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "char_hist27"
  override def nullSafeEval(a: Any): Any =
    TextHashOps.charHist27(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.charHist27($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** l1_dist(a: array<int>, b: array<int>): int — element-wise L1 distance
  * by primitive loop (see TextHashOps.l1Dist); the codegen'd form of
  * `aggregate(zip_with(a, b, |x−y|), 0, +)`, which re-enters the
  * expression interpreter per element. Null ELEMENTS are rejected at
  * analysis (both inputs must be containsNull=false, as charHist27's
  * output is) so the primitive getInt loop can't mis-read a null slot.
  */
case class L1Dist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, false), ArrayType(IntegerType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"l1_dist requires two array<int> without null elements, got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "l1_dist"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashOps.l1Dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHashOps.l1Dist($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** bpe_merge_count(tokens: array<string>): int — merges-driven BPE token
  * count (see TextHashOps.bpeMergeCount). The merge table is bound at
  * construction; pattern/replacement strings precompile once and ride
  * the codegen references, so per row the generated code is a single
  * static call.
  */
case class BpeMergeCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  require(merges.forall { case (a, b) => a.nonEmpty && b.nonEmpty },
    "every BPE merge rule needs non-empty left and right parts")
  @transient private lazy val pats: Array[String] =
    merges.map { case (a, b) => a + "\u0001" + b }.toArray
  @transient private lazy val reps: Array[String] =
    merges.map { case (a, b) => a + b }.toArray
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge_count requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_merge_count"
  override def nullSafeEval(a: Any): Any =
    TextHashOps.bpeMergeCount(a.asInstanceOf[ArrayData], pats, reps)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patsRef = ctx.addReferenceObj("bpePats", pats, "java.lang.String[]")
    val repsRef = ctx.addReferenceObj("bpeReps", reps, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashOps.bpeMergeCount($c, $patsRef, $repsRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** bpe_merge_segment(tokens: array<string>): array<string> — the BPE
  * pieces themselves under the bound merge table (see
  * TextHashOps.bpeMergeSegment). Count == size(segment) by construction.
  */
case class BpeMergeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  require(merges.forall { case (a, b) => a.nonEmpty && b.nonEmpty },
    "every BPE merge rule needs non-empty left and right parts")
  @transient private lazy val pats: Array[String] =
    merges.map { case (a, b) => a + "\u0001" + b }.toArray
  @transient private lazy val reps: Array[String] =
    merges.map { case (a, b) => a + b }.toArray
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge_segment requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_merge_segment"
  override def nullSafeEval(a: Any): Any =
    TextHashOps.bpeMergeSegment(a.asInstanceOf[ArrayData], pats, reps)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patsRef = ctx.addReferenceObj("bpePats", pats, "java.lang.String[]")
    val repsRef = ctx.addReferenceObj("bpeReps", reps, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashOps.bpeMergeSegment($c, $patsRef, $repsRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextHashExpressions {
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def charHist27(text: Column): Column =
    GraftSqlBridge.column(CharHist27(GraftSqlBridge.expression(text)))
  def hashFeatureSum(tokens: Column, weights: Array[Double]): Column =
    GraftSqlBridge.column(HashFeatureSum(
      GraftSqlBridge.expression(tokens), weights))
  def l1Dist(a: Column, b: Column): Column =
    GraftSqlBridge.column(L1Dist(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def bpeMergeCount(tokens: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeMergeCount(
      GraftSqlBridge.expression(tokens), merges))
  def bpeMergeSegment(tokens: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeMergeSegment(
      GraftSqlBridge.expression(tokens), merges))
  def simhash60(tokens: Column): Column =
    GraftSqlBridge.column(SimHash60(GraftSqlBridge.expression(tokens)))
  def simhash60Tail(tokens: Column): Column =
    GraftSqlBridge.column(SimHash60Tail(GraftSqlBridge.expression(tokens)))
  def deflateRatio(text: Column): Column =
    GraftSqlBridge.column(DeflateRatio(GraftSqlBridge.expression(text)))
  def nfcNormalize(text: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(text)))
  def textStats(text: Column): Column =
    GraftSqlBridge.column(TextStats(GraftSqlBridge.expression(text)))
  def langQualityProfile(text: Column): Column =
    GraftSqlBridge.column(LangQualityProfile(GraftSqlBridge.expression(text)))
  def minhashSig(shingles: Column, k: Int): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(shingles), k))
  def lshBandKeys(shingles: Column, bands: Int, r: Int): Column =
    GraftSqlBridge.column(LshBandKeys(GraftSqlBridge.expression(shingles), bands, r))
  def wordShingles(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(tokens), n))
  def winnowFps(tokens: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowFps(GraftSqlBridge.expression(tokens), k, w))
  def selfRepeatKeep(tokens: Column, w: Int): Column =
    GraftSqlBridge.column(SelfRepeatKeep(GraftSqlBridge.expression(tokens), w))
  def keepExcept(tokens: Column, drop: Column): Column =
    GraftSqlBridge.column(KeepExcept(
      GraftSqlBridge.expression(tokens), GraftSqlBridge.expression(drop)))
  def repetitionCounts(tokens: Column): Column =
    GraftSqlBridge.column(RepetitionCounts(GraftSqlBridge.expression(tokens)))
}
