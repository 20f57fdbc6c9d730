package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry for pinned "trained artifact" frames — the
  * small persisted tables the round-13 reworks introduced (bigram LM
  * model, LSH candidate pairs, fuzzy-verify pair sets, wide-simhash
  * sketch, TF-IDF tf table, DSIR count model).
  *
  * Why it exists: those artifacts are deliberately SESSION-LIVED —
  * Spark's CacheManager dedupes repeat pins of the same canonical plan,
  * so a bench loop re-running a query amortizes the training cost, the
  * accepted posture (GraphMart precedent). But session-lived with NO
  * release handle is unbounded growth: every DISTINCT input (per-batch
  * calls in an incremental pipeline) pins another frame until the
  * session dies, and on a memory-tight executor that is GC pressure
  * long before it is an OOM (MEMORY_AND_DISK spills, it doesn't fail).
  * This registry gives the artifacts an EXPLICIT lifetime: operators
  * pin through it, callers (or the suite harness — Verify and Bench
  * sweep at suite end) release through it.
  *
  * Registration is keyed WEAKLY by the session object (identity
  * semantics, same idiom as GraphMart's memo) and the frames are held
  * through WeakReferences: a DataFrame strongly references its session
  * (Dataset → QueryExecution → SparkSession), so strong values would
  * void the weak keys — the exact value-refers-to-key case the
  * WeakHashMap contract warns about — and the registry itself would
  * pin every dropped session forever. With weak values, releaseAll
  * frees every artifact the caller can still reach; an artifact whose
  * LAST handle was dropped without release is beyond anyone's
  * unpersist (the plan handle is gone) and falls to the session cache's
  * LRU — spill-safe at MEMORY_AND_DISK — dying with the session. The
  * property the weakness buys is the important one: the registry never
  * keeps a dead session (or its cached data) alive. Duplicate pins of
  * one canonical plan are harmless — Spark dedupes the cache entry,
  * and unpersist is idempotent on the plan.
  */
object Artifacts {

  /** The one storage level artifacts use: survives memory pressure by
    * spilling instead of recomputing a corpus-sized lineage.
    */
  val Level: StorageLevel = StorageLevel.MEMORY_AND_DISK

  private val reg =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.ListBuffer[
        (String, java.lang.ref.WeakReference[DataFrame])]]()

  /** Persist `df` at [[Level]] and register it under `label` for its
    * session. LAZY: the cache fills on first action — right when a
    * downstream bounded read (scalar head(), count of a consumer) is
    * the materializer, or when eager fill would re-pay the build on
    * repeat calls that hit the plan cache (the measured 3× bench-loop
    * regression, BASELINE.md round 13).
    */
  def pin(df: DataFrame, label: String): DataFrame = reg.synchronized {
    df.persist(Level)
    reg.computeIfAbsent(df.sparkSession,
      _ => scala.collection.mutable.ListBuffer.empty) +=
      ((label, new java.lang.ref.WeakReference(df)))
    df
  }

  /** [[pin]] + eager fill (count()). Use when multiple consumers share
    * no single action, so a lazy cache would race: each consumer's
    * first pass re-runs the lineage (measured 2-4× on the verify
    * paths). count() on an already-cached canonical plan is a cache
    * scan, not a re-build, so repeat calls stay cheap.
    */
  def pinEager(df: DataFrame, label: String): DataFrame = {
    val p = pin(df, label)
    p.count()
    p
  }

  /** Labels currently registered for `spark` (diagnostics + specs). */
  def registered(spark: SparkSession): Seq[String] = reg.synchronized {
    Option(reg.get(spark)).map(_.map(_._1).toSeq).getOrElse(Seq.empty)
  }

  /** Unpersist every still-reachable artifact registered for `spark`
    * and clear its registry; returns how many were released (GC-cleared
    * references are dropped silently — their plan handle is gone, see
    * the class docs). Non-blocking unpersist: the sweep is a lifetime
    * bound, not a latency-critical path. Idempotent — a released
    * frame's second unpersist is a no-op.
    */
  def releaseAll(spark: SparkSession): Int = reg.synchronized {
    val entries = Option(reg.remove(spark))
      .map(_.toList).getOrElse(List.empty)
    val live = entries.flatMap { case (_, ref) => Option(ref.get) }
    live.foreach { df =>
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () } // a stopped context has nothing to free
    }
    live.size
  }
}
