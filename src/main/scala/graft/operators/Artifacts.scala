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
  * semantics, same idiom as GraphMart's memo): a GC'd session's entries
  * vanish with it, so the registry itself can never pin a stopped
  * session. Duplicate pins of one canonical plan are harmless — Spark
  * dedupes the cache entry, and unpersist is idempotent on the plan.
  */
object Artifacts {

  /** The one storage level artifacts use: survives memory pressure by
    * spilling instead of recomputing a corpus-sized lineage.
    */
  val Level: StorageLevel = StorageLevel.MEMORY_AND_DISK

  private val reg =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.ListBuffer[(String, DataFrame)]]()

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
      _ => scala.collection.mutable.ListBuffer.empty) += ((label, df))
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

  /** Unpersist every artifact registered for `spark` and clear its
    * registry; returns how many were released. Non-blocking unpersist:
    * the sweep is a lifetime bound, not a latency-critical path.
    * Idempotent — a released frame's second unpersist is a no-op.
    */
  def releaseAll(spark: SparkSession): Int = reg.synchronized {
    val entries = Option(reg.remove(spark))
      .map(_.toList).getOrElse(List.empty)
    entries.foreach { case (_, df) =>
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () } // a stopped context has nothing to free
    }
    entries.size
  }
}
