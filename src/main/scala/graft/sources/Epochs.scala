package graft.sources

import org.apache.spark.sql.SparkSession

/** Maintenance for EPOCH-PARTITIONED merge-on-read datasets — the
  * `batch=<epoch>` layout every streaming sink here writes
  * (streamNearDups' corpus/index/pairs, the KMV/histogram/edge marts).
  *
  * Why this exists (measured, not hypothetical): the round-15 streamed
  * near-dup leg at 300× (BASELINE.md) found a real LINEAR history term —
  * per-epoch cost drifting 4.8 → 8.2 s while the accumulated band index
  * grew to 1.43M docs across 125 `batch=N` partitions, ~1.3-2.4 µs per
  * indexed doc per epoch, consistent across two fixture decades. The
  * mechanism is the merge-on-read FLOOR: every epoch's incremental probe
  * re-lists and re-opens one directory (and ≥1 parquet footer) per
  * historical epoch, so the floor grows with epoch COUNT even though the
  * probe join itself prunes to matching band keys. The fix named in that
  * measurement is this operator: periodically FOLD the committed epoch
  * partitions into one consolidated partition — fewer, larger files, a
  * bounded directory listing, identical rows.
  *
  * Semantics contract: fold is valid exactly for MERGE-ON-READ consumers
  * that treat `batch` as an opaque replay watermark, never as data — a
  * reader that filters on specific historical batch values would see
  * those values collapsed to the fold cutoff. All sinks in this repo
  * qualify: streamNearDups' history reads drop `batch` after excluding
  * only the CURRENT epoch (`batch =!= batchId`), and the marts are
  * order-independent unions/merges. Folding therefore never changes any
  * downstream result (EpochsSpec pins streamed-pairs parity end-to-end).
  *
  * Replay safety: Structured Streaming replays at most the LAST
  * uncommitted epoch, and `keepLast ≥ 1` (enforced) leaves the newest
  * `keepLast` partitions untouched — so the one partition a replayed
  * epoch must be able to exclude (its own crashed attempt) is never
  * folded, and every folded epoch is final. The fold collapses batches
  * 0..cutoff into the single partition `batch=<cutoff>`; cutoff is below
  * any live or future batchId, so the `=!= batchId` exclusion can never
  * match folded rows.
  *
  * Crash-safe swap protocol (single maintenance writer — the foreachBatch
  * loop or an offline job; local/HDFS rename semantics, same discipline
  * as [[Layouts.compact]]):
  *   1. write the folded copy to dot-prefixed `.batch=<cutoff>.__fold_tmp`
  *      (invisible to Spark's listing; Spark's own `_SUCCESS` marks it
  *      complete),
  *   2. rename every source dir `batch=N` → `.batch=N.__fold_old`,
  *   3. rename tmp into place as `batch=<cutoff>`,
  *   4. delete the aside copies.
  * Every crash point is recoverable from on-disk state alone, because
  * aside dirs are created only AFTER the tmp is complete and the fold
  * set (all batches ≤ cutoff) is derivable from the tmp's name:
  * [[recover]] runs first on every fold — an incomplete tmp (no
  * `_SUCCESS`) is discarded; a complete tmp finishes steps 2-4; asides
  * with no tmp mean step 3 completed, so they are swept. At no point can
  * rows be lost: either the originals are live, or a complete folded
  * copy plus the asides exist.
  *
  * At 100 TB this is the standing compaction job of the streaming lake:
  * run it every K epochs (streamNearDups' `compactEvery`) or nightly;
  * cost is one linear read+write of the folded history, amortized over
  * the K epochs whose floor it removes. On object stores (no atomic
  * rename) use a table format's commit protocol instead — this is the
  * filesystem-native variant, exactly like [[Layouts.compact]].
  */
object Epochs {

  /** Outcome of one [[fold]]: epochs folded (0 = nothing to do), and
    * the epoch-dir / data-file counts before and after.
    */
  final case class FoldStats(foldedEpochs: Int, dirsBefore: Int,
                             dirsAfter: Int, filesBefore: Int,
                             filesAfter: Int)

  private val TmpSuffix = ".__fold_tmp"
  private val OldSuffix = ".__fold_old"

  private def batchOf(name: String): Option[Long] =
    if (name.startsWith("batch=")) name.drop(6).toLongOption else None

  private def batchDirs(root: java.io.File): Seq[(Long, java.io.File)] =
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).toSeq
      .flatMap(d => batchOf(d.getName).map(_ -> d))
      .sortBy(_._1)

  private def dataFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(); ()
  }

  /** Complete or roll back a fold interrupted at any crash point; safe
    * (and cheap) to call when no fold is pending. Called by [[fold]]
    * before it looks at the layout, and callable directly after a
    * restart. Returns true if any pending state was found.
    */
  def recover(dir: String): Boolean = {
    val root = new java.io.File(dir)
    val hidden = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("."))
    val tmps = hidden.filter(_.getName.endsWith(TmpSuffix))
    val olds = hidden.filter(_.getName.endsWith(OldSuffix))
    if (tmps.isEmpty && olds.isEmpty) return false
    require(tmps.length <= 1,
      s"Epochs.recover: multiple pending fold tmps in $dir — " +
        "single-maintenance-writer contract violated")
    tmps.headOption match {
      case Some(tmp) if !new java.io.File(tmp, "_SUCCESS").exists() =>
        // crashed mid-write: originals untouched (asides are only created
        // after _SUCCESS), discard the partial copy
        deleteRec(tmp)
        require(olds.isEmpty, s"Epochs.recover: aside dirs next to an " +
          s"incomplete tmp in $dir — layout corrupted, refusing to guess")
      case Some(tmp) =>
        // complete copy: finish steps 2-4. Fold set = every live batch
        // dir at or below the cutoff encoded in the tmp's name.
        val cutoff = batchOf(tmp.getName.stripPrefix(".")
          .stripSuffix(TmpSuffix)).getOrElse(
          throw new IllegalStateException(
            s"Epochs.recover: unparsable fold tmp ${tmp.getName}"))
        batchDirs(root).filter(_._1 <= cutoff).foreach { case (_, d) =>
          val aside = new java.io.File(root, "." + d.getName + OldSuffix)
          if (aside.exists()) deleteRec(aside)
          if (!d.renameTo(aside)) throw new java.io.IOException(
            s"Epochs.recover: rename $d aside failed")
        }
        val live = new java.io.File(root, s"batch=$cutoff")
        if (!tmp.renameTo(live)) throw new java.io.IOException(
          s"Epochs.recover: rename $tmp -> $live failed")
        Option(root.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith(".") &&
            f.getName.endsWith(OldSuffix))
          .foreach(deleteRec)
      case None =>
        // asides but no tmp: the swap completed before the crash — the
        // folded partition is live, asides are redundant copies
        olds.foreach(deleteRec)
    }
    true
  }

  /** Fold all but the newest `keepLast` epoch partitions of `dir` into
    * the single partition `batch=<max folded epoch>`, rewritten as
    * ⌈bytes / targetFileBytes⌉ files. No-op (foldedEpochs = 0) when
    * fewer than two partitions are foldable — folding one partition
    * into itself is [[Layouts.compact]]'s per-leaf job, not this one.
    */
  def fold(spark: SparkSession, dir: String, keepLast: Int = 1,
           targetFileBytes: Long = 128L * 1024 * 1024): FoldStats = {
    require(keepLast >= 1,
      "Epochs.fold: keepLast must be >= 1 — the newest epoch must stay " +
        "unfolded so a replayed crashed attempt can exclude its own rows")
    recover(dir)
    val root = new java.io.File(dir)
    val dirs = batchDirs(root)
    val foldable = dirs.dropRight(keepLast)
    val filesBefore = dirs.map(d => dataFiles(d._2).length).sum
    if (foldable.length < 2)
      return FoldStats(0, dirs.length, dirs.length, filesBefore, filesBefore)
    val cutoff = foldable.last._1
    // read the fold set WITHOUT partition inference (paths point at the
    // leaf dirs) — the batch value is carried by the directory name the
    // tmp is renamed to, not by the file contents
    val src = spark.read.parquet(foldable.map(_._2.toString): _*)
    val bytes = foldable.flatMap(d => dataFiles(d._2)).map(_.length()).sum
    val targetFiles = math.max(1,
      math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = new java.io.File(root, s".batch=$cutoff$TmpSuffix")
    if (tmp.exists()) deleteRec(tmp)
    src.coalesce(targetFiles).write.mode("overwrite").parquet(tmp.toString)
    foldable.foreach { case (_, d) =>
      val aside = new java.io.File(root, "." + d.getName + OldSuffix)
      if (aside.exists()) deleteRec(aside)
      if (!d.renameTo(aside))
        throw new java.io.IOException(s"Epochs.fold: rename $d aside failed")
    }
    val live = new java.io.File(root, s"batch=$cutoff")
    if (!tmp.renameTo(live)) throw new java.io.IOException(
      s"Epochs.fold: rename $tmp -> $live failed")
    foldable.foreach { case (_, d) =>
      deleteRec(new java.io.File(root, "." + d.getName + OldSuffix))
    }
    val after = batchDirs(root)
    FoldStats(foldable.length, dirs.length, after.length, filesBefore,
      after.map(d => dataFiles(d._2).length).sum)
  }
}
