package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-layout helpers: the two levers that keep 100 TB readable —
  * partition pruning (skip files) and bucketing (skip shuffles).
  */
object Layouts {

  /** Write partitioned by the given columns (hive-style directories).
    * Readers filtering on a partition column scan only matching
    * directories — the plan shows the predicate under PartitionFilters
    * instead of reading all files (see LayoutsSpec).
    *
    * Partition columns should be low-cardinality (day, region, source);
    * high-cardinality partitioning produces millions of tiny files and
    * kills the file index.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Write as a bucketed+sorted managed table: `buckets` files per
    * partition, rows hash-distributed by `bucketCol` and sorted within.
    * Two tables bucketed the same way join WITHOUT a shuffle (and with
    * sorted-merge ready input) — the pre-paid exchange, amortized over
    * every subsequent join. This is how repeated fact⋈fact joins at
    * 100 TB avoid re-shuffling petabytes per query.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two identically-bucketed tables on the bucket column — plan
    * contains no Exchange for the join (see LayoutsSpec assertion).
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Partitioned write with rows SORTED within each task/file
    * (`sortWithinPartitions` — no global sort, no extra shuffle). Sorted
    * files give parquet row-group min/max stats that actually prune:
    * a reader filtering `ts BETWEEN a AND b` skips whole row groups,
    * and downstream sequential consumers (training-data loaders) get
    * time-ordered streams without re-sorting.
    */
  def writeSortedPartitioned(df: DataFrame, path: String,
                             partitionCols: Seq[String],
                             sortCols: Seq[String]): Unit =
    df.sortWithinPartitions((partitionCols ++ sortCols).map(
        org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Z-order (Morton) interleave key over up to four integral columns,
    * each quantized to `bitsPerCol` bits against caller-supplied [min,
    * max] bounds. Sorting/clustering files by this key gives parquet
    * row-group min/max stats that prune on EVERY participating column —
    * the multi-dimensional analogue of `writeSortedPartitioned`'s
    * single-column clustering (what table formats call OPTIMIZE ZORDER).
    * Built from shiftleft/bitwiseOR only, so it stays inside whole-stage
    * codegen.
    *
    * Bounds are explicit because normalization needs them and a scan to
    * discover them would hide a job inside an expression; at scale they
    * come from table stats. Values outside the bounds clamp.
    */
  def zorderKey(colsWithBounds: Seq[(org.apache.spark.sql.Column, Long, Long)],
                bitsPerCol: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{greatest => fGreatest, least => fLeast, lit, shiftleft, shiftright, floor}
    require(colsWithBounds.nonEmpty && colsWithBounds.size <= 4,
      "zorderKey: 1-4 columns")
    require(bitsPerCol * colsWithBounds.size <= 62,
      s"zorderKey: ${colsWithBounds.size} cols × $bitsPerCol bits overflow a long")
    val k = colsWithBounds.size
    val levels = (1L << bitsPerCol) - 1
    // quantize each column to [0, 2^bits)
    val q = colsWithBounds.map { case (c, lo, hi) =>
      require(hi > lo, s"zorderKey: empty bound [$lo, $hi]")
      // hi - lo wraps negative past Long.MaxValue even when hi > lo —
      // garbage keys with no error; reject rather than silently unsort
      require(hi - lo > 0,
        s"zorderKey: bound width [$lo, $hi] overflows Long — narrow the bounds")
      val clamped = fLeast(fGreatest(c.cast("long"), lit(lo)), lit(hi))
      floor(((clamped - lit(lo)).cast("double") / lit((hi - lo).toDouble))
        * lit(levels.toDouble)).cast("long")
    }
    // interleave: output bit (b*k + i) = bit b of column i
    val terms = for {
      b <- 0 until bitsPerCol
      i <- 0 until k
    } yield shiftleft(shiftright(q(i), b).bitwiseAND(lit(1L)), b * k + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Compact a small-file parquet dataset in place: rewrite each LEAF
    * data directory into ⌈bytes / targetFileBytes⌉ files. Streaming
    * sinks and incremental appends accrete thousands of KB-sized files
    * whose open/footer overhead eventually dominates scans — compaction
    * is the standing maintenance job every lakehouse runs.
    *
    * Hive-partitioned layouts are compacted PER PARTITION, preserving
    * the `col=value` directory tree (and therefore partition pruning and
    * later dynamic-partition overwrites): each leaf's files are read
    * without partition inference, coalesced, and swapped in place.
    * Flattening a partitioned table would silently break every reader —
    * the one-shot whole-dataset rewrite is only used for unpartitioned
    * layouts.
    *
    * Swap discipline per leaf (local/HDFS rename semantics): write the
    * compacted copy to a DOT-PREFIXED sibling (`.<leaf>.__compact_tmp` —
    * Spark's file listing ignores dot/underscore-prefixed paths, so
    * neither the tmp copy nor the set-aside old copy is ever visible to
    * a concurrent reader or mistaken for a partition directory), rename
    * the live dir aside to `.<leaf>.__compact_old`, rename tmp into
    * place, then delete the old copy. No reader ever sees a mix of old
    * and new files; the one bad crash window (between the two renames)
    * leaves nothing at the live path but the complete old copy
    * recoverable at the hidden `.…__compact_old`. Stale hidden dirs from
    * a crashed run are skipped by partition discovery and by this
    * method's own leaf scan. On object stores, where rename is not a
    * metadata operation, use a table format's commit protocol instead —
    * this is the filesystem-native variant.
    *
    * `coalesce` (not repartition) — merging files needs no shuffle, just
    * fewer write tasks reading multiple input splits each. Returns
    * (filesBefore, filesAfter) summed over leaves; leaves already at or
    * below their target count are left untouched (idempotent).
    */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    def dataFiles(dir: java.io.File): Array[java.io.File] =
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    def leafDirs(dir: java.io.File): Seq[java.io.File] = {
      val partChildren = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.contains("=") &&
          !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      if (partChildren.isEmpty) Seq(dir)
      else partChildren.toSeq.flatMap(leafDirs)
    }
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete(); ()
    }
    def swap(live: java.io.File, tmp: java.io.File): Unit = {
      val old = new java.io.File(live.getParentFile,
        "." + live.getName + ".__compact_old")
      if (old.exists()) deleteRec(old)
      if (!live.renameTo(old))
        throw new java.io.IOException(s"compact: rename $live aside failed")
      if (!tmp.renameTo(live)) {
        old.renameTo(live) // best-effort rollback to the intact old copy
        throw new java.io.IOException(s"compact: rename $tmp -> $live failed")
      }
      deleteRec(old)
    }
    var before = 0
    var after = 0
    leafDirs(new java.io.File(path)).foreach { leaf =>
      val files = dataFiles(leaf)
      before += files.length
      val targetFiles = math.max(1, math.ceil(
        files.map(_.length()).sum.toDouble / targetFileBytes).toInt)
      if (files.isEmpty || targetFiles >= files.length) after += files.length
      else {
        val tmp = new java.io.File(leaf.getParentFile,
          "." + leaf.getName + ".__compact_tmp")
        spark.read.parquet(leaf.toString).coalesce(targetFiles)
          .write.mode("overwrite").parquet(tmp.toString)
        swap(leaf, tmp)
        after += dataFiles(leaf).length
      }
    }
    (before, after)
  }
}
