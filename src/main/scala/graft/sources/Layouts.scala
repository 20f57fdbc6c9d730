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
}
