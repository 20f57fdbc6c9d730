package graft.telemetry

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-contract checks — the reference's dbt schema tests
  * (dbt_project/gpu_telemetry/models/silver/silver.yml:4-23,
  * models/gold/gold.yml:4-17) as fail-fast Spark assertions, run as a hard
  * gate like `dbt test` with check=True (flow_full_refresh.py:48-54).
  *
  * Each check is one aggregation returning a violation COUNT — never a
  * collect of rows — so the gate costs one pass over the table at any
  * scale. Catalyst does NOT fuse separate actions into one scan (each
  * collect/count is its own job), so `runAll` merges every table's
  * checks into a SINGLE aggregation action per table — three jobs /
  * three scans for the reference's six tests, asserted by PipelineSpec.
  */
object Checks {

  final case class Violation(table: String, check: String, count: Long) {
    override def toString = s"$table.$check: $count violation(s)"
  }

  final class CheckFailedException(val violations: Seq[Violation])
    extends RuntimeException(
      s"data-contract checks failed: ${violations.mkString("; ")}")

  /** count of NULLs per column, evaluated in ONE pass over df. */
  def notNullViolations(df: DataFrame, table: String,
                        cols: Seq[String]): Seq[Violation] = {
    val row = df.agg(
      count(lit(1)).as("_n"),
      cols.map(c => sum(col(c).isNull.cast("long")).as(c)): _*).collect()(0)
    cols.map(c => Violation(table, s"not_null($c)",
      Option(row.getAs[Long](c)).getOrElse(0L))).filter(_.count > 0)
  }

  /** number of key values appearing more than once. */
  def uniqueViolations(df: DataFrame, table: String,
                       keyCols: Seq[String]): Seq[Violation] = {
    val dups = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_n")).filter(col("_n") > 1).count()
    if (dups > 0) Seq(Violation(table, s"unique(${keyCols.mkString(",")})", dups))
    else Nil
  }

  /** dbt `accepted_values` shape: rows whose column value falls outside
    * the accepted set. NULLs are not violations here (that is
    * `not_null`'s job — dbt separates the two the same way).
    */
  def acceptedValuesViolations(df: DataFrame, table: String, colName: String,
                               accepted: Seq[String]): Seq[Violation] = {
    val n = df.filter(col(colName).isNotNull &&
      !col(colName).isin(accepted: _*)).count()
    if (n > 0) Seq(Violation(table, s"accepted_values($colName)", n)) else Nil
  }

  /** dbt `relationships` shape: child rows whose foreign key has no match
    * in the parent — a LEFT ANTI join on the key columns only (the
    * shuffle carries keys, never payloads; with a small parent Spark
    * broadcasts it and the child side stays unshuffled).
    */
  def relationshipViolations(child: DataFrame, childTable: String,
                             fkCol: String, parent: DataFrame,
                             pkCol: String): Seq[Violation] = {
    val orphans = child.select(col(fkCol)).filter(col(fkCol).isNotNull)
      .join(parent.select(col(pkCol).as(fkCol)).distinct(),
        Seq(fkCol), "left_anti")
      .count()
    if (orphans > 0)
      Seq(Violation(childTable, s"relationships($fkCol -> $pkCol)", orphans))
    else Nil
  }

  /** not_null over `notNullCols` AND unique over `keyCol` in ONE
    * aggregation action — one scan of df, one (partial-agg'd) shuffle on
    * the key. The per-key aggregate carries the null tallies up through
    * the final reduction, so adding the uniqueness check to a not_null
    * pass costs no extra pass. Violation labels/counts are identical to
    * running `notNullViolations` + `uniqueViolations` separately (null
    * keys group together: a null-key group of size > 1 counts as one
    * duplicate key, same as the standalone check).
    */
  def keyedTableViolations(df: DataFrame, table: String, keyCol: String,
                           notNullCols: Seq[String]): Seq[Violation] = {
    val others = notNullCols.filterNot(_ == keyCol)
    val grouped = df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("_n"),
      others.map(c => sum(col(c).isNull.cast("long")).as(c)): _*)
    val finalAggs =
      (if (notNullCols.contains(keyCol))
         Seq(sum(when(col(keyCol).isNull, col("_n")).otherwise(lit(0L)))
           .as(s"_null_$keyCol"))
       else Nil) ++
      others.map(c => sum(col(c)).as(s"_null_$c")) :+
      count(when(col("_n") > 1, lit(1))).as("_dups")
    val row = grouped.agg(finalAggs.head, finalAggs.tail: _*).collect()(0)
    def n(name: String): Long =
      Option(row.getAs[Long](name)).getOrElse(0L)
    notNullCols.flatMap { c =>
      val cnt = n(s"_null_$c")
      if (cnt > 0) Seq(Violation(table, s"not_null($c)", cnt)) else Nil
    } ++ {
      val dups = n("_dups")
      if (dups > 0) Seq(Violation(table, s"unique($keyCol)", dups)) else Nil
    }
  }

  /** The reference's six tests over our silver/gold tables. Throws
    * CheckFailedException on any violation (the dbt-test gate). Each
    * table's checks run as ONE aggregation action — three jobs, one
    * scan per table (the naive per-check layout was five jobs with
    * silver_jobs and gold each scanned twice).
    */
  def runAll(silverJobs: DataFrame, silverGpuTimeseries: DataFrame,
             goldClusterUtilDaily: DataFrame): Unit = {
    val v =
      keyedTableViolations(silverJobs, "silver_jobs", "job_id",
        Seq("job_id", "user_id")) ++
      notNullViolations(silverGpuTimeseries, "silver_gpu_timeseries",
        Seq("machine_id", "ts")) ++
      keyedTableViolations(goldClusterUtilDaily, "gold_cluster_util_daily",
        "dt", Seq("dt"))
    if (v.nonEmpty) throw new CheckFailedException(v)
  }

  /** ZERO-COST contract observability: attach row/null counters to a
    * frame with `Dataset.observe`, so the metrics ride the NEXT action's
    * job instead of a dedicated validation scan. The dedicated-scan
    * checks above are the gate (they can abort a pipeline); this is the
    * monitor — a production write emits its quality counters from the
    * write job itself, which at 100 TB is the difference between "free"
    * and "scan everything twice". Read `observation.get` AFTER an action
    * on the returned frame:
    *
    * {{{
    * val (df, obs) = Checks.observed(silver, "silver", Seq("job_id"))
    * df.write.parquet(out)                  // the one and only job
    * val nulls = obs.get("null_job_id")     // counters from that job
    * }}}
    *
    * Streaming twin: the same `observe` call on a streaming frame
    * surfaces the counters in every `StreamingQueryProgress.observedMetrics`
    * micro-batch report.
    */
  def observed(df: DataFrame, name: String, notNullCols: Seq[String])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val metrics = count(lit(1)).as("rows") +:
      notNullCols.map(c => sum(col(c).isNull.cast("long")).as(s"null_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** SCHEMA drift between two snapshots of a table — the metadata twin
    * of Cdc.corpusDiff, and the first thing to check when an upstream
    * producer "just added a field". Pure driver-side StructType
    * comparison (no jobs run): one row per added / removed / retyped /
    * re-nullabled column, empty when the schemas agree. Column order is
    * deliberately NOT a change — parquet/DataFrame semantics are
    * name-based, and an order-sensitive diff would page someone for a
    * harmless projection reorder.
    */
  def schemaDiff(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val spark = oldDf.sparkSession
    import spark.implicits._
    val o = oldDf.schema.map(f => f.name -> f).toMap
    val n = newDf.schema.map(f => f.name -> f).toMap
    val added = (n.keySet -- o.keySet).toSeq.sorted.map(c =>
      (c, "added", null: String, n(c).dataType.simpleString))
    val removed = (o.keySet -- n.keySet).toSeq.sorted.map(c =>
      (c, "removed", o(c).dataType.simpleString, null: String))
    val changed = (o.keySet & n.keySet).toSeq.sorted.flatMap { c =>
      val (fo, fn) = (o(c), n(c))
      if (fo.dataType != fn.dataType)
        Some((c, "retyped", fo.dataType.simpleString,
          fn.dataType.simpleString))
      else if (fo.nullable != fn.nullable)
        Some((c, "renullabled",
          (if (fo.nullable) "nullable" else "required"),
          (if (fn.nullable) "nullable" else "required")))
      else None
    }
    (added ++ removed ++ changed)
      .toDF("column", "change", "from_type", "to_type")
  }
}
