package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in graft.queries.* packs; each pack pairs deterministic
  * Spark DataFrame queries with DuckDB oracle SQL over the same parquet
  * tables. Column aliases match on both sides (driver hashes columns sorted
  * by name); computed doubles are rounded identically on both sides.
  */
object SparkEntry {

  /** All query packs; public so the contract specs can verify name
    * uniqueness across packs (queries.toMap would dedup silently).
    */
  val packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    JoinQueries,
    AnalyticQueries,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    MlQueries,
    MultimodalQueries,
    EventQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's gold daily-utilization aggregate re-expressed on the
    * events table (SURVEY.md §2.4 A1-A3).
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q_gold_daily")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
