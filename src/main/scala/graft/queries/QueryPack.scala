package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-facing queries.
  *
  * Contract (see SparkEntry): each entry in `queries` must produce a
  * DETERMINISTIC result (explicit orderBy on a unique key set) whose column
  * names exactly match the oracle SQL's aliases — the driver sorts columns
  * by name before hashing. Computed doubles are rounded on BOTH sides so
  * fp summation-order differences between Spark and DuckDB can't flip the
  * hash. Queries that aren't SQL-expressible in DuckDB simply omit the
  * oracle entry (driver falls back to a rows-only check).
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]
}
