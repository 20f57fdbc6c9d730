package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir. We read
  * them lazily — Catalyst prunes columns / pushes filters into the scan, so
  * callers should NOT cache here. At 100 TB these would be multi-file
  * partitioned datasets; the API is path-based so nothing changes except the
  * path pointing at a directory instead of one file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * natively; with `spark.sql.legacy.parquet.nanosAsLong` on (part of the
    * GraftSession posture — a loader must not mutate session conf as a
    * read side effect) the column scans as a long, converted here to a
    * microsecond TimestampType (`ts div 1000` — truncation, matching how
    * Spark casts nanos elsewhere). The conf only affects NANOS columns, so
    * other tables are untouched.
    */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
