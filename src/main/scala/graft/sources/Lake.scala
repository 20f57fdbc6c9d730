package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-format seam for the materialized medallion layers.
  *
  * This environment ships no Delta/Iceberg runtime, so the engine
  * materializes plain parquet — but every layer write/read goes through
  * this object, so pointing `format` at "delta" or "iceberg" (with the
  * runtime on the classpath and their catalog/extension configs set) is
  * the complete migration: the call sites don't change. ACID upserts,
  * time travel, and compaction then come from the table format; the
  * engine's plans are identical either way because both formats present
  * as ordinary DataFrame sources to Catalyst.
  */
object Lake {

  @volatile var format: String = "parquet"

  def write(df: DataFrame, path: String,
            partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format(format)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format(format).load(path)
}
