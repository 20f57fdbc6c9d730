package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-format seam for the materialized medallion layers.
  *
  * This environment ships no Delta/Iceberg runtime, so the engine
  * materializes plain parquet — but every layer write/read goes through
  * this object, so pointing `format` at a lakehouse source is the
  * complete migration: the call sites don't change. The dispatch is
  * exercised (not just asserted) by LakeSpec, which flips `format` to
  * the built-in `json` source and round-trips plain and partitioned
  * writes through it.
  *
  * What a real drop-in needs, exactly:
  *  - Delta: the delta-spark runtime jar on the classpath,
  *    `spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension`,
  *    `spark.sql.catalog.spark_catalog=
  *    org.apache.spark.sql.delta.catalog.DeltaCatalog` at session build
  *    (add them next to GraftSession's existing extension binding), and
  *    `Lake.format = "delta"`. Path-based `save`/`load` as used here is
  *    Delta's supported addressing mode.
  *  - Iceberg: the iceberg-spark-runtime jar, a catalog config
  *    (`spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog`
  *    plus its `type`/`warehouse` properties), and `Lake.format =
  *    "iceberg"`. Iceberg prefers table identifiers over raw paths, so
  *    a drop-in maps `path` → `<catalog>.<db>.<table>` in these two
  *    methods — still the only two methods that change.
  * ACID upserts, time travel, and compaction then come from the table
  * format; the engine's plans are identical either way because every
  * format presents as an ordinary DataFrame source to Catalyst.
  *
  * ENV-BLOCK (verified 2026-08-13, final): resolving the runtime was
  * attempted once per the round-6 review — `sbt update` with
  * io.delta:delta-spark_2.13:4.0.0 fails under the sandbox's offline
  * coursier ("Error downloading io.delta:delta-spark_2.13:4.0.0 / Not
  * found" against the local cache; zero egress), and no delta/iceberg
  * jar exists under /opt/spark/jars or the coursier cache. The seam
  * above plus LakeSpec's parquet/json/ORC round-trips remain the
  * exercised reality; the drop-in configs stay documented here.
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
