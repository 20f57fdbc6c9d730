package graft.sources

import graft.Tables
import org.apache.spark.sql.SparkSession

/** The reference's interactive query surface (SURVEY.md §3.3: catalog
  * listing + ad-hoc SQL over named tables) — fixture tables registered as
  * temp views so `spark.sql` and `spark.catalog` work against them by
  * name. Views are lazy: registration reads only parquet footers.
  */
object Views {

  /** Register every fixture table under its TESTDATA name. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { name =>
      val df = name match {
        case "events" => Tables.events(spark, dir)
        case _        => Tables.load(spark, dir, name)
      }
      df.createOrReplaceTempView(name)
    }

  def listTables(spark: SparkSession): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq.sorted
}
