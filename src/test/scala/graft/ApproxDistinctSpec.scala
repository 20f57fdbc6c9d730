package graft

import org.apache.spark.sql.functions._

/** HLL++ estimates are engine-specific (rows-only at the driver gate), so
  * the accuracy contract lives here: the sketch must track exact distinct
  * counts within its configured relative error.
  */
class ApproxDistinctSpec extends SparkSpecBase {

  test("approx_count_distinct tracks exact within configured rsd on events") {
    val ev = Tables.events(spark, sfDir)
    val r = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx")).collect()(0)
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.06,
      s"approx $approx vs exact $exact drifted beyond 3x rsd")
  }

  test("pivot row equals the filtered counts it encodes") {
    val docs = Tables.documents(spark, sfDir)
    val pivoted = SparkEntry.queries("q_pivot")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(r.fieldIndex("en"))).toMap
    val manual = docs.filter(col("lang") === "en")
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    manual.foreach { case (src, n) => assert(pivoted(src) == n) }
  }
}
