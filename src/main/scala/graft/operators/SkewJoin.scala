package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for heavy-hitter keys.
  *
  * A shuffle join sends every row of a key to one reducer; a key holding
  * 1% of 100 TB pins 1 TB on a single task. Salting spreads it: the
  * skewed (big) side gets a salt in [0, salts) per row, the other side is
  * replicated `salts` times, and the join key becomes (key, salt) —
  * heavy keys fan out over `salts` tasks at the cost of replicating the
  * small side's matching rows.
  *
  * AQE's skew-join handling (spark.sql.adaptive.skewJoin.*) splits
  * oversized sort-merge partitions at runtime and should be the first
  * resort; this operator is for the cases AQE doesn't cover — shuffled
  * hash joins, aggregations-after-join pipelines where the split point
  * matters, or engines with AQE disabled.
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `key`, salted. Result is
    * column-identical to `big.join(small, key)` (plus row order).
    *
    * The salt must distribute rows of the SAME key value, so it can't be
    * derived from the key itself: a deterministic per-row counter id
    * (monotonically_increasing_id is partition-offset based, stable for a
    * given input layout) modulo `salts` keeps runs reproducible without a
    * shared random stream.
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
                      salts: Int = 8): DataFrame = {
    require(salts > 0)
    val b = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Top heavy-hitter keys with their row counts — the diagnostic that
    * decides whether salting (or a broadcast of the hitters' matches) is
    * worth it. One aggregation pass.
    */
  def heavyHitters(df: DataFrame, key: Column, topK: Int = 20): DataFrame =
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col("key"))
      .limit(topK)
}
