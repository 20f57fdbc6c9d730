package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling with forward fill — the telemetry-mart shape
  * the reference's timeseries models imply (gpu_timeseries buckets by
  * minute and simply drops empty buckets; a training/alerting consumer
  * needs the DENSE grid with gaps carried forward).
  *
  * Plan shape, scale-first:
  *  1. bucket-aggregate raw rows to (key, bucket, value) — the only
  *     corpus-sized pass, partial-aggregable, one shuffle on (key, bucket);
  *  2. per-key [min, max] span — rides the same aggregate tree;
  *  3. explode a per-key `sequence(mn, mx, step)` — output-sized, never
  *     corpus-sized (a 30-day hourly grid is 720 rows/key regardless of
  *     event volume);
  *  4. left join observations onto the grid (key+bucket equi-join);
  *  5. forward fill via `last(value, ignoreNulls)` over (key ORDER BY
  *     bucket) — ONE window, and the per-key sort it implies is the
  *     time-series semantic itself (any engine must order a key's
  *     timeline to carry values forward). Keys are independent, so the
  *     window parallelizes across the key shuffle; no global sort.
  *
  * The first grid cell of every key is observed by construction (the span
  * starts at the key's first bucket), so the filled column is total — no
  * leading-null policy knob needed.
  */
object TimeSeries {

  /** Dense per-key grid of `step`-sized buckets from each key's first to
    * last observation, observed buckets carrying round(avg(value), 6),
    * gaps forward-filled; `observed` flags real vs carried rows.
    *
    * `step` is any SQL interval literal body (e.g. "INTERVAL 1 HOUR");
    * `bucket` must truncate ts to the matching grain (e.g. "hour").
    */
  def resampleFill(df: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, grain: String,
                   step: String): DataFrame = {
    val b = df
      .groupBy(col(keyCol), date_trunc(grain, col(tsCol)).as("bucket"))
      .agg(round(avg(col(valueCol)), 6).as("v_obs"))
    val grid = b.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col(keyCol),
        explode(sequence(col("mn"), col("mx"), expr(step))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(b, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        last(col("v_obs"), ignoreNulls = true).over(w).as("v"),
        when(col("v_obs").isNotNull, lit(1)).otherwise(lit(0)).as("observed"))
  }
}
