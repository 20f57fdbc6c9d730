package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data compaction: collapse an append-only event/CDC log to the
  * latest record per key — the maintenance operation behind every
  * "current state" table in a lakehouse.
  *
  * One hash aggregation using max_by(struct(payload), orderExpr): partial
  * aggregation keeps one candidate per key per map task, so the shuffle
  * carries one row per (task, key) — the window-function formulation
  * (row_number over key ordered by ts desc) shuffles every log row and
  * sorts whole groups. A deterministic tiebreak column must be included
  * in orderCol when timestamps can collide.
  */
object Cdc {

  /** Latest row per `keyCols`, "latest" = max of `orderCol`. Output
    * columns = input columns.
    */
  def latestByKey(log: DataFrame, keyCols: Seq[String],
                  orderCol: String): DataFrame = {
    val cols = log.columns.toIndexedSeq
    val payload = struct(cols.map(col): _*)
    val others = cols.filterNot(keyCols.contains)
    log.groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, col(orderCol)).as("_latest"))
      .select(keyCols.map(col) ++
        others.map(c => col(s"_latest.$c").as(c)): _*)
      .select(cols.map(col): _*)
  }

  /** Whole-row upsert — MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED
    * INSERT, parquet-era formulation: updates win on key collision,
    * untouched target rows pass through an anti-join. Schemas must
    * match (unionByName enforces it), and `updates` must be KEY-UNIQUE:
    * like SQL MERGE's multiple-match error, two update rows for one key
    * have no defined winner — here they would BOTH survive. Compact a
    * raw CDC batch with `latestByKey` first. The anti-join shuffles on
    * the key (or broadcasts when the update batch is small — the common
    * CDC case, and Catalyst picks that automatically); a table format's
    * MERGE INTO adds file-level pruning on top, which is why `Lake`
    * keeps the format seam — the LOGICAL operation is exactly this.
    */
  def upsertByKey(target: DataFrame, updates: DataFrame,
                  keyCols: Seq[String]): DataFrame =
    updates.unionByName(target.join(updates, keyCols, "left_anti"))

  /** SCD Type 2: turn a change log into a versioned-history dimension —
    * each key's rows become [valid_from, valid_to) intervals with the
    * open current version flagged. One window per key (single hash
    * exchange); ties on `tsCol` need a deterministic tiebreak included
    * in the log before calling (same contract as latestByKey).
    */
  def scd2(log: DataFrame, keyCols: Seq[String], tsCol: String,
           tiebreak: Seq[String] = Nil): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tiebreak).map(col): _*)
    log
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
  }
}
