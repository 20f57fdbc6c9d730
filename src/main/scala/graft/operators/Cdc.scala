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
    *
    * Same-timestamp versions of one key yield a ZERO-WIDTH interval for
    * every superseded row (valid_to = lead(tsCol) = valid_from): under
    * half-open [from, to) semantics no as-of point lookup can land on
    * them, which is the intended reading — of n simultaneous versions
    * only the tiebreak-last one was ever observable, and the empty
    * intervals preserve the full change history without ever matching.
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

  /** Corpus snapshot diff: which documents were ADDED, REMOVED, or
    * MODIFIED between two corpus versions — the audit a data-versioned
    * lake runs when a new crawl or re-processing lands, and the input
    * to "what changed?" drill-downs and incremental downstream refresh.
    * Content identity is the normalization-invariant text fingerprint
    * (case/whitespace churn is NOT a modification).
    *
    * Scale shape: each side reduces to (id, fingerprint) before the
    * full-outer join — one id-keyed exchange per side, the text itself
    * never shuffles. Unchanged docs (the overwhelming majority of any
    * real diff) are filtered out AFTER the join but before anything
    * downstream, so the result is |changes|-sized.
    */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
                 textCol: String, idCol: String): DataFrame = {
    import graft.text.TextFunctions.fingerprint
    val o = oldDocs.select(col(idCol), fingerprint(col(textCol)).as("fp_old"))
    val n = newDocs.select(col(idCol), fingerprint(col(textCol)).as("fp_new"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("change",
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") =!= col("fp_new"), "modified")
          .otherwise("unchanged"))
      .filter(col("change") =!= "unchanged")
      .select(idCol, "change")
  }
}
