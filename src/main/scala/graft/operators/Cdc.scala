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
}
