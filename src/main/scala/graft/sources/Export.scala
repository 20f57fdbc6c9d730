package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Trainer-facing export: the last mile of a training-data pipeline.
  * Everything upstream selects and cleans documents; the trainer wants
  * (a) a DETERMINISTIC global shuffle that changes per epoch but is
  * bit-reproducible for a given (seed, epoch) — re-running an export
  * after a crash must produce the identical order — and (b) the shuffled
  * stream cut into bounded shards so the data loader can shard across
  * workers and resume mid-epoch.
  *
  * Scale notes:
  *  - the shuffle key is md5(seed:epoch:id) — a total order with no RNG
  *    state, so the sort parallelizes as an ordinary range exchange
  *    (sample → range partition → local sort), never a single-partition
  *    collect. Epochs re-key rather than re-seed a generator: epoch 2's
  *    order shares nothing with epoch 1's (avalanche), yet both are pure
  *    functions of the ids.
  *  - shard files are bounded with maxRecordsPerFile inside an ordinary
  *    distributed write — no driver-side slicing. Shard-to-row
  *    assignment is reproducible because the write consumes the
  *    range-partitioned sorted stream: partition i holds keys strictly
  *    below partition i+1's.
  *  - the manifest is one aggregation over input_file_name of a
  *    read-back — an extra metadata-cheap scan that yields the
  *    (file, rows, id-checksum) table a loader (or a later audit) needs
  *    to prove it saw every row exactly once.
  */
object Export {

  /** The per-epoch shuffle key: md5("seed:epoch:id"). */
  def epochKey(id: org.apache.spark.sql.Column, epoch: Int,
               seed: String = "graft-epoch"): org.apache.spark.sql.Column =
    md5(concat(lit(seed), lit(":"), lit(epoch), lit(":"), id.cast("string")))

  /** Deterministic epoch shuffle: global total order by the epoch key.
    * Same (seed, epoch) → identical order on every run and engine.
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
                   seed: String = "graft-epoch"): DataFrame =
    df.orderBy(epochKey(col(idCol), epoch, seed))

  /** Write `df` as shuffled, bounded JSONL shards under `dir`; returns
    * the manifest (file, n_rows, id_sum) read back from the written
    * shards. `shufflePartitions` bounds write parallelism (each range
    * partition emits ⌈rows/maxRecordsPerFile⌉ files).
    */
  def exportJsonlShards(df: DataFrame, idCol: String, dir: String,
                        epoch: Int, maxRecordsPerShard: Int,
                        seed: String = "graft-epoch",
                        shufflePartitions: Int = 8): DataFrame = {
    val spark = df.sparkSession
    df.withColumn("__k", epochKey(col(idCol), epoch, seed))
      .repartitionByRange(shufflePartitions, col("__k"))
      .sortWithinPartitions("__k")
      .drop("__k")
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerShard.toLong)
      .json(dir)
    // explicit one-field schema: schemaless read.json would run a full
    // inference scan over the export before the aggregation scan —
    // two passes where the manifest needs one
    spark.read
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(idCol,
          df.schema(idCol).dataType))))
      .json(dir)
      .select(input_file_name().as("file"), col(idCol))
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"), sum(col(idCol)).as("id_sum"))
      .orderBy("file")
  }
}
