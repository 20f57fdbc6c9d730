package graft

import graft.sources.Lake
import java.nio.file.Files

/** Proves the Lake table-format seam actually DISPATCHES on `format`
  * rather than being a knob that only ever runs parquet: the built-in
  * `json` source stands in for a Delta/Iceberg runtime (none ships in
  * this environment — Lake's scaladoc lists the exact drop-in configs).
  */
class LakeSpec extends SparkSpecBase {
  import spark.implicits._

  private def withFormat[A](fmt: String)(body: => A): A = {
    val prev = Lake.format
    Lake.format = fmt
    try body finally Lake.format = prev
  }

  test("write/read dispatch through a non-parquet format (json)") {
    val dir = Files.createTempDirectory("graft-lake-json").toString
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    withFormat("json") {
      Lake.write(df, s"$dir/t")
      // the files on disk must really be the third format, not parquet
      val files = new java.io.File(s"$dir/t").listFiles()
        .map(_.getName).filter(_.startsWith("part-"))
      assert(files.nonEmpty && files.forall(_.endsWith(".json")),
        s"expected json part files, got ${files.toSeq}")
      val back = Lake.read(spark, s"$dir/t")
      assert(back.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L))
    }
  }

  test("partitioned write dispatches too, and partition pruning survives") {
    val dir = Files.createTempDirectory("graft-lake-json-part").toString
    val df = Seq((1L, "a", 0L), (2L, "b", 1L), (3L, "c", 0L))
      .toDF("id", "v", "p")
    withFormat("json") {
      Lake.write(df, s"$dir/tp", partitionBy = Seq("p"))
      assert(new java.io.File(s"$dir/tp/p=0").isDirectory)
      val back = Lake.read(spark, s"$dir/tp").filter($"p" === 0)
      assert(back.count() == 2)
      // the partition filter must prune directories, not scan-and-filter
      val scan = back.queryExecution.executedPlan.collectLeaves().head.toString
      assert(scan.contains("PartitionFilters") && scan.contains("p#"),
        s"partition filter not pushed into scan:\n$scan")
    }
  }

  test("columnar non-parquet format (orc) round-trips with pushdown intact") {
    val dir = Files.createTempDirectory("graft-lake-orc").toString
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "v", "x")
    withFormat("orc") {
      Lake.write(df, s"$dir/t")
      val files = new java.io.File(s"$dir/t").listFiles()
        .map(_.getName).filter(_.startsWith("part-"))
      assert(files.nonEmpty && files.forall(_.endsWith(".orc")),
        s"expected orc part files, got ${files.toSeq}")
      val back = Lake.read(spark, s"$dir/t").filter($"id" > 1L)
      assert(back.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
      // ORC is a pushdown-capable columnar source like parquet — the
      // filter must reach the scan, not sit in a post-filter only
      val plan = back.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        plan.contains("GreaterThan(id"), plan.take(800))
    }
  }

  test("format is restored and parquet remains the environment default") {
    assert(Lake.format == "parquet")
  }
}
