package graft

import graft.operators.SkewJoin
import graft.sources.Layouts
import org.apache.spark.sql.functions._

class SkewAndLayoutSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedInnerJoin equals the plain join on skewed data") {
    // key 1 is a heavy hitter: 5000 of 5100 rows
    val big = ((1 to 5000).map(i => (1L, s"v$i")) ++
      (1 to 100).map(i => ((i % 10 + 2).toLong, s"w$i"))).toDF("k", "payload")
    val small = (1L to 12L).map(k => (k, s"dim$k")).toDF("k", "attr")
    val plain = big.join(small, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = SkewJoin.saltedInnerJoin(big, small, "k", salts = 8)
      .groupBy("k").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    // the heavy key must actually spread across salt values
    val saltSpread = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .filter($"k" === 1L).select("_salt").distinct().count()
    assert(saltSpread > 1, "salt did not spread the hot key")
  }

  test("heavyHitters surfaces the skewed key first") {
    val df = ((1 to 500).map(_ => ("hot", 1)) ++
      (1 to 50).map(i => (s"cold$i", 1))).toDF("k", "v")
    val top = SkewJoin.heavyHitters(df, col("k"), 3).collect()
    assert(top(0).getString(0) == "hot" && top(0).getLong(1) == 500L)
  }

  test("partitioned write prunes partitions in the scan plan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = Seq(
      ("2024-01-01", 1L, 10.0), ("2024-01-01", 2L, 20.0),
      ("2024-01-02", 3L, 30.0), ("2024-01-03", 4L, 40.0)
    ).toDF("dt", "id", "v")
    Layouts.writePartitioned(df, s"$dir/t", Seq("dt"))
    val read = spark.read.parquet(s"$dir/t").filter($"dt" === "2024-01-02")
    assert(read.count() == 1)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"), plan.take(800))
  }

  test("sorted-partitioned write produces in-file ordered rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sorted").toString
    val rng = new scala.util.Random(5)
    val df = (1 to 2000).map(_ => (rng.nextInt(3), rng.nextLong().abs))
      .toDF("p", "ts")
    Layouts.writeSortedPartitioned(df, s"$dir/t", Seq("p"), Seq("ts"))
    // every physical file must be internally sorted by ts
    val files = new java.io.File(s"$dir/t").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val ts = spark.read.parquet(f.getPath).select("ts")
        .collect().map(_.getLong(0))
      assert(ts.sameElements(ts.sorted), s"unsorted file ${f.getName}")
    }
    assert(spark.read.parquet(s"$dir/t").count() == 2000)
  }

  test("co-located join of identically bucketed tables has no exchange") {
    spark.sql("DROP TABLE IF EXISTS bk_left")
    spark.sql("DROP TABLE IF EXISTS bk_right")
    // in-memory catalog forgets tables across JVMs but warehouse dirs
    // persist; stale dirs make saveAsTable fail LOCATION_ALREADY_EXISTS
    for (t <- Seq("bk_left", "bk_right")) {
      val dir = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t)
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 1000L).map(i => (i, s"r$i")).toDF("k", "rv")
    Layouts.writeBucketed(left, "bk_left", "k", 4)
    Layouts.writeBucketed(right, "bk_right", "k", 4)
    val joined = Layouts.coLocatedJoin(spark, "bk_left", "bk_right", "k")
    assert(joined.count() == 1000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed join still shuffled:\n" + plan.take(1200))
  }

  test("zorderKey interleaves bits (hand-checked) and clusters both dimensions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 2 bits per column over [0,3]: value IS the quantized level.
    // (x=2=0b10, y=1=0b01) → interleave bit b of x at 2b, y at 2b+1:
    // bit0=x0=0, bit1=y0=1, bit2=x1=1, bit3=y1=0 → 0b0110 = 6
    val one = Seq((2L, 1L)).toDF("x", "y")
      .select(Layouts.zorderKey(
        Seq((col("x"), 0L, 3L), (col("y"), 0L, 3L)), bitsPerCol = 2).as("z"))
      .collect()(0).getLong(0)
    assert(one == 6L)

    // clustering property: sort a 16×16 grid by z; any contiguous run of
    // 64 rows must span at most half of each axis range on average —
    // versus a plain (x, y) sort where late-x runs span ALL of y.
    val grid = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y))
      .toDF("x", "y")
    val z = grid.select(col("x"), col("y"), Layouts.zorderKey(
        Seq((col("x"), 0L, 15L), (col("y"), 0L, 15L)), bitsPerCol = 4).as("z"))
      .orderBy("z").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(z.length == 256 && z.toSet.size == 256)
    val spans = z.grouped(64).map { run =>
      val xs = run.map(_._1); val ys = run.map(_._2)
      (xs.max - xs.min) + (ys.max - ys.min)
    }.toSeq
    // each quarter of the z-curve is one 8×8-ish quadrant: combined span
    // ~14-16, never the 15+15=30 a row-major sort's x-slices give on y
    assert(spans.forall(_ <= 16), s"z-curve runs not clustered: $spans")
  }

  test("compact preserves a hive-partitioned layout (per-leaf rewrite)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-part")
      .toString + "/t"
    val df = (1L to 1200L).map(i => (i, i % 3, s"v$i")).toDF("id", "p", "v")
    df.repartition(8).write.partitionBy("p").parquet(dir)
    def partFiles(p: Long) = Option(new java.io.File(s"$dir/p=$p").listFiles())
      .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
    assert(partFiles(0) > 1)
    val (before, after) = Layouts.compact(spark, dir, targetFileBytes = 1L << 20)
    assert(after < before)
    // the p= directory tree survives and pruning still works
    assert((0L to 2L).forall(p => new java.io.File(s"$dir/p=$p").isDirectory))
    val back = spark.read.parquet(dir)
    assert(back.count() == 1200)
    assert(back.filter(col("p") === 1).count() == 400)
    val scan = back.filter(col("p") === 1)
      .queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("p#"),
      s"pruning lost after compaction:\n$scan")
  }

  test("compact merges small files, preserves rows, skips when already compact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact")
      .toString + "/t"
    // 32 partitions of a tiny frame → 32 small files
    val df = (1L to 2000L).map(i => (i, s"v$i")).toDF("id", "v")
    df.repartition(32).write.parquet(dir)
    def files() = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files() == 32)
    val (before, after) = Layouts.compact(spark, dir, targetFileBytes = 1L << 20)
    assert(before == 32 && after < 32 && after >= 1)
    val back = spark.read.parquet(dir)
    assert(back.count() == 2000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).collect()(0)
      .getLong(0) == 2000L * 2001L / 2)
    // second pass: already at/below target file count → no-op
    val (b2, a2) = Layouts.compact(spark, dir, targetFileBytes = 1L << 20)
    assert(b2 == a2 && b2 == after)
  }
}
