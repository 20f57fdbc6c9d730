package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("binned range join equals brute-force filtering, no duplicate pairs") {
    val rnd = new scala.util.Random(3)
    val left = (0 until 200).map(i => (i.toLong, rnd.nextInt(5000).toLong))
      .toDF("lid", "lv")
    val right = (0 until 200).map(i => (i.toLong, rnd.nextInt(5000).toLong))
      .toDF("rid", "rv")
    val got = RangeJoin.pointsWithin(left, right, "lv", "rv", tolerance = 40L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "binning produced duplicate pairs")
    val lv = left.collect().map(r => (r.getLong(0), r.getLong(1)))
    val rv = right.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (li, l) <- lv; (ri, r) <- rv if math.abs(l - r) <= 40
    } yield (li, ri)).toSet
    assert(got.toSet == want)
  }

  test("bin boundaries: exact-tolerance and negative values match correctly") {
    val left = Seq((1L, -50L), (2L, 0L), (3L, 100L)).toDF("lid", "lv")
    val right = Seq((10L, -100L), (11L, -1L), (12L, 50L), (13L, 151L))
      .toDF("rid", "rv")
    val got = RangeJoin.pointsWithin(left, right, "lv", "rv", tolerance = 50L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // |-50-(-100)|=50 ✓, |-50-(-1)|=49 ✓, |0-(-1)|=1 ✓, |0-50|=50 ✓,
    // |100-50|=50 ✓, |100-151|=51 ✗
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L), (3L, 12L)))
  }

  test("plans a hash join on the bin key, never a nested-loop") {
    val left = Seq((1L, 10L)).toDF("lid", "lv")
    val right = Seq((2L, 11L)).toDF("rid", "rv")
    val p = RangeJoin.pointsWithin(left, right, "lv", "rv", 5L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degraded to a cross product:\n${p.take(800)}")
  }

  test("interval overlap join equals brute force; touching endpoints count") {
    val rnd = new scala.util.Random(9)
    val left = (0 until 120).map { i =>
      val s = rnd.nextInt(2000).toLong; (i.toLong, s, s + rnd.nextInt(150))
    }.toDF("lid", "ls", "le")
    val right = (0 until 120).map { i =>
      val s = rnd.nextInt(2000).toLong; (i.toLong, s, s + rnd.nextInt(150))
    }.toDF("rid", "rs", "re")
    val got = RangeJoin.intervalsOverlapping(left, right,
        "ls", "le", "rs", "re", binWidth = 100L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "overlap join left duplicates")
    val lv = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rv = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      (li, ls, le) <- lv; (ri, rs, re) <- rv if ls <= re && rs <= le
    } yield (li, ri)).toSet
    assert(got.toSet == want)
    // touching endpoints are overlaps (closed intervals)
    val touch = RangeJoin.intervalsOverlapping(
        Seq((1L, 0L, 10L)).toDF("lid", "ls", "le"),
        Seq((2L, 10L, 20L)).toDF("rid", "rs", "re"),
        "ls", "le", "rs", "re", 100L)
    assert(touch.count() == 1)
  }

  test("rejects non-positive tolerance and overlapping names") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      RangeJoin.pointsWithin(df, df.toDF("a", "c"), "a", "c", 5L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointsWithin(df, df.toDF("x", "y"), "a", "y", 0L)
    }
  }
}
