package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def quotes = Seq(
    // (symbol, q_ts, price)
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 15L, 9.0)
  ).toDF("sym_q", "q_ts", "price")

  private def trades = Seq(
    // (symbol, t_ts) → expected matched price
    ("a", 5L),   // before any quote → null
    ("a", 20L),  // exact tie → 2.0 (rts <= lts includes equality)
    ("a", 25L),  // between → 2.0
    ("a", 99L),  // after all → 3.0
    ("b", 15L),  // tie on the only quote → 9.0
    ("c", 50L)   // key with no quotes at all → null
  ).toDF("sym", "t_ts")

  test("asOf picks the latest right row with rts <= lts per key") {
    val got = AsOfJoin.asOf(trades, quotes,
        Seq("sym"), Seq("sym_q"), "t_ts", "q_ts")
      .select($"sym", $"t_ts", $"price")
      .orderBy("sym", "t_ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq == Seq(
      ("a", 5L, None), ("a", 20L, Some(2.0)), ("a", 25L, Some(2.0)),
      ("a", 99L, Some(3.0)), ("b", 15L, Some(9.0)), ("c", 50L, None)))
  }

  test("column names resolve with the session resolver (case-insensitive)") {
    // default spark.sql.caseSensitive=false: asOf must accept the same
    // spellings df.select would
    val upper = AsOfJoin.asOf(trades, quotes,
        Seq("SYM"), Seq("SYM_Q"), "T_TS", "Q_TS")
      .select($"sym", $"t_ts", $"price").orderBy("sym", "t_ts").collect()
    val exact = AsOfJoin.asOf(trades, quotes,
        Seq("sym"), Seq("sym_q"), "t_ts", "q_ts")
      .select($"sym", $"t_ts", $"price").orderBy("sym", "t_ts").collect()
    assert(upper.toSeq == exact.toSeq)
  }

  test("whole right row rides along (multi-column payload)") {
    val q = quotes.withColumn("venue", concat(lit("v"), $"q_ts"))
    val got = AsOfJoin.asOf(trades.filter($"sym" === "a"), q,
        Seq("sym"), Seq("sym_q"), "t_ts", "q_ts")
      .filter($"t_ts" === 25L).collect()(0)
    assert(got.getAs[Double]("price") == 2.0)
    assert(got.getAs[String]("venue") == "v20")
  }

  test("agrees with the window formulation on random data") {
    val rnd = new scala.util.Random(11)
    val lefts = (0 until 300).map(_ =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "lts")
    val rights = (0 until 300).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("rk", "rts", "payload")
    val native = AsOfJoin.asOf(lefts, rights, Seq("k"), Seq("rk"), "lts", "rts")
      .select($"k", $"lts", $"rts")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sorted.toSeq
    // reference: per left row, max rts <= lts within key (computed naively)
    val rSeq = rights.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = lefts.collect().map { r =>
      val (k, lts) = (r.getLong(0), r.getLong(1))
      val cand = rSeq.filter(p => p._1 == k && p._2 <= lts)
      (k, lts, if (cand.isEmpty) -1L else cand.map(_._2).max)
    }.sorted.toSeq
    assert(native == want)
  }

  test("plans one exchange + sort per side, no window operator") {
    val df = AsOfJoin.asOf(trades, quotes, Seq("sym"), Seq("sym_q"),
      "t_ts", "q_ts")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p.take(500))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2, p.take(1500))
    assert(!p.contains("Window"), "native as-of must not fall back to a window")
  }

  test("overlapping column names are rejected up front") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades, trades, Seq("sym"), Seq("sym"), "t_ts", "t_ts")
    }
  }

  test("null keys never match (SQL equality), mismatched key dtypes rejected") {
    val l = Seq((Option("a"), 10L), (Option.empty[String], 10L))
      .toDF("k", "lts")
    val r = Seq((Option("a"), 5L, 1.0), (Option.empty[String], 5L, 2.0))
      .toDF("rk", "rts", "pay")
    val got = AsOfJoin.asOf(l, r, Seq("k"), Seq("rk"), "lts", "rts")
      .orderBy("k").collect()
    // "a" matches "a"; the null-keyed left row matches NOTHING even
    // though a null-keyed right row with an eligible ts exists
    assert(got.length == 2)
    val nullRow = got.find(_.isNullAt(0)).get
    assert(nullRow.isNullAt(nullRow.fieldIndex("pay")))
    val aRow = got.find(r => !r.isNullAt(0)).get
    assert(aRow.getAs[Double]("pay") == 1.0)
    // int vs long keys would silently mis-hash — rejected up front
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(
        Seq((1, 10L)).toDF("ik", "lts"),
        Seq((1L, 5L)).toDF("lk", "rts"),
        Seq("ik"), Seq("lk"), "lts", "rts").collect()
    }
  }

  test("empty right side yields all-null matches") {
    val got = AsOfJoin.asOf(trades, quotes.filter($"q_ts" < 0),
        Seq("sym"), Seq("sym_q"), "t_ts", "q_ts")
      .select($"price").collect()
    assert(got.length == 6 && got.forall(_.isNullAt(0)))
  }
}
