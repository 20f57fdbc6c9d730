package graft

import graft.sources.Views

/** The interactive surface (SURVEY.md §3.3): catalog listing + ad-hoc SQL
  * over named views.
  */
class ViewsSpec extends SparkSpecBase {

  test("registerAll exposes every fixture table to spark.sql and the catalog") {
    Views.registerAll(spark, sfDir)
    val listed = Views.listTables(spark)
    assert(Tables.all.forall(listed.contains), s"missing views in $listed")

    val top = spark.sql(
      """SELECT n.n_name, round(sum(o.o_totalprice), 2) AS revenue
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY revenue DESC LIMIT 3""".stripMargin)
      .collect()
    assert(top.length == 3)
    assert(top(0).getDouble(1) >= top(2).getDouble(1))

    val cnt = spark.sql("SELECT count(*) FROM events").collect()(0).getLong(0)
    assert(cnt > 0)
  }
}
