package graft

/** Every SparkEntry query must at least execute on sf0.001 (exact value
  * parity vs DuckDB is the driver's gate at sf0.01; tools/check.py replays
  * it locally). Also checks the contract invariants the driver relies on.
  */
class QueriesSmokeSpec extends SparkSpecBase {

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("query names are unique across packs") {
    // flatMap(_.queries).toMap dedups silently; catch collisions explicitly
    val names = SparkEntry.packs.flatMap(_.queries.keys)
    assert(names.distinct.length == names.length,
      s"duplicate query names: ${names.diff(names.distinct)}")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes on sf0.001") {
      assert(fn(spark, sfDir).count() >= 0)
    }
  }
}
