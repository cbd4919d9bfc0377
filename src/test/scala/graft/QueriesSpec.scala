package graft

/** Driver-contract guard: every inventory query runs at sf0.001, the
  * flagship entry returns rows, and oracleSql keys ⊆ queries keys with
  * matching column names (the driver hash-compares by sorted column
  * name, so a drifted alias silently zeroes a query's correctness). */
class QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("inventory names are unique") {
    val names = SparkEntry.inventory.map(_.name)
    assert(names.distinct.size == names.size)
  }

  SparkEntry.inventory.foreach { q =>
    test(s"${q.name}: runs at sf0.001 and column names match its oracle") {
      val df = q.run(spark, sf)
      df.collect() // executes the full plan
      q.oracle.foreach { sql =>
        // cheap static check: every output column name appears in the SQL
        // (guards alias drift between the Spark builder and the oracle)
        val lower = sql.toLowerCase
        val missing = df.columns.filterNot(c => lower.contains(c.toLowerCase))
        assert(missing.isEmpty,
          s"columns ${missing.mkString(",")} absent from oracle SQL")
      }
    }
  }
}
