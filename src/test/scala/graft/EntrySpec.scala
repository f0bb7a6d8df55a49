package graft

class EntrySpec extends SparkTestBase {

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries (non-SQL-expressible) are allowed but tracked here
    assert(missing.forall(n => SparkEntry.rowsOnly.contains(n)),
      s"queries without oracle or rowsOnly tag: ${missing -- SparkEntry.rowsOnly}")
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty,
      "oracle entries without a query")
  }

  test("all queries execute and return rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
      withClue(s"$name returned 0 rows: ") { assert(n > 0 || name.contains("empty")) }
    }
  }
}
