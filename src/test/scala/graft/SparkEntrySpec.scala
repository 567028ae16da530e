package graft

/** Smoke: every registered query runs on sf0.001 and returns rows with the
  * declared column names (oracle parity is checked by scripts/compare_oracle
  * .py and the driver's DuckDB gate — this spec guards compile-time drift). */
class SparkEntrySpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Every query is oracle-gated (q49 included since round 6: its output
  // is rank-error booleans, hash-checkable against an all-true oracle).
  private val rowsOnly = Set.empty[String]

  test("every query has an oracle or is explicitly rows-only") {
    val missing =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("every bench setup entry names a registered query") {
    // a typo here would silently time the query WITH its fixture build
    // again (the round-10 q59 accounting defect, resurrected)
    val orphans = SparkEntry.setup.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"setup entries without queries: $orphans")
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("staged lakehouse fixture path (bench flow: setup then query) " +
    "matches the inline-build path") {
    // the bench runs setup(name) immediately before the query; the body
    // must CONSUME the staged fixture (not rebuild) and produce the
    // same result as its inline build — gate columns included
    for (name <- Seq("q237_dv_erasure", "q246_table_history",
      "q249_schema_evolution")) {
      val inline = SparkEntry.queries(name)(spark, sf).collect().toSet
      SparkEntry.setup(name)(spark, sf)
      val staged = SparkEntry.queries(name)(spark, sf).collect().toSet
      assert(staged == inline, s"$name staged != inline")
    }
  }
}
