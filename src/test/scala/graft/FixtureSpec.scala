package graft

/** Guards the committed expected-result fixtures (the parquet files
  * under fixtures/ — the DuckDB oracle surface for the
  * non-SQL-expressible queries): each
  * live query at the driver's verification scale must reproduce its
  * fixture exactly. Regenerate with `runMain graft.MakeFixtures` after
  * any intentional kernel/semantics change.
  */
class FixtureSpec extends SparkSpecBase {

  MakeFixtures.fixtureQueries.foreach { name =>
    test(s"$name reproduces its committed fixture") {
      // localCheckpoint flattens the live plan first: exceptAll's
      // rewrite trips a Catalyst binding bug (ATTRIBUTE_NOT_FOUND) over
      // Deduplicate-bearing plans like the SRP pair join — the driver
      // compares materialized parquet, so match that here
      val live = SparkEntry.queries(name)(spark, MakeFixtures.sfDir)
        .localCheckpoint(true)
      val fix = spark.read.parquet(s"/root/repo/fixtures/$name.parquet")
      assert(live.columns.sorted.sameElements(fix.columns.sorted),
        s"schema drift: ${live.columns.toSeq} vs ${fix.columns.toSeq}")
      assert(live.count() == fix.count())
      assert(live.exceptAll(fix).isEmpty && fix.exceptAll(live).isEmpty,
        s"$name drifted from fixture")
    }
  }
}
