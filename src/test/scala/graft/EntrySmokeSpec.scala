package graft

/** Driver-contract smoke: entry() must return rows > 0 on sf0.001, and
  * every queries entry must evaluate without error at sf0.001.
  */
class EntrySmokeSpec extends SparkSpecBase {
  test("entry returns clusters (rows > 0) on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every SparkEntry query evaluates at sf0.001 and oracle keys are a subset") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, s"$name failed")
    }
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without a query: $unknown")
  }
}
