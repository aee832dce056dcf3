package graft

/** Driver-contract smoke: entry() must return rows > 0 on sf0.001, and
  * every queries entry must evaluate without error at sf0.001.
  */
class EntrySmokeSpec extends SparkSpecBase {
  test("entry returns clusters (rows > 0) on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_txlog_prune's skip-scan opens strictly fewer files than the full table") {
    val dir = "/root/testdata/sf0.001"
    val log = SparkEntry.eventsTxLog(spark, dir)
    val lo = java.time.LocalDateTime.parse("2024-01-10T00:00:00")
    val hi = java.time.LocalDateTime.parse("2024-01-17T00:00:00")
    val pruned = log.readRange(spark, "ts", Some(lo), Some(hi)).get
    val full = log.read(spark).get
    assert(pruned.inputFiles.length < full.inputFiles.length,
      s"no skipping: ${pruned.inputFiles.length} vs ${full.inputFiles.length}")
    // and the skip loses no in-window rows
    val cond = org.apache.spark.sql.functions.col("ts") >=
      org.apache.spark.sql.functions.lit("2024-01-10 00:00:00") &&
      org.apache.spark.sql.functions.col("ts") <
        org.apache.spark.sql.functions.lit("2024-01-17 00:00:00")
    assert(pruned.where(cond).count() == full.where(cond).count())
  }

  test("q_txlog_point's Bloom skip opens strictly fewer files than the full table and loses no rows") {
    val dir = "/root/testdata/sf0.001"
    val log = SparkEntry.eventsTxLog(spark, dir)
    val ids = Seq(17L, 421L, 933L)
    val pruned = log.readPoint(spark, "event_id", ids).get
    val full = log.read(spark).get
    assert(pruned.inputFiles.length < full.inputFiles.length,
      s"no skipping: ${pruned.inputFiles.length} vs ${full.inputFiles.length}")
    val in = org.apache.spark.sql.functions.col("event_id").isin(ids: _*)
    assert(pruned.where(in).count() == full.where(in).count())
    assert(full.where(in).count() == 3L)
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
