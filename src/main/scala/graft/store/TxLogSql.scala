package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface for TxLog time travel — the `VERSION AS OF` /
  * `DESCRIBE HISTORY` analog (round-3 verdict #7). The reference's
  * upsert store is API-level too (`db/access/db_result_storage.py`), so
  * this is the option-based flavor of the Iceberg/Delta syntax: a
  * serving query pins a committed snapshot under a view name and every
  * downstream `spark.sql` sees that frozen version, immune to
  * concurrent upserts/compactions/vacuums (files of a retained version
  * are never deleted — [[TxLog.vacuum]] `keepVersions` governs
  * retention).
  *
  * {{{
  *   TxLogSql.pinView(spark, "sigs_v3", storePath, Seq("id"), version = 3)
  *   spark.sql("SELECT * FROM sigs_v3 WHERE ...")   // VERSION AS OF 3
  *   TxLogSql.history(spark, s"$storePath/table")    // DESCRIBE HISTORY
  * }}}
  */
object TxLogSql {

  /** Pin a [[MergeWriter]] store at `version` (merge semantics resolved
    * at that snapshot) as a temp view — `VERSION AS OF` for SQL
    * consumers. Fails loudly if the version was never committed or was
    * vacuumed past.
    */
  def pinView(spark: SparkSession, viewName: String, storePath: String,
              keys: Seq[String], version: Long): Unit =
    new MergeWriter(spark, storePath, keys).readAsOf(version)
      .createOrReplaceTempView(viewName)

  /** Pin the LATEST committed version (a stable snapshot: later commits
    * do not move the view until re-pinned).
    */
  def pinViewLatest(spark: SparkSession, viewName: String,
                    storePath: String, keys: Seq[String]): Unit = {
    val w = new MergeWriter(spark, storePath, keys)
    val v = w.txLog.currentVersion()
    require(v >= 0, s"store at $storePath has no committed version to pin")
    pinView(spark, viewName, storePath, keys, v)
  }

  /** Commit history of a raw TxLog table root as a DataFrame
    * (version, op, n_entries, n_rows) — the `DESCRIBE HISTORY` analog;
    * `n_rows` is the manifest-recorded total at that version (null when
    * any entry predates row counts).
    */
  def history(spark: SparkSession, tableRoot: String): DataFrame = {
    import spark.implicits._
    new TxLog(tableRoot).history()
      .toDF("version", "op", "n_entries", "n_rows")
  }
}
