package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Generic keyed upsert writer — the reference's chunked DB merge
  * pattern (`winnow/storage/db_result_storage.py:73-107` for signatures,
  * `270-317` for matches, one shape per satellite table `133-268`)
  * generalized to one writer parameterized by key columns, exactly as
  * SURVEY.md S10 prescribes.
  *
  * Storage is parquet-append plus read-time last-writer-wins dedup (a
  * `row_number() over (partition by key order by batch desc)` view) —
  * the same MERGE contract Iceberg provides natively; swap `read` for a
  * real `MERGE INTO` when an Iceberg catalog is present. Writes are
  * idempotent per batch id: re-writing the same batch replaces itself.
  */
final class MergeWriter(spark: SparkSession, path: String, keys: Seq[String]) {

  private val dir = s"$path/table"

  /** Upsert a batch: matched keys take the new values, unmatched insert.
    * batchId must increase monotonically across logical writes (the
    * reference uses txn chunks; streaming callers pass the micro-batch
    * id, `ray_extract_features.py:165-206` semantics). Overwrite of the
    * per-batch directory makes a RETRIED batch replace itself — append
    * would leave two sets of rows with the same _batch id and an
    * undefined last-writer-wins tiebreak in read().
    */
  def upsert(batch: DataFrame, batchId: Long): Unit =
    batch
      .withColumn("_batch", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/_batch=$batchId")

  /** Current state: last writer per key wins (highest batch id). */
  def read(): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val raw = spark.read
      .option("basePath", dir)
      .parquet(dir)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_batch").desc)
    raw.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn", "_batch")
  }

  def exists(): Boolean = new java.io.File(dir).exists()

  /** Compact the batch history to current state: materializes read()
    * (last-writer-wins) as a single batch directory and drops the
    * superseded `_batch=` dirs, so read() stops paying a window over the
    * full history (with an Iceberg catalog this is
    * `rewrite_data_files` / snapshot expiry). read() results are
    * identical before and after; upserts with higher batch ids continue
    * to work on the compacted store.
    */
  def compact(): Unit = {
    val raw = spark.read.option("basePath", dir).parquet(dir)
    val maxBatch = raw.agg(max(col("_batch"))).head().get(0).toString.toLong
    val tmp = s"$path/_compact_tmp"
    // materialize BEFORE touching the live store
    read().withColumn("_batch", lit(maxBatch))
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    // stash-then-swap (same discipline as IncrementalIngest
    // .compactStores): the live _batch= dirs are moved aside, the
    // compacted data renamed in, THEN the stash is deleted — a crash
    // at any point leaves either the old store or the new one
    // readable, never an empty dir
    val d = new java.io.File(dir)
    val stash = new java.io.File(s"$path/_compact_stash")
    stash.mkdirs()
    val moved = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("_batch="))
    moved.foreach { f =>
      require(f.renameTo(new java.io.File(stash, f.getName)),
        s"compact: stash of ${f.getName} failed")
    }
    if (!new java.io.File(tmp).renameTo(new java.io.File(s"$dir/_batch=$maxBatch"))) {
      // roll back so the store stays readable, then fail loudly
      moved.foreach(f => new java.io.File(stash, f.getName).renameTo(f))
      sys.error(s"compact: rename of $tmp failed (rolled back)")
    }
    deleteRecursively(stash)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}

/** Flat-file report sinks (reference CSV reports,
  * `generate_matches.py:96-100,161-191`, `extract_exif.py:51-53`) —
  * debug/report surface only; the canonical sink is the keyed store.
  */
object ReportSink {
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)
}
