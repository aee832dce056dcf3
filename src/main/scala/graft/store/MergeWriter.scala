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
    * id, `ray_extract_features.py:165-206` semantics).
    */
  def upsert(batch: DataFrame, batchId: Long): Unit =
    batch
      .withColumn("_batch", lit(batchId))
      .write.mode(SaveMode.Append)
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
