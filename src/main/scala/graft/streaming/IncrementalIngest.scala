package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.pipeline.{Dedup, DedupConfig}

/** Incremental ingestion — the chenhai1030 fork's Ray micro-batch loop
  * (`ray_extract_features.py:85-162`: 600 s ingest windows, periodic
  * signature flush, periodic new-vs-all match regeneration) re-expressed
  * as Structured Streaming:
  *
  *   pages stream -> stateless shingle+sign -> foreachBatch:
  *     (1) idempotent signature upsert (skip-if-done on id+config_tag —
  *         the reference `exists()` semantics, `extract_features.py:61`)
  *     (2) incremental matching: NEW batch bands joined against the FULL
  *         accumulated band table (new x all, never all x all —
  *         `ray_extract_features.py:241-367` semantics at per-batch
  *         cadence)
  *
  * No watermark is needed: the pipeline is insensitive to late rows
  * because the upsert is idempotent (SURVEY.md §2.9).
  */
object IncrementalIngest {

  /** Start the streaming signature+match job.
    *
    * @param pagesStream streaming DataFrame with (url, text) at least
    * @param workDir     output root: signatures/ pairs/ under it
    */
  def start(pagesStream: DataFrame, cfg: DedupConfig, workDir: String,
            checkpointDir: String): StreamingQuery = {
    val sigDir = s"$workDir/signatures_stream/tag=${cfg.configTag}"
    val pairDir = s"$workDir/pairs_stream/tag=${cfg.configTag}"

    pagesStream
      .select(col("url").as("id"), col("text"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val newSigs = Dedup.signatures(Dedup.shingleSets(batch, cfg), cfg)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // (1) idempotent signature flush: left-anti join vs existing ids
          val existing: Option[DataFrame] =
            try Some(spark.read.parquet(sigDir)) catch { case _: Throwable => None }
          val pending = existing match {
            case Some(e) => newSigs.join(e.select("id"), Seq("id"), "left_anti")
            case None    => newSigs
          }
          pending.write.mode(SaveMode.Append).parquet(sigDir)

          // (2) incremental matching: new-batch bands vs full band table
          val all = spark.read.parquet(sigDir)
          val newInStore = all.join(newSigs.select("id"), Seq("id"), "left_semi")
          val newPairs = Dedup.incrementalPairs(newInStore, all, cfg)
          // dedup vs pairs already recorded (MERGE "when not matched")
          val existingPairs: Option[DataFrame] =
            try Some(spark.read.parquet(pairDir)) catch { case _: Throwable => None }
          val fresh = existingPairs match {
            case Some(p) =>
              newPairs.join(p.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_anti")
            case None => newPairs
          }
          fresh.write.mode(SaveMode.Append).parquet(pairDir)
        } finally newSigs.unpersist()
      }
      .start()
  }

  def signatures(spark: org.apache.spark.sql.SparkSession, workDir: String,
                 cfg: DedupConfig): DataFrame =
    spark.read.parquet(s"$workDir/signatures_stream/tag=${cfg.configTag}")

  def pairs(spark: org.apache.spark.sql.SparkSession, workDir: String,
            cfg: DedupConfig): DataFrame =
    spark.read.parquet(s"$workDir/pairs_stream/tag=${cfg.configTag}")

  /** Tumbling-window aggregation over an event-time column — the
    * streaming-semantics analog of the fork's fixed 600 s ingestion
    * windows (`ray_extract_features.py:107-124`), usable both on batch
    * and streaming frames (same plan).
    */
  def windowedCounts(events: DataFrame, tsCol: String, width: String): DataFrame =
    events
      .withWatermark(tsCol, width)
      .groupBy(window(col(tsCol), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))
}
