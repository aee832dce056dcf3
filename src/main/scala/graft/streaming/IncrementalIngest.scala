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
    val bandDir = bandsDir(workDir, cfg)

    pagesStream
      .select(col("url").as("id"), col("text"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        def readOpt(p: String): Option[DataFrame] =
          try Some(spark.read.parquet(p)) catch { case _: Throwable => None }
        val newSigs = Dedup.signatures(Dedup.shingleSets(batch, cfg), cfg)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // (1) idempotent signature flush: left-anti join vs existing ids
          val pending = readOpt(sigDir) match {
            case Some(e) => newSigs.join(e.select("id"), Seq("id"), "left_anti")
            case None    => newSigs
          }
          pending.write.mode(SaveMode.Append).parquet(sigDir)

          // (2) incremental BAND store: append band keys for ids the
          // store has never banded (anti-join vs the band store itself,
          // so a crash between the sig and band writes self-heals on
          // retry). The all-side of every later batch is READ from here
          // — never recomputed from the full signature store.
          val bandPending = readOpt(bandDir) match {
            case Some(bs) => Dedup.validSignatures(newSigs)
              .join(bs.select("id").distinct(), Seq("id"), "left_anti")
            case None => Dedup.validSignatures(newSigs)
          }
          Dedup.bandTable(bandPending, cfg)
            .select(col("id"), col("band_key"))
            .write.mode(SaveMode.Append).parquet(bandDir)

          // (3) incremental matching: this batch's ids vs the persisted
          // band store (new x all, never all x all; all-side bands from
          // storage)
          val allSigs = spark.read.parquet(sigDir)
          val bandStore = spark.read.parquet(bandDir)
          val newPairs = Dedup.incrementalPairsBanded(
            newSigs.select("id"), bandStore, allSigs, cfg)
          // dedup vs pairs already recorded (MERGE "when not matched")
          val fresh = readOpt(pairDir) match {
            case Some(p) =>
              newPairs.join(p.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_anti")
            case None => newPairs
          }
          fresh.write.mode(SaveMode.Append).parquet(pairDir)
        } finally newSigs.unpersist()
      }
      .start()
  }

  /** The persisted incremental LSH band table (id, band_key). */
  def bandsDir(workDir: String, cfg: DedupConfig): String =
    s"$workDir/bands_stream/tag=${cfg.configTag}"

  /** Compact the append-per-batch stores (signatures, bands, pairs):
    * each directory accumulates one file set per micro-batch, which at
    * streaming cadence becomes the classic small-files problem — scans
    * pay per-file open cost and the band join loses split sizing. The
    * content is already deduplicated at write time (left-anti joins), so
    * compaction is a pure rewrite: read, coalesce toward
    * spark.sql.shuffle.partitions, write to a temp dir, swap. Call
    * between batches (the stores are not transactional under concurrent
    * writers — an Iceberg rewrite_data_files in production).
    */
  def compactStores(spark: org.apache.spark.sql.SparkSession,
                    workDir: String, cfg: DedupConfig): Unit = {
    val targetParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    Seq(s"$workDir/signatures_stream/tag=${cfg.configTag}",
      bandsDir(workDir, cfg),
      s"$workDir/pairs_stream/tag=${cfg.configTag}").foreach { dir =>
      if (new java.io.File(dir).exists()) {
        val tmp = s"$dir.compact_tmp"
        spark.read.parquet(dir).coalesce(targetParts)
          .write.mode(SaveMode.Overwrite).parquet(tmp)
        val old = new java.io.File(dir)
        val stash = new java.io.File(s"$dir.old")
        require(old.renameTo(stash), s"compact: stash of $dir failed")
        require(new java.io.File(tmp).renameTo(old), s"compact: swap of $dir failed")
        deleteRecursively(stash)
      }
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  def bands(spark: org.apache.spark.sql.SparkSession, workDir: String,
            cfg: DedupConfig): DataFrame =
    spark.read.parquet(bandsDir(workDir, cfg))

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
