package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{Dedup, DedupConfig}

/** Ad-hoc stage-level profiler (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = DedupConfig()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = (if (new java.io.File(s"$sfDir/documents.parquet").exists())
      Dedup.fromDocuments(spark.read.parquet(s"$sfDir/documents.parquet"))
    else Dedup.fromPages(spark.read.parquet(sfDir))).cache()
    time("read+count")(docs.count())
    val shingled = time("shingle (persist+count)") {
      val s = Dedup.shingleSets(docs, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val sigs = time("signatures (persist+count)") {
      val s = Dedup.signatures(shingled, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    time("bands+count")(Dedup.bandTable(sigs, cfg).count())
    val cands = time("candidates") {
      val c = Dedup.candidatePairs(Dedup.bandTable(sigs, cfg))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    val pairs = time("verify") {
      val p = Dedup.verifiedPairs(cands, shingled, cfg).localCheckpoint(true)
      p.count(); p
    }
    time("cc")(Dedup.clusters(pairs).count())
    time("cc-again")(Dedup.clusters(pairs).count())
    if (sys.env.get("SPARK_GRAFT_PROFILE_MEDIA").contains("1")) {
      import org.apache.spark.sql.functions._
      import graft.multimodal.BinaryPipeline
      val spark2 = spark
      import spark2.implicits._
      val media = time("media: synth bmp df") {
        val m = SparkEntry.syntheticMedia(spark, sfDir).localCheckpoint(true)
        m.count(); m
      }
      val frames = time("media: sample+featurize") {
        val f = BinaryPipeline.sampleAndFeaturize(media, 1, 16)
          .toDF().localCheckpoint(true)
        f.count(); f
      }
      val emb = time("media: itemEmbedding") {
        val e = BinaryPipeline.itemEmbedding(frames.as[BinaryPipeline.Frame])
          .select(col("id"),
            expr("transform(embedding, x -> cast(x as float))").as("embedding"))
          .localCheckpoint(true)
        e.count(); e
      }
      time("media: topk")(
        graft.functions.Embeddings.bruteForceTopK(emb, emb, 10).count())
      time("media: threshold pairs")(
        graft.functions.Embeddings
          .bruteForceThresholdPairs(emb, SparkEntry.mediaDedupThreshold).count())
      time("media: full query")(
        SparkEntry.queries("q_media_dedup")(spark, sfDir).count())
      spark.stop(); return
    }
    val light = sys.env.get("SPARK_GRAFT_PROFILE_LIGHT").contains("1")
    if (light) { spark.stop(); return }
    locally {
      import org.apache.spark.sql.functions._
      time("lower only")(docs.select(lower(col("text"))).count())
      time("regex only")(docs.select(regexp_replace(col("text"), "\\s+", " ")).count())
      time("md5 only")(docs.select(md5(col("text"))).count())
      time("norm only")(docs.select(
        graft.functions.TextFunctions.normalizeText(col("text"))).count())
      time("groupBy md5")(docs.select(md5(col("text")).as("h"))
        .groupBy("h").count().count())
    }
    time("exact_dedup")(Dedup.exactDuplicates(docs).count())
    time("exact_dedup-again")(Dedup.exactDuplicates(docs).count())
    time("exact_pairs")(Dedup.exactJaccardPairs(docs, cfg).count())
    time("full pairs (fresh)")(Dedup.pairsMaterialized(docs, cfg).count())
    spark.stop()
  }
}
