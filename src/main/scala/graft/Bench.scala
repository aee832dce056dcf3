package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{Dedup, DedupConfig}

/** Driver-run benchmark: one JSON line with per-query seconds plus the
  * headline dedup-pipeline throughput (docs/sec) at the configured
  * parallelism. See ScalingBench for the N-vs-4N scaling evidence.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // headline: full dedup pipeline (docs -> verified pairs -> clusters)
    val docs = Dedup.fromDocuments(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val nDocs = docs.count()
    // warmup (codegen + JIT) on a slice, then timed run
    Dedup.pairsMaterialized(docs.limit(500), DedupConfig()).count()
    val tPipe0 = System.nanoTime()
    Dedup.clusters(Dedup.pairsMaterialized(docs, DedupConfig())).count()
    val pipeSec = (System.nanoTime() - tPipe0) / 1e9
    val docsPerSec = nDocs / pipeSec

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = (results :+ ("pipeline_clusters" -> pipeSec))
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + pipeSec
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","docs_per_sec":$docsPerSec,"n_docs":$nDocs}""")
    spark.stop()
  }
}
