package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.SynthCorpus
import graft.pipeline.{Dedup, DedupConfig}

/** Two-cluster-size scaling evidence (north rule): the same dedup job on
  * the same input at local[N] and local[4N]; reports docs/sec at both and
  * efficiency = (T_N / T_4N) / 4. A real multi-executor cluster is not
  * available in this sandbox; local[n] thread parallelism is the
  * driver-sanctioned stand-in (BASELINE.md "How evidenced").
  *
  * Corpus: deterministic synthetic pages (seeded; no external data),
  * written once to parquet so both runs scan identical bytes.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toInt).getOrElse(40000)
    val small = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "8").toInt
    val big = 4 * small
    val corpusDir = s"/tmp/graft_scaling_corpus_$nBase"
    val cfg = DedupConfig()

    // generate + persist corpus once (driver-side; deterministic)
    locally {
      val s = session(big)
      if (!new java.io.File(corpusDir).exists()) {
        val (pages, _) = SynthCorpus.generate(s, seed = 123L, nBase = nBase,
          dupRate = 0.2)
        pages.drop("html").repartition(64)
          .write.mode("overwrite").parquet(corpusDir)
      }
      s.stop()
    }

    def timed(n: Int): (Double, Long) = {
      val s = session(n)
      try {
        val docs = Dedup.fromPages(s.read.parquet(corpusDir))
        val nDocs = docs.count()
        Dedup.clusters(Dedup.pairs(docs.limit(2000), cfg)).count() // warmup
        val t0 = System.nanoTime()
        Dedup.clusters(Dedup.pairs(docs, cfg)).count()
        ((System.nanoTime() - t0) / 1e9, nDocs)
      } finally s.stop()
    }

    val (tSmall, nDocs) = timed(small)
    val (tBig, _) = timed(big)
    val effRaw = (tSmall / tBig) / (big.toDouble / small)
    println(
      s"""{"metric":"scaling_efficiency","value":$effRaw,"unit":"ratio","n_docs":$nDocs,""" +
        s""""t_local_$small":$tSmall,"t_local_$big":$tBig,""" +
        s""""docs_per_sec_local_$small":${nDocs / tSmall},"docs_per_sec_local_$big":${nDocs / tBig}}""")
  }

  private def session(n: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$n]")
      .config("spark.sql.shuffle.partitions", n)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
