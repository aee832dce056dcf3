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
  * Two robustness measures, both reported in the JSON line:
  *  - each level runs `reps` times and takes the MIN wall time (this VM
  *    shows 2-5x run-to-run noise from host contention);
  *  - a pure-compute hardware probe (codegen'd hash fold, zero shuffle)
  *    measures the machine's OWN achievable N->4N speedup: the vCPUs are
  *    SMT pairs and low thread counts turbo-boost, so even a perfectly
  *    parallel program cannot reach 4x here. `efficiency_normalized`
  *    divides the pipeline's speedup by the hardware ceiling — the
  *    number that predicts real multi-executor scaling, where executors
  *    do not share cores.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toInt).getOrElse(150000)
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt
    val small = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "8").toInt
    val big = 4 * small
    val cfg = DedupConfig()

    val corpusDir = locally {
      val s = session(big)
      try SynthCorpus.ensureScalingCorpus(s, nBase) finally s.stop()
    }

    def probe(s: SparkSession, n: Int): Double = {
      import org.apache.spark.sql.functions._
      s.range(0, 200000000L, 1, n * 4)
        .select(expr("bit_xor(xxhash64(id))")).head // warmup
      val t0 = System.nanoTime()
      s.range(0, 2000000000L, 1, n * 4)
        .select(expr("bit_xor(xxhash64(id))")).head
      (System.nanoTime() - t0) / 1e9
    }

    def timed(n: Int): (Double, Seq[Double], Double, Long) = {
      val s = session(n)
      try {
        val docs = Dedup.fromPages(s.read.parquet(corpusDir))
        val nDocs = docs.count()
        Dedup.clusters(Dedup.pairsMaterialized(docs.limit(2000), cfg)).count() // warmup
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          Dedup.clusters(Dedup.pairsMaterialized(docs, cfg)).count()
          (System.nanoTime() - t0) / 1e9
        }
        (ts.min, ts, probe(s, n), nDocs)
      } finally s.stop()
    }

    val (tSmall, repsSmall, probeSmall, nDocs) = timed(small)
    val (tBig, repsBig, probeBig, _) = timed(big)
    val speedup = tSmall / tBig
    val hwCeiling = probeSmall / probeBig // machine's own N->4N speedup
    val effRaw = speedup / (big.toDouble / small)
    val effNorm = speedup / hwCeiling
    def arr(xs: Seq[Double]) = xs.mkString("[", ",", "]")
    println(
      s"""{"metric":"scaling_efficiency","value":$effRaw,"unit":"ratio","n_docs":$nDocs,""" +
        s""""t_local_$small":$tSmall,"t_local_$big":$tBig,""" +
        s""""reps_local_$small":${arr(repsSmall)},"reps_local_$big":${arr(repsBig)},""" +
        s""""docs_per_sec_local_$small":${nDocs / tSmall},"docs_per_sec_local_$big":${nDocs / tBig},""" +
        s""""hw_probe_speedup":$hwCeiling,"efficiency_normalized":$effNorm}""")
  }

  private def session(n: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$n]")
      .config("spark.sql.shuffle.partitions", 2 * n)
      // AQE's default 64 MB advisory size coalesces the shuffle stages of
      // this workload to fewer partitions than cores, capping parallelism
      // identically at local[8] and local[32]; 8 MB keeps reducer counts
      // proportional to the core count (what a real cluster operator
      // would tune via target partition size).
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
