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
  *    do not share cores. The probe BRACKETS each level's reps (pre +
  *    post, min taken) so late-arriving co-tenant load cannot depress
  *    the ceiling reading the way a single post-reps probe did.
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

    // The probe brackets each level's reps (once BEFORE the warmup, once
    // AFTER the last rep) and the level's probe time is the MIN of the
    // two — the machine's best demonstrated capability in that level's
    // window. A single post-reps probe under-reads when co-tenant load
    // arrives late in a session (it depressed the probe while leaving
    // the fast reps intact in sessions 10/11/16/17 — see BASELINE.md),
    // which shows up as impossible normalized readings > 1. The
    // post-only speedup is still reported (`hw_probe_speedup_post`) so
    // the cross-round series stays comparable.
    def timed(n: Int): (Double, Seq[Double], Double, Double, Long) = {
      val s = session(n)
      try {
        val docs = Dedup.fromPages(s.read.parquet(corpusDir))
        val nDocs = docs.count()
        val probePre = probe(s, n)
        Dedup.clusters(Dedup.pairsMaterialized(docs.limit(2000), cfg)).count() // warmup
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          Dedup.clusters(Dedup.pairsMaterialized(docs, cfg)).count()
          (System.nanoTime() - t0) / 1e9
        }
        (ts.min, ts, probePre, probe(s, n), nDocs)
      } finally s.stop()
    }

    val (tSmall, repsSmall, probePreSmall, probePostSmall, nDocs) = timed(small)
    val (tBig, repsBig, probePreBig, probePostBig, _) = timed(big)
    val speedup = tSmall / tBig
    // machine's own N->4N speedup, from each level's best probe instant
    val hwCeiling =
      math.min(probePreSmall, probePostSmall) /
        math.min(probePreBig, probePostBig)
    val hwCeilingPost = probePostSmall / probePostBig // legacy protocol
    val effRaw = speedup / (big.toDouble / small)
    val effNorm = speedup / hwCeiling
    def arr(xs: Seq[Double]) = xs.mkString("[", ",", "]")
    println(
      s"""{"metric":"scaling_efficiency","value":$effRaw,"unit":"ratio","n_docs":$nDocs,""" +
        s""""t_local_$small":$tSmall,"t_local_$big":$tBig,""" +
        s""""reps_local_$small":${arr(repsSmall)},"reps_local_$big":${arr(repsBig)},""" +
        s""""docs_per_sec_local_$small":${nDocs / tSmall},"docs_per_sec_local_$big":${nDocs / tBig},""" +
        s""""probe_secs_local_$small":${arr(Seq(probePreSmall, probePostSmall))},""" +
        s""""probe_secs_local_$big":${arr(Seq(probePreBig, probePostBig))},""" +
        s""""hw_probe_speedup":$hwCeiling,"hw_probe_speedup_post":$hwCeilingPost,""" +
        s""""efficiency_normalized":$effNorm,""" +
        s""""efficiency_normalized_post":${speedup / hwCeilingPost}}""")
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
