package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, DedupConfig}

/** Same-host A/B: the production two-phase argmax keep-list
  * ([[Dedup.keepList]]) vs the round-3 cluster-partitioned window —
  * the attribution run the round-4 verdict asked for (q_dedup_keep_list
  * moved 0.43→1.46 s across rounds with no same-host control). The
  * window variant lives HERE, not in Dedup: it is a measurement
  * control, never a production path (an unsplittable WindowExec
  * buffering a mega-cluster is exactly the hazard the argmax removed).
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.KeepListAB sf"
  *      sbt "runMain graft.KeepListAB corpus 150000"
  * Prints one JSON line; reps alternate variants so slow host drift
  * hits both equally.
  */
object KeepListAB {

  /** Round-3 shape, bit-identical output contract (modulo the pinned
    * NaN-quality semantic fix the argmax made intentionally).
    */
  private def keepListWindow(docs: DataFrame, clusters: DataFrame,
                             quality: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = docs.select(col("id"), quality.as("quality"))
      .join(clusters.select(col("id"), col("cluster_id")), Seq("id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("id")))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("quality").desc_nulls_last, col("id").asc)
    scored.withColumn("rn", row_number().over(w))
      .withColumn("kept", col("rn") === 1)
      .select(col("id"), col("quality"), col("cluster_id"), col("kept"))
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("sf") // "sf" | "corpus"
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = DedupConfig()

    val docs0 = mode match {
      case "corpus" =>
        val nBase = args.lift(1).map(_.toInt).getOrElse(500000) // 700,894 pages
        Dedup.fromPages(spark.read.parquet(
          graft.corpus.SynthCorpus.ensureScalingCorpus(spark, nBase)))
      case _ =>
        val dir = sys.env("SPARK_GRAFT_SF_DIR")
        Dedup.fromDocuments(spark.read.parquet(s"$dir/documents.parquet"))
    }
    // identical MATERIALIZED inputs for both variants — the A/B measures
    // only the keep-list operator, not the cluster build
    val docs = docs0.localCheckpoint(eager = true)
    val clusters = Dedup.clusters(Dedup.pairsMaterialized(docs, cfg))
      .localCheckpoint(eager = true)
    val q = graft.functions.TextFunctions.qualityScore(col("text"))

    // hash-fold EVERY output column so neither variant can win by
    // column pruning under count() (count alone is also reported —
    // it is what Bench measures for q_dedup_keep_list)
    def consume(df: DataFrame): Unit =
      // bit_xor fold, not sum: ANSI mode throws on long overflow
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).head(): Unit
    def run(f: => DataFrame): (Double, Double) = {
      val t0 = System.nanoTime(); f.count()
      val tCount = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); consume(f)
      val tFull = (System.nanoTime() - t1) / 1e9
      (tCount, tFull)
    }
    def argmax() = Dedup.keepList(docs, clusters, q)
    def window() = keepListWindow(docs, clusters, q)

    // result parity (informational: NaN-quality rows differ by design)
    val mismatch = argmax().select(col("id"), col("kept"))
      .join(window().select(col("id"), col("kept").as("kept_w")), "id")
      .where(col("kept") =!= col("kept_w")).count()

    run(argmax()); run(window()) // warmup both plans
    val res = (1 to reps).map(_ => (run(argmax()), run(window())))
    val aCount = res.map(_._1._1); val aFull = res.map(_._1._2)
    val wCount = res.map(_._2._1); val wFull = res.map(_._2._2)
    def arr(xs: Seq[Double]) = xs.mkString("[", ",", "]")
    val n = docs.count()
    println(
      s"""{"metric":"keeplist_ab","mode":"$mode","n_docs":$n,"reps":$reps,""" +
        s""""parity_mismatch":$mismatch,""" +
        s""""argmax_count_min":${aCount.min},"window_count_min":${wCount.min},""" +
        s""""argmax_full_min":${aFull.min},"window_full_min":${wFull.min},""" +
        s""""argmax_count":${arr(aCount)},"window_count":${arr(wCount)},""" +
        s""""argmax_full":${arr(aFull)},"window_full":${arr(wFull)}}""")
    spark.stop()
  }
}
