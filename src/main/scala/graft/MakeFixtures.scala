package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Regenerates the committed expected-result fixtures for the queries
  * whose kernels are not DuckDB-expressible (xxhash64-based SimHash /
  * fingerprints, SRP sign-bit LSH): q_simhash_pairs, q_doc_fingerprints,
  * q_ann_srp. All inputs are the driver's seeded sf0.01 tables and every
  * kernel is deterministic, so the result sets are fully reproducible;
  * the committed parquet pins them, the driver's DuckDB oracle reads the
  * file back (SELECT ... FROM '<fixture>.parquet'), and FixtureSpec
  * asserts the live queries still reproduce the fixtures in sbt test.
  *
  * Run: sbt "runMain graft.MakeFixtures"   (from /root/repo)
  */
object MakeFixtures {
  /** Queries pinned by fixture, with the sf dir the driver verifies at. */
  val fixtureQueries: Seq[String] =
    Seq("q_simhash_pairs", "q_doc_fingerprints", "q_ann_srp", "q_ann_ivf",
      "q_html_meta", "q_lang_id", "q_winnow_fp", "q_media_dedup",
      "q_audio_dedup", "q_compression_ratio")
  val sfDir = "/root/testdata/sf0.01"

  /** Optional args = subset of fixture names to regenerate (avoids
    * byte-churn on untouched fixtures); no args = all.
    */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outRoot = Paths.get("fixtures")
    Files.createDirectories(outRoot)
    val unknown = args.filterNot(fixtureQueries.contains)
    require(unknown.isEmpty,
      s"unknown fixture name(s): ${unknown.mkString(", ")} — valid: ${fixtureQueries.mkString(", ")}")
    val targets =
      if (args.isEmpty) fixtureQueries
      else fixtureQueries.filter(args.contains(_))
    targets.foreach { name =>
      val tmp = Files.createTempDirectory(s"graft-fixture-$name").toString
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, outRoot.resolve(s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      println(s"[fixtures] wrote fixtures/$name.parquet")
    }
    spark.stop()
  }
}
