package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{ConnectedComponents, Dedup, DedupConfig}

/** End-to-end pipeline checks against the driver's deterministic corpus
  * plus an in-test brute-force oracle (the reference's test style:
  * stage-cardinality + exact-set oracles, `tests/general_tests.py:40-150`).
  */
class DedupPipelineSpec extends SparkSpecBase {
  private lazy val docs =
    Dedup.fromDocuments(spark.read.parquet(s"$sfDir/documents.parquet")).cache()
  private val cfg = DedupConfig()

  /** Brute-force exact word-k-gram Jaccard pairs (trusted oracle). */
  private def bruteForcePairs(threshold: Double): Set[(Long, Long, Double)] = {
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val sets = rows.map { case (id, text) =>
      val w = text.split(" ")
      id -> w.sliding(cfg.shingleK).filter(_.length == cfg.shingleK)
        .map(_.mkString(" ")).toSet
    }.toMap
    (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a < b
      inter = (sa & sb).size.toDouble
      j = inter / (sa.size + sb.size - inter) if j >= threshold
    } yield (a, b, j)).toSet
  }

  test("LSH pipeline pair set == brute-force exact-jaccard pairs (recall and precision 1.0 at threshold 0.5)") {
    val got = Dedup.pairsMaterialized(docs, cfg).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = bruteForcePairs(cfg.threshold)
    assert(want.nonEmpty, "corpus should contain planted near-duplicates")
    val gotKeys = got.map(t => (t._1, t._2))
    val wantKeys = want.map(t => (t._1, t._2))
    val recall = (gotKeys & wantKeys).size.toDouble / wantKeys.size
    assert(recall >= 0.99, s"recall $recall < 0.99; missing ${wantKeys -- gotKeys}")
    assert(gotKeys == wantKeys, s"extra pairs: ${gotKeys -- wantKeys}")
    // exact jaccard values agree
    val wantMap = want.map(t => (t._1, t._2) -> t._3).toMap
    got.foreach { case (a, b, j) =>
      assert(math.abs(j - wantMap((a, b))) < 1e-12)
    }
  }

  test("salted candidate join produces the identical pair set") {
    val plain = Dedup.pairsMaterialized(docs, cfg, saltBuckets = 1).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Dedup.pairsMaterialized(docs, cfg, saltBuckets = 5).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plain == salted)
  }

  test("clusters = connected components of pair graph, id = min member (sequential union-find oracle)") {
    val pairEdges = Dedup.pairsMaterialized(docs, cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // sequential union-find oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairEdges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => k -> find(k)).toMap
    val got = Dedup.clusters(Dedup.pairsMaterialized(docs, cfg))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("cluster assignment invariant across shuffle-partition settings") {
    val p = Dedup.pairsMaterialized(docs, cfg)
    val base = Dedup.clusters(p).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val re = Dedup.clusters(p.repartition(17)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(base == re)
  }

  test("exact duplicates: hash-groupBy agrees with text equality") {
    val d = Dedup.exactDuplicates(docs)
    assert(d.agg(sum("n_docs")).head.getLong(0) == docs.count())
  }

  test("simhash block-join pairs are complete for hamming <= blocks-1") {
    val sigs = Dedup.signatures(Dedup.shingleSets(docs, cfg), cfg).cache()
    val got = Dedup.simhashPairs(sigs, hammingMax = 3, blocks = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force oracle over collected simhashes
    val fps = sigs.select("id", "simhash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      if java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (a, b)).toSet
    assert(got == want)
  }
}
