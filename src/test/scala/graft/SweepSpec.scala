package graft

import graft.corpus.SynthCorpus
import graft.pipeline.{Dedup, DedupConfig}

/** Config-sweep harness test (reference protocol
  * `benchmarks/evaluate.py:84-113`): the scoreboard must rank the
  * contract configuration (shingleK=3, threshold=0.5 — what the truth
  * labels are defined at) at least as high as every other grid cell.
  */
class SweepSpec extends SparkSpecBase {

  test("sweep scoreboard: default config wins or ties on F1 against labeled truth") {
    val (pages, labels) = SynthCorpus.generate(spark, seed = 99L,
      nBase = 400, dupRate = 0.25)
    val docs = Dedup.fromPages(pages).localCheckpoint(true)
    val lab = labels.localCheckpoint(true)
    val default = DedupConfig()
    val truth = SweepJob.truthPairs(pages, lab, default.threshold)
      .localCheckpoint(true)
    val grid = for {
      k <- Seq(2, 3, 4)
      tau <- Seq(0.3, 0.5, 0.7)
    } yield DedupConfig(shingleK = k, threshold = tau)
    val cells = grid.map(c => SweepJob.score(docs, truth, c))
    val defCell = cells.find(c =>
      c.shingleK == default.shingleK && c.threshold == default.threshold).get
    assert(defCell.recall == 1.0 && defCell.precision == 1.0,
      s"default config not perfect on its own contract: $defCell")
    cells.foreach(c => assert(defCell.f1 >= c.f1,
      s"default f1 ${defCell.f1} < cell $c"))
    // every cell's ranked lists are sane: mAP defined and within [0,1],
    // and the resampled-trials protocol (evaluate.py:97-106) holds:
    // 5 per-trial values, each a valid mAP, mean == reported mAP
    cells.foreach { c =>
      assert(c.mAP >= 0.0 && c.mAP <= 1.0)
      assert(c.mapTrials.size == 5, s"expected 5 trials: $c")
      c.mapTrials.foreach(t => assert(t >= 0.0 && t <= 1.0))
      assert(math.abs(c.mAP - c.mapTrials.sum / 5) < 1e-12)
    }
    // trials genuinely resample: at least one cell shows spread (the
    // corpus has enough queries that 5 distinct 80% samples cannot all
    // coincide everywhere)
    assert(cells.exists(c => c.mapTrials.distinct.size > 1),
      "all trials identical in every cell — resampling is a no-op")
    // PR-curve protocol (loading_utils.py:188-215): every cell carries
    // a 21-point curve on the monotone recall grid 0.00..1.00, pinned
    // at 1.0 for recall 0, bounded, and non-increasing in recall
    cells.foreach { c =>
      assert(c.prCurve.size == 21, s"expected 21 grid points: $c")
      assert(c.prCurve.head == 1.0)
      c.prCurve.foreach(p => assert(p >= 0.0 && p <= 1.0))
      c.prCurve.sliding(2).foreach {
        case Seq(a, b) => assert(a >= b - 1e-12,
          s"curve not monotone non-increasing: $a -> $b in $c")
        case _ => ()
      }
    }
    // the perfect-contract cell's curve is 1.0 everywhere its recall
    // reaches — precision 1.0 at every grid level for the default cell
    assert(defCell.prCurve.forall(p => math.abs(p - 1.0) < 1e-12),
      s"perfect P/R cell must have an all-1.0 curve: ${defCell.prCurve}")
  }
}
