package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality-evaluation metrics — the reference's mAP / precision-recall
  * protocol (`winnow/feature_extraction/loading_utils.py:169-215`,
  * harness `benchmarks/utils.py:74-100`, sweep `benchmarks/evaluate.py:
  * 84-113`) as DataFrame aggregations. Test/bench-side, not part of the
  * engine hot path (SURVEY.md A10).
  */
object Metrics {

  /** Mean average precision over ranked match lists.
    *
    * @param ranked (query_id, neighbor_id, rank) — rank 1 = best
    * @param truth  (query_id, neighbor_id) relevant pairs
    */
  def meanAveragePrecision(ranked: DataFrame, truth: DataFrame): Double = {
    import org.apache.spark.sql.expressions.Window
    val marked = ranked
      .join(truth.withColumn("rel", lit(1)),
        Seq("query_id", "neighbor_id"), "left_outer")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
    val w = Window.partitionBy("query_id").orderBy("rank")
    val sums = marked
      .withColumn("cum_rel", sum(col("rel")).over(w))
      .withColumn("prec_at_k",
        when(col("rel") === 1, col("cum_rel").cast("double") / col("rank")))
      .groupBy("query_id")
      .agg(sum(col("prec_at_k")).as("sum_prec"))
    // the AP denominator is the TOTAL relevant count per query from
    // TRUTH — retrieved or not — and a query whose relevants were
    // never retrieved scores 0 instead of being dropped: otherwise a
    // near-zero-recall config could report mAP ~1 (only queries with
    // no truth at all are outside the mean, per the standard protocol)
    val perQuery = truth.groupBy("query_id").agg(count(lit(1)).as("n_true"))
      .join(sums, Seq("query_id"), "left_outer")
      .select((coalesce(col("sum_prec"), lit(0.0)) / col("n_true")).as("ap"))
    val r = perQuery.agg(avg(col("ap"))).head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** Pair-level precision/recall of a predicted pair set vs truth
    * (canonical id_a < id_b both sides).
    */
  def pairPrecisionRecall(predicted: DataFrame, truth: DataFrame): (Double, Double) = {
    val p = predicted.select("id_a", "id_b").distinct()
    val t = truth.select("id_a", "id_b").distinct()
    val tp = p.join(t, Seq("id_a", "id_b"), "left_semi").count().toDouble
    val np = p.count(); val nt = t.count()
    (if (np == 0) 1.0 else tp / np, if (nt == 0) 1.0 else tp / nt)
  }
}
