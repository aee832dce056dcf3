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
    val ap = marked
      .withColumn("cum_rel", sum(col("rel")).over(w))
      .withColumn("prec_at_k",
        when(col("rel") === 1, col("cum_rel").cast("double") / col("rank")))
      .groupBy("query_id")
      .agg((sum(col("prec_at_k")) /
        greatest(sum(col("rel")), lit(1))).as("ap"),
        sum(col("rel")).as("n_rel"))
      .where(col("n_rel") > 0)
    val r = ap.agg(avg(col("ap"))).head()
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
