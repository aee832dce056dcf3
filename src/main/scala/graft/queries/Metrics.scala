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

  /** Interpolated precision at the 21-point recall grid
    * (0.00, 0.05, …, 1.00) — the reference's PR-curve protocol
    * (`winnow/feature_extraction/loading_utils.py:188-215`, plotted on
    * the same grid `:126-146`): per query, precision/recall at every
    * ranked cut; the curve value at recall level r is the MAX precision
    * over cuts reaching recall ≥ r (0 when the ranking never reaches
    * r — a truncated ranking must not inflate the tail); the reported
    * curve is the mean over queries with the recall-0 point pinned at
    * 1.0, exactly as the reference renders it.
    *
    * The grid comparison is done on cross-multiplied INTEGERS
    * (`20·cum_rel ≥ i·n_true` ⟺ recall ≥ i/20): `i*0.05` is not
    * representable in binary floating point, and a query at exactly a
    * grid recall (e.g. 3 of 20 relevant found) would otherwise fall out
    * of its own grid point.
    *
    * @param ranked (query_id, neighbor_id, rank) — rank 1 = best
    * @param truth  (query_id, neighbor_id) relevant pairs
    * @return 21 precision values at recall 0.00, 0.05, …, 1.00
    */
  def prCurve(ranked: DataFrame, truth: DataFrame): Seq[Double] = {
    import org.apache.spark.sql.expressions.Window
    val spark = ranked.sparkSession
    val marked = ranked
      .join(truth.withColumn("rel", lit(1)),
        Seq("query_id", "neighbor_id"), "left_outer")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
    val w = Window.partitionBy("query_id").orderBy("rank")
    val nTrue = truth.groupBy("query_id").agg(count(lit(1)).as("n_true"))
    val cuts = marked
      .withColumn("cum_rel", sum(col("rel")).over(w))
      .join(nTrue, Seq("query_id"))
      .withColumn("prec", col("cum_rel").cast("double") / col("rank"))
    val grid = spark.range(1, 21).select(col("id").as("i"))
    // max precision per (query, grid level) among cuts reaching it;
    // queries that never reach a level contribute 0 there (left join
    // from the full query x grid frame), matching the mAP contract that
    // zero-recall queries score 0 instead of vanishing from the mean
    val reached = cuts.crossJoin(broadcast(grid))
      .where(col("cum_rel") * 20 >= col("i") * col("n_true"))
      .groupBy("query_id", "i").agg(max(col("prec")).as("p"))
    val byLevel = nTrue.crossJoin(broadcast(grid))
      .join(reached, Seq("query_id", "i"), "left_outer")
      .groupBy("i").agg(avg(coalesce(col("p"), lit(0.0))).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    1.0 +: (1 to 20).map(i => byLevel.getOrElse(i.toLong, 0.0))
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
