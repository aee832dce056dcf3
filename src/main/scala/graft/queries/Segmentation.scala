package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scene-boundary segmentation (reference
  * `winnow/utils/scene_detection.py:114-173`): per item, the distance
  * between adjacent units is compared against a PER-ITEM percentile
  * threshold (`scene_detection.py:143-144` uses the 90th percentile of
  * the frame-to-frame distances); units where the distance exceeds the
  * threshold start a new segment, and per-segment stats are emitted
  * (`159-172`: scene durations + counts — SURVEY.md A9).
  *
  * Re-expressed over a generic event stream: item = partition key,
  * unit = row ordered by (ts, event_id), distance = |value - lag(value)|.
  * Everything is a window/group plan — two shuffles total (one on the
  * partition key for the lag window, one for the grouped threshold,
  * re-used by the stats aggregation since the keys match).
  */
object Segmentation {

  /** Per-row segment assignment: (partition cols..., event_id, ts, value,
    * delta, seg_id). seg_id = running count of cuts within the partition
    * (0-based; the first row of each partition is never a cut).
    * Deltas and thresholds are rounded to 6 decimals before the cut
    * comparison so the decision is reproducible across engines.
    */
  def assignSegments(events: DataFrame, partitionCol: String = "user_id",
                     tsCol: String = "ts", idCol: String = "event_id",
                     valueCol: String = "value", pct: Double = 0.9): DataFrame = {
    val order = Seq(col(tsCol).asc, col(idCol).asc)
    val w = Window.partitionBy(partitionCol).orderBy(order: _*)
    val withDelta = events
      .withColumn("delta", abs(col(valueCol) - lag(col(valueCol), 1).over(w)))
    assignFromDeltas(withDelta, partitionCol, order, pct)
      .select(col(partitionCol), col(idCol), col(tsCol), col(valueCol),
        col("delta"), col("seg_id"))
  }

  /** Threshold + cut + running segment id over a frame that already
    * carries a nullable `delta` column (null on each partition's first
    * unit). The generic core shared by the event-stream path above and
    * the media frame-distance path (`BinaryPipeline.mediaScenes`, where
    * delta = cosine distance between adjacent frame feature vectors).
    */
  def assignFromDeltas(withDelta: DataFrame, partitionCol: String,
                       order: Seq[org.apache.spark.sql.Column],
                       pct: Double): DataFrame = {
    val w = Window.partitionBy(partitionCol).orderBy(order: _*)
    // per-item threshold: exact interpolated percentile of the deltas
    // (scene_detection.py:143-144); grouped agg + re-join keeps the plan
    // shuffle-partitioned by the item key throughout
    val thr = withDelta.where(col("delta").isNotNull)
      .groupBy(partitionCol)
      .agg(expr(s"percentile(delta, $pct)").as("thr"))
    withDelta.join(thr, Seq(partitionCol), "left_outer")
      .withColumn("cut",
        when(col("delta").isNotNull &&
          round(col("delta"), 6) > round(col("thr"), 6), 1).otherwise(0))
      .withColumn("seg_id",
        sum(col("cut")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** A9 per-segment stats (scene_detection.py:159-172): row count, mean
    * value, first/last unit timestamp per (item, segment).
    */
  def segmentStats(events: DataFrame, partitionCol: String = "user_id",
                   tsCol: String = "ts", idCol: String = "event_id",
                   valueCol: String = "value", pct: Double = 0.9): DataFrame =
    assignSegments(events, partitionCol, tsCol, idCol, valueCol, pct)
      .groupBy(col(partitionCol), col("seg_id"))
      .agg(count(lit(1)).as("n_events"),
        round(avg(col(valueCol)), 6).as("avg_value"),
        min(col(tsCol)).as("ts_min"),
        max(col(tsCol)).as("ts_max"))
}
