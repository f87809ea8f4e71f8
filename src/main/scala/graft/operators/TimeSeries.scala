package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization over event streams (SURVEY.md §2b): resample
  * an irregular event table onto a fixed grid and forward-fill the gaps —
  * the standard prep step before any per-entity sequence modeling (a model
  * wants one row per (entity, hour), not "whenever events happened").
  *
  * Scale shape: the bucket aggregate is one map-combined hash aggregate;
  * the grid is generated per entity with `sequence` + explode (rows ∝
  * entity's time span, no driver loop); the fill is a per-entity window —
  * entities are numerous and individually bounded, so the partitioning is
  * wide and no single task inherits the corpus (unlike a global window).
  */
object TimeSeries {

  /** Per-event rolling features over each entity's ordered series: previous
    * value (lag-1), trailing-k mean/stddev (the frame ENDS at the previous
    * row — features never leak the current value), and the rolling z-score
    * of the current value against that trailing window — the standard
    * online anomaly signal. Ordering is (ts, tiebreak) so runs are
    * deterministic under timestamp ties.
    *
    * Scale shape: one window pass partitioned by entity — no shuffle beyond
    * the partitionBy, no self-join per lag. Variance uses the sum-of-squares
    * identity clamped at 0 (floating cancellation can drive it epsilon-
    * negative); singleton/constant frames yield null z rather than NaN. */
  def rollingStats(series: DataFrame, entityCol: String, tsCol: String,
                   tieCol: String, valCol: String, k: Int): DataFrame = {
    require(k >= 2, s"rolling window must span >= 2 rows (got $k)")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val trail = w.rowsBetween(-k, -1)
    val n = count(col(valCol)).over(trail)
    val mean = avg(col(valCol)).over(trail)
    val sumsq = sum(col(valCol) * col(valCol)).over(trail)
    // sample variance from the trailing frame, clamped at 0
    val variance = greatest(
      (sumsq - n * mean * mean) / (n - lit(1)), lit(0.0))
    series.select(
      col(entityCol), col(tsCol), col(tieCol), col(valCol),
      lag(col(valCol), 1).over(w).as("prev_value"),
      when(n >= 1, mean).as("trail_mean"),
      when(n >= 2, sqrt(variance)).as("trail_sd"),
      when(n >= 2 && sqrt(variance) > 0,
        (col(valCol) - mean) / sqrt(variance)).as("rolling_z"))
  }

  /** Per-(entity, hour) activity on a DENSE hourly grid spanning each
    * entity's [first, last] event hour: `n` events (0 on gap hours) and
    * `v_filled` — the hour's sum carried forward through gaps (an entity's
    * "last known" value, the classic last-observation-carried-forward).
    * First grid row is always a real event hour, so `v_filled` never
    * starts null. */
  def resampleHourlyFill(events: DataFrame, entityCol: String, tsCol: String,
                         valCol: String): DataFrame = {
    val hours = events
      .groupBy(col(entityCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"), sum(col(valCol)).as("__v"))
    val grid = hours
      .groupBy(col(entityCol))
      .agg(min(col("hour")).as("__lo"), max(col("hour")).as("__hi"))
      .select(col(entityCol),
        explode(sequence(col("__lo"), col("__hi"), expr("INTERVAL 1 HOUR")))
          .as("hour"))
    val w = Window.partitionBy(col(entityCol)).orderBy(col("hour").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(hours, Seq(entityCol, "hour"), "left")
      .select(col(entityCol), col("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("__v"), ignoreNulls = true).over(w).as("v_filled"))
  }
}
