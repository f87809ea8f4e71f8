package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical model fitting over groups (SURVEY.md §2b) — the closed-form
  * cases that reduce to aggregates, so they run as ONE hash-aggregate pass
  * at any scale (no iteration, no per-group driver work).
  */
object Stats {

  /** Per-group simple linear regression (closed-form OLS):
    * slope = cov(x,y)/var(x), intercept = ȳ − slope·x̄, plus r² and n —
    * the trend-per-segment primitive (drift per source, price curve per
    * part type, …).
    *
    * Built from the SAME covariance/variance aggregates both engines
    * implement (proven hash-stable at 6dp by the stats battery), composed
    * after the aggregate — one shuffle on the group key, partial
    * aggregation map-side. Groups with < 2 rows or zero variance yield
    * null slope/intercept/r2 rather than NaN/Infinity. */
  def groupOls(df: DataFrame, groupCol: String, xCol: String, yCol: String,
               roundScale: Int = 6): DataFrame = {
    val agg = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      covar_samp(col(xCol), col(yCol)).as("__cov"),
      var_samp(col(xCol)).as("__varx"),
      var_samp(col(yCol)).as("__vary"),
      avg(col(xCol)).as("__xbar"),
      avg(col(yCol)).as("__ybar"))
    val slope = when(col("__varx") > 0, col("__cov") / col("__varx"))
    // r² = cov²/(varx·vary) rather than corr(x,y)² — corr DIVIDES BY ZERO
    // on a zero-variance side (ANSI), and the explicit form lets the guard
    // run before any division so degenerate groups report null, never NaN
    val r2 = when(col("__varx") > 0 && col("__vary") > 0,
      (col("__cov") * col("__cov")) / (col("__varx") * col("__vary")))
    agg.select(col(groupCol), col("n"),
      round(slope, roundScale).as("slope"),
      round(col("__ybar") - slope * col("__xbar"), roundScale).as("intercept"),
      round(r2, roundScale).as("r2"))
  }
}
