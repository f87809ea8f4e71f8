package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Column-name and schema hygiene operators.
  *
  * Reproduces the reference's destination-schema rules (SURVEY.md §2 T6, T15,
  * T17): names restricted to `[0-9A-Za-z_]`, leading digit prefixed with `_`,
  * max 300 chars (reference/chat.py:21-31); duplicate columns dropped
  * keep-first (reference/main.py:125); absent expected columns backfilled as
  * nulls (reference/main.py:85-87).
  *
  * All of these are driver-side schema rewrites — zero data movement, no
  * shuffle, safe at any scale.
  */
object ColumnHygiene {

  /** Sanitize one column name: `[^0-9A-Za-z_]` → `_`, prefix `_` if the name
    * starts with a digit, truncate to 300 chars. */
  def sanitizeName(name: String): String = {
    val cleaned = name.replaceAll("[^0-9A-Za-z_]", "_")
    val prefixed = if (cleaned.headOption.exists(_.isDigit)) "_" + cleaned else cleaned
    prefixed.take(300)
  }

  /** Rename every column through [[sanitizeName]]. Pure metadata operation. */
  def sanitizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(sanitizeName).toIndexedSeq: _*)

  /** Drop duplicate column names keep-first (reference/main.py:125).
    * Renames positionally first so duplicate names are never referenced
    * ambiguously. */
  def dropDuplicateColumns(df: DataFrame): DataFrame = {
    val names = df.columns
    val tmp = df.toDF(names.indices.map(i => s"__c$i").toIndexedSeq: _*)
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    val keep = names.zipWithIndex.collect {
      case (c, i) if seen.add(c.toLowerCase) => col(s"__c$i").as(c)
    }
    tmp.select(keep.toIndexedSeq: _*)
  }

  /** For each expected column absent from the frame, add it as a typed null
    * (reference/main.py:85-87). */
  def backfill(df: DataFrame, expected: Seq[(String, DataType)]): DataFrame = {
    val present = df.columns.map(_.toLowerCase).toSet
    expected.foldLeft(df) { case (d, (name, dt)) =>
      if (present.contains(name.toLowerCase)) d
      else d.withColumn(name, lit(null).cast(dt))
    }
  }

  /** Data-quality profile of selected columns, one output row per column:
    * row count, null count, exact distinct count, min/max (as strings so
    * heterogeneous column types stack into one frame). The audit a
    * pipeline publishes next to every batch so schema/volume drift is
    * caught by diffing profiles, not by a consumer's failure.
    *
    * Single pass over the data: all per-column aggregates run in ONE
    * aggregate (multiple exact countDistinct trigger Spark's standard
    * expand — #cols × rows intermediate, fine for the handful of audited
    * key columns; use approx_count_distinct for wide audits), then the
    * 1-row result unpivots via `stack`. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
      countDistinct(col(c)).as(s"__dist_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `__nulls_$c`, `__dist_$c`, `__min_$c`, `__max_$c`").mkString(", ")
    wide.select(col("__n").as("n_rows"), expr(
        s"stack(${cols.size}, $stackArgs) AS (column, n_nulls, n_distinct, min_str, max_str)"))
      .select(col("column"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_str"), col("max_str"))
  }
}
