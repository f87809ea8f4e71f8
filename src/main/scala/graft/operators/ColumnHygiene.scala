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
}
