package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level text analytics (SURVEY.md §2b text analysis): TF-IDF and
  * related term statistics over a documents table.
  *
  * Scale shape: one explode + two hash aggregates (term frequencies per
  * doc, document frequencies per term) and a broadcast-joinable term
  * dictionary — no crossJoin, no driver collect. The doc count N is a
  * scalar aggregate joined in (Catalyst plans it as a 1-row broadcast).
  */
object TextAnalytics {

  /** Term frequencies per (doc, term) — raw counts, not distinct. */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** TF-IDF per (doc, term): tf * ln(N / df) with df = #docs containing the
    * term. Returns all (doc, term) rows; use [[topTerms]] to bound output. */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col(idCol)).as("n_docs"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tf_idf", col("tf") * log(col("n_docs").cast("double") / col("df")))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tf_idf"))
  }

  /** Top-k terms per document by TF-IDF, ranked on the score rounded to
    * `roundScale` decimals with a term tiebreak — rounding before ranking
    * keeps the selection reproducible across engines (mathematically-equal
    * scores computed as different float expressions round identically,
    * where raw-double ordering could flip on the last ulp). This is the
    * bounded output form the harness oracle checks (q_tfidf). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int,
               roundScale: Int = 6): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf_idf").desc, col("term").asc)
    tfIdf(docs, idCol, textCol)
      .withColumn("tf_idf", round(col("tf_idf"), roundScale))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }
}
