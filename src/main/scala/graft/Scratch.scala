package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe harness. Not part of the driver contract. */
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"TIME $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val emb = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding")).cache()
    emb.count()
    val a = emb.toDF("id_a", "va")
    val b = emb.toDF("id_b", "vb")
    def pairs = a.crossJoin(b).filter(col("id_a") < col("id_b"))

    def run(label: String, c: org.apache.spark.sql.Column): Unit =
      time(label)(println("   sum=" + pairs.select(c.as("c")).agg(sum("c")).collect().head.getDouble(0)))

    // warm both plans
    pairs.select(VectorFunctions.cosineSimilarityHof(col("va"), col("vb")).as("c")).agg(sum("c")).collect()
    pairs.select(VectorFunctions.cosineSimilarity(col("va"), col("vb")).as("c")).agg(sum("c")).collect()

    run("cosine HOF  2M pairs", VectorFunctions.cosineSimilarityHof(col("va"), col("vb")))
    run("cosine native 2M pairs", VectorFunctions.cosineSimilarity(col("va"), col("vb")))
    run("cosine HOF  again", VectorFunctions.cosineSimilarityHof(col("va"), col("vb")))
    run("cosine native again", VectorFunctions.cosineSimilarity(col("va"), col("vb")))
    spark.stop()
  }
}
