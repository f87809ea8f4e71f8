package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe harness. Not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_asof_join", "q_jaccard_pairs", "q_join_agg_region",
        "q_left_join", "q_ivf_topk", "q_filter_project", "q_cosine_topk")
    names.foreach { n =>
      println(s"===================== $n =====================")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
