package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop single-query timer: `runMain graft.TimeQuery <sfDir> <q1,q2,…>`
  * — one untimed warmup then a timed noop-sink pass per query, mirroring
  * Bench's methodology so numbers are comparable. Not part of the driver
  * contract. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode))
      fn(spark, sfDir).foreach(_ => ())          // warmup
      val t0 = System.nanoTime()
      fn(spark, sfDir).foreach(_ => ())
      println(f"TIMED $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
