package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling entry: time named queries individually against a
  * scale-factor dir, mirroring Bench's session config. Not part of the
  * driver contract. Usage: runMain graft.Profile <sfDir> <query>... */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session so per-query numbers are not warmup-polluted
    spark.range(1000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROFILE $name%-24s $dt%8.3f s  rows=$n")
    }
    spark.stop()
  }
}
