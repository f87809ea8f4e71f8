package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe harness. Not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = spark.read.format("graft.sources.TicketDataSource")
      .option("start", "2024-01-01T00:00:00Z")
      .option("end", "2024-03-01T00:00:00Z")
      .load()
      .filter(col("created_at").between(
        lit("2024-01-05 00:00:00").cast("timestamp"),
        lit("2024-01-20 00:00:00").cast("timestamp")))
      .filter(col("status") =!= "Resolvido") // residual, NOT pushable
      .select(col("number"), col("status"), col("created_at"))
    df.explain("formatted")
    println("PROBE rows=" + df.count() + " partitions=" + df.rdd.getNumPartitions)
    df.orderBy("number").show(3)

    // probe: empty range (end before start after filters)
    val empty = spark.read.format("graft.sources.TicketDataSource")
      .option("start", "2024-01-01T00:00:00Z")
      .option("end", "2024-01-02T00:00:00Z")
      .load()
      .filter(col("created_at") >= lit("2025-01-01 00:00:00").cast("timestamp"))
    println("PROBE empty-range rows=" + empty.count())
    spark.stop()
  }
}
