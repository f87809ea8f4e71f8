package graft

import graft.operators.Sinks
import graft.streaming.EventStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Scratch probe harness. Not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Drive the sink lifecycle end-to-end: create → append → evolve → dedup.
    val dest = java.nio.file.Files.createTempDirectory("probe-").toString + "/dest"
    val seed = StructType(Seq(StructField("chat_id", StringType), StructField("n_ticket", StringType)))
    println(s"PROBE created=${Sinks.createIfMissing(spark, dest, seed)} again=${Sinks.createIfMissing(spark, dest, seed)}")
    Sinks.appendEvolving(Seq(("c1", "t1")).toDF("chat_id", "n_ticket"), dest)
    Sinks.appendEvolving(Seq(("c2", "t2", "open")).toDF("chat_id", "n_ticket", "status"), dest)
    Sinks.readEvolved(spark, dest).orderBy("chat_id").show()
    // probe: append a batch MISSING a seed column
    Sinks.appendEvolving(Seq(("c3")).toDF("chat_id"), dest)
    println("PROBE after missing-column append:")
    Sinks.readEvolved(spark, dest).orderBy("chat_id").show()

    // Drive streaming custom state on the real events stream.
    val sf = "/root/testdata/sf0.001"
    val stream = EventStreams.readEventStream(spark, s"$sf/events.parquet",
      Tables.rawEventSchema(spark, sf))
    val q = EventStreams.runningUserStats(stream)
      .writeStream.outputMode("update").format("memory").queryName("probe_stats").start()
    q.processAllAvailable(); q.stop()
    println("PROBE streaming state rows=" + spark.table("probe_stats").count())
    spark.table("probe_stats").orderBy(desc("n_events")).show(3)
    spark.stop()
  }
}
