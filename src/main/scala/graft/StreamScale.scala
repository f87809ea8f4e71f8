package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming scale probe (r12 verdict task #8): run the stateful session
  * operator against a FILE-SOURCE stream of the events table at a given
  * SF and print the final state-store telemetry — turning the scaladoc
  * O(keys) state-size claim into a measured (keys x bytes) number at
  * 10x/100x. The stream is the same parquet the batch queries read, cut
  * into micro-batches with maxFilesPerTrigger, so the state the operator
  * carries is exactly what an ingest of that corpus would hold.
  *
  * Not part of the driver contract (like ScaleUp/KCoreScale).
  * Usage: runMain graft.StreamScale <sfDir> [maxFilesPerTrigger] */
object StreamScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mfpt = if (args.length > 1) args(1) else "2"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file stream source requires a DIRECTORY; driver testdata is a
    // bare file per table — expose it through a symlink dir in that case
    val raw = new java.io.File(s"$sfDir/events.parquet")
    val path =
      if (raw.isDirectory) raw.getAbsolutePath
      else {
        val dir = java.nio.file.Files.createTempDirectory("streamscale_src")
        java.nio.file.Files.createSymbolicLink(
          dir.resolve("events.parquet"), raw.toPath.toAbsolutePath)
        dir.toString
      }
    val schema = Tables.rawEventSchema(spark, sfDir)
    val stream = Tables.normalizeEventTs(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", mfpt).parquet(path))
      .withWatermark("ts", "1 hour")
    val ckpt = s"/tmp/streamscale_ckpt_${System.nanoTime()}"
    val q = graft.streaming.EventStreams.statefulSessions(stream)
      .writeStream.outputMode("append").format("noop")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    val so = q.recentProgress.flatMap(_.stateOperators).lastOption
      .getOrElse(sys.error("no state operator progress reported"))
    val batches = q.recentProgress.length
    q.stop()
    val nEvents = Tables.events(spark, sfDir).count()
    val nUsers = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    println(s"""STREAMSCALE {"sf_dir":"$sfDir","events":$nEvents,""" +
      s""""users":$nUsers,"state_rows":${so.numRowsTotal},""" +
      s""""state_bytes":${so.memoryUsedBytes},"batches":$batches}""")
    spark.stop()
  }
}
