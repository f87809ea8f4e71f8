package graft

import graft.operators.{Dedup, Nested, Relational}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe harness for round-2 fixes. Not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "America/Sao_Paulo")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Probe 1: isoFormat under a non-UTC session timezone — offset must
    // match the rendered local time (was: local time labeled +0000).
    val iso = Seq("2024-01-15 12:00:00").toDF("s")
      .select(Relational.isoFormat(col("s").cast("timestamp")).as("iso"))
      .collect().head.getString(0)
    println(s"PROBE isoFormat(BRT session): $iso")

    // Probe 2: flattenStructs with special-char field names (dot + accents).
    val nested = spark.sql(
      """SELECT named_struct('Número do ticket', 7, 'a.b', 'x') AS `contact`,
                1 AS id""")
    val flat = Nested.flattenStructs(nested)
    println(s"PROBE flatten cols: ${flat.columns.mkString(" | ")}")
    flat.show(false)

    // Probe 3: LSH band hash must respect seed order — two docs whose
    // per-seed min-hashes are permutations of each other must NOT collide.
    val sig = Seq(
      (1L, 0, 5L), (1L, 1, 9L),   // doc 1: band 0 = [5, 9] in seed order
      (2L, 0, 9L), (2L, 1, 5L)    // doc 2: band 0 = [9, 5] — different signature
    ).toDF("doc_id", "seed", "min_hash")
    val cands = Dedup.minHashLshCandidates(sig, "doc_id", bands = 1, rowsPerBand = 2)
    println(s"PROBE permuted-band candidates (want 0): ${cands.count()}")

    // Probe 3b: identical signatures still collide.
    val sig2 = Seq((1L, 0, 5L), (1L, 1, 9L), (2L, 0, 5L), (2L, 1, 9L))
      .toDF("doc_id", "seed", "min_hash")
    val cands2 = Dedup.minHashLshCandidates(sig2, "doc_id", bands = 1, rowsPerBand = 2)
    println(s"PROBE identical-band candidates (want 1): ${cands2.count()}")

    spark.stop()
  }
}
