package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sink-side semantics of the reference pipeline (SURVEY.md §2: K1, K2).
  *
  * The reference appends to a warehouse table with schema evolution
  * (reference/main.py:136-142, WRITE_APPEND + ALLOW_FIELD_ADDITION) and
  * creates the destination with a seed schema on first run
  * (reference/main.py:127-134). Here the destination is a parquet path:
  * appends are partition-parallel writes, schema evolution is parquet
  * `mergeSchema` on read, and create-if-missing is an empty first write.
  * (On a cluster the same calls target a Delta/Iceberg table and K3
  * becomes a real MERGE — Joins.upsert holds the set-oriented semantics.)
  */
object Sinks {

  /** K1: append a batch, tolerating new columns (schema evolution). The
    * write itself is append-only and distributed; readers see the union
    * schema via [[readEvolved]]. */
  def appendEvolving(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Read an evolved destination: union schema across all appended batches
    * (absent columns null-backfilled), the ALLOW_FIELD_ADDITION read view. */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  // ------------------------------------------------------- atomic commit
  //
  // Plain parquet append is NOT atomic: a writer that dies mid-job leaves
  // partial part-files that directory-listing readers (readEvolved, the
  // T16 anti-join) happily scan — the one failure mode the reference gets
  // covered for free by BigQuery load jobs (reference/main.py:136-142
  // blocks on job.result(); a failed load publishes nothing). The
  // manifest protocol below restores that guarantee on a plain
  // filesystem: data lands in a per-batch directory that no reader ever
  // lists, and becomes visible only when a manifest file NAMING the
  // batch's part-files appears under _manifests/ via an atomic rename
  // (POSIX/HDFS rename-within-directory is atomic; readers see the whole
  // batch or none of it). The manifest name is the caller's batch id, so
  // a replayed batch (at-least-once upstream, driver retry) is detected
  // and skipped — load-job idempotence, not just atomicity.

  private def fsFor(spark: SparkSession, root: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)

  /** K1 with warehouse-grade commit semantics: append `df` under `root`
    * atomically. Data is written to `root/data/<batchId>/` (a directory
    * readers never list directly), then published by renaming a fully
    * written+hsynced manifest into `root/_manifests/<batchId>.manifest`.
    * Returns false (and writes nothing new) when that manifest already
    * exists — the idempotent-replay contract. A writer crash before the
    * rename leaves only invisible garbage; a retry with the same batchId
    * overwrites the orphaned data dir and publishes once. */
  def appendAtomic(df: DataFrame, root: String, batchId: String): Boolean = {
    require(batchId.nonEmpty && !batchId.contains("/"),
      s"batchId must be a plain name: '$batchId'")
    val spark = df.sparkSession
    val fs = fsFor(spark, root)
    val manifestDir = new org.apache.hadoop.fs.Path(root, "_manifests")
    val manifest = new org.apache.hadoop.fs.Path(manifestDir, s"$batchId.manifest")
    if (fs.exists(manifest)) return false
    val dataDir = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(root, "data"), batchId)
    // overwrite: a retry of a crashed attempt rewrites its own orphan dir
    df.write.mode("overwrite").parquet(dataDir.toString)
    val parts = fs.listStatus(dataDir).map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") || n.startsWith("part-")).sorted
    fs.mkdirs(manifestDir)
    val tmp = new org.apache.hadoop.fs.Path(manifestDir, s".$batchId.inprogress")
    val out = fs.create(tmp, true)
    try {
      out.write(parts.map(n => s"data/$batchId/$n").mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.hsync()
    } finally out.close()
    // the commit point — atomic; losing a publish race to a concurrent
    // writer of the SAME batch id is a skip, not an error
    if (fs.rename(tmp, manifest)) true
    else { fs.delete(tmp, false); false }
  }

  /** The committed file list under an atomic destination: every path
    * named by a published manifest, in (batch, part) order. Empty when
    * nothing has committed — including when partial data dirs exist. */
  def committedFiles(spark: SparkSession, root: String): Seq[String] = {
    val fs = fsFor(spark, root)
    val manifestDir = new org.apache.hadoop.fs.Path(root, "_manifests")
    if (!fs.exists(manifestDir)) return Seq.empty
    fs.listStatus(manifestDir).map(_.getPath)
      .filter(_.getName.endsWith(".manifest")).sortBy(_.getName).toSeq
      .flatMap { m =>
        val in = fs.open(m)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      }
      .filter(_.nonEmpty)
      .map(rel => new org.apache.hadoop.fs.Path(root, rel).toString)
  }

  /** [[readEvolved]] over an atomic destination: union schema across the
    * COMMITTED batches only — torn writes, in-flight batches and orphaned
    * data dirs are invisible because readers resolve the manifest set,
    * never the directory listing. */
  def readCommitted(spark: SparkSession, root: String): DataFrame = {
    val files = committedFiles(spark, root)
    require(files.nonEmpty, s"no committed batches under $root")
    spark.read.option("mergeSchema", "true").parquet(files: _*)
  }

  /** Format round-trip helpers: the engine is format-agnostic (any
    * DataFrameReader source), but JSONL matters specifically because the
    * reference's upstream is JSON documents — landing raw API pages as
    * JSONL and reading them back with an enforced schema is the standard
    * ingest layout. CSV requires the explicit schema (no type fidelity in
    * the format itself). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** ORC round-trip — the OTHER columnar warehouse format next to
    * parquet: typed schema travels in the file, and filters/projections
    * push down to stripes exactly like parquet row groups (SinksSpec
    * pins PushedFilters in the scan plan). Interop surface for
    * Hive-lineage warehouses. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Write partitioned by a (low-cardinality, typically time-derived)
    * column: each value becomes a directory, and any query filtering on it
    * prunes whole partitions at planning time (PartitionFilters in the
    * scan) — the reference's 7-day window splitting (ticket.py:31-38)
    * turned into the storage layout, and the first-order scan optimization
    * at 100 TB. Pair with `Relational.timeBucket` for the partition key. */
  def writePartitioned(df: DataFrame, partitionCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Write a table bucketed (and sorted) on a join key: the shuffle happens
    * once at write time, and every later join/aggregate on that key plans
    * with NO exchange on this side (asserted in BucketedJoinSpec). The
    * partitioning contract big fact-to-fact joins need at 100 TB — pair
    * with identical bucket counts on both join sides. */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table) // managed table in the session warehouse

  /** Write range-sorted on an ordering column (typically event time):
    * `repartitionByRange` gives each output file a DISJOINT value range
    * and `sortWithinPartitions` orders rows inside each file, so parquet
    * min/max statistics prune at two levels on any range predicate —
    * whole files at planning/runtime, then row groups inside surviving
    * files. The complement to [[writePartitioned]]: partitioning prunes on
    * the coarse derived key (day), the sorted layout prunes WITHIN a
    * partition (hour/minute ranges) without directory explosion — at
    * 100 TB you want both. `files` sizes the range buckets; disjointness
    * is asserted file-by-file in SinksSpec. */
  def writeSorted(df: DataFrame, sortCol: String, files: Int, path: String): Unit = {
    require(files > 0, s"files must be positive: $files")
    df.repartitionByRange(files, org.apache.spark.sql.functions.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)
  }

  /** Morton (Z-order) key: interleave the low `bits` bits of two
    * non-negative integer columns — bit i of `x` lands at position 2i,
    * bit i of `y` at 2i+1 (public: Morton '66; the layout behind every
    * lakehouse OPTIMIZE ZORDER). Sorting by the interleaved key clusters
    * BOTH dimensions at once, so a range predicate on EITHER column prunes
    * files/row groups via parquet min/max stats — where a single-column
    * sort ([[writeSorted]]) only ever prunes on its one column.
    *
    * Pure per-row bit arithmetic (a static fold of shift/and/or — one
    * codegen'd projection, no shuffle, no UDF). Inputs must be
    * non-negative; bits above `bits` are ignored (values alias into the
    * low range — acceptable for clustering, wrong for equality, so keep
    * `bits` ≥ the max value's width). */
  def mortonKey(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    import org.apache.spark.sql.functions._
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x.cast("long"), b).bitwiseAND(1L), 2 * b))
        .bitwiseOR(shiftleft(shiftright(y.cast("long"), b).bitwiseAND(1L), 2 * b + 1))
    }
  }

  /** Write Z-ordered on two dimensions: range-partition + sort on the
    * Morton key of (xCol, yCol), so each output file covers a compact
    * rectangle-ish region of the (x, y) plane and min/max skipping works
    * for predicates on either column. Same two-level pruning story as
    * [[writeSorted]], generalized to two dimensions. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, files: Int,
                    path: String, bits: Int = 21): Unit = {
    require(files > 0, s"files must be positive: $files")
    import org.apache.spark.sql.functions.col
    df.withColumn("__zkey", mortonKey(col(xCol), col(yCol), bits))
      .repartitionByRange(files, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ⌈current-bytes / targetBytes⌉ files. THE maintenance job every
    * append-heavy table needs — a year of incremental micro-batches
    * leaves thousands of KB-sized files, and at 100 TB the scan's task
    * count (and the NameNode/listing pressure) is driven by file count,
    * not data size. Sizing from the CURRENT on-disk footprint (not row
    * counts) keeps the math right under compression and wide/narrow
    * schemas alike. Writes to a NEW directory — Spark cannot safely
    * overwrite an input path it is still reading; callers swap
    * directories atomically afterwards. Returns the file count written. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inDir), spark.sparkContext.hadoopConfiguration)
    // compare QUALIFIED paths — a raw string check lets trailing-slash /
    // relative / scheme aliases smuggle an in-place overwrite through,
    // and overwrite-while-reading deletes the input mid-job
    val qIn = fs.makeQualified(new org.apache.hadoop.fs.Path(inDir))
    val qOut = fs.makeQualified(new org.apache.hadoop.fs.Path(outDir))
    require(qIn != qOut, "compact cannot overwrite its input in place")
    val totalBytes = fs.getContentSummary(qIn).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** K2: create the destination with a seed schema iff missing; returns
    * true when it created. Mirrors get_table-or-create
    * (reference/main.py:127-134): an empty write materializes the path
    * with the seed schema so later appends/evolved reads line up. */
  def createIfMissing(spark: SparkSession, path: String, seed: StructType): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(p)) false
    else {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], seed)
        .write.mode("overwrite").parquet(path)
      true
    }
  }
}
