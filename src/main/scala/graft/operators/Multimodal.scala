package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2b): treat image/audio/video as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extract as distributed per-partition batch transforms.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * sandbox): [[stubDecode]] derives a deterministic fake feature vector
  * from the payload bytes. Everything around it — the schema contract, the
  * partition-wise batching, null/error columns, metadata extraction — is
  * the real Spark-side shape a production decode (JNI codec or Pandas UDF
  * in PySpark) would drop into.
  */
object Multimodal {

  /** Schema contract for a multimodal asset row. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = true),
    StructField("magic_hex", StringType, nullable = true)))

  /** Wrap raw (id, bytes) into the asset contract: typed metadata columns
    * computed from the payload — byte length, 4-byte magic prefix (hex),
    * media type sniffed from the magic. Pure column expressions. */
  def toAssets(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      col(payloadCol).cast("binary").as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("magic_hex", lower(hex(substring(col("payload"), 1, 4))))
      .withColumn("media_type",
        when(col("magic_hex").startsWith("89504e47"), "image/png")
          .when(col("magic_hex").startsWith("ffd8ff"), "image/jpeg")
          .when(col("magic_hex").startsWith("52494646"), "audio/wav")
          .otherwise("application/octet-stream"))
      .select(assetSchema.fieldNames.map(col).toIndexedSeq: _*)

  /** Frame sampling over a (character-addressed) payload: split into
    * `frameChars`-sized frames, keep every `every`-th, fingerprint the
    * sampled content. The video/audio frame-sample shape — pure codegen'd
    * expressions (sequence/filter/transform), no UDF, no shuffle; swap the
    * substring for a byte-range decode call and the plumbing is unchanged.
    * Output: id, n_frames, n_sampled, sample_md5. */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
                  frameChars: Int, every: Int): DataFrame = {
    val nFrames = ceil(length(col(payloadCol)) / lit(frameChars.toDouble)).cast("long")
    df
      .withColumn("n_frames", nFrames)
      .withColumn("__frames",
        when(col("n_frames") === 0, array().cast("array<string>"))
          .otherwise(expr(
            s"""transform(
               |  filter(sequence(0, n_frames - 1), i -> i % $every = 0),
               |  i -> substring($payloadCol, CAST(i * $frameChars + 1 AS INT), $frameChars))"""
              .stripMargin)))
      .select(col(idCol),
        col("n_frames"),
        size(col("__frames")).cast("long").as("n_sampled"),
        md5(concat_ws("", col("__frames")).cast("binary")).as("sample_md5"))
  }

  /** STUB resize: compute the real target geometry (fit inside maxDim
    * preserving aspect ratio — the part a production resize shares) and
    * derive a deterministic stand-in payload of the scaled size (real
    * codecs aren't in this sandbox). Schema/null handling mirror a real
    * partition-batched resize; swap the payload expression for a codec
    * call and nothing else changes. Expects (asset_id, payload, width,
    * height) columns. */
  def stubResize(assets: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(
      lit(maxDim.toDouble) / greatest(col("width"), col("height")).cast("double"),
      lit(1.0))
    assets
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
      .withColumn("out_payload",
        when(col("payload").isNull || col("width").isNull || col("height").isNull,
          lit(null).cast("binary"))
          // deterministic stand-in: truncate proportionally to pixel ratio
          .otherwise(col("payload").substr(lit(1),
            greatest(lit(1), ceil(length(col("payload")) * scale * scale)).cast("int"))))
  }

  /** Output schema of the decode stage. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = true),
    StructField("decode_error", StringType, nullable = true)))

  /** STUB decode: a real implementation would hand each partition's payload
    * batch to a codec (that boundary is exactly here — mapPartitions gives
    * amortized per-batch setup, the Scala analogue of mapInPandas batches).
    * The stub emits a deterministic `featureDim`-float vector derived from
    * payload bytes, and a decode_error column instead of failing the task
    * (per-row error capture, reference/chat.py:289-291 shape). */
  def stubDecode(assets: DataFrame, featureDim: Int = 8): DataFrame = {
    val spark = assets.sparkSession
    val rows = assets.select(col("asset_id"), col("payload")).rdd.mapPartitions { it =>
      // per-partition setup would init the codec once here
      it.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (payload == null)
          Row(id, null, "null payload")
        else {
          val feat = Array.tabulate(featureDim) { i =>
            var h = 1125899906842597L
            var j = i
            while (j < payload.length) { h = 31 * h + payload(j); j += featureDim }
            (h % 1000).toFloat / 1000.0f
          }
          Row(id, feat.toSeq, null)
        }
      }
    }
    spark.createDataFrame(rows, decodedSchema)
  }
}
