package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private val pngMagic = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 1, 2, 3)
  private val jpgMagic = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 9)

  test("toAssets extracts typed metadata and sniffs media type") {
    val df = Seq((1L, pngMagic), (2L, jpgMagic), (3L, "plain".getBytes))
      .toDF("id", "bytes")
    val out = Multimodal.toAssets(df, "id", "bytes")
    assert(out.schema === Multimodal.assetSchema)
    val byId = out.collect().map(r => r.getLong(0) ->
      (r.getAs[Long]("n_bytes"), r.getAs[String]("media_type"))).toMap
    assert(byId(1L) === ((7L, "image/png")))
    assert(byId(2L) === ((5L, "image/jpeg")))
    assert(byId(3L) === ((5L, "application/octet-stream")))
  }

  test("stubDecode emits fixed-dim features and per-row errors, never fails") {
    val df = Seq((1L, pngMagic), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "bytes")
    val assets = Multimodal.toAssets(df, "id", "bytes")
    val out = Multimodal.stubDecode(assets, featureDim = 8)
    assert(out.schema === Multimodal.decodedSchema)
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getSeq[Float](1).length === 8)
    assert(rows(1L).isNullAt(2))
    assert(rows(2L).isNullAt(1))
    assert(rows(2L).getString(2) === "null payload")
  }

  test("stubResize fits within maxDim preserving aspect, never upscales") {
    val df = Seq(
      (1L, "0123456789".getBytes, 4000, 1000),
      (2L, "0123456789".getBytes, 100, 200),   // already small → untouched
      (3L, null.asInstanceOf[Array[Byte]], 800, 600)
    ).toDF("asset_id", "payload", "width", "height")
    val out = Multimodal.stubResize(df, maxDim = 1000)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(r.fieldIndex("out_width")), r.getInt(r.fieldIndex("out_height")),
          Option(r.get(r.fieldIndex("out_payload")))
            .map(_.asInstanceOf[Array[Byte]].length)))).toMap
    assert(out(1L)._1 === 1000)
    assert(out(1L)._2 === 250)           // aspect preserved
    assert(out(2L) === ((100, 200, Some(10)))) // scale 1.0 → unchanged
    assert(out(3L)._3 === None)          // null payload propagates
  }

  test("stubDecode is deterministic") {
    val df = Seq((1L, pngMagic)).toDF("id", "bytes")
    val assets = Multimodal.toAssets(df, "id", "bytes")
    val a = Multimodal.stubDecode(assets).collect().head.getSeq[Float](1)
    val b = Multimodal.stubDecode(assets).collect().head.getSeq[Float](1)
    assert(a === b)
  }
}
