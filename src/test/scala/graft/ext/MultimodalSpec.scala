package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val assets =
    Multimodal.documentsAsAssets(Tables.documents(spark, sf0001)).cache()

  test("asset wrapping: binary payload + typed metadata") {
    val schema = assets.schema
    assert(schema("bytes").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    assert(assets.count() === 500)
  }

  test("content facts: byte length and digest computed without decode") {
    val r = Multimodal.withContentFacts(assets)
      .filter(col("asset_id") === 0).head
    assert(r.getAs[Long]("n_bytes") > 0)
    assert(r.getAs[String]("content_digest").length === 32)
  }

  test("batched decode seam agrees with the expression-level stub features") {
    val viaExpr = Multimodal.fakeDecodedFeatures(assets)
      .select("asset_id", "width", "height").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val viaBatch = Multimodal.decodeInBatches(assets, batchSize = 7)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(viaExpr === viaBatch)
  }

  test("aspectFit: downscales preserving ratio, never upscales") {
    import spark.implicits._
    val dims = Seq((1920, 1080), (100, 50), (4000, 1000), (224, 224))
      .toDF("w", "h")
      .select(Multimodal.aspectFit(col("w"), col("h"), 224, 224).as("t"))
      .select("t.w", "t.h").collect().map(r => (r.getInt(0), r.getInt(1)))
    // 1920x1080 → scale 224/1920: (224, floor(1080*0.11666)=126)
    assert(dims(0) === (224, 126))
    assert(dims(1) === (100, 50)) // already fits: untouched
    assert(dims(2) === (224, 56)) // wide pan: width-bound
    assert(dims(3) === (224, 224))
  }

  test("frame sampling: offsets cover the duration at the stride, per-frame keys unique") {
    val assets = Multimodal.documentsAsAssets(graft.Tables.documents(spark, sf0001))
    val frames = Multimodal.withFrameSamples(assets).collect()
    assert(frames.nonEmpty)
    val byAsset = frames.groupBy(_.getAs[Long]("asset_id"))
    byAsset.values.foreach { rows =>
      val dur = rows.head.getAs[Int]("duration_s")
      val offs = rows.map(_.getAs[Int]("frame_offset_s")).sorted.toSeq
      assert(offs === (0 until dur by 10).toSeq, s"bad offsets for duration $dur")
      assert(rows.map(_.getAs[String]("frame_digest")).distinct.length === rows.length)
      rows.foreach { r =>
        assert(r.getAs[Int]("thumb_w") <= 224 && r.getAs[Int]("thumb_h") <= 224)
      }
    }
  }

  test("pcmWindowEnergy: little-endian int16 decode, exact window energies") {
    import spark.implicits._
    // samples: 0x0001 = 1, 0x7FFF = 32767, 0x8000 = -32768; trailing odd
    // byte ignored (PCM frames are 2-byte aligned)
    val assets = Seq((1L, Array[Byte](
      0x01, 0x00, 0xFF.toByte, 0x7F, 0x00, 0x80.toByte, 0x2A)))
      .toDF("asset_id", "bytes")
    val out = Multimodal.pcmWindowEnergy(assets, windowSamples = 2)
      .collect().sortBy(_.getAs[Long]("window_idx"))
    assert(out.length === 2)
    assert(out(0).getAs[Long]("n_samples") === 2L)
    assert(out(0).getAs[Long]("energy") === 1L + 32767L * 32767L)
    assert(out(1).getAs[Long]("n_samples") === 1L)
    assert(out(1).getAs[Long]("energy") === 32768L * 32768L)
    // empty payload: no sample rows, no windows
    val empty = Seq((2L, Array.empty[Byte])).toDF("asset_id", "bytes")
    assert(Multimodal.pcmWindowEnergy(empty).isEmpty)
  }
}
