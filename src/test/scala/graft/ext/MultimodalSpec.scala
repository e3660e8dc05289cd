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
}
