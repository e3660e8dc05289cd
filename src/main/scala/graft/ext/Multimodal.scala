package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal asset handling (north-star extension): image/audio/video
  * payloads as opaque BINARY columns with typed metadata, plus the
  * decode / feature-extract plumbing a 100 TB media pipeline needs.
  *
  * The actual codec step is a STUB — media libraries are not available in
  * this environment — replaced by a deterministic digest-derived fake
  * (clearly marked below). Everything around it is real and tested: the
  * asset schema, binary columns, partition-sized batching, and the
  * feature-extraction interface. Swapping in a real decoder replaces ONE
  * function body without touching the pipeline shape.
  */
object Multimodal {

  /** Asset row schema: payload + typed metadata (the multimodal analog of
    * ColumnInfo metadata).
    */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("mime", StringType))), nullable = true)))

  /** Wrap a text corpus as binary assets — the test stand-in for real media
    * bytes (documents.text utf-8 encoded), keeping the pipeline shape
    * identical to a real asset table.
    */
  def documentsAsAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      lit("image").as("kind"),
      col("text").cast("binary").as("bytes"),
      struct(col("source"), lit("application/octet-stream").as("mime")).as("meta"))

  /** Cheap, codegen'd per-asset facts computed WITHOUT decoding: byte size
    * and content digest. These run at scan speed and are the dedup /
    * integrity layer for media lakes.
    */
  def withContentFacts(assets: DataFrame): DataFrame =
    assets
      .withColumn("n_bytes", octet_length(col("bytes")).cast("long"))
      .withColumn("content_digest", md5(col("bytes")))

  // ------------------------------------------------------------------
  // STUB DECODE: deterministic fake features derived from the content
  // digest. A real deployment replaces `fakeDecodedFeatures` with a codec
  // call (e.g. JNI image decode inside mapPartitions) — the surrounding
  // schema, batching and partitioning stay as-is.
  // ------------------------------------------------------------------

  /** Digest-derived pseudo-features (STUB): "width"/"height" from hex
    * slices, unit-interval "sharpness" from another slice. Deterministic,
    * portable, obviously fake — but shaped exactly like decoded metadata.
    */
  def fakeDecodedFeatures(assets: DataFrame): DataFrame = {
    val d = md5(col("bytes"))
    assets
      .withColumn("width", (conv(substr(d, lit(1), lit(4)), 16, 10).cast("long") % 1920 + 1).cast("int"))
      .withColumn("height", (conv(substr(d, lit(5), lit(4)), 16, 10).cast("long") % 1080 + 1).cast("int"))
      .withColumn(
        "sharpness",
        conv(substr(d, lit(9), lit(8)), 16, 10).cast("double") / math.pow(16, 8))
  }

  /** Partition-wise batched decode seam: groups each partition's assets into
    * fixed-size batches (the mapInPandas batch shape) and applies a
    * batch-level decode function. The default `decodeBatch` is the stub; a
    * real codec plugs in here with vectorized I/O amortized per batch.
    */
  def decodeInBatches(
      assets: DataFrame,
      batchSize: Int = 64,
      decodeBatch: Seq[Array[Byte]] => Seq[(Int, Int)] = stubBatchDecoder): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val out = assets
      .select(col("asset_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val feats = decodeBatch(batch.map(_._2))
          batch.zip(feats).map { case ((id, _), (w, h)) => (id, w, h) }
        }
      }
    out.toDF("asset_id", "width", "height")
  }

  /** STUB batch decoder: dimension pseudo-features from the digest (matches
    * fakeDecodedFeatures' formula; a real decoder would parse the payload).
    */
  def stubBatchDecoder(batch: Seq[Array[Byte]]): Seq[(Int, Int)] =
    batch.map { bytes =>
      val hex = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
      val w = (java.lang.Long.parseLong(hex.substring(0, 4), 16) % 1920 + 1).toInt
      val h = (java.lang.Long.parseLong(hex.substring(4, 8), 16) % 1080 + 1).toInt
      (w, h)
    }
}
