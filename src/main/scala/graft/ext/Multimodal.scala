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

  /** Aspect-preserving fit of (w, h) into a (maxW, maxH) box, never
    * upscaling — the thumbnail/resize math every media pipeline runs after
    * decode. Pure codegen'd arithmetic; returns a (w, h) struct.
    */
  def aspectFit(w: Column, h: Column, maxW: Int, maxH: Int): Column = {
    val scale = least(
      lit(maxW.toDouble) / w.cast("double"),
      lit(maxH.toDouble) / h.cast("double"),
      lit(1.0))
    struct(
      floor(w.cast("double") * scale).cast("int").as("w"),
      floor(h.cast("double") * scale).cast("int").as("h"))
  }

  /** Video-frame sampling plumbing: one row per sampled frame every
    * `everySeconds` across the asset's duration, each carrying the frame
    * decode key (digest:offset), stub frame dims, and aspect-fit thumbnail
    * dims. Duration and per-frame dims are digest-derived STUBS (no codecs
    * here); the fan-out itself is the real 100 TB shape — frame rows are
    * generated engine-side with `sequence`+`explode` (no UDF, no driver
    * loop), so a 2-hour video expands to its frame set at scan speed and
    * the downstream per-frame decode parallelizes over ROWS, not assets.
    */
  def withFrameSamples(
      assets: DataFrame,
      everySeconds: Int = 10,
      thumbW: Int = 224,
      thumbH: Int = 224): DataFrame = {
    val d = md5(col("bytes"))
    val fd = col("frame_digest")
    assets
      // STUB duration: 1..120 s from a digest slice disjoint from the
      // width/height/sharpness slices
      .withColumn("duration_s",
        (conv(substr(d, lit(17), lit(4)), 16, 10).cast("long") % 120 + 1).cast("int"))
      .withColumn("frame_offset_s",
        explode(sequence(lit(0), col("duration_s") - 1, lit(everySeconds))))
      .withColumn("frame_digest",
        md5(concat_ws(":", d, col("frame_offset_s"))))
      .withColumn("width",
        (conv(substr(fd, lit(1), lit(4)), 16, 10).cast("long") % 1920 + 1).cast("int"))
      .withColumn("height",
        (conv(substr(fd, lit(5), lit(4)), 16, 10).cast("long") % 1080 + 1).cast("int"))
      .withColumn("thumb", aspectFit(col("width"), col("height"), thumbW, thumbH))
      .withColumn("thumb_w", col("thumb.w"))
      .withColumn("thumb_h", col("thumb.h"))
      .drop("thumb")
  }

  /** PCM16 windowed energy (E197): a REAL decode, not a stub — PCM16LE is
    * pure arithmetic, so the engine decodes it natively: the asset's bytes
    * parse as little-endian signed 16-bit samples, frame into fixed
    * windows, and each window reports its exact integer energy Σv² — the
    * VAD / silence-detection primitive of every audio curation pipeline.
    * Decoding goes through `hex()` (bit-identical in Spark and DuckDB), so
    * the WHOLE decode replays in the oracle; a trailing odd byte is
    * ignored (PCM frames are 2-byte aligned).
    *
    * Scale: samples explode engine-side (`sequence`+`explode`, no UDF) —
    * one row per sample, all parsing codegen'd per row — and the window
    * aggregation map-side-combines on (asset, window). A 100 TB audio
    * lake streams through at scan speed; nothing is driver-side.
    */
  def pcmWindowEnergy(assets: DataFrame, windowSamples: Int = 16): DataFrame = {
    require(windowSamples >= 1, "windowSamples must be positive")
    val u =
      conv(expr("substring(h, cast(4 * i + 1 as int), 2)"), 16, 10).cast("long") +
        lit(256L) * conv(expr("substring(h, cast(4 * i + 3 as int), 2)"), 16, 10)
          .cast("long")
    val v = when(u >= 32768L, u - 65536L).otherwise(u)
    assets
      .select(col("asset_id"), hex(col("bytes")).as("h"),
        expr("octet_length(bytes) div 2").cast("long").as("ns"))
      .filter(col("ns") > 0) // sequence(0, -1) would DESCEND, not be empty
      .select(col("asset_id"), col("h"),
        explode(sequence(lit(0L), col("ns") - 1)).as("i"))
      .select(col("asset_id"), expr(s"i div $windowSamples").as("window_idx"),
        v.as("v"))
      .groupBy("asset_id", "window_idx")
      .agg(count(lit(1)).as("n_samples"),
        sum(col("v") * col("v")).cast("long").as("energy"))
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
