package graft.functions

import graft.SparkSpec

/** MJPEG-in-AVI container conformance (E240). Division of labor with the
  * q282 oracle: the DuckDB replay pins the per-block ARITHMETIC (it never
  * runs the codec); this spec pins what the oracle cannot see — the
  * container walk itself: RIFF framing, header/stream/index
  * cross-verification, per-frame decode routing, and every reject path.
  */
class AviCodecSpec extends SparkSpec {

  /** The expected whole-container sample sum: the integer pipeline per
    * 64-byte block over the whole-frame-truncated payload (frames are
    * bijective Huffman wrappers — the q282 oracle argument).
    */
  private def replaySum(payload: Array[Byte], frameBytes: Int): Long = {
    val usable = (payload.length / frameBytes) * frameBytes
    var sum = 0L
    for (blk <- 0 until usable / 64) {
      val s = Array.tabulate(64)(i => payload(blk * 64 + i) & 0xff)
      val rec = JpegDctCodec.dequantizeInverse(JpegDctCodec.forwardQuantize(s))
      sum += rec.map(_.toLong).sum
    }
    sum
  }

  private def fixture(n: Int, seed: Int = 7): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)((rng.nextInt(256) - 128).toByte)
  }

  private def mutated(bytes: Array[Byte], offset: Int, value: Int): Array[Byte] = {
    val out = bytes.clone()
    out(offset) = value.toByte
    out
  }

  /** Overwrite a little-endian u32 field in place (header surgery). */
  private def withU32(bytes: Array[Byte], offset: Int, v: Long): Array[Byte] = {
    val out = bytes.clone()
    out(offset) = (v & 0xff).toByte
    out(offset + 1) = ((v >>> 8) & 0xff).toByte
    out(offset + 2) = ((v >>> 16) & 0xff).toByte
    out(offset + 3) = ((v >>> 24) & 0xff).toByte
    out
  }

  // fixed header layout of the engine's container (verified below):
  // avih data at 32 (dwTotalFrames +16), strh data at 108 (handler +4,
  // dwLength +32), strf data at 172 (biWidth +4), movi LIST at 212
  private val AvihTotalFrames = 48
  private val StrhHandler = 112
  private val StrhLength = 140
  private val StrfBiWidth = 176
  private val MoviList = 212

  test("round-trip: container stats equal the whole-frame block replay") {
    // 3 whole frames + a 100-byte tail that must be truncated away
    val payload = fixture(3 * 128 + 100)
    val avi = AviCodec.encodeMjpegAvi(payload, 8, 128)
    assert(avi !== null)
    // layout anchors used by the surgery offsets below
    assert(new String(avi.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(avi.slice(MoviList, MoviList + 4), "US-ASCII") === "LIST")
    assert(new String(avi.slice(MoviList + 8, MoviList + 12), "US-ASCII") === "movi")
    val d = AviCodec.decodeMjpegAvi(avi)
    assert(d.valid)
    assert((d.nFrames, d.width, d.frameHeight) === ((3L, 8L, 16L)))
    assert(d.nPixels === 3L * 128)
    assert(d.nBlocks === 6L)
    assert(d.sumV === replaySum(payload, 128),
      "container stats must equal per-frame JPEG decode == raw block replay")
  }

  test("container sum equals the sum of independently decoded frames") {
    val payload = fixture(4 * 128, seed = 11)
    val avi = AviCodec.encodeMjpegAvi(payload, 8, 128)
    val whole = AviCodec.decodeMjpegAvi(avi)
    val perFrame = (0 until 4).map { f =>
      val jpeg = JpegDctCodec.encode(
        payload.slice(f * 128, (f + 1) * 128), 8)
      val d = JpegDctCodec.decode(jpeg)
      assert(d.valid && d.nComponents === 1L)
      d.sumV
    }.sum
    assert(whole.sumV === perFrame)
  }

  test("no full frame fits: encode returns null") {
    assert(AviCodec.encodeMjpegAvi(fixture(127), 8, 128) === null)
    assert(AviCodec.encodeMjpegAvi(Array.emptyByteArray, 8, 128) === null)
  }

  test("reject: truncated container and trailing garbage") {
    val avi = AviCodec.encodeMjpegAvi(fixture(2 * 128), 8, 128)
    assert(!AviCodec.decodeMjpegAvi(avi.dropRight(1)).valid,
      "RIFF size must cover the file exactly")
    assert(!AviCodec.decodeMjpegAvi(avi :+ 0.toByte).valid,
      "trailing bytes past the RIFF payload must invalidate")
    assert(!AviCodec.decodeMjpegAvi(avi.take(11)).valid)
  }

  test("reject: header lies about the frame count") {
    val avi = AviCodec.encodeMjpegAvi(fixture(3 * 128), 8, 128)
    // declare 4 frames in BOTH counts (consistent headers, so only the
    // movi-chunk cross-check can catch it)
    val lied = withU32(withU32(avi, AvihTotalFrames, 4), StrhLength, 4)
    assert(!AviCodec.decodeMjpegAvi(lied).valid,
      "declared frame count must match the chunks actually present")
    // counts that DISAGREE with each other are rejected at the header
    assert(!AviCodec.decodeMjpegAvi(withU32(avi, AvihTotalFrames, 4)).valid)
  }

  test("reject: wrong stream handler, wrong strf dimensions") {
    val avi = AviCodec.encodeMjpegAvi(fixture(2 * 128), 8, 128)
    // handler 'MJPG' -> 'MJPH'
    assert(!AviCodec.decodeMjpegAvi(mutated(avi, StrhHandler + 3, 'H')).valid)
    // strf biWidth disagrees with avih dwWidth
    assert(!AviCodec.decodeMjpegAvi(withU32(avi, StrfBiWidth, 16)).valid)
  }

  test("reject: index that disagrees with the chunks it indexes") {
    val avi = AviCodec.encodeMjpegAvi(fixture(2 * 128), 8, 128)
    // locate idx1 and corrupt the second entry's offset field
    val idx = avi.indices.find(i => i + 4 <= avi.length &&
      avi(i) == 'i' && avi(i + 1) == 'd' && avi(i + 2) == 'x' &&
      avi(i + 3) == '1').get
    val entry2Offset = idx + 8 + 16 + 8
    assert(!AviCodec.decodeMjpegAvi(
      withU32(avi, entry2Offset, 99999)).valid,
      "idx1 offsets are replayed against real chunk positions")
    val entry2Size = idx + 8 + 16 + 12
    assert(!AviCodec.decodeMjpegAvi(withU32(avi, entry2Size, 1)).valid,
      "idx1 sizes are replayed against real chunk sizes")
  }

  test("reject: a frame that is not a valid JPEG") {
    val avi = AviCodec.encodeMjpegAvi(fixture(2 * 128), 8, 128)
    // first chunk payload starts after 'movi' + '00dc' + size
    val frame0 = MoviList + 12 + 8
    assert((avi(frame0) & 0xff) === 0xff, "frame must start at SOI")
    assert(!AviCodec.decodeMjpegAvi(mutated(avi, frame0, 0x00)).valid,
      "a corrupt frame invalidates the whole container")
  }

  test("engine surface: Multimodal.encodeMjpegAvi / mjpegAviStats") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val assets = Seq(
      (1L, fixture(300, seed = 3)), // 2 whole frames + truncated tail
      (2L, fixture(64, seed = 4))   // below one frame: dropped
    ).toDF("asset_id", "bytes")
      .withColumn("kind", lit("video"))
      .withColumn("meta", struct(lit("s").as("source"), lit("m").as("mime")))
    val out = graft.ext.Multimodal.mjpegAviStats(
      graft.ext.Multimodal.encodeMjpegAvi(assets, width = 8, frameBytes = 128))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("asset_id") === 1L)
    assert(r.getAs[Boolean]("is_valid"))
    assert(r.getAs[Long]("n_frames") === 2L)
    assert(r.getAs[Long]("sum_v") === replaySum(fixture(300, seed = 3), 128))
  }
}
