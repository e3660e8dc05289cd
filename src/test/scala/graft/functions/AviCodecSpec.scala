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

  /** Signed PCM16LE sample sum over the whole-frame-truncated payload —
    * the A+V fixture's audio expectation.
    */
  private def pcmSum(payload: Array[Byte], frameBytes: Int): Long = {
    val usable = (payload.length / frameBytes) * frameBytes
    var sum = 0L
    var i = 0
    while (i < usable) {
      val u = (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8)
      sum += (if (u >= 32768) u - 65536 else u)
      i += 2
    }
    sum
  }

  /** Splice a JUNK chunk at `at`, patching the RIFF size; `alsoPatch`
    * lists (u32 offset, delta) fixups for enclosing list sizes and idx1
    * offset entries (positions AFTER the splice point shift by the
    * chunk's full length).
    */
  private def withJunk(bytes: Array[Byte], at: Int, payloadLen: Int,
      alsoPatch: Seq[Int] = Nil): Array[Byte] = {
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte]((payloadLen & 0xff).toByte, ((payloadLen >> 8) & 0xff).toByte,
        ((payloadLen >> 16) & 0xff).toByte, ((payloadLen >> 24) & 0xff).toByte) ++
      new Array[Byte](payloadLen + (payloadLen & 1))
    val out = bytes.take(at) ++ junk ++ bytes.drop(at)
    // patch offsets are given in ORIGINAL coordinates; fields at or past
    // the splice point shifted by the junk length
    def bump(origOff: Int): Unit = {
      val off = if (origOff >= at) origOff + junk.length else origOff
      val v = (out(off) & 0xffL) | ((out(off + 1) & 0xffL) << 8) |
        ((out(off + 2) & 0xffL) << 16) | ((out(off + 3) & 0xffL) << 24)
      val nv = v + junk.length
      out(off) = (nv & 0xff).toByte
      out(off + 1) = ((nv >>> 8) & 0xff).toByte
      out(off + 2) = ((nv >>> 16) & 0xff).toByte
      out(off + 3) = ((nv >>> 24) & 0xff).toByte
    }
    bump(4) // RIFF size always covers the splice
    alsoPatch.foreach(bump)
    out
  }

  test("spec-legal JUNK padding chunks are skipped, stats unchanged") {
    val payload = fixture(3 * 128, seed = 31)
    val avi = AviCodec.encodeMjpegAvi(payload, 8, 128)
    val clean = AviCodec.decodeMjpegAvi(avi)
    assert(clean.valid)
    // top-level JUNK between hdrl and movi: only the RIFF size grows
    val topJunk = withJunk(avi, MoviList, 12)
    val d1 = AviCodec.decodeMjpegAvi(topJunk)
    assert(d1.valid, "top-level JUNK must be skipped")
    assert((d1.sumV, d1.nFrames, d1.nBlocks) ===
      ((clean.sumV, clean.nFrames, clean.nBlocks)))
    // JUNK inside movi (before the first chunk): the movi LIST size AND
    // every idx1 offset must be patched — real muxers index around JUNK
    val idx = avi.indices.find(i => i + 4 <= avi.length &&
      avi(i) == 'i' && avi(i + 1) == 'd' && avi(i + 2) == 'x' &&
      avi(i + 3) == '1').get
    val offsetFixups = (0 until 3).map(f => idx + 8 + 16 * f + 8)
    val moviJunk = withJunk(avi, MoviList + 12, 6,
      alsoPatch = (MoviList + 4) +: offsetFixups)
    val d2 = AviCodec.decodeMjpegAvi(moviJunk)
    assert(d2.valid, "in-movi JUNK must be skipped (idx1 offsets repatched)")
    assert(d2.sumV === clean.sumV)
    // a TRUNCATED junk chunk is still a visible finding
    val liar = withJunk(avi, MoviList, 1 << 20)
    assert(!AviCodec.decodeMjpegAvi(
      liar.take(liar.length - (1 << 20))).valid)
  }

  test("A+V shape: video replay + signed PCM sums demuxed from the interleave") {
    val payload = fixture(3 * 128 + 77, seed = 41)
    val avi = AviCodec.encodeAviAv(payload, 8, 128)
    assert(avi !== null)
    val d = AviCodec.decodeAviAv(avi)
    assert(d.valid)
    assert((d.nFrames, d.width, d.frameHeight) === ((3L, 8L, 16L)))
    assert(d.sumV === replaySum(payload, 128), "video stream must replay")
    assert(d.nSamples === 3L * 64, "64 PCM16 samples per 128-byte frame")
    assert(d.sumS === pcmSum(payload, 128), "audio stream must sum signed")
    // shape confusion is rejected both ways: a video-only container has
    // no audio stream; an A+V container declares two streams
    assert(!AviCodec.decodeAviAv(
      AviCodec.encodeMjpegAvi(payload, 8, 128)).valid)
    assert(!AviCodec.decodeMjpegAvi(avi).valid)
  }

  test("A+V reject paths: audio header lies and index type confusion") {
    val payload = fixture(2 * 128, seed = 43)
    val avi = AviCodec.encodeAviAv(payload, 8, 128)
    assert(AviCodec.decodeAviAv(avi).valid)
    // audio strl follows the video strl (which ends at 212): its LIST
    // header spans 212..223, the strh fourcc+size 224..231, so the
    // 56-byte strh data starts at 232
    val audioStrh = 232
    assert(new String(avi.slice(audioStrh - 8, audioStrh - 4), "US-ASCII")
      === "strh")
    // dwRate (offset 24): 8000 -> 8001 must invalidate
    val badRate = avi.clone(); badRate(audioStrh + 24) = 0x41
    assert(!AviCodec.decodeAviAv(badRate).valid)
    // dwSampleSize (offset 44): 2 -> 4 must invalidate
    val badSs = avi.clone(); badSs(audioStrh + 44) = 4
    assert(!AviCodec.decodeAviAv(badSs).valid)
    // idx1 ckid of the first audio chunk rewritten to a video ckid
    val idx = avi.indices.find(i => i + 4 <= avi.length &&
      avi(i) == 'i' && avi(i + 1) == 'd' && avi(i + 2) == 'x' &&
      avi(i + 3) == '1').get
    // entry 1 is the first audio chunk: rewrite its ckid '01wb' -> '01wc'
    val confused = avi.clone()
    confused(idx + 8 + 16 + 3) = 'c'
    assert(!AviCodec.decodeAviAv(confused).valid,
      "idx1 chunk ids are replayed against the walked chunk types")
  }

  test("engine surface: Multimodal.encodeAviAv / aviAvStats") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val assets = Seq((7L, fixture(500, seed = 47)))
      .toDF("asset_id", "bytes")
      .withColumn("kind", lit("video"))
      .withColumn("meta", struct(lit("s").as("source"), lit("m").as("mime")))
    val out = graft.ext.Multimodal.aviAvStats(
      graft.ext.Multimodal.encodeAviAv(assets, width = 8, frameBytes = 128))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Boolean]("is_valid"))
    assert(r.getAs[Long]("n_frames") === 3L)
    assert(r.getAs[Long]("n_samples") === 192L)
    assert(r.getAs[Long]("sum_v") === replaySum(fixture(500, seed = 47), 128))
    assert(r.getAs[Long]("sum_s") === pcmSum(fixture(500, seed = 47), 128))
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
