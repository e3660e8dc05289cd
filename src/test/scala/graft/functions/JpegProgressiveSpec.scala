package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Progressive (SOF2) JPEG codec conformance (E237, ITU-T T.81 Annex G).
  *
  * Division of labor, as for the baseline codec: the q279 DuckDB oracle
  * replays the integer transform pipeline independently (it is q272's
  * replay verbatim — scan structure never changes the coefficients), so
  * the arithmetic is cross-engine-pinned there; this spec pins what the
  * oracle cannot see — the six-scan progressive entropy layer being
  * BIJECTIVE on the quantized coefficient plane (spectral selection,
  * successive approximation, EOBRUN spanning blocks, refinement
  * correction-bit ordering), plus hand-derived streams decoded bit by
  * bit, plus every reject path of the scan-script discipline.
  */
class JpegProgressiveSpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  /** Integer-pipeline replay for a width-`width` grayscale payload: the
    * expected reconstruction no matter how the scans were ordered.
    */
  private def replaySum(payload: Array[Byte], width: Int = 8): Long = {
    val blocksPerRow = width / 8
    val blockRows = payload.length / (width * 8)
    var sum = 0L
    for (by <- 0 until blockRows; bx <- 0 until blocksPerRow) {
      val s = Array.tabulate(64)(i =>
        payload((by * 8 + i / 8) * width + bx * 8 + i % 8) & 0xff)
      val rec = JpegDctCodec.dequantizeInverse(JpegDctCodec.forwardQuantize(s))
      sum += rec.map(_.toLong).sum
    }
    sum
  }

  private def countMarker(bs: Array[Byte], m: Int): Int =
    bs.sliding(2).count(s => (s(0) & 0xff) == 0xff && (s(1) & 0xff) == m)

  test("progressive stream structure: SOF2 + six scans") {
    val enc = JpegDctCodec.encodeProgressive(
      Array.tabulate(256)(i => (i * 7).toByte), 8)
    assert(enc !== null)
    assert(countMarker(enc, 0xc2) === 1, "frame must be SOF2")
    assert(countMarker(enc, 0xc0) === 0)
    assert(countMarker(enc, 0xda) === 6,
      "DC first, two AC firsts, DC refine, two AC refines")
  }

  test("six-scan entropy layer is bijective: decode equals the pipeline replay") {
    val rng = new scala.util.Random(42)
    for (trial <- 0 until 6) {
      val payload = Array.fill(64 * (2 + trial * 3))(rng.nextInt(256).toByte)
      val enc = JpegDctCodec.encodeProgressive(payload, 8)
      assert(enc !== null)
      val d = JpegDctCodec.decode(enc)
      assert(d.valid, s"trial $trial must decode")
      assert(d.sumV === replaySum(payload),
        s"trial $trial: progressive scans must be lossless on the coefficients")
      assert(d.nBlocks === payload.length / 64)
    }
    // multi-column block rows exercise raster order across the plane
    val wide = Array.fill(24 * 16)(rng.nextInt(256).toByte)
    val d = JpegDctCodec.decode(JpegDctCodec.encodeProgressive(wide, 24))
    assert(d.valid && d.width === 24L && d.height === 16L)
    assert(d.sumV === replaySum(wide, 24))
  }

  test("progressive equals baseline: same payload, same stats, different stream") {
    val rng = new scala.util.Random(7)
    val payload = Array.fill(64 * 9)(rng.nextInt(256).toByte)
    val base = JpegDctCodec.decode(JpegDctCodec.encode(payload, 8))
    val prog = JpegDctCodec.decode(JpegDctCodec.encodeProgressive(payload, 8))
    assert(base.valid && prog.valid)
    assert((prog.sumV, prog.nPixels, prog.nBlocks) ===
      ((base.sumV, base.nPixels, base.nBlocks)),
      "scan order changes the stream, never the samples")
  }

  test("flat payloads exercise long EOBRUNs across blocks") {
    // constant 128 ⇒ every coefficient zero ⇒ the AC first scans code the
    // whole plane as one EOBn run (EOBRUN machinery, extension bits)
    val flat = Array.fill(64 * 40)(128.toByte)
    val enc = JpegDctCodec.encodeProgressive(flat, 8)
    val d = JpegDctCodec.decode(enc)
    assert(d.valid)
    assert(d.sumV === 64L * 40 * 128)
  }

  // ---- hand-built minimal streams: segment helpers ----
  private def seg(marker: Int, body: Array[Byte]): Array[Byte] =
    b(0xff, marker, ((body.length + 2) >> 8) & 0xff,
      (body.length + 2) & 0xff) ++ body
  private val dqtOnes = seg(0xdb, (0x00 +: Seq.fill(64)(1)).map(_.toByte).toArray)
  private val dhtDc = seg(0xc4,
    ((0x00 +: (1 +: Seq.fill(15)(0))) :+ 0x00).map(_.toByte).toArray)
  // AC table: two 1-bit codes — code 0 -> first val, code 1 -> second
  private def dhtAc(v0: Int, v1: Int): Array[Byte] = seg(0xc4,
    (((0x10 +: (2 +: Seq.fill(15)(0))) :+ v0) :+ v1).map(_.toByte).toArray)
  private val sof2 = seg(0xc2, Seq(8, 0, 8, 0, 8, 1, 1, 0x11, 0).map(_.toByte).toArray)
  private def sos(ss: Int, se: Int, ahal: Int, entropy: Array[Byte]): Array[Byte] =
    seg(0xda, Seq(1, 1, 0x00, ss, se, ahal).map(_.toByte).toArray) ++ entropy

  test("hand-derived two-scan stream decodes bit-exactly") {
    // DC scan (Ss=0,Se=0,Ah=0,Al=0): one bit '0' = category 0 -> DC 0,
    // padded to 0x7F. AC scan (1..63, Ah=Al=0) through the custom table
    // {0 -> (r=0,s=1), 1 -> EOB0}: bits [0][1][1] = place +1 at zigzag
    // k=1, then EOB — 0x7F again. Every band reaches Al=0: complete.
    val stream = b(0xff, 0xd8) ++ dqtOnes ++ dhtDc ++ dhtAc(0x01, 0x00) ++
      sof2 ++ sos(0, 0, 0x00, b(0x7f)) ++ sos(1, 63, 0x00, b(0x7f)) ++
      b(0xff, 0xd9)
    val d = JpegDctCodec.decode(stream)
    assert(d.valid, "the hand-built two-scan stream must decode")
    val qc = new Array[Long](64)
    qc(1) = 1L // zigzag position 1 = natural index 1
    val expected = JpegDctCodec
      .dequantizeInverseWith(qc, Array.fill(64)(1)).map(_.toLong).sum
    assert(d.sumV === expected)
    assert((d.width, d.height, d.nBlocks, d.nComponents) === ((8L, 8L, 1L, 1L)))
  }

  test("scan-script discipline: every illegal script is a visible finding") {
    val dc = sos(0, 0, 0x00, b(0x7f))
    val ac = sos(1, 63, 0x00, b(0x7f))
    val head = b(0xff, 0xd8) ++ dqtOnes ++ dhtDc ++ dhtAc(0x01, 0x00) ++ sof2
    val eoi = b(0xff, 0xd9)
    // the complete script decodes (control)
    assert(JpegDctCodec.decode(head ++ dc ++ ac ++ eoi).valid)
    // incomplete: missing the AC band entirely (a truncated progressive
    // file is not a best-effort preview)
    assert(!JpegDctCodec.decode(head ++ dc ++ eoi).valid)
    // AC before DC
    assert(!JpegDctCodec.decode(head ++ ac ++ dc ++ eoi).valid)
    // re-coding an already-coded band with Ah=0
    assert(!JpegDctCodec.decode(head ++ dc ++ dc ++ ac ++ eoi).valid)
    // a refinement that skips a level: DC at Al=0, then Ah=2 refinement
    assert(!JpegDctCodec.decode(head ++ dc ++
      sos(0, 0, 0x21, b(0x7f)) ++ ac ++ eoi).valid)
    // DC and AC in one scan (Ss=0, Se=63)
    assert(!JpegDctCodec.decode(head ++ sos(0, 63, 0x00, b(0x7f)) ++ eoi).valid)
    // EOI before any scan
    assert(!JpegDctCodec.decode(head ++ eoi).valid)
    // trailing garbage after EOI
    assert(!JpegDctCodec.decode(head ++ dc ++ ac ++ eoi ++ b(0x00)).valid)
    // 3-component progressive frames are a visible finding (documented)
    val sof2c3 = seg(0xc2, Seq(8, 0, 16, 0, 16, 3, 1, 0x22, 0, 2, 0x11, 1,
      3, 0x11, 1).map(_.toByte).toArray)
    assert(!JpegDctCodec.decode(b(0xff, 0xd8) ++ dqtOnes ++ dhtDc ++
      dhtAc(0x01, 0x00) ++ sof2c3 ++ dc ++ eoi).valid)
  }

  test("EOBn overruns and truncation are rejected") {
    val head = b(0xff, 0xd8) ++ dqtOnes ++ dhtDc ++ dhtAc(0x01, 0x10) ++ sof2
    val dc = sos(0, 0, 0x00, b(0x7f))
    val eoi = b(0xff, 0xd9)
    // AC table code 1 -> EOBn with r=1: eobrun = 2 + one extension bit.
    // Entropy bits [1][0] = EOB run of 2 blocks — but the plane has ONE
    // block: the run survives past the last block and must invalidate
    val overrun = head ++ dc ++ sos(1, 63, 0x00, b(0xbf)) ++ eoi
    assert(!JpegDctCodec.decode(overrun).valid,
      "an EOB run past the last block is corrupt")
    // truncation mid-scan: drop the final bytes of a good stream
    val good = JpegDctCodec.encodeProgressive(
      Array.tabulate(192)(i => (i * 11).toByte), 8)
    assert(JpegDctCodec.decode(good).valid)
    assert(!JpegDctCodec.decode(good.take(good.length - 3)).valid)
    // forged giant SOF2 dims over a tiny stream: fail fast, never a
    // giant allocation (the plane is bounded by the remaining bits)
    val sofIdx = {
      var i = 2
      while (!((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc2)) i += 1
      i
    }
    val forged = good.clone()
    forged(sofIdx + 5) = 0xff.toByte; forged(sofIdx + 6) = 0xf8.toByte
    forged(sofIdx + 7) = 0xff.toByte; forged(sofIdx + 8) = 0xf8.toByte
    val t0 = System.nanoTime()
    assert(!JpegDctCodec.decode(forged).valid)
    assert(System.nanoTime() - t0 < 2e9, "forged dims must not loop or allocate")
  }

  test("engine wrapper: q279 shape on synthetic assets") {
    // the Spark-side plumbing is pinned by the q279 oracle at sf0.01;
    // here just prove the expression registers and nulls flow through
    val payload = Array.tabulate(640)(i => (i * 3).toByte)
    val enc = JpegDctCodec.encodeProgressive(payload, 8)
    val d = JpegDctCodec.decode(enc)
    assert(d.valid && d.nBlocks === 10L)
    assert(JpegDctCodec.encodeProgressive(new Array[Byte](63), 8) === null)
    assert(JpegDctCodec.encodeProgressive(new Array[Byte](8192 * 64), 8) === null)
  }
}
