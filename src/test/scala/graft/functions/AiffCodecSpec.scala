package graft.functions

import graft.SparkSpec

/** AIFF codec conformance (E294): the big-endian container family —
  * the 80-bit extended sample-rate decode pinned on the canonical
  * public byte vectors, big-endian sample semantics, chunk-walk
  * strictness, and every reject path.
  */
class AiffCodecSpec extends SparkSpec {

  private def fixture(n: Int, seed: Int): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)((rng.nextInt(256) - 128).toByte)
  }

  private def be16(b: Array[Byte], o: Int): Int = {
    val u = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    if (u >= 32768) u - 65536 else u
  }

  test("80-bit extended rate: canonical vectors, exactness rejects") {
    // 8000 Hz = 0x400B FA00...: exponent 16383+12, mantissa 8000<<51
    val f8k = AiffCodec.encode(fixture(8, 41), 1, rate = 8000L)
    assert(f8k.slice(28, 38).map(_ & 0xff).toSeq ===
      Seq(0x40, 0x0B, 0xFA, 0x00, 0, 0, 0, 0, 0, 0),
      "the spec's own 8 kHz extended-float vector")
    assert(AiffCodec.decode(f8k).sampleRate === 8000L)
    // 44100 Hz = 0x400E AC44...
    val f441 = AiffCodec.encode(fixture(8, 41), 1, rate = 44100L)
    assert(f441.slice(28, 38).map(_ & 0xff).toSeq ===
      Seq(0x40, 0x0E, 0xAC, 0x44, 0, 0, 0, 0, 0, 0))
    assert(AiffCodec.decode(f441).sampleRate === 44100L)
    // NaN/inf exponent is a visible reject
    val nan = f8k.clone(); nan(28) = 0x7F; nan(29) = 0xFF.toByte
    assert(!AiffCodec.decode(nan).valid)
    // a negative rate (sign bit) is forged
    val neg = f8k.clone(); neg(28) = (neg(28) | 0x80).toByte
    assert(!AiffCodec.decode(neg).valid)
    // a non-integer rate (lost mantissa bits) is a visible reject
    val frac = f8k.clone(); frac(37) = (frac(37) | 1).toByte
    assert(!AiffCodec.decode(frac).valid)
  }

  test("round trip: big-endian samples, stereo interleave pinned") {
    val payload = fixture(2 * 7 + 1, 43) // 7 mono frames, 1 stray byte
    val d = AiffCodec.decode(AiffCodec.encode(payload, 1))
    assert(d.valid && d.nChannels === 1L && d.nFrames === 7L)
    val exp = (0 until 7).map(i => be16(payload, 2 * i).toLong)
    assert(d.sumS === exp.sum, "samples are BIG-endian, not WAV's LE")
    assert(d.sumAbs === exp.map(math.abs).sum)
    assert(d.sumIf === exp.zipWithIndex.map { case (s, i) => i * s }.sum)
    assert(d.sumL === exp.sum && d.sumR === 0L, "mono: all left, no right")
    // stereo: interleaved L R per frame, channel sums split
    val sp = fixture(4 * 5 + 3, 44)
    val ds = AiffCodec.decode(AiffCodec.encode(sp, 2))
    assert(ds.valid && ds.nChannels === 2L && ds.nFrames === 5L)
    val ls = (0 until 5).map(f => be16(sp, 4 * f).toLong)
    val rs = (0 until 5).map(f => be16(sp, 4 * f + 2).toLong)
    assert((ds.sumL, ds.sumR) === ((ls.sum, rs.sum)))
    assert(ds.sumIf === (0 until 5).map(f => f * (ls(f) + rs(f))).sum,
      "frame weighting pins the interleave order")
    // no full frame: encode drops
    assert(AiffCodec.encode(fixture(3, 45), 2) === null)
  }

  test("chunk walk: aux skipped with zero pad, strictness rejects") {
    val payload = fixture(4, 47) // 2 mono frames: COMM 12..37, SSND 38..
    val plain = AiffCodec.decode(AiffCodec.encode(payload, 1))
    // an ANNO chunk (odd size, zero pad) is skipped per EA IFF 85
    val aux = AiffCodec.encode(payload, 1, aux = true)
    assert(AiffCodec.decode(aux) === plain,
      "unknown chunks must be skipped, not fatal")
    // the ANNO pad byte (offset 25: 12 + 8 + 5) must be zero
    val dirtyPad = aux.clone(); dirtyPad(25) = 7
    assert(!AiffCodec.decode(dirtyPad).valid)
    val wire = AiffCodec.encode(payload, 1)
    // FORM size must match reality; trailing bytes reject
    val lie = wire.clone(); lie(7) = (lie(7) + 1).toByte
    assert(!AiffCodec.decode(lie).valid)
    assert(!AiffCodec.decode(wire :+ 0.toByte).valid)
    // COMM's declared frame count must agree with the data span
    val frames = wire.clone(); frames(25) = (frames(25) + 1).toByte
    assert(!AiffCodec.decode(frames).valid)
    // sampleSize != 16 is a visible reject
    val bits = wire.clone(); bits(27) = 8
    assert(!AiffCodec.decode(bits).valid)
    // a nonzero SSND offset (non-block-aligned wire) rejects visibly
    val off = wire.clone(); off(49) = 2
    assert(!AiffCodec.decode(off).valid)
    // SSND before COMM: data before its meaning (the PLTE discipline)
    val reordered = wire.slice(0, 12) ++ wire.slice(38, wire.length) ++
      wire.slice(12, 38)
    assert(!AiffCodec.decode(reordered).valid)
    // duplicate COMM is malformed
    val dup = wire.slice(0, 38) ++ wire.slice(12, 38) ++
      wire.slice(38, wire.length)
    val dupFixed = dup.clone()
    // patch FORM size for the inserted 26 bytes so the size audit
    // passes and the DUPLICATE check itself fires
    val newSize = (wire.length - 8) + 26
    dupFixed(4) = ((newSize >>> 24) & 0xff).toByte
    dupFixed(5) = ((newSize >>> 16) & 0xff).toByte
    dupFixed(6) = ((newSize >>> 8) & 0xff).toByte
    dupFixed(7) = (newSize & 0xff).toByte
    assert(!AiffCodec.decode(dupFixed).valid)
    // a WAV stream is not an AIFF
    assert(!AiffCodec.decode("RIFF1234WAVEfmt ".getBytes("ASCII") ++
      new Array[Byte](40)).valid)
  }

  test("engine surface: Multimodal.encodeAiff / aiffStats on documents") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 30)
    val assets = graft.ext.Multimodal.documentsAsAssets(docs)
    for (ch <- Seq(1, 2)) {
      val out = graft.ext.Multimodal.aiffStats(
        graft.ext.Multimodal.encodeAiff(assets, channels = ch)).collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        assert(r.getAs[Boolean]("is_valid"))
        assert(r.getAs[Long]("n_channels") === ch.toLong)
        assert(r.getAs[Long]("sample_rate") === 8000L)
      }
    }
  }
}
