package graft.functions

import graft.SparkSpec

/** FLAC codec conformance (E253, the public FLAC spec / RFC 9639). The
  * q299 oracle pins the arithmetic (sample sums off raw payload bytes);
  * this spec pins the entropy layer — Rice round-trips through every
  * fixed-predictor order, CRC-8/CRC-16 verification, the STREAMINFO MD5
  * identity, the decode-only surfaces (Rice escapes, partition orders,
  * wasted bits) via hand-built streams, and every reject path.
  */
class FlacCodecSpec extends SparkSpec {

  private def fixture(n: Int, seed: Int): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)((rng.nextInt(256) - 128).toByte)
  }

  private def samplesOf(payload: Array[Byte]): Array[Int] =
    Array.tabulate(payload.length / 2)(i =>
      ((payload(2 * i) & 0xff) | (payload(2 * i + 1) << 8)).toShort.toInt)

  private def expected(payload: Array[Byte]): (Long, Long, Long) = {
    val xs = samplesOf(payload)
    var ss = 0L; var sa = 0L; var si = 0L
    for (i <- xs.indices) {
      ss += xs(i); sa += math.abs(xs(i)); si += i.toLong * xs(i)
    }
    (ss, sa, si)
  }

  test("random PCM round-trips; the stream's own MD5 proves the identity") {
    for (seed <- 1 to 3) {
      val payload = fixture(4 * 576 * 2 + 333, seed) // 4 full frames + tail
      val flac = FlacCodec.encodeFlac(payload)
      assert(flac !== null)
      val d = FlacCodec.decodeFlac(flac)
      assert(d.valid, s"seed $seed must decode")
      assert(d.nFrames === 5L)
      assert(d.nSamples === (payload.length / 2).toLong)
      val (ss, sa, si) = expected(payload)
      assert((d.sumS, d.sumAbs, d.sumIs) === ((ss, sa, si)),
        s"seed $seed: Rice layer must be lossless")
    }
    // no full sample: encode drops
    assert(FlacCodec.encodeFlac(Array[Byte](7)) === null)
  }

  test("subframe selection: constant, smooth (fixed), and noise (verbatim)") {
    // constant PCM -> CONSTANT subframes
    val flat = Array.fill(576 * 2)(0x20.toByte) // sample 0x2020 repeated
    val dFlat = FlacCodec.decodeFlac(FlacCodec.encodeFlac(flat))
    assert(dFlat.valid && dFlat.sumS === 576L * 0x2020)
    // a linear ramp is exactly order-2-predictable: residuals all zero,
    // so the frame must come out FAR smaller than the raw PCM
    val ramp = new Array[Byte](576 * 2)
    for (i <- 0 until 576) {
      val v = i * 7 - 2000
      ramp(2 * i) = (v & 0xff).toByte
      ramp(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val rampFlac = FlacCodec.encodeFlac(ramp)
    val dRamp = FlacCodec.decodeFlac(rampFlac)
    val (ss, _, si) = expected(ramp)
    assert(dRamp.valid && dRamp.sumS === ss && dRamp.sumIs === si)
    assert(rampFlac.length < 200,
      s"a perfectly predictable ramp must compress (got ${rampFlac.length})")
    // full-range noise defeats prediction -> VERBATIM stays exact
    val noise = fixture(576 * 2, 9)
    val dNoise = FlacCodec.decodeFlac(FlacCodec.encodeFlac(noise))
    val (ns, na, ni) = expected(noise)
    assert(dNoise.valid && (dNoise.sumS, dNoise.sumAbs, dNoise.sumIs) ===
      ((ns, na, ni)))
  }

  test("reject paths: sync, CRCs, frame numbering, totals, MD5") {
    val payload = fixture(3 * 576 * 2, 4)
    val flac = FlacCodec.encodeFlac(payload)
    assert(FlacCodec.decodeFlac(flac).valid)
    def corrupt(at: Int, xor: Int): Boolean = {
      val c = flac.clone(); c(at) = (c(at) ^ xor).toByte
      FlacCodec.decodeFlac(c).valid
    }
    // marker / STREAMINFO truncation
    assert(!corrupt(0, 1))
    assert(!FlacCodec.decodeFlac(flac.take(20)).valid)
    // the first frame starts right after 4 + 4 + 34 bytes
    val f0 = 42
    assert((flac(f0) & 0xff) === 0xff)
    assert(!corrupt(f0, 0x01))      // broken sync
    assert(!corrupt(f0 + 1, 0x01))  // blocking-strategy bit
    assert(!corrupt(f0 + 1, 0x02))  // reserved bit
    // frame number flips -> non-sequential (CRC-8 catches first; flip
    // BOTH so only the sequence check can object... easier: flip the
    // number AND fix nothing — either reject path is a visible finding)
    assert(!corrupt(f0 + 4, 0x01))
    // body corruption lands on CRC-16 or the MD5 identity
    assert(!corrupt(f0 + 9, 0x40))
    assert(!corrupt(flac.length - 1, 0x01)) // last frame's CRC-16
    // truncation mid-stream and trailing garbage
    assert(!FlacCodec.decodeFlac(flac.dropRight(1)).valid)
    assert(!FlacCodec.decodeFlac(flac :+ 0.toByte).valid)
    // STREAMINFO total-samples lie (stream byte 25 is the last byte of
    // the 36-bit count: 4 fLaC + 4 header + 10 sizes + 8 rate/ch/total)
    assert(!corrupt(25, 0x01))
    // declared MD5 lie (the MD5 spans stream bytes 26..41)
    assert(!corrupt(30, 0x01))
  }

  test("decode-only surfaces: Rice escape, partition order 2, wasted bits") {
    // hand-build a one-frame stream: blockSize 16, mono, 16-bit.
    // Subframe FIXED order 1, partition order 2 (4 partitions of 4),
    // partition 0 escaped (raw 5-bit residuals), partitions 1-3 Rice
    // param 2; wasted bits k=1 (samples are all even).
    val bw = new java.io.ByteArrayOutputStream()
    def bits(s: String): Array[Int] = s.filter(c => c == '0' || c == '1')
      .map(_ - '0').toArray
    var acc = 0; var nb = 0
    def putBits(bs: Array[Int]): Unit = bs.foreach { b =>
      acc = (acc << 1) | b; nb += 1
      if (nb == 8) { bw.write(acc); acc = 0; nb = 0 }
    }
    def putByte(v: Int): Unit = putBits(Array.tabulate(8)(i => (v >> (7 - i)) & 1))
    // samples: even values, order-1 predictable after warmup
    val xs = Array(4, 6, 2, -4, -2, 0, 6, 10, 8, 4, 2, 2, 4, 8, 10, 6)
    val halves = xs.map(_ / 2) // the decoder sees bps-1=15-bit domain
    val res = Array.tabulate(15)(i => halves(i + 1) - halves(i)) // order 1
    def zig(r: Int): Int = (r << 1) ^ (r >> 31)
    // stream head
    "fLaC".foreach(c => putByte(c.toInt))
    putByte(0x80); putByte(0); putByte(0); putByte(34) // last, STREAMINFO
    putBits(bits("0000000000010000")) // min block 16
    putBits(bits("0000000000010000")) // max block 16
    putBits(bits("0" * 24)); putBits(bits("0" * 24))
    putBits(bits("00000001111101000000")) // rate 8000
    putBits(bits("000"))   // mono
    putBits(bits("01111")) // bps 16
    putBits(bits("0" * 31)); putBits(bits("10000")) // total samples = 16
    // MD5 of the PCM (LE 16-bit)
    val pcm = new Array[Byte](32)
    for (i <- 0 until 16) {
      pcm(2 * i) = (xs(i) & 0xff).toByte
      pcm(2 * i + 1) = ((xs(i) >> 8) & 0xff).toByte
    }
    java.security.MessageDigest.getInstance("MD5").digest(pcm)
      .foreach(b => putByte(b & 0xff))
    assert(nb === 0)
    val headLen = bw.size()
    // frame header: sync+fixed, bsCode 0110 (8-bit follows), sr 0000,
    // mono, 16-bit, frame 0, blocksize-1 = 15
    putByte(0xff); putByte(0xf8); putByte(0x60); putByte(0x08)
    putByte(0x00); putByte(15)
    val soFar = bw.toByteArray
    putByte(FlacCodec.crc8(soFar, headLen, soFar.length))
    // subframe: pad 0, type 001001 (fixed order 1), wasted flag 1,
    // unary k-1=0 -> '1' -> k=1
    putBits(bits("0 001001 1 1"))
    // warmup: halves(0)=2 in 15 bits
    putBits(bits("000000000000010"))
    // residual: method 00, partition order 0010 (4 partitions)
    putBits(bits("00 0010"))
    // partition 0: 4 samples minus order 1 = 3 residuals, ESCAPED:
    // param 1111, then 5-bit raw size = 5, then res(0..2) as 5-bit signed
    putBits(bits("1111 00101"))
    for (j <- 0 until 3)
      putBits(Array.tabulate(5)(b => (res(j) >> (4 - b)) & 1))
    // partitions 1..3: Rice param 2 over 4 residuals each
    for (part <- 1 to 3) {
      putBits(bits("0010"))
      for (j <- (part * 4 - 1) until (part * 4 + 3)) {
        val u = zig(res(j))
        putBits(Array.fill(u >> 2)(0) :+ 1)
        putBits(Array(u >> 1 & 1, u & 1))
      }
    }
    while (nb != 0) putBits(Array(0)) // align
    val frame = bw.toByteArray
    val c16 = FlacCodec.crc16(frame, headLen, frame.length)
    putByte((c16 >> 8) & 0xff); putByte(c16 & 0xff)
    val stream = bw.toByteArray
    val d = FlacCodec.decodeFlac(stream)
    assert(d.valid,
      "escape + partitions + wasted bits must decode (decode-only surface)")
    assert(d.nSamples === 16L)
    assert(d.sumS === xs.sum.toLong)
    assert(d.sumIs === xs.zipWithIndex.map { case (v, i) => i.toLong * v }.sum)
    // the same stream with a nonzero pad bit is a visible finding
    val badPad = stream.clone()
    // (flip the last pre-CRC bit only if it was a pad bit — locate the
    // alignment byte: third-from-last byte holds the padding)
    badPad(stream.length - 3) = (badPad(stream.length - 3) ^ 0x01).toByte
    assert(!FlacCodec.decodeFlac(badPad).valid)
  }

  test("LPC subframes: Levinson-Durbin encode round-trips and compresses") {
    // a HIGH-FREQUENCY resonance is where LPC beats the fixed
    // predictors decisively: differencing AMPLIFIES a sine at ω=2.1
    // (|1-e^{-iω}| > 1), while order-2+ LPC models it exactly
    // (x[i] ≈ 2cos(ω)x[i-1] - x[i-2]), leaving only the noise floor.
    // The MD5 identity proves losslessness either way; the SIZE win
    // proves LPC subframes were really chosen.
    val n = 4 * 576
    val rng = new scala.util.Random(17)
    val pcm = new Array[Byte](2 * n)
    for (i <- 0 until n) {
      val v = (8000 * math.sin(2.1 * i) + rng.nextInt(7) - 3).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fixedOnly = FlacCodec.encodeFlac(pcm)
    val withLpc = FlacCodec.encodeFlac(pcm, lpcOrder = 8)
    val (ss, sa, si) = expected(pcm)
    for ((stream, tag) <- Seq((fixedOnly, "fixed"), (withLpc, "lpc"))) {
      val d = FlacCodec.decodeFlac(stream)
      assert(d.valid, tag)
      assert((d.sumS, d.sumAbs, d.sumIs) === ((ss, sa, si)), tag)
    }
    assert(withLpc.length < fixedOnly.length,
      s"LPC must win on a correlated signal (lpc=${withLpc.length} vs " +
        s"fixed=${fixedOnly.length}) — otherwise the subframes never ran")
    // full-range noise with lpcOrder set still round-trips (LPC loses
    // the cost race there; the chooser must not force it)
    val noise = fixture(576 * 2, 23)
    val dN = FlacCodec.decodeFlac(FlacCodec.encodeFlac(noise, lpcOrder = 8))
    val (ns2, na2, ni2) = expected(noise)
    assert(dN.valid && (dN.sumS, dN.sumAbs, dN.sumIs) === ((ns2, na2, ni2)))
  }

  test("LPC decode-only guards: a hand-built frame, negative shift, prec 15") {
    // hand-build: blockSize 8, mono 16-bit, LPC order 2, precision 4
    // (precM1=3), shift 2, coefs (5, -3) — residuals mirror the spec
    // formula pred = (5*x[i-1] - 3*x[i-2]) >> 2 (arithmetic, on the sum)
    val xs = Array(40, 44, 43, 38, 30, 25, 28, 37)
    val coefs = Array(5, -3)
    def pred(i: Int): Int = ((coefs(0) * xs(i - 1) + coefs(1) * xs(i - 2)) >> 2)
    val res = (2 until 8).map(i => xs(i) - pred(i)).toArray
    val bw = new java.io.ByteArrayOutputStream()
    var acc = 0; var nb = 0
    def putBits(bs: Array[Int]): Unit = bs.foreach { b =>
      acc = (acc << 1) | b; nb += 1
      if (nb == 8) { bw.write(acc); acc = 0; nb = 0 }
    }
    def putByte(v: Int): Unit = putBits(Array.tabulate(8)(i => (v >> (7 - i)) & 1))
    def putVal(v: Int, bits: Int): Unit =
      putBits(Array.tabulate(bits)(b => (v >> (bits - 1 - b)) & 1))
    "fLaC".foreach(c => putByte(c.toInt))
    putByte(0x80); putByte(0); putByte(0); putByte(34)
    putVal(16, 16); putVal(16, 16) // min/max block 16 (floor) — but bs=8?
    putVal(0, 24); putVal(0, 24)
    putVal(8000, 20)
    putVal(0, 3); putVal(15, 5)
    putVal(0, 32); putVal(8, 4) // total samples = 8 (36 bits)
    val pcm = new Array[Byte](16)
    for (i <- 0 until 8) {
      pcm(2 * i) = (xs(i) & 0xff).toByte
      pcm(2 * i + 1) = ((xs(i) >> 8) & 0xff).toByte
    }
    java.security.MessageDigest.getInstance("MD5").digest(pcm)
      .foreach(b => putByte(b & 0xff))
    assert(nb === 0)
    val headLen = bw.size()
    // frame: sync, bsCode 0110 (8-bit follows: 7), sr 0, mono 16-bit
    putByte(0xff); putByte(0xf8); putByte(0x60); putByte(0x08)
    putByte(0x00); putByte(7)
    val soFar = bw.toByteArray
    putByte(FlacCodec.crc8(soFar, headLen, soFar.length))
    // subframe: pad 0, type 100001 (LPC order 2), no wasted bits
    putBits(Array(0, 1,0,0,0,0,1, 0))
    putVal(xs(0), 16); putVal(xs(1), 16) // warmup
    putVal(3, 4)                          // precision - 1
    putVal(2, 5)                          // shift
    putVal(coefs(0) & 0xf, 4); putVal(coefs(1) & 0xf, 4)
    putVal(0, 2); putVal(0, 4)            // Rice method 0, partition order 0
    putVal(3, 4)                          // Rice param 3
    res.foreach { rv =>
      val u = (rv << 1) ^ (rv >> 31)
      putBits(Array.fill(u >> 3)(0) :+ 1)
      putVal(u & 7, 3)
    }
    while (nb != 0) putBits(Array(0))
    val frame = bw.toByteArray
    val c16 = FlacCodec.crc16(frame, headLen, frame.length)
    putByte((c16 >> 8) & 0xff); putByte(c16 & 0xff)
    val stream = bw.toByteArray
    val d = FlacCodec.decodeFlac(stream)
    assert(d.valid, "hand-built LPC frame must decode")
    assert(d.nSamples === 8L && d.sumS === xs.sum.toLong)
    // the same frame with a NEGATIVE shift (0b11110 = -2) is reserved:
    // the shift field is the 5 bits after the 4-bit precision, which
    // sit right after the two 16-bit warmups — flip via re-build
    def rebuild(shiftBits: Int, precM1: Int): Array[Byte] = {
      val b2 = new java.io.ByteArrayOutputStream()
      var a2 = 0; var n2 = 0
      def pb(bs: Array[Int]): Unit = bs.foreach { b =>
        a2 = (a2 << 1) | b; n2 += 1
        if (n2 == 8) { b2.write(a2); a2 = 0; n2 = 0 }
      }
      def pByte(v: Int): Unit = pb(Array.tabulate(8)(i => (v >> (7 - i)) & 1))
      def pVal(v: Int, bits: Int): Unit =
        pb(Array.tabulate(bits)(b => (v >> (bits - 1 - b)) & 1))
      val head = stream.take(headLen) // metadata identical
      head.foreach(b => pByte(b & 0xff))
      pByte(0xff); pByte(0xf8); pByte(0x60); pByte(0x08)
      pByte(0x00); pByte(7)
      val sf = b2.toByteArray
      pByte(FlacCodec.crc8(sf, headLen, sf.length))
      pb(Array(0, 1,0,0,0,0,1, 0))
      pVal(xs(0), 16); pVal(xs(1), 16)
      pVal(precM1, 4)
      pVal(shiftBits & 0x1f, 5)
      pVal(coefs(0) & 0xf, 4); pVal(coefs(1) & 0xf, 4)
      pVal(0, 2); pVal(0, 4); pVal(3, 4)
      res.foreach { rv =>
        val u = (rv << 1) ^ (rv >> 31)
        pb(Array.fill(u >> 3)(0) :+ 1)
        pVal(u & 7, 3)
      }
      while (n2 != 0) pb(Array(0))
      val fr = b2.toByteArray
      val cc = FlacCodec.crc16(fr, headLen, fr.length)
      pByte((cc >> 8) & 0xff); pByte(cc & 0xff)
      b2.toByteArray
    }
    assert(FlacCodec.decodeFlac(rebuild(2, 3)).valid, "rebuild sanity")
    assert(!FlacCodec.decodeFlac(rebuild(-2, 3)).valid,
      "negative LPC shift is reserved and must reject")
    assert(!FlacCodec.decodeFlac(rebuild(2, 15)).valid,
      "precision code 0b1111 is reserved and must reject")
  }

  test("stereo decorrelation: all four channel assignments, one identity") {
    // payload = interleaved LE16 (L, R) pairs; length a multiple of 4 so
    // the interleaved-index expectation matches the mono helper exactly
    def stats(payload: Array[Byte], lpc: Int = 0): FlacCodec.Decoded = {
      val flac = FlacCodec.encodeFlacStereo(payload, lpc)
      assert(flac !== null)
      FlacCodec.decodeFlac(flac)
    }
    def chanCodeOfFirstFrame(flac: Array[Byte]): Int = (flac(45) & 0xff) >>> 4
    // independent random channels: side would cost MORE (17-bit noise),
    // so the chooser must stay independent (assignment 1)
    val noise = fixture(4 * 600, 31)
    val dN = stats(noise)
    assert(dN.valid)
    assert(dN.nSamples === 1200L)
    val (ss, sa, si) = expected(noise)
    assert((dN.sumS, dN.sumAbs, dN.sumIs) === ((ss, sa, si)),
      "interleaved stats must read like the raw LE16 stream")
    assert(chanCodeOfFirstFrame(FlacCodec.encodeFlacStereo(noise)) === 1,
      "independent noise must NOT take a decorrelated assignment")
    // identical channels: side == 0 everywhere, so a decorrelated
    // assignment (constant side subframe) must win the cost race
    val mono = fixture(2 * 600, 33)
    val dup = new Array[Byte](4 * 600)
    for (i <- 0 until 600) {
      dup(4 * i) = mono(2 * i); dup(4 * i + 1) = mono(2 * i + 1)
      dup(4 * i + 2) = mono(2 * i); dup(4 * i + 3) = mono(2 * i + 1)
    }
    val flacDup = FlacCodec.encodeFlacStereo(dup)
    assert(chanCodeOfFirstFrame(flacDup) >= 8,
      "identical channels must take a decorrelated wire")
    val dD = FlacCodec.decodeFlac(flacDup)
    val (ds, da, di) = expected(dup)
    assert(dD.valid && (dD.sumS, dD.sumAbs, dD.sumIs) === ((ds, da, di)),
      "decorrelation must undo exactly (the MD5 gate would also object)")
    // correlated-but-not-identical channels (R = L + small noise):
    // side is near-silent -> left/side or mid/side wins; identity holds
    val rng = new scala.util.Random(35)
    val corr = new Array[Byte](4 * 600)
    for (i <- 0 until 600) {
      val l = (4000 * math.sin(i / 11.0)).toInt
      val r = l + rng.nextInt(9) - 4
      corr(4 * i) = (l & 0xff).toByte
      corr(4 * i + 1) = ((l >> 8) & 0xff).toByte
      corr(4 * i + 2) = (r & 0xff).toByte
      corr(4 * i + 3) = ((r >> 8) & 0xff).toByte
    }
    val flacCorr = FlacCodec.encodeFlacStereo(corr, lpcOrder = 8)
    assert(chanCodeOfFirstFrame(flacCorr) >= 8)
    val dC = FlacCodec.decodeFlac(flacCorr)
    val (cs, ca, ci) = expected(corr)
    assert(dC.valid && (dC.sumS, dC.sumAbs, dC.sumIs) === ((cs, ca, ci)))
    // whole pairs only
    assert(FlacCodec.encodeFlacStereo(fixture(3, 36)) === null)
  }

  test("24-bit samples: mono and stereo round-trip, MD5 over 3-byte LE") {
    def expected24(payload: Array[Byte]): (Long, Long, Long) = {
      val n = payload.length / 3
      var ss = 0L; var sa = 0L; var si = 0L
      for (i <- 0 until n) {
        val s = (((payload(3 * i) & 0xff) | ((payload(3 * i + 1) & 0xff) << 8) |
          ((payload(3 * i + 2) & 0xff) << 16)) << 8) >> 8
        ss += s; sa += math.abs(s); si += i.toLong * s
      }
      (ss, sa, si)
    }
    // mono: fixed-only and LPC-competing wires, one identity
    val payload = fixture(3 * 576 * 3 + 100, 41) // 3 full frames + tail
    val (ss, sa, si) = expected24(payload)
    for (lpc <- Seq(0, 8)) {
      val flac = FlacCodec.encodeFlac(payload, lpcOrder = lpc, bps = 24)
      assert(flac !== null)
      val d = FlacCodec.decodeFlac(flac)
      assert(d.valid, s"lpc=$lpc: 24-bit mono must decode")
      assert(d.nSamples === (payload.length / 3).toLong)
      assert((d.sumS, d.sumAbs, d.sumIs) === ((ss, sa, si)),
        s"lpc=$lpc: 24-bit decode must be the lossless identity")
    }
    // the wire really declares 24 bits: STREAMINFO bps-1 = 23 and the
    // frame sample-size code is 0b110 (byte 3 of the first frame header)
    val flac = FlacCodec.encodeFlac(payload, bps = 24)
    val frame0 = 4 + 4 + 34
    assert((flac(frame0 + 3) & 0x0e) >> 1 === 6)
    // a 20-bit STREAMINFO claim is a visible reject: bps-1 spans data
    // bits 103..107 = absolute byte 20 b0 + byte 21 high nibble, so
    // 23 (1 0111) -> 19 (1 0011) clears byte 21's 0x40
    val bad20 = flac.clone(); bad20(21) = (bad20(21) & ~0x40).toByte
    assert(!FlacCodec.decodeFlac(bad20).valid, "bps 20 stays fenced")
    // a frame contradicting STREAMINFO on sample size is forged: flip
    // the first frame's ss code from 0b110 (24) to 0b100 (16) and fix
    // nothing else — the CRC-8 catches it; fixing the CRC would then
    // hit the ssBits != bps audit (exercised via a hand-built header)
    val forged = flac.clone()
    forged(frame0 + 3) = (forged(frame0 + 3) & ~0x0e | (4 << 1)).toByte
    assert(!FlacCodec.decodeFlac(forged).valid)
    // stereo 24-bit: decorrelation at a 25-bit side channel
    val pairs = fixture(6 * 576 * 2 + 200, 42)
    def interleavedExpected24(p: Array[Byte]): (Long, Long, Long) = {
      val np = p.length / 6
      expected24(java.util.Arrays.copyOfRange(p, 0, np * 6))
    }
    val (s2, a2, i2) = interleavedExpected24(pairs)
    val st = FlacCodec.encodeFlacStereo(pairs, lpcOrder = 8, bps = 24)
    assert(st !== null)
    val d2 = FlacCodec.decodeFlac(st)
    assert(d2.valid, "24-bit stereo must decode")
    assert(d2.nSamples === (pairs.length / 6 * 2).toLong)
    assert((d2.sumS, d2.sumAbs, d2.sumIs) === ((s2, a2, i2)),
      "24-bit stereo decorrelation must be the lossless identity")
  }

  test("variable blocking: 576/384 alternation, sample-numbered headers") {
    // ns = 2620: two full (576, 384) pairs, then a 700-sample remainder
    // that splits 576 + 124 — six frames of three different sizes
    val payload = fixture((960 * 2 + 700) * 2, 61)
    val (ss, sa, si) = expected(payload)
    for (lpc <- Seq(0, 8)) {
      val flac = FlacCodec.encodeFlac(payload, lpcOrder = lpc,
        varBlock = true)
      assert(flac !== null)
      val d = FlacCodec.decodeFlac(flac)
      assert(d.valid, s"lpc=$lpc: variable blocking must decode")
      assert(d.nFrames === 6L)
      assert((d.sumS, d.sumAbs, d.sumIs) === ((ss, sa, si)),
        s"lpc=$lpc: the strategy changes the wire, never the PCM")
    }
    // the wire really sets the strategy bit and the differing bounds
    val flac = FlacCodec.encodeFlac(payload, varBlock = true)
    val frame0 = 4 + 4 + 34
    assert((flac(frame0 + 1) & 0x01) === 1, "blocking strategy bit on")
    assert(((flac(8) & 0xff) << 8 | (flac(9) & 0xff)) === 384, "min block")
    assert(((flac(10) & 0xff) << 8 | (flac(11) & 0xff)) === 576, "max block")
    // a fixed-blocking stream still decodes with frame numbers (the
    // strategies coexist across streams, never within one)
    assert(FlacCodec.decodeFlac(FlacCodec.encodeFlac(payload)).valid)
    // flipping ONE frame's strategy bit mid-stream is caught (the CRC-8
    // covers the header byte, and the one-strategy audit backs it up)
    val mixed = flac.clone()
    // find the SECOND frame sync: scan past frame 0 for 0xff 0xf9
    val second = (frame0 + 2 until flac.length - 1).find(o =>
      (flac(o) & 0xff) == 0xff && (flac(o + 1) & 0xff) == 0xf9).get
    mixed(second + 1) = 0xf8.toByte
    assert(!FlacCodec.decodeFlac(mixed).valid)
  }

  test("engine surface: Multimodal.encodeFlac / flacStats on real documents") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf0001).filter(col("doc_id") < 40)
    val out = graft.ext.Multimodal.flacStats(
      graft.ext.Multimodal.encodeFlac(
        graft.ext.Multimodal.documentsAsAssets(docs)))
      .collect()
    assert(out.nonEmpty)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Boolean]("is_valid"))
      val payload = texts(r.getAs[Long]("asset_id")).getBytes("UTF-8")
      val (ss, sa, si) = expected(payload)
      assert((r.getAs[Long]("sum_s"), r.getAs[Long]("sum_abs"),
        r.getAs[Long]("sum_is")) === ((ss, sa, si)))
    }
  }
}
