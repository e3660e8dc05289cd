package graft.functions

import graft.SparkSpec

/** LZ4 conformance (E296): xxHash32 pinned on the published vectors,
  * the block-format token grammar on hand-built sequences, the frame
  * walk (header checksum, block/content checksums, stored blocks,
  * skippable frames, LINKED blocks across the 64 KiB window), and the
  * tar-wire identity.
  */
class Lz4CodecSpec extends SparkSpec {

  private def fixture(n: Int, seed: Int): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)((rng.nextInt(256) - 128).toByte)
  }

  test("xxHash32: published test vectors") {
    assert(Lz4Codec.xxh32(Array.emptyByteArray, 0, 0) === 0x02CC5D05)
    assert(Lz4Codec.xxh32("a".getBytes, 0, 1) === 0x550D7456)
    assert(Lz4Codec.xxh32("abc".getBytes, 0, 3) === 0x32D153FF)
    // > 16 bytes exercises the four-lane avalanche
    val long = "abcdefghijklmnopqrstuvwxyz".getBytes
    assert(Lz4Codec.xxh32(long, 0, long.length) ===
      Lz4Codec.xxh32(("X" + "abcdefghijklmnopqrstuvwxyz").getBytes, 1,
        long.length), "offset reads must window correctly")
  }

  test("block format: hand-built sequences decode per the spec") {
    def dec(maxLen: Int, b: Int*): Array[Byte] =
      Lz4Codec.decompressBlock(b.map(_.toByte).toArray, 0, b.length, maxLen)
    // one literals-only sequence: token 0x30, "abc"
    assert(dec(16, 0x30, 'a', 'b', 'c').toSeq === "abc".getBytes.toSeq)
    // literal 'x' + match len 7 offset 1 (overlap run) + closing
    // literals "yz": token (1<<4)|3, 'x', offset 01 00, token 0x20,'y','z'
    assert(dec(16, 0x13, 'x', 0x01, 0x00, 0x20, 'y', 'z').toSeq ===
      "xxxxxxxxyz".getBytes.toSeq,
      "a match may overlap its own output — the run coding")
    // 15-extension literal length: token 0xF0, ext 3 -> 18 literals
    val lit18 = Array(0xF0, 3) ++ (0 until 18).map(i => 64 + i)
    assert(Lz4Codec.decompressBlock(lit18.map(_.toByte).toArray, 0,
      lit18.length, 64).toSeq === (0 until 18).map(i => (64 + i).toByte))
    // 15-extension match length: 'ab' + match off 2 len 4+15+2 = 21
    assert(dec(32, 0x2F, 'a', 'b', 0x02, 0x00, 2, 0x00).toSeq ===
      ("ab" + "ab" * 10 + "a").getBytes.toSeq)
    // forged offsets: 0, and past the produced output
    assert(dec(16, 0x13, 'x', 0x00, 0x00, 0x20, 'y', 'z') === null)
    assert(dec(16, 0x13, 'x', 0x02, 0x00, 0x20, 'y', 'z') === null)
    // output budget overrun is visible
    assert(dec(4, 0x13, 'x', 0x01, 0x00, 0x20, 'y', 'z') === null)
    // a sequence cut off mid-offset is malformed
    assert(dec(16, 0x13, 'x', 0x01) === null)
  }

  test("block round trip: runs, random data, far matches") {
    val runs = Array.fill(500)('a'.toByte) ++ "0123456789".getBytes ++
      Array.fill(300)('b'.toByte)
    val enc = Lz4Codec.compressBlock(runs, 0, runs.length)
    assert(enc.length < runs.length / 4, "runs must actually compress")
    assert(Lz4Codec.decompressBlock(enc, 0, enc.length,
      runs.length).toSeq === runs.toSeq)
    val rnd = fixture(1000, 61)
    val encR = Lz4Codec.compressBlock(rnd, 0, rnd.length)
    assert(Lz4Codec.decompressBlock(encR, 0, encR.length,
      rnd.length).toSeq === rnd.toSeq)
    val far = fixture(3000, 62)
    val doubled = far ++ far
    val encD = Lz4Codec.compressBlock(doubled, 0, doubled.length)
    assert(encD.length < doubled.length * 3 / 4)
    assert(Lz4Codec.decompressBlock(encD, 0, encD.length,
      doubled.length).toSeq === doubled.toSeq)
    // the end rules hold on the encoder's own wire: re-decoding with a
    // tight budget equal to the input length must land exactly
    assert(Lz4Codec.decompressBlock(encD, 0, encD.length,
      doubled.length).length === doubled.length)
  }

  test("frame: checksums, stored blocks, skippable frames, linking") {
    val data = fixture(3500, 63)
    val framed = Lz4Codec.frame(data, chunk = 1000)
    assert(Lz4Codec.unframe(framed).toSeq === data.toSeq)
    // per-block checksums and the skippable-frame prefix both decode
    assert(Lz4Codec.unframe(Lz4Codec.frame(data, chunk = 1000,
      blockSums = true)).toSeq === data.toSeq)
    assert(Lz4Codec.unframe(Lz4Codec.frame(data, chunk = 1000,
      skippablePrefix = true)).toSeq === data.toSeq)
    // incompressible data takes the stored (high-bit) path and decodes
    val rnd = fixture(900, 64)
    val rndFramed = Lz4Codec.frame(rnd, chunk = 300)
    assert(Lz4Codec.unframe(rndFramed).toSeq === rnd.toSeq)
    // a flipped data byte breaks the content checksum — visible
    val bad = framed.clone()
    bad(framed.length / 2) = (bad(framed.length / 2) ^ 1).toByte
    assert(Lz4Codec.unframe(bad) === null)
    // a lying header checksum byte (HC at offset 6) is visible
    val hcLie = framed.clone(); hcLie(6) = (hcLie(6) ^ 1).toByte
    assert(Lz4Codec.unframe(hcLie) === null)
    // a truncated stream (no EndMark) is visible
    assert(Lz4Codec.unframe(framed.dropRight(5)) === null)
    // a skippable-frame size near Int.MaxValue must be a NULL, not an
    // Int-sum wrap into a negative index (crash-instead-of-null
    // regression: the u32 size is unsigned, compared in Long now)
    val hugeSkip = Array[Byte](0x50, 0x2A, 0x4D, 0x18,
      0xf9.toByte, 0xff.toByte, 0xff.toByte, 0x7f) ++ framed
    assert(Lz4Codec.unframe(hugeSkip) === null)
    // reserved FLG bits reject (patch FLG and fix HC so the reserved
    // check itself fires)
    val rsv = framed.clone()
    rsv(4) = (rsv(4) | 0x02).toByte
    rsv(6) = ((Lz4Codec.xxh32(rsv, 4, 2) >>> 8) & 0xff).toByte
    assert(Lz4Codec.unframe(rsv) === null)
    // LINKED blocks (B.Indep = 0, the lz4 CLI default): hand-build a
    // frame whose SECOND block's match reaches back into the first
    // block's output through the 64 KiB window
    val first = "ABCDEFGHIJKLMNOP".getBytes // block 1: stored literals
    // block 2: token 0x04 = 0 literals, match len 8, offset 16 -> the
    // first block's first 8 bytes; then closing literals "QR"
    val blk2 = Array[Byte](0x04, 16, 0, 0x20, 'Q', 'R')
    val outB = new java.io.ByteArrayOutputStream()
    def u32le(v: Int): Unit = (0 until 4).foreach(i =>
      outB.write((v >>> (8 * i)) & 0xff))
    u32le(Lz4Codec.FrameMagic)
    val flg = 0x40 | 0x04 // version 01, linked (B.Indep = 0), C.Checksum
    val bd = 4 << 4
    outB.write(flg); outB.write(bd)
    outB.write((Lz4Codec.xxh32(Array(flg.toByte, bd.toByte), 0, 2) >>> 8)
      & 0xff)
    u32le(first.length | 0x80000000) // stored block 1
    outB.write(first, 0, first.length)
    u32le(blk2.length)               // compressed block 2
    outB.write(blk2, 0, blk2.length)
    u32le(0)
    val expect = first ++ "ABCDEFGH".getBytes ++ "QR".getBytes
    u32le(Lz4Codec.xxh32(expect, 0, expect.length))
    assert(Lz4Codec.unframe(outB.toByteArray).toSeq === expect.toSeq,
      "linked blocks must window across block boundaries")
    // the SAME stream declared independent must reject the reach-back
    val indep = outB.toByteArray.clone()
    indep(4) = (0x40 | 0x20 | 0x04).toByte
    indep(6) = ((Lz4Codec.xxh32(indep, 4, 2) >>> 8) & 0xff).toByte
    assert(Lz4Codec.unframe(indep) === null,
      "an independent block reaching into its neighbor is forged")
  }

  test("tar wire (.tar.lz4): seventh wire, one member identity") {
    val payload = fixture(7 * 100 + 13, 65)
    val plain = TarCodec.decodeTar(TarCodec.encodeTar(payload, 100),
      gz = false)._1
    val wire = TarCodec.encodeTar(payload, 100, lz4 = true)
    val d = TarCodec.decodeTar(wire, gz = false, lz4 = true)._1
    assert(d.valid && d === plain,
      "the lz4 wire must report identical member stats")
    assert(wire.length < TarCodec.encodeTar(payload, 100).length)
    val bad = wire.clone()
    bad(wire.length / 2) = (bad(wire.length / 2) ^ 1).toByte
    assert(!TarCodec.decodeTar(bad, gz = false, lz4 = true)._1.valid)
  }
}
