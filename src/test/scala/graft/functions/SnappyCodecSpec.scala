package graft.functions

import graft.SparkSpec

/** Snappy conformance (E295): block-format tag grammar pinned on
  * hand-built streams (all three copy forms, overlap replay, forged
  * offsets), framing-format chunk walk (CRC-32C masking, padding/
  * skippable/unskippable split, stream concatenation), and the tar-wire
  * identity.
  */
class SnappyCodecSpec extends SparkSpec {

  private def fixture(n: Int, seed: Int): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)((rng.nextInt(256) - 128).toByte)
  }

  test("block format: hand-built tag streams decode per the spec") {
    def dec(b: Int*): Array[Byte] =
      SnappyCodec.decompressBlock(b.map(_.toByte).toArray, 0, b.length,
        1 << 16)
    // literal only: declared 3, tag (3-1)<<2, 'a' 'b' 'c'
    assert(dec(3, 2 << 2, 'a', 'b', 'c').toSeq === "abc".getBytes.toSeq)
    // overlap replay: declared 5, literal 'x', copy len 4 offset 1
    // (tag 01: len-4 = 0 in bits 2..4, offset high bits 0, next byte 1)
    assert(dec(5, 0 << 2, 'x', 0x01, 0x01).toSeq ===
      "xxxxx".getBytes.toSeq,
      "a copy may overlap its own output — the spec's run coding")
    // period-2 replay: 'a' 'b' then copy len 6 offset 2 -> abababab
    assert(dec(8, 1 << 2, 'a', 'b', 0x01 | (2 << 2), 0x02).toSeq ===
      "abababab".getBytes.toSeq)
    // 2-byte-offset form (tag 10): len-1 in tag>>2, offset u16le
    assert(dec(6, 1 << 2, 'p', 'q', 0x02 | (3 << 2), 2, 0).toSeq ===
      "pqpqpq".getBytes.toSeq)
    // 4-byte-offset form (tag 11)
    assert(dec(4, 1 << 2, 'z', 'w', 0x03 | (1 << 2), 2, 0, 0, 0).toSeq ===
      "zwzw".getBytes.toSeq)
    // 60/61 long-literal headers: length-1 follows in 1/2 LE bytes
    val lit70 = Array(70, 60 << 2, 69) ++ (0 until 70).map(i => i % 97)
    assert(SnappyCodec.decompressBlock(lit70.map(_.toByte).toArray, 0,
      lit70.length, 1 << 16).toSeq ===
      (0 until 70).map(i => (i % 97).toByte).toSeq)
    // forged copies are visible: offset 0; offset past the output
    assert(dec(5, 0 << 2, 'x', 0x01, 0x00) === null)
    assert(dec(5, 0 << 2, 'x', 0x01, 0x02) === null)
    // a stream that under-fills or over-runs its declaration
    assert(dec(9, 0 << 2, 'x', 0x01, 0x01) === null) // declares 9, makes 5
    assert(dec(2, 2 << 2, 'a', 'b', 'c') === null)   // declares 2, makes 3
    // declared length beyond the cap rejects BEFORE allocation
    assert(dec(0xff, 0xff, 0xff, 0x7f) === null)
    // a 4-byte literal length of Int.MaxValue must be a NULL, not an
    // arithmetic wrap past the bounds checks (crash-instead-of-null
    // regression: lm1+1 overflowed before the guards)
    assert(dec(5, 63 << 2, 0xff, 0xff, 0xff, 0x7f, 'x') === null)
  }

  test("block round trip: runs become copies, random data survives") {
    // runs: the encoder must emit overlapping copies
    val runs = Array.fill(500)('a'.toByte) ++ "0123456789".getBytes ++
      Array.fill(300)('b'.toByte)
    val enc = SnappyCodec.compressBlock(runs, 0, runs.length)
    assert(enc.length < runs.length / 4, "runs must actually compress")
    assert(SnappyCodec.decompressBlock(enc, 0, enc.length,
      1 << 16).toSeq === runs.toSeq)
    // incompressible random data round-trips through literals
    val rnd = fixture(1000, 51)
    val encR = SnappyCodec.compressBlock(rnd, 0, rnd.length)
    assert(SnappyCodec.decompressBlock(encR, 0, encR.length,
      1 << 16).toSeq === rnd.toSeq)
    // repeated structure far apart: 2-byte-offset copies
    val far = fixture(3000, 52)
    val doubled = far ++ far
    val encD = SnappyCodec.compressBlock(doubled, 0, doubled.length)
    assert(encD.length < doubled.length * 3 / 4)
    assert(SnappyCodec.decompressBlock(encD, 0, encD.length,
      1 << 16).toSeq === doubled.toSeq)
    // empty input: a bare zero varint
    assert(SnappyCodec.compressBlock(Array.emptyByteArray, 0, 0).toSeq ===
      Seq(0.toByte))
  }

  test("framing: CRC-32C masking, chunk kinds, concatenation") {
    val data = fixture(3500, 53)
    // multi-chunk compressed stream round-trips
    val framed = SnappyCodec.frame(data, chunk = 1000)
    assert(SnappyCodec.unframe(framed).toSeq === data.toSeq)
    // uncompressed chunks (type 0x01) and padding are real-file shapes
    assert(SnappyCodec.unframe(
      SnappyCodec.frame(data, chunk = 1000, raw = true)).toSeq ===
      data.toSeq)
    assert(SnappyCodec.unframe(
      SnappyCodec.frame(data, chunk = 1000, pad = true)).toSeq ===
      data.toSeq)
    // concatenated streams (repeated identifiers) are spec-legal
    val more = fixture(700, 54)
    assert(SnappyCodec.unframe(
      framed ++ SnappyCodec.frame(more)).toSeq === (data ++ more).toSeq)
    // a flipped data byte breaks the masked CRC-32C — visible
    val bad = framed.clone()
    bad(framed.length / 2) = (bad(framed.length / 2) ^ 1).toByte
    assert(SnappyCodec.unframe(bad) === null)
    // a lying CRC itself (first chunk's checksum at offset 14)
    val lie = framed.clone()
    lie(14) = (lie(14) ^ 1).toByte
    assert(SnappyCodec.unframe(lie) === null)
    // an unskippable reserved chunk (0x02..0x7f) is a visible reject;
    // a skippable one (0x80..0xfd) is skipped
    assert(SnappyCodec.unframe(
      framed ++ Array[Byte](0x02, 1, 0, 0, 0)) === null)
    assert(SnappyCodec.unframe(
      framed ++ Array[Byte](0x80.toByte, 1, 0, 0, 42)).toSeq ===
      data.toSeq)
    // data before the stream identifier is not a snappy stream
    assert(SnappyCodec.unframe(framed.drop(10)) === null)
    // the CRC mask is the spec's rotation (a known vector: crc32c of
    // "123456789" is 0xE3069283)
    assert(SnappyCodec.crc32c("123456789".getBytes, 0, 9) === 0xE3069283)
  }

  test("tar wire (.tar.sz): sixth wire, one member identity") {
    val payload = fixture(7 * 100 + 13, 55)
    val plain = TarCodec.decodeTar(TarCodec.encodeTar(payload, 100),
      gz = false)._1
    val wire = TarCodec.encodeTar(payload, 100, snap = true)
    assert((wire(0) & 0xff) === 0xff, "framed stream identifier leads")
    val d = TarCodec.decodeTar(wire, gz = false, snap = true)._1
    assert(d.valid && d === plain,
      "the snappy wire must report identical member stats")
    // tar headers are run-heavy: the wire must actually be smaller
    assert(wire.length < TarCodec.encodeTar(payload, 100).length)
    // a flipped byte is a visible finding through the CRC
    val bad = wire.clone()
    bad(wire.length / 2) = (bad(wire.length / 2) ^ 1).toByte
    assert(!TarCodec.decodeTar(bad, gz = false, snap = true)._1.valid)
  }
}
