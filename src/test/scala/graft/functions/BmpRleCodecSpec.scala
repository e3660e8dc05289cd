package graft.functions

import graft.SparkSpec

/** RLE8 BMP conformance (E287): palette resolution, the bottom-up flip
  * proof, both RLE modes, every escape, and the reject paths.
  */
class BmpRleCodecSpec extends SparkSpec {

  private def fixture(n: Int, seed: Int): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)((rng.nextInt(256) - 128).toByte)
  }

  test("round trip: palette-resolved sums, image-coordinate placement") {
    // run-heavy + literal mix: both modes on the wire
    val rng = new scala.util.Random(21)
    val payload = Array.tabulate(40 * 11)(i =>
      if ((i / 7) % 2 == 0) ((i / 40) * 3 % 256).toByte
      else (rng.nextInt(256) - 128).toByte)
    val d = BmpRleCodec.decode(BmpRleCodec.encode(payload, 40))
    assert(d.valid && (d.width, d.height) === ((40L, 11L)))
    val vs = payload.map(_ & 0xff)
    assert(d.sumR === vs.map(v => PngCodec.palR(v).toLong).sum)
    assert(d.sumG === vs.map(v => PngCodec.palG(v).toLong).sum)
    assert(d.sumB === vs.map(v => PngCodec.palB(v).toLong).sum)
    // the flip proof: weights follow the TOP-DOWN payload raster even
    // though the wire stores rows bottom-up
    val expRow = vs.zipWithIndex.map { case (v, i) =>
      (i / 40).toLong * (255 + (7 * v) % 256) }.sum
    val expCol = vs.zipWithIndex.map { case (v, i) =>
      (i % 40).toLong * (255 + (7 * v) % 256) }.sum
    assert((d.sumRowV, d.sumColV) === ((expRow, expCol)),
      "bottom-up storage must decode back to image coordinates")
    // both modes really on the wire: absolute mode's 0x00 n>=3 header
    val wire = BmpRleCodec.encode(payload, 40)
    val data = wire.drop(14 + 40 + 1024)
    assert(data.sliding(2).exists(s => (s(0) & 0xff) == 0 && (s(1) & 0xff) >= 3),
      "absolute mode must appear")
    assert(data.exists(b => (b & 0xff) >= 3), "encoded runs must appear")
    // no full row: encode drops
    assert(BmpRleCodec.encode(fixture(39, 22), 40) === null)
  }

  test("reject paths: escapes, framing, header lies, palette bounds") {
    val payload = fixture(40 * 5, 23)
    val wire = BmpRleCodec.encode(payload, 40)
    assert(BmpRleCodec.decode(wire).valid)
    // truncation and trailing garbage
    assert(!BmpRleCodec.decode(wire.dropRight(1)).valid)
    assert(!BmpRleCodec.decode(wire :+ 0.toByte).valid,
      "bfSize must match the actual length")
    // the delta escape (0 2) is out of scope and visible: overwrite the
    // first RLE opcode pair
    val delta = wire.clone()
    delta(14 + 40 + 1024) = 0; delta(14 + 40 + 1024 + 1) = 2
    assert(!BmpRleCodec.decode(delta).valid)
    // a run crossing the row end: first opcode count forced to 255 on a
    // 40-wide row
    val cross = wire.clone()
    cross(14 + 40 + 1024) = 255.toByte
    assert(!BmpRleCodec.decode(cross).valid)
    // header lies: compression 0 on an RLE stream; bpp 24; planes 2
    for ((off, v) <- Seq((30, 0), (28, 24), (26, 2))) {
      val bad = wire.clone()
      bad(off) = v.toByte
      assert(!BmpRleCodec.decode(bad).valid, s"header lie at $off")
    }
    // hand-built 2x1 image with a 2-entry palette: in-bounds decodes,
    // an index past the declared palette is a forged pixel
    def tiny(idx: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
      def u32(v: Long): Unit = {
        out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
        out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
      }
      val rle = Array[Byte](2, idx.toByte, 0, 0, 0, 1)
      out.write('B'); out.write('M')
      u32(54L + 8 + rle.length); u16(0); u16(0); u32(54L + 8)
      u32(40); u32(2); u32(1); u16(1); u16(8); u32(1)
      u32(rle.length.toLong); u32(2835); u32(2835); u32(2); u32(0)
      out.write(Array[Byte](10, 20, 30, 0, 40, 50, 60, 0)) // 2 BGRX entries
      out.write(rle)
      out.toByteArray
    }
    val ok = BmpRleCodec.decode(tiny(1))
    assert(ok.valid && ok.sumB === 2L * 40 && ok.sumR === 2L * 60)
    assert(!BmpRleCodec.decode(tiny(2)).valid,
      "an index past the declared palette is a forged pixel")
  }

  test("RLE4 (E291): alternating nibbles, packed absolutes, pad zeros") {
    // hand-built wires pin the nibble order independently of encode4
    def tiny4(w: Int, h: Int, rle: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
      def u32(v: Long): Unit = {
        out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
        out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
      }
      out.write('B'); out.write('M')
      u32(54L + 64 + rle.length); u16(0); u16(0); u32(54L + 64)
      u32(40); u32(w.toLong); u32(h.toLong); u16(1); u16(4); u32(2)
      u32(rle.length.toLong); u32(2835); u32(2835); u32(16); u32(0)
      for (i <- 0 until 16) {
        out.write(PngCodec.palB(i)); out.write(PngCodec.palG(i))
        out.write(PngCodec.palR(i)); out.write(0)
      }
      out.write(rle)
      out.toByteArray
    }
    // encoded run [5, 0xAB]: pixels ALTERNATE 10,11,10,11,10 (hi first)
    val alt = BmpRleCodec.decode4(tiny4(5, 1,
      Array[Byte](5, 0xAB.toByte, 0, 0, 0, 1)))
    assert(alt.valid && alt.sumR === 52L,
      "encoded RLE4 runs must alternate the value byte's nibbles")
    assert(alt.sumColV ===
      Seq(10, 11, 10, 11, 10).zipWithIndex.map { case (v, x) =>
        x.toLong * (255 + 7 * v) }.sum)
    // absolute odd count: nibbles high-first, required-zero half-nibble
    val abs3 = BmpRleCodec.decode4(tiny4(3, 1,
      Array[Byte](0, 3, 0x12, 0x30, 0, 0, 0, 1)))
    assert(abs3.valid && abs3.sumR === 6L) // pixels 1, 2, 3
    assert(!BmpRleCodec.decode4(tiny4(3, 1,
      Array[Byte](0, 3, 0x12, 0x31, 0, 0, 0, 1))).valid,
      "a nonzero half-nibble in an odd absolute run is a visible finding")
    // absolute count 5 -> 3 data bytes + the 16-bit alignment pad byte
    val abs5 = BmpRleCodec.decode4(tiny4(5, 1,
      Array[Byte](0, 5, 0x12, 0x34, 0x50, 0, 0, 0, 0, 1)))
    assert(abs5.valid && abs5.sumR === 15L) // pixels 1..5
    assert(!BmpRleCodec.decode4(tiny4(5, 1,
      Array[Byte](0, 5, 0x12, 0x34, 0x50, 7, 0, 0, 0, 1))).valid,
      "a nonzero alignment pad byte is a visible finding")
    // the delta escape stays a named reject on the 4-bit wire too
    assert(!BmpRleCodec.decode4(tiny4(5, 2,
      Array[Byte](5, 0xAB.toByte, 0, 0, 0, 2, 5, 0xAB.toByte,
        0, 0, 0, 1))).valid)
    // an RLE8 stream does not pass as RLE4 (bpp and compression fields)
    val payload = fixture(40 * 5, 25)
    assert(!BmpRleCodec.decode4(BmpRleCodec.encode(payload, 40)).valid)
    assert(!BmpRleCodec.decode(BmpRleCodec.encode4(payload, 40)).valid)
    // round trip: palette-resolved sums off the low nibbles, both modes
    // on the wire, image-coordinate placement (two-color dithered
    // stretches become encoded ALTERNATING runs)
    val rng = new scala.util.Random(26)
    val mixed = Array.tabulate(40 * 11) { i =>
      if ((i / 9) % 3 == 0) (if (i % 2 == 0) 3 else 12).toByte // dither
      else if ((i / 9) % 3 == 1) 7.toByte                      // flat run
      else (rng.nextInt(256) - 128).toByte                     // literal
    }
    val d = BmpRleCodec.decode4(BmpRleCodec.encode4(mixed, 40))
    assert(d.valid && (d.width, d.height) === ((40L, 11L)))
    val vs = mixed.map(_ & 15)
    assert(d.sumR === vs.map(_.toLong).sum)
    assert(d.sumG === vs.map(v => 255L - v).sum)
    assert(d.sumB === vs.map(v => 7L * v).sum)
    val expRow = vs.zipWithIndex.map { case (v, i) =>
      (i / 40).toLong * (255 + 7 * v) }.sum
    val expCol = vs.zipWithIndex.map { case (v, i) =>
      (i % 40).toLong * (255 + 7 * v) }.sum
    assert((d.sumRowV, d.sumColV) === ((expRow, expCol)),
      "bottom-up storage must decode back to image coordinates")
    // both modes really on the wire
    val wire = BmpRleCodec.encode4(mixed, 40)
    val data = wire.drop(14 + 40 + 64)
    assert(data.sliding(2).exists(s =>
      (s(0) & 0xff) == 0 && (s(1) & 0xff) >= 3), "absolute mode present")
    // a pure two-color dither row takes ONE alternating encoded run —
    // the mode RLE8 cannot express
    val dither = Array.tabulate(40)(i => (if (i % 2 == 0) 3 else 12).toByte)
    val dData = BmpRleCodec.encode4(dither, 40).drop(14 + 40 + 64)
    assert((dData(0) & 0xff) === 40 &&
      (dData(1) & 0xff) === ((3 << 4) | 12),
      "a dithered row must take one alternating encoded run")
  }

  test("engine surface: encodeBmpRle8 / bmpRle8Stats on real documents") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 30)
    val assets = graft.ext.Multimodal.documentsAsAssets(docs)
    val out = graft.ext.Multimodal.bmpRle8Stats(
      graft.ext.Multimodal.encodeBmpRle8(assets, width = 40)).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Boolean]("is_valid")))
  }
}
