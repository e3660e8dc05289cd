package graft.functions

import graft.SparkSpec

/** ICO conformance (E297): the cross-format container — member
  * dispatch (PNG vs classic DIB), exact tiling, entry-vs-content
  * geometry audits, the doubled-height rule, the AND-mask coverage
  * stance, and the stacked-screen order pin.
  */
class IcoCodecSpec extends SparkSpec {

  private def fixture(n: Int, seed: Int): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)((rng.nextInt(256) - 128).toByte)
  }

  test("round trip: alternating PNG/DIB members, stacked weighting") {
    val payload = fixture(5 * 64 + 17, 71) // five 8x8 members
    val d = IcoCodec.decode(IcoCodec.encode(payload, 8))
    assert(d.valid)
    assert((d.nImages, d.nPng, d.nDib) === ((5L, 3L, 2L)))
    assert(d.nPixels === 320L)
    val vs = payload.take(320).map(_ & 0xff)
    assert(d.sumR === vs.map(v => PngCodec.palR(v).toLong).sum)
    assert(d.sumG === vs.map(v => PngCodec.palG(v).toLong).sum)
    assert(d.sumB === vs.map(v => PngCodec.palB(v).toLong).sum,
      "PNG and DIB members resolve through the same palette rule")
    // stacked screens: member k's row y weighs at 8k + y — pins both
    // member ORDER and the DIB bottom-up flip
    assert(d.sumRowV === vs.zipWithIndex.map { case (v, i) =>
      (8L * (i / 64) + (i % 64) / 8) * (255 + (7 * v) % 256) }.sum)
    // the AND mask: LSBs of the DIB members' bytes, counted only
    assert(d.nTransparent === vs.zipWithIndex.collect {
      case (v, i) if (i / 64) % 2 == 1 => (v % 2).toLong }.sum)
    // no member fits
    assert(IcoCodec.encode(fixture(63, 72), 8) === null)
  }

  test("the AND mask is coverage: flipping it moves no channel sum") {
    val payload = fixture(2 * 64, 73)
    val wire = IcoCodec.encode(payload, 8)
    val before = IcoCodec.decode(wire)
    // member 1 is the DIB: its AND rows are the last 4*8 bytes
    // (bottom-up, 4 bytes per row, bits in the first byte). Flip ONE
    // row whose ones-count is not 4, so the total must move.
    val slice = payload.slice(64, 128).map(_ & 0xff)
    val y = (0 until 8).find(y =>
      slice.slice(8 * y, 8 * y + 8).count(v => v % 2 == 1) != 4).get
    val f = 7 - y // bottom-up file row holding image row y
    val flipped = wire.clone()
    val mi = wire.length - 32 + 4 * f
    flipped(mi) = (flipped(mi) ^ 0xff).toByte
    val after = IcoCodec.decode(flipped)
    assert(after.valid)
    assert((after.sumR, after.sumG, after.sumB, after.sumRowV) ===
      ((before.sumR, before.sumG, before.sumB, before.sumRowV)),
      "mask bits are coverage and must never reach the stats")
    assert(after.nTransparent !== before.nTransparent)
  }

  test("strictness: tiling, geometry lies, forged DIBs, bad members") {
    val payload = fixture(3 * 64, 74)
    val wire = IcoCodec.encode(payload, 8)
    assert(IcoCodec.decode(wire).valid)
    def u32at(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    // trailing bytes are smuggled
    assert(!IcoCodec.decode(wire :+ 0.toByte).valid)
    // a member offset lie breaks the tiling
    val gap = wire.clone(); gap(6 + 12) = (gap(6 + 12) + 1).toByte
    assert(!IcoCodec.decode(gap).valid)
    // an entry geometry lie: claimed width 9 against an 8-wide PNG
    val wlie = wire.clone(); wlie(6) = 9
    assert(!IcoCodec.decode(wlie).valid)
    // reserved/type fields
    val t = wire.clone(); t(2) = 2
    assert(!IcoCodec.decode(t).valid)
    // corrupt the PNG member's CRC region: member 0 starts at 6+16*3
    val mOff = u32at(wire, 6 + 12).toInt
    val badPng = wire.clone()
    badPng(mOff + 20) = (badPng(mOff + 20) ^ 1).toByte
    assert(!IcoCodec.decode(badPng).valid)
    // the DIB height must be DOUBLED: halve it (entry height now lies
    // against the un-doubled value too — either audit fires visibly)
    val m1 = u32at(wire, 6 + 16 + 12).toInt
    val half = wire.clone(); half(m1 + 8) = 8 // biHeight 16 -> 8
    assert(!IcoCodec.decode(half).valid)
    // a shrunken palette makes high indices forged pixels
    val smallPal = wire.clone()
    smallPal(m1 + 32) = 2 // biClrUsed = 2
    assert(!IcoCodec.decode(smallPal).valid,
      "either the span audit or the index bound must fire")
  }

  test("engine surface: Multimodal.encodeIco / icoStats on documents") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 30)
    val assets = graft.ext.Multimodal.documentsAsAssets(docs)
    val out = graft.ext.Multimodal.icoStats(
      graft.ext.Multimodal.encodeIco(assets, width = 8)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("is_valid"))
      assert(r.getAs[Long]("n_images") ===
        r.getAs[Long]("n_png") + r.getAs[Long]("n_dib"))
    }
  }
}
