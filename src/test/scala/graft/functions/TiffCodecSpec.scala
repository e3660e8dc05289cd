package graft.functions

import graft.SparkSpec

/** TIFF codec conformance (E252, the public TIFF 6.0 specification).
  * The q297/q298 oracle pins the arithmetic (lossless identity, so sums
  * read off raw payload bytes in DuckDB); this spec pins what the
  * oracle cannot see — both byte orders on the wire, the IFD grammar
  * (ascending tags, required baseline set, external value areas), the
  * per-row PackBits restart, and every reject path.
  */
class TiffCodecSpec extends SparkSpec {

  private def fixture(n: Int, seed: Int): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)((rng.nextInt(256) - 128).toByte)
  }

  private def expected(payload: Array[Byte], width: Int):
      (Long, Long) = {
    val usable = (payload.length / width) * width
    var sv = 0L; var srv = 0L
    for (i <- 0 until usable) {
      val v = payload(i) & 0xff
      sv += v
      srv += (i / width).toLong * v
    }
    (sv, srv)
  }

  test("all four wires (II/MM x none/PackBits) are one lossless identity") {
    val payload = fixture(40 * 37 + 21, 1) // 37 rows: 10 strips, last 1 row
    val (sv, srv) = expected(payload, 40)
    for (big <- Seq(false, true); pb <- Seq(false, true)) {
      val tiff = TiffCodec.encodeTiff(payload, 40, big, pb)
      assert(tiff !== null)
      // the wire really differs: magic bytes and compression tag
      assert((tiff(0).toChar, tiff(1).toChar) ===
        (if (big) ('M', 'M') else ('I', 'I')))
      val d = TiffCodec.decodeTiff(tiff)
      assert(d.valid, s"big=$big packBits=$pb")
      assert((d.width, d.height, d.nStrips) === ((40L, 37L, 10L)))
      assert(d.nPixels === 1480L)
      assert((d.sumV, d.sumRowV) === ((sv, srv)),
        s"big=$big packBits=$pb: strip assembly must be the identity")
    }
    // no full row: encode drops
    assert(TiffCodec.encodeTiff(fixture(39, 2), 40, false, false) === null)
  }

  test("run-heavy rows exercise PackBits replicate/literal boundaries") {
    // constant rows (max replicate runs), alternating bytes (all
    // literals), and 128+ byte runs crossing the 128 replicate cap
    val flat = Array.fill(40 * 8)(9.toByte)
    val d1 = TiffCodec.decodeTiff(TiffCodec.encodeTiff(flat, 40, false, true))
    assert(d1.valid && d1.sumV === 40L * 8 * 9)
    val ab = Array.tabulate(40 * 8)(i => (if (i % 2 == 0) 3 else 250).toByte)
    val (sv, srv) = expected(ab, 40)
    val d2 = TiffCodec.decodeTiff(TiffCodec.encodeTiff(ab, 40, true, true))
    assert(d2.valid && d2.sumV === sv && d2.sumRowV === srv)
    // a 200-wide row forces a replicate run longer than the 128 cap
    val wide = Array.fill(200 * 4)(77.toByte)
    val d3 = TiffCodec.decodeTiff(TiffCodec.encodeTiff(wide, 200, false, true))
    assert(d3.valid && d3.sumV === 200L * 4 * 77)
  }

  test("PackBits is restarted at every row (the spec rule)") {
    // rows end mid-run: byte 39 == byte 40 == byte 41 — a cross-row
    // encoder would fuse them into one replicate run; the wire must not
    val payload = Array.fill(40 * 4)(5.toByte)
    val tiff = TiffCodec.encodeTiff(payload, 40, false, true)
    // strip 0 holds all 4 rows: each row is exactly one 2-byte
    // replicate (header 257-40=217, value), so the strip is 8 bytes
    val d = TiffCodec.decodeTiff(tiff)
    assert(d.valid && d.nStrips === 1L)
    // locate the strip: it starts right after the 8-byte header
    assert((tiff(8) & 0xff) === 217 && (tiff(9) & 0xff) === 5)
    assert((tiff(10) & 0xff) === 217 && (tiff(11) & 0xff) === 5)
    assert((tiff(12) & 0xff) === 217 && (tiff(13) & 0xff) === 5)
    assert((tiff(14) & 0xff) === 217 && (tiff(15) & 0xff) === 5)
  }

  test("reject paths: header, IFD grammar, strip lies, forged geometry") {
    val payload = fixture(40 * 9, 3)
    val tiff = TiffCodec.encodeTiff(payload, 40, false, false)
    assert(TiffCodec.decodeTiff(tiff).valid)
    // magic / version / truncation
    val badMagic = tiff.clone(); badMagic(0) = 'X'
    assert(!TiffCodec.decodeTiff(badMagic).valid)
    val badVer = tiff.clone(); badVer(2) = 43
    assert(!TiffCodec.decodeTiff(badVer).valid)
    assert(!TiffCodec.decodeTiff(tiff.take(7)).valid)
    assert(!TiffCodec.decodeTiff(tiff.dropRight(1)).valid) // truncated ext
    // the IFD sits after the 8-byte header + 360 strip bytes
    val ifdAt = 8 + 40 * 9
    assert(((tiff(ifdAt) & 0xff) | ((tiff(ifdAt + 1) & 0xff) << 8)) === 12)
    // swap the first two entries: tags no longer ascend
    val swapped = tiff.clone()
    for (i <- 0 until 12) {
      swapped(ifdAt + 2 + i) = tiff(ifdAt + 2 + 12 + i)
      swapped(ifdAt + 2 + 12 + i) = tiff(ifdAt + 2 + i)
    }
    assert(!TiffCodec.decodeTiff(swapped).valid, "unsorted IFD must reject")
    // retag ImageWidth (256) to an unknown tag: a required tag goes
    // missing (entry 0 tag low byte 0x00 0x01 little-endian)
    val noWidth = tiff.clone(); noWidth(ifdAt + 2) = 0x99.toByte
    assert(!TiffCodec.decodeTiff(noWidth).valid)
    // BitsPerSample != 8 (entry 2 value slot)
    val bad16 = tiff.clone(); bad16(ifdAt + 2 + 2 * 12 + 8) = 16
    assert(!TiffCodec.decodeTiff(bad16).valid)
    // lying ImageLength: more rows than the strips hold (entry 1)
    val tall = tiff.clone(); tall(ifdAt + 2 + 12 + 8) = 10
    assert(!TiffCodec.decodeTiff(tall).valid)
    // forged geometry: 65535 x 65535 overflows the pixel cap before
    // any strip work (ImageWidth entry 0, ImageLength entry 1)
    val huge = tiff.clone()
    for (k <- Seq(ifdAt + 2 + 8, ifdAt + 2 + 12 + 8)) {
      huge(k) = 0xff.toByte; huge(k + 1) = 0xff.toByte
      huge(k + 2) = 0; huge(k + 3) = 0
    }
    assert(!TiffCodec.decodeTiff(huge).valid)
    // a next-IFD pointer below the header span is a forged chain
    val nextAt = ifdAt + 2 + 12 * 12
    val paged = tiff.clone(); paged(nextAt) = 1
    assert(!TiffCodec.decodeTiff(paged).valid)
  }

  test("PackBits strip under/overfill and truncated runs are visible") {
    val payload = fixture(40 * 4, 5)
    val tiff = TiffCodec.encodeTiff(payload, 40, false, true)
    assert(TiffCodec.decodeTiff(tiff).valid)
    // the single strip starts at 8; its StripByteCounts entry (tag 279,
    // entry index 8) declares its length — shrink the declared count so
    // the stream ends mid-row (underfill)
    val ifdAt = tiff.length - (2 + 12 * 12 + 4 + 2 * 8)
    val cntSlot = ifdAt + 2 + 8 * 12 + 8
    val short = tiff.clone()
    val declared = (short(cntSlot) & 0xff) | ((short(cntSlot + 1) & 0xff) << 8)
    short(cntSlot) = ((declared - 1) & 0xff).toByte
    short(cntSlot + 1) = (((declared - 1) >> 8) & 0xff).toByte
    assert(!TiffCodec.decodeTiff(short).valid, "underfilled strip rejects")
  }

  test("LZW strips (compression 5): MSB-first early-change round-trips") {
    // LZW restarts per STRIP (4 rows), so only a WIDE image gives a
    // strip enough bytes (4 x 2000 = 8000) to drive the dictionary
    // through the 9->10->11->12-bit EARLY width bumps and the 4094
    // clear; random bytes add ~1 entry per byte
    for ((payload, tag) <- Seq(
      (fixture(2000 * 16, 7), "random"),
      (Array.fill(2000 * 16)(42.toByte), "flat"),
      (Array.tabulate(2000 * 16)(i => (i % 251).toByte), "cycling"))) {
      val (sv, srv) = expected(payload, 2000)
      for (big <- Seq(false, true)) {
        val tiff = TiffCodec.encodeTiff(payload, 2000, big, packBits = false,
          lzw = true)
        val d = TiffCodec.decodeTiff(tiff)
        assert(d.valid, s"$tag big=$big")
        assert((d.sumV, d.sumRowV) === ((sv, srv)),
          s"$tag big=$big: LZW strips must be the lossless identity")
      }
    }
    // the wire really differs from GIF's LZW: first byte of the first
    // strip is the Clear code MSB-first (256 in 9 bits -> 0x80 0x4x),
    // where GIF would emit 0x00 0x01 LSB-first
    val t = TiffCodec.encodeTiff(fixture(40 * 4, 8), 40, false, false, true)
    assert((t(8) & 0xff) === 0x80, "MSB-first Clear code on the wire")
    // truncated LZW strip and lying byte counts are visible findings
    val good = TiffCodec.encodeTiff(fixture(40 * 4, 9), 40, false, false, true)
    assert(TiffCodec.decodeTiff(good).valid)
    // shrink the single strip's StripByteCounts (inline LONG, entry 8)
    val ifdAt = good.length - (2 + 12 * 12 + 4 + 2 * 8)
    val cntSlot = ifdAt + 2 + 8 * 12 + 8
    val short = good.clone()
    short(cntSlot) = ((short(cntSlot) & 0xff) - 1).toByte
    assert(!TiffCodec.decodeTiff(short).valid, "truncated LZW strip rejects")
  }

  test("multi-page archives: the IFD chain walks, page order is pinned") {
    val payload = fixture(5 * 40 * 6 + 31, 21) // 5 whole 40x6 pages
    val (sv, srv) = expected(payload, 40)
    // (expected() counts whole ROWS; trim to whole PAGES by hand)
    var sv5 = 0L; var srv5 = 0L
    for (i <- 0 until 1200) {
      val v = payload(i) & 0xff
      sv5 += v; srv5 += (i / 40).toLong * v
    }
    for (big <- Seq(false, true); comp <- Seq("none", "packbits", "lzw")) {
      val tiff = TiffCodec.encodeTiff(payload, 40, big,
        packBits = comp == "packbits", lzw = comp == "lzw", pageHeight = 6)
      assert(tiff !== null)
      val d = TiffCodec.decodeTiff(tiff)
      assert(d.valid, s"big=$big comp=$comp")
      assert(d.nPages === 5L)
      assert((d.width, d.height) === ((40L, 6L)))
      assert(d.nPixels === 1200L)
      assert(d.nStrips === 10L) // 2 strips per 6-row page
      assert((d.sumV, d.sumRowV) === ((sv5, srv5)),
        s"big=$big comp=$comp: pages must stack in chain order")
    }
    // whole pages only
    assert(TiffCodec.encodeTiff(new Array[Byte](239), 40,
      bigEndian = false, packBits = false, pageHeight = 6) === null)
    // single-page files still decode as one page (back-compat)
    val one = TiffCodec.decodeTiff(
      TiffCodec.encodeTiff(payload, 40, false, false))
    assert(one.valid && one.nPages === 1L && (one.sumV, one.sumRowV) ===
      ((sv, srv)))
    // a cyclic / forged chain cannot spin: pages are capped, and a next
    // pointer into garbage is a visible finding — point page 0's next
    // pointer at the file HEADER (valid offset, invalid IFD)
    val tiff = TiffCodec.encodeTiff(payload, 40, false, false, pageHeight = 6)
    val firstIfd = 8 + 240 // page 0: 240 uncompressed strip bytes
    assert(((tiff(firstIfd) & 0xff) | ((tiff(firstIfd + 1) & 0xff) << 8)) === 12)
    val nextAt = firstIfd + 2 + 12 * 12
    val loop = tiff.clone()
    loop(nextAt) = 8; loop(nextAt + 1) = 0
    loop(nextAt + 2) = 0; loop(nextAt + 3) = 0
    assert(!TiffCodec.decodeTiff(loop).valid,
      "a forged next pointer must reject, not spin")
  }

  test("Predictor 2 (tag 317): differencing is really undone, per row") {
    val payload = fixture(40 * 9 + 13, 31) // 9 whole rows, 3 strips
    val (sv, srv) = expected(payload, 40)
    for (big <- Seq(false, true)) {
      val tiff = TiffCodec.encodeTiff(payload, 40, big, packBits = false,
        lzw = true, predictor2 = true)
      assert(tiff !== null)
      val d = TiffCodec.decodeTiff(tiff)
      assert(d.valid, s"big=$big")
      assert((d.sumV, d.sumRowV) === ((sv, srv)),
        s"big=$big: the differencing undo must restore the pixels")
    }
    // the wire REALLY differs from the plain-LZW wire (rows are deltas)
    val plain = TiffCodec.encodeTiff(payload, 40, false, packBits = false,
      lzw = true)
    val pred = TiffCodec.encodeTiff(payload, 40, false, packBits = false,
      lzw = true, predictor2 = true)
    assert(!java.util.Arrays.equals(plain, pred))
    // the IFD declares 13 entries, the last being Predictor (317) = 2
    def u16le(b: Array[Byte], o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32le(b: Array[Byte], o: Int) =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    val ifdAt = u32le(pred, 4)
    assert(u16le(pred, ifdAt) === 13)
    val predSlot = ifdAt + 2 + 12 * 12
    assert(u16le(pred, predSlot) === 317 && u16le(pred, predSlot + 8) === 2)
    // flip the tag to Predictor = 1: still a VALID file, but now the
    // deltas are the pixels — the sums must move (the undo is not a noop)
    val asNone = pred.clone(); asNone(predSlot + 8) = 1
    val dN = TiffCodec.decodeTiff(asNone)
    assert(dN.valid && dN.sumV != sv,
      "predictor 1 on a differenced wire decodes the deltas themselves")
    // Predictor 3 (floating-point) is not baseline: visible reject
    val p3 = pred.clone(); p3(predSlot + 8) = 3
    assert(!TiffCodec.decodeTiff(p3).valid)
    // Predictor 2 outside the LZW path (spec 14 ties it to LZW): reject
    val compSlot = ifdAt + 2 + 3 * 12
    assert(u16le(pred, compSlot) === 259 && u16le(pred, compSlot + 8) === 5)
    val uncomp = pred.clone(); uncomp(compSlot + 8) = 1
    assert(!TiffCodec.decodeTiff(uncomp).valid)
    // multi-page + predictor: differencing restarts per row on every page
    val paged = TiffCodec.encodeTiff(payload, 40, bigEndian = true,
      packBits = false, lzw = true, pageHeight = 3, predictor2 = true)
    val dP = TiffCodec.decodeTiff(paged)
    assert(dP.valid && dP.nPages === 3L && (dP.sumV, dP.sumRowV) === ((sv, srv)))
  }

  /** Hand-rolled minimal little-endian TIFF: single uncompressed strip,
    * 13 ascending entries INCLUDING FillOrder (266) — the shape the
    * encoder never emits, needed to pin the 266 accept/reject split.
    */
  private def tiffWithFillOrder(payload: Array[Byte], width: Int,
      fillOrder: Int): Array[Byte] = {
    val h = payload.length / width
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
    out.write('I'); out.write('I'); u16(42)
    val stripLen = width * h
    val ifdAt = 8 + stripLen
    u32(ifdAt)
    out.write(payload, 0, stripLen)
    val extAt = ifdAt + 2 + 13 * 12 + 4
    u16(13)
    def sh(tag: Int, v: Int): Unit = { u16(tag); u16(3); u32(1); u16(v); u16(0) }
    def lg(tag: Int, v: Int): Unit = { u16(tag); u16(4); u32(1); u32(v) }
    def rat(tag: Int, at: Int): Unit = { u16(tag); u16(5); u32(1); u32(at) }
    lg(256, width); lg(257, h); sh(258, 8); sh(259, 1); sh(262, 1)
    sh(266, fillOrder)
    lg(273, 8); sh(277, 1); lg(278, h); lg(279, stripLen)
    rat(282, extAt); rat(283, extAt + 8); sh(296, 2)
    u32(0) // no next IFD
    u32(72); u32(1); u32(72); u32(1)
    out.toByteArray
  }

  test("tiled layout (E284): padded 16x16 grid is the strip identity") {
    // width 40, 37 rows: 3 tiles across (last 8 cols padded), 3 down
    // (last 5 rows padded) — the edge-overhang case everywhere
    val payload = fixture(40 * 37 + 21, 9)
    val (sv, srv) = expected(payload, 40)
    for ((lzw, pred) <- Seq((false, false), (true, false), (true, true));
        big <- Seq(false, true)) {
      val tiff = TiffCodec.encodeTiff(payload, 40, big, packBits = false,
        lzw = lzw, predictor2 = pred, tiled = true)
      assert(tiff !== null)
      val d = TiffCodec.decodeTiff(tiff)
      assert(d.valid, s"lzw=$lzw pred=$pred big=$big")
      assert((d.width, d.height, d.nPixels) === ((40L, 37L, 1480L)))
      assert(d.nStrips === 9L, "n_strips counts the 3x3 tile grid")
      assert((d.sumV, d.sumRowV) === ((sv, srv)),
        s"lzw=$lzw pred=$pred big=$big: padded edge tiles must decode " +
          "but never count, and the predictor must reset per TILE row")
    }
    // geometry where one tile is almost all padding: 20 wide, 5 rows
    val tiny = fixture(100, 10)
    val (tsv, tsrv) = expected(tiny, 20)
    val td = TiffCodec.decodeTiff(
      TiffCodec.encodeTiff(tiny, 20, bigEndian = false, packBits = false,
        tiled = true))
    assert(td.valid && td.nStrips === 2L && td.nPixels === 100L)
    assert((td.sumV, td.sumRowV) === ((tsv, tsrv)))
    // a TileLength that is not a multiple of 16 is a spec violation —
    // patch the 323 entry's value (LE wire: tag bytes 0x43 0x01, type 4)
    val wire = TiffCodec.encodeTiff(payload, 40, bigEndian = false,
      packBits = false, tiled = true)
    var at = -1
    var i = 8
    while (at < 0 && i + 12 <= wire.length) {
      if ((wire(i) & 0xff) == 0x43 && (wire(i + 1) & 0xff) == 0x01 &&
        (wire(i + 2) & 0xff) == 4 && (wire(i + 3) & 0xff) == 0) at = i
      i += 1
    }
    assert(at > 0, "TileLength entry must be on the wire")
    val badTl = wire.clone()
    badTl(at + 8) = 20 // 16 -> 20
    assert(!TiffCodec.decodeTiff(badTl).valid,
      "tile dims must be multiples of 16 per the spec")
    // a PARTIAL tile family must not fall back to strips: rename the
    // LAST tile tag (325 TileByteCounts) to an unknown tag — the order
    // stays ascending, so the reject is the family audit, nothing else
    val no325 = wire.clone()
    var at325 = -1
    i = 8
    while (at325 < 0 && i + 12 <= no325.length) {
      if ((no325(i) & 0xff) == 0x45 && (no325(i + 1) & 0xff) == 0x01 &&
        (no325(i + 2) & 0xff) == 4) at325 = i
      i += 1
    }
    assert(at325 > 0)
    no325(at325) = 0x50 // tag 325 -> 336 (unknown, still ascending)
    assert(!TiffCodec.decodeTiff(no325).valid,
      "a partial tile tag set is malformed, not strips-by-default")
    // truncation dies visibly on the tiled wire too
    assert(!TiffCodec.decodeTiff(wire.dropRight(3)).valid)
    // multi-page tiled archives chain like strip pages
    val paged = TiffCodec.encodeTiff(fixture(40 * 32 * 3 + 5, 11), 40,
      bigEndian = false, packBits = false, pageHeight = 32, tiled = true)
    val pd = TiffCodec.decodeTiff(paged)
    assert(pd.valid && pd.nPages === 3L && pd.nStrips === 18L)
  }

  test("FillOrder (tag 266): 1 default, 2 un-reversed on LZW, else reject") {
    val payload = fixture(40 * 6, 33)
    val (sv, srv) = expected(payload, 40)
    val ok = TiffCodec.decodeTiff(tiffWithFillOrder(payload, 40, 1))
    assert(ok.valid && (ok.sumV, ok.sumRowV) === ((sv, srv)),
      "FillOrder 1 is spec-default and must decode")
    // FillOrder 2 only changes a BIT stream: on an uncompressed wire it
    // is a forged combination, rejected visibly
    assert(!TiffCodec.decodeTiff(tiffWithFillOrder(payload, 40, 2)).valid)
    // FillOrder 3 is not a thing
    assert(!TiffCodec.decodeTiff(tiffWithFillOrder(payload, 40, 3)).valid)
    // on the LZW wire, FillOrder 2 DECODES: every compressed byte is
    // bit-reversed on disk and un-reversed through the table
    val p2 = fixture(40 * 9 + 7, 34)
    val (sv2, srv2) = expected(p2, 40)
    for (big <- Seq(false, true)) {
      val rev = TiffCodec.encodeTiff(p2, 40, big, packBits = false,
        lzw = true, fillOrder2 = true)
      assert(rev !== null)
      val plain = TiffCodec.encodeTiff(p2, 40, big, packBits = false,
        lzw = true)
      assert(!java.util.Arrays.equals(rev, plain),
        "the reversed wire really differs")
      val d = TiffCodec.decodeTiff(rev)
      assert(d.valid, s"big=$big")
      assert((d.sumV, d.sumRowV) === ((sv2, srv2)),
        s"big=$big: bit reversal must be undone exactly")
    }
    // FillOrder 2 composes with Predictor 2 on one wire (14-entry IFD)
    val both = TiffCodec.encodeTiff(p2, 40, bigEndian = false,
      packBits = false, lzw = true, predictor2 = true, fillOrder2 = true)
    val dB = TiffCodec.decodeTiff(both)
    assert(dB.valid && (dB.sumV, dB.sumRowV) === ((sv2, srv2)),
      "FillOrder and Predictor undo in the right order")
  }

  test("RGB (E292): chunky samples, per-channel predictor, channel sums") {
    def u16le(b: Array[Byte], o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32le(b: Array[Byte], o: Int) =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    val payload = fixture(20 * 3 * 7 + 11, 37) // 7 whole RGB rows at w=20
    val used = 20 * 3 * 7
    def chSum(c: Int) = (0 until used).filter(_ % 3 == c)
      .map(payload(_) & 0xff).map(_.toLong).sum
    val sv = (0 until used).map(payload(_) & 0xff).map(_.toLong).sum
    val srv = (0 until used).map(i => (i / 60).toLong * (payload(i) & 0xff)).sum
    for (big <- Seq(false, true);
         (pb, lz) <- Seq((false, false), (true, false), (false, true))) {
      val tiff = TiffCodec.encodeTiff(payload, 20, big, packBits = pb,
        lzw = lz, rgb = true)
      assert(tiff !== null)
      val d = TiffCodec.decodeTiff(tiff)
      assert(d.valid, s"big=$big pb=$pb lz=$lz")
      assert((d.width, d.height, d.nPixels) === ((20L, 7L, 140L)))
      assert(d.sumV === sv && d.sumRowV === srv, s"big=$big pb=$pb lz=$lz")
      assert((d.sumR, d.sumG, d.sumB) === ((chSum(0), chSum(1), chSum(2))),
        s"big=$big pb=$pb lz=$lz: channel sums split RGBRGB, not planes")
      assert(d.meanVMilli === sv * 1000 / (140 * 3), "mean is per SAMPLE")
    }
    // per-CHANNEL predictor stride, pinned at the WIRE level: stride-3
    // differencing of P equals stride-1 differencing of its per-row
    // channel-CUMSUM twin, so the rgb+pred strip bytes must be
    // byte-identical to a grayscale(width*3)+pred wire over the twin —
    // a symmetric encoder/decoder stride bug cannot pass this
    val rgbPred = TiffCodec.encodeTiff(payload, 20, bigEndian = false,
      packBits = false, lzw = true, predictor2 = true, rgb = true)
    val dP = TiffCodec.decodeTiff(rgbPred)
    assert(dP.valid && dP.sumV === sv &&
      (dP.sumR, dP.sumG, dP.sumB) === ((chSum(0), chSum(1), chSum(2))))
    val twin = new Array[Byte](used)
    for (i <- 0 until used) {
      val d3 =
        if (i % 60 < 3) payload(i) & 0xff
        else (payload(i) - payload(i - 3)) & 0xff
      twin(i) =
        (if (i % 60 == 0) d3 else ((twin(i - 1) & 0xff) + d3) & 0xff).toByte
    }
    val grayTwin = TiffCodec.encodeTiff(twin, 60, bigEndian = false,
      packBits = false, lzw = true, predictor2 = true)
    val sEnd = u32le(grayTwin, 4)
    assert(u32le(rgbPred, 4) === sEnd, "same strip section length")
    assert(java.util.Arrays.equals(rgbPred.slice(8, sEnd),
      grayTwin.slice(8, sEnd)),
      "stride-3 differencing must equal stride-1 on the cumsum twin")
    // header-contradiction rejects on the raw wire (12 ascending entries)
    val raw = TiffCodec.encodeTiff(payload, 20, bigEndian = false,
      packBits = false, rgb = true)
    val ifdAt = u32le(raw, 4)
    val photoSlot = ifdAt + 2 + 4 * 12
    assert(u16le(raw, photoSlot) === 262 && u16le(raw, photoSlot + 8) === 2)
    val asGray = raw.clone(); asGray(photoSlot + 8) = 1
    assert(!TiffCodec.decodeTiff(asGray).valid,
      "photometric 1 with 3 samples is forged")
    val sppSlot = ifdAt + 2 + 6 * 12
    assert(u16le(raw, sppSlot) === 277 && u16le(raw, sppSlot + 8) === 3)
    val spp1 = raw.clone(); spp1(sppSlot + 8) = 1
    assert(!TiffCodec.decodeTiff(spp1).valid,
      "SPP 1 against a [8,8,8] BitsPerSample is forged")
    // mixed per-sample depths are forged: patch the external [8,8,8]
    val bitsSlot = ifdAt + 2 + 2 * 12
    assert(u16le(raw, bitsSlot) === 258 && u32le(raw, bitsSlot + 4) === 3)
    val bitsExt = u32le(raw, bitsSlot + 8)
    val mixed = raw.clone(); mixed(bitsExt) = 16
    assert(!TiffCodec.decodeTiff(mixed).valid)
    // PlanarConfiguration 2 (planar) is a visible reject, never a
    // misdecode: repurpose the ResolutionUnit slot (296 -> 284 keeps
    // the ascending order; its SHORT value is already 2)
    val planar = raw.clone()
    val ruSlot = ifdAt + 2 + 11 * 12
    assert(u16le(raw, ruSlot) === 296 && u16le(raw, ruSlot + 8) === 2)
    planar(ruSlot) = 28; planar(ruSlot + 1) = 1 // 284 little-endian
    assert(!TiffCodec.decodeTiff(planar).valid)
    // RGB composes with tiles and multi-page (the unified chunk walk)
    val tiled = TiffCodec.decodeTiff(TiffCodec.encodeTiff(payload, 20,
      bigEndian = false, packBits = false, lzw = true, tiled = true,
      rgb = true))
    assert(tiled.valid && tiled.sumV === sv &&
      (tiled.sumR, tiled.sumG, tiled.sumB) ===
        ((chSum(0), chSum(1), chSum(2))))
    val paged = TiffCodec.decodeTiff(TiffCodec.encodeTiff(payload, 20,
      bigEndian = true, packBits = false, lzw = true, pageHeight = 3,
      predictor2 = true, rgb = true))
    assert(paged.valid && paged.nPages === 2L)
  }

  test("engine surface: Multimodal.encodeTiff / tiffStats on real documents") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf0001).filter(col("doc_id") < 40)
    val out = graft.ext.Multimodal.tiffStats(
      graft.ext.Multimodal.encodeTiff(
        graft.ext.Multimodal.documentsAsAssets(docs),
        width = 40, bigEndian = true, packBits = true))
      .collect()
    assert(out.nonEmpty)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Boolean]("is_valid"))
      val payload = texts(r.getAs[Long]("asset_id")).getBytes("UTF-8")
      val (sv, srv) = expected(payload, 40)
      assert((r.getAs[Long]("sum_v"), r.getAs[Long]("sum_rowv")) ===
        ((sv, srv)))
    }
  }
}
