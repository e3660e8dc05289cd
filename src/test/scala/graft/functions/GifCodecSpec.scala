package graft.functions

import graft.SparkSpec

/** GIF codec conformance (E245, the public GIF89a spec). The q286 oracle
  * pins the arithmetic (lossless identity, so sums read off raw payload
  * bytes in DuckDB); this spec pins what the oracle cannot see — the LZW
  * layer round-tripping exactly (variable code widths through every bump
  * boundary, CLEAR on table-full, KwKwK reconstruction, sub-block
  * framing) and every reject path.
  */
class GifCodecSpec extends SparkSpec {

  private def fixture(n: Int, seed: Int): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)((rng.nextInt(256) - 128).toByte)
  }

  private def expected(payload: Array[Byte], width: Int):
      (Long, Long, Long, Long) = {
    val usable = (payload.length / width) * width
    var si = 0L; var sr = 0L; var sg = 0L; var sb = 0L
    for (i <- 0 until usable) {
      val v = payload(i) & 0xff
      si += v
      sr += GifCodec.paletteR(v)
      sg += GifCodec.paletteG(v)
      sb += GifCodec.paletteB(v)
    }
    (si, sr, sg, sb)
  }

  test("random payloads round-trip through every code-width boundary") {
    // 30 KB of random bytes drives the dictionary through the 9->10->
    // 11->12-bit bumps AND the table-full CLEAR/reset path
    for (seed <- 1 to 3) {
      val payload = fixture(30000, seed)
      val gif = GifCodec.encodeGif(payload, 40)
      assert(gif !== null)
      val d = GifCodec.decodeGif(gif)
      assert(d.valid, s"seed $seed must decode")
      assert((d.width, d.height) === ((40L, 750L)))
      assert(d.nPixels === 30000L)
      val (si, sr, sg, sb) = expected(payload, 40)
      assert((d.sumIdx, d.sumR, d.sumG, d.sumB) === ((si, sr, sg, sb)),
        s"seed $seed: LZW layer must be lossless on the index stream")
    }
  }

  test("run-heavy payloads exercise KwKwK reconstruction") {
    // all-equal bytes produce the code == next-free-entry case
    // immediately and repeatedly; ab-alternation adds the 2-cycle form
    val flat = Array.fill(4000)(7.toByte)
    val d1 = GifCodec.decodeGif(GifCodec.encodeGif(flat, 40))
    assert(d1.valid && d1.sumIdx === 4000L * 7)
    val abab = Array.tabulate(4001)(i => (if (i % 2 == 0) 65 else 66).toByte)
    val d2 = GifCodec.decodeGif(GifCodec.encodeGif(abab, 40))
    val (si, _, _, _) = expected(abab, 40)
    assert(d2.valid && d2.sumIdx === si)
    assert(d2.nPixels === 4000L) // whole rows: the 4001st byte truncates
  }

  test("spec-legal extension blocks are skipped; real stats unchanged") {
    val payload = fixture(2000, 5)
    val gif = GifCodec.encodeGif(payload, 40)
    val clean = GifCodec.decodeGif(gif)
    // splice a Graphic Control Extension before the image descriptor
    // (0x2C); GIF has no global size field, so nothing else changes
    val desc = gif.indexWhere(b => (b & 0xff) == 0x2c, 13 + 768)
    val gce = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = gif.take(desc) ++ gce ++ gif.drop(desc)
    val d = GifCodec.decodeGif(spliced)
    assert(d.valid, "a GCE extension must be skipped, not rejected")
    assert((d.sumIdx, d.sumR) === ((clean.sumIdx, clean.sumR)))
    // a TRUNCATED extension chain is still a visible finding
    assert(!GifCodec.decodeGif(gif.take(desc) ++ gce.take(3)).valid)
  }

  test("reject paths: truncation, garbage, header lies, framing violations") {
    val payload = fixture(1200, 9)
    val gif = GifCodec.encodeGif(payload, 40)
    assert(GifCodec.decodeGif(gif).valid)
    // truncation anywhere dies visibly
    assert(!GifCodec.decodeGif(gif.dropRight(1)).valid) // no trailer
    assert(!GifCodec.decodeGif(gif.dropRight(2)).valid) // no terminator
    assert(!GifCodec.decodeGif(gif.take(100)).valid)    // mid-palette
    // trailing garbage after the trailer
    assert(!GifCodec.decodeGif(gif :+ 0.toByte).valid)
    // header magic
    val badMagic = gif.clone(); badMagic(3) = '7'; badMagic(4) = '7'
    assert(!GifCodec.decodeGif(badMagic).valid)
    // a frame OVERFLOWING the screen rejects; a screen TALLER than the
    // frame is the (now accepted) partial-placement shape
    val badH = gif.clone(); badH(8) = (badH(8) - 1).toByte
    assert(!GifCodec.decodeGif(badH).valid,
      "a frame larger than the screen is a forged stream")
    val tallScreen = gif.clone(); tallScreen(8) = (tallScreen(8) + 1).toByte
    assert(GifCodec.decodeGif(tallScreen).valid,
      "sub-screen placement is spec-legal (the partial-frame relaxation)")
    // LZW minimum code size outside the spec range 2..8 (the GIF89a
    // floor is 2; 256 colors cap it at 8) — descriptor is at a fixed
    // offset: no extensions emitted
    val minCodeAt = 13 + 768 + 10
    assert((gif(minCodeAt) & 0xff) === 8)
    val badMin = gif.clone(); badMin(minCodeAt) = 1
    assert(!GifCodec.decodeGif(badMin).valid)
    val badMin2 = gif.clone(); badMin2(minCodeAt) = 9
    assert(!GifCodec.decodeGif(badMin2).valid)
    // sub-block terminator arriving before EOI: keep the first data
    // sub-block only, then terminate — the decoder must see missing EOI
    val firstLen = gif(minCodeAt + 1) & 0xff
    val cut = gif.slice(0, minCodeAt + 2 + math.min(firstLen, 8)) ++
      Array[Byte](0, 0x3b)
    // (shorten the declared sub-block too so framing is self-consistent)
    cut(minCodeAt + 1) = math.min(firstLen, 8).toByte
    assert(!GifCodec.decodeGif(cut).valid,
      "a terminated stream with no EOI must be a visible finding")
  }

  test("forged-geometry bound: a 2^24-pixel cap, never an allocation") {
    // encode drop rules first
    assert(GifCodec.encodeGif(new Array[Byte](39), 40) === null)
    assert(GifCodec.encodeGif(new Array[Byte](65536 * 40), 40) === null)
    // a forged header declaring 4096 x 4096 = 16.7M pixels (> 2^24) is
    // rejected at the descriptor, before any LZW work
    val gif = GifCodec.encodeGif(fixture(400, 11), 40)
    def putU16(at: Int, v: Int): Unit = {
      gif(at) = (v & 0xff).toByte; gif(at + 1) = ((v >> 8) & 0xff).toByte
    }
    putU16(6, 4096); putU16(8, 4096)       // screen descriptor
    putU16(13 + 768 + 5, 4096); putU16(13 + 768 + 7, 4096) // image descriptor
    assert(!GifCodec.decodeGif(gif).valid)
  }

  private def expectedFull(payload: Array[Byte], width: Int, mask: Int,
      usable: Int): (Long, Long, Long, Long, Long) = {
    var si = 0L; var sr = 0L; var sg = 0L; var sb = 0L; var srv = 0L
    for (i <- 0 until usable) {
      val v = (payload(i) & 0xff) & mask
      si += v
      sr += GifCodec.paletteR(v)
      sg += GifCodec.paletteG(v)
      sb += GifCodec.paletteB(v)
      srv += (i / width).toLong * v
    }
    (si, sr, sg, sb, srv)
  }

  test("small palettes: LZW minimum code sizes 2..8 all round-trip") {
    // palBits 1..8 covers min code sizes 2 (the spec floor, 2- and
    // 4-color palettes) through 8 — the real-world small-GIF shapes
    for (palBits <- 1 to 8) {
      val payload = fixture(6000, 20 + palBits)
      val gif = GifCodec.encodeGif(payload, 40, palBits = palBits)
      assert(gif !== null)
      // the wire really carries the small code size and the small GCT
      assert((gif(10) & 0x07) === palBits - 1)
      assert((gif(13 + 3 * (1 << palBits) + 10) & 0xff) ===
        math.max(2, palBits))
      val d = GifCodec.decodeGif(gif)
      assert(d.valid, s"palBits $palBits must decode")
      val (si, sr, sg, sb, srv) =
        expectedFull(payload, 40, (1 << palBits) - 1, 6000)
      assert((d.sumIdx, d.sumR, d.sumG, d.sumB, d.sumRowV) ===
        ((si, sr, sg, sb, srv)), s"palBits $palBits lossless identity")
    }
  }

  test("interlaced frames deinterlace to the true screen rows") {
    val payload = fixture(4000, 31)
    val gif = GifCodec.encodeGif(payload, 40, interlaced = true)
    assert((gif(13 + 768 + 9) & 0x40) !== 0, "interlace flag on the wire")
    val d = GifCodec.decodeGif(gif)
    assert(d.valid)
    val plain = GifCodec.decodeGif(GifCodec.encodeGif(payload, 40))
    // order-free sums agree with the sequential encode...
    assert((d.sumIdx, d.sumR, d.sumG, d.sumB) ===
      ((plain.sumIdx, plain.sumR, plain.sumG, plain.sumB)))
    // ...and the ORDER-SENSITIVE row-weighted sum equals the raw-payload
    // value, which only happens when the four-pass map is applied: the
    // stream order is a row permutation, so a decoder that ignored the
    // flag would weight rows wrongly
    val (_, _, _, _, srv) = expectedFull(payload, 40, 255, 4000)
    assert(d.sumRowV === srv, "deinterlacing must restore screen rows")
    assert(plain.sumRowV === srv)
    // sanity: the permutation is non-trivial on this geometry (a wrong
    // decoder WOULD differ) — weight rows by stream position instead
    var wrong = 0L
    val order = GifCodec.interlaceRows(100)
    for (i <- 0 until 4000) {
      val seq = i / 40
      wrong += seq.toLong * ((payload(order(seq) * 40 + i % 40) & 0xff))
    }
    assert(wrong !== srv, "fixture must distinguish interlace from sequential")
  }

  test("animated GIFs: frame fan-out, GCE delays, stacked row weighting") {
    val payload = fixture(7 * 40 * 5 + 13, 37) // 7 whole 40x5 frames
    val gif = GifCodec.encodeGif(payload, 40, frameHeight = 5)
    assert(gif !== null)
    val d = GifCodec.decodeGif(gif)
    assert(d.valid)
    assert(d.nFrames === 7L)
    assert((d.width, d.height) === ((40L, 5L)))
    assert(d.nPixels === 1400L)
    // GCE delays: frame f carries 4 + f%3 centiseconds
    assert(d.sumDelay === (0 until 7).map(f => 4L + f % 3).sum)
    val (si, sr, sg, sb, srv) = expectedFull(payload, 40, 255, 1400)
    assert((d.sumIdx, d.sumR, d.sumG, d.sumB) === ((si, sr, sg, sb)))
    // global rows stack across frames: frame f row r = f*5 + r
    assert(d.sumRowV === srv, "frame order must be preserved")
    // interlaced animation composes
    val d2 = GifCodec.decodeGif(
      GifCodec.encodeGif(payload, 40, interlaced = true, frameHeight = 5))
    assert(d2.valid && d2.sumRowV === srv && d2.nFrames === 7L)
    // whole frames only
    assert(GifCodec.encodeGif(new Array[Byte](40 * 5 - 1), 40,
      frameHeight = 5) === null)
  }

  test("local color tables override per frame; missing GCT is spec-legal") {
    val payload = fixture(6 * 40 * 5 + 7, 43) // 6 whole 40x5 frames
    val gif = GifCodec.encodeGif(payload, 40, frameHeight = 5,
      localPalettes = true)
    assert(gif !== null)
    // the wire really has NO global table and an LCT flag per frame
    assert((gif(10) & 0x80) === 0, "no GCT on the wire")
    val d = GifCodec.decodeGif(gif)
    assert(d.valid)
    assert(d.nFrames === 6L)
    var si = 0L; var sr = 0L; var sg = 0L; var sb = 0L
    for (i <- 0 until 1200) {
      val v = payload(i) & 0xff
      val f = i / 200
      si += v
      sr += GifCodec.lctR(v, f)
      sg += GifCodec.lctG(v, f)
      sb += GifCodec.lctB(v, f)
    }
    assert(d.sumIdx === si)
    assert((d.sumR, d.sumG, d.sumB) === ((sr, sg, sb)),
      "per-frame palettes genuinely differ — only real LCT reads match")
    // frame 0's LCT equals the global rule, later frames diverge
    assert(GifCodec.lctR(9, 0) === GifCodec.paletteR(9))
    assert(GifCodec.lctR(9, 1) !== GifCodec.paletteR(9))
    // a frame with NEITHER an LCT nor a GCT has no palette: clear the
    // first frame's LCT flag (descriptor follows the 13-byte header +
    // NETSCAPE ext (19) + GCE (8); packed byte is descriptor + 9)
    val descAt = 13 + 19 + 8
    assert((gif(descAt) & 0xff) === 0x2c, "descriptor offset sanity")
    val noPal = gif.clone()
    noPal(descAt + 9) = (noPal(descAt + 9) & 0x7f).toByte
    assert(!GifCodec.decodeGif(noPal).valid,
      "a frame with no palette at all is a visible finding")
    // truncating inside the first LCT is a visible finding
    assert(!GifCodec.decodeGif(gif.take(descAt + 10 + 100)).valid)
  }

  test("partial frames: offsets applied, out-of-screen and reserved disposal reject") {
    val nf = 5
    val payload = fixture(nf * 200 + 37, 51) // 5 whole 40x5 frames
    var si = 0L; var srv = 0L; var scv = 0L
    for (i <- 0 until nf * 200) {
      val v = payload(i) & 0xff
      val f = i / 200
      si += v
      srv += (f * 8 + f % 4 + (i % 200) / 40).toLong * v
      scv += ((f % 3) * 4 + (i % 200) % 40).toLong * v
    }
    val gif = GifCodec.encodeGif(payload, 40, frameHeight = 5,
      partialFrames = true)
    assert(gif !== null)
    // the wire really declares a LARGER screen than the frames
    def u16(o: Int) = (gif(o) & 0xff) | ((gif(o + 1) & 0xff) << 8)
    assert((u16(6), u16(8)) === ((48, 8)))
    val d = GifCodec.decodeGif(gif)
    assert(d.valid)
    assert((d.width, d.height, d.nFrames) === ((48L, 8L, nf.toLong)))
    assert(d.nPixels === nf * 200L)
    assert((d.sumIdx, d.sumRowV, d.sumColV) === ((si, srv, scv)),
      "screen-row and screen-column weights pin the per-frame offsets")
    // frame 1 sits at (4, 1): its descriptor follows frame 0's data.
    // Locate descriptors by walking introducers on the wire
    def descriptorOffsets: Seq[Int] =
      gif.indices.filter(o => (gif(o) & 0xff) == 0x2c &&
        // a real descriptor: w x h matches 40x5 at the expected slots
        o + 9 < gif.length && u16(o + 5) == 40 && u16(o + 7) == 5)
    val desc1 = descriptorOffsets(1)
    assert((u16(desc1 + 1), u16(desc1 + 3)) === ((4, 1)))
    // out-of-screen placement: left 45 + w 40 > screen 48 rejects
    val oob = gif.clone()
    oob(desc1 + 1) = 45
    assert(!GifCodec.decodeGif(oob).valid, "placement must stay in screen")
    // reserved GCE disposal (4): visible reject — first GCE packed byte
    val gce = gif.indices.find(o => (gif(o) & 0xff) == 0x21 &&
      o + 1 < gif.length && (gif(o + 1) & 0xff) == 0xf9).get
    assert((gif(gce + 3) & 0xff) === 0x04, "fixture writes disposal 1")
    val badDisp = gif.clone()
    badDisp(gce + 3) = 0x10 // disposal 4: reserved
    assert(!GifCodec.decodeGif(badDisp).valid)
    // the axes COMPOSE: interlaced sub-screen frames deinterlace back to
    // top + TRUE local row, so the screen-anchored sums equal the
    // sequential wire's — the roundtrip identity, now with offsets
    val il = GifCodec.encodeGif(payload, 40, interlaced = true,
      frameHeight = 5, partialFrames = true)
    assert(!java.util.Arrays.equals(il, gif),
      "the interlaced wire really differs")
    val dIl = GifCodec.decodeGif(il)
    assert(dIl.valid)
    assert((dIl.sumIdx, dIl.sumRowV, dIl.sumColV) === ((si, srv, scv)),
      "interlace map and frame offsets must compose to the identity")
  }

  test("compositing: last write wins, disposal 2/3 restore, transparency") {
    // the partial-frame fixture (disposal 1): compute the final screen
    // by replaying placement in Scala and compare
    val nf = 6
    val payload = fixture(nf * 200, 91)
    val gif = GifCodec.encodeGif(payload, 40, frameHeight = 5,
      partialFrames = true)
    val screen = Array.fill(8, 48)(-1)
    for (f <- 0 until nf; r <- 0 until 5; c <- 0 until 40)
      screen(f % 4 + r)((f % 3) * 4 + c) = payload(f * 200 + r * 40 + c) & 0xff
    var np = 0L; var sf = 0L; var sfr = 0L
    for (r <- 0 until 8; c <- 0 until 48; if screen(r)(c) >= 0) {
      np += 1; sf += screen(r)(c); sfr += r.toLong * screen(r)(c)
    }
    val d = GifCodec.decodeGif(gif, composite = true)
    assert(d.valid)
    assert((d.nPainted, d.sumFIdx, d.sumFRowV) === ((np, sf, sfr)),
      "last-write-wins compositing must match the placement replay")
    // the streaming decode is unchanged by the flag
    val plain = GifCodec.decodeGif(gif)
    assert((plain.sumIdx, plain.sumRowV) === ((d.sumIdx, d.sumRowV)))
    assert(plain.nPainted === -1L, "no buffer work without the flag")

    // disposal 2 (restore to background): patch frame 0's GCE — its
    // rect must vanish from the final screen wherever frame 1 did not
    // repaint it. GCEs are not checksummed, so wire patches are exact.
    val twoFrames = fixture(2 * 200, 92)
    val g2 = GifCodec.encodeGif(twoFrames, 40, frameHeight = 5,
      partialFrames = true)
    val gce0 = g2.indices.find(o => (g2(o) & 0xff) == 0x21 &&
      (g2(o + 1) & 0xff) == 0xf9).get
    val disp2 = g2.clone()
    disp2(gce0 + 3) = 0x08 // disposal 2, no transparency
    val d2 = GifCodec.decodeGif(disp2, composite = true)
    assert(d2.valid)
    // frame 0 at (0,0), frame 1 at (4,1): only frame 1's rect survives
    var np2 = 0L; var sf2 = 0L
    for (r <- 0 until 5; c <- 0 until 40) {
      np2 += 1; sf2 += twoFrames(200 + r * 40 + c) & 0xff
    }
    assert((d2.nPainted, d2.sumFIdx) === ((np2, sf2)),
      "disposal 2 must clear the disposed rect to background")

    // disposal 3 (restore to previous): frame 1 disposes to previous —
    // but nothing follows it, so the final screen keeps frame 1 (the
    // last frame's disposal never fires). Patch frame 0 instead on a
    // THREE-frame file: frame 1 disposes-to-previous, so frame 0's
    // content returns beneath frame 2.
    val three = fixture(3 * 200, 93)
    val g3 = GifCodec.encodeGif(three, 40, frameHeight = 5,
      partialFrames = true)
    val gces = g3.indices.filter(o => (g3(o) & 0xff) == 0x21 &&
      o + 1 < g3.length && (g3(o + 1) & 0xff) == 0xf9)
    val disp3 = g3.clone()
    disp3(gces(1) + 3) = 0x0c // frame 1: disposal 3
    val d3 = GifCodec.decodeGif(disp3, composite = true)
    assert(d3.valid)
    // replay: draw f0, save-under f1, draw f1, restore (f1 vanishes),
    // draw f2 — final = f0 then f2, last write wins
    val scr3 = Array.fill(8, 48)(-1)
    for (f <- Seq(0, 2); r <- 0 until 5; c <- 0 until 40)
      scr3(f % 4 + r)((f % 3) * 4 + c) = three(f * 200 + r * 40 + c) & 0xff
    var np3 = 0L; var sf3 = 0L
    for (r <- 0 until 8; c <- 0 until 48; if scr3(r)(c) >= 0) {
      np3 += 1; sf3 += scr3(r)(c)
    }
    assert((d3.nPainted, d3.sumFIdx) === ((np3, sf3)),
      "disposal 3 must restore the pre-draw content")

    // transparency: mark index t transparent on frame 1 of the 2-frame
    // file — its pixels with that index leave frame 0's cells showing
    val t = twoFrames(200) & 0xff // frame 1's first pixel index
    val trans = g2.clone()
    val gce1 = g2.indices.filter(o => (g2(o) & 0xff) == 0x21 &&
      o + 1 < g2.length && (g2(o + 1) & 0xff) == 0xf9)(1)
    trans(gce1 + 3) = 0x05 // disposal 1 + transparent flag
    trans(gce1 + 6) = t.toByte
    val dT = GifCodec.decodeGif(trans, composite = true)
    assert(dT.valid)
    // replay: draw f0; draw f1 skipping pixels == t
    val scrT = Array.fill(8, 48)(-1)
    for (r <- 0 until 5; c <- 0 until 40)
      scrT(r)(c) = twoFrames(r * 40 + c) & 0xff
    for (r <- 0 until 5; c <- 0 until 40) {
      val v = twoFrames(200 + r * 40 + c) & 0xff
      if (v != t) scrT(1 + r)(4 + c) = v
    }
    var npT = 0L; var sfT = 0L
    for (r <- 0 until 8; c <- 0 until 48; if scrT(r)(c) >= 0) {
      npT += 1; sfT += scrT(r)(c)
    }
    assert((dT.nPainted, dT.sumFIdx) === ((npT, sfT)),
      "transparent pixels must leave the underlying cell")
  }

  test("trailing extension blocks before the trailer are spec-legal") {
    val payload = fixture(1600, 41)
    val gif = GifCodec.encodeGif(payload, 40)
    val clean = GifCodec.decodeGif(gif)
    assert(clean.valid)
    // GIF89a permits comment/application extensions anywhere before the
    // trailer — splice a comment extension AFTER the image data
    val comment = Array[Byte](0x21, 0xfe.toByte, 5, 'g', 'r', 'a', 'f', 't', 0)
    val spliced = gif.dropRight(1) ++ comment ++ Array[Byte](0x3b)
    val d = GifCodec.decodeGif(spliced)
    assert(d.valid, "a trailing comment extension must be skipped")
    assert((d.sumIdx, d.sumRowV) === ((clean.sumIdx, clean.sumRowV)))
    // a TRUNCATED trailing chain is still a visible finding
    assert(!GifCodec.decodeGif(gif.dropRight(1) ++ comment.take(4)).valid)
    // and garbage after the trailer still rejects
    assert(!GifCodec.decodeGif(spliced :+ 0.toByte).valid)
  }

  test("engine surface: Multimodal.encodeGif / gifStats on real documents") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf0001).filter(col("doc_id") < 40)
    val out = graft.ext.Multimodal.gifStats(
      graft.ext.Multimodal.encodeGif(
        graft.ext.Multimodal.documentsAsAssets(docs), width = 40))
      .collect()
    assert(out.nonEmpty)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Boolean]("is_valid"))
      val payload = texts(r.getAs[Long]("asset_id")).getBytes("UTF-8")
      val (si, sr, sg, sb) = expected(payload, 40)
      assert((r.getAs[Long]("sum_idx"), r.getAs[Long]("sum_r"),
        r.getAs[Long]("sum_g"), r.getAs[Long]("sum_b")) === ((si, sr, sg, sb)))
    }
  }
}
