package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** QOI codec conformance (E219). The byte vectors below are hand-derived
  * from the public QOI specification (qoiformat.org) — they pin the exact
  * op stream, so an encode/decode bug pair that self-cancels in the
  * round-trip queries cannot hide here.
  */
class QoiCodecSpec extends SparkSpec {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  /** 6-pixel (3x2) image exercising every channels=3 op: leading RUN off
    * the initial (0,0,0,255) pixel, DIFF, LUMA, RGB fallback, INDEX hit.
    *
    * pixels: (0,0,0) (0,0,0) (1,1,1) (20,20,20) (200,10,50) (1,1,1)
    *  - px1, px2 equal the initial prev         → OP_RUN  run=2   0xc1
    *  - px3 delta (+1,+1,+1)                    → OP_DIFF         0x7f
    *  - px4 delta (+19,+19,+19), vg=19, dr=db=0 → OP_LUMA         0xb3 0x88
    *  - px5 delta wraps past +-32               → OP_RGB  0xfe 0xc8 0x0a 0x32
    *  - px6 (1,1,1) hash (3+5+7+2805)%64 = 4,
    *    stored at px3                           → OP_INDEX        0x04
    */
  private val sixPixels = b(
    0, 0, 0, 0, 0, 0, 1, 1, 1, 20, 20, 20, 200, 10, 50, 1, 1, 1)
  private val sixPixelsQoi = b(
    'q', 'o', 'i', 'f', 0, 0, 0, 3, 0, 0, 0, 2, 3, 0, // header w=3 h=2
    0xc1, // RUN 2
    0x7f, // DIFF +1/+1/+1
    0xb3, 0x88, // LUMA vg=19, dr-dg=0, db-dg=0
    0xfe, 200, 10, 50, // RGB
    0x04, // INDEX slot 4
    0, 0, 0, 0, 0, 0, 0, 1) // end marker

  test("encode emits the spec op stream byte-for-byte") {
    val enc = QoiCodec.encode(sixPixels, 3)
    assert(enc.toSeq === sixPixelsQoi.toSeq)
  }

  test("decode replays the spec op stream to exact stats + op histogram") {
    val d = QoiCodec.decode(sixPixelsQoi)
    assert(d.valid)
    assert((d.width, d.height, d.nPixels) === (3L, 2L, 6L))
    assert((d.sumR, d.sumG, d.sumB) === (222L, 32L, 72L))
    // lum = 299*222 + 587*32 + 114*72 = 93370; floor(93370/6) = 15561
    assert(d.meanLumaMilli === 15561L)
    assert((d.opsRun, d.opsDiff, d.opsLuma, d.opsRgb, d.opsIndex,
      d.opsRgba) === (1L, 1L, 1L, 1L, 1L, 0L))
  }

  /** Hand-built channels=4 stream covering OP_RGBA and the decoder-side
    * index discipline: the decoder writes index[hash(px)] after EVERY
    * chunk (including OP_RUN), so the initial (0,0,0,255) lands in slot
    * (255*11)%64 = 53 after the leading run and IS addressable by a later
    * OP_INDEX|53 — a decoder that skips the run-chunk write decodes
    * garbage here.
    *
    * pixels: run 2 of (0,0,0,255); RGBA (10,20,30,40); INDEX|53 back to
    * (0,0,0,255); DIFF (-1,0,+1) wraps r to 255; LUMA vg=-32, dr-dg=+7,
    * db-dg=-8.
    */
  private val rgbaStream = b(
    'q', 'o', 'i', 'f', 0, 0, 0, 2, 0, 0, 0, 3, 4, 0, // header w=2 h=3
    0xc1, // RUN 2 → decoder stores (0,0,0,255) at slot 53
    0xff, 10, 20, 30, 40, // RGBA
    0x35, // INDEX 53 → (0,0,0,255)
    0x5b, // DIFF -1/0/+1 → (255,0,1,255)
    0x80, 0xf0, // LUMA vg=-32 → (230,224,217,255)
    0, 0, 0, 0, 0, 0, 0, 1)

  test("decode: OP_RGBA and the post-run index write (slot 53)") {
    val d = QoiCodec.decode(rgbaStream)
    assert(d.valid)
    assert(d.nPixels === 6L)
    assert((d.sumR, d.sumG, d.sumB) === (495L, 244L, 248L))
    // lum = 299*495 + 587*244 + 114*248 = 319505; floor(/6) = 53250
    assert(d.meanLumaMilli === 53250L)
    assert((d.opsRun, d.opsRgba, d.opsIndex, d.opsDiff, d.opsLuma,
      d.opsRgb) === (1L, 1L, 1L, 1L, 1L, 0L))
  }

  test("run-length flushes at 62 and at end-of-image") {
    // 100 identical (5,5,5) pixels: LUMA for the first (vg=5 off the
    // initial prev), then runs 62 + 37
    val payload = Array.fill(300)(5.toByte)
    val enc = QoiCodec.encode(payload, 10)
    val d = QoiCodec.decode(enc)
    assert(d.valid && d.nPixels === 100L)
    assert((d.sumR, d.sumG, d.sumB) === (500L, 500L, 500L))
    assert(d.opsRun === 2L && d.opsLuma === 1L)
    assert(d.opsIndex === 0L && d.opsDiff === 0L && d.opsRgb === 0L)
  }

  test("invalid streams surface as is_valid=false, never a crash") {
    // bad magic
    val badMagic = sixPixelsQoi.clone(); badMagic(0) = 'x'.toByte
    assert(!QoiCodec.decode(badMagic).valid)
    // truncated chunk stream (pixel count unreachable)
    val truncated = sixPixelsQoi.take(16) ++ sixPixelsQoi.takeRight(8)
    assert(!QoiCodec.decode(truncated).valid)
    // run overshooting the declared pixel count
    val overshoot = b('q', 'o', 'i', 'f', 0, 0, 0, 1, 0, 0, 0, 2, 3, 0,
      0xc2, 0, 0, 0, 0, 0, 0, 0, 1) // 3-run into a 2-pixel image
    assert(!QoiCodec.decode(overshoot).valid)
    // non-canonical: chunks stop before the marker position
    val shortChunks = b('q', 'o', 'i', 'f', 0, 0, 0, 1, 0, 0, 0, 1, 3, 0,
      0xc0, 0x00, 0, 0, 0, 0, 0, 0, 0, 1) // 1 pixel done, 1 junk byte
    assert(!QoiCodec.decode(shortChunks).valid)
    // bad end marker
    val badEnd = sixPixelsQoi.clone(); badEnd(badEnd.length - 1) = 0
    assert(!QoiCodec.decode(badEnd).valid)
    // payload shorter than one pixel row encodes to null
    assert(QoiCodec.encode(b(1, 2), 3) == null)
  }

  test("forged giant header terminates fast and invalid") {
    // claims 2^31 pixels over a 1-chunk stream: the loop is bounded by
    // the chunk BYTES present, so this returns immediately
    val forged = b('q', 'o', 'i', 'f', 0x7f, 0xff, 0xff, 0xff,
      0x7f, 0xff, 0xff, 0xff, 3, 0, 0xc1, 0, 0, 0, 0, 0, 0, 0, 1)
    val t0 = System.nanoTime()
    assert(!QoiCodec.decode(forged).valid)
    assert((System.nanoTime() - t0) < 1e9, "forged header must not loop")
  }

  test("qoiStats round-trip on real documents matches direct pixel math") {
    val docs = Tables.documents(spark, sf0001).filter(col("doc_id") < 40)
    val assets = graft.ext.Multimodal.documentsAsAssets(docs)
    val stats = graft.ext.Multimodal.qoiStats(
      graft.ext.Multimodal.encodeQoi(assets, width = 6))
      .collect().map(r => r.getAs[Long]("asset_id") -> r).toMap
    val raw = docs.select(col("doc_id"), col("text").cast("binary").as("p"))
      .collect()
    var checked = 0
    raw.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val p = r.getAs[Array[Byte]]("p")
      val h = p.length / 18
      if (h >= 1) {
        val s = stats(id)
        assert(s.getAs[Boolean]("is_valid"))
        assert(s.getAs[Long]("width") === 6L)
        assert(s.getAs[Long]("height") === h.toLong)
        val px = p.take(18 * h).map(_ & 0xff)
        def ch(off: Int) =
          px.indices.filter(_ % 3 == off).map(px(_).toLong).sum
        assert(s.getAs[Long]("sum_r") === ch(0))
        assert(s.getAs[Long]("sum_g") === ch(1))
        assert(s.getAs[Long]("sum_b") === ch(2))
        checked += 1
      } else assert(!stats.contains(id), "short assets must be dropped")
    }
    assert(checked > 10, "sample too small to mean anything")
  }

  test("property: random payloads round-trip exactly, all op types exercised") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
    // a small alphabet (runs + index hits) mixed with full-range bytes
    // (DIFF/LUMA/RGB transitions); widths vary so pixel-row geometry does
    val gen = for {
      w <- Gen.choose(1, 8)
      n <- Gen.choose(3 * w, 600)
      smallAlphabet <- Gen.oneOf(true, false)
      bytes <- Gen.listOfN(n,
        if (smallAlphabet) Gen.oneOf(0, 1, 3, 20, 250) else Gen.choose(0, 255))
    } yield (w, bytes.map(_.toByte).toArray)
    var run = 0L; var idx = 0L; var diff = 0L; var luma = 0L; var rgb = 0L
    samples(gen, 60).foreach { case (w, payload) =>
      val enc = QoiCodec.encode(payload, w)
      val d = QoiCodec.decode(enc)
      assert(d.valid, s"round trip invalid at w=$w n=${payload.length}")
      val npx = (payload.length / (3 * w)) * w.toLong
      assert(d.nPixels === npx)
      // channel sums straight from the source triplets
      val px = payload.take(3 * npx.toInt).map(_ & 0xff)
      def ch(o: Int) = px.indices.filter(_ % 3 == o).map(px(_).toLong).sum
      assert((d.sumR, d.sumG, d.sumB) === ((ch(0), ch(1), ch(2))))
      // the op histogram IS the stream size (the q261 derivation)
      assert(enc.length.toLong === 22L + d.opsRun + d.opsIndex + d.opsDiff +
        2L * d.opsLuma + 4L * d.opsRgb + 5L * d.opsRgba)
      run += d.opsRun; idx += d.opsIndex; diff += d.opsDiff
      luma += d.opsLuma; rgb += d.opsRgb
    }
    // the sample set must exercise EVERY channels=3 op, or the property
    // proves less than it claims
    assert(run > 0 && idx > 0 && diff > 0 && luma > 0 && rgb > 0,
      s"op coverage gap: run=$run index=$idx diff=$diff luma=$luma rgb=$rgb")
  }

  test("compression economics: op-derived sizes equal real stream lengths") {
    val docs = Tables.documents(spark, sf0001).filter(col("doc_id") < 60)
    val assets = graft.ext.Multimodal.documentsAsAssets(docs)
    val rows = graft.ext.Multimodal.qoiCompressionBySource(assets, width = 6)
      .collect()
    assert(rows.nonEmpty)
    // the operator derives qoi_bytes from the op histogram (one encode per
    // row); prove the derivation against independently measured stream
    // lengths per source
    val actual = graft.ext.Multimodal.encodeQoi(assets, width = 6)
      .groupBy(col("meta.source").as("source"))
      .agg(sum(octet_length(col("bytes")).cast("long")).as("n"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("raw_bytes") > 0L)
      // raw_bytes counts the CONSUMED whole-row prefix, which for RGB is
      // exactly 3 bytes per encoded pixel — the compression ratio must
      // compare compressed bytes against the bytes they actually encode,
      // not the full payload with its dropped sub-row tail
      assert(r.getAs[Long]("raw_bytes") === 3L * r.getAs[Long]("n_pixels"))
      assert(r.getAs[Long]("qoi_bytes") === actual(r.getAs[String]("source")),
        s"derived size drifted from the real stream for ${r.getAs[String]("source")}")
      assert(r.getAs[Long]("compression_micro") ===
        r.getAs[Long]("qoi_bytes") * 1000000L / r.getAs[Long]("raw_bytes"))
      // every op chunk advances the stream; utf-8 text rarely runs, so
      // the mix must be dominated by literal/delta ops but stay consistent
      val opsTotal = r.getAs[Long]("ops_run") + r.getAs[Long]("ops_index") +
        r.getAs[Long]("ops_diff") + r.getAs[Long]("ops_luma") +
        r.getAs[Long]("ops_rgb")
      assert(opsTotal > 0L)
      assert(r.getAs[Long]("n_pixels") > 0L)
    }
  }
}
