package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Y4M video container (E224/E225): the parse pinned on hand-built
  * containers (general geometry, C420 chroma skip, per-frame marker
  * verification, forged headers), plus scene-cut semantics.
  */
class Y4mSpec extends SparkSpec {

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def assetsOf(rows: (Long, Array[Byte])*) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toSeq.toDF("asset_id", "payload")
      .select(col("asset_id"), lit("video").as("kind"),
        col("payload").as("bytes"),
        struct(lit("test").as("source"), lit("y4m").as("mime")).as("meta"))
  }

  test("round trip: encoded frames report exact luma sums and valid markers") {
    val payload = (0 until 50).map(_.toByte).toArray // 2 frames of 24 + tail
    val frames = Multimodal.y4mFrameLuma(
      Multimodal.encodeY4m(assetsOf(1L -> payload), width = 6, height = 4))
      .collect().map(r => r.getAs[Long]("frame_idx") ->
        (r.getAs[Boolean]("marker_ok"), r.getAs[Long]("sum_y"),
          r.getAs[Long]("mean_y_milli"))).toMap
    assert(frames.keySet === Set(0L, 1L))
    assert(frames(0L) === ((true, (0 until 24).sum.toLong,
      (0 until 24).sum.toLong * 1000 / 24)))
    assert(frames(1L) === ((true, (24 until 48).sum.toLong,
      (24 until 48).sum.toLong * 1000 / 24)))
  }

  test("hand-built container: general geometry, extra params, C420 chroma skipped") {
    // W2 H2 C420: fsize = 4 luma + 2 chroma = 6; luma sum reads ONLY the
    // first 4 bytes of each frame
    val c420 = ascii("YUV4MPEG2 W2 H2 F30000:1001 Ip A1:1 C420jpeg\n") ++
      ascii("FRAME\n") ++ Array[Byte](10, 20, 30, 40, 99, 99) ++
      ascii("FRAME\n") ++ Array[Byte](1, 2, 3, 4, 77, 77)
    // default colorspace (no C tag) is 420 per the spec
    val noTag = ascii("YUV4MPEG2 W2 H2 F25:1\n") ++
      ascii("FRAME\n") ++ Array[Byte](5, 5, 5, 5, 0, 0)
    val frames = Multimodal.y4mFrameLuma(assetsOf(1L -> c420, 2L -> noTag))
      .collect().map(r => (r.getAs[Long]("asset_id"),
        r.getAs[Long]("frame_idx")) -> r.getAs[Long]("sum_y")).toMap
    assert(frames((1L, 0L)) === 100L) // 10+20+30+40, chroma 99s skipped
    assert(frames((1L, 1L)) === 10L)
    assert(frames((2L, 0L)) === 20L)
  }

  test("a desynced frame surfaces as marker_ok=false, not a silent number") {
    val good = ascii("YUV4MPEG2 W2 H2 F25:1 Cmono\n") ++
      ascii("FRAME\n") ++ Array[Byte](1, 1, 1, 1) ++
      ascii("FRAME\n") ++ Array[Byte](2, 2, 2, 2)
    val bad = good.clone()
    bad(28 + 10) = 'X'.toByte // corrupt the SECOND frame's marker
    val frames = Multimodal.y4mFrameLuma(assetsOf(1L -> bad))
      .collect().map(r => r.getAs[Long]("frame_idx") ->
        r.getAs[Boolean]("marker_ok")).toMap
    assert(frames(0L) === true)
    assert(frames(1L) === false)
  }

  test("invalid containers surface as is_valid=false rows; forged geometry cannot explode") {
    val badMagic = ascii("YUV4MPEGX W2 H2 Cmono\n") ++ ascii("FRAME\n") ++
      Array[Byte](1, 1, 1, 1)
    val truncated = ascii("YUV4MPEG2 W2 H2 Cmono\n") ++ ascii("FRAME\n") ++
      Array[Byte](1, 1, 1) // one luma byte short
    val forged = ascii("YUV4MPEG2 W99999999 H99999999 Cmono\n") ++
      ascii("FRAME\n") ++ Array[Byte](1, 1, 1, 1)
    // 10-bit 4:2:0 (2 bytes/sample): must NOT validate as 8-bit — the
    // stream would misframe and report garbage sums
    val tenBit = ascii("YUV4MPEG2 W2 H2 C420p10\n") ++
      (ascii("FRAME\n") ++ Array.fill[Byte](12)(7)) ++
      (ascii("FRAME\n") ++ Array.fill[Byte](12)(9))
    val t0 = System.nanoTime()
    val rows = Multimodal.y4mFrameLuma(
      assetsOf(1L -> badMagic, 2L -> truncated, 3L -> forged, 4L -> tenBit))
      .collect()
    // the corrupt assets are VISIBLE findings (one null-stats row each),
    // never silently dropped and never decoded wrong
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(!r.getAs[Boolean]("is_valid"))
      assert(r.isNullAt(r.fieldIndex("sum_y")))
    }
    assert((System.nanoTime() - t0) < 60e9, "forged header must not explode")
    // and a desynced-but-length-consistent stream never feeds scene cuts
    assert(Multimodal.y4mSceneCuts(assetsOf(4L -> tenBit)).count() === 0)
  }

  test("a 9-digit dimension token is rejected, never truncated to a prefix") {
    import graft.functions.MediaWalks
    // W has nine digits: parsing the first eight (12345678) would claim a
    // DIFFERENT geometry than the header wrote — dim() must reject it
    // outright (the PPM token() discipline), not parse a prefix
    val nine = MediaWalks.y4mHeader(
      ascii("YUV4MPEG2 W123456789 H2 Cmono\n") ++ Array[Byte](1))
    assert(!nine.isValid && nine.w === -1L)
    // eight digits still parse (and then fail only the length check here)
    val eight = MediaWalks.y4mHeader(
      ascii("YUV4MPEG2 W12345678 H2 Cmono\n") ++ Array[Byte](1))
    assert(eight.w === 12345678L)
  }

  test("variable-stride FRAME <params> frames decode via the sequential scan") {
    // spec-legal per-frame parameters: no fixed stride exists, so the
    // exact-length check fails and the marker-line scan must carry it
    // (params sized so the total tail is NOT divisible by the fixed
    // stride: a coincidental length match decodes via the marker-agnostic
    // fixed path and surfaces its garbage markers as marker_ok = false)
    val varStride = ascii("YUV4MPEG2 W2 H2 Cmono\n") ++
      ascii("FRAME Xtag=12\n") ++ Array[Byte](10, 20, 30, 40) ++
      ascii("FRAME\n") ++ Array[Byte](1, 2, 3, 4) ++
      ascii("FRAME I5\n") ++ Array[Byte](5, 5, 5, 5)
    // and the C420 variant skips chroma inside fsize exactly as fixed does
    val varC420 = ascii("YUV4MPEG2 W2 H2 C420\n") ++
      ascii("FRAME T\n") ++ Array[Byte](7, 7, 7, 7, 99, 99)
    val frames = Multimodal.y4mFrameLuma(
      assetsOf(1L -> varStride, 2L -> varC420))
      .collect().map(r => (r.getAs[Long]("asset_id"),
        r.getAs[Long]("frame_idx")) ->
        (r.getAs[Boolean]("is_valid"), r.getAs[Boolean]("marker_ok"),
          r.getAs[Long]("sum_y"))).toMap
    assert(frames((1L, 0L)) === ((true, true, 100L)))
    assert(frames((1L, 1L)) === ((true, true, 10L)))
    assert(frames((1L, 2L)) === ((true, true, 20L)))
    assert(frames((2L, 0L)) === ((true, true, 28L)))
    // truncated variable container (last plane short) stays invalid —
    // dropped by 2 so the tail also cannot masquerade as a fixed layout
    // (a coincidental fixed-length match is DEFINED to decode via the
    // marker-agnostic fixed path, surfacing its markers as false)
    val truncated = varStride.dropRight(2)
    val bad = Multimodal.y4mFrameLuma(assetsOf(3L -> truncated)).collect()
    assert(bad.length === 1 && !bad.head.getAs[Boolean]("is_valid"))
    // a marker typo mid-stream desyncs the scan: invalid, never wrong sums
    val typo = varStride.clone()
    typo(22 + 14 + 4 + 2) = 'X'.toByte // corrupt the second frame's marker
    val bad2 = Multimodal.y4mFrameLuma(assetsOf(4L -> typo)).collect()
    assert(bad2.length === 1 && !bad2.head.getAs[Boolean]("is_valid"))
    // "FRAME" must be followed by newline or " <params>": a glued token
    // ("FRAMEX...") is not a frame marker and must not validate — the
    // tail is sized so no fixed layout matches either
    val glued = ascii("YUV4MPEG2 W2 H2 Cmono\n") ++
      ascii("FRAMEXjunk\n") ++ Array[Byte](1, 1, 1, 1) ++
      ascii("FRAME\n") ++ Array[Byte](2, 2, 2, 2)
    val bad3 = Multimodal.y4mFrameLuma(assetsOf(5L -> glued)).collect()
    assert(bad3.length === 1 && !bad3.head.getAs[Boolean]("is_valid"))
  }

  test("scene cuts: a hard luma jump is reported, steady frames are not") {
    val quiet = Array.fill(24)(10.toByte)
    val loud = Array.fill(24)(200.toByte)
    val payload = quiet ++ quiet ++ loud ++ loud
    val cuts = Multimodal.y4mSceneCuts(
      Multimodal.encodeY4m(assetsOf(1L -> payload), width = 6, height = 4),
      thresholdMilli = 5000L)
      .collect().map(r => r.getAs[Long]("frame_idx") ->
        r.getAs[Long]("delta_milli")).toMap
    // 10 -> 200 at frame 2: delta = 190 * 1000 = 190000 (values are
    // unsigned bytes: 200 stays 200)
    assert(cuts === Map(2L -> 190000L))
  }

  test("round trip on real documents matches direct frame math") {
    val docs = Tables.documents(spark, sf0001).filter(col("doc_id") < 40)
    val frames = Multimodal.y4mFrameLuma(
      Multimodal.encodeY4m(Multimodal.documentsAsAssets(docs),
        width = 6, height = 4))
      .collect()
    assert(frames.nonEmpty)
    val raw = docs.select(col("doc_id"), col("text").cast("binary").as("p"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Array[Byte]]("p")).toMap
    frames.foreach { r =>
      val p = raw(r.getAs[Long]("asset_id"))
      val f = r.getAs[Long]("frame_idx").toInt
      val expected = p.slice(f * 24, f * 24 + 24).map(_ & 0xff).map(_.toLong).sum
      assert(r.getAs[Long]("sum_y") === expected)
      assert(r.getAs[Boolean]("marker_ok"))
    }
  }
}
