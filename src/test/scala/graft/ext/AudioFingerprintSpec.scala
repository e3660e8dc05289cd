package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Audio energy-contour fingerprint (E222/E223): bit semantics pinned on
  * hand-built PCM streams, then the shared band join proven equal to
  * brute force on the documents-as-audio fixture.
  */
class AudioFingerprintSpec extends SparkSpec {

  /** 130 little-endian int16 samples (windowSamples = 2 ⇒ 65 windows). */
  private def pcm(sample: Int => Int): Array[Byte] = {
    val out = new Array[Byte](260)
    for (i <- 0 until 130) {
      val v = sample(i)
      require(v >= -32768 && v <= 32767, s"sample out of range: $v")
      out(2 * i) = (v & 0xff).toByte
      out(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    out
  }

  private def assetsOf(rows: (Long, Array[Byte])*) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toSeq.toDF("asset_id", "payload")
      .select(col("asset_id"), lit("audio").as("kind"),
        col("payload").as("bytes"),
        struct(lit("test").as("source"), lit("pcm").as("mime")).as("meta"))
  }

  test("contour bits: rising energy sets every bit, falling sets none") {
    val assets = assetsOf(
      1L -> pcm(i => i), // energy (2w)^2+(2w+1)^2 strictly rising
      2L -> pcm(i => 1000 - i), // strictly falling (all positive)
      3L -> pcm(_ => 5)) // flat: ties are 0 (strict >)
    val fp = Multimodal.audioFingerprint(assets, windowSamples = 2)
      .collect().map(r => r.getAs[Long]("asset_id") ->
        (r.getAs[Long]("fp_lo"), r.getAs[Long]("fp_hi"))).toMap
    assert(fp(1L) === (4294967295L, 4294967295L))
    assert(fp(2L) === (0L, 0L))
    assert(fp(3L) === (0L, 0L))
  }

  test("prefix discipline: bytes past 65 windows never change the fingerprint") {
    val base = pcm(i => i * 3 % 251)
    val longer = base ++ Array.fill(4096)(0x55.toByte)
    val fp = Multimodal.audioFingerprint(assetsOf(1L -> base, 2L -> longer),
      windowSamples = 2)
      .collect().map(r => r.getAs[Long]("asset_id") ->
        (r.getAs[Long]("fp_lo"), r.getAs[Long]("fp_hi"))).toMap
    assert(fp(1L) === fp(2L))
  }

  test("assets shorter than 65 windows are dropped") {
    val short = new Array[Byte](258) // 129 samples < 130
    val fp = Multimodal.audioFingerprint(assetsOf(1L -> short),
      windowSamples = 2)
    assert(fp.count() === 0)
  }

  test("mid-stream edit flips only the touched windows' bits") {
    val base = pcm(i => (i * 37) % 2000 - 1000)
    val edited = base.clone()
    // overwrite sample 40 (window 20): only bits 19 and 20 can flip
    edited(80) = 0x10; edited(81) = 0x7f
    val pairs = Multimodal.fingerprintNearDup(
      Multimodal.audioFingerprint(
        assetsOf(1L -> base, 2L -> base.clone(), 3L -> edited),
        windowSamples = 2),
      "fp_lo", "fp_hi", maxHamming = 6)
      .collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b")) ->
        r.getAs[Long]("hamming")).toMap
    assert(pairs((1L, 2L)) === 0L)
    assert(pairs((1L, 3L)) <= 2L && pairs((1L, 3L)) >= 1L)
  }

  test("128-bit fingerprint: rising contour sets all four words, falling none") {
    // 130 samples cover the 129 windows at windowSamples = 1
    val assets = assetsOf(
      1L -> pcm(i => i),        // v^2 strictly rising from 0
      2L -> pcm(i => 1000 - i), // strictly falling (all positive)
      3L -> pcm(_ => 5))        // flat: ties are 0 (strict >)
    val fp = Multimodal.audioFingerprint128(assets, windowSamples = 1)
      .collect().map(r => r.getAs[Long]("asset_id") ->
        ((r.getAs[Long]("f0"), r.getAs[Long]("f1"),
          r.getAs[Long]("f2"), r.getAs[Long]("f3")))).toMap
    assert(fp(1L) === ((4294967295L, 4294967295L, 4294967295L, 4294967295L)))
    assert(fp(2L) === ((0L, 0L, 0L, 0L)))
    assert(fp(3L) === ((0L, 0L, 0L, 0L)))
    // shorter than 129 windows: dropped (fingerprint undefined)
    assert(Multimodal.audioFingerprint128(
      assetsOf(9L -> new Array[Byte](256)), windowSamples = 1).count() === 0)
  }

  test("128-bit mid-stream edit flips only the touched windows' bits") {
    val base = pcm(i => (i * 37) % 2000 - 1000)
    val edited = base.clone()
    // overwrite sample 40 (window 40 at windowSamples = 1): only bits 39
    // and 40 can flip — both in word f1
    edited(80) = 0x10; edited(81) = 0x7f
    val pairs = Multimodal.fingerprintNearDup(
      Multimodal.audioFingerprint128(
        assetsOf(1L -> base, 2L -> base.clone(), 3L -> edited),
        windowSamples = 1),
      Seq("f0", "f1", "f2", "f3"), maxHamming = 6)
      .collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b")) ->
        r.getAs[Long]("hamming")).toMap
    assert(pairs((1L, 2L)) === 0L)
    assert(pairs((1L, 3L)) <= 2L && pairs((1L, 3L)) >= 1L)
  }

  test("128-bit band join (8x16-bit bands) equals brute force on documents") {
    val docs = Tables.documents(spark, sf0001).filter(col("doc_id") < 120)
      .select(col("doc_id"), col("text"), col("source"))
    val variants = docs.select((col("doc_id") + 1000000L).as("doc_id"),
      expr("concat(substr(text, 1, 100), '~', substr(text, 102))").as("text"),
      col("source"))
    val fps = Multimodal.audioFingerprint128(
      Multimodal.documentsAsAssets(docs.unionByName(variants)),
      windowSamples = 1).localCheckpoint()
    val viaBands = Multimodal.fingerprintNearDup(fps,
      Seq("f0", "f1", "f2", "f3"), maxHamming = 6)
      .collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"),
        r.getAs[Long]("hamming"))).toSet
    val h = fps.collect()
      .map(r => (r.getAs[Long]("asset_id"),
        Seq(r.getAs[Long]("f0"), r.getAs[Long]("f1"),
          r.getAs[Long]("f2"), r.getAs[Long]("f3"))))
    val brute = (for {
      (a, wa) <- h; (b, wb) <- h if a < b
      d = wa.zip(wb).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if d <= 6
    } yield (a, b, d.toLong)).toSet
    assert(viaBands === brute)
    assert(brute.nonEmpty, "fixture produced no near-dup pairs")
  }

  test("band join equals brute force on the documents fixture") {
    val docs = Tables.documents(spark, sf0001).filter(col("doc_id") < 120)
      .select(col("doc_id"), col("text"), col("source"))
    val variants = docs.select((col("doc_id") + 1000000L).as("doc_id"),
      expr("concat(substr(text, 1, 100), '~', substr(text, 102))").as("text"),
      col("source"))
    val fps = Multimodal.audioFingerprint(
      Multimodal.documentsAsAssets(docs.unionByName(variants)),
      windowSamples = 2).localCheckpoint()
    val viaBands = Multimodal.fingerprintNearDup(fps, "fp_lo", "fp_hi", 6)
      .collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"),
        r.getAs[Long]("hamming"))).toSet
    val h = fps.collect()
      .map(r => (r.getAs[Long]("asset_id"), r.getAs[Long]("fp_lo"),
        r.getAs[Long]("fp_hi")))
    val brute = (for {
      (a, la, ha) <- h; (b, lb, hb) <- h if a < b
      d = java.lang.Long.bitCount(la ^ lb) + java.lang.Long.bitCount(ha ^ hb)
      if d <= 6
    } yield (a, b, d.toLong)).toSet
    assert(viaBands === brute)
    assert(brute.nonEmpty, "fixture produced no near-dup pairs")
  }
}
