package graft.functions

import graft.SparkSpec

/** WARC codec conformance (E246, ISO 28500 record grammar + the Common
  * Crawl per-record-gzip wire shape). The q288/q289 oracle pins the
  * stats arithmetic; this spec pins the grammar (mandatory headers,
  * Content-Length verification, terminators), the gzip member walk
  * (CRC32/ISIZE, one-record-per-member), and every reject path.
  */
class WarcCodecSpec extends SparkSpec {

  private def fixture(n: Int, seed: Int): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)((rng.nextInt(256) - 128).toByte)
  }

  private def byteSum(payload: Array[Byte], upTo: Int): Long =
    (0 until upTo).map(i => (payload(i) & 0xff).toLong).sum

  /** One gzip member over arbitrary bytes — for crafting members the
    * engine's encoder would never emit.
    */
  private def gzMember(rec: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte))
    val d = new java.util.zip.Deflater(-1, true)
    d.setInput(rec); d.finish()
    val buf = new Array[Byte](8192)
    while (!d.finished()) { val k = d.deflate(buf); out.write(buf, 0, k) }
    d.end()
    val crc = new java.util.zip.CRC32; crc.update(rec)
    def u32(v: Long): Unit = (0 until 4).foreach(i =>
      out.write(((v >>> (8 * i)) & 0xff).toInt))
    u32(crc.getValue); u32(rec.length.toLong)
    out.toByteArray
  }

  test("plain shape: records round-trip with whole-record truncation") {
    val payload = fixture(3 * 256 + 100, 1)
    val warc = WarcCodec.encodeWarc(payload, 256)
    assert(warc !== null)
    val d = WarcCodec.decodeWarc(warc)
    assert(d.valid)
    assert((d.nRecords, d.nResponses, d.contentBytes) === ((3L, 3L, 768L)))
    assert(d.sumPayload === byteSum(payload, 768))
    // no full record: encode drops
    assert(WarcCodec.encodeWarc(fixture(255, 2), 256) === null)
  }

  test("record-gzip shape reports IDENTICAL stats to the plain shape") {
    val payload = fixture(5 * 256 + 31, 3)
    val plain = WarcCodec.decodeWarc(WarcCodec.encodeWarc(payload, 256))
    val gz = WarcCodec.decodeWarcGz(WarcCodec.encodeWarcGz(payload, 256))
    assert(gz.valid && plain.valid)
    assert(gz === plain, "compression changes the wire, never the records")
  }

  test("unknown headers are spec-legal and skipped") {
    val rec = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:x:1>\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "WARC-Payload-Digest: sha1:ABC\r\n" + // real crawls carry these
      "WARC-Concurrent-To: <urn:x:0>\r\n" +
      "Content-Length: 5\r\n" +
      "\r\nhello\r\n\r\n").getBytes("US-ASCII")
    val d = WarcCodec.decodeWarc(rec)
    assert(d.valid)
    assert(d.nRecords === 1L && d.contentBytes === 5L)
    assert(d.sumPayload === "hello".getBytes("US-ASCII").map(_.toLong).sum)
  }

  test("ISO 28500 separator: the space after the colon is optional") {
    // grammar is `field-name ":" *WS field-value` — "Name:value" with no
    // space and "Name:\tvalue" with a tab are both conformant
    val rec = ("WARC/1.0\r\n" +
      "WARC-Type:response\r\n" +
      "WARC-Record-ID:\t<urn:x:1>\r\n" +
      "WARC-Date:2026-01-01T00:00:00Z\r\n" +
      "Content-Length:   5\r\n" +
      "\r\nhello\r\n\r\n").getBytes("US-ASCII")
    val d = WarcCodec.decodeWarc(rec)
    assert(d.valid, "no-space separators are conformant")
    assert(d.nRecords === 1L && d.contentBytes === 5L)
    // but whitespace INSIDE a field-name is not a token (extra header so
    // the reject is FOR the bad name, not a missing mandatory)
    assert(!WarcCodec.decodeWarc(new String(rec, "US-ASCII").replace(
      "WARC-Type:response\r\n",
      "WARC-Type:response\r\nX Header: z\r\n").getBytes("US-ASCII")).valid)
    // and an empty field-name still rejects
    assert(!WarcCodec.decodeWarc(new String(rec, "US-ASCII").replace(
      "WARC-Type:response\r\n",
      "WARC-Type:response\r\n: z\r\n").getBytes("US-ASCII")).valid)
  }

  test("plain reject paths: grammar violations are visible findings") {
    def rec(head: String, body: String = "hello", term: String = "\r\n\r\n") =
      (head + body + term).getBytes("US-ASCII")
    val goodHead = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:x:1>\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "Content-Length: 5\r\n\r\n"
    assert(WarcCodec.decodeWarc(rec(goodHead)).valid)
    // missing mandatory header (no WARC-Date)
    assert(!WarcCodec.decodeWarc(rec(goodHead.replace(
      "WARC-Date: 2026-01-01T00:00:00Z\r\n", ""))).valid)
    // duplicated mandatory header
    assert(!WarcCodec.decodeWarc(rec(goodHead.replace(
      "WARC-Type: response\r\n",
      "WARC-Type: response\r\nWARC-Type: request\r\n"))).valid)
    // non-numeric and lying Content-Length
    assert(!WarcCodec.decodeWarc(rec(goodHead.replace(
      "Content-Length: 5", "Content-Length: 5x"))).valid)
    assert(!WarcCodec.decodeWarc(rec(goodHead.replace(
      "Content-Length: 5", "Content-Length: 6"))).valid)
    // record-id not angle-bracketed
    assert(!WarcCodec.decodeWarc(rec(goodHead.replace(
      "<urn:x:1>", "urn:x:1"))).valid)
    // bad version line
    assert(!WarcCodec.decodeWarc(rec(goodHead.replace(
      "WARC/1.0", "WARC/2.0"))).valid)
    // missing terminator / trailing garbage / truncation
    assert(!WarcCodec.decodeWarc(rec(goodHead, term = "\r\n")).valid)
    val g = rec(goodHead)
    assert(!WarcCodec.decodeWarc(g :+ 'x'.toByte).valid)
    assert(!WarcCodec.decodeWarc(g.dropRight(1)).valid)
  }

  test("gzip reject paths: CRC/ISIZE lies, truncation, multi-record members") {
    val payload = fixture(2 * 256, 7)
    val gz = WarcCodec.encodeWarcGz(payload, 256)
    assert(WarcCodec.decodeWarcGz(gz).valid)
    // corrupt the FIRST member's CRC (it sits 8 bytes before the second
    // member's magic — locate member 2 by scanning for 1f 8b 08 00)
    val m2 = (1 until gz.length - 3).find(i =>
      (gz(i) & 0xff) == 0x1f && (gz(i + 1) & 0xff) == 0x8b &&
      (gz(i + 2) & 0xff) == 8 && (gz(i + 3) & 0xff) == 0).get
    val badCrc = gz.clone(); badCrc(m2 - 8) = (badCrc(m2 - 8) ^ 1).toByte
    assert(!WarcCodec.decodeWarcGz(badCrc).valid)
    val badIsize = gz.clone(); badIsize(m2 - 4) = (badIsize(m2 - 4) ^ 1).toByte
    assert(!WarcCodec.decodeWarcGz(badIsize).valid)
    // truncated final member
    assert(!WarcCodec.decodeWarcGz(gz.dropRight(1)).valid)
    // a member holding TWO records breaks the splittable contract
    val twoRecords = WarcCodec.encodeWarc(payload, 256)
    assert(WarcCodec.decodeWarc(twoRecords).nRecords === 2L)
    assert(!WarcCodec.decodeWarcGz(gzMember(twoRecords)).valid,
      "one record per gzip member is the contract")
    // a single-record member crafted by hand still decodes
    val oneRecord = WarcCodec.encodeWarc(fixture(256, 8), 256)
    assert(WarcCodec.decodeWarcGz(gzMember(oneRecord)).valid)
    // shape confusion: plain bytes are not a gzip stream and vice versa
    assert(!WarcCodec.decodeWarcGz(twoRecords).valid)
    assert(!WarcCodec.decodeWarc(gz).valid)
  }

  test("engine surface: Multimodal.encodeWarc / warcStats both shapes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val payload = fixture(1000, 9)
    val assets = Seq((1L, payload)).toDF("asset_id", "bytes")
      .withColumn("kind", lit("text"))
      .withColumn("meta", struct(lit("s").as("source"), lit("m").as("mime")))
    for (gz <- Seq(false, true)) {
      val out = graft.ext.Multimodal.warcStats(
        graft.ext.Multimodal.encodeWarc(assets, recordBytes = 256, gz = gz),
        gz = gz).collect()
      assert(out.length === 1)
      val r = out.head
      assert(r.getAs[Boolean]("is_valid"))
      assert(r.getAs[Long]("n_records") === 3L)
      assert(r.getAs[Long]("sum_payload") === byteSum(payload, 768))
    }
  }
}
