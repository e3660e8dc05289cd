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

  test("HTTP layer: crawl-shaped archives round-trip, both wire shapes") {
    val payload = fixture(9 * 256 + 77, 11) // 9 slices: 2 of them 404
    for (gz <- Seq(false, true)) {
      val warc = WarcCodec.encodeWarcHttp(payload, 256, gz)
      assert(warc !== null)
      val (d, recs) = WarcCodec.decodeWarcHttp(warc, gz, collect = true)
      assert(d.valid, s"gz=$gz")
      assert(d.nRecords === 18L) // request + response per slice
      assert(d.nRequests === 9L && d.nResponses === 9L)
      assert(d.n200 === 7L) // slices 3 and 7 are the fixture 404s
      assert(d.bodyBytes === 9L * 256)
      assert(d.sumBody === byteSum(payload, 9 * 256))
      assert(d.nPaired === 9L, "every request's Concurrent-To resolves")
      // the EXTRACTION contract: response bodies concatenated in archive
      // order ARE the truncated payload
      assert(recs.map(_.recIdx) === (0L until 9L))
      assert(recs.map(_.status) ===
        (0 until 9).map(i => WarcCodec.fixtureStatus(i).toLong))
      val joined = recs.flatMap(_.body).toArray
      assert(java.util.Arrays.equals(joined, payload.take(9 * 256)),
        "extracted bodies must reassemble the document bytes")
    }
    // no full body slice
    assert(WarcCodec.encodeWarcHttp(fixture(255, 12), 256, gz = false) === null)
  }

  test("HTTP reject paths: status lines, header splits, body truncation") {
    val payload = fixture(2 * 256, 13)
    val warc = WarcCodec.encodeWarcHttp(payload, 256, gz = false)
    val text = new String(warc, "ISO-8859-1")
    def mutate(from: String, to: String): Boolean = {
      assert(text.contains(from), s"fixture must contain: $from")
      // keep WARC Content-Length consistent: only same-length edits
      assert(from.length == to.length, "test edits must preserve lengths")
      WarcCodec.decodeWarcHttp(
        text.replace(from, to).getBytes("ISO-8859-1"), gz = false,
        collect = false)._1.valid
    }
    assert(WarcCodec.decodeWarcHttp(warc, false, false)._1.valid)
    // malformed status line: bad version, non-numeric code, missing SP
    assert(!mutate("HTTP/1.1 200 OK", "HTTP/2.1 200 OK"))
    assert(!mutate("HTTP/1.1 200 OK", "HTTP/1.1 2o0 OK"))
    assert(!mutate("HTTP/1.1 200 OK", "HTTP/1.1  200OK"))
    // out-of-range status
    assert(!mutate("HTTP/1.1 200 OK", "HTTP/1.1 000 OK"))
    // header name with embedded whitespace is not a token
    assert(!mutate("Content-Type: text/plain", "Content Type: text/plain"))
    // HTTP Content-Length lying about the body (bigger AND smaller)
    assert(!mutate("Content-Length: 256", "Content-Length: 257"))
    assert(!mutate("Content-Length: 256", "Content-Length: 255"))
    // request line violations
    assert(!mutate("GET /doc/0 HTTP/1.1", "GET /doc/0 HTTP/1.9"))
    assert(!mutate("GET /doc/0 HTTP/1.1", "get /doc/0 HTTP/1.1"))
    // a response block that isn't HTTP at all
    assert(!mutate("HTTP/1.1 200 OK\r\n", "XTTP/1.1 200 OK\r\n"))
  }

  test("HTTP pairing: dangling Concurrent-To and duplicate ids are visible") {
    val payload = fixture(3 * 256, 14)
    val warc = WarcCodec.encodeWarcHttp(payload, 256, gz = false)
    val text = new String(warc, "ISO-8859-1")
    // point one request at a response that is NOT in the archive (same
    // length, different id) — the request parses but no longer pairs
    val dangling = text.replace(
      "WARC-Concurrent-To: <urn:graft:record-1>",
      "WARC-Concurrent-To: <urn:graft:recorx-1>")
    val (d, _) = WarcCodec.decodeWarcHttp(
      dangling.getBytes("ISO-8859-1"), gz = false, collect = false)
    assert(d.valid)
    assert(d.nRequests === 3L && d.nPaired === 2L,
      "a dangling link is unpaired, not invalid")
    // duplicate response record-ids break pairing integrity: visible
    val dup = text.replace("<urn:graft:record-2>", "<urn:graft:record-0>")
    assert(!WarcCodec.decodeWarcHttp(
      dup.getBytes("ISO-8859-1"), gz = false, collect = false)._1.valid)
  }

  test("chunked transfer coding: dechunked stats equal the plain wire") {
    val payload = fixture(5 * 256 + 19, 15)
    val plain = WarcCodec.decodeWarcHttp(
      WarcCodec.encodeWarcHttp(payload, 256, gz = false), gz = false,
      collect = true)
    for (gz <- Seq(false, true)) {
      val warc = WarcCodec.encodeWarcHttp(payload, 256, gz, chunked = true)
      // the wire really is chunked (multi-chunk: 100+100+56 per body)
      if (!gz) {
        val text = new String(warc, "ISO-8859-1")
        assert(text.contains("Transfer-Encoding: chunked"))
        assert(text.contains("64\r\n")) // 0x64 = 100-byte chunk size line
        assert(!text.contains("Content-Length: 256"))
      }
      val (d, recs) = WarcCodec.decodeWarcHttp(warc, gz, collect = true)
      assert(d.valid, s"gz=$gz")
      assert(d === plain._1, "chunking changes the wire, never the stats")
      // dechunked bodies reassemble the document bytes
      val joined = recs.flatMap(_.body).toArray
      assert(java.util.Arrays.equals(joined, payload.take(5 * 256)))
    }
  }

  test("chunked reject paths: smuggling, bad sizes, framing violations") {
    val payload = fixture(2 * 256, 16)
    val warc = WarcCodec.encodeWarcHttp(payload, 256, gz = false,
      chunked = true)
    val text = new String(warc, "ISO-8859-1")
    assert(WarcCodec.decodeWarcHttp(warc, false, false)._1.valid)
    def mutate(from: String, to: String): Boolean = {
      assert(text.contains(from) && from.length == to.length)
      WarcCodec.decodeWarcHttp(
        text.replace(from, to).getBytes("ISO-8859-1"), gz = false,
        collect = false)._1.valid
    }
    // CL + TE together: the RFC's canonical smuggling vector (pad the
    // TE header into a same-length CL header... lengths differ, so
    // instead corrupt the terminator/size lines, same-length edits)
    // non-hex chunk size line
    assert(!mutate("64\r\n", "6g\r\n"))
    // a chunk size that overruns the block
    assert(!mutate("64\r\n", "ff\r\n"))
    // 0-size terminator must end the body exactly: break the final CRLF
    assert(!mutate("0\r\n\r\n", "0\r\n\r\r"))
    // Transfer-Encoding value must be the single "chunked" coding
    assert(!mutate("Transfer-Encoding: chunked",
      "Transfer-Encoding: chunkex"))
    // CL + TE together is the RFC's canonical smuggling vector: turn
    // the HTTP Content-Type header into a Content-Length of the same
    // length, so the block now carries BOTH framings
    assert(!mutate("Content-Type: text/plain", "Content-Length: 00000256"))
  }

  test("Content-Type gates the HTTP parse: non-HTTP responses stay opaque") {
    // the mixed shape: slices 4 and 9 are octet-stream response records
    // captured from another protocol — a conformant consumer keeps them
    // opaque (counted, never parsed, never invalidating)
    val payload = fixture(10 * 32, 16)
    def sliceSum(i: Int): Long =
      (i * 32 until (i + 1) * 32).map(payload(_) & 0xff).map(_.toLong).sum
    for (gz <- Seq(false, true)) {
      val warc = WarcCodec.encodeWarcHttp(payload, 32, gz, mixed = true)
      val (d, recs) = WarcCodec.decodeWarcHttp(warc, gz, collect = true)
      assert(d.valid, s"gz=$gz: a mixed crawl must not false-invalidate")
      assert(d.nRecords === 18L) // 2 per HTTP slice + 1 per opaque slice
      assert(d.nRequests === 8L && d.nResponses === 10L)
      // HTTP 200s: i in 0..9 minus opaque {4, 9} minus fixture 404s {3, 7}
      assert(d.n200 === 6L)
      assert(d.bodyBytes === 8L * 32, "opaque blocks are not HTTP bodies")
      assert(d.sumBody ===
        (0 until 10).filter(_ % 5 != 4).map(sliceSum).sum)
      assert(d.nPaired === 8L)
      // the extraction fan-out carries HTTP responses only
      assert(recs.map(_.recIdx) === (0L until 8L))
      assert(recs.map(_.bodySum) ===
        (0 until 10).filter(_ % 5 != 4).map(sliceSum))
    }
    // a response record with NO Content-Type at all is opaque-valid too
    val bare = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:x:1>\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "Content-Length: 5\r\n" +
      "\r\nhello\r\n\r\n").getBytes("US-ASCII")
    val (db, rb) = WarcCodec.decodeWarcHttp(bare, gz = false, collect = true)
    assert(db.valid && db.nResponses === 1L && db.n200 === 0L &&
      db.bodyBytes === 0L && rb.isEmpty)
    // a msgtype CONTRADICTING the WARC-Type is a forgery: visible
    val httpWarc = new String(
      WarcCodec.encodeWarcHttp(fixture(2 * 32, 17), 32, gz = false),
      "ISO-8859-1")
    val forged = httpWarc.replace("msgtype=response", "msgtype=request")
    assert(!WarcCodec.decodeWarcHttp(
      forged.getBytes("ISO-8859-1"), gz = false, collect = false)._1.valid)
    // a repeated Content-Type header rejects (at most once per record)
    val dup = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:x:1>\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "Content-Type: a/b\r\n" +
      "Content-Type: a/b\r\n" +
      "Content-Length: 5\r\n" +
      "\r\nhello\r\n\r\n").getBytes("US-ASCII")
    assert(!WarcCodec.decodeWarcHttp(dup, gz = false, collect = false)._1.valid)
  }

  test("WAT extraction (E277): html wire metadata, title + href values") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val payload = fixture(5 * 64 + 9, 13)
    // codec level: the html wire wraps each slice deterministically
    val warc = WarcCodec.encodeWarcHttp(payload, 64, gz = false, html = true)
    val (d, recs) = WarcCodec.decodeWarcHttp(warc, gz = false, collect = true)
    assert(d.valid && recs.length === 5)
    recs.foreach { r =>
      assert(r.contentType === "text/html")
      assert(r.nHeaders === 2L)
      val body = new String(r.body, "ISO-8859-1")
      val i = r.recIdx
      val nl = (payload((i * 64).toInt) & 0xff) % 3 + 1
      assert(body.startsWith(s"<html><head><title>d$i</title>"))
      assert(body.endsWith("</body></html>"))
      assert(body.sliding(9).count(_ == "<a href=\"") === nl,
        s"record $i must carry ${nl} slice-derived outlinks")
    }
    // the plain wire keeps its shape: text/plain, no links to extract
    val plain = WarcCodec.encodeWarcHttp(payload, 64, gz = false)
    val (_, precs) = WarcCodec.decodeWarcHttp(plain, gz = false,
      collect = true)
    assert(precs.forall(_.contentType === "text/plain"))

    // engine surface: warcWatExtracts pulls the VALUES, not just counts
    val assets = Seq((1L, payload)).toDF("asset_id", "bytes")
      .withColumn("kind", lit("text"))
      .withColumn("meta", struct(lit("s").as("source"), lit("m").as("mime")))
    val rows = graft.ext.Multimodal.warcWatExtracts(
      graft.ext.Multimodal.encodeWarcHttp(assets, bodyBytes = 64,
        html = true)).orderBy("rec_idx").collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val i = r.getAs[Long]("rec_idx")
      val nl = (payload((i * 64).toInt) & 0xff) % 3 + 1
      assert(r.getAs[String]("title") === s"d$i")
      assert(r.getAs[Long]("n_links") === nl.toLong)
      assert(r.getAs[String]("content_type") === "text/html")
      assert(r.getAs[Long]("n_headers") === 2L)
      val refs = (0 until nl).map(k => s"/d$i/k$k").mkString("|")
      val exp = java.security.MessageDigest.getInstance("MD5")
        .digest(refs.getBytes("US-ASCII")).map("%02x".format(_)).mkString
      assert(r.getAs[String]("link_hash") === exp,
        s"record $i: the href VALUES must be extracted in document order")
    }
    // non-HTML payloads degrade to empty metadata, never invalidate
    val plainRows = graft.ext.Multimodal.warcWatExtracts(
      graft.ext.Multimodal.encodeWarcHttp(assets, bodyBytes = 64)).collect()
    assert(plainRows.forall(r => r.getAs[Long]("n_links") === 0L &&
      r.getAs[String]("title") === ""))
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
