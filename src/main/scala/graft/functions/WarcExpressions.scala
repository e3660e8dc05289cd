package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** WARC web-archive codec (E246) — the container web-crawl corpora
  * actually ship in (ISO 28500; the public Common Crawl layout). Two
  * wire shapes, one record grammar:
  *
  *  - **plain**: concatenated records — `WARC/1.0\r\n`, header lines
  *    (`Name: value\r\n`), a blank line, exactly `Content-Length` block
  *    bytes, then `\r\n\r\n`.
  *  - **record-gzip**: each record individually gzip'd and the members
  *    concatenated — the Common Crawl convention (it keeps the archive
  *    splittable: a reader can start at any member boundary). The
  *    decoder walks members with the JDK Inflater (the PNG DEFLATE
  *    precedent), verifies each member's CRC32 AND ISIZE trailer, and
  *    requires each member to hold EXACTLY one record.
  *
  * STRICTNESS: the four spec-mandatory headers (WARC-Type,
  * WARC-Record-ID, WARC-Date, Content-Length) must each appear exactly
  * once per record; unknown headers are skipped (spec-legal — real
  * records carry digests, IP addresses, concurrent-to links); a
  * malformed header line, a bad version, a Content-Length that
  * disagrees with the bytes present, a missing record terminator,
  * trailing garbage, a gzip member whose CRC/ISIZE lies, or a member
  * holding more or less than one record all report `is_valid = false`.
  * Header separator follows the ISO 28500 grammar `field-name ":" *WS
  * field-value` — the space after the colon is optional. Zip-bomb
  * bound: per-member inflated output is capped incrementally at
  * DEFLATE's own 1032:1 maximum expansion of the bytes the member has
  * consumed so far (+64 KiB slack), so a forged member cannot allocate
  * beyond what its own compressed size could honestly encode.
  *
  * ORACLE: fixtures slice the payload into fixed `recordBytes` blocks
  * (whole records only), so record counts, content byte totals, and the
  * block byte-sum all read straight off the truncated raw payload in
  * DuckDB — and the gzip shape must produce IDENTICAL stats to the
  * plain shape (compression changes the wire, never the records), the
  * q275/q276 two-shapes-one-oracle discipline.
  *
  * Scale: one native pass per asset, O(record) state — at 100 TB the
  * per-record-gzip shape is what makes a crawl archive splittable
  * across executors in the first place.
  */
object WarcCodec {

  /** Build one response record with deterministic headers. */
  private def record(i: Long, block: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: response\r\n")
    sb.append(s"WARC-Record-ID: <urn:graft:record-$i>\r\n")
    sb.append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
    sb.append(s"WARC-Target-URI: https://example.com/doc/$i\r\n")
    sb.append("Content-Type: text/plain\r\n")
    sb.append(s"Content-Length: ${block.length}\r\n")
    sb.append("\r\n")
    val head = sb.result().getBytes("US-ASCII")
    val out = new Array[Byte](head.length + block.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(block, 0, out, head.length, block.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Encode the payload as a plain WARC of ⌊len/recordBytes⌋ response
    * records (whole records only; null when no full record fits).
    */
  def encodeWarc(payload: Array[Byte], recordBytes: Int): Array[Byte] = {
    require(recordBytes >= 1, "recordBytes must be positive")
    val nRec = payload.length / recordBytes
    if (nRec < 1) return null
    val out = new java.io.ByteArrayOutputStream(payload.length + nRec * 256)
    var i = 0
    while (i < nRec) {
      out.write(record(i, java.util.Arrays.copyOfRange(
        payload, i * recordBytes, (i + 1) * recordBytes)))
      i += 1
    }
    out.toByteArray
  }

  /** [[encodeWarc]] in the Common Crawl wire shape: each record its own
    * gzip member (CRC32 + ISIZE trailers), members concatenated.
    */
  def encodeWarcGz(payload: Array[Byte], recordBytes: Int): Array[Byte] = {
    require(recordBytes >= 1, "recordBytes must be positive")
    val nRec = payload.length / recordBytes
    if (nRec < 1) return null
    val out = new java.io.ByteArrayOutputStream(payload.length / 2 + nRec * 256)
    var i = 0
    while (i < nRec) {
      val rec = record(i, java.util.Arrays.copyOfRange(
        payload, i * recordBytes, (i + 1) * recordBytes))
      // gzip member: fixed 10-byte header, raw deflate, CRC32 + ISIZE
      out.write(0x1f); out.write(0x8b); out.write(8) // magic + DEFLATE
      out.write(0)                                   // FLG: no extras
      out.write(0); out.write(0); out.write(0); out.write(0) // MTIME 0
      out.write(0)                                   // XFL
      out.write(255)                                 // OS: unknown
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(rec)
      d.finish()
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val k = d.deflate(buf)
        out.write(buf, 0, k)
      }
      d.end()
      val crc = new java.util.zip.CRC32
      crc.update(rec)
      def u32(v: Long): Unit = {
        out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
        out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
      }
      u32(crc.getValue)
      u32(rec.length.toLong & 0xffffffffL)
      i += 1
    }
    out.toByteArray
  }

  /** Per-asset decode result; -1 stats when invalid. */
  final case class Decoded(valid: Boolean, nRecords: Long, nResponses: Long,
      contentBytes: Long, sumPayload: Long)

  private val Invalid = Decoded(valid = false, -1, -1, -1, -1)

  /** Accumulated while walking records. */
  private final class Acc {
    var nRecords = 0L
    var nResponses = 0L
    var contentBytes = 0L
    var sumPayload = 0L
  }

  /** Parse ONE record at `off`; returns the byte position after its
    * terminator, or -1 when malformed.
    */
  private def parseRecord(bytes: Array[Byte], off: Int, end: Int,
      acc: Acc): Int = {
    var p = off
    def line(): String = {
      val s = p
      while (p + 1 < end && !(bytes(p) == '\r' && bytes(p + 1) == '\n')) p += 1
      if (p + 1 >= end) return null
      val out = new String(bytes, s, p - s, "US-ASCII")
      p += 2
      out
    }
    val version = line()
    if (version == null || (version != "WARC/1.0" && version != "WARC/1.1"))
      return -1
    var warcType: String = null
    var recordId: String = null
    var date: String = null
    var contentLen = -1L
    var done = false
    while (!done) {
      val l = line()
      if (l == null) return -1
      if (l.isEmpty) done = true
      else {
        // ISO 28500 grammar: field-name ":" *WS field-value — the space
        // after the colon is OPTIONAL ("Name:value" is conformant), and
        // a field-name is a token (no whitespace inside it)
        val sep = l.indexOf(':')
        if (sep <= 0) return -1
        val name = l.substring(0, sep)
        if (name.exists(c => c == ' ' || c == '\t')) return -1
        val value = l.substring(sep + 1).dropWhile(c => c == ' ' || c == '\t')
        name match {
          // each mandatory header exactly once
          case "WARC-Type" =>
            if (warcType != null) return -1
            warcType = value
          case "WARC-Record-ID" =>
            if (recordId != null) return -1
            if (!(value.startsWith("<") && value.endsWith(">"))) return -1
            recordId = value
          case "WARC-Date" =>
            if (date != null) return -1
            date = value
          case "Content-Length" =>
            if (contentLen >= 0) return -1
            if (value.isEmpty || !value.forall(_.isDigit) ||
              value.length > 12) return -1
            contentLen = value.toLong
          case _ => () // unknown headers are spec-legal, skipped
        }
      }
    }
    if (warcType == null || recordId == null || date == null ||
      contentLen < 0) return -1
    if (p + contentLen + 4 > end) return -1 // block + \r\n\r\n must fit
    var sum = 0L
    var i = p
    val blockEnd = p + contentLen.toInt
    while (i < blockEnd) { sum += bytes(i) & 0xff; i += 1 }
    p = blockEnd
    if (bytes(p) != '\r' || bytes(p + 1) != '\n' ||
      bytes(p + 2) != '\r' || bytes(p + 3) != '\n') return -1
    acc.nRecords += 1
    if (warcType == "response") acc.nResponses += 1
    acc.contentBytes += contentLen
    acc.sumPayload += sum
    p + 4
  }

  /** Plain-shape decode: concatenated records to exact EOF. */
  def decodeWarc(bytes: Array[Byte]): Decoded = {
    val acc = new Acc
    var p = 0
    while (p < bytes.length) {
      p = parseRecord(bytes, p, bytes.length, acc)
      if (p < 0) return Invalid
    }
    if (acc.nRecords < 1) return Invalid
    Decoded(valid = true, acc.nRecords, acc.nResponses, acc.contentBytes,
      acc.sumPayload)
  }

  /** Record-gzip decode: walk gzip members, inflate each with CRC32 +
    * ISIZE verification, require each member to hold exactly one record.
    */
  def decodeWarcGz(bytes: Array[Byte]): Decoded = {
    val n = bytes.length
    val acc = new Acc
    var p = 0
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    while (p < n) {
      if (p + 18 > n) return Invalid // header + trailer minimum
      if ((bytes(p) & 0xff) != 0x1f || (bytes(p + 1) & 0xff) != 0x8b)
        return Invalid
      if ((bytes(p + 2) & 0xff) != 8) return Invalid // DEFLATE only
      if ((bytes(p + 3) & 0xff) != 0) return Invalid // no optional fields
      val dataOff = p + 10
      val inf = new java.util.zip.Inflater(true) // raw deflate
      inf.setInput(bytes, dataOff, n - dataOff)
      val out = new java.io.ByteArrayOutputStream(8192)
      val buf = new Array[Byte](8192)
      // read getRemaining BEFORE end() frees the native state (after
      // end() it reports nothing useful)
      var remaining = -1
      try {
        while (!inf.finished()) {
          val k = inf.inflate(buf)
          if (k == 0 && !inf.finished()) return Invalid // truncated member
          out.write(buf, 0, k)
          // zip-bomb bound, tracked INCREMENTALLY against the bytes this
          // member has actually consumed so far (inf.getBytesRead):
          // DEFLATE's maximum expansion is 1032:1, so output beyond
          // 1032x the consumed input (+64 KiB flush slack) is a forgery
          // regardless of how many bytes the rest of the archive holds
          if (out.size() > inf.getBytesRead * 1032L + 65536L) return Invalid
        }
        remaining = inf.getRemaining
      } catch {
        case _: java.util.zip.DataFormatException => return Invalid
      } finally inf.end()
      val rec = out.toByteArray
      val consumed = (n - dataOff) - remaining
      val trailer = dataOff + consumed
      if (trailer + 8 > n) return Invalid
      val crc = new java.util.zip.CRC32
      crc.update(rec)
      if (u32(trailer) != crc.getValue) return Invalid
      if (u32(trailer + 4) != (rec.length.toLong & 0xffffffffL)) return Invalid
      // exactly one record per member (the splittable-archive contract)
      val after = parseRecord(rec, 0, rec.length, acc)
      if (after != rec.length) return Invalid
      p = trailer + 8
    }
    if (acc.nRecords < 1) return Invalid
    Decoded(valid = true, acc.nRecords, acc.nResponses, acc.contentBytes,
      acc.sumPayload)
  }
}

/** `graft_warc_encode(bytes, recordBytes, gz)`: payload → WARC archive of
  * ⌊len/recordBytes⌋ response records, plain or per-record-gzip'd (null
  * when no full record fits).
  */
case class WarcEncode(child: Expression, recordBytes: Int, gz: Boolean)
    extends UnaryExpression with CodegenFallback {
  require(recordBytes >= 1, "recordBytes must be positive")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_warc_encode expects binary, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    if (gz) WarcCodec.encodeWarcGz(input.asInstanceOf[Array[Byte]], recordBytes)
    else WarcCodec.encodeWarc(input.asInstanceOf[Array[Byte]], recordBytes)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_warc_decode(bytes, gz)`: strict WARC parse (plain or
  * record-gzip) → per-archive stats struct.
  */
case class WarcDecode(child: Expression, gz: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("is_valid", BooleanType, nullable = false),
    StructField("n_records", LongType, nullable = true),
    StructField("n_responses", LongType, nullable = true),
    StructField("content_bytes", LongType, nullable = true),
    StructField("sum_payload", LongType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_warc_decode expects binary, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val d =
      if (gz) WarcCodec.decodeWarcGz(input.asInstanceOf[Array[Byte]])
      else WarcCodec.decodeWarc(input.asInstanceOf[Array[Byte]])
    if (d.valid)
      InternalRow(true, d.nRecords, d.nResponses, d.contentBytes, d.sumPayload)
    else InternalRow(false, null, null, null, null)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WarcNativeFunctions {

  /** Register `graft_warc_encode` / `graft_warc_decode` (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_warc_encode",
      exprs => WarcEncode(exprs.head,
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Boolean]), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_warc_decode",
      exprs => WarcDecode(exprs.head,
        exprs(1).eval().asInstanceOf[Boolean]), "built-in")
  }

  def warcEncode(spark: SparkSession, bytes: Column, recordBytes: Int,
      gz: Boolean): Column = {
    register(spark)
    call_function("graft_warc_encode", bytes,
      org.apache.spark.sql.functions.lit(recordBytes),
      org.apache.spark.sql.functions.lit(gz))
  }

  def warcDecode(spark: SparkSession, bytes: Column, gz: Boolean): Column = {
    register(spark)
    call_function("graft_warc_decode", bytes,
      org.apache.spark.sql.functions.lit(gz))
  }
}
