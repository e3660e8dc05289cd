package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native ZIP archive codec (E270) — the other container data lakes
  * hold in bulk (dataset dumps, document collections, model bundles).
  * The format is the public PKWARE APPNOTE layout:
  *
  * {{{
  * member*: local file header — sig 0x04034b50, version, flags, method
  *          (0 = stored, 8 = deflate), time/date, CRC-32, compressed +
  *          uncompressed sizes, name — then the member data
  * central directory: one 0x02014b50 entry per member REPEATING the
  *          method/CRC/sizes/name plus the member's local-header offset
  * end:     0x06054b50 EOCD — entry counts, directory size + offset
  * }}}
  *
  * The directory is authoritative (readers locate it from the EOCD and
  * walk it), so the STRICTNESS discipline here is AGREEMENT: every
  * central entry must agree with its local header on method, sizes,
  * CRC, and name; the members must tile [0, cdOffset) exactly in
  * directory order (no gaps, no overlaps — a smuggled byte range is a
  * visible finding); each member's inflated output must consume exactly
  * compSize bytes, produce exactly uncompSize, and hash to the declared
  * CRC-32; the EOCD's counts and directory span must match what was
  * walked, with no trailing bytes. Data descriptors (flag bit 3),
  * encryption, zip64, and multi-disk archives reject visibly.
  *
  * ORACLE (two wires, one oracle): fixtures slice the payload into
  * fixed `memberBytes` members, so counts, byte totals, and the
  * member-weighted sum read straight off the truncated raw payload —
  * and the DEFLATE wire must report stats IDENTICAL to the STORED wire.
  *
  * Scale: one native pass per archive, O(member) state — the codec-walk
  * shape; inflation is bounded by the directory's own declared sizes.
  */
object ZipCodec {

  private val LocalSig = 0x04034b50L
  private val CentralSig = 0x02014b50L
  private val EocdSig = 0x06054b50L

  /** Forged-size bound: member sizes beyond this cannot be honest at
    * fixture scale and would overflow downstream Ints.
    */
  private val MaxMember = 1L << 30

  /** Encode the payload as a ZIP of ⌊len/memberBytes⌋ members
    * `doc%05d.txt` (whole members only; null when no full member fits),
    * stored or per-member DEFLATE.
    */
  def encodeZip(payload: Array[Byte], memberBytes: Int,
      deflate: Boolean = false): Array[Byte] = {
    require(memberBytes >= 1, "memberBytes must be positive")
    val nm = payload.length / memberBytes
    if (nm < 1) return null
    val out = new java.io.ByteArrayOutputStream(payload.length + nm * 128)
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
      out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
    }
    val offsets = new Array[Long](nm)
    val crcs = new Array[Long](nm)
    val compSizes = new Array[Int](nm)
    val names = Array.tabulate(nm)(i => f"doc$i%05d.txt".getBytes("US-ASCII"))
    var i = 0
    while (i < nm) {
      val crc = new java.util.zip.CRC32
      crc.update(payload, i * memberBytes, memberBytes)
      crcs(i) = crc.getValue
      val data: Array[Byte] =
        if (!deflate)
          java.util.Arrays.copyOfRange(payload, i * memberBytes,
            (i + 1) * memberBytes)
        else {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(payload, i * memberBytes, memberBytes)
          d.finish()
          val b = new java.io.ByteArrayOutputStream(memberBytes / 2 + 64)
          val buf = new Array[Byte](8192)
          while (!d.finished()) b.write(buf, 0, d.deflate(buf))
          d.end()
          b.toByteArray
        }
      compSizes(i) = data.length
      offsets(i) = out.size().toLong
      u32(LocalSig)
      u16(20)                          // version needed
      u16(0)                           // flags: none (no data descriptor)
      u16(if (deflate) 8 else 0)       // method
      u16(0); u16(0)                   // time / date: deterministic
      u32(crcs(i))
      u32(data.length.toLong)
      u32(memberBytes.toLong)
      u16(names(i).length)
      u16(0)                           // extra length
      out.write(names(i))
      out.write(data)
      i += 1
    }
    val cdOffset = out.size().toLong
    i = 0
    while (i < nm) {
      u32(CentralSig)
      u16(20)                          // version made by
      u16(20)                          // version needed
      u16(0)                           // flags
      u16(if (deflate) 8 else 0)       // method
      u16(0); u16(0)                   // time / date
      u32(crcs(i))
      u32(compSizes(i).toLong)
      u32(memberBytes.toLong)
      u16(names(i).length)
      u16(0)                           // extra
      u16(0)                           // comment
      u16(0)                           // disk number start
      u16(0)                           // internal attrs
      u32(0)                           // external attrs
      u32(offsets(i))
      out.write(names(i))
      i += 1
    }
    val cdSize = out.size().toLong - cdOffset
    u32(EocdSig)
    u16(0); u16(0)                     // disk numbers
    u16(nm); u16(nm)                   // entry counts
    u32(cdSize)
    u32(cdOffset)
    u16(0)                             // comment length
    out.toByteArray
  }

  /** One extracted member (the fan-out row). */
  final case class Member(idx: Long, name: String, size: Long, sumV: Long,
      bytes: Array[Byte])

  /** Per-archive decode result; -1 stats when invalid. */
  final case class Decoded(valid: Boolean, nMembers: Long,
      contentBytes: Long, sumPayload: Long, sumIv: Long)

  private val Invalid = Decoded(valid = false, -1, -1, -1, -1)

  def decodeZip(bytes: Array[Byte],
      collect: Boolean = false): (Decoded, Seq[Member]) = {
    def invalid = (Invalid, Nil)
    val n = bytes.length
    if (n < 22) return invalid
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    // EOCD: comment-free archives end in exactly the 22-byte record
    // (the fixture contract — and a trailing comment would be a place
    // to smuggle bytes, so its absence is audited, not assumed)
    val eocd = n - 22
    if (u32(eocd) != EocdSig) return invalid
    if (u16(eocd + 4) != 0 || u16(eocd + 6) != 0) return invalid // disks
    val nEntries = u16(eocd + 8)
    if (u16(eocd + 10) != nEntries) return invalid
    val cdSize = u32(eocd + 12)
    val cdOffset = u32(eocd + 16)
    if (u16(eocd + 20) != 0) return invalid // comment length
    if (nEntries < 1 || nEntries > (1 << 16) - 1) return invalid
    if (cdOffset + cdSize != eocd) return invalid // directory tiles to EOCD

    val out = if (collect)
      scala.collection.mutable.ArrayBuffer.empty[Member] else null
    var nMembers = 0L
    var contentBytes = 0L
    var sumPayload = 0L
    var sumIv = 0L
    var expectedLocal = 0L // members must tile [0, cdOffset) in order
    var p = cdOffset.toInt
    var e = 0
    while (e < nEntries) {
      if (p + 46 > eocd) return invalid
      if (u32(p) != CentralSig) return invalid
      if (u16(p + 8) != 0) return invalid // flags: no descriptors/crypto
      val method = u16(p + 10)
      if (method != 0 && method != 8) return invalid
      val crcDecl = u32(p + 16)
      val compSize = u32(p + 20)
      val uncompSize = u32(p + 24)
      if (compSize > MaxMember || uncompSize > MaxMember) return invalid
      if (method == 0 && compSize != uncompSize) return invalid
      val nameLen = u16(p + 28)
      if (nameLen < 1 || nameLen > 512) return invalid
      if (u16(p + 30) != 0 || u16(p + 32) != 0) return invalid // extra/cmt
      if (u16(p + 34) != 0) return invalid // disk start
      val localOff = u32(p + 42)
      if (p + 46 + nameLen > eocd) return invalid
      val name = new String(bytes, p + 46, nameLen, "US-ASCII")

      // ---- the member's local header must AGREE with the directory ----
      if (localOff != expectedLocal) return invalid // gap/overlap/reorder
      val lp = localOff.toInt
      if (lp + 30 > cdOffset) return invalid
      if (u32(lp) != LocalSig) return invalid
      if (u16(lp + 6) != 0) return invalid // flags
      if (u16(lp + 8) != method) return invalid
      if (u32(lp + 14) != crcDecl) return invalid
      if (u32(lp + 18) != compSize) return invalid
      if (u32(lp + 22) != uncompSize) return invalid
      val lNameLen = u16(lp + 26)
      if (lNameLen != nameLen || u16(lp + 28) != 0) return invalid
      val dataOff = lp + 30 + nameLen
      if (dataOff + compSize > cdOffset) return invalid
      if (new String(bytes, lp + 30, nameLen, "US-ASCII") != name)
        return invalid

      // ---- decompress + verify the declared CRC-32 and sizes ----
      val raw: Array[Byte] =
        if (method == 0)
          java.util.Arrays.copyOfRange(bytes, dataOff,
            dataOff + compSize.toInt)
        else {
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(bytes, dataOff, compSize.toInt)
          val b = new java.io.ByteArrayOutputStream(
            math.max(16, uncompSize.toInt))
          val buf = new Array[Byte](8192)
          try {
            while (!inf.finished()) {
              val k = inf.inflate(buf)
              if (k == 0 && !inf.finished()) return invalid // truncated
              b.write(buf, 0, k)
              if (b.size() > uncompSize) return invalid // overfill
            }
            // the stream must consume EXACTLY the declared bytes
            if (inf.getRemaining != 0) return invalid
          } catch {
            case _: java.util.zip.DataFormatException => return invalid
          } finally inf.end()
          b.toByteArray
        }
      if (raw.length.toLong != uncompSize) return invalid
      val crc = new java.util.zip.CRC32
      crc.update(raw)
      if (crc.getValue != crcDecl) return invalid

      var s = 0L
      var i = 0
      while (i < raw.length) { s += raw(i) & 0xff; i += 1 }
      sumPayload += s
      sumIv += nMembers * s
      contentBytes += uncompSize
      if (out != null) out += Member(nMembers, name, uncompSize, s, raw)
      nMembers += 1
      expectedLocal = dataOff + compSize
      p += 46 + nameLen
      e += 1
    }
    if (p != eocd) return invalid // directory size must match its span
    if (expectedLocal != cdOffset) return invalid // members tile exactly
    (Decoded(valid = true, nMembers, contentBytes, sumPayload, sumIv),
      if (out == null) Nil else out.toSeq)
  }
}

/** `graft_zip_encode(bytes, memberBytes, deflate)`: payload → ZIP of
  * ⌊len/memberBytes⌋ members, stored or per-member DEFLATE (null when
  * no full member fits).
  */
case class ZipEncode(child: Expression, memberBytes: Int, deflate: Boolean)
    extends UnaryExpression with CodegenFallback {
  require(memberBytes >= 1, "memberBytes must be positive")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zip_encode expects binary, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    ZipCodec.encodeZip(input.asInstanceOf[Array[Byte]], memberBytes, deflate)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_zip_decode(bytes)`: strict central-directory walk (local-header
  * agreement, exact tiling, per-member CRC-32) → per-archive stats.
  */
case class ZipDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("is_valid", BooleanType, nullable = false),
    StructField("n_members", LongType, nullable = true),
    StructField("content_bytes", LongType, nullable = true),
    StructField("sum_payload", LongType, nullable = true),
    StructField("sum_iv", LongType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zip_decode expects binary, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val (d, _) = ZipCodec.decodeZip(input.asInstanceOf[Array[Byte]])
    if (d.valid)
      InternalRow(true, d.nMembers, d.contentBytes, d.sumPayload, d.sumIv)
    else InternalRow(false, null, null, null, null)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ZipNativeFunctions {

  /** Register the zip codec functions (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_zip_encode",
      exprs => ZipEncode(exprs.head,
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Boolean]), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_zip_decode", exprs => ZipDecode(exprs.head), "built-in")
  }

  def zipEncode(spark: SparkSession, bytes: Column, memberBytes: Int,
      deflate: Boolean): Column = {
    register(spark)
    call_function("graft_zip_encode", bytes,
      org.apache.spark.sql.functions.lit(memberBytes),
      org.apache.spark.sql.functions.lit(deflate))
  }

  def zipDecode(spark: SparkSession, bytes: Column): Column = {
    register(spark)
    call_function("graft_zip_decode", bytes)
  }
}
