package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native GIF codec (E245) — the LZW entropy family, in-engine. GIF is
  * the third real entropy coder the engine decodes without a codec
  * library (after DEFLATE-via-JDK in PNG and native Huffman in JPEG):
  * variable-width LZW codes packed LSB-FIRST (opposite bit order to
  * JPEG), a dictionary that grows by one string per code up to 4096
  * entries with CLEAR/EOI control codes and the KwKwK
  * (code == next-free-entry) reconstruction case, all inside GIF's
  * length-prefixed data sub-block framing.
  *
  * Stream shape (the public GIF89a specification):
  * {{{
  * "GIF89a"  logical screen descriptor (w, h, packed, bg, aspect)
  * global color table (256 x RGB)
  * [extension blocks: 0x21 label, length-prefixed sub-blocks]*  (skipped)
  * image descriptor (0x2C, left, top, w, h, packed)
  * LZW minimum code size byte
  * data sub-blocks (each <= 255 bytes, 0x00 terminator)
  * trailer 0x3B
  * }}}
  *
  * ORACLE (the q260 pixel-identity discipline): GIF is lossless on the
  * index stream, so on engine-encoded fixtures decode∘encode is the
  * identity on payload bytes. The fixture palette derives each entry
  * from its index — entry i = (i, (3i+85) mod 256, (7i+21) mod 256) —
  * so the DuckDB oracle computes the exact per-channel sums straight
  * from the raw payload bytes while the engine must LZW-decode the
  * indices AND read the palette back out of the stream it wrote.
  *
  * STRICTNESS: out-of-range codes, a KwKwK code with no prior string, a
  * pixel count that disagrees with the descriptor, missing EOI, data
  * past EOI, unconsumed sub-blocks, a missing trailer, or trailing
  * garbage all report `is_valid = false`. Extension blocks (GCE,
  * comment, application — real files carry them) are skipped as
  * spec-legal, the JUNK/zero-IDAT tolerance precedent. Forged-header
  * allocation bound: pixels are never buffered (running palette sums,
  * O(4096) dictionary state), emission stops the moment it would exceed
  * the declared w·h, and w·h is capped at 2^24 — so a forged 65535 x
  * 65535 descriptor can neither allocate nor spin.
  *
  * Scale: one native-expression pass per asset, O(4096) state — the
  * codec-walk shape of [[QoiExpressions]]/[[JpegDctExpressions]].
  */
object GifCodec {

  /** Fixture palette rule: entry i = (i, (3i+85) & 255, (7i+21) & 255).
    * Index-derived so the SQL oracle can compute channel sums from raw
    * payload bytes; the decoder still READS the table from the stream.
    */
  def paletteR(i: Int): Int = i & 0xff
  def paletteG(i: Int): Int = (3 * i + 85) & 0xff
  def paletteB(i: Int): Int = (7 * i + 21) & 0xff

  /** Declared-geometry cap: decode never buffers pixels, but emission
    * work is proportional to w·h — 16M pixels bounds a forged header's
    * spin without excluding any real fixture.
    */
  val MaxPixels = 1 << 24

  /** Encode payload bytes as the indices of a width-column GIF89a
    * (height = ⌊len/width⌋ whole rows; null when no full row fits or
    * height overflows the u16 field). 256-entry global color table per
    * the fixture palette rule; standard LZW with CLEAR at start and on
    * table-full.
    */
  def encodeGif(payload: Array[Byte], width: Int): Array[Byte] = {
    require(width >= 1 && width <= 65535, "width must fit the u16 field")
    val h = payload.length / width
    if (h < 1 || h > 65535) return null
    val n = width * h
    val out = new java.io.ByteArrayOutputStream(n / 2 + 1024)
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    "GIF89a".foreach(c => out.write(c.toInt))
    u16(width); u16(h)
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    var i = 0
    while (i < 256) {
      out.write(paletteR(i)); out.write(paletteG(i)); out.write(paletteB(i))
      i += 1
    }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(width); u16(h)
    out.write(0x00) // no local color table, not interlaced
    out.write(8)    // LZW minimum code size

    // ---- LZW encode, codes packed LSB-first ----
    val Clear = 256
    val Eoi = 257
    // dictionary: (prefix code, next byte) -> code, open-addressed table
    val dictKey = new Array[Long](1 << 13)
    val dictVal = new Array[Int](1 << 13)
    java.util.Arrays.fill(dictKey, -1L)
    def dictFind(prefix: Int, b: Int): Int = {
      val key = (prefix.toLong << 8) | b
      var slot = ((key * 2654435761L) >>> 40).toInt & ((1 << 13) - 1)
      while (dictKey(slot) != -1L) {
        if (dictKey(slot) == key) return dictVal(slot)
        slot = (slot + 1) & ((1 << 13) - 1)
      }
      -1
    }
    def dictPut(prefix: Int, b: Int, code: Int): Unit = {
      val key = (prefix.toLong << 8) | b
      var slot = ((key * 2654435761L) >>> 40).toInt & ((1 << 13) - 1)
      while (dictKey(slot) != -1L) slot = (slot + 1) & ((1 << 13) - 1)
      dictKey(slot) = key
      dictVal(slot) = code
    }
    val lzw = new java.io.ByteArrayOutputStream(n / 2 + 64)
    var acc = 0L
    var nbits = 0
    var codeWidth = 9
    var nextCode = 258
    def putCode(c: Int): Unit = {
      acc |= c.toLong << nbits
      nbits += codeWidth
      while (nbits >= 8) {
        lzw.write((acc & 0xff).toInt)
        acc >>>= 8
        nbits -= 8
      }
    }
    def resetDict(): Unit = {
      java.util.Arrays.fill(dictKey, -1L)
      nextCode = 258
      codeWidth = 9
    }
    putCode(Clear)
    var cur = payload(0) & 0xff
    i = 1
    while (i < n) {
      val b = payload(i) & 0xff
      val hit = dictFind(cur, b)
      if (hit >= 0) cur = hit
      else {
        putCode(cur)
        dictPut(cur, b, nextCode)
        nextCode += 1
        // GIF code-width rule: width grows when the NEXT code to assign
        // would not fit the current width
        if (nextCode == (1 << codeWidth) + 1 && codeWidth < 12) codeWidth += 1
        if (nextCode == 4096) { putCode(Clear); resetDict() }
        cur = b
      }
      i += 1
    }
    putCode(cur)
    putCode(Eoi)
    if (nbits > 0) lzw.write((acc & 0xff).toInt) // zero-padded final byte
    // chunk into <= 255-byte sub-blocks
    val bytes = lzw.toByteArray
    var off = 0
    while (off < bytes.length) {
      val len = math.min(255, bytes.length - off)
      out.write(len)
      out.write(bytes, off, len)
      off += len
    }
    out.write(0x00) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Per-asset decode result; -1 stats when invalid. */
  final case class Decoded(valid: Boolean, width: Long, height: Long,
      nPixels: Long, sumIdx: Long, sumR: Long, sumG: Long, sumB: Long,
      meanIdxMilli: Long)

  private val Invalid = Decoded(valid = false, -1, -1, -1, -1, -1, -1, -1, -1)

  def decodeGif(bytes: Array[Byte]): Decoded = {
    val n = bytes.length
    if (n < 13) return Invalid
    // header: accept both published versions
    val hdr = new String(bytes, 0, 6, "US-ASCII")
    if (hdr != "GIF89a" && hdr != "GIF87a") return Invalid
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val sw = u16(6)
    val sh = u16(8)
    val packed = bytes(10) & 0xff
    if ((packed & 0x80) == 0) return Invalid // fixtures always carry a GCT
    val gctSize = 2 << (packed & 0x07)
    var p = 13
    if (p + 3 * gctSize > n) return Invalid
    val palR = new Array[Int](gctSize)
    val palG = new Array[Int](gctSize)
    val palB = new Array[Int](gctSize)
    var i = 0
    while (i < gctSize) {
      palR(i) = bytes(p) & 0xff
      palG(i) = bytes(p + 1) & 0xff
      palB(i) = bytes(p + 2) & 0xff
      p += 3
      i += 1
    }

    // skip spec-legal extension blocks (0x21 label, sub-block chain)
    while (p < n && (bytes(p) & 0xff) == 0x21) {
      p += 2 // introducer + label
      var len = if (p < n) bytes(p) & 0xff else -1
      while (len > 0) {
        p += 1 + len
        len = if (p < n) bytes(p) & 0xff else -1
      }
      if (len < 0) return Invalid // truncated extension chain
      p += 1 // the zero terminator
    }

    if (p >= n || (bytes(p) & 0xff) != 0x2c) return Invalid // image descriptor
    if (p + 10 > n) return Invalid
    if (u16(p + 1) != 0 || u16(p + 3) != 0) return Invalid // no offsets
    val w = u16(p + 5)
    val h = u16(p + 7)
    if (w < 1 || h < 1 || w != sw || h != sh) return Invalid
    val nPix = w.toLong * h
    if (nPix > MaxPixels) return Invalid // forged-geometry spin bound
    val ipacked = bytes(p + 9) & 0xff
    if ((ipacked & 0xc0) != 0) return Invalid // no LCT, no interlace
    p += 10
    if (p >= n) return Invalid
    val minCode = bytes(p) & 0xff
    if (minCode != 8) return Invalid // 256-color streams only
    p += 1

    // ---- LZW decode over the sub-block chain, LSB-first ----
    val Clear = 256
    val Eoi = 257
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val firstB = new Array[Int](4096)
    i = 0
    while (i < 256) {
      prefix(i) = -1; suffix(i) = i; firstB(i) = i
      i += 1
    }
    var nextCode = 258
    var codeWidth = 9
    var acc = 0L
    var nbits = 0
    var blockLeft = 0 // bytes remaining in the current sub-block
    var ended = false // saw EOI
    def nextCodeBits(): Int = {
      while (nbits < codeWidth) {
        if (blockLeft == 0) {
          if (p >= n) return -1
          blockLeft = bytes(p) & 0xff
          p += 1
          if (blockLeft == 0) return -1 // terminator before EOI
        }
        if (p >= n) return -1
        acc |= (bytes(p) & 0xffL) << nbits
        nbits += 8
        p += 1
        blockLeft -= 1
      }
      val c = (acc & ((1L << codeWidth) - 1)).toInt
      acc >>>= codeWidth
      nbits -= codeWidth
      c
    }
    var sumIdx = 0L
    var sumR = 0L
    var sumG = 0L
    var sumB = 0L
    var emitted = 0L
    val stack = new Array[Int](4097)
    def emitString(code: Int): Boolean = {
      var top = 0
      var c = code
      while (c >= 0) { stack(top) = suffix(c); top += 1; c = prefix(c) }
      if (emitted + top > nPix) return false // more pixels than declared
      emitted += top
      while (top > 0) {
        top -= 1
        val v = stack(top)
        if (v >= gctSize) return false // index outside the palette
        sumIdx += v
        sumR += palR(v)
        sumG += palG(v)
        sumB += palB(v)
      }
      true
    }
    var prev = -1
    while (!ended) {
      val c = nextCodeBits()
      if (c < 0) return Invalid
      if (c == Clear) {
        nextCode = 258
        codeWidth = 9
        prev = -1
      } else if (c == Eoi) {
        ended = true
      } else if (c < nextCode && c < 4096 && (c < 256 || c >= 258)) {
        if (prev == -1) {
          if (c >= 256) return Invalid // first code must be a root
          if (!emitString(c)) return Invalid
        } else {
          if (!emitString(c)) return Invalid
          if (nextCode < 4096) {
            prefix(nextCode) = prev
            suffix(nextCode) = firstB(c)
            firstB(nextCode) = firstB(prev)
            nextCode += 1
            // DECODER bump rule is one entry EARLIER than the encoder's
            // (nextCode == cap, not cap + 1): the decoder learns each
            // entry one code later than the encoder defined it, so this
            // offset is what keeps the read width aligned with the width
            // the encoder used for the very next code
            if (nextCode == (1 << codeWidth) && codeWidth < 12)
              codeWidth += 1
          }
        }
        prev = c
      } else if (c == nextCode && prev != -1 && nextCode < 4096) {
        // KwKwK: the code being defined right now — string = prev + its
        // own first byte
        prefix(nextCode) = prev
        suffix(nextCode) = firstB(prev)
        firstB(nextCode) = firstB(prev)
        nextCode += 1
        if (!emitString(nextCode - 1)) return Invalid
        if (nextCode == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        prev = nextCode - 1
      } else return Invalid // out-of-range code or KwKwK with no prior
    }
    if (emitted != nPix) return Invalid // every declared pixel decoded
    // pad bits in the final byte are discarded; the sub-block chain must
    // be fully consumed and terminated
    if (blockLeft != 0) return Invalid // unconsumed bytes after EOI
    if (p >= n || (bytes(p) & 0xff) != 0x00) return Invalid // terminator
    p += 1
    if (p >= n || (bytes(p) & 0xff) != 0x3b) return Invalid // trailer
    p += 1
    if (p != n) return Invalid // trailing garbage

    Decoded(valid = true, w, h, nPix, sumIdx, sumR, sumG, sumB,
      sumIdx * 1000 / nPix)
  }
}

/** `graft_gif_encode(bytes, width)`: payload indices → GIF89a stream
  * (null when no full row fits). See [[GifCodec.encodeGif]].
  */
case class GifEncode(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {
  require(width >= 1 && width <= 65535, "width must fit the u16 field")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gif_encode expects binary, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    GifCodec.encodeGif(input.asInstanceOf[Array[Byte]], width)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_gif_decode(bytes)`: strict GIF parse + LZW decode → per-asset
  * stats struct (indices and palette-resolved channel sums). Invalid,
  * truncated, or forged streams report `is_valid = false`.
  */
case class GifDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("is_valid", BooleanType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("n_pixels", LongType, nullable = true),
    StructField("sum_idx", LongType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true),
    StructField("mean_idx_milli", LongType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gif_decode expects binary, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val d = GifCodec.decodeGif(input.asInstanceOf[Array[Byte]])
    if (d.valid)
      InternalRow(true, d.width, d.height, d.nPixels, d.sumIdx, d.sumR,
        d.sumG, d.sumB, d.meanIdxMilli)
    else InternalRow(false, null, null, null, null, null, null, null, null)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GifNativeFunctions {

  /** Register `graft_gif_encode` / `graft_gif_decode` (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_gif_encode",
      exprs => GifEncode(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_gif_decode", exprs => GifDecode(exprs.head), "built-in")
  }

  def gifEncode(spark: SparkSession, bytes: Column, width: Int): Column = {
    register(spark)
    call_function("graft_gif_encode", bytes,
      org.apache.spark.sql.functions.lit(width))
  }

  def gifDecode(spark: SparkSession, bytes: Column): Column = {
    register(spark)
    call_function("graft_gif_decode", bytes)
  }
}
