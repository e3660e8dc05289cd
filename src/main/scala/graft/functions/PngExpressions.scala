package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native PNG codec — the first ENTROPY-CODED image format this engine
  * decodes fully in-engine, and the final narrowing of the Multimodal
  * codec stub: PNG's entropy layer is DEFLATE, and
  * `java.util.zip.Inflater`/`Deflater` ship in the JDK (stdlib, not a
  * codec library). Everything else is plain byte arithmetic in the
  * QoiExpressions mold: chunk walking (length/type/CRC framing), IHDR
  * validation, IDAT concatenation + inflate, and the per-row unfilter
  * pass (None/Sub/Up/Average/Paeth, per the public PNG specification,
  * RFC 2083 / ISO 15948).
  *
  * Scale: one native-expression pass per asset — the inflate streams
  * through a bounded buffer sized from the VERIFIED geometry, the
  * unfilter walks rows with O(stride) state, and per-asset aggregates
  * (channel sums, luma) accumulate in O(1); nothing per-pixel ever
  * materializes and nothing leaves the scan stage but the stats row.
  *
  * Forged-header-proof: the inflate output buffer is allocated ONLY
  * after checking the claimed raw size against DEFLATE's maximum
  * expansion of the bytes actually present (1032:1), so a 2^32-pixel
  * IHDR on a 100-byte asset reports is_valid = false without allocating
  * or looping; chunk CRCs are verified, so the decode never walks
  * corrupted framing.
  */
object PngCodec {

  private val Signature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  @inline private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def crc32(bytes: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32
    c.update(bytes, off, len)
    c.getValue
  }

  /** Encode `h = len/(3*width)` rows of raw RGB triplets (the first
    * `3*width*h` payload bytes) as an 8-bit color-type-2 PNG. Row filter
    * types CYCLE `y mod 5` (None, Sub, Up, Average, Paeth) so a decode of
    * any fixture with ≥5 rows exercises every unfilter path — the same
    * self-verifying-oracle discipline as the QOI encoder's greedy op mix.
    * Returns null when the payload is shorter than one row.
    */
  def encode(payload: Array[Byte], width: Int): Array[Byte] = {
    val h = payload.length / (3 * width)
    if (h < 1) return null
    val stride = 3 * width
    // filtered scanlines: 1 filter byte + stride filtered bytes per row
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      val ft = y % 5
      raw(y * (1 + stride)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = payload(y * stride + x) & 0xff
        val a = if (x >= 3) payload(y * stride + x - 3) & 0xff else 0
        val b = if (y >= 1) payload((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= 3 && y >= 1) payload((y - 1) * stride + x - 3) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        raw(y * (1 + stride) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val zout = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      zout.write(buf, 0, n)
    }
    deflater.end()
    val idat = zout.toByteArray

    val out = new java.io.ByteArrayOutputStream(idat.length + 64)
    out.write(Signature, 0, 8)
    def be32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val t = typ.getBytes("US-ASCII")
      val body = t ++ data
      out.write(be32(data.length.toLong), 0, 4)
      out.write(body, 0, body.length)
      out.write(be32(crc32(body, 0, body.length)), 0, 4)
    }
    chunk("IHDR", be32(width.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, 2, 0, 0, 0)) // depth 8, RGB, deflate, adaptive, none
    chunk("IDAT", idat)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** Decoded per-asset report (O(1) aggregation memory — a 100-megapixel
    * asset never materializes its pixels). Negative fields when invalid.
    */
  final case class Decoded(
      valid: Boolean, width: Long, height: Long, nPixels: Long,
      sumR: Long, sumG: Long, sumB: Long, meanLumaMilli: Long,
      colorType: Long, nIdatChunks: Long, idatBytes: Long)

  private val Invalid = Decoded(valid = false, -1, -1, -1, -1, -1, -1, -1,
    -1, -1, -1)

  def decode(bytes: Array[Byte]): Decoded = {
    val n = bytes.length
    if (n < 8 + 12 + 13 + 12 + 12) return Invalid // sig + IHDR + IDAT + IEND
    var k = 0
    while (k < 8) { if (bytes(k) != Signature(k)) return Invalid; k += 1 }
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)

    // ---- chunk walk: CRC-verified framing; IHDR first, IEND last ----
    var p = 8
    var w = -1L; var h = -1L; var colorType = -1L
    var idatLen = 0L; var nIdat = 0L; var seenIend = false
    var sawIhdr = false; var idatDone = false
    val idatParts = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    while (p < n && !seenIend) {
      if (p + 12 > n) return Invalid
      val len = be32(p)
      if (len > n - p - 12) return Invalid
      val l = len.toInt
      val typ = new String(bytes, p + 4, 4, "US-ASCII")
      if (crc32(bytes, p + 4, 4 + l) != be32(p + 8 + l)) return Invalid
      if (!sawIhdr) {
        if (typ != "IHDR" || l != 13) return Invalid
        sawIhdr = true
        w = be32(p + 8); h = be32(p + 12)
        val depth = bytes(p + 16) & 0xff
        colorType = (bytes(p + 17) & 0xffL)
        val comp = bytes(p + 18) & 0xff
        val filt = bytes(p + 19) & 0xff
        val ilace = bytes(p + 20) & 0xff
        // 8-bit truecolor only (RGB / RGBA), deflate, adaptive filters,
        // no interlace — palette/gray/16-bit/Adam7 report is_valid=false
        // (visible, never misdecoded)
        if (w < 1 || h < 1 || depth != 8 ||
            (colorType != 2L && colorType != 6L) ||
            comp != 0 || filt != 0 || ilace != 0) return Invalid
      } else typ match {
        case "IDAT" =>
          if (idatDone) return Invalid // IDAT chunks must be consecutive
          idatParts += ((p + 8, l))
          idatLen += l; nIdat += 1
        case "IEND" =>
          if (l != 0 || nIdat < 1) return Invalid
          seenIend = true
        case _ =>
          if (nIdat > 0) idatDone = true
          // ancillary chunks (bit 5 of the first type byte set) and a
          // suggested-palette PLTE are skipped; any OTHER critical chunk
          // would change pixel meaning we don't implement — reject
          if ((bytes(p + 4) & 0x20) == 0 && typ != "PLTE") return Invalid
      }
      p += 12 + l
    }
    if (!seenIend || p != n) return Invalid // trailing garbage is invalid

    // ---- inflate, bounded by what DEFLATE could possibly expand to ----
    val bpp = if (colorType == 2L) 3L else 4L
    val stride = 1L + bpp * w
    val budget = idatLen * 1032L + 64L // DEFLATE max expansion of real bytes
    if (h > budget / stride) return Invalid // forged IHDR: don't allocate
    val rawLen = h * stride
    if (rawLen > Int.MaxValue - 8) return Invalid
    // one spare byte beyond the claimed size: the final inflate call needs
    // output space to consume the stream trailer (zlib makes no progress
    // with avail_out = 0), and any byte actually landing in the spare
    // proves the stream produced MORE than the IHDR claimed -> invalid
    val raw = new Array[Byte](rawLen.toInt + 1)
    val inf = new java.util.zip.Inflater()
    var got = 0
    var part = 0
    try {
      // feed IDAT parts on demand: output can complete in an early part
      // while the deflate end-of-block + adler32 trailer sits in LATER
      // parts (chunk boundaries are arbitrary per the PNG spec), so input
      // must advance whenever the inflater asks, not per-part
      var ok = true
      while (ok && !inf.finished()) {
        if (inf.needsInput()) {
          if (part >= idatParts.length) ok = false // stream ran dry
          else {
            val (off, l) = idatParts(part)
            inf.setInput(bytes, off, l)
            part += 1
          }
        }
        if (ok) {
          if (got >= raw.length) ok = false // more output than claimed
          else {
            val made = inf.inflate(raw, got, raw.length - got)
            got += made
            // no output, no input hunger, not finished: stuck (e.g. a
            // preset-dictionary stream) — reject rather than spin
            if (made == 0 && !inf.needsInput() && !inf.finished()) ok = false
          }
        }
      }
      if (!ok || !inf.finished() || got != rawLen) return Invalid
      // every IDAT byte must have been consumed: once the zlib trailer
      // completes, leftover bytes in the current part (getRemaining) or
      // unconsumed NON-EMPTY later parts are appended garbage INSIDE the
      // IDAT framing — invalid, same stance as post-IEND trailing bytes.
      // Trailing ZERO-length IDAT chunks carry no bytes and are legal
      // anywhere in the chain per the PNG spec (real encoders emit them),
      // so they are not garbage.
      if (inf.getRemaining > 0) return Invalid
      while (part < idatParts.length) {
        if (idatParts(part)._2 != 0) return Invalid
        part += 1
      }
    } catch {
      case _: java.util.zip.DataFormatException => return Invalid
    } finally inf.end()

    // ---- unfilter + aggregate in one pass (previous row kept, O(stride)) --
    val sb = (bpp * w).toInt // scanline bytes after the filter byte
    val prev = new Array[Int](sb)
    val cur = new Array[Int](sb)
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var lum = 0L
    val bppI = bpp.toInt
    var y = 0L
    while (y < h) {
      val base = (y * stride).toInt
      val ft = raw(base) & 0xff
      if (ft > 4) return Invalid
      var x = 0
      while (x < sb) {
        val f = raw(base + 1 + x) & 0xff
        val a = if (x >= bppI) cur(x - bppI) else 0
        val b = prev(x)
        val c = if (x >= bppI) prev(x - bppI) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ => paeth(a, b, c)
        }
        cur(x) = (f + pred) & 0xff
        x += 1
      }
      var px = 0
      while (px < w) {
        val r = cur(px * bppI); val g = cur(px * bppI + 1)
        val bl = cur(px * bppI + 2)
        sumR += r; sumG += g; sumB += bl
        lum += 299L * r + 587L * g + 114L * bl
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, sb)
      y += 1
    }
    val npx = w * h
    Decoded(valid = true, w, h, npx, sumR, sumG, sumB, lum / npx,
      colorType, nIdat, idatLen)
  }
}

/** `graft_png_encode(bytes, width)`: payload RGB triplets → PNG stream
  * (null when shorter than one pixel row). Width is a literal.
  */
case class PngEncode(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {
  require(width >= 1, "width must be positive")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_png_encode expects binary, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    PngCodec.encode(input.asInstanceOf[Array[Byte]], width)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_png_decode(bytes)`: full chunk-walk + inflate + unfilter decode
  * → per-asset stats struct. Invalid/corrupt/forged streams report
  * `is_valid = false` with null stats — a visible finding, never a
  * dropped row, an allocation blow-up, or a wrong number.
  */
case class PngDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("is_valid", BooleanType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("n_pixels", LongType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true),
    StructField("mean_luma_milli", LongType, nullable = true),
    StructField("color_type", LongType, nullable = true),
    StructField("n_idat_chunks", LongType, nullable = true),
    StructField("idat_bytes", LongType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_png_decode expects binary, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val d = PngCodec.decode(input.asInstanceOf[Array[Byte]])
    if (d.valid)
      InternalRow(true, d.width, d.height, d.nPixels, d.sumR, d.sumG,
        d.sumB, d.meanLumaMilli, d.colorType, d.nIdatChunks, d.idatBytes)
    else
      InternalRow(false, null, null, null, null, null, null, null,
        null, null, null)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PngNativeFunctions {

  /** Register `graft_png_encode` / `graft_png_decode` (idempotent),
    * mirroring QoiNativeFunctions.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_png_encode",
      exprs => PngEncode(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_png_decode", exprs => PngDecode(exprs.head), "built-in")
  }

  def pngEncode(spark: SparkSession, bytes: Column, width: Int): Column = {
    register(spark)
    call_function("graft_png_encode", bytes,
      org.apache.spark.sql.functions.lit(width))
  }

  def pngDecode(spark: SparkSession, bytes: Column): Column = {
    register(spark)
    call_function("graft_png_decode", bytes)
  }
}
