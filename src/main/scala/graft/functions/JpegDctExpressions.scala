package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native BASELINE (lossy, DCT) JPEG codec — ITU-T T.81 sequential DCT,
  * SOF0 — for single-component (grayscale) 8-bit frames: the full marker
  * walk (DQT in zigzag order, DHT for DC and AC classes, SOF0, SOS), the
  * byte-stuffed entropy decode with DC prediction + run/size AC coding
  * (EOB/ZRL), dequantization, and the inverse DCT. This closes the last
  * corpus-reality image-codec gap: real image lakes are overwhelmingly
  * lossy JPEG, and the [[graft.ext.Multimodal]] stub now fences only
  * H.264.
  *
  * THE ORACLE TRICK — why a lossy codec can still have an exact SQL
  * oracle: Huffman coding is bijective on the quantized-coefficient
  * stream, so on engine-encoded fixtures
  * `decode ∘ encode = IDCT ∘ dequantize ∘ quantize ∘ FDCT`, and that
  * right-hand side is DETERMINISTIC INTEGER ARITHMETIC when the DCT runs
  * in fixed point: this codec's 1-D basis is the orthonormal DCT-II
  * matrix scaled by 2^20 and rounded ONCE into 64 integer constants
  * ([[JpegDctCodec.IT]]), all sums/products stay in exact 64-bit range,
  * and every rounding is a floor-based half-up division both engines
  * replay identically (the NOTES floor-div discipline). DuckDB replays
  * the whole pipeline per 8x8 block straight from the raw payload bytes
  * — the oracle never runs the codec (the q260/q268 rule, one level
  * deeper).
  *
  * Bounds (why nothing overflows a Long): |IT| ≤ 2^19; samples are
  * level-shifted to [-128, 127], so |t1| ≤ 8·128·2^19 = 2^29 and
  * |t2| ≤ 2^51; quantized coefficients decode with size ≤ 10 so
  * |dequantized| ≤ 1023·255 < 2^18, |p1| ≤ 8·2^19·2^18 = 2^40 and
  * |p2| ≤ 8·2^40·2^19 < 2^62.2 — `p2 + 2^39` stays under 2^63.
  *
  * Scale: one native-expression pass per asset, O(64) block state plus
  * running sums — the [[QoiExpressions]]/[[PngExpressions]] shape.
  * Forged-SOF0-proof: every block consumes at least the DC code (≥ 2
  * bits) and the EOB (4 bits) of REAL input, so a forged 2^32-pixel
  * header over a tiny stream exhausts its bits and reports
  * `is_valid = false` without looping or allocating (block buffers are
  * fixed 64-entry arrays).
  */
object JpegDctCodec {

  /** Fixed-point bits of the DCT basis. */
  val Fix = 20
  private val Den = 1L << 40      // the two cascaded 2^20 scales
  private val HalfDen = 1L << 39

  /** Orthonormal 1-D DCT-II basis, fixed point: IT(u)(x) =
    * round(c(u)·cos((2x+1)uπ/16)·2^20) with c(0) = √(1/8), c(u>0) = 1/2.
    * Rounded ONCE here; the oracle SQL embeds these exact integers via
    * [[basisSqlRows]] — one source of truth, so engine and oracle can
    * never disagree on the basis.
    */
  val IT: Array[Array[Long]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) math.sqrt(0.125) else 0.5
    Math.round(c * math.cos((2 * x + 1) * u * math.Pi / 16) * (1L << Fix))
  }

  /** The public Annex-K luminance quantization table, natural (row-major,
    * row = vertical frequency v) order.
    */
  val Quant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Zigzag scan order: position k in the scan → natural index v·8+u. */
  val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** `(u, x, c)` VALUES rows of the fixed-point basis for the oracle SQL. */
  def basisSqlRows: String =
    (for (u <- 0 until 8; x <- 0 until 8)
      yield s"($u, $x, ${IT(u)(x)})").mkString(", ")

  /** `(u, v, q)` VALUES rows of the quant table for the oracle SQL. */
  def quantSqlRows: String =
    (for (v <- 0 until 8; u <- 0 until 8)
      yield s"($u, $v, ${Quant(v * 8 + u)})").mkString(", ")

  // standard DC luminance table (Annex K.3.1.1) — shared shape with the
  // lossless codec, restated here so this file is self-contained
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  // standard AC luminance table (Annex K.3.2): counts per code length,
  // then the 162 run/size symbols in code order
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical (code, length) per symbol from a BITS array. */
  private def canonical(bits: Array[Int], nVals: Int): (Array[Int], Array[Int]) = {
    val codes = new Array[Int](nVals)
    val lens = new Array[Int](nVals)
    var code = 0; var k = 0; var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        codes(k) = code; lens(k) = len; code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    (codes, lens)
  }

  /** floor-based half-up division, positive even denominator: the ONE
    * rounding rule of the whole pipeline, replayed in DuckDB as
    * `(a + den/2 - nonNegMod(a + den/2, den)) // den`.
    */
  @inline private def roundDiv(a: Long, den: Long): Long =
    Math.floorDiv(a + (den >> 1), den)

  /** The forward half of the pipeline for one 8x8 block: level shift,
    * fixed-point FDCT, quantization. `s` is 64 samples in natural order;
    * returns quantized coefficients in natural order. Shared by the
    * encoder and the spec's independent replay.
    */
  def forwardQuantize(s: Array[Int]): Array[Long] = {
    val t1 = new Array[Long](64) // t1(u, y) at u*8 + y
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var acc = 0L
        var x = 0
        while (x < 8) { acc += (s(y * 8 + x) - 128) * IT(u)(x); x += 1 }
        t1(u * 8 + y) = acc
        y += 1
      }
      u += 1
    }
    val qc = new Array[Long](64)
    var v = 0
    while (v < 8) {
      u = 0
      while (u < 8) {
        var acc = 0L
        var y = 0
        while (y < 8) { acc += t1(u * 8 + y) * IT(v)(y); y += 1 }
        val q = Quant(v * 8 + u).toLong
        qc(v * 8 + u) = roundDiv(acc, q * Den)
        u += 1
      }
      v += 1
    }
    qc
  }

  /** The inverse half for one block against the Annex-K table (the
    * encoder/spec replay path): dequantize, fixed-point IDCT, level
    * shift, clamp. `qc` natural order; returns 64 samples 0..255.
    */
  def dequantizeInverse(qc: Array[Long]): Array[Int] =
    dequantizeInverseWith(qc, Quant)

  /** Encode `h = 8·(len/(8·width))` rows of 8-bit grayscale samples (the
    * whole-BLOCK-ROW prefix of the payload) as a baseline SOF0 JPEG with
    * the Annex-K luminance quant + Huffman tables. Height is truncated to
    * a multiple of 8 so no partial (edge-padded) blocks exist — the
    * encoder chooses how much payload to consume, like encodeBmp's
    * whole-row rule, which keeps the SQL oracle free of padding
    * semantics. Returns null when no full block row fits or the height
    * would overflow the u16 SOF field.
    */
  def encode(payload: Array[Byte], width: Int): Array[Byte] = {
    require(width >= 8 && width % 8 == 0 && width <= 65528,
      "width must be a positive multiple of 8 fitting the u16 SOF field")
    val blockRows = payload.length / (width * 8)
    val h = blockRows * 8
    if (h < 8 || h > 65535) return null
    val out = new java.io.ByteArrayOutputStream(payload.length / 2 + 256)
    def u16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xdb) // DQT, 8-bit precision, id 0, zigzag order per spec
    u16(2 + 1 + 64)
    out.write(0x00)
    var k = 0
    while (k < 64) { out.write(Quant(ZigZag(k))); k += 1 }
    marker(0xc4) // DHT: DC class 0 id 0, then AC class 1 id 0
    u16(2 + (1 + 16 + DcVals.length) + (1 + 16 + AcVals.length))
    out.write(0x00); DcBits.foreach(out.write); DcVals.foreach(out.write)
    out.write(0x10); AcBits.foreach(out.write); AcVals.foreach(out.write)
    marker(0xc0) // SOF0: baseline sequential DCT
    u16(8 + 3)
    out.write(8) // precision
    u16(h); u16(width)
    out.write(1) // one component
    out.write(1); out.write(0x11); out.write(0) // id 1, H=V=1, Tq 0
    marker(0xda) // SOS
    u16(6 + 2)
    out.write(1)
    out.write(1); out.write(0x00) // component 1, DC table 0, AC table 0
    out.write(0)  // Ss = 0
    out.write(63) // Se = 63
    out.write(0)  // Ah/Al = 0

    val (dcCodes, dcLens) = canonical(DcBits, DcVals.length)
    val (acCodes, acLens) = canonical(AcBits, AcVals.length)
    // symbol -> code index maps (vals are in code order)
    val acIdx = new Array[Int](256); java.util.Arrays.fill(acIdx, -1)
    var i = 0
    while (i < AcVals.length) { acIdx(AcVals(i)) = i; i += 1 }

    var acc = 0L
    var nbits = 0
    def putBits(v: Int, n: Int): Unit = {
      acc = (acc << n) | (v & ((1L << n) - 1))
      nbits += n
      while (nbits >= 8) {
        val b = ((acc >>> (nbits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nbits -= 8
      }
    }
    def cat(d: Long): Int = {
      var s = 0
      val m = math.abs(d)
      while ((1L << s) <= m) s += 1
      s
    }
    def putCoef(d: Long, s: Int): Unit = {
      if (s > 0) {
        val add = if (d >= 0) d else d - 1 // one's-complement negatives
        putBits((add & ((1L << s) - 1)).toInt, s)
      }
    }

    val blocksPerRow = width / 8
    val s = new Array[Int](64)
    var predDc = 0L
    var by = 0
    while (by < blockRows) {
      var bx = 0
      while (bx < blocksPerRow) {
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            s(yy * 8 + xx) =
              payload((by * 8 + yy) * width + bx * 8 + xx) & 0xff
            xx += 1
          }
          yy += 1
        }
        val qc = forwardQuantize(s)
        // DC: category-coded difference from the previous block's DC
        val diff = qc(0) - predDc
        predDc = qc(0)
        val ds = cat(diff)
        putBits(dcCodes(ds), dcLens(ds))
        putCoef(diff, ds)
        // AC: run/size symbols over the zigzag scan, ZRL for 16-zero
        // runs, EOB when the tail is all zero
        var kk = 1
        var run = 0
        while (kk < 64) {
          val c = qc(ZigZag(kk))
          if (c == 0L) run += 1
          else {
            while (run > 15) { putBits(acCodes(acIdx(0xf0)), acLens(acIdx(0xf0))); run -= 16 }
            val sz = cat(c)
            val sym = (run << 4) | sz
            putBits(acCodes(acIdx(sym)), acLens(acIdx(sym)))
            putCoef(c, sz)
            run = 0
          }
          kk += 1
        }
        if (run > 0) putBits(acCodes(acIdx(0x00)), acLens(acIdx(0x00))) // EOB
        bx += 1
      }
      by += 1
    }
    if (nbits > 0) putBits((1 << (8 - nbits)) - 1, 8 - nbits) // pad with 1s
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Decoded per-asset report. Negative fields when invalid. */
  final case class Decoded(valid: Boolean, width: Long, height: Long,
      nPixels: Long, sumV: Long, meanVMilli: Long, nBlocks: Long)

  private val Invalid = Decoded(valid = false, -1, -1, -1, -1, -1, -1)

  /** One parsed Huffman table: canonical mincode/maxcode/valptr + values. */
  private final class Huff {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    var vals: Array[Int] = null
  }

  def decode(bytes: Array[Byte]): Decoded = {
    val n = bytes.length
    if (n < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return Invalid
    var p = 2
    def u16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)

    // ---- marker-segment walk up to SOS ----
    var w = -1; var h = -1
    var qTq = -1 // the frame component's quant-table id
    var dcId = -1; var acId = -1
    val quants = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var sawSof = false; var sawSos = false
    while (!sawSos) {
      if (p + 4 > n) return Invalid
      if ((bytes(p) & 0xff) != 0xff) return Invalid
      val m = bytes(p + 1) & 0xff
      val segLen = u16(p + 2)
      if (segLen < 2 || p + 2 + segLen > n) return Invalid
      val body = p + 4
      val end = p + 2 + segLen
      m match {
        case 0xdb => // DQT — possibly several tables; 8-bit precision only
          var q = body
          while (q < end) {
            val pqtq = bytes(q) & 0xff
            val pq = pqtq >> 4; val tq = pqtq & 0x0f
            if (pq != 0 || tq > 3 || q + 65 > end) return Invalid
            val tab = new Array[Int](64)
            var k = 0
            while (k < 64) {
              val value = bytes(q + 1 + k) & 0xff
              if (value < 1) return Invalid // zero divisor is corrupt
              tab(ZigZag(k)) = value // stream is zigzag; store natural
              k += 1
            }
            quants(tq) = tab
            q += 65
          }
          if (p + 2 + segLen != end) return Invalid
        case 0xc4 => // DHT — several tables per segment, DC and AC classes
          var q = body
          while (q < end) {
            if (q + 17 > end) return Invalid
            val tcth = bytes(q) & 0xff
            val tc = tcth >> 4; val th = tcth & 0x0f
            if (tc > 1 || th > 3) return Invalid
            val counts = Array.tabulate(16)(i => bytes(q + 1 + i) & 0xff)
            val total = counts.sum
            if (q + 17 + total > end || total > 256) return Invalid
            val t = new Huff
            t.vals = Array.tabulate(total)(i => bytes(q + 17 + i) & 0xff)
            var code = 0; var k = 0; var len = 1
            while (len <= 16) {
              if (counts(len - 1) > 0) {
                t.valPtr(len) = k
                t.minCode(len) = code
                code += counts(len - 1); k += counts(len - 1)
                t.maxCode(len) = code - 1
              } else t.maxCode(len) = -1
              code <<= 1
              len += 1
            }
            len = 1
            while (len <= 16) { // canonical sanity: codes fit their length
              if (t.maxCode(len) >= (1 << len)) return Invalid
              len += 1
            }
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            q += 17 + total
          }
        case 0xc0 => // SOF0: baseline sequential DCT
          if (sawSof || segLen < 11) return Invalid
          sawSof = true
          val precision = bytes(body) & 0xff
          h = u16(body + 1); w = u16(body + 3)
          val nf = bytes(body + 5) & 0xff
          // 8-bit single-component, no subsampling — anything else is
          // a visible finding, never a misdecode
          if (precision != 8 || nf != 1 || w < 1 || h < 1) return Invalid
          if ((bytes(body + 7) & 0xff) != 0x11) return Invalid
          qTq = bytes(body + 8) & 0xff
          if (qTq > 3) return Invalid
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          return Invalid // progressive/lossless/arithmetic/hierarchical
        case 0xda => // SOS
          if (!sawSof || segLen < 8) return Invalid
          val ns = bytes(body) & 0xff
          if (ns != 1) return Invalid
          val tdta = bytes(body + 2) & 0xff
          dcId = tdta >> 4; acId = tdta & 0x0f
          if (dcId > 3 || acId > 3 ||
              dcTabs(dcId) == null || acTabs(acId) == null ||
              quants(qTq) == null) return Invalid
          // baseline scan: full spectral band, no successive approximation
          if ((bytes(body + 3) & 0xff) != 0 || (bytes(body + 4) & 0xff) != 63 ||
              (bytes(body + 5) & 0xff) != 0) return Invalid
          sawSos = true
        case mm if mm >= 0xe0 && mm <= 0xef => () // APPn: skipped
        case 0xfe => () // COM: skipped
        case _ => return Invalid // anything else changes pixel meaning
      }
      p += 2 + segLen
    }

    val quant = quants(qTq)
    val dcT = dcTabs(dcId); val acT = acTabs(acId)

    // ---- entropy-coded data: byte-unstuffed MSB-first bit reader ----
    var pos = p
    var bitBuf = 0
    var bitCnt = 0
    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (pos >= n) return -1
        val b = bytes(pos) & 0xff
        if (b == 0xff) {
          if (pos + 1 >= n || (bytes(pos + 1) & 0xff) != 0x00) return -1
          pos += 2
        } else pos += 1
        bitBuf = b
        bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >>> bitCnt) & 1
    }
    def decodeHuff(t: Huff): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        val bit = nextBit()
        if (bit < 0) return -1
        code = (code << 1) | bit
        len += 1
        if (t.maxCode(len) >= 0 && code >= t.minCode(len) &&
            code <= t.maxCode(len))
          return t.vals(t.valPtr(len) + code - t.minCode(len))
      }
      -1
    }
    def receiveExtend(s: Int): Long = {
      var bits = 0
      var i = 0
      while (i < s) {
        val b = nextBit()
        if (b < 0) return Long.MinValue // sentinel: ran dry
        bits = (bits << 1) | b
        i += 1
      }
      if (bits < (1 << (s - 1))) (bits - (1 << s) + 1).toLong else bits.toLong
    }

    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    val nBlocks = bw.toLong * bh
    val qc = new Array[Long](64)
    var predDc = 0L
    var sum = 0L
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        java.util.Arrays.fill(qc, 0L)
        // DC: category + extended difference, predicted from last block
        val ds = decodeHuff(dcT)
        if (ds < 0 || ds > 11) return Invalid
        var diff = 0L
        if (ds > 0) {
          diff = receiveExtend(ds)
          if (diff == Long.MinValue) return Invalid
        }
        predDc += diff
        qc(0) = predDc
        // AC: run/size over the zigzag scan
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = decodeHuff(acT)
          if (rs < 0) return Invalid
          val r = rs >> 4; val sz = rs & 0x0f
          if (sz == 0) {
            if (rs == 0x00) eob = true        // EOB
            else if (rs == 0xf0) {            // ZRL: sixteen zeros
              k += 16
              if (k > 64) return Invalid
            } else return Invalid
          } else {
            k += r
            if (k > 63) return Invalid
            val c = receiveExtend(sz)
            if (c == Long.MinValue) return Invalid
            qc(ZigZag(k)) = c
            k += 1
          }
        }
        val rec = dequantizeInverseWith(qc, quant)
        if (rec == null) return Invalid // forged stream past the IDCT bound
        // count only in-image samples (edge blocks are decoded whole but
        // their pad region is not image content)
        val xMax = math.min(8, w - bx * 8)
        val yMax = math.min(8, h - by * 8)
        var yy = 0
        while (yy < yMax) {
          var xx = 0
          while (xx < xMax) { sum += rec(yy * 8 + xx); xx += 1 }
          yy += 1
        }
        bx += 1
      }
      by += 1
    }
    bitCnt = 0 // discard pad bits to the byte boundary
    // the stream must end in EOI exactly at the last byte
    if (pos + 2 != n || (bytes(pos) & 0xff) != 0xff ||
        (bytes(pos + 1) & 0xff) != 0xd9) return Invalid
    val npx = w.toLong * h
    Decoded(valid = true, w, h, npx, sum, sum * 1000L / npx, nBlocks)
  }

  /** [[dequantizeInverse]] against an arbitrary (stream-supplied) quant
    * table — the decode path; the no-argument variant binds the Annex-K
    * table for the encoder/spec replay.
    */
  def dequantizeInverseWith(qc: Array[Long], quant: Array[Int]): Array[Int] = {
    val dq = new Array[Long](64)
    var i = 0
    while (i < 64) {
      val d = qc(i) * quant(i)
      // decode-side hard bound (forged streams): |dequantized| <= 2^18
      // keeps |p1| <= 8·2^19·2^18 = 2^40 and |p2| <= 8·2^40·2^19 = 2^62,
      // so p2 + 2^39 can never overflow — honest baseline streams
      // (|coefficient| <= 1023, quant <= 255) sit at |d| < 2^18 already
      if (d > (1L << 18) || d < -(1L << 18)) return null
      dq(i) = d
      i += 1
    }
    val p1 = new Array[Long](64)
    var x = 0
    while (x < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L
        var u = 0
        while (u < 8) { acc += IT(u)(x) * dq(v * 8 + u); u += 1 }
        p1(x * 8 + v) = acc
        v += 1
      }
      x += 1
    }
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      x = 0
      while (x < 8) {
        var acc = 0L
        var v = 0
        while (v < 8) { acc += p1(x * 8 + v) * IT(v)(y); v += 1 }
        val r = roundDiv(acc, Den) + 128
        out(y * 8 + x) = math.min(255, math.max(0, r)).toInt
        x += 1
      }
      y += 1
    }
    out
  }
}

/** `graft_jpegdct_encode(bytes, width)`: payload grayscale samples →
  * baseline SOF0 JPEG stream (null when no full block row fits). Width is
  * a literal multiple of 8.
  */
case class JpegDctEncode(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {
  require(width >= 8 && width % 8 == 0 && width <= 65528,
    "width must be a positive multiple of 8 fitting the u16 SOF field")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jpegdct_encode expects binary, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    JpegDctCodec.encode(input.asInstanceOf[Array[Byte]], width)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_jpegdct_decode(bytes)`: full baseline-DCT decode → per-asset
  * stats struct. Invalid, corrupt, progressive, multi-component, or
  * forged streams report `is_valid = false` with null stats.
  */
case class JpegDctDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("is_valid", BooleanType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("n_pixels", LongType, nullable = true),
    StructField("sum_v", LongType, nullable = true),
    StructField("mean_v_milli", LongType, nullable = true),
    StructField("n_blocks", LongType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jpegdct_decode expects binary, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val d = JpegDctCodec.decode(input.asInstanceOf[Array[Byte]])
    if (d.valid)
      InternalRow(true, d.width, d.height, d.nPixels, d.sumV, d.meanVMilli,
        d.nBlocks)
    else InternalRow(false, null, null, null, null, null, null)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JpegDctNativeFunctions {

  /** Register `graft_jpegdct_encode` / `graft_jpegdct_decode`
    * (idempotent), mirroring QoiNativeFunctions.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jpegdct_encode",
      exprs => JpegDctEncode(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jpegdct_decode", exprs => JpegDctDecode(exprs.head), "built-in")
  }

  def jpegDctEncode(spark: SparkSession, bytes: Column, width: Int): Column = {
    register(spark)
    call_function("graft_jpegdct_encode", bytes,
      org.apache.spark.sql.functions.lit(width))
  }

  def jpegDctDecode(spark: SparkSession, bytes: Column): Column = {
    register(spark)
    call_function("graft_jpegdct_decode", bytes)
  }
}
