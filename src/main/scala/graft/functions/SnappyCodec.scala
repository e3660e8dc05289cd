package graft.functions

/** Snappy codec (E295) — the SIXTH compression family implemented
  * in-engine (after DEFLATE-via-JDK, LZW, Rice, Huffman, QOI, and the
  * RLE pair), and the one column stores actually default to: the public
  * google/snappy `format_description.txt` BLOCK format and
  * `framing_format.txt` STREAM format, implemented from the documents
  * (byte-oriented LZ77 with no entropy stage — the speed-over-ratio
  * trade data lakes make).
  *
  * BLOCK format:
  * {{{
  * preamble: uncompressed length, little-endian varint (7 bits/byte)
  * elements: tag byte, low 2 bits the type —
  *   00 literal: len-1 in tag>>2; 60..63 mean len-1 follows in 1..4 LE bytes
  *   01 copy: len = 4 + ((tag>>2) & 7), offset = ((tag>>5) << 8) | next
  *   10 copy: len = 1 + (tag>>2), offset = next 2 bytes LE
  *   11 copy: len = 1 + (tag>>2), offset = next 4 bytes LE
  * }}}
  * Copies may OVERLAP their own output (offset < len replays a period —
  * how runs are coded without an RLE mode); offset 0 or beyond the
  * bytes already produced is a forged stream; the output must land
  * exactly on the preamble length and the input must be consumed
  * exactly.
  *
  * FRAMING format: a 0xFF stream-identifier chunk ("sNaPpY"), then
  * chunks of `type u8 | length u24le | data`: 0x00 compressed (masked
  * CRC-32C of the UNCOMPRESSED bytes + a snappy block), 0x01
  * uncompressed (masked CRC-32C + raw bytes), 0xFE padding and
  * 0x80..0xFD skippable (skipped), 0x02..0x7F unskippable (visible
  * reject). The CRC mask is the spec's `((crc >>> 15) | (crc << 17)) +
  * 0xa282ead8` rotation — a lying checksum is a visible finding.
  *
  * Scale: one pass, O(window) state; the uncompressed length is
  * declared up front, so allocation is bounded by the 1032-free rule —
  * here the declared length is checked against the framing chunk cap
  * (65536 per chunk per the spec) before any allocation.
  */
object SnappyCodec {

  /** Spec cap: an uncompressed chunk carries at most 65536 bytes. */
  val MaxChunkUncompressed = 65536

  // ---- CRC-32C (Castagnoli) via the JDK's intrinsified CRC32C —
  // the checksum-class convention the gzip/zip wires already use; the
  // spec vector (0xE3069283) stays pinned in SnappyCodecSpec ----
  def crc32c(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C
    c.update(bytes, off, len)
    c.getValue.toInt
  }

  /** The framing spec's CRC mask (defends against CRCs of CRCs). */
  def maskCrc(crc: Int): Int = ((crc >>> 15) | (crc << 17)) + 0xa282ead8

  // ---- block format ----

  /** Compress one block (greedy 4-byte hash matcher — the reference
    * implementation's simple strategy, deterministic).
    */
  def compressBlock(data: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(len / 2 + 16)
    // preamble: uncompressed length varint
    var v = len
    while (v >= 0x80) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
    def literal(from: Int, n: Int): Unit = {
      var p = from
      var left = n
      while (left > 0) {
        val take = math.min(left, 65536)
        val lm1 = take - 1
        if (lm1 < 60) out.write(lm1 << 2)
        else if (lm1 < 256) { out.write(60 << 2); out.write(lm1) }
        else { out.write(61 << 2); out.write(lm1 & 0xff); out.write(lm1 >>> 8) }
        out.write(data, p, take)
        p += take
        left -= take
      }
    }
    if (len < 4) {
      if (len > 0) literal(off, len)
      return out.toByteArray
    }
    val hashBits = 14
    val table = new Array[Int](1 << hashBits)
    java.util.Arrays.fill(table, -1)
    @inline def h4(p: Int): Int = {
      val x = ((data(p) & 0xff)) | ((data(p + 1) & 0xff) << 8) |
        ((data(p + 2) & 0xff) << 16) | ((data(p + 3) & 0xff) << 24)
      (x * 0x1e35a7bd) >>> (32 - hashBits)
    }
    var p = off
    var litStart = off
    val end = off + len
    while (p + 4 <= end) {
      val hh = h4(p)
      val cand = table(hh)
      table(hh) = p
      if (cand >= off && cand < p && p - cand <= 65535 &&
        data(cand) == data(p) && data(cand + 1) == data(p + 1) &&
        data(cand + 2) == data(p + 2) && data(cand + 3) == data(p + 3)) {
        // flush pending literal, then extend the match
        if (p > litStart) literal(litStart, p - litStart)
        val offset = p - cand
        var m = 4
        while (p + m < end && data(cand + m) == data(p + m) && m < 65536)
          m += 1
        var rem = m
        // emit copies: prefer the 1-byte-offset form when it fits
        while (rem > 0) {
          if (rem >= 4 && rem <= 11 && offset < 2048) {
            out.write(1 | ((rem - 4) << 2) | ((offset >>> 8) << 5))
            out.write(offset & 0xff)
            rem = 0
          } else {
            val take = math.min(rem, 64)
            // never leave a sub-4 tail that only the 01 form could
            // not express... the 10 form takes 1..64, so any tail works
            out.write(2 | ((take - 1) << 2))
            out.write(offset & 0xff)
            out.write((offset >>> 8) & 0xff)
            rem -= take
          }
        }
        p += m
        litStart = p
      } else p += 1
    }
    if (end > litStart) literal(litStart, end - litStart)
    out.toByteArray
  }

  /** Decompress one block strictly; null when malformed (bad varint,
    * forged offset, output over/underrun, unconsumed input). The
    * declared length must be ≤ `maxLen` BEFORE allocation.
    */
  def decompressBlock(bytes: Array[Byte], off: Int, len: Int,
      maxLen: Int): Array[Byte] = {
    var p = off
    val end = off + len
    // varint preamble
    var declared = 0L
    var shift = 0
    var more = true
    while (more) {
      if (p >= end || shift > 28) return null
      val b = bytes(p) & 0xff
      declared |= (b & 0x7fL) << shift
      shift += 7
      p += 1
      more = (b & 0x80) != 0
    }
    if (declared < 0 || declared > maxLen) return null
    val out = new Array[Byte](declared.toInt)
    var w = 0
    while (p < end) {
      val tag = bytes(p) & 0xff
      p += 1
      (tag & 3) match {
        case 0 =>
          var lm1 = tag >>> 2
          if (lm1 >= 60) {
            val extra = lm1 - 59 // 1..4 bytes of length follow
            if (p + extra > end) return null
            var lm1L = 0L // widen: 4 bytes can encode 2^32-1, and
            var i = 0     // lm1+1 at Int.MaxValue wraps past the guards
            while (i < extra) {
              lm1L |= (bytes(p + i) & 0xffL) << (8 * i)
              i += 1
            }
            if (lm1L >= maxLen) return null // cannot fit the declaration
            lm1 = lm1L.toInt
            p += extra
          }
          val n2 = lm1 + 1
          if (p + n2 > end || w + n2 > out.length) return null
          System.arraycopy(bytes, p, out, w, n2)
          p += n2
          w += n2
        case c =>
          var length = 0
          var offset = 0
          if (c == 1) {
            if (p + 1 > end) return null
            length = 4 + ((tag >>> 2) & 7)
            offset = ((tag >>> 5) << 8) | (bytes(p) & 0xff)
            p += 1
          } else if (c == 2) {
            if (p + 2 > end) return null
            length = 1 + (tag >>> 2)
            offset = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
            p += 2
          } else {
            if (p + 4 > end) return null
            length = 1 + (tag >>> 2)
            val o = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
              ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 3) & 0xff) << 24)
            if (o < 0) return null
            offset = o
            p += 4
          }
          // a copy from before the stream, or from nothing, is forged
          if (offset < 1 || offset > w) return null
          if (w + length > out.length) return null
          var i = 0
          while (i < length) { // may overlap: byte-serial per the spec
            out(w + i) = out(w + i - offset)
            i += 1
          }
          w += length
      }
    }
    if (w != out.length) return null // under-filled declaration
    out
  }

  // ---- framing format ----

  /** Wrap data as a framed snappy stream: stream identifier, then
    * compressed chunks of ≤ `chunk` uncompressed bytes each. `raw`
    * emits every chunk as type 0x01 (uncompressed); `pad` inserts one
    * 0xFE padding chunk after the identifier (both real-file shapes).
    */
  def frame(data: Array[Byte], chunk: Int = 4096, raw: Boolean = false,
      pad: Boolean = false): Array[Byte] = {
    require(chunk >= 1 && chunk <= MaxChunkUncompressed, "bad chunk size")
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    def chunkHdr(typ: Int, len: Int): Unit = {
      out.write(typ)
      out.write(len & 0xff); out.write((len >>> 8) & 0xff)
      out.write((len >>> 16) & 0xff)
    }
    chunkHdr(0xff, 6)
    "sNaPpY".foreach(c => out.write(c))
    if (pad) { chunkHdr(0xfe, 3); out.write(0); out.write(0); out.write(0) }
    var off = 0
    while (off < data.length) {
      val take = math.min(chunk, data.length - off)
      val crc = maskCrc(crc32c(data, off, take))
      val body =
        if (raw) java.util.Arrays.copyOfRange(data, off, off + take)
        else compressBlock(data, off, take)
      chunkHdr(if (raw) 0x01 else 0x00, 4 + body.length)
      out.write(crc & 0xff); out.write((crc >>> 8) & 0xff)
      out.write((crc >>> 16) & 0xff); out.write((crc >>> 24) & 0xff)
      out.write(body, 0, body.length)
      off += take
    }
    out.toByteArray
  }

  /** Unframe strictly: the stream identifier must come first (and may
    * repeat — spec-legal at concatenation points), checksums must
    * verify, padding/skippable chunks skip, unskippable reject. Null
    * when malformed.
    */
  def unframe(bytes: Array[Byte]): Array[Byte] = {
    val n = bytes.length
    val out = new java.io.ByteArrayOutputStream(math.max(64, n * 2))
    var p = 0
    var sawId = false
    while (p < n) {
      if (p + 4 > n) return null
      val typ = bytes(p) & 0xff
      val len = (bytes(p + 1) & 0xff) | ((bytes(p + 2) & 0xff) << 8) |
        ((bytes(p + 3) & 0xff) << 16)
      p += 4
      if (p + len > n) return null
      typ match {
        case 0xff =>
          if (len != 6) return null
          if (!"sNaPpY".indices.forall(i =>
            (bytes(p + i) & 0xff) == "sNaPpY".charAt(i))) return null
          sawId = true
        case 0x00 =>
          if (!sawId || len < 4) return null
          val crc = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
            ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 3) & 0xff) << 24)
          val raw = decompressBlock(bytes, p + 4, len - 4,
            MaxChunkUncompressed)
          if (raw == null) return null
          if (maskCrc(crc32c(raw, 0, raw.length)) != crc) return null
          out.write(raw, 0, raw.length)
        case 0x01 =>
          if (!sawId || len < 4) return null
          if (len - 4 > MaxChunkUncompressed) return null
          val crc = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
            ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 3) & 0xff) << 24)
          if (maskCrc(crc32c(bytes, p + 4, len - 4)) != crc) return null
          out.write(bytes, p + 4, len - 4)
        case t if t == 0xfe || (t >= 0x80 && t <= 0xfd) =>
          if (!sawId) return null // skippable still needs the stream id
        case _ =>
          return null // 0x02..0x7f: unskippable reserved — visible
      }
      p += len
    }
    if (!sawId) return null
    out.toByteArray
  }
}
