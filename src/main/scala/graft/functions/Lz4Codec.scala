package graft.functions

/** LZ4 codec (E296) — the SEVENTH compression family in-engine, the
  * other speed-first LZ77 data lakes default to (alongside snappy):
  * the public `LZ4_Block_format.md` and `LZ4_Frame_format.md`
  * specifications, implemented from the documents.
  *
  * BLOCK format — a stream of sequences:
  * {{{
  * token: high nibble = literal length (15 = read 255-extension bytes),
  *        low nibble = match length - 4 (15 = extensions)
  * literals, then u16le offset (1..65535; 0 is forged), match copy
  * (may OVERLAP its own output); the LAST sequence is literals-only
  * (the block ends right after them — end-of-block rule)
  * }}}
  *
  * FRAME format — magic 0x184D2204 LE, FLG/BD descriptor under an
  * xxHash32 header checksum (the (xxh32 >> 8) & 0xFF rule), data
  * blocks as `u32le size` with the HIGH BIT flagging an uncompressed
  * block (each optionally followed by its own xxh32 when B.Checksum),
  * a zero EndMark, and an optional whole-content xxh32. xxHash32 is
  * implemented from its public algorithm description (the five-prime
  * avalanche) and pinned on known vectors. Skippable frames
  * (0x184D2A50..5F) are skipped per spec; the legacy frame magic and
  * reserved FLG bits are visible rejects.
  *
  * STRICTNESS: offset 0 or past the produced output, a match that
  * overruns the declared budget, unconsumed block input, a lying
  * header/block/content checksum, a block larger than the descriptor's
  * max, a missing EndMark, and trailing bytes all report invalid
  * (null). Decoded size is bounded by the declared block max BEFORE
  * allocation.
  *
  * Scale: one pass, O(window) state — the codec-walk shape.
  */
object Lz4Codec {

  val FrameMagic = 0x184D2204
  /** Fixture block max: BD code 4 = 64 KiB (the smallest legal). */
  val BlockMax = 65536

  // ---- xxHash32 (public algorithm; seed 0 for LZ4 frames) ----
  private val P1 = 0x9E3779B1
  private val P2 = 0x85EBCA77
  private val P3 = 0xC2B2AE3D
  private val P4 = 0x27D4EB2F
  private val P5 = 0x165667B1

  def xxh32(bytes: Array[Byte], off: Int, len: Int, seed: Int = 0): Int = {
    @inline def rotl(x: Int, r: Int): Int = (x << r) | (x >>> (32 - r))
    @inline def u32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    var p = off
    val end = off + len
    var h =
      if (len >= 16) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        val limit = end - 16
        while (p <= limit) {
          v1 = rotl(v1 + u32(p) * P2, 13) * P1
          v2 = rotl(v2 + u32(p + 4) * P2, 13) * P1
          v3 = rotl(v3 + u32(p + 8) * P2, 13) * P1
          v4 = rotl(v4 + u32(p + 12) * P2, 13) * P1
          p += 16
        }
        rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      } else seed + P5
    h += len
    while (p + 4 <= end) {
      h = rotl(h + u32(p) * P3, 17) * P4
      p += 4
    }
    while (p < end) {
      h = rotl(h + (bytes(p) & 0xff) * P5, 11) * P1
      p += 1
    }
    h ^= h >>> 15
    h *= P2
    h ^= h >>> 13
    h *= P3
    h ^= h >>> 16
    h
  }

  // ---- block format ----

  /** Compress one block (greedy 4-byte hash matcher honoring the spec's
    * end rules: the last 5 bytes are literals and no match starts
    * within the last 12).
    */
  def compressBlock(data: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(len + len / 255 + 16)
    def writeLen(first: Int, v: Int): Unit = {
      // `first` already sits in the token nibble; extensions are 255s
      var rem = v - 15
      if (first >= 15) {
        while (rem >= 255) { out.write(255); rem -= 255 }
        out.write(rem)
      }
    }
    def sequence(litFrom: Int, nLit: Int, offset: Int, mLen: Int): Unit = {
      val litNib = math.min(nLit, 15)
      val matNib = if (mLen < 0) 0 else math.min(mLen - 4, 15)
      out.write((litNib << 4) | (if (mLen < 0) 0 else matNib))
      writeLen(litNib, nLit)
      out.write(data, litFrom, nLit)
      if (mLen >= 0) {
        out.write(offset & 0xff)
        out.write((offset >>> 8) & 0xff)
        writeLen(matNib, mLen - 4)
      }
    }
    val end = off + len
    val mflimit = end - 12 // no match may START past here (spec rule)
    if (len < 13) {
      sequence(off, len, 0, -1)
      return out.toByteArray
    }
    val hashBits = 14
    val table = new Array[Int](1 << hashBits)
    java.util.Arrays.fill(table, -1)
    @inline def h4(p: Int): Int = {
      val x = (data(p) & 0xff) | ((data(p + 1) & 0xff) << 8) |
        ((data(p + 2) & 0xff) << 16) | ((data(p + 3) & 0xff) << 24)
      (x * 0x9E3779B1) >>> (32 - hashBits)
    }
    var p = off
    var litStart = off
    while (p < mflimit) {
      val hh = h4(p)
      val cand = table(hh)
      table(hh) = p
      if (cand >= off && cand < p && p - cand <= 65535 &&
        data(cand) == data(p) && data(cand + 1) == data(p + 1) &&
        data(cand + 2) == data(p + 2) && data(cand + 3) == data(p + 3)) {
        var m = 4
        // matches must leave the last 5 bytes to the closing literals
        val matchEnd = end - 5
        while (p + m < matchEnd && data(cand + m) == data(p + m)) m += 1
        sequence(litStart, p - litStart, p - cand, m)
        p += m
        litStart = p
      } else p += 1
    }
    sequence(litStart, end - litStart, 0, -1)
    out.toByteArray
  }

  /** Decompress one block strictly; null when malformed. The declared
    * output budget is `maxLen` (checked before allocation); the result
    * is exactly the bytes produced. `hist` is the up-to-64 KiB tail of
    * the PRECEDING frame output — the LINKED-blocks window (B.Indep =
    * 0, the lz4 CLI's default): offsets may reach back into it; with
    * no history (independent blocks) such an offset is forged.
    */
  def decompressBlock(bytes: Array[Byte], off: Int, len: Int,
      maxLen: Int, hist: Array[Byte] = null): Array[Byte] = {
    val histLen = if (hist == null) 0 else hist.length
    if (maxLen < 0 || maxLen > (1 << 26)) return null
    val out = new Array[Byte](maxLen)
    var w = 0
    var p = off
    val end = off + len
    if (len == 0) return java.util.Arrays.copyOf(out, 0)
    var done = false
    while (!done) {
      if (p >= end) return null
      val token = bytes(p) & 0xff
      p += 1
      var nLit = token >>> 4
      if (nLit == 15) {
        var b = 255
        while (b == 255) {
          if (p >= end) return null
          b = bytes(p) & 0xff
          p += 1
          nLit += b
          if (nLit > maxLen) return null
        }
      }
      if (p + nLit > end || w + nLit > maxLen) return null
      System.arraycopy(bytes, p, out, w, nLit)
      p += nLit
      w += nLit
      if (p == end) {
        // the last sequence is literals-only: the block ends here
        done = true
      } else {
        if (p + 2 > end) return null
        val offset = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
        p += 2
        if (offset < 1 || offset > w + histLen) return null // forged
        var mLen = (token & 15) + 4
        if ((token & 15) == 15) {
          var b = 255
          while (b == 255) {
            if (p >= end) return null
            b = bytes(p) & 0xff
            p += 1
            mLen += b
            if (mLen > maxLen) return null
          }
        }
        if (w + mLen > maxLen) return null
        var i = 0
        while (i < mLen) { // may overlap: byte-serial per the spec
          val src = w + i - offset
          out(w + i) = if (src >= 0) out(src) else hist(histLen + src)
          i += 1
        }
        w += mLen
      }
    }
    java.util.Arrays.copyOf(out, w)
  }

  // ---- frame format ----

  /** Wrap data as an LZ4 frame: FLG with content checksum (and block
    * checksums when `blockSums`), BD code 4 (64 KiB max), compressed
    * blocks of ≤ `chunk` bytes (stored uncompressed when compression
    * does not shrink them, per the high-bit rule). `skippablePrefix`
    * prepends a skippable frame — a real-file shape (padding, custom
    * metadata).
    */
  def frame(data: Array[Byte], chunk: Int = 4096,
      blockSums: Boolean = false,
      skippablePrefix: Boolean = false): Array[Byte] = {
    require(chunk >= 1 && chunk <= BlockMax, "bad chunk")
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    def u32le(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    if (skippablePrefix) {
      u32le(0x184D2A50) // skippable frame magic (nibble 0)
      u32le(4)
      u32le(0xdeadbeef) // opaque user data, skipped unread
    }
    u32le(FrameMagic)
    // FLG: version 01, B.Indep 1, B.Checksum ?, C.Size 0, C.Checksum 1
    val flg = 0x40 | 0x20 | (if (blockSums) 0x10 else 0) | 0x04
    val bd = 4 << 4
    out.write(flg); out.write(bd)
    val desc = Array(flg.toByte, bd.toByte)
    out.write((xxh32(desc, 0, 2) >>> 8) & 0xff) // HC
    var off = 0
    while (off < data.length) {
      val take = math.min(chunk, data.length - off)
      val comp = compressBlock(data, off, take)
      if (comp.length < take) {
        u32le(comp.length)
        out.write(comp, 0, comp.length)
        if (blockSums) u32le(xxh32(comp, 0, comp.length))
      } else {
        u32le(take | 0x80000000) // stored: the high-bit rule
        out.write(data, off, take)
        if (blockSums) u32le(xxh32(data, off, take))
      }
      off += take
    }
    u32le(0) // EndMark
    u32le(xxh32(data, 0, data.length)) // content checksum (C.Checksum)
    out.toByteArray
  }

  /** Unframe strictly; null when malformed. Skippable frames before or
    * after the LZ4 frame are skipped; exactly one LZ4 frame is
    * required and the stream must end at a frame boundary.
    */
  def unframe(bytes: Array[Byte]): Array[Byte] = {
    val n = bytes.length
    def u32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    val out = new java.io.ByteArrayOutputStream(math.max(64, n * 2))
    var p = 0
    var sawFrame = false
    while (p < n) {
      if (p + 4 > n) return null
      val magic = u32(p)
      if ((magic & 0xfffffff0) == 0x184D2A50) {
        // skippable frame: u32le size, then opaque bytes. The size is
        // an UNSIGNED u32 — compare in Long, or a crafted 0x7ffffff9
        // wraps the Int sum negative, slips the bound, and indexes
        // past the array (a crash where the contract is null)
        if (p + 8 > n) return null
        val sz = u32(p + 4) & 0xffffffffL
        if (p + 8 + sz > n) return null
        p = (p + 8 + sz).toInt
      } else if (magic == FrameMagic) {
        if (sawFrame) return null // one data frame per stream
        sawFrame = true
        p += 4
        if (p + 3 > n) return null
        val flg = bytes(p) & 0xff
        val bd = bytes(p + 1) & 0xff
        if ((flg & 0xc0) != 0x40) return null // version must be 01
        if ((flg & 0x03) != 0) return null    // reserved + dictID unsupported
        val bIndep = (flg & 0x20) != 0
        val blockSums = (flg & 0x10) != 0
        val contentSize = (flg & 0x08) != 0
        val contentSum = (flg & 0x04) != 0
        if ((bd & 0x8f) != 0) return null     // BD reserved bits
        val bmax = (bd >>> 4) match {
          case 4 => 1 << 16
          case 5 => 1 << 18
          case 6 => 1 << 20
          case 7 => 1 << 22
          case _ => return null
        }
        var declared = -1L
        val descStart = p
        p += 2
        if (contentSize) {
          if (p + 8 > n) return null
          declared = 0L
          var i = 0
          while (i < 8) {
            declared |= (bytes(p + i) & 0xffL) << (8 * i)
            i += 1
          }
          if (declared < 0) return null
          p += 8
        }
        if (p >= n) return null
        val hc = bytes(p) & 0xff
        if (((xxh32(bytes, descStart, p - descStart) >>> 8) & 0xff) != hc)
          return null // header checksum: a lying descriptor is visible
        p += 1
        val frameStart = out.size()
        // linked blocks (B.Indep = 0): the 64 KiB window carries across
        var hist: Array[Byte] = Array.emptyByteArray
        var ended = false
        while (!ended) {
          if (p + 4 > n) return null
          val bsz = u32(p)
          p += 4
          if (bsz == 0) ended = true
          else {
            val stored = (bsz & 0x80000000) != 0
            val blen = bsz & 0x7fffffff
            if (blen < 0 || blen > bmax || p + blen > n) return null
            val raw =
              if (stored)
                java.util.Arrays.copyOfRange(bytes, p, p + blen)
              else {
                val d = decompressBlock(bytes, p, blen, bmax,
                  if (bIndep) null else hist)
                if (d == null) return null
                d
              }
            if (!bIndep) {
              val keep = math.min(65536, hist.length + raw.length)
              val nh = new Array[Byte](keep)
              val fromRaw = math.min(raw.length, keep)
              val fromHist = keep - fromRaw
              if (fromHist > 0)
                System.arraycopy(hist, hist.length - fromHist, nh, 0,
                  fromHist)
              System.arraycopy(raw, raw.length - fromRaw, nh, fromHist,
                fromRaw)
              hist = nh
            }
            if (blockSums) {
              if (p + blen + 4 > n) return null
              if (xxh32(bytes, p, blen) != u32(p + blen)) return null
            }
            out.write(raw, 0, raw.length)
            p += blen + (if (blockSums) 4 else 0)
          }
        }
        val produced = out.size() - frameStart
        if (declared >= 0 && produced.toLong != declared) return null
        if (contentSum) {
          if (p + 4 > n) return null
          val whole = out.toByteArray
          if (xxh32(whole, frameStart, produced) != u32(p)) return null
          p += 4
        }
      } else return null // legacy magic / garbage: not an LZ4 frame
    }
    if (!sawFrame) return null
    out.toByteArray
  }
}
