package graft.functions

import graft.SparkSpec

/** TAR shard codec conformance (E269, the POSIX ustar layout): the
  * q315/q316 oracle pins the member arithmetic; this spec pins what the
  * oracle cannot see — the header checksum audit, the octal grammar,
  * the end-of-archive marker, the zero-padding rule, extraction
  * reassembly, and every reject path on both wires.
  */
class TarCodecSpec extends SparkSpec {

  private def fixture(n: Int, seed: Int): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)((rng.nextInt(256) - 128).toByte)
  }

  private def sliceSum(p: Array[Byte], i: Int, w: Int): Long =
    (i * w until (i + 1) * w).map(p(_) & 0xff).map(_.toLong).sum

  test("both wires (plain / .tar.gz) are one member identity") {
    val payload = fixture(7 * 100 + 55, 71) // 7 whole members
    val expSum = (0 until 700).map(payload(_) & 0xff).map(_.toLong).sum
    val expIv = (0 until 7).map(i => i.toLong * sliceSum(payload, i, 100)).sum
    for (gz <- Seq(false, true)) {
      val tar = TarCodec.encodeTar(payload, 100, gz)
      assert(tar !== null)
      val (d, members) = TarCodec.decodeTar(tar, gz, collect = true)
      assert(d.valid, s"gz=$gz")
      assert(d.nMembers === 7L)
      assert(d.contentBytes === 700L)
      assert((d.sumPayload, d.sumIv) === ((expSum, expIv)),
        s"gz=$gz: member walk must be the identity, in order")
      // extraction: names follow the fixture rule, bytes reassemble
      assert(members.map(_.name) === (0 until 7).map(i => f"doc$i%05d.txt"))
      assert(java.util.Arrays.equals(
        members.flatMap(_.bytes).toArray, payload.take(700)),
        "extracted members must reassemble the document bytes")
    }
    // the gz wire is really smaller on compressible data and really gzip
    val text = Array.fill(2000)('a'.toByte)
    val gzTar = TarCodec.encodeTar(text, 100, gz = true)
    assert((gzTar(0) & 0xff) === 0x1f && (gzTar(1) & 0xff) === 0x8b)
    assert(gzTar.length < TarCodec.encodeTar(text, 100).length)
    // no full member fits
    assert(TarCodec.encodeTar(fixture(99, 72), 100) === null)
  }

  test("header strictness: checksum, octal grammar, typeflag, magic") {
    val payload = fixture(3 * 100, 73)
    val tar = TarCodec.encodeTar(payload, 100)
    assert(TarCodec.decodeTar(tar, gz = false)._1.valid)
    // flip one name byte: the checksum catches it (the spec's own rule)
    val renamed = tar.clone(); renamed(0) = 'X'
    assert(!TarCodec.decodeTar(renamed, gz = false)._1.valid,
      "a header edit without a checksum fix is a visible finding")
    // a non-octal digit in the size field
    val badSize = tar.clone(); badSize(124) = '9'
    assert(!TarCodec.decodeTar(badSize, gz = false)._1.valid)
    // a directory member (typeflag '5'): not a sample, reject visibly.
    // keep the checksum CONSISTENT so the typeflag audit itself fires
    val dir = tar.clone()
    dir(156) = '5'
    // checksum delta: '5' - '0' = 5; recompute the 6-digit octal field
    val sum = (0 until 512).map(i =>
      if (i >= 148 && i < 156) ' '.toInt else dir(i) & 0xff).sum
    var x = sum
    for (k <- 5 to 0 by -1) { dir(148 + k) = ('0' + (x & 7)).toByte; x >>= 3 }
    assert(!TarCodec.decodeTar(dir, gz = false)._1.valid,
      "non-regular members reject visibly, never misparse")
    // broken magic
    val badMagic = tar.clone(); badMagic(257) = 'X'
    assert(!TarCodec.decodeTar(badMagic, gz = false)._1.valid)
  }

  test("framing strictness: padding, end marker, truncation, gz lies") {
    val payload = fixture(2 * 100, 74)
    val tar = TarCodec.encodeTar(payload, 100)
    // nonzero data padding (bytes 100..511 of the first member's data)
    val dirty = tar.clone(); dirty(512 + 100) = 1
    assert(!TarCodec.decodeTar(dirty, gz = false)._1.valid)
    // a missing end-of-archive marker
    assert(!TarCodec.decodeTar(tar.dropRight(512), gz = false)._1.valid)
    assert(!TarCodec.decodeTar(tar.dropRight(1024), gz = false)._1.valid)
    // trailing bytes after the marker
    assert(!TarCodec.decodeTar(tar ++ new Array[Byte](512),
      gz = false)._1.valid)
    // truncation mid-member
    assert(!TarCodec.decodeTar(tar.take(700), gz = false)._1.valid)
    // gz wire: a lying CRC32 is a visible finding
    val gzTar = TarCodec.encodeTar(payload, 100, gz = true)
    assert(TarCodec.decodeTar(gzTar, gz = true)._1.valid)
    val badCrc = gzTar.clone()
    badCrc(badCrc.length - 8) = (badCrc(badCrc.length - 8) ^ 1).toByte
    assert(!TarCodec.decodeTar(badCrc, gz = true)._1.valid)
    // a whole second archive concatenated IS a legal gzip series now
    // (E288) — but its payload is tar-invalid: bytes after the first
    // end-of-archive marker. The reject moved from the gzip layer to
    // the tar walk; it stays visible either way.
    assert(!TarCodec.decodeTar(gzTar ++ gzTar, gz = true)._1.valid)
  }

  test("multi-member gzip wire (E288): pigz/cat-style series decode") {
    def gzMember(data: Array[Byte], off: Int, len: Int): Array[Byte] = {
      val g = new java.io.ByteArrayOutputStream(len / 2 + 64)
      g.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0,
        0xff.toByte), 0, 10)
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(data, off, len)
      d.finish()
      val buf = new Array[Byte](8192)
      while (!d.finished()) g.write(buf, 0, d.deflate(buf))
      d.end()
      val crc = new java.util.zip.CRC32
      crc.update(data, off, len)
      def u32(v: Long): Unit = (0 until 4).foreach(i =>
        g.write(((v >>> (8 * i)) & 0xff).toInt))
      u32(crc.getValue)
      u32(len.toLong)
      g.toByteArray
    }
    val payload = fixture(7 * 100 + 13, 83) // tar = 8192 B
    val plain = TarCodec.decodeTar(TarCodec.encodeTar(payload, 100),
      gz = false)._1
    // the encoder's mgz wire: 1024-byte chunks, one member each
    val wire = TarCodec.encodeTar(payload, 100, mgz = true)
    val d = TarCodec.decodeTar(wire, gz = true)._1
    assert(d.valid && d === plain,
      "the member series changes the wire, never the shard stats")
    // the wire really is MULTI-member: a second magic exists past the
    // first (single-member gzip has exactly one)
    assert((1 until wire.length - 1).exists(i =>
      (wire(i) & 0xff) == 0x1f && (wire(i + 1) & 0xff) == 0x8b))
    // `cat a.gz b.gz`: two hand-split members reassemble the archive
    val tar = TarCodec.encodeTar(payload, 100)
    val cat = gzMember(tar, 0, 4096) ++ gzMember(tar, 4096, tar.length - 4096)
    val dc = TarCodec.decodeTar(cat, gz = true)._1
    assert(dc.valid && dc === plain,
      "concatenated gzip parts are a spec-legal series per RFC 1952")
    // an EMPTY member mid-series is legal (bgzip's EOF-marker shape)
    val withEmpty = gzMember(tar, 0, 4096) ++
      gzMember(Array.emptyByteArray, 0, 0) ++
      gzMember(tar, 4096, tar.length - 4096)
    assert(TarCodec.decodeTar(withEmpty, gz = true)._1 === plain)
    // a lying CRC in the SECOND member is a visible finding
    val part1 = gzMember(tar, 0, 4096)
    val badCat = cat.clone()
    badCat(part1.length + part1.length / 2) =
      (badCat(part1.length + part1.length / 2) ^ 1).toByte
    assert(!TarCodec.decodeTar(badCat, gz = true)._1.valid)
    // trailing garbage after the last member must not parse as a header
    assert(!TarCodec.decodeTar(cat ++ Array[Byte](1, 2, 3),
      gz = true)._1.valid)
  }

  test("RFC 1952 header fields (E299): FNAME-carrying gzip decodes") {
    val payload = fixture(5 * 100 + 9, 85)
    val plain = TarCodec.decodeTar(TarCodec.encodeTar(payload, 100),
      gz = false)._1
    // the gzHdr wire carries FEXTRA + FNAME + FCOMMENT + FHCRC — the
    // field set the real `gzip` tool emits (FNAME by default)
    val wire = TarCodec.encodeTar(payload, 100, gzHdr = true)
    assert((wire(3) & 0xff) === (2 | 4 | 8 | 16))
    val d = TarCodec.decodeTar(wire, gz = true)._1
    assert(d.valid && d === plain,
      "header metadata changes the wire, never the shard")
    // the FNAME really is on the wire (NUL-terminated at offset 18)
    assert(new String(wire, 18, 9, "US-ASCII") === "shard.tar")
    // a corrupted header byte is caught by FHCRC before any inflation
    val badName = wire.clone(); badName(18) = 'X'
    assert(!TarCodec.decodeTar(badName, gz = true)._1.valid)
    // reserved FLG bits (5..7) reject per the spec
    val rsv = wire.clone(); rsv(3) = (rsv(3) | 0x20).toByte
    assert(!TarCodec.decodeTar(rsv, gz = true)._1.valid)
    // a truncated FNAME (no NUL before EOF) is malformed
    val cut = wire.take(24)
    assert(!TarCodec.decodeTar(cut, gz = true)._1.valid)
  }

  test("pax extended headers: path overrides apply, malformed chains reject") {
    val payload = fixture(3 * 100 + 17, 75)
    val tar = TarCodec.encodeTar(payload, 100, pax = true)
    assert(tar !== null)
    for (gz <- Seq(false, true)) {
      val wire = TarCodec.encodeTar(payload, 100, gz = gz, pax = true)
      val (d, members) = TarCodec.decodeTar(wire, gz, collect = true)
      assert(d.valid, s"gz=$gz")
      // pax members are metadata: counts and sums equal the plain shard
      assert(d.nMembers === 3L && d.contentBytes === 300L)
      // the 104-char names only an override-applying decoder sees
      assert(members.map(_.name) ===
        (0 until 3).map(i => TarCodec.paxName(i.toLong)))
      assert(members.head.name.length === 104)
      assert(java.util.Arrays.equals(
        members.flatMap(_.bytes).toArray, payload.take(300)))
    }
    // a size override: hand-patch the first pax record from path to a
    // size key... simpler: craft a pax record with size via the public
    // encoder is not exposed — instead verify the REJECT paths on wire
    // patches. Two pax in a row: duplicate the first pax member (header
    // + one 512 data block)
    val paxSpan = 1024 // 512 header + 512 padded record
    val dup = tar.take(paxSpan) ++ tar
    assert(!TarCodec.decodeTar(dup, gz = false)._1.valid,
      "two pax headers in a row are a malformed chain")
    // a pax header with no following member: keep ONLY the first pax
    // then the end marker
    val dangling = tar.take(paxSpan) ++ new Array[Byte](1024)
    assert(!TarCodec.decodeTar(dangling, gz = false)._1.valid,
      "a dangling pax override is a visible finding")
    // a corrupted record length (first record starts at offset 512)
    val badLen = tar.clone(); badLen(512) = 'x'
    assert(!TarCodec.decodeTar(badLen, gz = false)._1.valid)
    // record shorter than declared: newline no longer at LEN-1
    val badNl = tar.clone()
    // find the record's newline and flip it
    val nl = (512 until 1024).find(tar(_) == '\n').get
    badNl(nl) = '_'
    assert(!TarCodec.decodeTar(badNl, gz = false)._1.valid)
    // a global pax header ('g') is a named reject: patch typeflag and
    // fix the checksum so the typeflag audit itself fires
    val glob = tar.clone()
    glob(156) = 'g'
    val sum = (0 until 512).map(i =>
      if (i >= 148 && i < 156) ' '.toInt else glob(i) & 0xff).sum
    var x = sum
    for (k <- 5 to 0 by -1) { glob(148 + k) = ('0' + (x & 7)).toByte; x >>= 3 }
    assert(!TarCodec.decodeTar(glob, gz = false)._1.valid)
  }

  test("tarTextIngest: shard members become cleaned, tokenized samples") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one member with markup + entities, one plain; whitespace pads to
    // the 100-byte member size and must collapse away
    val m0 = "<p>alpha&amp;beta</p> gamma" + " " * 73
    val m1 = "plain words here" + " " * 84
    val assets = Seq((1L, (m0 + m1).getBytes("US-ASCII")))
      .toDF("asset_id", "bytes")
      .withColumn("kind", lit("text"))
      .withColumn("meta", struct(lit("s").as("source"), lit("m").as("mime")))
    val out = graft.ext.Multimodal.tarTextIngest(
      graft.ext.Multimodal.encodeTar(assets, memberBytes = 100, gz = true),
      gz = true)
      .orderBy("member_idx").collect()
    assert(out.length === 2)
    assert(out(0).getAs[String]("name") === "doc00000.txt")
    // "<p>alpha&amp;beta</p> gamma" -> "alpha&beta gamma" (16 chars)
    assert(out(0).getAs[Long]("clean_len") === 16L)
    assert(out(0).getAs[Long]("n_tokens") === 2L)
    assert(out(1).getAs[Long]("n_tokens") === 3L)
  }

  test("member index (E279): data offsets are real seek positions") {
    val payload = fixture(5 * 100 + 31, 77)
    // plain wire: header + padded data per member -> data at k*1024 + 512
    val tar = TarCodec.encodeTar(payload, 100)
    val (_, members) = TarCodec.decodeTar(tar, gz = false, collect = true)
    assert(members.map(_.dataOff) === (0 until 5).map(k => k * 1024L + 512L))
    // the offsets are REAL: seeking into the raw shard at (offset, size)
    // reads exactly the member bytes the decoder extracted
    members.foreach { m =>
      val seek = java.util.Arrays.copyOfRange(tar, m.dataOff.toInt,
        (m.dataOff + m.size).toInt)
      assert(java.util.Arrays.equals(seek, m.bytes),
        s"member ${m.idx}: the index must be a usable seek table")
    }
    // pax wire: each member preceded by a pax header + padded pax data
    // block pair -> the walk must land on k*2048 + 1536
    val pax = TarCodec.encodeTar(payload, 100, pax = true)
    val (_, pm) = TarCodec.decodeTar(pax, gz = false, collect = true)
    assert(pm.map(_.dataOff) === (0 until 5).map(k => k * 2048L + 1536L))
    pm.foreach { m =>
      val seek = java.util.Arrays.copyOfRange(pax, m.dataOff.toInt,
        (m.dataOff + m.size).toInt)
      assert(java.util.Arrays.equals(seek, m.bytes))
    }
    // gz wire: offsets address the DECOMPRESSED stream — identical to
    // the plain wire's (same archive under the wrapper)
    val gzTar = TarCodec.encodeTar(payload, 100, gz = true)
    val (_, gm) = TarCodec.decodeTar(gzTar, gz = true, collect = true)
    assert(gm.map(_.dataOff) === members.map(_.dataOff))
  }

  test("BGZF wire (E286): hop-addressable blocks, EOF marker mandatory") {
    val payload = fixture(7 * 100 + 13, 79) // tar = 8192 B -> 16 blocks
    val plain = TarCodec.decodeTar(TarCodec.encodeTar(payload, 100),
      gz = false)._1
    val wire = TarCodec.encodeTar(payload, 100, bgzf = true)
    val d = TarCodec.decodeTar(wire, gz = false, bgzf = true)._1
    assert(d.valid && d === plain.copy(),
      "the BGZF wire must report identical member stats")
    def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    // the hop walk: BC subfields chain through every block WITHOUT
    // inflating — the property that makes BGZF a seekable wire
    var p = 0
    var hops = 0
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (p < wire.length) {
      assert((wire(p) & 0xff) === 0x1f && (wire(p + 3) & 0xff) === 4)
      offsets += p
      p += u16(wire, p + 16) + 1 // BSIZE - 1 at the BC subfield value
      hops += 1
    }
    assert(p === wire.length)
    assert(hops === 17, "16 data blocks of 512 + the empty EOF marker")
    // RANDOM ACCESS: inflate ONLY block 2 and compare to the tar slice
    val tar = TarCodec.encodeTar(payload, 100)
    val b2 = offsets(2)
    val xlen = u16(wire, b2 + 10)
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(wire, b2 + 12 + xlen,
      u16(wire, b2 + 16) + 1 - 12 - xlen - 8)
    val got = new Array[Byte](512)
    var k = 0
    while (k < 512) k += inf.inflate(got, k, 512 - k)
    inf.end()
    assert(java.util.Arrays.equals(got,
      java.util.Arrays.copyOfRange(tar, 2 * 512, 3 * 512)),
      "a block must inflate alone — no upstream state, true seek")
    // the EOF marker is MANDATORY: dropping the final (empty) block is
    // the classic truncated-BGZF failure and must be visible
    val lastLen = wire.length - offsets.last
    assert(!TarCodec.decodeTar(wire.dropRight(lastLen), gz = false,
      bgzf = true)._1.valid)
    // a block AFTER the EOF marker is appended garbage
    val extra = wire ++ java.util.Arrays.copyOfRange(wire,
      offsets.last, wire.length)
    assert(!TarCodec.decodeTar(extra, gz = false, bgzf = true)._1.valid)
    // a lying BC hop distance is a visible finding
    val lie = wire.clone()
    lie(16) = ((lie(16) ^ 1) & 0xff).toByte
    assert(!TarCodec.decodeTar(lie, gz = false, bgzf = true)._1.valid)
    // a flipped data byte breaks the block CRC32
    val bad = wire.clone()
    bad(20) = ((bad(20) ^ 1) & 0xff).toByte
    assert(!TarCodec.decodeTar(bad, gz = false, bgzf = true)._1.valid)
  }

  test("engine surface: Multimodal.encodeTar / tarStats / tarMembers") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 30)
    val assets = graft.ext.Multimodal.documentsAsAssets(docs)
    for (gz <- Seq(false, true)) {
      val out = graft.ext.Multimodal.tarStats(
        graft.ext.Multimodal.encodeTar(assets, memberBytes = 100, gz = gz),
        gz = gz).collect()
      assert(out.nonEmpty)
      out.foreach(r => assert(r.getAs[Boolean]("is_valid")))
    }
    val members = graft.ext.Multimodal.tarMembers(
      graft.ext.Multimodal.encodeTar(assets, memberBytes = 100))
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    members.collect().foreach { r =>
      val payload = texts(r.getAs[Long]("asset_id"))
      val i = r.getAs[Long]("member_idx").toInt
      assert(r.getAs[String]("name") === f"doc$i%05d.txt")
      assert(r.getAs[Long]("member_sum") ===
        (i * 100 until (i + 1) * 100).map(payload(_) & 0xff)
          .map(_.toLong).sum)
    }
  }
}
