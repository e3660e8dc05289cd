package graft.functions

import graft.SparkSpec

/** ZIP codec conformance (E270, the public PKWARE APPNOTE layout): the
  * q318/q319 oracle pins the member arithmetic; this spec pins the
  * directory discipline — local/central agreement, exact member tiling,
  * CRC-32 verification on both methods, and every reject path.
  */
class ZipCodecSpec extends SparkSpec {

  private def fixture(n: Int, seed: Int): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)((rng.nextInt(256) - 128).toByte)
  }

  test("stored and deflate wires are one member identity") {
    val payload = fixture(6 * 100 + 41, 81) // 6 whole members
    val expSum = (0 until 600).map(payload(_) & 0xff).map(_.toLong).sum
    val expIv = (0 until 6).map { i =>
      i.toLong * (i * 100 until (i + 1) * 100)
        .map(payload(_) & 0xff).map(_.toLong).sum
    }.sum
    for (deflate <- Seq(false, true)) {
      val zip = ZipCodec.encodeZip(payload, 100, deflate)
      assert(zip !== null)
      val (d, members) = ZipCodec.decodeZip(zip, collect = true)
      assert(d.valid, s"deflate=$deflate")
      assert(d.nMembers === 6L)
      assert(d.contentBytes === 600L)
      assert((d.sumPayload, d.sumIv) === ((expSum, expIv)),
        s"deflate=$deflate: the directory walk must be the identity")
      assert(members.map(_.name) === (0 until 6).map(i => f"doc$i%05d.txt"))
      assert(java.util.Arrays.equals(
        members.flatMap(_.bytes).toArray, payload.take(600)),
        "extracted members must reassemble the document bytes")
    }
    // the deflate wire is really smaller on compressible members
    val text = Array.fill(1200)('z'.toByte)
    assert(ZipCodec.encodeZip(text, 100, deflate = true).length <
      ZipCodec.encodeZip(text, 100, deflate = false).length)
    // no full member fits
    assert(ZipCodec.encodeZip(fixture(99, 82), 100) === null)
  }

  test("directory discipline: agreement, tiling, CRC, EOCD bounds") {
    val payload = fixture(3 * 100, 83)
    val zip = ZipCodec.encodeZip(payload, 100, deflate = false)
    assert(ZipCodec.decodeZip(zip)._1.valid)
    def u32at(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    val eocd = zip.length - 22
    assert(u32at(zip, eocd) === 0x06054b50L)
    val cdOffset = u32at(zip, eocd + 16).toInt
    // a flipped data byte breaks the member's CRC-32 (stored: sizes
    // still agree, only the hash catches it)
    val corrupt = zip.clone(); corrupt(30 + 12 + 50) =
      (corrupt(30 + 12 + 50) ^ 1).toByte
    assert(!ZipCodec.decodeZip(corrupt)._1.valid, "CRC-32 must be verified")
    // central CRC edited to match nothing: local/central disagreement
    val disagree = zip.clone()
    disagree(cdOffset + 16) = (disagree(cdOffset + 16) ^ 1).toByte
    assert(!ZipCodec.decodeZip(disagree)._1.valid,
      "a central entry must agree with its local header")
    // EOCD count lies
    val badCount = zip.clone(); badCount(eocd + 8) = 2
    assert(!ZipCodec.decodeZip(badCount)._1.valid)
    // a local-header offset pointing PAST its true place (a gap a
    // smuggled byte range would hide in) — entry 1's offset field
    val entrySize = 46 + 12 // fixed central part + "docNNNNN.txt"
    val offSlot = cdOffset + entrySize + 42
    val gap = zip.clone()
    gap(offSlot) = (gap(offSlot) & 0xff | 1).toByte
    assert(!ZipCodec.decodeZip(gap)._1.valid,
      "members must tile [0, cdOffset) exactly in directory order")
    // truncation anywhere dies visibly
    assert(!ZipCodec.decodeZip(zip.dropRight(1))._1.valid)
    assert(!ZipCodec.decodeZip(zip.take(40))._1.valid)
    // trailing bytes after the EOCD
    assert(!ZipCodec.decodeZip(zip :+ 0.toByte)._1.valid)
    // an encrypted/descriptor flag is out of scope: visible reject
    // (flags live at local +6 and central +8; set BOTH so they agree —
    // the flag audit itself must fire, not the agreement audit)
    val flagged = zip.clone()
    flagged(6) = 1; flagged(cdOffset + 8) = 1
    assert(!ZipCodec.decodeZip(flagged)._1.valid)
  }

  test("deflate strictness: declared sizes bound the inflation") {
    val payload = fixture(2 * 100, 84)
    val zip = ZipCodec.encodeZip(payload, 100, deflate = true)
    assert(ZipCodec.decodeZip(zip)._1.valid)
    def u16at(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    // shrink member 0's compSize in BOTH headers: the stream no longer
    // consumes exactly the declared bytes
    val eocd = zip.length - 22
    val cdOffset = ((zip(eocd + 16) & 0xff) | ((zip(eocd + 17) & 0xff) << 8) |
      ((zip(eocd + 18) & 0xff) << 16)).toInt
    val short = zip.clone()
    val comp0 = u16at(zip, 18)
    short(18) = ((comp0 - 1) & 0xff).toByte
    short(19) = (((comp0 - 1) >> 8) & 0xff).toByte
    short(cdOffset + 20) = short(18)
    short(cdOffset + 21) = short(19)
    assert(!ZipCodec.decodeZip(short)._1.valid,
      "a lying compressed size is a visible finding")
  }

  private def u32at(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def putU32(b: Array[Byte], o: Int, v: Long): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >>> 8) & 0xff).toByte
    b(o + 2) = ((v >>> 16) & 0xff).toByte; b(o + 3) = ((v >>> 24) & 0xff).toByte
  }

  test("zip64 wire (E275): same member identity, agreement audited") {
    val payload = fixture(3 * 100 + 17, 85)
    val plain = ZipCodec.decodeZip(ZipCodec.encodeZip(payload, 100))._1
    val zip = ZipCodec.encodeZip(payload, 100, zip64 = true)
    // the indirection changes the wire, never the members
    assert(ZipCodec.decodeZip(zip)._1 === plain.copy())
    assert(zip.length > ZipCodec.encodeZip(payload, 100).length,
      "the zip64 chain really is on the wire")
    val eocd = zip.length - 22
    val loc = eocd - 20
    val r = loc - 56
    assert(u32at(zip, loc) === 0x07064b50L)
    assert(u32at(zip, r) === 0x06064b50L)
    // locator signature flipped: the chain must be walked, not guessed
    val badLoc = zip.clone(); badLoc(loc) = (badLoc(loc) ^ 1).toByte
    assert(!ZipCodec.decodeZip(badLoc)._1.valid)
    // a non-empty extensible data sector is a smuggling spot
    val fat = zip.clone(); fat(r + 4) = 45
    assert(!ZipCodec.decodeZip(fat)._1.valid)
    // a NON-sentinel EOCD field must AGREE with the EOCD64 record
    val agree = zip.clone()
    agree(eocd + 8) = 3; agree(eocd + 9) = 0
    agree(eocd + 10) = 3; agree(eocd + 11) = 0
    assert(ZipCodec.decodeZip(agree)._1.valid,
      "a real count beside zip64 sizes is spec-legal when it agrees")
    val lie = zip.clone()
    lie(eocd + 8) = 4; lie(eocd + 9) = 0
    lie(eocd + 10) = 4; lie(eocd + 11) = 0
    assert(!ZipCodec.decodeZip(lie)._1.valid)
    // central 0x0001 whose length disagrees with the sentinel count
    val cdOffset = (r - 3 * (46 + 12 + 28)).toLong
    val short = zip.clone()
    short(cdOffset.toInt + 46 + 12 + 2) = 16 // dataSize 24 → 16
    assert(!ZipCodec.decodeZip(short)._1.valid)
    // truncation anywhere still dies visibly
    assert(!ZipCodec.decodeZip(zip.dropRight(1))._1.valid)
  }

  test("descriptor wire (E276): streaming writers decode, lies reject") {
    val payload = fixture(3 * 100, 86)
    val plain = ZipCodec.decodeZip(ZipCodec.encodeZip(payload, 100))._1
    for (deflate <- Seq(false, true)) {
      val zip = ZipCodec.encodeZip(payload, 100, deflate = deflate,
        descriptor = true)
      assert(ZipCodec.decodeZip(zip)._1 === plain.copy(),
        s"deflate=$deflate: the descriptor wire is the same identity")
    }
    val zip = ZipCodec.encodeZip(payload, 100, descriptor = true)
    // member 0: local 30+12, data 100, descriptor at 142
    assert(u32at(zip, 142) === 0x08074b50L)
    // local CRC/sizes really are zeroed on this wire
    assert(u32at(zip, 14) === 0L && u32at(zip, 18) === 0L &&
      u32at(zip, 22) === 0L)
    // descriptor signature flipped: flag bit 3 promises a descriptor
    val noSig = zip.clone(); noSig(142) = (noSig(142) ^ 1).toByte
    assert(!ZipCodec.decodeZip(noSig)._1.valid)
    // descriptor CRC disagreeing with the central entry
    val badCrc = zip.clone(); badCrc(146) = (badCrc(146) ^ 1).toByte
    assert(!ZipCodec.decodeZip(badCrc)._1.valid)
    // flag bit 3 forced onto the PLAIN wire: local sizes are non-zero
    val plainZip = ZipCodec.encodeZip(payload, 100)
    val eocd = plainZip.length - 22
    val cdOffset = u32at(plainZip, eocd + 16).toInt
    val forced = plainZip.clone()
    forced(6) = 8; forced(cdOffset + 8) = 8
    assert(!ZipCodec.decodeZip(forced)._1.valid)
  }

  test("combined zip64+descriptor wire (E289): u64 descriptors decode") {
    val payload = fixture(3 * 100 + 7, 87)
    val plain = ZipCodec.decodeZip(ZipCodec.encodeZip(payload, 100))._1
    for (deflate <- Seq(false, true)) {
      val zip = ZipCodec.encodeZip(payload, 100, deflate = deflate,
        zip64 = true, descriptor = true)
      assert(ZipCodec.decodeZip(zip)._1 === plain.copy(),
        s"deflate=$deflate: the combined wire is the same member identity")
    }
    val zip = ZipCodec.encodeZip(payload, 100, zip64 = true,
      descriptor = true)
    // member 0: local 30 + name 12 + extra 20, data 100 -> descriptor
    // at 162, and it is the WIDE 24-byte shape (u64 sizes)
    assert(u32at(zip, 162) === 0x08074b50L)
    assert(u32at(zip, 14) === 0L, "streaming: local CRC unknown")
    assert(u32at(zip, 18) === 0xffffffffL && u32at(zip, 22) === 0xffffffffL,
      "local sizes are zip64 sentinels on the combined wire")
    // the local 0x0001 extra (id+len at 42..45, value at 46..61)
    // carries PLACEHOLDER zeros — real values would contradict streaming
    assert(u32at(zip, 42) === (1L | (16L << 16)))
    assert((46 until 62).forall(zip(_) == 0))
    // u64 descriptor sizes: comp at +8 (100, stored), uncomp at +16
    assert(u32at(zip, 162 + 8) === 100L && u32at(zip, 162 + 12) === 0L)
    assert(u32at(zip, 162 + 16) === 100L && u32at(zip, 162 + 20) === 0L)
    // a lying u64 descriptor size is a visible finding
    val badSize = zip.clone(); badSize(162 + 9) = 1
    assert(!ZipCodec.decodeZip(badSize)._1.valid)
    // a NARROW (16-byte) descriptor under a local zip64 extra desyncs
    // the member tiling — the next local header is not where the
    // directory says it is
    val narrow = zip.take(162 + 8) ++
      zip.slice(162 + 8, 162 + 12) ++ zip.slice(162 + 16, 162 + 20) ++
      zip.drop(162 + 24)
    assert(!ZipCodec.decodeZip(narrow)._1.valid)
  }

  test("UTF-8 names (E300): flag bit 11 decodes, other bits still reject") {
    val payload = fixture(3 * 100, 88)
    val plain = ZipCodec.decodeZip(ZipCodec.encodeZip(payload, 100))._1
    // a non-ASCII prefix turns on the language-encoding flag; the
    // member identity is unchanged (names are metadata)
    val zip = ZipCodec.encodeZip(payload, 100, namePrefix = "документ-")
    val (d, members) = ZipCodec.decodeZip(zip, collect = true)
    assert(d.valid && d === plain.copy())
    assert(members.map(_.name) ===
      (0 until 3).map(i => f"документ-$i%05d.txt"),
      "bit-11 names must decode as UTF-8, not mojibake")
    // the flag really is set in BOTH header copies
    def u16at(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    assert((u16at(zip, 6) & 0x800) === 0x800)
    // UTF-8 composes with the streaming-descriptor wire (bits 3 + 11)
    val both = ZipCodec.encodeZip(payload, 100, deflate = true,
      descriptor = true, namePrefix = "папка-")
    assert(ZipCodec.decodeZip(both)._1 === plain.copy())
    // any OTHER flag bit (crypto bit 0) stays a visible reject: patch
    // both the central and local copies so the flag audit itself fires
    val eocd = zip.length - 22
    val cdOff = ((zip(eocd + 16) & 0xff) | ((zip(eocd + 17) & 0xff) << 8) |
      ((zip(eocd + 18) & 0xff) << 16)).toInt
    val crypt = zip.clone()
    crypt(6) = (crypt(6) | 1).toByte
    crypt(cdOff + 8) = (crypt(cdOff + 8) | 1).toByte
    assert(!ZipCodec.decodeZip(crypt)._1.valid)
  }

  test("member seek table (E280): data spans are real random-access reads") {
    val payload = fixture(4 * 100 + 7, 88)
    // stored wire: seeking [data_offset, +comp_size) IS the member
    val zip = ZipCodec.encodeZip(payload, 100)
    val (_, ms) = ZipCodec.decodeZip(zip, collect = true)
    assert(ms.map(_.dataOff) === (0 until 4).map(k => k * 142L + 42L))
    assert(ms.forall(m => m.compSize === 100L && m.method === 0))
    ms.foreach { m =>
      val seek = java.util.Arrays.copyOfRange(zip, m.dataOff.toInt,
        (m.dataOff + m.compSize).toInt)
      assert(java.util.Arrays.equals(seek, m.bytes),
        s"member ${m.idx}: the directory must be a usable seek table")
    }
    // deflate wire: inflating ONLY the seeked span yields the member —
    // the read path a loader takes into a large archive
    val dz = ZipCodec.encodeZip(payload, 100, deflate = true)
    val (_, dms) = ZipCodec.decodeZip(dz, collect = true)
    dms.foreach { m =>
      assert(m.method === 8)
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(dz, m.dataOff.toInt, m.compSize.toInt)
      val buf = new Array[Byte](m.size.toInt)
      var got = 0
      while (got < buf.length) got += inf.inflate(buf, got, buf.length - got)
      inf.end()
      assert(java.util.Arrays.equals(buf, m.bytes),
        s"member ${m.idx}: the deflate span must inflate to the member")
    }
  }

  test("extra areas tile strictly; unknown ids are skipped, not rejected") {
    val payload = fixture(3 * 100, 87)
    val zip = ZipCodec.encodeZip(payload, 100)
    val eocd = zip.length - 22
    val cdOffset = u32at(zip, eocd + 16).toInt
    // splice an Info-ZIP-style UT extra (id 0x5455) into entry 0
    val insertAt = cdOffset + 46 + 12
    val extra = Array[Byte](0x55, 0x54, 4, 0, 1, 2, 3, 4)
    val out = zip.take(insertAt) ++ extra ++ zip.drop(insertAt)
    out(cdOffset + 30) = 8 // entry 0 extraLen
    val newEocd = eocd + 8
    putU32(out, newEocd + 12, u32at(zip, eocd + 12) + 8) // cdSize
    assert(ZipCodec.decodeZip(out)._1.valid,
      "a well-formed unknown extra (UT/ux) must not false-invalidate")
    assert(ZipCodec.decodeZip(out)._1 ===
      ZipCodec.decodeZip(zip)._1.copy())
    // a field whose declared size overruns the area is a visible reject
    val overrun = out.clone(); overrun(insertAt + 2) = 5
    assert(!ZipCodec.decodeZip(overrun)._1.valid)
  }

  test("engine surface: Multimodal.encodeZip / zipStats on real documents") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 30)
    val assets = graft.ext.Multimodal.documentsAsAssets(docs)
    for ((deflate, zip64, desc) <- Seq((false, false, false),
        (true, false, false), (false, true, false), (true, false, true),
        (true, true, true))) {
      val out = graft.ext.Multimodal.zipStats(
        graft.ext.Multimodal.encodeZip(assets, memberBytes = 100,
          deflate = deflate, zip64 = zip64, descriptor = desc)).collect()
      assert(out.nonEmpty)
      out.foreach(r => assert(r.getAs[Boolean]("is_valid")))
    }
  }
}
