package graft

/** End-to-end CLI coverage: every curation flag drives [[Main.run]] on the
  * shared test session against the sf0.001 lake and must print its report
  * — the surface-parity check that the engine's own capabilities are
  * reachable from the command line, not only from the API.
  */
class CliSpec extends SparkSpec {

  private def runCli(flags: String*): String = {
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      Main.run(spark, (sf0001 +: flags).toArray)
    }
    buf.toString("UTF-8")
  }

  test("--epoch-plan prints per-source repeat factors under the token budget") {
    val out = runCli("--epoch-plan", "100000")
    assert(out.contains("epoch plan"), "header missing")
    assert(out.contains("repeat_fp") || out.contains("n_tokens"),
      s"epoch-plan table missing from output:\n${out.takeRight(500)}")
    assert(out.contains("src"), "per-source rows missing")
  }

  test("--admit prints per-source admitted counts under the quota") {
    val out = runCli("--admit", "5")
    assert(out.contains("quota admission"), "header missing")
    assert(out.contains("n_admitted"), "admission summary missing")
    assert(out.contains("src"), "per-source rows missing")
  }

  test("--leakage-safe-split prints the three-way split summary") {
    val out = runCli("--leakage-safe-split")
    assert(out.contains("leakage-safe split"), "header missing")
    Seq("train", "val", "test").foreach(s =>
      assert(out.contains(s), s"split '$s' missing from summary"))
  }

  test("--cap-sources prints the concentration verdict and the cap plan") {
    val out = runCli("--cap-sources", "100000")
    assert(out.contains("source concentration"), "header missing")
    assert(out.contains("hhi_fp"), "concentration row missing")
    assert(out.contains("cap_tokens"), "cap plan missing")
  }

  test("--change-points prints per-type CUSUM peaks") {
    val out = runCli("--change-points")
    assert(out.contains("rate change points"), "header missing")
    assert(out.contains("d_num"), "change-point rows missing")
  }

  test("--shard-balance prints every shard including deviations") {
    val out = runCli("--shard-balance", "8")
    assert(out.contains("shard balance audit (8 shards"), "header missing")
    assert(out.contains("dev_num"), "deviation column missing")
  }

  test("--source-concentration prints the one-row HHI verdict") {
    val out = runCli("--source-concentration")
    assert(out.contains("source concentration"), "header missing")
    assert(out.contains("hhi_fp") && out.contains("top_share_fp"),
      "concentration fields missing")
  }

  test("--audience-overlap prints per-type-pair user intersections") {
    val out = runCli("--audience-overlap")
    assert(out.contains("audience overlap"), "header missing")
    assert(out.contains("jaccard_fp") && out.contains("n_common"),
      "overlap fields missing")
  }

  test("--packing-curve prints per-capacity layout costs") {
    val out = runCli("--packing-curve")
    assert(out.contains("packing-capacity curve"), "header missing")
    assert(out.contains("n_straddle") && out.contains("wasted_tokens"),
      "curve columns missing")
  }

  test("--contamination-spans prints longest verbatim runs vs the bench dir") {
    // self-compare: every doc trivially contains its own grams, so the
    // report is non-empty and the island machinery runs end-to-end
    val out = runCli("--contamination-spans", sf0001)
    assert(out.contains("contaminated spans vs"), "header missing")
    assert(out.contains("longest_run") && out.contains("longest_start"),
      "island columns missing")
  }

  test("--mask-contamination prints the per-doc masking manifest") {
    // self-compare: every doc's grams hit the "benchmark", so every doc
    // with >= 3 tokens is fully masked and shows in the manifest
    val out = runCli("--mask-contamination", sf0001)
    assert(out.contains("contamination masking manifest vs"), "header missing")
    assert(out.contains("n_masked") && out.contains("masked_md5"),
      "manifest columns missing")
  }

  test("--shared-runs prints winnow-anchored exact shared runs") {
    val out = runCli("--shared-runs")
    assert(out.contains("exact longest shared token runs"), "header missing")
    assert(out.contains("longest_tokens") && out.contains("n_gram_matches"),
      "run columns missing")
  }

  test("--tokenizer-economics prints per-source cost ratios") {
    val out = runCli("--tokenizer-economics")
    assert(out.contains("tokenizer economics"), "header missing")
    assert(out.contains("bytes_per_token_fp") && out.contains("fertility_fp"),
      "ratio columns missing")
    assert(out.contains("src"), "per-source rows missing")
  }

  test("--dup-kcore prints the peeled core (header even when empty at sf0.001)") {
    val out = runCli("--dup-kcore", "2")
    assert(out.contains("2-core of the near-dup graph"), "header missing")
    assert(out.contains("core_degree"), "degree column missing")
  }

  test("--card and --search still reach their reports through run()") {
    val out = runCli("--card", "--search", "table,key")
    assert(out.contains("dataset card"))
    assert(out.contains("top documents for [table, key]"))
    assert(out.contains("score_num"), "tf-idf scores missing")
  }

  test("--image-near-dups prints the dHash pair report (header even when empty)") {
    val out = runCli("--image-near-dups", "6")
    assert(out.contains("perceptual near-dup image pairs"), "header missing")
    assert(out.contains("hamming"), "distance column missing")
  }

  test("--scene-cuts prints the per-asset frame-luma cut report") {
    val out = runCli("--scene-cuts", "5000")
    assert(out.contains("video scene cuts"), "header missing")
    assert(out.contains("delta_milli"), "delta column missing")
  }

  test("--qoi-economics prints per-source compression ratios") {
    val out = runCli("--qoi-economics")
    assert(out.contains("QOI compression economics"), "header missing")
    assert(out.contains("compression_micro") && out.contains("ops_run"),
      "economics columns missing")
    assert(out.contains("source"), "per-source rows missing")
  }

  test("--jpeg-stats prints the Huffman-decoded lossless-JPEG report") {
    val out = runCli("--jpeg-stats")
    assert(out.contains("lossless-JPEG decode stats"), "header missing")
    assert(out.contains("mean_v_milli") && out.contains("predictor"),
      "decode columns missing")
    assert(out.contains("true"), "no asset decoded as valid")
  }

  test("--jpeg-dct-stats prints the baseline-DCT decode report") {
    val out = runCli("--jpeg-dct-stats")
    assert(out.contains("baseline-DCT JPEG decode stats"), "header missing")
    assert(out.contains("mean_v_milli") && out.contains("n_blocks"),
      "decode columns missing")
    assert(out.contains("true"), "no asset decoded as valid")
  }

  test("--png-stats prints the entropy-coded decode report") {
    val out = runCli("--png-stats")
    assert(out.contains("PNG decode stats"), "header missing")
    assert(out.contains("mean_luma_milli") && out.contains("idat_bytes"),
      "decode columns missing")
    assert(out.contains("true"), "no asset decoded as valid")
  }

  test("--stream-hourly runs the exactly-once path on BOTH state stores") {
    // the RocksDB run is the 100 TB state path (disk-backed state store)
    // promoted to the CLI; both providers must produce the identical
    // hourly aggregation — the provider changes WHERE state lives, not
    // what it holds
    def rows(out: String): Long =
      "rows written: (\\d+)".r.findFirstMatchIn(out).map(_.group(1).toLong)
        .getOrElse(-1L)
    val tmpR = java.nio.file.Files.createTempDirectory("cli_stream_rocks")
    val outR = runCli("--stream-hourly", tmpR.toString,
      "--state-store", "rocksdb")
    assert(outR.contains("state store: RocksDBStateStoreProvider"),
      "the RocksDB provider must be routed and announced")
    assert(rows(outR) > 0, s"no rows written under rocksdb:\n$outR")
    val tmpH = java.nio.file.Files.createTempDirectory("cli_stream_hdfs")
    val outH = runCli("--stream-hourly", tmpH.toString)
    assert(outH.contains("state store: HDFSBackedStateStoreProvider"))
    assert(rows(outH) === rows(outR),
      "both providers must aggregate to the same row count")
    // and the session provider is restored after the scoped run
    assert(spark.conf.getOption(
      graft.streaming.StateBackend.ProviderKey).isEmpty ||
      !spark.conf.get(graft.streaming.StateBackend.ProviderKey)
        .contains("RocksDB"))
    // an unknown provider is a usage error, not a silent default
    val tmpX = java.nio.file.Files.createTempDirectory("cli_stream_bad")
    intercept[IllegalArgumentException] {
      runCli("--stream-hourly", tmpX.toString, "--state-store", "memory")
    }
  }
}
