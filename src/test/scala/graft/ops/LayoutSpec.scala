package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("zValue interleaves bits: column j at position k*i+j") {
    import spark.implicits._
    val out = Seq((3L, 1L), (0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zValue(Seq(col("x"), col("y")), bits = 16).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out((3L, 1L)) === 7L) // x bits at 0,2; y bit at 1 → 0b0111
    assert(out((0L, 0L)) === 0L)
    assert(out((1L, 0L)) === 1L)
    assert(out((0L, 1L)) === 2L)
    assert(out((65535L, 65535L)) === (1L << 32) - 1)
  }

  test("zValueSql mirrors zValue term by term") {
    import spark.implicits._
    val df = Seq((12345L, 54321L), (7L, 99L)).toDF("x", "y")
    df.createOrReplaceTempView("zv_probe")
    val viaSql = spark.sql(
      s"SELECT ${Layout.zValueSql(Seq("x", "y"), 16)} AS z FROM zv_probe")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.select(Layout.zValue(Seq(col("x"), col("y")), 16))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql === viaCol)
  }

  test("writeZOrdered: disjoint per-file z-ranges, narrower per-file extents") {
    import spark.implicits._
    val n = 64 // an 64x64 grid, shuffled order
    val rows = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    val df = scala.util.Random.shuffle(rows).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.writeZOrdered(df, Seq("x", "y"), dir, numFiles = 8, bits = 6)
    val read = spark.read.parquet(dir)
      .withColumn("z", Layout.zValue(Seq(col("x"), col("y")), 6))
      .withColumn("f", input_file_name())
    val files = read.groupBy("f")
      .agg(min("z").as("zlo"), max("z").as("zhi"),
        (max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
      .collect()
    assert(files.length === 8)
    // range partitioning on z ⇒ file z-intervals are pairwise disjoint
    val sorted = files.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    sorted.sliding(2).foreach { case Array((_, hi), (lo, _)) => assert(hi < lo) }
    // locality: every file sees a sub-square, not the full 0..63 extent in
    // both dimensions (a single-column sort would leave y unconstrained)
    files.foreach { r =>
      assert(r.getLong(3) < 63 || r.getLong(4) < 63,
        s"file spans the full grid in both dims: $r")
    }
  }
}
