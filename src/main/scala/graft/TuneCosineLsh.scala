package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: grid-search LSH (planes, tables) for
  * [[graft.ext.Similarity.cosineCandidates]] recall against the exact
  * pair set at threshold 0.35. Usage: runMain graft.TuneCosineLsh [sfDir]
  */
object TuneCosineLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Similarity.cosinePairsAbove(emb, 0.35).select("id_a", "id_b").cache()
    val total = exact.count()
    for ((b, ts) <- Seq(2 -> Seq(16, 20, 24), 3 -> Seq(24, 32)); t <- ts) {
      val t0 = System.nanoTime()
      val cand = Similarity.cosineCandidates(emb, 64, b, t)
      val missed = exact.join(cand, Seq("id_a", "id_b"), "left_anti").count()
      val nc = cand.count()
      println(f"planes=$b tables=$t candidates=$nc missed=$missed/$total " +
        f"time=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
