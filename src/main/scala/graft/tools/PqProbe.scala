package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.Embeddings

/** One-off measurement: PQ recall@10 vs brute force and mean
  * reconstruction cosine on the driver corpus — run to SET the spec
  * bar, keep so the number is reproducible. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // materialize the brute-force truth ONCE, outside the timed loop —
    // recallAt collects its inputs, and an uncached plan would re-run
    // the exact search inside every (m, k) timing
    val exact = Embeddings.knnBrute(emb, queries, k = 10).cache()
    exact.count()
    for (m <- Seq(8, 16); k <- Seq(16, 64)) {
      val t0 = System.nanoTime()
      val recall = Embeddings.recallAt(exact,
        Embeddings.annPq(emb, col("vec_id") < 10, k = 10, m = m, codebookSize = k))
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[pqprobe] m=$m k=$k recall@10=$recall%.3f t=$t%.1fs")
    }
    exact.unpersist()
    spark.stop()
  }
}
