package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.Embeddings

/** Bar-setting probe for the PCA retrieval spec: recall@10 of the
  * PCA-d exact kNN vs full-dim, vs the raw prefix-d baseline, plus
  * captured variance — measured, not guessed. */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = Embeddings.knnBrute(emb, queries, k = 10)
    for (d <- Seq(8, 16, 32)) {
      val pca = Embeddings.embedPca(spark, dir, d)
      val prefix = Embeddings.embedMatryoshka(spark, dir, d)
      println(f"d=$d%2d pcaRecall=${Embeddings.recallAt(exact, pca)}%.3f " +
        f"prefixRecall=${Embeddings.recallAt(exact, prefix)}%.3f " +
        f"varCaptured=${Embeddings.pcaVarianceCaptured(emb, d)}%.3f")
    }
    spark.stop()
  }
}
