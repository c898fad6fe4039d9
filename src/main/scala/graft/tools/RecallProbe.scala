package graft.tools

import org.apache.spark.sql.functions._

/** IVF tuning probe: recall@10 of [[graft.operators.Embeddings.annIvf]]
  * vs brute force on the corpus in `SF_DIR` (default sf0.01) across
  * (nProbe, nAssign) settings. The registered query's parameters
  * (16 cells, 5 probes, 3-assign → recall 0.93 on the driver corpus)
  * were chosen with this harness; re-run it when the corpus or the
  * quantizer changes. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.01")
    import spark.implicits._
    val emb = graft.Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = graft.operators.Embeddings.knnBrute(emb, queries, k = 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((np, na) <- Seq((3, 1), (5, 3), (6, 3))) {
      val ivf = graft.operators.Embeddings.annIvf(emb, col("vec_id") < 10, k = 10,
        nCentroids = 16, nProbe = np, nAssign = na)
        .select("q_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exact.map { case (q, t) => t.count(ivf.getOrElse(q, Set.empty).contains).toDouble / t.size }
      println(f"## nProbe=$np nAssign=$na recall=${rs.sum / rs.size}%.3f")
    }
    spark.stop()
  }
}
