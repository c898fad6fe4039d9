package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Embeddings

/** Bar-setting probe for the learned-retrieval recall GATES
  * (embed_ann_ivf / embed_pq / embed_ann_ivfpq / embed_pca): prints
  * the mean recall@10 of each registered configuration vs brute force
  * on each driver corpus scale, so the gates' thresholds are chosen
  * with measured margin rather than guessed. Run:
  * `sbt "runMain graft.tools.GateProbe /root/testdata/sf0.001 ..."`. */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val emb = graft.Tables.load(spark, dir, "embeddings")
        .select("vec_id", "embedding")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val exact = Embeddings.knnBrute(emb, queries, k = 10)
      val ivf = Embeddings.annIvf(emb, col("vec_id") < 10, k = 10,
        nCentroids = 16, nProbe = 5, nAssign = 3)
      val pq = Embeddings.annPq(emb, col("vec_id") < 10, k = 10)
      val ivfpq = Embeddings.annIvfPq(emb, col("vec_id") < 10, k = 10,
        nCentroids = 16, nProbe = 5, nAssign = 3)
      val pca = graft.operators.Embeddings.embedPca(spark, dir)
      println(f"## $dir n=${emb.count()}")
      println(f"  ivf   recall=${Embeddings.recallAt(exact, ivf)}%.3f")
      println(f"  pq    recall=${Embeddings.recallAt(exact, pq)}%.3f")
      println(f"  ivfpq recall=${Embeddings.recallAt(exact, ivfpq)}%.3f")
      println(f"  pca16 recall=${Embeddings.recallAt(exact, pca)}%.3f")
      println("  gate ivf:   " + Embeddings.embedAnnIvfGate(spark, dir).collect().mkString)
      println("  gate pq:    " + Embeddings.embedPqGate(spark, dir).collect().mkString)
      println("  gate ivfpq: " + Embeddings.embedAnnIvfPqGate(spark, dir).collect().mkString)
      println("  gate pca:   " + Embeddings.embedPcaGate(spark, dir).collect().mkString)
      // dHash background separation: exact all-pairs min Hamming among
      // NON-planted image pairs (the bar multimodal_dedup_phash's
      // maxHamming must sit strictly under)
      val sigs = graft.operators.Multimodal.phashSigs(spark, dir)
        .filter(col("doc_id") < 10000000L)
      val ph = sigs.as("a").join(sigs.as("b"),
          col("a.doc_id") < col("b.doc_id"))
        .select(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("h"))
        .agg(min("h"), count(lit(1))).collect()
      println("  phash background (min hamming, n pairs): " + ph.mkString)
      // aHash background separation: same bar for the audio row
      val asigs = graft.operators.Multimodal.ahashSigs(spark, dir)
        .filter(col("doc_id") < 10000000L)
      val ah = asigs.as("a").join(asigs.as("b"),
          col("a.doc_id") < col("b.doc_id"))
        .select(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("h"))
        .agg(min("h"), count(lit(1))).collect()
      println("  ahash background (min hamming, n pairs): " + ah.mkString)
    }
    spark.stop()
  }
}
