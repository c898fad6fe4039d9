package graft.tools

import org.apache.spark.sql.functions._

/** IVF tuning probe: recall@10 of [[graft.operators.Embeddings.annIvf]]
  * vs brute force on the corpus in `SF_DIR` (default sf0.01) across
  * (nProbe, nAssign) settings. The registered query's parameters
  * (16 cells, 5 probes, 3-assign → recall 0.93 on the driver corpus)
  * were chosen with this harness; re-run it when the corpus or the
  * quantizer changes. */
/** Recall + scanned-fraction measurement for the AUTO IVF geometry
  * (nCentroids = 0 → 4·√n lists clamped to [10, 4096], nProbe = 0 →
  * nlist/16) at BigBenchLlm scale — the evidence that the auto-sizing
  * rule actually holds recall while scanning a vanishing fraction of
  * the corpus at 10M vectors, not just at the sf-corpus scale the
  * spec pins (EmbeddingsSpec's ≥0.8 floor). Reuses (or synthesizes)
  * the `target/bigbench/llm_<rows>` embeddings; emits one JSON line
  * for BIGBENCH.md: auto nlist/nprobe, recall@10 vs brute force over
  * 10 queries, and the measured scanned fraction (posting rows in
  * probed cells ÷ corpus rows, mean over queries). */
object IvfAutoProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    // 2nd arg "clustered": mixture corpus — 1000 hash-derived centers,
    // each vector = its center + 10%-scale hash noise. IVF's regime:
    // the quantizer cells align with real structure, vs the default
    // hash-uniform corpus where near neighbors scatter across cells
    // (the documented IVF worst case; annSketch's regime).
    val clustered = args.lift(1).contains("clustered")
    val dir =
      if (clustered) s"target/bigbench/llm_clustered_$rows"
      else s"target/bigbench/llm_$rows"
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    if (!new java.io.File(s"$dir/embeddings.parquet/_SUCCESS").exists()) {
      val emb =
        if (clustered)
          expr("""transform(sequence(0, 63), j -> CAST(
                 |  pmod(xxhash64(pmod(vec_id, 1000), j), 2000) / 1000.0 - 1.0
                 |  + (pmod(xxhash64(vec_id, j), 200) / 1000.0 - 0.1) AS FLOAT))""".stripMargin)
        else
          expr("transform(sequence(0, 63), j -> CAST(pmod(xxhash64(vec_id, j), 2000) / 1000.0 - 1.0 AS FLOAT))")
      spark.range(0, rows, 1, 32).select(col("id").as("vec_id"),
        emb.as("embedding"),
        pmod(col("id"), lit(64)).cast("int").as("label"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

    def timeIt[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (exact, tBrute) = timeIt(
      graft.operators.Embeddings.knnBrute(emb, queries, k = 10)
        .select("q_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap)
    val (ivf, tIvf) = timeIt(
      graft.operators.Embeddings.annIvf(emb, col("vec_id") < 10, k = 10)
        .select("q_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap)
    val rs = exact.map { case (q, t) =>
      t.count(ivf.getOrElse(q, Set.empty).contains).toDouble / t.size }
    val recall = rs.sum / rs.size

    // scanned fraction: replay the same deterministic fit (fitKmeans is
    // hash-sampled and seeded by the data itself, so these centroids
    // equal the ones annIvf memoized) and sum posting-list sizes over
    // each query's probed cells
    val nLists = math.min(4096L, math.max(10L,
      4L * math.round(math.sqrt(n.toDouble)))).toInt
    val probes = math.max(3, nLists / 16)
    val cents = graft.operators.Embeddings.fitKmeans(emb, nLists, 4)
    val cellSizes = emb.select(
        element_at(graft.operators.Embeddings.nearestCids(cents, 1), 1).as("cid"))
      .groupBy("cid").agg(count(lit(1)).as("sz"))
    val probed = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"),
        explode(graft.operators.Embeddings.nearestCids(cents, probes)).as("cid"))
    val scannedPerQ = probed.join(cellSizes, "cid")
      .groupBy("q_id").agg(sum("sz").as("scanned"))
      .agg(avg("scanned")).as[Double].head()
    val frac = scannedPerQ / n
    println(s"""{"rows":$rows,"corpus":"${if (clustered) "clustered" else "uniform"}","nlist_auto":$nLists,"nprobe_auto":$probes,"recall_at_10":${f"$recall%.3f"},"scanned_fraction":${f"$frac%.4f"},"brute_s":${f"$tBrute%.3f"},"ivf_s":${f"$tIvf%.3f"}}""")
    spark.stop()
  }
}

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
