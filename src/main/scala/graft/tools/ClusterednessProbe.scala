package graft.tools

import org.apache.spark.sql.functions._

/** Calibration harness for [[graft.operators.Embeddings.probeClusteredness]]
  * — prints the probe metrics (occupancy entropy, tightness, top1−top2
  * margin) for the corpora [[graft.operators.Embeddings.annAuto]] must
  * separate: the driver's uniform-ish embeddings tables (IVF recall
  * 0.74 at auto geometry → sketch territory) and the synthesized
  * clustered mixture from IvfAutoProbe (recall 1.0 → IVF territory).
  * The routing cut in annAuto is the documented midpoint of what this
  * prints; re-run when the corpus generator or the quantizer changes. */
object ClusterednessProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = graft.GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def report(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val c = graft.operators.Embeddings.probeClusteredness(df)
      println(f"""{"corpus":"$tag","n_lists":${c.nLists},"sample":${c.sampleRows},"entropy":${c.occupancyEntropy}%.4f,"tightness":${c.tightness}%.4f,"margin":${c.margin}%.4f}""")
      graft.Caches.release(spark)
    }

    for (sf <- Seq("sf0.01", "sf0.1"))
      report(s"driver_$sf",
        graft.Tables.load(spark, s"/root/testdata/$sf", "embeddings")
          .select("vec_id", "embedding"))

    // same generators as IvfAutoProbe: hash-uniform vs 1000-center mixture
    val uniform = spark.range(0, rows, 1, 16).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), j -> CAST(pmod(xxhash64(vec_id, j), 2000) / 1000.0 - 1.0 AS FLOAT))")
        .as("embedding"))
    report(s"uniform_$rows", uniform)

    val clustered = spark.range(0, rows, 1, 16).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 63), j -> CAST(
             |  pmod(xxhash64(pmod(vec_id, 1000), j), 2000) / 1000.0 - 1.0
             |  + (pmod(xxhash64(vec_id, j), 200) / 1000.0 - 0.1) AS FLOAT))""".stripMargin)
        .as("embedding"))
    report(s"clustered_$rows", clustered)

    // the spec's 10-cluster fixture shape (radius 0.15 around ±1 cube)
    import spark.implicits._
    var seed = 7L
    def rnd(): Double = { seed = seed * 6364136223846793005L + 1442695040888963407L; ((seed >>> 33).toInt % 2000) / 1000.0 - 1.0 }
    val centroids = Seq.fill(10)(Array.fill(32)(rnd()))
    val vecs = for { c <- 0 until 10; m <- 0 until 20 }
      yield (c * 20L + m, centroids(c).map(x => (x + rnd() * 0.15).toFloat))
    report("spec_fixture_200", vecs.toDF("vec_id", "embedding"))

    spark.stop()
  }
}
