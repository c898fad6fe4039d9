package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Scratch probe for the bracketed-percentile passes: times each
  * candidate histogram formulation over the preloaded lineitem and
  * prints the executed plan of the slow one, so the "why is a 600k-row
  * hash aggregate 13 µs/row" question is answered by evidence instead
  * of guesswork. Not referenced by any query path.
  */
object PercProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.preload(spark, sfDir, except = Set("documents", "embeddings"))
    val li = Tables.load(spark, sfDir, "lineitem")
    val buckets = 2048

    def time(tag: String)(f: => Unit): Unit = {
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        f
        println(f"[probe] $tag run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    val stats = li.agg(
      count(col("l_quantity")), min(col("l_quantity")).cast("double"),
      max(col("l_quantity")).cast("double"),
      count(col("l_extendedprice")), min(col("l_extendedprice")).cast("double"),
      max(col("l_extendedprice")).cast("double")).head()
    val (mn1, mx1) = (stats.getDouble(1), stats.getDouble(2))
    val (mn2, mx2) = (stats.getDouble(4), stats.getDouble(5))
    def bucketOf(c: String, mn: Double, mx: Double) =
      least(floor((col(c) - lit(mn)) / (lit(mx) - lit(mn)) * buckets)
        .cast("int"), lit(buckets - 1))
    val b1 = bucketOf("l_quantity", mn1, mx1)
    val b2 = bucketOf("l_extendedprice", mn2, mx2)

    time("stats-agg") {
      li.agg(count(col("l_quantity")), min(col("l_quantity")).cast("double"),
        max(col("l_quantity")).cast("double"),
        count(col("l_extendedprice")), min(col("l_extendedprice")).cast("double"),
        max(col("l_extendedprice")).cast("double")).head()
    }

    time("hist-union") {
      Seq(("l_quantity", b1), ("l_extendedprice", b2)).map { case (c, b) =>
        li.where(col(c).isNotNull).select(lit(c).as("hc"), b.as("hb"))
      }.reduce(_ unionAll _)
        .groupBy("hc", "hb").agg(count(lit(1)).as("hn")).collect()
    }

    time("hist-explode-int") {
      li.select(explode(array(
          when(col("l_quantity").isNotNull, b1).otherwise(lit(null).cast("int")),
          when(col("l_extendedprice").isNotNull, b2 + lit(buckets))
            .otherwise(lit(null).cast("int")))).as("hb"))
        .where(col("hb").isNotNull)
        .groupBy("hb").agg(count(lit(1)).as("hn")).collect()
    }

    time("hist-2-aggs-int-key") {
      li.where(col("l_quantity").isNotNull)
        .groupBy(b1.as("hb")).agg(count(lit(1))).collect()
      li.where(col("l_extendedprice").isNotNull)
        .groupBy(b2.as("hb")).agg(count(lit(1))).collect()
    }

    // Is WSCG on? Dump the executed plan of the union formulation.
    val histDf = Seq(("l_quantity", b1), ("l_extendedprice", b2)).map { case (c, b) =>
      li.where(col(c).isNotNull).select(lit(c).as("hc"), b.as("hb"))
    }.reduce(_ unionAll _)
      .groupBy("hc", "hb").agg(count(lit(1)).as("hn"))
    histDf.collect()
    println("==== hist-union executedPlan ====")
    println(histDf.queryExecution.executedPlan.toString.take(4000))

    spark.stop()
  }
}
