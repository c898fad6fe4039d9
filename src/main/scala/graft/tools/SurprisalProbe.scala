package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession

/** One-off: stage-level timing of text_surprisal on a BigBenchLlm
  * corpus — chasing the 4M superlinearity. */
object SurprisalProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.getOrElse("1000000")
    val dir = s"target/bigbench/llm_$rows"
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[surprisal] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val docs = graft.Tables.load(spark, dir, "documents")
    t("scan only (count)") { docs.count() }
    t("explode+count") {
      docs.select(explode(split(col("text"), " ")).as("tok")).count() }
    t("explode+hash+vocab agg") {
      docs.select(explode(split(col("text"), " ")).as("tok"))
        .select(xxhash64(col("tok")).as("t"))
        .groupBy("t").agg(count(lit(1))).count() }
    t("full text_surprisal") {
      graft.SparkEntry.queries("text_surprisal")(spark, dir)
        .write.format("noop").mode("overwrite").save() }
    graft.Caches.release(spark)
    t("full text_surprisal (2nd)") {
      graft.SparkEntry.queries("text_surprisal")(spark, dir)
        .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
