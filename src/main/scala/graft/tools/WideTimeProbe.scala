package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

object WideTimeProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val dir = s"target/bigbench/llm_$rows"
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    t("scan+split only")(toks.write.format("noop").mode("overwrite").save())
    t("scan+simhash64")(toks.select(col("doc_id"),
      graft.functions.VectorExpressions.simhash64(col("t")).as("s"))
      .write.format("noop").mode("overwrite").save())
    t("scan+simhashWide2")(toks.select(col("doc_id"),
      graft.functions.VectorExpressions.simhashWide(col("t"), 2).as("s"))
      .write.format("noop").mode("overwrite").save())
    t("full dedup_simhash_wide")(graft.operators.Documents.dedupSimhashWide(spark, dir)
      .write.format("noop").mode("overwrite").save())
    graft.Caches.release(spark)
    t("full dedup_simhash")(graft.operators.Documents.dedupSimhash(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
