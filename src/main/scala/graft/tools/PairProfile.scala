package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level profile of the jaccardPairs pass at synthetic scale —
  * the probe used to localize the round-11 10M slowdown. */
object PairProfile {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val dir = s"target/bigbench/llm_$rows"
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, dir, "documents")
    def timeIt(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[pairprofile] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    timeIt("docs.count")(docs.count())
    var jp: org.apache.spark.sql.DataFrame = null
    timeIt("jaccardPairs CONSTRUCTION (docs.count + hotHits/n measure jobs)") {
      jp = graft.operators.Documents.jaccardPairs(docs, 0.6)
    }
    timeIt("jaccardPairs EXECUTION (noop)")(noop(jp))
    timeIt("jaccardPairs EXECUTION again (warm)")(noop(jp))
    graft.Caches.release(spark)
    // raw bucket agg + OLD-style expansion (no tag, no cap)
    val sh = graft.operators.Documents.shingles(docs)
    timeIt("old-style: bucket agg + pair expand + count") {
      noop(sh.groupBy("s").agg(sort_array(collect_list("doc_id")).as("ds"))
        .filter(size(col("ds")) > 1)
        .select(explode(expr(
          """flatten(transform(ds,
            |  (x, i) -> transform(slice(ds, i + 2, size(ds)),
            |            y -> struct(x AS d1, y AS d2))))""".stripMargin)).as("p"))
        .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
        .agg(count(lit(1)).as("common")))
    }
    timeIt("new-style: tagged expand IF, cap 12650") {
      noop(sh.groupBy("s").agg(sort_array(collect_list("doc_id")).as("ds"))
        .filter(size(col("ds")) >= 2)
        .select(explode(expr(
          s"""IF(size(ds) > 12650,
             |   transform(ds, x -> struct(x AS d1, CAST(-1 AS BIGINT) AS d2)),
             |   flatten(transform(ds,
             |     (x, i) -> transform(slice(ds, i + 2, size(ds)),
             |               y -> struct(x AS d1, y AS d2)))))""".stripMargin)).as("p"))
        .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
        .agg(count(lit(1)).as("cnt")))
    }
    spark.stop()
  }
}
