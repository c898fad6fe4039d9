package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — prints ONE JSON line per the driver contract.
  *
  * Queries are forced through the `noop` sink, not `.count()`:
  * count() lets Catalyst's EliminateSorts drop the very Sort being
  * measured, and noop also exercises full result production. The
  * headline set maps onto BASELINE.md: ungrouped AVG/MAX(date)
  * (reference README.md:50-53) and single-key float/date/string sorts
  * (README.md:59-61), plus join/group/window shapes the reference
  * can't run but a real workload would.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = Seq(
      "agg_avg", "agg_max_date", "agg_multi",
      "sort_asc", "sort_date", "sort_string", "sort_topn",
      "join_equi", "join_multicond", "group_agg", "window_rank",
      "q1_join_avg", "q3_subquery_desc", "events_window",
    ).filter(SparkEntry.queries.contains) ++
      SparkEntry.queries.keys.filter(_.startsWith("dedup_")).toSeq.sorted ++
      SparkEntry.queries.keys.filter(_.startsWith("embed_")).toSeq.sorted

    // Warm the JVM/codegen once so per-query numbers measure the
    // engine, not first-call classloading.
    try SparkEntry.queries(headline.head)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    var errors = List.empty[(String, String)]
    val results = headline.map { name =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        errors ::= (name, Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val ok = results.filterNot { case (n, _) => errors.exists(_._1 == n) }
    val qs = ok.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, m) => s"${jstr(k)}:${jstr(m)}" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":${jstr(sfDir)}}""")
    spark.stop()
  }
}
