package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` of registered queries to one file per
  * query — the per-round optimization evidence trail
  * (`plans/r<N>/<query>_before.txt` / `_after.txt`).
  *
  * Usage: `runMain graft.tools.ExplainQueries <outDir> <suffix> [q1 q2 ...]`
  * (no query names = all registered queries; suffix e.g. "before").
  */
object ExplainQueries {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r16")
    val suffix = args.lift(1).getOrElse("before")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      graft.Caches.release(spark)
    }
    println(s"[explain] wrote ${names.size} plans to $outDir (*_$suffix.txt)")
    spark.stop()
  }
}
