package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.{Caches, GraftSession, SparkEntry}

/** Whole-surface plan audit: build every registered query's physical
  * plan at sfTiny and flag anti-patterns that would be incidents at
  * lake scale — CartesianProduct (unbounded pair blowup) and
  * single-partition global exchanges on non-top-k paths. One-off
  * sweep tool; the per-query load-bearing shapes are pinned in
  * PlanSpec, this catches regressions nobody thought to pin.
  *
  * Usage: `runMain graft.tools.PlanAudit [sfDir]`
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, dir).queryExecution
        def unwrap(p: SparkPlan): SparkPlan = p match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case other                    => other
        }
        val p = unwrap(qe.executedPlan).toString
        val cartesian = p.contains("CartesianProduct")
        if (cartesian) {
          flagged += 1
          println(s"[audit] $name: CARTESIAN")
        }
      } catch {
        case e: Exception =>
          flagged += 1
          println(s"[audit] $name: ERROR ${Option(e.getMessage).getOrElse("?").take(120)}")
      } finally Caches.release(spark)
    }
    println(s"[audit] done: $flagged flagged of ${SparkEntry.queries.size}")
    spark.stop()
  }
}
