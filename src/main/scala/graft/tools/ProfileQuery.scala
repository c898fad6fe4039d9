package graft.tools

import graft.{Caches, GraftSession, SparkEntry, Tables}
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-stage profile of one registered query: wall time, task count,
  * max vs median task ms (skew / lost parallelism), shuffle read/write
  * bytes and input bytes per stage, plus the job count (each job is a
  * driver round-trip — collect()s and broadcast builds show up here).
  *
  * Usage: `runMain graft.tools.ProfileQuery <query> [warmRuns] [sfDir]`
  * Profiles the run AFTER `warmRuns` warm-ups (default 1), so JIT and
  * plan compilation don't pollute the stage table — the same regime the
  * bench's timed runs see.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("agg_avg")
    val warmRuns = args.lift(1).map(_.toInt).getOrElse(1)
    val sfDir = args.lift(2).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.preload(spark, sfDir, except = Set("documents", "embeddings"))

    def run(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (i <- 1 to warmRuns) println(f"[profile] warm-up $i: ${run()}%.3f s")

    case class StageRec(stageId: Int, name: String, nTasks: Int,
                        submit: Long, complete: Long,
                        taskMs: mutable.ArrayBuffer[Long],
                        var shufRead: Long, var shufWrite: Long,
                        var input: Long, var spill: Long)
    val stages = mutable.LinkedHashMap.empty[Int, StageRec]
    val jobs = mutable.ArrayBuffer.empty[(Int, Long, Long)] // id, start, end
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs += ((e.jobId, e.time, -1L)) }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          val i = jobs.lastIndexWhere(_._1 == e.jobId)
          if (i >= 0) jobs(i) = (e.jobId, jobs(i)._2, e.time)
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stages.synchronized {
          val r = stages.getOrElseUpdate(si.stageId, StageRec(
            si.stageId, si.name, si.numTasks,
            si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
            mutable.ArrayBuffer.empty, 0L, 0L, 0L, 0L))
          r.shufRead += si.taskMetrics.shuffleReadMetrics.totalBytesRead
          r.shufWrite += si.taskMetrics.shuffleWriteMetrics.bytesWritten
          r.input += si.taskMetrics.inputMetrics.bytesRead
          r.spill += si.taskMetrics.diskBytesSpilled
        }
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        stages.synchronized {
          stages.get(e.stageId).foreach(_.taskMs += e.taskInfo.duration)
        }
    }
    // task-end events can arrive before stage-completed; register stage
    // shells on submit so onTaskEnd always has a home
    val preListener = new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
        val si = e.stageInfo
        stages.synchronized {
          stages.getOrElseUpdate(si.stageId, StageRec(
            si.stageId, si.name, si.numTasks, 0L, 0L,
            mutable.ArrayBuffer.empty, 0L, 0L, 0L, 0L))
        }
      }
    }
    spark.sparkContext.addSparkListener(preListener)
    spark.sparkContext.addSparkListener(listener)
    val wall = run()
    Thread.sleep(500) // let the async listener bus drain

    println(f"[profile] $name profiled run: $wall%.3f s, ${jobs.size} jobs, ${stages.size} stages")
    def mb(b: Long) = f"${b / 1048576.0}%8.1f"
    println(f"${"stage"}%6s ${"tasks"}%5s ${"wall_ms"}%8s ${"sum_ms"}%8s ${"max_ms"}%7s ${"med_ms"}%7s ${"in_MB"}%8s ${"sr_MB"}%8s ${"sw_MB"}%8s ${"spill"}%8s  name")
    val rows = stages.values.toSeq.sortBy(r => -(r.complete - r.submit))
    rows.foreach { r =>
      val ts = r.taskMs.sorted
      val med = if (ts.isEmpty) 0L else ts(ts.size / 2)
      val mx = if (ts.isEmpty) 0L else ts.last
      val wallMs = if (r.complete > r.submit) r.complete - r.submit else 0L
      println(f"${r.stageId}%6d ${r.nTasks}%5d $wallMs%8d ${ts.sum}%8d $mx%7d $med%7d ${mb(r.input)} ${mb(r.shufRead)} ${mb(r.shufWrite)} ${mb(r.spill)}  ${r.name.take(80)}")
    }
    val jobWall = jobs.collect { case (_, s, e1) if e1 > 0 => e1 - s }.sum
    println(f"[profile] sum of job walls: ${jobWall / 1000.0}%.3f s (gaps to $wall%.3f s = driver/planning time)")
    spark.stop()
  }
}
