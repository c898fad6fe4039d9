package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.operators.Documents

/** MEASURED shuffle-volume guards — the complement to PlanSpec's
  * string assertions: a plan can look right and still move the wrong
  * number of bytes, so these execute the query and read the shuffle
  * write metrics off the exchange nodes. At 1000 executors, shuffle
  * bytes are the cost model. */
class ShuffleSpec extends SparkSuite {

  /** Execute `df` and sum "shuffle bytes written" across every
    * exchange in the (AQE-final) executed plan. Executes through the
    * frame's OWN QueryExecution (`toRdd`) — a sink write would build a
    * separate QueryExecution and leave this plan's metrics at zero. */
  private def shuffleBytes(df: DataFrame): Long = {
    df.queryExecution.toRdd.count()
    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other                    => other
    }
    def sum(p: SparkPlan): Long = {
      val self = p match {
        case s: ShuffleExchangeLike =>
          s.metrics.collect {
            case (name, m) if name.contains("shuffleBytesWritten") ||
              m.name.exists(_.contains("shuffle bytes written")) => m.value
          }.sum
        case _ => 0L
      }
      // AQE wraps materialized stages in QueryStageExec, whose subtree
      // is NOT in `children` — descend through `plan` explicitly
      val nested = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => sum(finalPlan(q.plan))
        case _ => 0L
      }
      self + nested + p.children.map(c => sum(finalPlan(c))).sum +
        p.subqueries.map(c => sum(finalPlan(c))).sum
    }
    sum(finalPlan(df.queryExecution.executedPlan))
  }

  private lazy val docs = Tables.load(spark, SparkSpec.sfTiny, "documents")

  test("map-side operators move ZERO shuffle bytes") {
    // quality scoring, repetition stats, chunking: pure per-row work —
    // plan strings say "no Exchange"; this asserts the executed bytes
    for ((name, df) <- Seq(
      "qualityScore" -> Documents.qualityScore(docs),
      "repetitionStats" -> Documents.repetitionStats(docs),
      "chunkDocs" -> Documents.chunkDocs(docs))) {
      val b = shuffleBytes(df)
      assert(b === 0L, s"$name shuffled $b bytes")
    }
  }

  test("hashed shingle index shuffles measurably fewer bytes than string keys") {
    // the '8-byte hashed key' rule, measured: identical inverted-index
    // aggregation, keyed by xxhash64(shingle) vs the raw string
    def bucketCounts(keyed: DataFrame): DataFrame =
      keyed.repartition(col("s")).groupBy("s").agg(count(lit(1)).as("n"))
    val exploded = Documents.shingleArray(docs)
      .select(col("doc_id"), explode(col("sh")).as("s_raw"))
    val hashed = shuffleBytes(
      bucketCounts(exploded.select(xxhash64(col("s_raw")).as("s"))))
    val strings = shuffleBytes(
      bucketCounts(exploded.select(col("s_raw").as("s"))))
    assert(hashed > 0, "expected a real shuffle to measure")
    assert(hashed < strings,
      s"hashed keys must shuffle fewer bytes: hashed=$hashed vs strings=$strings")
  }

  test("wave slicing bounds per-wave shuffle bytes at ~1/waves and conserves the total") {
    // the staged pair sweep's disk claim, MEASURED: each wave's slice
    // filter sits before the repartition, so a wave writes ~1/waves of
    // the single-pass shuffle (this is the peak-disk bound the 100M
    // run rode), and the waves together write what the single pass
    // writes — staging moves no extra bytes, it only staggers them
    def agg(sh: DataFrame): DataFrame =
      sh.groupBy("s").agg(count(lit(1)).as("n"))
    val single = shuffleBytes(agg(Documents.shingles(docs)))
    assert(single > 0, "expected a real shuffle to measure")
    val perWave = (0 until 3).map(w =>
      shuffleBytes(agg(Documents.shingles(docs, wave = w, waves = 3))))
    perWave.foreach(b => assert(b < single * 55 / 100,
      s"a wave must carry well under half the stream: $b of $single"))
    val total = perWave.sum
    assert(total >= single * 85 / 100 && total <= single * 115 / 100,
      s"waves must conserve total shuffle volume: ${perWave.mkString("+")}=$total vs $single")
  }

  test("quality-weighted sample plans no exchange carrying document text") {
    // the md5 prefix is projected before the doc_id join, so every
    // exchange moves (doc_id, 2-char prefix) or aggregate rows — the
    // corpus text column must never appear in an exchange's output
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other                    => other
    }
    def collectEx(p: SparkPlan): Seq[ShuffleExchangeLike] = {
      val self = p match { case s: ShuffleExchangeLike => Seq(s); case _ => Nil }
      val nested = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          collectEx(unwrap(q.plan))
        case _ => Nil
      }
      self ++ nested ++ p.children.flatMap(c => collectEx(unwrap(c))) ++
        p.subqueries.flatMap(c => collectEx(unwrap(c)))
    }
    val qe = Documents.qualityWeightedSample(docs).queryExecution
    val exs = collectEx(unwrap(qe.executedPlan))
    assert(exs.nonEmpty, "expected at least one exchange in the plan")
    exs.foreach(e => assert(!e.output.exists(_.name == "text"),
      s"text crosses an exchange:\n$e"))
  }
}
