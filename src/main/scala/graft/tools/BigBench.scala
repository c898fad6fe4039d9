package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Same-scale comparison against BASELINE.md: the reference's published
  * numbers are at 10M rows (README.md:44-62); the driver's sf0.1 data
  * is 600K. This main synthesizes a DETERMINISTIC 10M-row table with
  * the three reference column types (float measure, timestamp, short
  * string), then times the exact baseline query shapes END-TO-END
  * (cold parquet read included, like the reference's "query total"
  * which includes its CSV parse) and warm (input cached — comparable
  * to the reference's "total CUDA/CPU-only" compute numbers).
  *
  * Emits one JSON line; results are recorded in BIGBENCH.md.
  */
object BigBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val dir = s"target/bigbench/rows_$rows"
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthesis: hash-derived columns, 32 partitions
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      spark.range(0, rows, 1, 32)
        .select(
          col("id"),
          (pmod(xxhash64(col("id")), lit(1000000)) / lit(100.0)).as("price"),
          timestamp_seconds(lit(631152000L) + pmod(xxhash64(col("id"), lit(1)), lit(315360000L))).as("ship_ts"),
          concat(lit("cust#"), lpad(pmod(xxhash64(col("id"), lit(2)), lit(3000000)).cast("string"), 7, "0")).as("name"))
        .write.mode("overwrite").parquet(dir)
    }

    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val queries: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      "avg_float" -> (df => df.agg(avg("price"))),
      "max_date" -> (df => df.agg(max("ship_ts"))),
      "sort_float" -> (df => df.select("price", "id").orderBy(col("price").asc)),
      "sort_date" -> (df => df.select("ship_ts", "id").orderBy(col("ship_ts").asc)),
      "sort_string" -> (df => df.select("name", "id").orderBy(col("name").asc)))

    // WARM first: input cached in memory, median of 3 — compute-only
    // (also pays all JIT/codegen before the end-to-end pass, so e2e
    // numbers measure read+execute, not classloading).
    val cached = spark.read.parquet(dir).cache()
    cached.count()
    val warm = queries.map { case (name, q) =>
      timeIt(noop(q(cached))) // jit warm-up
      val ts = Seq.fill(3)(timeIt(noop(q(cached)))).sorted
      name -> ts(1)
    }
    cached.unpersist(blocking = true)
    // END-TO-END: fresh read each time (disk -> result), like the
    // reference's query-total which re-parses CSV per query.
    val cold = queries.map { case (name, q) =>
      name -> timeIt(noop(q(spark.read.parquet(dir))))
    }
    def jmap(xs: Seq[(String, Double)]) =
      xs.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString("{", ",", "}")
    println(s"""{"rows":$rows,"end_to_end":${jmap(cold)},"warm_median3":${jmap(warm)}}""")
    spark.stop()
  }
}
