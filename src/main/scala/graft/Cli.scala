package graft

import graft.sources.TypedCsv

/** CLI parity with the reference: `run <csv_dir> "<SQL>" [out_path]`
  * (`src/main.cpp:719-733`: `./sql_dbms <csv_dir> "<SQL>" [use_gpu]` —
  * the GPU flag has no Spark analogue and is dropped).
  *
  * Loads every typed CSV in the directory as a view, runs the SQL
  * through Spark (Catalyst handles everything DuckDB's planner did for
  * the reference: pushdown, pruning, decorrelation), writes the result
  * as a single CSV like the reference's `./output/<...>_result.csv`.
  */
object Cli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Cli <csv_dir> \"<SQL>\" [out_path]")
    val Array(csvDir, sql) = args.take(2)
    val outPath = if (args.length > 2) args(2) else "output/result.csv"
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    try {
      TypedCsv.loadDirectory(spark, csvDir)
      val result = spark.sql(sql.trim.stripSuffix(";"))
      // typed = true: re-emit the `Name (N) (P),...` header like the
      // reference sink (`table.cpp:540-575`), so CLI output diffs
      // cleanly against reference output and round-trips back through
      // the typed-CSV catalog.
      TypedCsv.saveSingleFile(result, outPath, typed = true)
      println(s"wrote $outPath")
    } finally spark.stop()
  }
}
