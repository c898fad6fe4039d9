package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog over the driver-provided parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's directory-as-catalog model
  * (`duckdb_manager.cpp:180-210`: one table per file, name = stem)
  * for parquet; the typed-CSV variant lives in [[graft.sources.TypedCsv]].
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables that stay broadcast-able at any scale factor
    * (region=5, nation=25 rows in TPC-H regardless of SF). */
  val broadcastable: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view named after the file stem. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
