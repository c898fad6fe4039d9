package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** JSONL corpus ingestion — the interchange format real LLM corpora
  * arrive in (one JSON document per line, usually gzip'd; Spark's JSON
  * datasource splits and decompresses per file transparently).
  *
  * Design decisions for 100-TB ingestion:
  *  - Schema is EXPLICIT, never inferred: inference runs a full extra
  *    pass over the data before the real read, and a drifting field in
  *    one shard silently changes every downstream type.
  *  - PERMISSIVE mode with a corrupt-record column: one mangled line in
  *    a billion must not kill the job (FAILFAST) or vanish silently
  *    (DROPMALFORMED); it lands in `_corrupt_record` where [[split]]
  *    routes it to a quarantine output for inspection.
  *  - The reader stays a plain datasource scan, so column pruning and
  *    filter pushdown on the parsed fields work as usual.
  */
object JsonDocs {

  /** The documents-table schema in its JSONL form. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  private val Corrupt = "_corrupt_record"

  /** Read a JSONL path with `schema`; malformed lines survive with all
    * schema fields null and the raw line in `_corrupt_record`. */
  def load(spark: SparkSession, path: String,
           schema: StructType = docSchema): DataFrame =
    spark.read
      .schema(schema.add(Corrupt, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path)

  /** (clean, quarantine): parsed documents without the corrupt column,
    * and the raw text of every line that failed to parse. Spark requires
    * the frame to be materialized (cached) before the corrupt column is
    * filtered on — a known guard in the JSON source (SPARK-26108); the
    * caller releases via `graft.Caches.release`. */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val cached = graft.Caches.persist(df)
    val clean = cached.filter(col(Corrupt).isNull).drop(Corrupt)
    val quarantine = cached.filter(col(Corrupt).isNotNull).select(col(Corrupt).as("raw"))
    (clean, quarantine)
  }
}
