package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column handling: media as opaque `binary` columns with
  * typed metadata, plus a decode/feature-extract stage.
  *
  * The Spark-side plumbing is real — binary packing, typed Dataset
  * schema, partition-batched decode — but the decoder itself is a
  * clearly-marked DETERMINISTIC STUB: the container has no image/audio
  * codecs, so `decodeStub` derives fake dimensions from a content
  * hash. Swapping in a real decoder (JNI codec or `mapInPandas` +
  * Pillow on a PySpark cluster) changes only the function body; the
  * schema, partitioning, and batch shape are what this module pins
  * down.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, media: Array[Byte], mime: String,
                         lang: String, n_bytes: Long)

  case class DecodedFeatures(doc_id: Long, width: Int, height: Int,
                             n_frames: Int, content_hash: Long)

  /** Join text + embedding into a multimodal record: the text bytes
    * stand in for an image/audio payload (opaque binary + metadata —
    * the schema a lake of real media files would have). */
  def pack(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .join(Tables.load(spark, dir, "embeddings"),
        col("doc_id") === col("vec_id"))
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        lit("text/plain").as("mime"),
        col("lang"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** Partition-batched decode. `mapPartitions` mirrors the batch shape
    * of `mapInPandas`: the (real) decoder amortizes codec init across
    * a whole partition instead of paying it per row. STUB: dimensions
    * are derived from a murmur3 content hash — deterministic, so specs
    * and the verify harness are stable. */
  def decodeStub(records: Dataset[MediaRecord]): Dataset[DecodedFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // real impl: val codec = Codec.open() once per partition here
      it.map { r =>
        val h = scala.util.hashing.MurmurHash3.bytesHash(r.media, seed = 42)
        DecodedFeatures(
          doc_id = r.doc_id,
          width = 64 + (math.abs(h.toLong) % 512).toInt,
          height = 64 + (math.abs((h.toLong >> 9)) % 512).toInt,
          n_frames = 1,
          content_hash = h.toLong)
      }
    }
  }

  /** Registered query (oracle-checked): the multimodal join with
    * scalar projections — binary payload flows through the plan; the
    * output keeps byte-length/dim/label so DuckDB can reproduce it. */
  def multimodalPack(spark: SparkSession, dir: String): DataFrame =
    pack(spark, dir)
      .select(col("doc_id"), col("n_bytes"), col("lang"))
      .join(Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), size(col("embedding")).as("dim"), col("label")),
        col("doc_id") === col("vec_id"))
      .select("doc_id", "n_bytes", "lang", "dim", "label")
      .orderBy("doc_id")

  /** Registered query (rows-only: stub hash isn't SQL-reproducible):
    * full pack → decode pipeline. */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame =
    decodeStub(pack(spark, dir)).toDF().orderBy("doc_id")
}
