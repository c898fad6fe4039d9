package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: binary payloads survive the pipeline, the
  * decode stub is deterministic, and byte lengths line up with the
  * source text. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("pack produces binary media with correct byte counts") {
    val ds = Multimodal.pack(spark, SparkSpec.sfTiny)
    val rows = ds.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.media.length.toLong == r.n_bytes))
    assert(rows.forall(_.mime == "text/plain"))
    // payload round-trips to the original text
    val docs = Tables.load(spark, SparkSpec.sfTiny, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(rows.forall(r => new String(r.media, "UTF-8") == docs(r.doc_id)))
  }

  test("decodeStub is deterministic and bounded") {
    val ds = Multimodal.pack(spark, SparkSpec.sfTiny)
    val a = Multimodal.decodeStub(ds).orderBy("doc_id").collect().toSeq
    val b = Multimodal.decodeStub(ds.repartition(7)).orderBy("doc_id").collect().toSeq
    assert(a === b, "decode must not depend on partitioning")
    assert(a.forall(f => f.width >= 64 && f.width < 576 && f.height >= 64 && f.height < 576))
  }

  test("multimodal_pack query joins 1:1 with embeddings") {
    val out = Multimodal.multimodalPack(spark, SparkSpec.sfTiny)
    val nDocs = Tables.load(spark, SparkSpec.sfTiny, "documents").count()
    val nEmb = Tables.load(spark, SparkSpec.sfTiny, "embeddings").count()
    assert(out.count() === math.min(nDocs, nEmb))
    assert(out.filter(col("dim") =!= 64).count() === 0)
  }
}
