package graft

import java.nio.file.{Files, Paths}
import graft.sources.JsonDocs

/** JSONL ingestion: explicit schema, malformed-line quarantine. */
class JsonDocsSpec extends SparkSuite {
  import spark.implicits._

  test("clean lines parse, malformed lines land in quarantine with the raw text") {
    val dir = Files.createDirectories(Paths.get("target/jsondocs-spec"))
    val path = dir.resolve("corpus.jsonl")
    Files.writeString(path, Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0"}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "s1"}""",
      """{"doc_id": 3, "text": "truncated""",               // malformed
      """not json at all""",                                 // malformed
      """{"doc_id": 4, "text": "hola", "lang": "es", "source": "s0"}"""
    ).mkString("\n"))

    val (clean, quarantine) = JsonDocs.split(JsonDocs.load(spark, path.toString))
    try {
      val ids = clean.select("doc_id").as[Long].collect().sorted
      assert(ids === Array(1L, 2L, 4L))
      assert(clean.columns.toSeq === Seq("doc_id", "text", "lang", "source"))
      val bad = quarantine.as[String].collect().sorted
      assert(bad.length === 2)
      assert(bad.exists(_.contains("truncated")), bad.mkString("|"))
      assert(bad.contains("not json at all"), bad.mkString("|"))
    } finally Caches.release(spark)
  }

  test("type mismatch in one field quarantines the line instead of nulling silently") {
    val dir = Files.createDirectories(Paths.get("target/jsondocs-spec"))
    val path = dir.resolve("typed.jsonl")
    Files.writeString(path, Seq(
      """{"doc_id": "not-a-number", "text": "x", "lang": "en", "source": "s0"}""",
      """{"doc_id": 7, "text": "y", "lang": "en", "source": "s0"}"""
    ).mkString("\n"))
    val (clean, quarantine) = JsonDocs.split(JsonDocs.load(spark, path.toString))
    try {
      assert(clean.select("doc_id").as[Long].collect().toSeq === Seq(7L))
      assert(quarantine.count() === 1)
    } finally Caches.release(spark)
  }
}
