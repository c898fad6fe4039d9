package graft

import org.apache.spark.sql.functions._
import graft.operators.Documents

/** Corpus-assembly operators: deterministic sampling, quality scoring,
  * sequence packing, benchmark decontamination. */
class CorpusSpec extends SparkSuite {
  import spark.implicits._

  private val dir = SparkSpec.sfTiny

  test("hash sampling is deterministic and near the nominal rate") {
    val a = Documents.docSampleHash(spark, dir).collect().toSeq
    val b = Documents.docSampleHash(spark, dir).collect().toSeq
    assert(a === b, "same corpus must sample identically")
    val n = Tables.load(spark, dir, "documents").count().toDouble
    val rate = a.size / n
    // nominal 26/256 ≈ 10.2%; allow binomial noise on a small corpus
    assert(rate > 0.03 && rate < 0.25, s"rate $rate")
  }

  test("hash sampling is partitioning-invariant") {
    val docs = Tables.load(spark, dir, "documents")
    val a = Documents.sampleHash(docs).collect().toSeq
    val b = Documents.sampleHash(docs.repartition(13)).collect().toSeq
    assert(a === b)
  }

  test("quality components stay in [0,1] and repetition lowers the score") {
    val out = Documents.textQuality(spark, dir)
    val bad = out.filter(
      col("alpha_frac") < 0 || col("alpha_frac") > 1 ||
      col("distinct_frac") < 0 || col("distinct_frac") > 1 ||
      col("len_frac") < 0 || col("len_frac") > 1 ||
      col("quality") < 0 || col("quality") > 1).count()
    assert(bad === 0)
    // constructed corpus: diverse prose must outrank a one-token loop
    val probe = Seq(
      (1L, "the quick brown fox jumps over a lazy dog near the old mill and rests", "en"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam spam spam", "en"))
      .toDF("doc_id", "text", "lang")
    val scored = Documents.qualityScore(probe)
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    assert(scored(1L) > scored(2L),
      s"diverse ${scored(1L)} must outrank spammy ${scored(2L)}")
  }

  test("sequence packing fills bins in order and conserves tokens") {
    val out = Documents.docPackSequences(spark, dir).cache()
    val budget = 512
    // bins are non-negative and contiguous from 0 within each language
    val perLang = out.groupBy("lang")
      .agg(min("bin").as("mn"), max("bin").as("mx"),
        countDistinct("bin").as("nbins"), sum("n_tokens").as("toks"))
      .collect()
    perLang.foreach { r =>
      assert(r.getAs[Long]("mn") === 0L)
      assert(r.getAs[Long]("nbins") === r.getAs[Long]("mx") + 1,
        s"bins must be contiguous: $r")
      // every bin except possibly the last starts because the previous
      // one crossed the budget, so total bins ≈ totalTokens / budget
      assert(r.getAs[Long]("mx") <= r.getAs[Long]("toks") / budget + 1, r.toString)
    }
    // a bin never starts after less than a full budget of preceding tokens
    val binStarts = out.groupBy("lang", "bin").agg(sum("n_tokens").as("binToks"))
    val under = binStarts.filter(col("bin") =!= 0 && col("binToks") <= 0).count()
    assert(under === 0)
    out.unpersist()
  }

  test("decontaminate flags exactly the docs sharing a shingle with the eval set") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en"),   // contaminated (shares 3-gram with eval)
      (2L, "one two three four five six seven", "en"),     // clean
      (3L, "alpha beta gamma other words here", "en"),     // contaminated (prefix 3-gram)
      (4L, "totally different content entirely here now", "en")) // clean
      .toDF("doc_id", "text", "lang")
    val eval = Seq((100L, "intro alpha beta gamma outro words", "en"))
      .toDF("doc_id", "text", "lang")
    val flagged = Documents.decontaminate(docs, eval).as[Long].collect().toSet
    assert(flagged === Set(1L, 3L))
  }
}
