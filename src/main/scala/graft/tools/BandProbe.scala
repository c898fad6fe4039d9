package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Stage-by-stage volume probe for the SimHash band joins — candidate
  * counts before/after the Hamming gate at a given corpus size, for
  * both the 64-bit and wide signatures. Diagnoses superlinear steps:
  * the band join's cost IS its candidate volume, so when a scale point
  * bends, this prints which stage bent. */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dir = s"target/bigbench/llm_$rows"
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))

    def probe(label: String, sims: org.apache.spark.sql.DataFrame,
              words: Int, bw: Int, maxHam: Int): Unit = {
      val bands = words * 64 / bw
      val mask = if (bw == 64) -1L else (1L << bw) - 1
      val bandCols = (0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash").getItem((b * bw) / 64), (b * bw) % 64)
            .bitwiseAND(lit(mask)).as("v"))
      }
      val banded = sims.select(col("doc_id"), col("simhash"),
        explode(array(bandCols: _*)).as("bv"))
      val joined = banded.as("a")
        .join(banded.as("b"),
          col("a.bv") === col("b.bv") && col("a.doc_id") < col("b.doc_id"))
      val ham = (0 until words)
        .map(w => bit_count(col("a.simhash").getItem(w)
          .bitwiseXOR(col("b.simhash").getItem(w))))
        .reduce(_ + _)
      val nCand = joined.count()
      val nClose = joined.filter(ham <= maxHam).count()
      // heaviest band buckets — skew means one value pairs quadratically
      val hot = banded.groupBy("bv").count().orderBy(col("count").desc)
        .limit(5).collect().map(r => r.getLong(1)).mkString(",")
      println(s"$label: band-candidates=$nCand within-ham=$nClose hottest-buckets=$hot")
    }

    val wide = graft.Caches.persist(toks.select(col("doc_id"),
      graft.functions.VectorExpressions.simhashWide(col("t"), 2).as("simhash")))
    wide.count()
    probe("wide-2w-bw32", wide, words = 2, bw = 32, maxHam = 6)

    val narrow = graft.Caches.persist(toks.select(col("doc_id"),
      array(graft.functions.VectorExpressions.simhash64(col("t"))).as("simhash")))
    narrow.count()
    probe("64bit-bw16", narrow, words = 1, bw = 16, maxHam = 3)

    spark.stop()
  }
}
