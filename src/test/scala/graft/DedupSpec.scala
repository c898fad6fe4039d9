package graft

import org.apache.spark.sql.functions._
import graft.operators.Documents

/** Recall/precision bars for the near-dup operators, on a corpus with
  * PLANTED near-duplicates (so ground truth is known exactly), plus
  * oracle-shape checks for exact dedup. */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  /** 40 base docs of pseudo-random word soup (deterministic LCG), plus
    * a near-dup of each base doc with 2 of ~60 tokens changed
    * (Jaccard on 3-gram shingles ≈ 0.85-0.95) and one exact dup. */
  private lazy val planted = {
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
      "oscar", "papa", "quebec", "romeo", "sierra", "tango")
    var seed = 12345L
    def nextInt(n: Int): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L; (((seed >>> 33) % n).toInt + n) % n }
    val bases = (0 until 40).map { i =>
      (i.toLong, (0 until 60).map(_ => vocab(nextInt(vocab.size))).mkString(" "))
    }
    val nearDups = bases.map { case (i, text) =>
      val toks = text.split(" ")
      toks(7) = "zulu"; toks(31) = "yankee"
      (i + 100, toks.mkString(" "))
    }
    val exactDup = Seq((999L, bases.head._2))
    (bases ++ nearDups ++ exactDup).toDF("doc_id", "text")
  }

  private lazy val truePairs: Set[(Long, Long)] =
    (0 until 40).map(i => (i.toLong, i + 100L)).toSet

  test("source matrix conserves the pair count and orders its cells") {
    val docs = Tables.load(spark, SparkSpec.sfTiny, "documents")
    val pairs = Documents.jaccardPairs(docs, threshold = 0.6).count()
    val m = Documents.dedupSourceMatrix(docs).collect()
    assert(m.map(_.getAs[Long]("n_pairs")).sum === pairs,
      "every pair must land in exactly one cell")
    assert(m.forall(r => r.getAs[String]("src_a") <= r.getAs[String]("src_b")),
      "cells must be unordered-pair canonical")
    assert(m.forall { r =>
      val mj = r.getAs[Double]("mean_jaccard"); mj >= 0.6 && mj <= 1.0
    }, "mean of >=threshold scores stays in [threshold, 1]")
  }

  test("dedupExact keeps min doc_id per distinct text") {
    val out = planted.groupBy("text").agg(min("doc_id").as("doc_id"))
    assert(out.count() === 80) // 81 rows, one exact dup collapses
    val keeper = out.filter(col("doc_id") === 0L).count()
    assert(keeper === 1) // doc 999 collapsed into doc 0
  }

  test("urlCanonical: idempotent, collapses the standard equivalences, preserves real params") {
    import org.apache.spark.sql.functions.col
    val urls = Seq(
      "https://example.com/en/r1",                        // already canonical
      "http://www.example.com/en/r1/",                    // scheme+www+slash
      "https://EXAMPLE.com/en/r1#frag",                   // host case + fragment
      "https://example.com/en/r1?utm_source=x&gclid=t",   // tracking only
      "https://example.com/en/r1?b=2&a=1",                // param order
      "https://example.com/en/r1?a=1&b=2&fbclid=z",       // order + tracking
      "https://example.com/en/r1?a=1&ref=nav",            // real + tracking
      "https://example.com/en/R1")                        // path case: DISTINCT
    val canon = urls.toDF("u")
      .select(graft.operators.Documents.urlCanonical(col("u")).as("c"))
      .as[String].collect()
    // the first seven collapse to two resources; path case survives
    assert(canon.take(4).toSet === Set("https://example.com/en/r1"))
    assert(canon.slice(4, 6).toSet === Set("https://example.com/en/r1?a=1&b=2"))
    assert(canon(6) === "https://example.com/en/r1?a=1")
    assert(canon(7) === "https://example.com/en/R1")
    // idempotence: canonicalizing a canonical form is the identity
    val twice = canon.toSeq.toDF("u")
      .select(graft.operators.Documents.urlCanonical(col("u")).as("c"))
      .as[String].collect()
    assert(twice.toSeq === canon.toSeq)
  }

  test("minhashPairs recall >= 0.9 on planted near-dups") {
    val found = Documents.minhashPairs(planted, simThreshold = 0.6)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val recall = truePairs.count(found.contains).toDouble / truePairs.size
    assert(recall >= 0.9, s"recall $recall, found ${found.size} pairs")
  }

  test("fuzzyDecontaminate finds planted near-dup eval leakage across corpora") {
    // bases play the training corpus, their 2-token-edited twins play
    // the eval suite — the reformatted-benchmark leakage exact-shingle
    // decontamination can miss but the banded MinHash cross must catch
    val corpus = planted.filter(col("doc_id") < 100)
    val evalDocs = planted.filter(col("doc_id") >= 100 && col("doc_id") < 999)
    val found = Documents.fuzzyDecontaminate(corpus, evalDocs, simThreshold = 0.5)
    val pairs = found.select("doc_id", "eval_id").as[(Long, Long)].collect().toSet
    val truth = (0 until 40).map(i => (i.toLong, i + 100L)).toSet
    val recall = truth.count(pairs.contains).toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall, found ${pairs.size} pairs")
    // exact verify: every reported jaccard clears the bar
    assert(found.filter(col("jaccard") < 0.5).count() === 0L)
  }

  test("minhashPairsPortable recall >= 0.9 on planted near-dups and agrees with the codegen variant") {
    val portable = Documents.minhashPairsPortable(planted, simThreshold = 0.6)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val recall = truePairs.count(portable.contains).toDouble / truePairs.size
    assert(recall >= 0.9, s"recall $recall, found ${portable.size} pairs")
    // both variants exact-verify, so precision is 1.0 by construction;
    // on this corpus every true pair is well above threshold and both
    // hash families catch all of them — the pair sets must coincide
    val codegen = Documents.minhashPairs(planted, simThreshold = 0.6)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(portable == codegen,
      s"portable ${portable.size} vs codegen ${codegen.size} pairs diverge: " +
        s"only-portable=${(portable -- codegen).take(3)} only-codegen=${(codegen -- portable).take(3)}")
  }

  test("simhashPairs finds planted near-dups via band join") {
    // 2 changed tokens out of 60 flip only a few simhash bits; allow
    // hamming <= 12 here (the production threshold is use-case tuned).
    val sims = planted
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), Documents.simhashCol.as("simhash"))
    val found = Documents.simhashPairs(sims, maxHamming = 12)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val recall = truePairs.count(found.contains).toDouble / truePairs.size
    assert(recall >= 0.8, s"recall $recall, found ${found.size} pairs")
    // the exact dup must be at hamming 0
    assert(found.contains((0L, 999L)))
  }

  test("portable simhash finds planted near-dups and hamming-0 exact dup") {
    val found = Documents.simhashPairs(
      Documents.simhashPortableSigs(planted), maxHamming = 12)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val recall = truePairs.count(found.contains).toDouble / truePairs.size
    assert(recall >= 0.8, s"recall $recall, found ${found.size} pairs")
    assert(found.contains((0L, 999L))) // exact dup: identical signature
  }

  test("maxDocFreq cap bounds candidate volume under a corpus-wide hot shingle") {
    // Boilerplate skew: every doc opens with the same 5-token header
    // (3 corpus-wide shingles), so the uncapped inverted index emits
    // Σ(bucket choose 2) ≈ 3·(N choose 2) candidates from those
    // buckets alone — quadratic. The cap must (a) bound every bucket
    // and (b) still find the planted near-dups, whose overlap lives in
    // the non-boilerplate shingles.
    val n = 200
    val boiler = "terms of service apply here"
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november")
    var seed = 777L
    def nextInt(m: Int): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L; (((seed >>> 33) % m).toInt + m) % m }
    val bases = (0 until n).map { i =>
      (i.toLong, boiler + " " + (0 until 40).map(_ => vocab(nextInt(vocab.size))).mkString(" "))
    }
    val dups = bases.take(5).map { case (i, text) =>
      val toks = text.split(" "); toks(20) = "zulu"
      (i + 1000, toks.mkString(" "))
    }
    val docs = (bases ++ dups).toDF("doc_id", "text")

    def candidateVolume(capped: org.apache.spark.sql.DataFrame): Long =
      capped.groupBy("s").agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)
        .agg(sum(expr("c * (c - 1) / 2"))).as[Double].head().toLong

    val cap = 20
    val sh = Documents.shingles(docs)
    val hot = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > cap).select("s")
    val uncappedVol = candidateVolume(sh)
    val cappedSh = sh.join(hot, Seq("s"), "left_anti")
    val cappedVol = candidateVolume(cappedSh)
    assert(uncappedVol >= n.toLong * (n - 1) / 2, s"skew not planted? vol=$uncappedVol")
    // structural guarantee: no surviving bucket exceeds the cap, so
    // per-bucket pair volume is ≤ (cap choose 2) — linear in corpus
    // size, never quadratic in it
    val maxBucket = cappedSh.groupBy("s").agg(count(lit(1)).as("c"))
      .agg(max("c")).as[Long].head()
    assert(maxBucket <= cap, s"bucket of $maxBucket survived the cap")
    // and the corpus-wide boilerplate buckets' quadratic term is gone
    assert(cappedVol < uncappedVol / 4, s"capped $cappedVol vs uncapped $uncappedVol")

    val found = Documents.jaccardPairs(docs, threshold = 0.5, maxDocFreq = Some(cap))
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val expected = (0 until 5).map(i => (i.toLong, i + 1000L)).toSet
    assert(expected.subsetOf(found), s"capped run lost planted pairs: $found")
  }

  test("staged wave sweep is bit-identical to the single-pass pair frame") {
    // The 100M-doc disk-envelope fix (bucketCounts' sequential waves
    // over the shingle-hash space) must change NOTHING but peak shuffle
    // footprint: per-pair commons and per-doc hot-hits are plain sums
    // over waves because each shingle lives wholly in one wave. Pin
    // exact row-for-row equality — scores included — of waves=3 vs the
    // explicit single pass, on both normalizations.
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq
    val j1 = rows(Documents.jaccardPairs(planted, 0.6, waves = Some(1)))
    val j3 = rows(Documents.jaccardPairs(planted, 0.6, waves = Some(3)))
    assert(j1.nonEmpty, "fixture must produce pairs")
    assert(j3 === j1, "staged jaccard diverged from single-pass")
    val c1 = rows(Documents.containmentPairs(planted, 0.6, waves = Some(1))
      .orderBy("d1", "d2"))
    val c3 = rows(Documents.containmentPairs(planted, 0.6, waves = Some(3))
      .orderBy("d1", "d2"))
    assert(c3 === c1, "staged containment diverged from single-pass")
    // and under a BINDING df cap (hot-shingle corpus): the hot-hit
    // size corrections are summed across waves too
    val boiler = "terms of service apply here"
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")
    var seed = 4242L
    def nextInt(m: Int): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L; (((seed >>> 33) % m).toInt + m) % m }
    val bases = (0 until 120).map { i =>
      (i.toLong, boiler + " " + (0 until 40).map(_ => vocab(nextInt(vocab.size))).mkString(" "))
    }
    val dups = bases.take(5).map { case (i, text) =>
      val toks = text.split(" "); toks(20) = "zulu"
      (i + 1000, toks.mkString(" "))
    }
    val hotDocs = (bases ++ dups).toDF("doc_id", "text")
    val h1 = rows(Documents.jaccardPairs(hotDocs, 0.5, maxDocFreq = Some(20),
      waves = Some(1)))
    val h3 = rows(Documents.jaccardPairs(hotDocs, 0.5, maxDocFreq = Some(20),
      waves = Some(3)))
    assert(h1.nonEmpty, "capped fixture must produce pairs")
    assert(h3 === h1, "staged capped jaccard diverged from single-pass")
  }

  test("simhashPairsWide on 32-bit bands finds small-edit near-dups, no false pairs") {
    var seed = 99L
    def nextInt(n: Int): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L; (((seed >>> 33) % n).toInt + n) % n }
    // 500-token docs over per-doc-disjoint token sets (a shared tiny
    // vocab would make all signatures near-equal); a 1-token edit on a
    // long doc keeps the 128-bit hamming inside the tight bar 32-bit
    // bands target — the regime's definition, not a test convenience
    val bases = (0 until 20).map { i =>
      (i.toLong, (0 until 500).map(_ => s"t${i}_${nextInt(100000)}").mkString(" "))
    }
    val dups = bases.map { case (i, text) =>
      val tk = text.split(" "); tk(17) = "zz"; (i + 100, tk.mkString(" "))
    }
    val sims = (bases ++ dups).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"),
        graft.functions.VectorExpressions.simhashWide(col("t"), 2).as("simhash"))
    val found = Documents.simhashPairsWide(sims, maxHamming = 6, bandBits = 32)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val truePairs = bases.map { case (i, _) => (i, i + 100L) }.toSet
    val recall = truePairs.count(found.contains).toDouble / truePairs.size
    assert(recall >= 0.9, s"recall $recall, found ${found.size}")
    // disjoint vocabularies: any non-planted pair is a false positive
    assert((found -- truePairs).isEmpty, s"false pairs: ${found -- truePairs}")
    // the md5-portable wide signature (the registered oracle-row path)
    // meets the same bars on the same corpus
    val simsMd5 = (bases ++ dups).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"),
        graft.functions.VectorExpressions.simhashMd5Wide(col("t")).as("simhash"))
    val foundMd5 = Documents.simhashPairsWide(simsMd5, maxHamming = 6, bandBits = 32)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val recallMd5 = truePairs.count(foundMd5.contains).toDouble / truePairs.size
    assert(recallMd5 >= 0.9, s"md5-wide recall $recallMd5, found ${foundMd5.size}")
    assert((foundMd5 -- truePairs).isEmpty, s"md5-wide false pairs: ${foundMd5 -- truePairs}")
  }

  test("decontaminate degrades to a shuffle semi join when the eval side exceeds budget") {
    val docs = planted
    val expected = Documents.decontaminate(docs, docs.filter(col("doc_id") < 3))
      .collect().map(_.getLong(0)).toSeq
    // tiny budget drops the operator's broadcast hint; Spark's own
    // auto-broadcast is disabled so the fallback shuffle path is visible
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffleOut = Documents.decontaminate(docs, docs.filter(col("doc_id") < 3),
        budgetBytes = 1L)
      val got = shuffleOut.collect().map(_.getLong(0)).toSeq
      val p = shuffleOut.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        "over-budget eval side must not broadcast:\n" + p.take(2000))
      assert(p.contains("LeftSemi"), p.take(2000))
      assert(got === expected, "join strategy must not change the flagged set")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    Caches.release(spark)
  }

  test("jaccard-pair frame is shared — cluster-family queries reuse the cached pairs") {
    Caches.release(spark)
    // first consumer materializes the pair frame (and registers it)
    Documents.dedupNgramJaccard(spark, SparkSpec.sfTiny).count()
    assert(Caches.registered(spark) > 0, "jaccardPairs must register its persist")
    // a second query deriving from the same pair frame must read the
    // cache, not re-run the shingle/inverted-index chain
    val keep = Documents.dedupKeepList(spark, SparkSpec.sfTiny)
    keep.count()
    val p = keep.queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      "dedupKeepList must reuse the cached jaccard pairs:\n" + p.take(2000))
    Caches.release(spark)
  }

  test("ngram-jaccard inverted-index join finds planted pairs with correct scores") {
    val sh = Documents.shingles(planted)
    val n = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("common"))
      .join(n.as("n1"), col("d1") === col("n1.doc_id"))
      .join(n.as("n2"), col("d2") === col("n2.doc_id"))
      .select(col("d1"), col("d2"),
        (col("common").cast("double") / (col("n1.n") + col("n2.n") - col("common"))).as("j"))
    val strong = pairs.filter(col("j") >= 0.6)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val recall = truePairs.count(strong.contains).toDouble / truePairs.size
    assert(recall >= 0.95, s"recall $recall")
  }

  test("incremental dedup flags only new-vs-corpus near-dups, never corpus-corpus pairs") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en"),
      (2L, "one two three four five six seven eight", "en"),
      // corpus-internal near-dup pair — must NOT appear in the output
      (3L, "red orange yellow green blue indigo violet pink", "en"),
      (4L, "red orange yellow green blue indigo violet black", "en"))
      .toDF("doc_id", "text", "lang")
    val batch = Seq(
      // near-dup of corpus doc 1 (one token changed)
      (100L, "alpha beta gamma delta epsilon zeta eta iota", "en"),
      // fresh content — must pass clean
      (101L, "completely novel words appearing nowhere else at all", "en"))
      .toDF("doc_id", "text", "lang")
    val found = Documents.dedupIncremental(corpus, batch, threshold = 0.5)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(found === Set((100L, 1L)), s"got $found")
  }

  test("dupPassageProfile counts only windows that repeat somewhere") {
    // doc 0 and 1 share one 8-token passage; doc 2 is all-unique tokens
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val docs = Seq(
      (0L, s"a1 a2 $shared a3 a4"),
      (1L, s"b1 b2 b3 $shared b4"),
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"))
      .toDF("doc_id", "text")
    val out = Documents.dupPassageProfile(docs, k = 8)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // doc 0: 12 tokens → 5 windows, exactly one (the shared span aligned
    // at pos 2) also occurs in doc 1; same for doc 1 at pos 3
    assert(out(0L) === (5L, 1L))
    assert(out(1L) === (5L, 1L))
    assert(out(2L) === (3L, 0L)) // 10 tokens → 3 windows, none repeat
  }

  test("stripDupPassages keeps the canonical first occurrence only") {
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val docs = Seq(
      (0L, s"a1 a2 $shared a3"),
      (1L, s"b1 $shared b2 b3"),
      (999L, s"a1 a2 $shared a3")) // exact dup of doc 0
      .toDF("doc_id", "text")
    val out = Documents.stripDupPassages(docs, k = 8)
      .as[(Long, String)].collect().toMap
    // doc 0 is the lexicographic-first holder of every duplicated
    // window → survives intact
    assert(out(0L) === s"a1 a2 $shared a3")
    // doc 1 loses the shared span's tokens but keeps its own
    assert(out(1L) === "b1 b2 b3")
    // the exact dup keeps only tokens outside duplicated windows; its
    // windows "a2 s1..s7" etc. are all dups of doc 0's, so only the
    // tokens never covered by any window (none here: every token sits
    // under some duplicated window) survive → doc vanishes
    assert(!out.contains(999L), s"exact dup not stripped: ${out.get(999L)}")
  }

  test("containment flags a short doc quoted inside a long one; Jaccard misses it") {
    val long = (1 to 60).map(i => s"tok$i").mkString(" ")
    val short = (20 to 30).map(i => s"tok$i").mkString(" ") // fully contained
    val docs = Seq((1L, long, "en"), (2L, short, "en"),
      (3L, "totally different words entirely over here now today", "en"))
      .toDF("doc_id", "text", "lang")
    val cont = Documents.containmentPairs(docs, 0.8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(cont.map(t => (t._1, t._2)) === Seq((1L, 2L)))
    assert(cont.head._3 === 1.0, "a whole-quote containment scores exactly 1")
    assert(Documents.jaccardPairs(docs, 0.6).collect().isEmpty,
      "resemblance at 0.6 must miss the asymmetric case containment exists for")
  }

  test("containment cap preserves the genuinely contained pair while dropping hot buckets") {
    // 20 docs share one boilerplate 3-gram; doc 21 is a prefix of doc 1
    // (true containment 1.0). With cap=10 the boilerplate bucket (df=21)
    // leaves the shingle universe entirely; the planted pair must
    // survive untouched because none of ITS shingles are hot.
    val filler = (i: Int) => (0 until 12).map(j => s"u${i}w$j").mkString(" ")
    val docs = ((1 to 20).map(i => (i.toLong, s"alpha beta gamma ${filler(i)}")) :+
      (21L, "alpha beta gamma u1w0 u1w1 u1w2 u1w3 u1w4"))
      .toDF("doc_id", "text")
    val uncapped = Documents.containmentPairs(docs, 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val capped = Documents.containmentPairs(docs, 0.8, maxDocFreq = Some(10))
      .as[(Long, Long, Double)].collect().toSet
    assert(capped.exists(p => p._1 == 1L && p._2 == 21L && p._3 >= 0.99),
      s"planted containment must survive the cap: $capped")
    assert(capped.map(p => (p._1, p._2)) === uncapped.map(p => (p._1, p._2)),
      "threshold-clearing pair set is cap-invariant on this fixture")
  }

  test("langId predicts constructed texts") {
    val samples = Seq(
      ("the cat and the dog of the house is with us", "en"),
      ("der hund und die katze das ist gut und der tag", "de"),
      ("el gato y la casa los dias es grande y el sol", "es"),
      ("xyzzy qwerty plugh", "unk"))
      .toDF("text", "expected")
    val out = samples.withColumn("pred", Documents.langIdCol(col("text")))
      .filter(col("pred") === col("expected"))
    assert(out.count() === samples.count())
  }

  test("langId confusion matrix partitions the corpus and agrees with per-doc langId") {
    val dir = SparkSpec.sfTiny
    val m = Documents.textLangIdConfusion(spark, dir)
      .as[(String, String, Long)].collect()
    val total = Tables.load(spark, dir, "documents").count()
    assert(m.map(_._3).sum === total, "cells must partition the corpus")
    // diagonal mass equals the per-doc query's agreement count
    val agree = Documents.textLangId(spark, dir)
      .filter(col("lang") === col("lang_pred")).count()
    assert(m.filter(c => c._1 == c._2).map(_._3).sum === agree)
  }
}
