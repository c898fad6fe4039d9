package graft

import org.apache.spark.sql.functions._
import graft.operators.Documents

/** Corpus-assembly operators: deterministic sampling, quality scoring,
  * sequence packing, benchmark decontamination. */
class CorpusSpec extends SparkSuite {
  import spark.implicits._

  private val dir = SparkSpec.sfTiny

  test("epoch schedule: epoch 1 is the full corpus, every doc repeats floor(w) or ceil(w) times, partition-invariant") {
    val docs = Tables.load(spark, dir, "documents")
    val out = Documents.corpusEpochSchedule(spark, dir).collect()
    val n = docs.count()
    assert(out.count(_.getAs[Int]("epoch") == 1).toLong === n,
      "epoch 1 must contain every document")
    val perDoc = out.groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.length).toMap
    val fracHits = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    def weightOf(src: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(src.getBytes("UTF-8")).map("%02x".format(_)).mkString
      1.0 + (java.lang.Long.parseLong(hex.take(15), 16) % 4) * 0.5
    }
    docs.select("doc_id", "source").as[(Long, String)].collect().foreach {
      case (id, src) =>
        val w = weightOf(src)
        val k = perDoc(id)
        assert(k == math.floor(w).toInt || k == math.ceil(w).toInt,
          s"doc $id of $src (w=$w) appears $k times")
        if (w != math.floor(w)) fracHits += (k == math.ceil(w).toInt)
    }
    // the md5 gate admits SOME but not ALL of a fractional source
    assert(fracHits.exists(identity) && fracHits.exists(!_),
      "the fractional epoch must be a proper subset")
    // partitioning can't move a content-keyed schedule
    val repart = Documents.epochSchedule(docs.repartition(13),
      lit(1.0) + (conv(substring(md5(col("source").cast("binary")), 1, 15),
        16, 10).cast("long") % 4) * lit(0.5))
      .collect()
    assert(repart.toSeq === out.toSeq)
  }

  test("length buckets: 2^b <= n_tokens < 2^(b+1), full batches except the bucket tail, partition-invariant") {
    val out = Documents.corpusLengthBuckets(spark, dir).collect()
    out.foreach { r =>
      val n = r.getAs[Long]("n_tokens"); val b = r.getAs[Int]("bucket")
      assert(n >= (1L << b) && n < (1L << (b + 1)),
        s"n_tokens $n outside bucket $b")
    }
    // every (bucket, batch) except a bucket's last is exactly full,
    // positions are 0..size-1
    out.groupBy(r => (r.getAs[Int]("bucket"), r.getAs[Long]("batch_id")))
      .foreach { case ((b, bid), rows) =>
        val maxBid = out.filter(_.getAs[Int]("bucket") == b)
          .map(_.getAs[Long]("batch_id")).max
        assert(rows.map(_.getAs[Int]("pos")).sorted.toSeq ===
          (0 until rows.length).toSeq)
        if (bid < maxBid) assert(rows.length === 8, s"bucket $b batch $bid not full")
      }
    val repart = Documents.lengthBucketBatches(
      Tables.load(spark, dir, "documents").repartition(13)).collect()
    assert(repart.toSeq === out.toSeq, "content-keyed batching must be partition-invariant")
  }

  test("shard manifest: conserves docs and tokens, checksum is order-independent and change-sensitive") {
    val docs = Tables.load(spark, dir, "documents")
    val m = Documents.corpusShardManifest(spark, dir).collect()
    assert(m.map(_.getAs[Long]("n_docs")).sum === docs.count())
    val repart = Documents.shardManifest(docs.repartition(13)).collect()
    assert(repart.toSeq === m.toSeq, "manifest must not depend on partitioning")
    // flipping ONE document's text must flip exactly its shard's checksum
    val tweaked = docs.withColumn("text",
      when(col("doc_id") === 0L, concat(col("text"), lit(" x")))
        .otherwise(col("text")))
    val m2 = Documents.shardManifest(tweaked).collect()
    val diff = m.zip(m2).count { case (a, b) =>
      a.getAs[Long]("checksum") != b.getAs[Long]("checksum") }
    assert(diff === 1, s"one changed doc must flip exactly one shard checksum, flipped $diff")
  }

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

  test("temperature sampling upweights low-resource languages vs proportional") {
    val docs = Tables.load(spark, dir, "documents")
    val counts = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val sampled = Documents.temperatureSample(docs, frac = 0.2)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val n = counts.values.sum.toDouble
    val total = sampled.values.sum.toDouble
    // total lands near frac·n (quota rounding only)
    assert(math.abs(total - 0.2 * n) <= counts.size,
      s"total $total vs ${0.2 * n}")
    // α = 0.5: every language's SAMPLED share must sit between its raw
    // share and the uniform share — the defining property of
    // temperature flattening (smallest lang gains, largest gives up)
    val uniform = 1.0 / counts.size
    counts.foreach { case (lang, c) =>
      val raw = c / n
      val got = sampled.getOrElse(lang, 0L) / total
      val (lo, hi) = (math.min(raw, uniform), math.max(raw, uniform))
      assert(got >= lo - 0.02 && got <= hi + 0.02,
        s"$lang: sampled share $got outside [$lo, $hi] (raw $raw, uniform $uniform)")
    }
    Caches.release(spark)
  }

  test("token-budget mix fills each source to its budget, greedily maximal") {
    val docs = Tables.load(spark, dir, "documents")
    val out = Documents.tokenBudgetMix(docs)
      .select("source", "doc_id", "cum_tokens")
      .as[(String, Long, Long)].collect()
    // recompute the budget and the per-source hash order independently
    val sized = docs.selectExpr("doc_id", "source",
        "cast(size(split(text, ' ')) as long) as n",
        "md5(cast(text as binary)) as h")
      .as[(Long, String, Long, String)].collect()
    val totalTokens = sized.map(_._3).sum
    val nSources = sized.map(_._2).distinct.length
    val budget = (totalTokens * 0.1 / nSources).toLong
    val bySource = sized.groupBy(_._2).view
      .mapValues(_.sortBy(d => (d._4, d._1))).toMap
    val sel = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    bySource.foreach { case (src, ordered) =>
      val chosen = sel.getOrElse(src, Set.empty)
      // PREFIX-greedy replay: the operator keeps the longest hash-order
      // prefix whose running sum fits — the running sum includes every
      // earlier doc, so the first overflow ends the source's intake
      var cum = 0L
      ordered.foreach { case (id, _, n, _) =>
        cum += n
        if (cum <= budget)
          assert(chosen.contains(id), s"$src: doc $id in prefix (cum $cum <= $budget) but dropped")
        else
          assert(!chosen.contains(id), s"$src: doc $id past the budget but kept")
      }
    }
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

  test("gopher rules: each named rule kills exactly its constructed violator") {
    val pass = ("the quick brown fox jumps over a lazy dog near " * 3).trim
    val short = "the cat and the dog ran fast here now then"
    val longWords = (Seq.fill(28)("extraordinarily") ++ Seq("the", "and")).mkString(" ")
    val symbols = (Seq.fill(12)("the word") ++ Seq.fill(6)("@#$%")).mkString(" ")
    val noStops = ("quick brown fox jumps over lazy dog near old mill " * 3).trim
    val probe = Seq(
      (1L, pass), (2L, short), (3L, longWords), (4L, symbols), (5L, noStops))
      .toDF("doc_id", "text")
    val r = Documents.gopherRules(probe)
      .select("doc_id", "ok_word_count", "ok_mean_word_len", "ok_alpha",
        "ok_symbol", "ok_stopwords", "pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(t => t._1 -> t).toMap
    assert(r(1L)._7, "clean prose passes every rule")
    assert(!r(2L)._2 && r(2L)._3 && r(2L)._5 && r(2L)._6 && !r(2L)._7,
      "10-word fragment fails ONLY the word-count rule")
    assert(r(3L)._2 && !r(3L)._3 && !r(3L)._7,
      "15-char-word soup fails the mean-word-length rule")
    assert(!r(4L)._5 && !r(4L)._7, "20% symbol words fail the symbol rule")
    assert(r(5L)._2 && r(5L)._3 && r(5L)._4 && !r(5L)._6 && !r(5L)._7,
      "stopword-free text fails ONLY the stopword rule")
    // the real corpus: every rule column is non-null and pass is their AND
    val real = Documents.textGopherRules(spark, dir)
    val broken = real.filter(col("pass") =!= (col("ok_word_count") &&
      col("ok_mean_word_len") && col("ok_alpha") && col("ok_symbol") &&
      col("ok_stopwords"))).count()
    assert(broken === 0)
  }

  test("token counts: BPE-ish regex fragments what the whitespace split can't see") {
    val probe = Seq(
      (1L, "hello world"),        // clean prose: both tokenizers agree
      (2L, "wait... what?!"),     // punctuation runs fragment: 2 ws vs 4 bpe
      (3L, "a1b2 c3"))            // letter/digit alternation: 2 ws vs 6 bpe
      .toDF("doc_id", "text")
    val r = Documents.tokenCounts(probe)
      .as[(Long, Int, Int, Double)].collect().map(t => t._1 -> t).toMap
    assert(r(1L)._2 === 2 && r(1L)._3 === 2 && r(1L)._4 === 1.0)
    assert(r(2L)._2 === 2 && r(2L)._3 === 4)
    assert(r(3L)._2 === 2 && r(3L)._3 === 6 && r(3L)._4 === 3.0)
  }

  test("BPE merge mining equals a local brute-force over the word histogram") {
    val got = Documents.bpeMerges(spark, dir, k = 30)
      .as[(String, Long)].collect()
    // local replay of the whole contract: lowercase, split on
    // non-letters, count words, explode each distinct word's adjacent
    // char pairs weighted by frequency, top-30 by (count desc, pair asc)
    val texts = Tables.load(spark, dir, "documents")
      .select("text").as[String].collect()
    val wordCounts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      t.toLowerCase.split("[^a-z]+").filter(_.length >= 2)
        .foreach(w => wordCounts(w) = wordCounts.getOrElse(w, 0L) + 1L)
    }
    val pairCounts = scala.collection.mutable.Map.empty[String, Long]
    wordCounts.foreach { case (w, c) =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
      }
    }
    val want = pairCounts.toSeq.sortBy { case (p, c) => (-c, p) }.take(30)
    assert(got.toSeq === want)
    // the pair stage must run on the histogram, not the corpus: every
    // pair's count can exceed the document count only via weighting
    assert(got.map(_._2).max > texts.length,
      "top pair should aggregate across repeated words")
  }

  test("iterative BPE training matches a local greedy replay over the word histogram") {
    val got = Documents.bpeTrain(spark, dir, k = 3)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // independent replay: word histogram keyed by TOKEN LIST, pair
    // counts re-derived after each merge, greedy left-to-right merge
    // application (the fold bpeTrain's replace encoding must equal)
    val texts = Tables.load(spark, dir, "documents")
      .select("text").as[String].collect()
    val wc = scala.collection.mutable.Map.empty[List[String], Long]
    texts.foreach { t =>
      t.toLowerCase.split("[^a-z]+").filter(_.length >= 2).foreach { w =>
        val ts = w.map(_.toString).toList
        wc(ts) = wc.getOrElse(ts, 0L) + 1L
      }
    }
    var hist = wc.toMap
    val want = scala.collection.mutable.Buffer.empty[(Int, String, String, String, Long)]
    for (i <- 1 to 3) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      hist.foreach { case (ts, c) =>
        ts.zip(ts.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      val ((a, b), cnt) = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
      want += ((i, a, b, a + b, cnt))
      hist = hist.map { case (ts, c) =>
        ts.foldLeft(Vector.empty[String]) { (acc, t) =>
          if (acc.nonEmpty && acc.last == a && t == b) acc.init :+ (a + b)
          else acc :+ t
        }.toList -> c
      }
    }
    assert(got === want.toSeq)
    // the point of iterating: later merges must see rewritten counts —
    // step 2's pair involves step 1's merged token or at least its
    // count differs from the static histogram's rank-2 pair
    assert(got.size === 3 && got.map(_._1) === Seq(1, 2, 3))
  }

  test("WordPiece training matches a local likelihood-greedy replay over marked token lists") {
    val got = Documents.wordpieceTrain(spark, dir, k = 3)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // independent replay: marked histograms (c1, ##c2, ...), pair AND
    // token counts re-derived each round, argmax by the likelihood
    // score cnt/(cnt(a)*cnt(b)) with (lhs, rhs) tie-break
    val texts = Tables.load(spark, dir, "documents")
      .select("text").as[String].collect()
    val wc = scala.collection.mutable.Map.empty[List[String], Long]
    texts.foreach { t =>
      t.toLowerCase.split("[^a-z]+").filter(_.length >= 2).foreach { w =>
        val ts = w.head.toString :: w.tail.map(c => "##" + c).toList
        wc(ts) = wc.getOrElse(ts, 0L) + 1L
      }
    }
    var hist = wc.toMap
    val want = scala.collection.mutable.Buffer.empty[(Int, String, String, String, Long)]
    for (i <- 1 to 3) {
      val tc = scala.collection.mutable.Map.empty[String, Long]
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      hist.foreach { case (ts, c) =>
        ts.foreach(t => tc(t) = tc.getOrElse(t, 0L) + c)
        ts.zip(ts.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      val ((a, b), cnt) = pc.toSeq.minBy { case ((l, r), c) =>
        (-(c.toDouble / (tc(l).toDouble * tc(r).toDouble)), l, r)
      }
      val m = a + b.stripPrefix("##")
      want += ((i, a, b, m, cnt))
      hist = hist.map { case (ts, c) =>
        ts.foldLeft(Vector.empty[String]) { (acc, t) =>
          if (acc.nonEmpty && acc.last == a && t == b) acc.init :+ m
          else acc :+ t
        }.toList -> c
      }
    }
    assert(got === want.toSeq)
    // the score must differ from raw-count BPE: the likelihood argmax
    // favours rarer-unit pairs — and continuation marks must survive
    assert(got.forall(s => s._3.startsWith("##")),
      "every right-hand piece is word-internal by construction")
  }

  test("WordPiece encode is maximal munch; per-doc counts bounded by words and chars") {
    import graft.operators.Documents.wordpieceCount
    // hand vocab: longest match must win, continuation marks honored
    val v = Set("u", "n", "##n", "##a", "##b", "##l", "##e", "un", "##able")
    assert(wordpieceCount("unable", v, 5) === 2L, "un + ##able")
    assert(wordpieceCount("nab", v, 5) === 3L, "n + ##a + ##b")
    assert(wordpieceCount("u", v, 5) === 1L)
    // greedy, not optimal: 'unn' takes 'un' then '##n' (2), never u+nn
    assert(wordpieceCount("unn", v, 5) === 2L)
    val out = Documents.wordpieceEncode(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val chars = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty) }
      .toMap
    out.foreach { case (id, nWords, nToks) =>
      val ws = chars(id)
      assert(nWords === ws.length.toLong, s"doc $id")
      assert(nToks >= nWords && nToks <= ws.map(_.length).sum.toLong,
        s"doc $id: $nToks outside [words, chars]")
    }
    // merges must actually compress: strictly fewer tokens than chars
    assert(out.map(_._3).sum < chars.values.map(_.map(_.length).sum.toLong).sum)
  }

  test("dedup savings report replays the keep-min-id decision with token weights") {
    val got = Documents.corpusDedupSavings(spark, dir)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    val clusterOf = Documents.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    val want = rows.groupBy(_._2).toSeq.map { case (src, ds) =>
      val toks = ds.map(d => (d._1, d._3.split(" ", -1).length.toLong))
      val dropped = toks.filter { case (id, _) => clusterOf(id) != id }
      val (tot, drp) = (toks.map(_._2).sum, dropped.map(_._2).sum)
      (src, ds.length.toLong, dropped.length.toLong, tot, drp,
        math.floor(drp.toDouble / tot * 10000 + 0.5) / 10000)
    }.sortBy(_._1)
    assert(got === want)
    assert(got.map(_._5).sum > 0, "fixture must contain droppable tokens")
  }

  test("cluster-size histogram folds the cluster map and accounts for every doc") {
    val stats = Documents.dedupClusterStats(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    val clusters = Documents.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val want = clusters.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      .groupBy(_._2).view.mapValues(_.size.toLong).toSeq
      .map { case (size, n) => (size, n, size * n) }.sortBy(_._1)
    assert(stats === want)
    assert(stats.map(_._3).sum === clusters.length.toLong,
      "sum(n_docs) must equal the corpus size")
    assert(stats.exists(_._1 >= 2), "fixture must contain real dup clusters")
  }

  test("leak-free split closes every straddling near-dup pair, moves only cluster members") {
    val docs = Tables.load(spark, dir, "documents")
    val fixed = Documents.corpusSplitLeakFree(spark, dir)
      .as[(Long, String, Boolean)].collect().toSeq
    val splitOf = fixed.map(r => r._1 -> r._2).toMap
    // the defining property: no qualifying near-dup pair straddles
    val pairs = Documents.jaccardPairs(docs, 0.6)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.nonEmpty && pairs.forall { case (a, b, _) => splitOf(a) == splitOf(b) })
    // relocations happen (the audit found straddlers), are flagged, and
    // hit only docs connected to a pair
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val own = Documents.docSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val moved = fixed.filter(_._3).map(_._1).toSet
    assert(moved.nonEmpty && moved.subsetOf(inPairs))
    fixed.foreach { case (id, s, m) =>
      assert(m === (s != own(id)), s"moved flag wrong for $id")
    }
    // untouched docs keep their content-hash assignment
    assert(fixed.filterNot(_._3).forall { case (id, s, _) => s == own(id) })
  }

  test("BPE vocabulary matches the local post-merge token inventory") {
    val texts = Tables.load(spark, dir, "documents")
      .select("text").as[String].collect()
    val wc = scala.collection.mutable.Map.empty[List[String], Long]
    texts.foreach { t =>
      t.toLowerCase.split("[^a-z]+").filter(_.length >= 2).foreach { w =>
        val ts = w.map(_.toString).toList
        wc(ts) = wc.getOrElse(ts, 0L) + 1L
      }
    }
    var hist = wc.toMap
    for (_ <- 1 to 3) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      hist.foreach { case (ts, c) =>
        ts.zip(ts.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      val ((a, b), _) = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
      hist = hist.map { case (ts, c) =>
        ts.foldLeft(Vector.empty[String]) { (acc, t) =>
          if (acc.nonEmpty && acc.last == a && t == b) acc.init :+ (a + b)
          else acc :+ t
        }.toList -> c
      }
    }
    val tokCnt = scala.collection.mutable.Map.empty[String, Long]
    hist.foreach { case (ts, c) =>
      ts.foreach(t => tokCnt(t) = tokCnt.getOrElse(t, 0L) + c)
    }
    val want = tokCnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(50)
    val got = Documents.bpeVocab(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(got === want)
    // merged multi-char subwords must appear in the shipped vocabulary
    assert(got.exists(_._1.length >= 2))
  }

  test("BPE encoding matches a local per-word greedy replay of the trained merges") {
    val merges = Documents.bpeTrain(spark, dir, k = 3)
      .as[(Int, String, String, String, Long)].collect().toSeq
      .map { case (_, a, b, _, _) => (a, b) }
    val got = Documents.bpeEncode(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    def encode(w: String): Int =
      merges.foldLeft(w.map(_.toString).toVector) { case (ts, (a, b)) =>
        ts.foldLeft(Vector.empty[String]) { (acc, t) =>
          if (acc.nonEmpty && acc.last == a && t == b) acc.init :+ (a + b)
          else acc :+ t
        }
      }.size
    val want = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
      .map { case (id, t) =>
        val ws = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
        (id, ws.length.toLong, ws.map(encode(_).toLong).sum, ws.map(_.length.toLong).sum)
      }
      .filter(_._2 > 0).sortBy(_._1)
    assert(got === want.map(w => (w._1, w._2, w._3)))
    // the merges must actually compress: post-merge token total is
    // strictly below the character total (= the zero-merge encoding)
    assert(got.map(_._3).sum < want.map(_._4).sum)
  }

  test("split leakage lists exactly the split-straddling near-dup pairs") {
    val docs = Tables.load(spark, dir, "documents")
    // both inputs have their own oracle + replay specs; this test pins
    // the COMPOSITION: filter, split ordering within a pair, sort order
    val pairs = Documents.jaccardPairs(docs, 0.6)
      .as[(Long, Long, Double)].collect().toSeq
    val splits = Documents.docSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val want = pairs
      .filter { case (a, b, _) => splits(a) != splits(b) }
      .map { case (a, b, j) =>
        val (x, y) = (splits(a), splits(b))
        (a, b, if (x < y) x else y, if (x < y) y else x, j)
      }
      .sortBy { case (a, b, _, _, j) => (-j, a, b) }
    val got = Documents.corpusSplitLeakage(spark, dir)
      .as[(Long, Long, String, String, Double)].collect().toSeq
    assert(got === want)
    assert(got.nonEmpty, "fixture must exercise straddling pairs")
  }

  test("sequence packing matches a local replay of the greedy assignment") {
    val budget = 512
    val got = Documents.docPackSequences(spark, dir)
      .select("lang", "doc_id", "n_tokens", "bin")
      .as[(String, Long, Int, Long)].collect()
    // replay the exact contract locally: within each language stream in
    // doc_id order, bin = floor(preceding cumulative tokens / budget) —
    // an over-budget doc may legitimately skip bin ids, so contiguity
    // is NOT an invariant; the assignment itself is.
    got.groupBy(_._1).foreach { case (lang, rows) =>
      var cum = 0L
      rows.sortBy(_._2).foreach { case (_, docId, n, bin) =>
        assert(bin === cum / budget, s"$lang doc $docId: bin $bin, cum $cum")
        cum += n
      }
    }
    assert(got.nonEmpty)
  }

  test("unigram surprisal ranks rare-token soup above common prose") {
    // 10 docs of shared boilerplate make those tokens common; one doc
    // of singleton tokens must score strictly higher surprisal, and a
    // hand-computed two-token corpus pins the formula itself.
    val common = (1L to 10L).map(i => (i, "the cat sat on the mat", "en"))
    val rare = Seq((11L, "zyx wvu tsr qpo nml kji", "en"))
    val out = Documents.unigramSurprisal((common ++ rare).toDF("doc_id", "text", "lang"))
      .select("doc_id", "avg_surprisal").as[(Long, Double)].collect().toMap
    assert(out(11L) > out(1L),
      s"rare ${out(11L)} must exceed common ${out(1L)}")
    // exact value: corpus "a a b" → p(a)=2/3, p(b)=1/3;
    // doc1 = "a a" → -ln(2/3); doc2 = "b" → -ln(1/3)
    val tiny = Documents.unigramSurprisal(
      Seq((1L, "a a", "x"), (2L, "b", "x")).toDF("doc_id", "text", "lang"))
      .select("doc_id", "avg_surprisal").as[(Long, Double)].collect().toMap
    assert(math.abs(tiny(1L) - -math.log(2.0 / 3.0)) < 1e-3, tiny.toString)
    assert(math.abs(tiny(2L) - -math.log(1.0 / 3.0)) < 1e-3, tiny.toString)
  }

  test("unigram encode bills exactly the trainer's final piece counts; vocab ships the final scores") {
    // encode reuses the final E-step model, so total pieces billed
    // across documents MUST equal the total of the trainer's final
    // token counts — the same segmentations, aggregated two ways.
    val enc = Documents.unigramEncode(spark, SparkSpec.sfTiny)
    val billed = enc.agg(sum("n_unigram_tokens")).head().getLong(0)
    val (_, lp, cntDF) = Documents.unigramFit(spark, SparkSpec.sfTiny, 3, 2)
    val trained = cntDF.agg(sum("cnt")).head().getLong(0)
    assert(billed === trained,
      s"encode billed $billed pieces, trainer counted $trained")
    // and every word's bill is at least 1 and at most its length
    val docs = Tables.load(spark, SparkSpec.sfTiny, "documents")
    val nWords = docs.select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) >= 2).count()
    val billedWords = enc.agg(sum("n_words")).head().getLong(0)
    assert(billedWords === nWords, "every >=2-letter word is billed once")
    // vocab: the lp column IS the deployable model's score per piece
    Documents.unigramVocab(spark, SparkSpec.sfTiny).collect().foreach { r =>
      assert(lp(r.getAs[String]("tok")) === r.getAs[Long]("lp"),
        s"vocab lp for ${r.getAs[String]("tok")} diverged from the fit model")
    }
  }

  test("unigramTrain with a too-large seed vocabulary fails with arithmetic, not an OOM") {
    val e = intercept[IllegalArgumentException] {
      Documents.unigramFit(spark, SparkSpec.sfTiny, maxPieceLen = 5,
        rounds = 1, maxSeedVocab = 10L)
    }
    assert(e.getMessage.contains("seed vocabulary"), e.getMessage)
    assert(e.getMessage.contains("maxPieceLen=5"), e.getMessage)
  }

  test("bigram surprisal matches a hand-computed MLE and flags shuffled text") {
    // corpus: doc1 = "a a b", doc2 = "a b" → bigram counts (a,a)=1,
    // (a,b)=2; context a· = 3. doc1 = avg(-ln(1/3), -ln(2/3)),
    // doc2 = -ln(2/3) — pins the conditional-MLE formula exactly.
    val tiny = Documents.bigramSurprisal(
      Seq((1L, "a a b", "x"), (2L, "a b", "x")).toDF("doc_id", "text", "lang"))
      .select("doc_id", "avg_surprisal").as[(Long, Double)].collect().toMap
    val d1 = (-math.log(1.0 / 3.0) + -math.log(2.0 / 3.0)) / 2.0
    assert(math.abs(tiny(1L) - d1) < 1e-3, tiny.toString)
    assert(math.abs(tiny(2L) - -math.log(2.0 / 3.0)) < 1e-3, tiny.toString)
    // ten copies of a fixed sentence make its continuations certain;
    // one doc with the SAME unigrams in scrambled orders must score
    // strictly higher — the signal unigram surprisal cannot see.
    val fluent = (1L to 10L).map(i => (i, "the cat sat on the mat", "en"))
    val scrambled = Seq((11L, "mat the on sat cat the", "en"))
    val out = Documents.bigramSurprisal(
      (fluent ++ scrambled).toDF("doc_id", "text", "lang"))
      .select("doc_id", "avg_surprisal").as[(Long, Double)].collect().toMap
    assert(out(11L) > out(1L),
      s"scrambled ${out(11L)} must exceed fluent ${out(1L)}")
  }

  test("dsir weights favor target-language-like docs; counts conserved") {
    val docs = (
      (1L to 5L).map(i => (i, "alpha beta gamma alpha beta", "en")) ++
      (6L to 10L).map(i => (i, "uno dos tres uno dos", "de")))
      .toDF("doc_id", "text", "lang")
    val w = Documents.dsirWeights(docs).cache()
    try {
      val byDoc = w.select("doc_id", "log_ratio").as[(Long, Double)].collect().toMap
      // tokens exclusive to the en slice → positive log-ratio;
      // tokens absent from it → negative (add-one keeps both finite)
      assert(byDoc(1L) > 0, s"target doc scored ${byDoc(1L)}")
      assert(byDoc(6L) < 0, s"off-target doc scored ${byDoc(6L)}")
      assert(byDoc(1L) > byDoc(6L))
      // every token instance is scored exactly once
      val total = w.agg(sum("n_tokens")).as[Long].head()
      assert(total === 50L)
    } finally w.unpersist()
  }

  test("dsir selection is deterministic and partitioning-invariant") {
    val docs = Tables.load(spark, dir, "documents")
    val a = Documents.dsirSelect(docs, k = 50).collect().toSeq
    val b = Documents.dsirSelect(docs.repartition(13), k = 50).collect().toSeq
    assert(a === b, "Gumbel top-k must not depend on partitioning")
    assert(a.size === 50)
    // the plan must be a top-k (TakeOrderedAndProject), not a global sort
    val p = Documents.dsirSelect(docs, k = 50).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
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

  test("overlap report: per-doc contaminated-shingle fraction, clean docs absent") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en"), // 4 shingles, 1 shared
      (2L, "one two three four five six seven", "en"))   // clean
      .toDF("doc_id", "text", "lang")
    val eval = Seq((100L, "intro alpha beta gamma outro words", "en"))
      .toDF("doc_id", "text", "lang")
    val out = Documents.overlapReport(docs, eval)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 4L, 1L, 0.25)))
  }

  test("upsert: updates win on key, inserts pass through, base rows survive") {
    val base = Seq((1L, "a", "en"), (2L, "b", "en")).toDF("doc_id", "text", "lang")
    val ups = Seq((2L, "b2", "en"), (3L, "c", "de")).toDF("doc_id", "text", "lang")
    val out = Documents.upsert(base, ups, "doc_id").orderBy("doc_id")
      .as[(Long, String, String)].collect().toSeq
    assert(out === Seq((1L, "a", "en"), (2L, "b2", "en"), (3L, "c", "de")))
  }

  test("quality-weighted sample keeps the whole middle tier, ~25% of each tail") {
    val docs = Tables.load(spark, dir, "documents")
    val out = Documents.qualityWeightedSample(docs)
      .select("doc_id", "tier").as[(Long, Int)].collect().toSeq
    val tiers = out.groupBy(_._2).view.mapValues(_.size).toMap
    val total = docs.count()
    // quartile tiers: ~25% of the corpus in each tail, ~50% in the middle
    assert(math.abs(tiers(2) - total * 0.5) <= total * 0.1,
      s"middle tier kept wholesale: $tiers")
    // each tail sampled at 64/256 = 25% of its ~quarter of the corpus
    Seq(1, 3).foreach { t =>
      val rate = tiers(t).toDouble / (total * 0.25)
      assert(rate > 0.12 && rate < 0.40, s"tier $t rate $rate outside sampling band")
    }
    // determinism: same subset on a re-run
    val again = Documents.qualityWeightedSample(docs)
      .select("doc_id", "tier").as[(Long, Int)].collect().toSeq
    assert(again === out)
  }

  test("corpus histogram partitions the corpus: counts sum to total, pct to 100") {
    val docs = Tables.load(spark, dir, "documents")
    val out = Documents.corpusHistogram(docs)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.map(_._2).sum === docs.count())
    assert(math.abs(out.map(_._3).sum - 100.0) < 0.05) // per-bucket 4-dp rounding
    assert(out.forall(_._1 % 10 == 0))
    assert(out.map(_._1) === out.map(_._1).sorted)
  }
}
