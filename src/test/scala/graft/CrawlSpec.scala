package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Crawl
import graft.streaming.CrawlIngest

/** The crawl front end: robots.txt group scoping and precedence, HTML
  * extraction inversion, WARC framing + quarantine + resync. */
class CrawlSpec extends SparkSuite {
  import spark.implicits._

  test("robotsRules: group scoping, comments, multi-agent groups, empty disallow") {
    val txt =
      """# top comment
        |User-agent: BadBot
        |Disallow: /
        |
        |User-agent: GoodBot
        |User-agent: *
        |Disallow: /private   # comment after value
        |Allow: /private/ok
        |Crawl-delay: 5
        |Sitemap: https://x/s.xml
        |Disallow:
        |
        |User-agent: Other
        |Disallow: /other
        |""".stripMargin
    val rules = Crawl.robotsRules(Seq(("h.example.com", txt)).toDF("host", "robots_txt"))
      .select("allow", "prefix", "plen").as[(Boolean, String, Int)].collect().sortBy(_._2)
    // BadBot's blanket Disallow and Other's rule must NOT appear; the
    // multi-UA group (GoodBot + *) applies; empty Disallow is dropped
    assert(rules.toSeq === Seq((false, "/private", 8), (true, "/private/ok", 11)))
    // RFC 9309 allows blank/comment lines BETWEEN stacked user-agent
    // lines of one group — the rules must still bind to *
    val gap =
      """User-agent: *
        |
        |# which bots this applies to continues...
        |User-agent: googlebot
        |Disallow: /private
        |""".stripMargin
    val gapRules = Crawl.robotsRules(Seq(("g.example.com", gap)).toDF("host", "robots_txt"))
      .select("allow", "prefix").as[(Boolean, String)].collect()
    assert(gapRules.toSeq === Seq((false, "/private")),
      "a blank line between stacked UA lines must not split the group")
  }

  test("robots wildcards: * spans, trailing $ anchors, metacharacters stay literal") {
    val txt =
      """User-agent: *
        |Disallow: /*.php
        |Disallow: /private*
        |Disallow: /exact$
        |Allow: /private*/ok
        |""".stripMargin
    val robots = Seq(("w.example.com", txt)).toDF("host", "robots_txt")
    val urls = Seq(
      (1L, "w.example.com", "/page.php"),          // /*.php → blocked
      (2L, "w.example.com", "/a/b/deep.php"),      // /*.php matches any depth
      (3L, "w.example.com", "/page.phpx"),         // .php not at a boundary: still matches prefix-wise? no — /*.php has no anchor, '/page.phpx' contains '.php' → blocked (RFC semantics: pattern matches a PREFIX of the path)
      (4L, "w.example.com", "/privateX/y"),        // /private* → blocked
      (5L, "w.example.com", "/privateX/ok"),       // longer Allow wins
      (6L, "w.example.com", "/exact"),             // /exact$ → blocked
      (7L, "w.example.com", "/exactly"),           // $ anchor: NOT blocked
      (8L, "w.example.com", "/clean")              // no rule
    ).toDF("doc_id", "host", "url_path")
    val got = Crawl.robotsVerdict(urls, Crawl.robotsRules(robots))
      .select("doc_id", "allowed").as[(Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(1L -> false, 2L -> false, 3L -> false,
      4L -> false, 5L -> true, 6L -> false, 7L -> true, 8L -> true))
  }

  test("crawl_robots_filter: precedence (longest wins, allow beats disallow), decoys ignored") {
    val out = Crawl.crawlRobotsFilter(spark, SparkSpec.sfTiny)
      .as[(Long, String, Boolean, String)].collect()
    assert(out.length === 500)
    val docs = Tables.load(spark, SparkSpec.sfTiny, "documents")
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    out.foreach { case (id, path, allowed, rule) =>
      val k = (docs(id)(0).toInt % 5)
      val r = (id % 5).toInt; val p = (id % 7).toInt
      assert(path === s"/r$r/p$p")
      val expAllowed = r != k || p == 3
      assert(allowed === expAllowed, s"doc $id path $path k=$k")
      val expRule = if (r == k && p == 3) s"/r$k/p3" else if (r == k) s"/r$k" else ""
      assert(rule === expRule, s"doc $id")
    }
    // sanity: the fixture actually exercises both outcomes
    assert(out.exists(!_._3) && out.count(!_._3) < out.length)
  }

  test("htmlExtract inverts the wrapper; script bodies with markup never leak") {
    val df = Seq((7L, "alpha & <beta> \"gamma\" don't stop")).toDF("doc_id", "text")
    val got = df.select(Crawl.htmlExtract(
      Crawl.htmlWrapExpr(col("doc_id"), col("text"))).as("x")).as[String].head()
    assert(got === "Home | About Doc 7 alpha & <beta> \"gamma\" don't stop © 2024 Example")
    // hostile page: unclosed tags, entity soup, style/script in body
    val page = """<body><style>p{}</style>ok<script>if(a<b){x="</p>"}</script> fine<p>&amp;lt;</p>"""
    val got2 = Seq(page).toDF("h").select(Crawl.htmlExtract(col("h")).as("x")).as[String].head()
    assert(got2 === "ok fine &lt;", s"got '$got2'")
  }

  test("WARC: framing round trip; corrupt records quarantine and resync without eating neighbors") {
    val docs = Seq(
      (0L, "en", "corrupt me"),            // 0 % 97 == 0 → lying length
      (1L, "de", "first good payload"),
      (2L, "fr", "x" * 300),               // long payload
      (97L, "es", "also corrupt"),         // another lying record
      (98L, "zh", "last good"))
    val blob = Crawl.warcBlob(docs.iterator)
    val rows = Crawl.warcParse(blob).sortBy(_._1)
    assert(rows.map(_._1) === Seq(
      "https://de.example.com/warc/1",
      "https://fr.example.com/warc/2",
      "https://zh.example.com/warc/98"))
    assert(rows.forall(_._2 == 200))
    assert(rows.map(_._3.length) === Seq(18, 300, 9))
    assert(rows(0)._3 === "first good payload")
    // payloads containing the WARC magic must not confuse framing
    // (length-jump parsing, never separator splitting)
    val tricky = Seq((1L, "en", "WARC/1.0\r\nfake: header\r\n\r\ninner"),
      (2L, "en", "tail"))
    val trows = Crawl.warcParse(Crawl.warcBlob(tricky.iterator)).sortBy(_._1)
    assert(trows.map(_._1) === Seq("https://en.example.com/warc/1",
      "https://en.example.com/warc/2"))
    assert(trows(0)._3.startsWith("WARC/1.0"))
    // truncated blob: reject the torn record, keep the rest, never throw
    val cut = Crawl.warcParse(blob.take(blob.length - 5))
    assert(cut.length === 2, "torn last record must be quarantined")
    assert(Crawl.warcParse(Array.emptyByteArray) === Seq())
    assert(Crawl.warcParse("garbage".getBytes) === Seq())
  }

  test("crawl_pipeline: the composed front end matches the closed form at every stage") {
    val out = Crawl.crawlPipeline(spark, SparkSpec.sfTiny)
      .as[(String, Long, Long)].collect()
    val docs = Tables.load(spark, SparkSpec.sfTiny, "documents")
      .select("doc_id", "lang").as[(Long, String)].collect()
    val survivors = docs.filter { case (id, lang) =>
      val k = lang(0).toInt % 5
      val r = (id % 5).toInt; val p = (id % 7).toInt
      id % 97 != 0 && (r != k || p == 3)
    }
    val expected = survivors
      .groupBy { case (id, lang) =>
        s"https://$lang.example.com/r${id % 5}/p${id % 7}"
      }
      .map { case (urlC, grp) => (urlC, grp.map(_._1).min, grp.size.toLong) }
      .toSeq.sortBy(_._1)
    assert(out.toSeq === expected)
    // sanity: all three stages actually pruned/merged something
    assert(survivors.length < docs.length, "robots/warc must drop docs")
    assert(out.length < survivors.length, "canonical dedup must merge variants")
  }

  test("streaming crawl ingest: robots gate, canonical first-fetch dedup across batches, replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    val base = new java.io.File("target/crawl-ingest-spec")
    rm(base)
    def page(text: String) = s"<body><p>$text</p></body>"
    def blob(recs: (String, String, Boolean)*): Array[Byte] =
      Crawl.warcBlobRecords(recs.iterator.map { case (u, t, c) => (u, page(t), c) })
    val robots = Seq(("en.example.com",
      "User-agent: *\nDisallow: /blocked\nAllow: /blocked/ok\n")).toDF("host", "robots_txt")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val stream = MemoryStream[(java.sql.Timestamp, Array[Byte])]
    val q = CrawlIngest.ingestWarc(
      stream.toDF().toDF("ts", "blob"), robots,
      s"$base/ledger", s"$base/corpus", s"$base/ckpt")
    try {
      val batch1 = blob(
        ("https://en.example.com/a", "doc a", false),
        ("https://en.example.com/blocked/x", "never admit", false), // robots
        ("https://en.example.com/blocked/ok", "allow exception", false),
        ("https://en.example.com/corrupt", "torn", true),           // quarantine
        // same canonical resource twice in one batch (tracking params)
        ("https://en.example.com/a?utm_source=x", "doc a refetch", false))
      stream.addData(Seq((ts("2024-01-01 10:00:00"), batch1)))
      q.processAllAvailable()
      val c1 = spark.read.parquet(s"$base/corpus")
        .select("canonical_url", "text").as[(String, String)].collect().sortBy(_._1)
      assert(c1.map(_._1).toSeq === Seq("https://en.example.com/a",
        "https://en.example.com/blocked/ok"))
      assert(c1(0)._2 === "doc a", "first-fetch winner must be deterministic")
      // batch 2: refetch of /a via a different surface form → dropped
      // against the STANDING ledger; one genuinely new resource
      stream.addData(Seq((ts("2024-01-01 10:30:00"), blob(
        ("http://WWW.EN.example.com/a/", "doc a again", false),
        ("https://en.example.com/b", "doc b", false)))))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"batch must not fail: ${q.exception}")
      val c2 = spark.read.parquet(s"$base/corpus")
        .select("canonical_url").as[String].collect().sorted
      assert(c2.toSeq === Seq("https://en.example.com/a",
        "https://en.example.com/b", "https://en.example.com/blocked/ok"))
      // batch 3 arrives as a real .warc.gz blob (one gzip member per
      // record): the same walker admits the new resource; the standing
      // ledger still drops the refetch surface variant
      stream.addData(Seq((ts("2024-01-01 11:00:00"), Crawl.warcBlobRecordsGz(Seq(
        ("https://en.example.com/c", page("doc c"), false),
        ("https://en.example.com/b?utm_source=x", page("doc b refetch"), false)).iterator))))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"gzip batch must not fail: ${q.exception}")
      val c3 = spark.read.parquet(s"$base/corpus")
        .select("canonical_url").as[String].collect().sorted
      assert(c3.toSeq === Seq("https://en.example.com/a",
        "https://en.example.com/b", "https://en.example.com/blocked/ok",
        "https://en.example.com/c"))
    } finally q.stop()
    // checkpoint-retry batch 1: the set-exclusion read hides exactly the
    // first attempt, so corpus and ledger come out identical
    val again = Seq((ts("2024-01-01 10:00:00"), blob(
      ("https://en.example.com/a", "doc a", false),
      ("https://en.example.com/blocked/x", "never admit", false),
      ("https://en.example.com/blocked/ok", "allow exception", false),
      ("https://en.example.com/corrupt", "torn", true),
      ("https://en.example.com/a?utm_source=x", "doc a refetch", false)))).toDF("ts", "blob")
    CrawlIngest.processBatch(again, 0L,
      graft.streaming.RunToken.of(spark, s"$base/ckpt"),
      Crawl.robotsRules(robots), s"$base/ledger", s"$base/corpus")
    val cR = spark.read.parquet(s"$base/corpus")
      .select("canonical_url", "text").as[(String, String)].collect().sortBy(_._1)
    assert(cR.map(_._1).toSeq === Seq("https://en.example.com/a",
      "https://en.example.com/b", "https://en.example.com/blocked/ok",
      "https://en.example.com/c"),
      s"replay changed corpus: ${cR.toSeq}")
    assert(cR(0)._2 === "doc a", "replay must reproduce the deterministic winner")
    val lR = spark.read.parquet(s"$base/ledger")
      .select("canonical_url").distinct().count()
    assert(lR === 4L, "replay changed the ledger")
  }

  test("crawl_warc_ingest: survivors match the closed form; partitioning never changes rows") {
    val out = Crawl.crawlWarcIngest(spark, SparkSpec.sfTiny)
      .as[(String, Int, Long)].collect()
    val docs = Tables.load(spark, SparkSpec.sfTiny, "documents")
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect()
    // both quarantine classes: % 97 lying Content-Length (WARC level),
    // % 202 flipped deflate byte (gzip member level)
    val expected = docs.filter(d => d._1 % 97 != 0 && d._1 % 202 != 0)
      .map(d => (s"https://${d._2}.example.com/warc/${d._1}", 200, d._3.length.toLong))
      .sortBy(_._1)
    assert(out.toSeq === expected.toSeq)
    // blobs are per-partition; records are self-contained
    val repart = Crawl.crawlWarcIngest(spark, SparkSpec.sfTiny)
    assert(repart.count() === expected.length.toLong)
  }

  test("WARC gzip: mixed plain/member blobs frame; corrupt members quarantine without eating neighbors") {
    // 202 → gzip member with a flipped deflate byte (must vanish WHOLE,
    // neighbors intact); 194 = 2·97 → VALID gzip member whose inner
    // record lies about Content-Length (the WARC-level quarantine must
    // fire inside the decompressed member); evens gzip, odds plain
    val docs = Seq(
      (201L, "en", "plain before"),
      (202L, "en", "corrupt gz member"),
      (203L, "de", "plain after"),
      (204L, "fr", "good gz member"),
      (194L, "es", "lying record in valid member"),
      (195L, "zh", "plain tail"))
    val blob = Crawl.warcBlob(docs.iterator)
    // the fixture really mixes framings: plain magic AND gzip magic
    def count(pat: Array[Byte]): Int =
      (0 to blob.length - pat.length).count(o => pat.indices.forall(i => blob(o + i) == pat(i)))
    assert(count("WARC/1.0\r\n".getBytes) >= 4, "plain records present")
    assert(count(Array(0x1f.toByte, 0x8b.toByte, 0x08.toByte)) >= 3, "gzip members present")
    val rows = Crawl.warcParse(blob).sortBy(_._1)
    assert(rows.map(_._1) === Seq(
      "https://de.example.com/warc/203",
      "https://en.example.com/warc/201",
      "https://fr.example.com/warc/204",
      "https://zh.example.com/warc/195"))
    assert(rows.map(_._3) === Seq("plain after", "plain before",
      "good gz member", "plain tail"))
  }

  test("WARC gzip: spec-conformant .warc.gz (member per record) and whole-file single member both parse") {
    val recs = Seq(
      ("https://en.example.com/1", "<p>one</p>", false),
      ("https://en.example.com/2", "<p>two</p>", true), // lying length
      ("https://en.example.com/3", "<p>three</p>", false))
    // one gzip member per record — the Common Crawl convention
    val perRecord = Crawl.warcParse(Crawl.warcBlobRecordsGz(recs.iterator)).sortBy(_._1)
    assert(perRecord.map(_._1) ===
      Seq("https://en.example.com/1", "https://en.example.com/3"))
    assert(perRecord.map(_._3) === Seq("<p>one</p>", "<p>three</p>"))
    // tolerant reading: the ENTIRE multi-record plain blob inside one
    // gzip member (whole-file compression) must parse identically
    val whole = Crawl.warcParse(Crawl.gzMember(Crawl.warcBlobRecords(recs.iterator))).sortBy(_._1)
    assert(whole === perRecord)
  }

  test("gunzipMember: trailer verification, truncation, reserved bits — quarantine, never throw") {
    val rec = Crawl.recordBytes("https://x.example.com/a", "payload", corrupt = false)
    val member = Crawl.gzMember(rec)
    val ok = Crawl.gunzipMember(member, 0)
    assert(ok.isDefined)
    assert(ok.get._1.toSeq === rec.toSeq, "decompressed bytes must round-trip")
    assert(ok.get._2 === member.length, "next offset must land past the trailer")
    // flipped CRC byte: inflate may still 'succeed' — the trailer check must reject
    val badCrc = member.clone()
    badCrc(badCrc.length - 8) = (badCrc(badCrc.length - 8) ^ 0x1).toByte
    assert(Crawl.gunzipMember(badCrc, 0).isEmpty, "CRC mismatch must quarantine")
    // truncated member (mid-deflate): no throw, no partial output
    assert(Crawl.gunzipMember(member.take(member.length / 2), 0).isEmpty)
    // RFC 1952 reserved FLG bits must be zero
    val badFlg = member.clone()
    badFlg(3) = (badFlg(3) | 0x80).toByte
    assert(Crawl.gunzipMember(badFlg, 0).isEmpty)
    // concatenated members walk by returned offsets
    val two = member ++ Crawl.gzMember(rec)
    val first = Crawl.gunzipMember(two, 0).get
    assert(Crawl.gunzipMember(two, first._2).isDefined)
  }

  test("robotsVerdict: past the broadcast budget the rules join degrades to shuffle, byte-identical") {
    val txt = "User-agent: *\nDisallow: /blocked\nAllow: /blocked/ok\nDisallow: /*.php\n"
    val robots = Seq(("h.example.com", txt)).toDF("host", "robots_txt")
    val urls = (1L to 50L).map(i =>
      (i, "h.example.com", if (i % 3 == 0) s"/blocked/p$i"
         else if (i % 7 == 0) s"/page$i.php" else s"/ok/p$i"))
      .toDF("doc_id", "host", "url_path")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1") // the plans below prove the HINT's decision
    try {
      // the cached rules side embeds its OWN materialization plan
      // (which legitimately contains robotsRules' inner starGroups
      // broadcast) in the plan dump — assert only on the verdict
      // join's shape ABOVE the InMemoryRelation
      def topPlan(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.executedPlan.toString.split("InMemoryRelation")(0)
      val fits = Crawl.robotsVerdict(urls, Crawl.robotsRules(robots))
      val fitsPlan = topPlan(fits)
      assert(fitsPlan.contains("BroadcastHashJoin"),
        "rules fit at test scale — expected broadcast:\n" + fitsPlan.take(3000))
      val a = fits.orderBy("doc_id").collect().toSeq
      graft.Caches.release(spark)
      // 1-byte budget: the measured decision must flip to a shuffled
      // join — the 100×-crawl regime where distinct hosts outgrow the
      // executors — with the SAME verdicts
      val degraded = Crawl.robotsVerdict(urls, Crawl.robotsRules(robots), broadcastBudget = 1L)
      val degradedPlan = topPlan(degraded)
      assert(!degradedPlan.contains("BroadcastHashJoin"),
        "past the budget the rules join must degrade:\n" + degradedPlan.take(3000))
      assert(degradedPlan.contains("SortMergeJoin") || degradedPlan.contains("ShuffledHashJoin"),
        "expected a shuffled join past the budget:\n" + degradedPlan.take(3000))
      val b = degraded.orderBy("doc_id").collect().toSeq
      assert(a === b, "join regime must never change verdicts")
    } finally {
      spark.conf.set(key, prev)
      graft.Caches.release(spark)
    }
  }

  test("live auto-compaction: a retried batch never races the compactor; probe row-set invariant") {
    import graft.streaming.{IndexMaintenance, ReplaySafeSink}
    val base = new java.io.File("target/crawl-compact-spec")
    if (base.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(base)
    }
    val dir = s"${base.getPath}/ledger"
    val token = "tok0123abcd0"
    for (b <- 0L to 4L)
      ReplaySafeSink.writeBatch(Seq(s"u$b").toDF("canonical_url"), dir, token, b)
    def probe(b: Long): Seq[String] =
      ReplaySafeSink.standingRows(spark, dir, token, b).get
        .select("canonical_url").as[String].collect().sorted.toSeq
    val pre = probe(4L)
    assert(pre === Seq("u0", "u1", "u2", "u3"))
    // the cadence hook, as CrawlIngest fires it inside foreachBatch(4)
    // AFTER batch 4's own write: batches 0..3 consolidate, the live
    // (token, 4) partition must stay exactly where a retry overwrites
    val n = IndexMaintenance.autoCompact(spark, dir, token, 4L, everyBatches = 2)
    assert(n === 4, "batches 0..3 must consolidate away")
    assert(probe(4L) === pre,
      "compaction must not change what a retry of the live batch sees")
    assert(new java.io.File(s"$dir/ingest_run=$token/batch_id=4").exists(),
      "the live batch's partition must be untouched")
    assert(!new java.io.File(s"$dir/ingest_run=$token/batch_id=3").exists(),
      "retired batch partitions must be gone")
    // the retry itself: deterministic rewrite of (token, 4) — final
    // row set identical, nothing duplicated or lost
    ReplaySafeSink.writeBatch(Seq("u4").toDF("canonical_url"), dir, token, 4L)
    assert(spark.read.parquet(dir).select("canonical_url")
      .as[String].collect().sorted.toSeq === Seq("u0", "u1", "u2", "u3", "u4"))
    // next cadence point consolidates the prior compact generation and
    // the now-retired batch 4; rows still invariant
    assert(IndexMaintenance.autoCompact(spark, dir, token, 6L, everyBatches = 2) === 2)
    assert(spark.read.parquet(dir).select("canonical_url")
      .as[String].collect().sorted.toSeq === Seq("u0", "u1", "u2", "u3", "u4"))
    // off-cadence calls are free no-ops
    assert(IndexMaintenance.autoCompact(spark, dir, token, 7L, everyBatches = 2) === 0)
  }

  test("robotsRules: past the broadcast budget the star-group join degrades to shuffle, byte-identical") {
    // starGroups is ~1 row per distinct host — the frame that outgrows
    // the broadcast budget at production host counts. Force the budget
    // below it and require the SAME parsed rules from a shuffled join.
    val txt = "User-agent: BadBot\nDisallow: /\n\n" +
      "User-agent: *\nDisallow: /blocked\nAllow: /blocked/ok\n\n" +
      "User-agent: Other\nDisallow: /p\n"
    val robots = (1 to 40).map(i => (s"h$i.example.com", txt))
      .toDF("host", "robots_txt")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1") // the plans below prove the HINT's decision
    try {
      def topPlan(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.executedPlan.toString.split("InMemoryRelation")(0)
      val fits = Crawl.robotsRules(robots)
      assert(topPlan(fits).contains("BroadcastHashJoin"),
        "star groups fit at test scale — expected broadcast:\n" + topPlan(fits).take(3000))
      val a = fits.orderBy("host", "allow", "prefix").collect().toSeq
      assert(a.nonEmpty && a.forall(_.getString(2).startsWith("/blocked")),
        "only the * group's rules may survive")
      graft.Caches.release(spark)
      val degraded = Crawl.robotsRules(robots, broadcastBudget = 1L)
      val degradedPlan = topPlan(degraded)
      assert(!degradedPlan.contains("BroadcastHashJoin"),
        "past the budget the star-group join must degrade:\n" + degradedPlan.take(3000))
      assert(degradedPlan.contains("SortMergeJoin") || degradedPlan.contains("ShuffledHashJoin"),
        "expected a shuffled join past the budget:\n" + degradedPlan.take(3000))
      val b = degraded.orderBy("host", "allow", "prefix").collect().toSeq
      assert(a === b, "join regime must never change the parsed rules")
    } finally {
      spark.conf.set(key, prev)
      graft.Caches.release(spark)
    }
  }

  test("canonicalReduce: slim and classic regimes byte-identical, incl. multi-fetch tie-breaks") {
    // every exactness hazard of the slim path in one fixture: a plain
    // multi-variant group, a singleton, a group whose WINNING url was
    // fetched twice with different texts (the text tie-break the slim
    // winner pick alone cannot see), an identical double-fetch (the
    // anti-join alone would keep both copies), and an ambiguous group
    // whose repeated url is NOT the winner (the conservative flag
    // routes it through the classic reduce anyway — correct, just not
    // minimal)
    val rows = Seq(
      ("c1", "u12", "tB"), ("c1", "u11", "tA"), ("c1", "u13", "tC"),
      ("c2", "u21", "tX"),
      ("c3", "u31", "tZ"), ("c3", "u31", "tY"), ("c3", "u32", "tA"),
      ("c4", "u41", "t1"), ("c4", "u41", "t1"),
      ("c5", "u51", "tQ"), ("c5", "u52", "tR"), ("c5", "u52", "tS")
    ).toDF("canonical_url", "url", "text")
    def classic(d: org.apache.spark.sql.DataFrame) = d
      .groupBy("canonical_url")
      .agg(min_by(struct(col("url"), col("text")),
        struct(col("url"), col("text"))).as("w"))
      .select(col("canonical_url"), col("w.url").as("url"), col("w.text").as("text"))
    val expected = classic(rows).orderBy("canonical_url").collect().toSeq
    assert(expected.map(r => (r.getString(0), r.getString(1), r.getString(2))) ===
      Seq(("c1", "u11", "tA"), ("c2", "u21", "tX"), ("c3", "u31", "tY"),
        ("c4", "u41", "t1"), ("c5", "u51", "tQ")))
    try {
      val slim = Crawl.canonicalReduce(rows)
      val got = slim.orderBy("canonical_url").collect().toSeq
      assert(got === expected, "slim regime must be byte-identical to the classic reduce")
      // regime proof: the text stream's joins are broadcast anti/semi
      // (the exception set fits at test scale), never a shuffled join
      val p = slim.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
        "slim regime must anti-join the broadcast exception set:\n" + p.take(3000))
      graft.Caches.release(spark)
      // past the budget the operator degrades to the classic reduce
      val degraded = Crawl.canonicalReduce(rows, broadcastBudget = 1L)
      assert(degraded.orderBy("canonical_url").collect().toSeq === expected,
        "degraded regime must be byte-identical")
      assert(!degraded.queryExecution.executedPlan.toString.contains("LeftAnti"),
        "past the budget the classic reduce runs — no anti-join")
    } finally graft.Caches.release(spark)
  }
}
