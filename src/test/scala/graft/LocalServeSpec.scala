package graft

import graft.index.{IndexBuilder, IndexReader}
import graft.query.{IndexExecutor, LocalServe, QueryParams}
import org.scalatest.funsuite.AnyFunSuite

/** The driver-resident grammar path must be bit-identical to the
  * distributed Eval plans over EVERY grammar shape and knob -- the serving
  * seam's contract -- and must run ZERO Spark jobs warm.
  */
class LocalServeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // tf variety, shared prefixes, phrase/near structure, synonym pair
  lazy val corpus = Seq(
    (1L, "aachen aal aalglatt aargau aal"),
    (2L, "aachen aalglatt aal pad pad pad pad"),
    (3L, "babbeln baby babyboom babylonisch aachen"),
    (4L, "babbeln baby babyboom baby baby"),
    (5L, "merge aal aachen aargau merge"),
    (6L, "join aal zebra aachen join join"),
    (7L, "aal aachen aal aachen aal pad"),
    (8L, "zebra pad pad aachen aal aalglatt aargau")
  ).toDF("doc_id", "text")

  lazy val reader: IndexReader = {
    val dir = java.nio.file.Files.createTempDirectory("graft_localserve").toString
    IndexBuilder.build(spark, corpus, dir, numShards = 1, blockSize = 4)
    IndexBuilder.buildDocsStore(spark,
      corpus.withColumn("url", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("http://u/"), $"doc_id")), dir)
    new IndexReader(spark, dir)
  }

  private def hitsRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  private def complRows(df: org.apache.spark.sql.DataFrame): Seq[(String, Double, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSeq

  private val shapes = Seq(
    "aachen", "aachen aargau", "aachen -aargau", "aargau|babylonisch",
    "ba*", "aal--aargau", "aal.aalglatt", "aal..aalglatt", "aachen=aachen",
    "aachan~", "merge^", "babbeln.baby.babyboom", "aachen.,,.aal",
    "aal -zebra aachen", "aachen -nosuchword", "nosuchword",
    "aal aalglatt.aargau") // window chaining after a plain AND

  test("every grammar shape: local path serves it and equals the distributed plan") {
    shapes.foreach { q =>
      val local = LocalServe.hits(reader, q, 10, QueryParams.Default)
      assert(local.isDefined, s"expected the local path to serve: $q")
      assert(hitsRows(local.get) === hitsRows(IndexExecutor.topK(reader, q, 10)),
        s"local vs distributed mismatch for query: $q")
    }
  }

  test("score algebra / request knobs: paths identical") {
    def both(q: String, p: QueryParams): Unit = {
      val local = LocalServe.hits(reader, q, 10, p)
      assert(local.isDefined, s"expected local serve: $q / $p")
      assert(hitsRows(local.get) === hitsRows(IndexExecutor.hits(reader, q, 10, p)),
        s"query: $q params: $p")
    }
    both("aachen aal", QueryParams(partsAgg = QueryParams.Max))
    both("aa*", QueryParams(completionsAgg = QueryParams.Max))
    both("aal", QueryParams(sameCompletionAgg = QueryParams.Max))
    both("aal.aalglatt", QueryParams(partsAgg = QueryParams.SumWithBonus))
    both("aal..aalglatt", QueryParams(partsAgg = QueryParams.SumWithBonus))
    both("aal..aalglatt", QueryParams(window = Some((-2, 2))))
    both("aachen aal*", QueryParams(bestMatchBonus = 4.0))
    both("aachan~", QueryParams(fuzzyDamping = 0.5))
    both("aachen", QueryParams(normalizeWords = true))
    both("aachen aal", QueryParams(rankDocs = "doc"))
    both("aachen aal", QueryParams(rankDocs = "doc", sortDocsAsc = Some(false)))
    both("aal", QueryParams(rankDocs = "score", sortDocsAsc = Some(true)))
    both("aal aachen", QueryParams(firstHit = 2))
    both("aal", QueryParams(firstHit = 3))
  }

  test("completions: paths identical across word-side knobs and rank modes") {
    def both(q: String, p: QueryParams): Unit = {
      val local = LocalServe.completions(reader, q, 10, p)
      assert(local.isDefined, s"expected local serve: $q / $p")
      assert(complRows(local.get) ===
        complRows(IndexExecutor.completions(reader, q, 10, p)),
        s"query: $q params: $p")
    }
    both("aachen aa*", QueryParams.Default)
    both("ba*", QueryParams.Default)
    both("aachen aa*", QueryParams(wordSameDocAgg = QueryParams.Max))
    both("aachen aa*", QueryParams(wordDiffDocsAgg = QueryParams.Max))
    both("aachen aa*", QueryParams(rankWords = "dc"))
    both("aachen aa*", QueryParams(rankWords = "oc"))
    both("aachen aa*", QueryParams(rankWords = "word"))
    both("aachen aa*", QueryParams(rankWords = "word", sortWordsAsc = Some(false)))
    both("aal -zebra aa*", QueryParams.Default)
  }

  test("join blocks serve locally; fuzzy best-match stays distributed") {
    // join blocks joined the local grammar: chained, leading, n-ary
    for (q <- Seq("[aachen aa*#merge aa*]", "aal [aa*#aal*]",
        "[aa*#aal*] zebra", "[aa*#aal*#aal aa*]")) {
      val local = LocalServe.hits(reader, q, 10, QueryParams.Default)
      assert(local.isDefined, s"expected local serve for join block: $q")
      assert(hitsRows(local.get) === hitsRows(IndexExecutor.topK(reader, q, 10)),
        s"local vs distributed mismatch for: $q")
    }
    assert(LocalServe.hits(reader, "aachen aachan~", 10,
      QueryParams(bestMatchBonus = 2.0)).isEmpty,
      "fuzzy best-match resolution must fall back")
    // the serve facade answers both seams identically to the explicit path
    assert(hitsRows(IndexExecutor.serveHits(reader, "[aachen aa*#merge aa*]", 10))
      === hitsRows(IndexExecutor.topK(reader, "[aachen aa*#merge aa*]", 10)))
    assert(hitsRows(IndexExecutor.serveHits(reader, "aachen aachan~", 10,
      QueryParams(bestMatchBonus = 2.0), None))
      === hitsRows(IndexExecutor.topK(reader, "aachen aachan~", 10,
        QueryParams(bestMatchBonus = 2.0))))
  }

  test("k = 0 and page-past-the-end serve empty pages like the distributed path") {
    for (p <- Seq(QueryParams(firstHit = 0), QueryParams(firstHit = 5),
        QueryParams(rankDocs = "doc"))) {
      val local = LocalServe.hits(reader, "aachen aal", 0, p)
      assert(local.isDefined)
      assert(hitsRows(local.get) === hitsRows(IndexExecutor.hits(reader, "aachen aal", 0, p)))
    }
    val past = LocalServe.hits(reader, "aachen aal", 10, QueryParams(firstHit = 10000))
    assert(past.isDefined && hitsRows(past.get).isEmpty)
  }

  test("serveHits equals the reader-native serving facades on their shapes") {
    // the bench QuerySet routes keyword/OR/prefix through serveHits (the
    // client surface); the reader-native facades must agree exactly
    assert(hitsRows(IndexExecutor.serveHits(reader, "aachen", 10)) ===
      hitsRows(reader.serveTopKOr(Seq("aachen"), 10)))
    assert(hitsRows(IndexExecutor.serveHits(reader, "aachen|aal|merge", 10)) ===
      hitsRows(reader.serveTopKOr(Seq("aachen", "aal", "merge"), 10)))
    assert(hitsRows(IndexExecutor.serveHits(reader, "aa*", 10)) ===
      hitsRows(reader.servePrefixDocs("aa", 10)))
    assert(hitsRows(IndexExecutor.serveHits(reader, "ba*", 10)) ===
      hitsRows(reader.servePrefixDocs("ba", 10)))
  }

  test("whole-result history: repeats hit the page cache, keyed by params") {
    val q = "aachen aal aalglatt"
    val a = hitsRows(LocalServe.hits(reader, q, 10, QueryParams.Default).get)
    val n1 = LocalServe.cachedResultCount(reader)
    assert(n1 > 0)
    val b = hitsRows(LocalServe.hits(reader, q, 10, QueryParams.Default).get)
    assert(a === b)
    assert(LocalServe.cachedResultCount(reader) === n1,
      "a repeat must not add a history entry")
    // a different parameterization is a DIFFERENT history row (reference:
    // History re-computes on incompatible parameters)
    val p2 = QueryParams(firstHit = 1)
    val paged = hitsRows(LocalServe.hits(reader, q, 10, p2).get)
    assert(LocalServe.cachedResultCount(reader) === n1 + 1)
    assert(paged === hitsRows(IndexExecutor.hits(reader, q, 10, p2)))
  }

  test("concurrent mixed queries through the local path stay correct") {
    val qs = shapes.filterNot(_.contains("~")) // keep the pool cheap
    val expected = qs.map(q => q -> hitsRows(IndexExecutor.topK(reader, q, 10))).toMap
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 8).map { t =>
      new Thread(() => {
        try {
          for (i <- 0 until 40) {
            val q = qs((i + t) % qs.length)
            val got = hitsRows(LocalServe.hits(reader, q, 10, QueryParams.Default).get)
            if (got != expected(q)) errors.add(s"mismatch for $q on thread $t")
          }
        } catch { case e: Throwable => errors.add(s"thread $t: $e") }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, errors.toString)
  }

  test("local excerpt generation is identical to the distributed Excerpts plans") {
    import graft.query.{Excerpts, LocalServe => LS}
    // unicode + '^' multi-part + punctuation separators + multi-window
    val texts = Seq(
      (100L, "Aachen is OLD; aal, aalglatt! (aargau) STRASSE Über aal"),
      (101L, "beethoven^ludwig wrote music aal beethoven^x aal aal aal"),
      (102L, "no matching words here at all"),
      (103L, "aal " + (1 to 30).map(i => s"w$i").mkString(" ") + " aalglatt end"))
    val docsDf = texts.toDF("doc_id", "text")
    for ((exact, prefixes) <- Seq(
        (Seq("aal", "strasse"), Seq("aar")),
        (Seq("ludwig"), Seq("beet")),
        (Seq.empty[String], Seq("aal")));
        (er, en) <- Seq((2, 3), (1, 1), (3, 5))) {
      val hits = texts.map(_._1).map(Tuple1(_)).toDF("doc_id")
      val dist = Excerpts.generateAll(docsDf, hits, exact, prefixes, er, en)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      texts.foreach { case (id, text) =>
        assert(LS.generateAllLocal(text, exact, prefixes, er, en) === dist(id),
          s"doc $id exact=$exact prefixes=$prefixes er=$er en=$en")
      }
    }
  }

  test("full search (hits + completions + excerpts + urls) serves warm with ZERO jobs") {
    import graft.api.Search
    def run() = Search.searchIndex(reader, "aachen aa*", 5)
    val warm = run() // cold pass populates atom + docs LRUs
    assert(warm.hits.nonEmpty && warm.hits.forall(h =>
      h.url.nonEmpty && h.excerpt.contains("<hl>")))
    assert(warm.completions.nonEmpty)
    assert(graft.query.LocalServe.cachedDocCount(reader) > 0)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val again = run()
      assert(again.toJson === warm.toJson, "warm result must be identical")
      Thread.sleep(500) // listener bus is async
      assert(jobs.get() === 0, "warm full search must run no Spark jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("fallback search executes the hits plan once; excerpts/urls add no jobs") {
    import graft.api.Search
    // a fuzzy best-match resolution is a documented local-serve fallback:
    // the hits come back from the DISTRIBUTED plan even warm
    val fp = QueryParams(bestMatchBonus = 2.0)
    val q = "aal aachan~"
    assert(LocalServe.hits(reader, q, 5, fp).isEmpty,
      "precondition: this query must take the distributed fallback")
    val cold = Search.searchIndex(reader, q, 5, params = fp)
    assert(cold.hits.nonEmpty && cold.hits.forall(h =>
      h.url.nonEmpty && h.excerpt.contains("<hl>aal</hl>")))
    def countJobs(f: => Unit): Int = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try { f; Thread.sleep(500) } // listener bus is async
      finally spark.sparkContext.removeSparkListener(listener)
      jobs.get()
    }
    // warm docs LRU + warm atom history on both paths first
    val warm = Search.searchIndex(reader, q, 5, params = fp)
    assert(warm.toJson === cold.toJson)
    val hitsOnly = countJobs(
      graft.query.IndexExecutor.serveHits(reader, q, 5, fp, None).collect())
    val full = countJobs(assert(
      Search.searchIndex(reader, q, 5, params = fp).toJson === cold.toJson))
    // the full search = ONE execution of the hits plan; excerpt + url
    // serving reads the driver docs LRU, never re-runs the plan or joins
    assert(full <= hitsOnly,
      s"full search ran $full jobs vs $hitsOnly for the bare hits plan")
  }

  test("cold multi-atom query fetches all cold atoms in ONE postings collect") {
    def jobs(f: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          n.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try { f; Thread.sleep(500) } // listener bus is async
      finally spark.sparkContext.removeSparkListener(listener)
      n.get()
    }
    // fresh reader instances over the same index: per-instance atom/vocab
    // caches are COLD; an unrelated first query pays the reader's metadata
    // jobs so the measured difference isolates per-atom cost
    def coldJobs(q: String): Int = {
      val r = new IndexReader(spark, reader.dir)
      LocalServe.hits(r, "zebra", 5, QueryParams.Default).get.collect()
      val expected = hitsRows(IndexExecutor.topK(reader, q, 5))
      jobs {
        assert(hitsRows(LocalServe.hits(r, q, 5, QueryParams.Default).get)
          === expected)
      }
    }
    val single = coldJobs("aachen")
    val triple = coldJobs("aachen aal aargau")
    // postings for ALL cold atoms arrive via one batched pruned collect
    // and their vocabulary rows via one batched termInfo lookup: a cold
    // query's job count does not scale with its word count (pre-batch a
    // 3-word query paid 2 extra candidate jobs + 2 extra postings jobs)
    assert(triple <= single,
      s"cold 3-atom query ran $triple jobs vs $single for 1 atom")
  }

  test("warm grammar queries run ZERO Spark jobs") {
    val warmQueries = Seq("aachen aal*", "aal.aalglatt", "aachen -aargau",
      "aargau|babylonisch", "babbeln.baby.babyboom")
    warmQueries.foreach(q =>
      LocalServe.hits(reader, q, 10, QueryParams.Default).get.collect())
    LocalServe.completions(reader, "aachen aa*", 10, QueryParams.Default)
      .get.collect()
    assert(LocalServe.cachedAtomCount(reader) > 0)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      warmQueries.foreach(q =>
        LocalServe.hits(reader, q, 10, QueryParams.Default).get.collect())
      LocalServe.completions(reader, "aachen aa*", 10, QueryParams.Default)
        .get.collect()
      Thread.sleep(500) // listener bus is async
      assert(jobs.get() === 0, "warm local grammar serving must run no Spark jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
