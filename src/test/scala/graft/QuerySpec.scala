package graft

import graft.query.{Executor, QueryCache, QueryParser}
import graft.query.QueryParser._
import org.scalatest.funsuite.AnyFunSuite

class QueryParserSpec extends AnyFunSuite {

  test("splitAtLastSeparator analog: parts and separators") {
    val q = QueryParser.parse("sched* alg*")
    assert(q.parts.length === 2)
    assert(q.parts(0).atom === Word("sched", prefix = true))
    assert(q.parts(1).sep === Some(SameDoc))
  }

  test("phrase, near, same-pos separators") {
    assert(QueryParser.parse("a.b").parts(1).sep === Some(Phrase))
    assert(QueryParser.parse("a..b").parts(1).sep === Some(Near))
    assert(QueryParser.parse("a=b").parts(1).sep === Some(SamePos))
  }

  test("word modifiers: NOT, exact, fuzzy, synonym") {
    assert(QueryParser.parse("x -y").parts(1).atom === Word("y", not = true))
    assert(QueryParser.parse("y$").parts(0).atom === Word("y", exact = true))
    assert(QueryParser.parse("y~").parts(0).atom === Word("y", fuzzy = true))
    assert(QueryParser.parse("y^").parts(0).atom === Word("y", synonym = true))
  }

  test("OR alternatives and word ranges") {
    assert(QueryParser.parse("a|b|c*").parts(0).atom ===
      OrAtoms(Seq(Word("a"), Word("b"), Word("c", prefix = true))))
    assert(QueryParser.parse("year:1997--year:2005").parts(0).atom ===
      WordRange("year:1997", "year:2005"))
  }

  test("join blocks nest full queries") {
    val q = QueryParser.parse("[a b*#c]")
    q.parts(0).atom match {
      case JoinBlock(l, r) =>
        assert(l.parts.length === 2 && r.parts.length === 1)
        assert(l.parts(1).atom === Word("b", prefix = true))
      case other => fail(s"expected JoinBlock, got $other")
    }
  }

  test("queries are lowercased like the indexed terms") {
    assert(QueryParser.parse("SPARK").parts(0).atom === Word("spark"))
  }
}

class ExecutorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val corpus = Seq(
    (1L, "aachen aal aalglatt aargau"),
    (2L, "aachen aalglatt aal"),
    (3L, "babbeln baby babyboom babylonisch"),
    (4L, "babbeln baby babyboom")
  ).toDF("doc_id", "text")

  private def docsOf(q: String): Set[Long] =
    Executor.topK(corpus, q, 10).collect().map(_.getLong(0)).toSet

  test("single word, AND, NOT, OR through the grammar") {
    assert(docsOf("aachen") === Set(1L, 2L))
    assert(docsOf("aachen aargau") === Set(1L))
    assert(docsOf("aachen -aargau") === Set(2L))
    assert(docsOf("aargau|babylonisch") === Set(1L, 3L))
  }

  test("prefix and range atoms") {
    assert(docsOf("bab*") === Set(3L, 4L))
    assert(docsOf("aal--aargau") === Set(1L, 2L))
  }

  test("phrase vs near windows") {
    assert(docsOf("aal.aalglatt") === Set(1L))
    assert(docsOf("aal..aalglatt") === Set(1L, 2L))
  }

  test("fuzzy matches within edit distance") {
    assert(docsOf("aachen~") === Set(1L, 2L)) // exact term matches too
    assert(docsOf("aachan~") === Set(1L, 2L)) // 1 edit
  }

  test("chained three-part query stays left-deep") {
    assert(docsOf("babbeln baby babyboom") === Set(3L, 4L))
    assert(docsOf("babbeln.baby.babyboom") === Set(3L, 4L)) // chained phrases
  }

  test("windowed chain carries only MATCHED positions of the second list") {
    // 'babbeln baby' is adjacent (pos 3,4) and 'baby babyboom' is adjacent
    // (pos 0,1), but no CONTIGUOUS babbeln.baby.babyboom triple exists --
    // carrying all of baby's positions would falsely match this doc
    // (reference: intersect emits only the second list's matched postings)
    val c = (corpus.sparkSession.createDataFrame(Seq(
      (10L, "baby babyboom zzz babbeln baby"),
      (11L, "zzz babbeln baby babyboom zzz")))
      .toDF("doc_id", "text"))
    val r = Executor.topK(c, "babbeln.baby.babyboom", 10)
      .collect().map(_.getLong(0)).toSet
    assert(r === Set(11L))
  }

  test("windowed separator adjacent to a join block degrades to same-doc AND") {
    // join blocks carry no positions; '.' next to one must not crash
    assert(docsOf("babbeln.[babylonisch ba*#babbeln ba*]") === Set(3L, 4L))
    assert(docsOf("[babylonisch ba*#babbeln ba*].baby") === Set(3L, 4L))
  }

  test("join block [q1#q2] executes through the grammar") {
    // completions of ba* common to babylonisch-docs and babbeln-docs:
    // doc 3 carries all four; docs matching via common terms re-aggregate
    val r = Executor.topK(corpus, "[babylonisch ba*#babbeln ba*]", 10)
      .collect().map(_.getLong(0)).toSet
    assert(r === Set(3L, 4L)) // both sides' docs carrying common ba-terms
  }

  test("completions restricted to result docs") {
    val comps = Executor.completions(corpus, "babylonisch ba*", 10).collect()
      .map(_.getString(0)).toSet
    assert(comps === Set("babbeln", "baby", "babyboom", "babylonisch"))
  }
}

class ExcerptsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("generateAll: one window per match up to en, all matches highlighted") {
    val corpus = Seq(
      (1L, "x batch y z z z z batch w z z z batch q")).toDF("doc_id", "text")
    val hits = Seq(Tuple1(1L)).toDF("doc_id")
    val ex = graft.query.Excerpts.generateAll(corpus, hits,
        exact = Seq("batch"), prefixes = Seq.empty, er = 1, en = 2)
      .collect().head.getString(1)
    // matches at 1, 7, 12; en=2 -> first two anchors, er=1 windows
    assert(ex === "x <hl>batch</hl> y ... z <hl>batch</hl> w")
  }

  test("generateAll: multi-part ^ words match and highlight per part") {
    val corpus = Seq((1L, "the beethoven^ludwig sonata")).toDF("doc_id", "text")
    val hits = Seq(Tuple1(1L)).toDF("doc_id")
    val ex = graft.query.Excerpts.generateAll(corpus, hits,
        exact = Seq("ludwig"), prefixes = Seq.empty, er = 1, en = 3)
      .collect().head.getString(1)
    assert(ex === "the <hl>beethoven^ludwig</hl> sonata")
  }

  test("gate corpora contain no '^' (display-vs-index tokenizer divergence)") {
    // the excerpt oracles tokenize with the INDEX rules (split on '^');
    // the display tokenizer keeps '^' joined -- exact gate equality
    // therefore requires a caret-free corpus, which the shipped testdata is
    val corpus = graft.core.WebCorpus.fromDocuments(spark, "/root/testdata/sf0.001")
    assert(corpus.filter(org.apache.spark.sql.functions.col("text").contains("^")).isEmpty)
  }

  test("generateAll: overlapping windows clamp at doc edges") {
    val corpus = Seq((1L, "batch end")).toDF("doc_id", "text")
    val hits = Seq(Tuple1(1L)).toDF("doc_id")
    val ex = graft.query.Excerpts.generateAll(corpus, hits,
        exact = Seq("batch"), prefixes = Seq.empty, er = 2, en = 3)
      .collect().head.getString(1)
    assert(ex === "<hl>batch</hl> end")
  }
}

class QueryCacheSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("prefix filtering fast path reuses cached relation") {
    val corpus = Seq((1L, "schedule scheduling scheme"), (2L, "scheduling talk"))
      .toDF("doc_id", "text")
    val cache = new QueryCache(maxEntries = 10)
    val a = cache.matchedForPrefix(corpus, "sch")
    assert(a.count() === 4)
    assert(cache.misses === 1)
    val b = cache.matchedForPrefix(corpus, "schedul")
    assert(b.count() === 3)
    assert(cache.filteredHits === 1) // derived from cached "sch", no rescan
    val c = cache.matchedForPrefix(corpus, "schedul")
    assert(c.count() === 3)
    assert(cache.hits === 1)
    cache.clear()
  }

  test("warm list pre-materializes hot prefixes") {
    val corpus = Seq((1L, "alpha alphabet beta")).toDF("doc_id", "text")
    val cache = new QueryCache(maxEntries = 10)
    cache.warm(corpus, Seq("al", "be"))
    assert(cache.misses === 2)
    cache.matchedForPrefix(corpus, "al")
    assert(cache.hits === 1) // served from the warm list
    cache.clear()
  }

  test("re-top-k under new k / rank mode reuses cached postings") {
    val corpus = Seq(
      (1L, "alpha alpha alpha beta"),
      (2L, "alpha beta beta"),
      (3L, "alphabet gamma")).toDF("doc_id", "text")
    val cache = new QueryCache(maxEntries = 10)
    val top1 = cache.topHitsForPrefix(corpus, "alpha", 1)
    assert(top1.count() === 1)
    // changed k and rank mode: no new miss -- postings come from the cache
    val byDoc = cache.topHitsForPrefix(corpus, "alpha", 3, rankBy = "doc")
      .collect().map(_.getLong(0)).toSeq
    assert(byDoc === Seq(1L, 2L, 3L))
    assert(cache.misses === 1)
    assert(cache.hits === 1)
    // scores match the engine's prefix ranking
    val engine = graft.query.Engine.topKPrefix(corpus, "alpha", 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val cached = cache.topHitsForPrefix(corpus, "alpha", 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(cached === engine)
    cache.clear()
  }

  test("LRU evicts beyond capacity") {
    val corpus = Seq((1L, "aa ab ac ad")).toDF("doc_id", "text")
    val cache = new QueryCache(maxEntries = 2)
    cache.matchedForPrefix(corpus, "aa")
    cache.matchedForPrefix(corpus, "ab")
    cache.matchedForPrefix(corpus, "ac")
    cache.matchedForPrefix(corpus, "aa") // evicted -> recompute
    assert(cache.misses === 4)
    cache.clear()
  }
}
