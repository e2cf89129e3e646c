package graft

import graft.core.{Analysis, Tokenizer, WebCorpus}
import graft.query.Engine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator goldens over the reference gtest fixture
  * (CompleterBaseTest.cpp:60-130 / FIXTURES.md §2): 4 docs,
  * aachen/aal/aalglatt/aargau + babbeln/baby/babyboom/babylonisch.
  */
class EngineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The 14-posting fixture as documents (docIds 1..4). */
  lazy val corpus: DataFrame = Seq(
    (1L, "aachen aal aalglatt aargau"),
    (2L, "aachen aalglatt aal"),
    (3L, "babbeln baby babyboom babylonisch"),
    (4L, "babbeln baby babyboom")
  ).toDF("doc_id", "text")

  test("dictionary: dense lexicographic term ids with df/cf") {
    val dict = Analysis.dictionary(Analysis.docTerms(corpus))
      .orderBy("term_id").collect()
    val terms = dict.map(_.getAs[String]("term")).toSeq
    assert(terms === Seq("aachen", "aal", "aalglatt", "aargau",
      "babbeln", "baby", "babyboom", "babylonisch"))
    assert(dict.map(_.getAs[Long]("term_id")).toSeq === (0L to 7L))
    val byTerm = dict.map(r => r.getAs[String]("term") -> r.getAs[Long]("df")).toMap
    assert(byTerm("aachen") === 2 && byTerm("babylonisch") === 1)
  }

  test("prefix aa* matches the fixture word range") {
    val comps = Engine.topKCompletions(corpus, "aa", 10).collect()
    assert(comps.map(_.getAs[String]("term")).toSet ===
      Set("aachen", "aal", "aalglatt", "aargau"))
    val aal = comps.find(_.getAs[String]("term") == "aal").get
    assert(aal.getAs[Long]("dc") === 2 && aal.getAs[Long]("oc") === 2)
  }

  test("AND intersects on docId (intersect golden shape)") {
    // aachen AND babbeln -> empty; aachen AND aargau -> doc 1 only
    assert(Engine.topKAnd(corpus, Seq("aachen", "babbeln"), 10).count() === 0)
    val r = Engine.topKAnd(corpus, Seq("aachen", "aargau"), 10).collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L))
  }

  test("NOT is an anti-join on docId") {
    val r = Engine.topKNot(corpus, "aachen", Seq("aargau"), 10).collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSeq === Seq(2L))
  }

  test("OR unions doc sets") {
    val r = Engine.topKOr(corpus, Seq("aargau", "babylonisch"), 10).collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 3L))
  }

  test("phrase requires adjacency; proximity relaxes it") {
    // "aal aalglatt" adjacent only in doc 1 (doc 2 has aalglatt before aal)
    val ph = Engine.phraseDocs(corpus, "aal", "aalglatt").collect()
    assert(ph.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L))
    val px = Engine.proximityDocs(corpus, "aal", "aalglatt", -10, 10).collect()
    assert(px.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 2L))
  }

  test("join block keeps completions common to both sides") {
    // completions of "ba" in docs with babylonisch vs docs with babbeln
    val r = Engine.joinBlockTerms(corpus, "ba", "babylonisch", "babbeln").collect()
    assert(r.map(_.getString(0)).toSet ===
      Set("babbeln", "baby", "babyboom", "babylonisch"))
  }

  test("BM25 ranks rarer terms higher, ties broken by doc_id") {
    // babylonisch (df=1) must outscore babbeln (df=2) within doc 3
    val s = Analysis.scoredForTerms(corpus, Seq("babylonisch", "babbeln"))
      .filter($"doc_id" === 3L).collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Double]("score")).toMap
    assert(s("babylonisch") > s("babbeln"))
  }

  test("top-k aggregation golden: sum over query parts") {
    // topk fixture analog (FIXTURES.md §3): per-doc score = sum of parts
    val docs = Engine.topKAnd(corpus, Seq("babbeln", "baby"), 10).collect()
    assert(docs.map(_.getAs[Long]("doc_id")).toSet === Set(3L, 4L))
    // doc 4 is shorter -> higher per-term tf-part -> higher summed score
    val byDoc = docs.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(byDoc(4L) > byDoc(3L))
  }

  test("extraction invariant: byte-identical text per url (FIXTURES §6)") {
    val web = WebCorpus.fromDocuments(spark, "/root/testdata/sf0.001")
    val bad = web.select($"url", $"html", $"text").as[(String, Array[Byte], String)]
      .map { case (url, html, text) =>
        (url, WebCorpus.extractText(html) == text)
      }.filter(!_._2).count()
    assert(bad === 0L)
  }

  test("tokenizer parity: Spark pipeline equals sequential scorer input") {
    // row-wise: postings per doc == Tokenizer.tokenize applied sequentially
    val docs = corpus.collect().map(r => r.getLong(0) -> r.getString(1))
    val fromSpark = Analysis.postings(corpus).collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.pos).map(_.term).toSeq).toMap
    docs.foreach { case (id, text) =>
      assert(fromSpark.getOrElse(id, Seq()) === Tokenizer.tokenize(text))
    }
  }
}
