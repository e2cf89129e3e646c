package graft

import graft.api.Search
import org.scalatest.funsuite.AnyFunSuite

class SearchApiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val corpus = Seq(
    (1L, "scheduling algorithms for parallel systems"),
    (2L, "scheduling theory and practice"),
    (3L, "graph algorithms in practice")
  ).toDF("doc_id", "text")

  test("search returns hits with excerpts and completions of the last prefix") {
    val r = Search.search(corpus, "sched* alg*", k = 10)
    assert(r.hits.map(_.id) === Seq(1L))
    assert(r.hits.head.excerpt.contains("<hl>scheduling</hl>"))
    assert(r.hits.head.excerpt.contains("<hl>algorithms</hl>"))
    assert(r.completions.map(_.text) === Seq("algorithms"))
    val c = r.completions.head
    assert(c.dc === 1 && c.oc === 1)
  }

  test("JSON shape carries hits and completions") {
    val json = Search.search(corpus, "sched*", k = 10).toJson
    assert(json.contains(""""hits":{"sent":2"""))
    assert(json.contains(""""completions":{"sent":1"""))
    assert(json.contains(""""text":"scheduling""""))
  }

  test("exact-word query yields no completions block content") {
    val r = Search.search(corpus, "practice", k = 10)
    assert(r.completions.isEmpty)
    assert(r.hits.map(_.id).toSet === Set(2L, 3L))
  }
}
