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

  test("f= pagination: hit windows tile the total order") {
    import graft.query.QueryParams
    val all = Search.search(corpus, "sched*|alg*|practice", k = 10).hits
    assert(all.size === 3)
    // page size 1, offsets 0/1/2: concatenation == the un-paginated order
    val pages = (0 until 3).flatMap { f =>
      Search.search(corpus, "sched*|alg*|practice", k = 1,
        params = QueryParams(firstHit = f)).hits
    }
    assert(pages === all)
    // offset past the end: empty page, not an error
    assert(Search.search(corpus, "sched*", k = 5,
      params = QueryParams(firstHit = 10)).hits.isEmpty)
  }

  test("rd= doc rank modes order hits by doc id") {
    import graft.query.QueryParams
    val asc = Search.search(corpus, "sched*|alg*|practice", k = 10,
      params = QueryParams.withRankDocs("1")).hits.map(_.id)
    assert(asc === Seq(1L, 2L, 3L))
    val desc = Search.search(corpus, "sched*|alg*|practice", k = 10,
      params = QueryParams.withRankDocs("1d")).hits.map(_.id)
    assert(desc === Seq(3L, 2L, 1L))
    // score ascending ('0a'): reverse score order of the default
    val byScore = Search.search(corpus, "sched*|alg*|practice", k = 10).hits.map(_.score)
    val ascScore = Search.search(corpus, "sched*|alg*|practice", k = 10,
      params = QueryParams.withRankDocs("0a")).hits.map(_.score)
    assert(ascScore === byScore.sorted)
  }

  test("rw= word rank modes order completions") {
    import graft.query.QueryParams
    // doc 1+2 match "sched*"; completions of trailing prefix "s*"
    val q = "sched* s*"
    val byWord = Search.search(corpus, q, k = 10,
      params = QueryParams.withRankWords("3")).completions.map(_.text)
    assert(byWord === byWord.sorted)
    val byDc = Search.search(corpus, q, k = 10,
      params = QueryParams.withRankWords("1")).completions
    assert(byDc.map(_.dc) === byDc.map(_.dc).sortBy(-_))
    val byOc = Search.search(corpus, q, k = 10,
      params = QueryParams.withRankWords("2")).completions
    assert(byOc.map(_.oc) === byOc.map(_.oc).sortBy(-_))
  }

  test("en= multiple excerpts per hit join with ellipses") {
    import graft.query.QueryParams
    val c = Seq((1L, "alpha x x x x x x x x alpha tail")).toDF("doc_id", "text")
    val one = Search.search(c, "alpha", k = 1, excerptRadius = 1).hits.head.excerpt
    assert(one === "<hl>alpha</hl> x") // default en=1: first match window only
    val two = Search.search(c, "alpha", k = 1, excerptRadius = 1,
      params = QueryParams(excerptsPerHit = 2)).hits.head.excerpt
    assert(two === "<hl>alpha</hl> x ... x <hl>alpha</hl> tail")
  }

  test("fd= fuzzy damping scales fuzzy-match scores") {
    import graft.query.QueryParams
    val full = Search.search(corpus, "schedulling~", k = 10).hits
    assert(full.nonEmpty)
    val damped = Search.search(corpus, "schedulling~", k = 10,
      params = QueryParams(fuzzyDamping = 0.5)).hits
    assert(damped.map(_.id) === full.map(_.id))
    full.zip(damped).foreach { case (f, d) =>
      assert(math.abs(d.score - f.score / 2) <= 1e-4,
        s"damped score ${d.score} != half of ${f.score}")
    }
    // non-fuzzy queries are untouched by fd
    val plain = Search.search(corpus, "practice", k = 10,
      params = QueryParams(fuzzyDamping = 0.5)).hits
    assert(plain === Search.search(corpus, "practice", k = 10).hits)
  }
}
