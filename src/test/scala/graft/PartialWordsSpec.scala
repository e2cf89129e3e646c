package graft

import graft.core.PartialWords
import org.scalatest.funsuite.AnyFunSuite

class PartialWordsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pairs: dictionary words contained in vocabulary words, first position") {
    val prim = Seq("spark", "table", "part", "row").toDF("word")
    val sec = Seq("par", "tab", "art", "ray", "ow").toDF("word")
    val got = PartialWords.pairs(prim, sec, minLen = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // 'ow' is below minLen, 'ray' occurs nowhere; positions are 1-based
    assert(got === Set(
      ("spark", "par", 2L), ("table", "tab", 1L),
      ("part", "par", 1L), ("part", "art", 2L)))
  }

  test("pairs: equal words are not partial words of themselves") {
    val v = Seq("par").toDF("word")
    assert(PartialWords.pairs(v, v, minLen = 3).count() === 0)
  }

  test("expandDocTerms emits partials at the containing word's positions") {
    val dt = Seq(
      (1L, "table", 2L, Array(3, 7), 10L),
      (1L, "spark", 1L, Array(5), 10L),
      (2L, "row", 1L, Array(0), 4L)
    ).toDF("doc_id", "term", "tf", "positions", "dl")
    val pairs = Seq(("table", "tab"), ("spark", "par")).toDF("word", "partial")
    val got = PartialWords.expandDocTerms(dt, pairs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getSeq[Int](3).toList, r.getLong(4))).toSet
    assert(got === Set(
      (1L, "tab", 2L, List(3, 7), 10L),
      (1L, "par", 1L, List(5), 10L)))
  }
}
