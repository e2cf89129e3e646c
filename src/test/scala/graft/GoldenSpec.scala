package graft

import graft.core.WebCorpus
import graft.index.{IndexBuilder, IndexReader}
import graft.query.{Engine, Executor}
import org.scalatest.funsuite.AnyFunSuite

/** Rank-identity gate (north rule): the distributed engine -- logical
  * plans, the physical block index with WAND, and the query-grammar
  * executor -- must reproduce the committed golden files produced by the
  * sequential obviously-correct scorer (tools.GenerateGoldens) exactly:
  * same docIds, same 4-dp BM25 scores, same order.
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"
  lazy val corpus = WebCorpus.fromDocuments(spark, sfDir)
  lazy val reader: IndexReader = {
    val dir = java.nio.file.Files.createTempDirectory("graft_golden_ix").toString
    IndexBuilder.build(spark, corpus, dir, numShards = 2)
    new IndexReader(spark, dir)
  }

  private def golden(name: String): Seq[String] =
    scala.io.Source.fromResource(s"goldens/$name.tsv").getLines().filter(_.nonEmpty).toSeq

  private def fmt(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(r => s"${r.getLong(0)}\t${r.getDouble(1)}").toSeq

  test("logical engine is rank-identical to the sequential scorer") {
    assert(fmt(Engine.topKSingle(corpus, "spark", 10)) === golden("or_spark"))
    assert(fmt(Engine.topKOr(corpus, Seq("spark", "hash"), 10)) === golden("or_spark_hash"))
    assert(fmt(Engine.topKAnd(corpus, Seq("spark", "join"), 10)) === golden("and_spark_join"))
    assert(fmt(Engine.topKPrefix(corpus, "st", 10)) === golden("prefix_st"))
    assert(fmt(Engine.topKPrefix(corpus, "b", 10)) === golden("prefix_b"))
  }

  test("physical index (incl. WAND pruning) is rank-identical") {
    assert(fmt(reader.topKOrFull(Seq("spark"), 10)) === golden("or_spark"))
    assert(fmt(reader.topKOrWand(Seq("spark", "hash", "merge"), 10)) ===
      golden("or_spark_hash_merge"))
    assert(fmt(reader.topKPrefixDocs("st", 10)) === golden("prefix_st"))
  }

  test("query-grammar executor is rank-identical") {
    assert(fmt(Executor.topK(corpus, "spark", 10)) === golden("or_spark"))
    assert(fmt(Executor.topK(corpus, "spark|hash", 10)) === golden("or_spark_hash"))
    assert(fmt(Executor.topK(corpus, "spark join", 10)) === golden("and_spark_join"))
    assert(fmt(Executor.topK(corpus, "st*", 10)) === golden("prefix_st"))
  }

  test("completions are rank-identical") {
    val got = Engine.topKCompletions(corpus, "s", 10).collect()
      .map(r => s"${r.getString(0)}\t${r.getDouble(1)}\t${r.getLong(2)}\t${r.getLong(3)}").toSeq
    assert(got === golden("completions_s"))
  }
}
