package graft

import graft.core.WebCorpus
import graft.index.IndexBuilder
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The custom Generator registered through SparkSessionExtensions must be
  * usable from plain SQL (LATERAL VIEW), matching the Scala decode path.
  */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("graft_postings_decode works from SQL") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ext_ix").toString
    val corpus = WebCorpus.fromDocuments(spark, "/root/testdata/sf0.001")
    IndexBuilder.build(spark, corpus, dir, numShards = 1)
    spark.read.parquet(s"$dir/blocks").createOrReplaceTempView("blocks")
    val viaSql = spark.sql(
      """SELECT term_id, p.doc_id, p.tf
        |FROM blocks
        |LATERAL VIEW graft_postings_decode(n_docs, doc_deltas, tfs, dls) p
        |""".stripMargin)
    val viaScala = new graft.index.IndexReader(spark, dir, cacheBlocks = false)
    val a = viaSql.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = viaScala.decode(viaScala.blocks)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b && a.nonEmpty)
  }
}
