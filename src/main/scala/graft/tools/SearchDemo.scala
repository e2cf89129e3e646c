package graft.tools

import graft.api.Search
import graft.core.WebCorpus
import org.apache.spark.sql.SparkSession

/** Demo main: one query through the full user-facing facade. */
object SearchDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val query = if (args.length > 1) args(1) else "spark st*"
    val spark = Cli.session("graft-search-demo")
    val corpus = WebCorpus.fromDocuments(spark, sfDir)
    println(Search.search(corpus, query, k = 3).toJson)
    spark.stop()
  }
}
