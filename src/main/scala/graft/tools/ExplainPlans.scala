package graft.tools

import graft.core.WebCorpus
import graft.{FtQueries, IndexQueries}
import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for the load-bearing queries so pruning /
  * pushdown / codegen claims can be inspected (dev tool, not in the driver
  * contract).
  */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }

    show("ft_bm25_single (logical path)", FtQueries.bm25Single(spark, sfDir))
    val r = IndexQueries.reader(spark, sfDir)
    // uncached reader: shows parquet PartitionFilters / PushedFilters
    val rCold = new graft.index.IndexReader(spark, IndexQueries.indexDir(spark, sfDir),
      cacheBlocks = false)
    show("index: pruned block scan for prefix range (parquet, uncached)", {
      val Some((lo, hi)) = rCold.prefixRange("st")
      rCold.blocksForRange(lo, hi)
    })
    show("index: wand/full top-k", r.topKOrFull(Seq("spark", "hash"), 10))
    show("corpus scan column pruning", {
      graft.core.Analysis.docTerms(WebCorpus.fromDocuments(spark, sfDir)).toDF()
    })
    show("qpix: grammar atom over blocks (prefix st*, uncached reader)",
      graft.query.IndexExecutor.topK(rCold, "spark st*", 10))
    show("qpix: fuzzy via FastSS variants (pushed IN-list)",
      graft.index.FuzzyIndex.candidates(spark, rCold.dir, rCold.dictionary, "spak", 1))
    spark.stop()
  }
}
