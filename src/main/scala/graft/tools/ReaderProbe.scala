package graft.tools

import graft.index.IndexReader
import org.apache.spark.sql.SparkSession

/** Diagnostic (not part of the library surface): time fresh IndexReader
  * construction (census + epoch), the blocks lazy val (file listing +
  * cache decision), and cold-vs-warm WAND queries -- isolates
  * per-construction cost from per-query cost when auditing reader
  * overhead (e.g. the round-4 census/epoch hardening measured here at
  * ~2 ms construction, ~150-220 ms blocks listing at sf0.1).
  */
object ReaderProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.IndexQueries.indexDir(spark, sfDir)
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[probe] $label%-30s ${(System.nanoTime() - s) / 1e6}%.1f ms"); r
    }
    // warm session
    new IndexReader(spark, dir).topKOrWand(Seq("spark"), 10).collect()
    for (i <- 1 to 3) {
      val r = t(s"construct+epoch $i") { val r = new IndexReader(spark, dir); r.indexEpoch; r }
      t(s"blocks lazy-val $i") { r.blocks.rdd.getNumPartitions }
      t(s"first query $i") { r.topKOrWand(Seq("spark"), 10).collect() }
      t(s"repeat query $i") { r.topKOrWand(Seq("spark"), 10).collect() }
    }
    spark.stop()
  }
}
