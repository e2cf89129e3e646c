package graft.tools
import graft.core.Analysis
import org.apache.spark.sql.SparkSession
object TokenizeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = graft.Bench.replicatedCorpus(spark, "/root/testdata/sf0.1", 100).cache()
    corpus.count()
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = Analysis.docTerms(corpus).count()
      println(f"TOKENIZE cpus=$cpus round=$r ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }
    spark.stop()
  }
}
