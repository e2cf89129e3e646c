package graft.tools
import graft.index.IndexBuilder
import org.apache.spark.sql.SparkSession
object BuildScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = graft.Bench.replicatedCorpus(spark, "/root/testdata/sf0.1", sys.env.getOrElse("SPARK_GRAFT_REPL", "100").toInt).cache()
    val n = corpus.count()
    for (r <- 1 to 3) {
      graft.core.AnalysisCacheReset.reset()
      val dir = sys.env.get("SPARK_GRAFT_IXTMP").map(d => java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(d), "bsp").toString).getOrElse(java.nio.file.Files.createTempDirectory("bsp").toString)
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, corpus, dir, numShards = 1)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"BUILD cpus=$cpus round=$r ${s}%6.2f s  ${n / s}%9.0f docs/s")
    }
    spark.stop()
  }
}
