package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: full IndexBuilder.build wall time, warm JVM, N rounds. */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-buildprobe-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = graft.Bench.replicatedCorpus(spark, "/root/testdata/sf0.1", 100).cache()
    val n = corpus.count()
    for (i <- 1 to 4) {
      graft.core.AnalysisCacheReset.reset()
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft_bp").toString
      val t0 = System.nanoTime()
      graft.index.IndexBuilder.build(spark, corpus, dir, numShards = 1)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"BUILDP round=$i ${sec}%6.2f s  ${n / sec}%9.0f docs/s")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
    spark.stop()
  }
}
