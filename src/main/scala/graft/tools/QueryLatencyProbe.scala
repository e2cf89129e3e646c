package graft.tools

import graft.Bench
import graft.index.IndexReader
import org.apache.spark.sql.SparkSession

/** Per-query latency breakdown over the bench QuerySet (dev tool). */
object QueryLatencyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val corpus = Bench.replicatedCorpus(spark, sfDir, 10).cache()
    corpus.count()
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft_qlp").toString
    graft.index.IndexBuilder.build(spark, corpus, dir, numShards = 1)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_QSHUF", "8"))
    val reader = new IndexReader(spark, dir)
    reader.dictionary.count()
    Bench.QuerySet.foreach { case (_, q) => q(reader).collect() } // warm
    Bench.QuerySet.foreach { case (name, q) =>
      val lats = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        q(reader).collect()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"QLP $name%-16s min=${lats.min}%8.1f ms  med=${lats.sorted.apply(2)}%8.1f ms")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
