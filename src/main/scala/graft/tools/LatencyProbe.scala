package graft.tools

import graft.Bench
import graft.index.{IndexBuilder, IndexReader}
import org.apache.spark.sql.SparkSession

/** Dev probe: Bench's latency phase alone (build + warm native-mix reps),
  * for interleaved A/B runs against a control worktree — the full bench's
  * pre-warm index builds and 139 gates would dominate the wall clock and
  * add JVM-level noise to exactly the numbers under test.
  */
object LatencyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "9").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-latprobe-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val corpus = Bench.replicatedCorpus(spark, sfDir, 10).cache()
    corpus.count()
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft_latprobe").toString
    IndexBuilder.build(spark, corpus, dir, numShards = 1)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val reader = new IndexReader(spark, dir)
    reader.dictionary.count()
    val (grammarSet, nativeSet) =
      Bench.QuerySet.partition(e => Bench.GrammarQueries.contains(e._1))
    def p(xs: Seq[Double], q: Double): Double = Bench.percentile(xs, q)
    def group(tag: String, set: Seq[(String, graft.index.IndexReader => org.apache.spark.sql.DataFrame)]): Unit = {
      set.foreach { case (_, q) => q(reader).collect() } // warm
      val byQuery = scala.collection.mutable.Map.empty[String, scala.collection.mutable.ArrayBuffer[Double]]
      val all = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (_ <- 1 to reps; (name, q) <- set) {
        val s = System.nanoTime()
        q(reader).collect()
        val ms = (System.nanoTime() - s) / 1e6
        all += ms
        byQuery.getOrElseUpdate(name, scala.collection.mutable.ArrayBuffer.empty) += ms
      }
      byQuery.toSeq.sortBy(_._1).foreach { case (n, xs) =>
        println(f"LAT $n%-14s p50 ${p(xs.toSeq, 0.5)}%7.1f ms  min ${xs.min}%7.1f  max ${xs.max}%7.1f")
      }
      println(f"LAT $tag p50 ${p(all.toSeq, 0.5)}%.1f ms p95 ${p(all.toSeq, 0.95)}%.1f ms over ${all.length} samples")
    }
    group("NATIVE", nativeSet)
    group("GRAMMAR", grammarSet)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
