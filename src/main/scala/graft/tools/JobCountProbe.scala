package graft.tools

import graft.Bench
import graft.index.IndexReader
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev probe: jobs/stages/tasks per warm query — the fixed-overhead
  * anatomy behind the BM25 p50.
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
        val i = s.stageInfo
        val dur = for (a <- i.submissionTime; b <- i.completionTime) yield b - a
        stageLog.add(f"    stage ${i.stageId}%3d ${i.numTasks}%3dt ${dur.getOrElse(-1L)}%5d ms  ${i.name.take(60)}")
      }
    })

    val corpus = Bench.replicatedCorpus(spark, sfDir, 10).cache()
    corpus.count()
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft_jcp").toString
    graft.index.IndexBuilder.build(spark, corpus, dir, numShards = 1)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val reader = new IndexReader(spark, dir)
    reader.dictionary.count()
    Bench.QuerySet.foreach { case (_, q) => q(reader).collect() } // warm
    Bench.QuerySet.foreach { case (name, q) =>
      jobs.set(0); stages.set(0); tasks.set(0); stageLog.clear()
      val t0 = System.nanoTime()
      q(reader).collect()
      val ms = (System.nanoTime() - t0) / 1e6
      // listener is async; give the bus a moment to drain
      Thread.sleep(300)
      println(f"JCP $name%-16s ${ms}%8.1f ms  jobs=${jobs.get}%2d stages=${stages.get}%2d tasks=${tasks.get}%4d")
      stageLog.forEach(l => println(l))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
