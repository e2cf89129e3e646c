package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence (BASELINE.md protocol): run the SAME
  * build + query workload on the SAME input at local[N] and local[4N],
  * report throughput at both, scaling efficiency, and a determinism
  * signature proving identical top-k output at both levels.
  *
  * (The north rule's N vs 4N executors criterion, evidenced with cores in
  * this single-machine sandbox.)
  */
object ScalingBench {

  private def runAt(cpus: Int, sfDir: String): (Double, Double, String) = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // 100x replication (~500k docs at sf0.1): enough work per task that
      // the comparison measures pipeline throughput, not task overhead
      val (docsPerSec, p50Ms, _, _, sig) = Bench.buildAndMeasure(spark, sfDir, replDefault = 100)
      (docsPerSec, p50Ms, sig)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    val n4 = n * 4

    // warm JVM/JIT + OS page cache once so the comparison is compute-bound
    runAt(n, sfDir)

    val (tpN, p50N, sigN) = runAt(n, sfDir)
    val (tp4N, p504N, sig4N) = runAt(n4, sfDir)
    val eff = (tp4N / tpN) / 4.0
    println(s"""{"metric":"scaling_efficiency","value":$eff,"unit":"ratio",""" +
      s""""sf":"$sfDir","n_cores":$n,"n4_cores":$n4,""" +
      s""""build_docs_per_sec_n":$tpN,"build_docs_per_sec_4n":$tp4N,""" +
      s""""bm25_p50_ms_n":$p50N,"bm25_p50_ms_4n":$p504N,""" +
      s""""topk_identical":${sigN == sig4N}}""")
  }
}
