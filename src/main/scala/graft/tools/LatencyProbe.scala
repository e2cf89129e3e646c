package graft.tools

import graft.Bench
import graft.index.IndexReader
import org.apache.spark.sql.SparkSession

/** Dev probe: warm query latency under different session configs. */
object LatencyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for ((aqe, parts) <- Seq(("true", "32"), ("false", "32"), ("false", "8"), ("false", "4"))) {
      val spark = SparkSession.builder().master("local[32]")
        .appName(s"probe-$aqe-$parts")
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val (_, p50, p95, _, _, _) = Bench.buildAndMeasure(spark, sfDir)
      println(s"RESULT aqe=$aqe parts=$parts p50=${p50.round}ms p95=${p95.round}ms")
      spark.stop()
    }
  }
}
