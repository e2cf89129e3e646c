package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev probe: cold-vs-warm split for the slowest gated ops queries --
  * each query runs twice in one session; run 1 pays Catalyst planning +
  * first-touch (what the gated loop measures), run 2 is steady state.
  * The gap bounds what plan-shape work could still win per gate.
  */
object OpsColdWarmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_OPS",
      "sim_kmeans_cells,dd_jaccard_pairs,dd_substr_spans,st_dedup,qp_joinblock3,dd_keepset")
      .split(",").toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-ocw-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names; fn = SparkEntry.queries(name)) {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"OCW $name%-18s cold ${times(0)}%6.2f s  warm ${times(1)}%6.2f s")
    }
    spark.stop()
  }
}
