package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where kmeansAssign spends its time at bench conditions. */
object KmeansProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    t("embs count + dims") {
      println((embs.count(), embs.select(size(col("embedding"))).head().getInt(0)))
    }
    t("centroids iters=1")(println(Similarity.kmeansCentroids(embs, 8, 1).count()))
    t("centroids iters=2")(println(Similarity.kmeansCentroids(embs, 8, 2).count()))
    t("assign full (gate shape)")(println(Similarity.kmeansAssign(embs, 8, 2).count()))
    t("assign again")(println(Similarity.kmeansAssign(embs, 8, 2).count()))
    spark.stop()
  }
}
