package graft.tools

import graft.ops.{Curation, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does cu_thresholds' time go (quality, langId, join,
  * percentile aggregate)?
  */
object ThresholdsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(32)
    def t(name: String)(f: => Long): Unit = {
      val s = System.nanoTime(); val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - s) / 1e9}%6.2f s  ($n rows)")
    }
    t("warm count")(docs.count())
    t("quality")(TextAnalysis.quality(docs).count())
    t("langId")(TextAnalysis.langId(docs).count())
    t("join only") {
      TextAnalysis.quality(docs).select(col("doc_id"), col("n_tokens"))
        .join(TextAnalysis.langId(docs).select(col("doc_id"), col("lang_pred")), "doc_id")
        .count()
    }
    t("groupBy count only") {
      TextAnalysis.quality(docs).select(col("doc_id"), col("n_tokens"))
        .join(TextAnalysis.langId(docs).select(col("doc_id"), col("lang_pred")), "doc_id")
        .groupBy(col("lang_pred")).agg(count(lit(1))).count()
    }
    t("one percentile") {
      TextAnalysis.quality(docs).select(col("doc_id"), col("n_tokens"))
        .join(TextAnalysis.langId(docs).select(col("doc_id"), col("lang_pred")), "doc_id")
        .groupBy(col("lang_pred")).agg(percentile(col("n_tokens"), lit(0.5))).count()
    }
    t("full thresholds")(Curation.qualityThresholds(docs).count())
    t("full thresholds again")(Curation.qualityThresholds(docs).count())
    Curation.qualityThresholds(docs).explain("formatted")
    spark.stop()
  }
}
