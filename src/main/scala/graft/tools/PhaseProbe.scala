package graft.tools

import graft.core.Analysis
import graft.index.IndexBuilder
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-phase build timings at the current parallelism. */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val corpus = t("replicate+cache") {
      val c = graft.Bench.replicatedCorpus(spark, "/root/testdata/sf0.1", 100).cache()
      c.count(); c
    }
    val dt = t("tokenize(docTerms)") {
      val d = Analysis.docTerms(corpus).persist(); d.count(); d
    }
    t("dictionary") { Analysis.dictionary(dt).write.mode("overwrite")
      .parquet("/tmp/phase_probe/dict") }
    val dict = spark.read.parquet("/tmp/phase_probe/dict")
    t("join+sort+encode+write") {
      val joined = dt.toDF().join(broadcast(dict.select(col("term"), col("term_id"))), "term")
        .select(col("term_id").cast("long"), col("doc_id"), col("tf"), col("positions"), col("dl"))
      joined.repartitionByRange(cpus.toInt, col("term_id"), col("doc_id"))
        .sortWithinPartitions(col("term_id"), col("doc_id"))
        .write.mode("overwrite").parquet("/tmp/phase_probe/sorted")
    }
    spark.stop()
  }
}
