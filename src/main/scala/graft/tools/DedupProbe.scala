package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-stage timings of the shingle-based dedup operators at
  * bench conditions (local[32], sf0.1 documents), to locate the hot stage
  * before optimizing.
  */
object DedupProbe {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    t("docs.count")(println(docs.count()))
    val sh = t("shingles materialize") {
      val s = Dedup.shingles(docs, 5).persist(); println(s.count()); s
    }
    t("minhash sigs (from cached)") {
      val sigs = sh.select(col("doc_id"), col("shingle"),
          explode(sequence(lit(0), lit(7))).as("i"))
        .groupBy(col("doc_id"), col("i"))
        .agg(min(md5(concat(col("i").cast("string"), lit(":"), col("shingle")))).as("mh"))
      println(sigs.count())
    }
    t("lshCandidatePairs full")(println(Dedup.lshCandidatePairs(docs, 5, 8, 4).count()))
    t("lshCandidatePairs again")(println(Dedup.lshCandidatePairs(docs, 5, 8, 4).count()))
    t("jaccardPairs full")(println(Dedup.jaccardPairs(docs, 5, 0.5).count()))
    t("keepset full")(println(Dedup.nearDupKeepSet(docs).count()))
    spark.stop()
  }
}
