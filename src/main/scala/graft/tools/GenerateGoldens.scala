package graft.tools

import graft.core.SequentialScorer
import graft.core.SequentialScorer.Doc
import org.apache.spark.sql.SparkSession

/** One-shot generator for the committed golden files: runs the SEQUENTIAL
  * scorer (no distributed code) over the sf0.001 corpus and writes TSV
  * fixtures under src/test/resources/goldens/. Spark is used only to read
  * the parquet rows.
  */
object GenerateGoldens {

  val Queries: Seq[(String, Seq[Doc] => Seq[String])] = Seq(
    "or_spark" -> (d => fmtDocs(SequentialScorer.topKOr(d, Set("spark"), 10))),
    "or_spark_hash" -> (d => fmtDocs(SequentialScorer.topKOr(d, Set("spark", "hash"), 10))),
    "or_spark_hash_merge" -> (d => fmtDocs(SequentialScorer.topKOr(d, Set("spark", "hash", "merge"), 10))),
    "and_spark_join" -> (d => fmtDocs(SequentialScorer.topKAnd(d, Set("spark", "join"), 10))),
    "prefix_st" -> (d => fmtDocs(SequentialScorer.topKPrefix(d, "st", 10))),
    "prefix_b" -> (d => fmtDocs(SequentialScorer.topKPrefix(d, "b", 10))),
    "completions_s" -> (d => SequentialScorer.topKCompletions(d, "s", 10)
      .map { case (t, s, dc, oc) => s"$t\t$s\t$dc\t$oc" }))

  def fmtDocs(xs: Seq[(Long, Double)]): Seq[String] =
    xs.map { case (id, s) => s"$id\t$s" }

  def loadDocs(spark: SparkSession, sfDir: String): Seq[Doc] =
    graft.core.WebCorpus.fromDocuments(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => Doc(r.getLong(0), r.getString(1))).toSeq.sortBy(_.id)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "src/test/resources/goldens"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = loadDocs(spark, sfDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    Queries.foreach { case (name, f) =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.tsv"), f(docs).mkString("\n") + "\n")
      println(s"wrote $outDir/$name.tsv")
    }
    spark.stop()
  }
}
