package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's primary input is a table of Common-Crawl-style web pages:
  * `(url string, warc_ts timestamp, html binary, text string, lang string)`.
  *
  * In this sandbox we derive that table deterministically from the
  * driver-generated `documents.parquet` (doc_id, text, lang, source,
  * n_chars): url/warc_ts/html are pure functions of the row, so the corpus
  * is identical across runs and across parallelism levels -- a precondition
  * for rank-identical results and for the N-vs-4N determinism check.
  *
  * At production scale this function is replaced by a catalog read of the
  * real table (Iceberg/parquet); everything downstream consumes only the
  * five-column shape.
  */
object WebCorpus {

  val Epoch = "2024-01-01 00:00:00"

  /** documents.parquet -> (url, warc_ts, html, text, lang, doc_id).
    * doc_id is carried through because the synthetic corpus already has a
    * dense, deterministic id; [[docIds]] shows the id-assignment path used
    * when the input has none.
    */
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(
      concat(lit("https://example.org/"), col("source"), lit("/doc/"), col("doc_id")).as("url"),
      timestamp_seconds(unix_timestamp(to_timestamp(lit(Epoch))) + col("doc_id")).as("warc_ts"),
      // synthetic html wrapper; extractText() must invert it byte-identically
      encode(concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>")), "UTF-8").as("html"),
      col("text"),
      col("lang"),
      col("doc_id").cast("long").as("doc_id"))
  }

  /** Deterministic dense docId assignment for corpora that lack one:
    * dense rank in url order (url is unique), via the range-partitioned
    * sort + per-partition-offset pattern ([[DenseRank]]) -- a corpus-sized
    * relation must never pass through a single-partition window.
    */
  def docIds(corpus: DataFrame): DataFrame =
    DenseRank.withDenseId(corpus, "url", "doc_id")

  /** Extract text from the html wrapper: strip tags, decode the five basic
    * entities, byte-identical to the `text` column for our wrapper.
    * (Reference analog: the parser's full-text field extraction,
    * CsvParser.cpp -- the invariant tested row-wise in CoreSpec.)
    */
  def extractText(html: Array[Byte]): String = {
    if (html == null) return ""
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val noTags = new StringBuilder(s.length)
    var i = 0
    var inTag = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') inTag = true
      else if (c == '>') inTag = false
      else if (!inTag) noTags.append(c)
      i += 1
    }
    noTags.toString
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&")
  }
}
