package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Facet / filter / ordering ingestion -- the reference's key unification
  * trick (CsvParser.h:107-154, CsvParser.cpp:293-312): metadata fields are
  * emitted as *artificial words* in reserved namespaces inside the SAME
  * posting relation:
  *
  *   :facet:<field>:<value>     one per doc per facet field
  *   :filter:<field>:<word>     one per word of a filterable field
  *   :ordering:<field>:<key>    sortable key encoding
  *
  * All metadata querying then reduces to prefix search over (term, doc):
  * facet counts = completions of `:facet:<field>:`, filtering = AND with a
  * `:filter:` term. In Spark these are extra rows union'd into the
  * doc-term relation -- same partitioning, same pruning, zero new operators.
  */
object Facets {

  def facetTerm(field: String, value: Column): Column =
    concat(lit(s":facet:$field:"), value)

  /** Emit facet rows (doc_id, term, tf=1, positions=[], dl=0) for the given
    * metadata fields of a corpus-shaped frame.
    */
  def facetRows(corpus: DataFrame, fields: Seq[String]): DataFrame = {
    fields.map { f =>
      corpus.select(
        col("doc_id").cast("long").as("doc_id"),
        facetTerm(f, col(f).cast("string")).as("term"),
        lit(1L).as("tf"),
        // artificial words carry one synthetic position (the block format
        // frames positions by tf, so tf == positions.length must hold;
        // the reference likewise gives artificial words a position)
        array(lit(0)).cast("array<int>").as("positions"),
        lit(0L).as("dl"))
    }.reduce(_ unionByName _)
  }

  /** Facet value counts for a field: completions of `:facet:<field>:`
    * (reference: faceted search = prefix query over facet words).
    */
  def facetCounts(corpus: DataFrame, field: String): DataFrame =
    // over the facet rows ONLY: the tokenized branch of `withFacets`
    // cannot contribute (':' is a separator, so no real token starts with
    // ':facet:'), and scanning the whole doc-term relation to count a
    // metadata projection is pure waste at corpus scale -- the same
    // projection-only shape `facetCountsFiltered` already uses
    facetRows(corpus, Seq(field))
      .groupBy(substring_index(col("term"), ":", -1).as("value"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("value").asc)

  /** Sortable-key ordering words `:ordering:<field>:<key>` (reference:
    * CsvParser.cpp:383-501 -- ordering fields emit artificial words whose
    * LEXICOGRAPHIC order equals the field's value order, so "value range"
    * queries become word-range queries over the same posting relation,
    * prunable like any term range). `key` must be a sortable encoding
    * (e.g. zero-padded numbers).
    */
  def orderingTerm(field: String, key: Column): Column =
    concat(lit(s":ordering:$field:"), key)

  def orderingRows(corpus: DataFrame, field: String, key: Column): DataFrame =
    corpus.select(
      col("doc_id").cast("long").as("doc_id"),
      orderingTerm(field, key).as("term"),
      lit(1L).as("tf"),
      // one synthetic position: the block format frames positions by tf
      array(lit(0)).cast("array<int>").as("positions"),
      lit(0L).as("dl"))

  /** Docs whose ordering key falls in [lo, hi]: a word-range query over the
    * `:ordering:` namespace. Returns (doc_id, okey). The predicate can only
    * match ordering words, so only the (narrow, projection-sized) ordering
    * rows are scanned -- never the tokenized corpus; with ordering words
    * encoded into the block index (`IndexBuilder.build(facetFields=...)`
    * style) this is a pruned dictionary range like any term range.
    */
  def orderingRangeDocs(corpus: DataFrame, field: String, key: Column,
                        lo: String, hi: String): DataFrame = {
    val prefix = s":ordering:$field:"
    orderingRows(corpus, field, key)
      .filter(col("term") >= (prefix + lo) && col("term") <= (prefix + hi))
      .select(col("doc_id"),
        expr(s"substring(term, ${prefix.length + 1})").as("okey"))
  }

  /** `:info:` words -- the reference's fourth artificial-word namespace
    * (CsvParser.h:157-161, CsvParser.cpp:877-910): GLOBAL index metadata
    * (encoding, db name, facet field names, multiple-value fields) written
    * as `:info:<key>:<value>` words so a client can read the index
    * configuration through the ordinary completions machinery
    * (completions of `:info:` / `:info:facet:`). Attached to the reserved
    * doc_id 0.
    */
  def infoTerm(key: String, value: String): String = s":info:$key:$value"

  def infoRows(spark: org.apache.spark.sql.SparkSession,
               entries: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    entries.map { case (k, v) => (0L, infoTerm(k, v), 1L, Array(0), 0L) }
      .toDF("doc_id", "term", "tf", "positions", "dl")
  }

  /** Fielded-scoring rows: each token of a scored field is emitted as
    * `:field:<name>:<token>` (the reference carries per-field scores on
    * every posting, CsvParserOptions.h per-field --score; encoding the
    * field membership as an artificial word lets the SAME posting relation
    * answer "did the match occur in <field>" with one semi-join -- and
    * inside the block index it is a pruned dictionary prefix like any
    * other namespace).
    */
  def fieldRows(docs: DataFrame, field: String, valueCol: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long").as("doc_id"),
        valueCol.cast("string").as("v"))
      .as[(Long, String)]
      .flatMap { case (docId, v) =>
        Tokenizer.tokenize(if (v == null) "" else v).distinct.map { t =>
          (docId, s":field:$field:$t", 1L, Array(0), 0L)
        }
      }.toDF("doc_id", "term", "tf", "positions", "dl")
  }

  /** Facet counts restricted to docs matching a keyword -- the classic
    * faceted-search drill-down: AND of a word posting list with the facet
    * posting list (one docId semi-join).
    */
  def facetCountsFiltered(corpus: DataFrame, field: String, word: String): DataFrame = {
    val dt = Analysis.docTermsCached(corpus)
    val matching = dt.filter(col("term") === word).select(col("doc_id")).distinct()
    facetRows(corpus, Seq(field))
      .join(matching, Seq("doc_id"), "left_semi")
      .groupBy(substring_index(col("term"), ":", -1).as("value"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("value").asc)
  }
}
