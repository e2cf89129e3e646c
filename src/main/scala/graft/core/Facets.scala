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

  /** Doc-term relation extended with facet rows. */
  def withFacets(corpus: DataFrame, fields: Seq[String]): DataFrame =
    Analysis.docTermsCached(corpus).toDF().unionByName(facetRows(corpus, fields))

  /** Facet value counts for a field: completions of `:facet:<field>:`
    * (reference: faceted search = prefix query over facet words).
    */
  def facetCounts(corpus: DataFrame, field: String): DataFrame =
    withFacets(corpus, Seq(field))
      .filter(col("term").startsWith(s":facet:$field:"))
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
