package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partial-word detection: which secondary-vocabulary words occur INSIDE
  * primary-vocabulary words (reference: partialwords/PartialWords.{h,cpp}
  * + PartialWordsMain.cpp — compound splitting so a query for `burg`
  * finds `freiburg`). The reference builds a generalized suffix array
  * over both vocabularies (gsacak); the Spark shape is an equi-join, not
  * a suffix array: emit every substring of each primary word whose
  * length matches some secondary word length, then join on the substring.
  * Work is sum over primary words of len(word) x #distinct secondary
  * lengths — vocabulary-scale, never corpus-scale, and never a cross
  * join. The distinct-length list is a driver round-trip bounded by the
  * longest word (~dozens of values).
  */
object PartialWords {

  /** (word, partial, pos): every secondary word of length >= minLen
    * properly contained in a primary word; pos = 1-based first
    * occurrence (the reference reports match positions from the suffix
    * array; `position()` semantics make the oracle trivial).
    */
  def pairs(primary: DataFrame, secondary: DataFrame, minLen: Int = 3): DataFrame = {
    val sec = secondary.select(col("word").as("partial"))
      .where(length(col("partial")) >= minLen).distinct()
    val lens = sec.select(length(col("partial")).as("l")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val prim = primary.select(col("word")).distinct()
    if (lens.isEmpty) return prim.limit(0)
      .select(col("word"), lit("").as("partial"), lit(0L).as("pos"))
    val subs = lens.map { l =>
      prim.where(length(col("word")) >= l)
        .select(col("word"), posexplode(
          expr(s"transform(sequence(1, length(word) - $l + 1), i -> substring(word, i, $l))"))
          .as(Seq("i0", "sub")))
        .select(col("word"), (col("i0") + 1).cast("long").as("pos"), col("sub"))
    }.reduce(_ unionByName _)
    subs.join(sec, subs("sub") === sec("partial"))
      .where(col("word") =!= col("partial"))
      .groupBy(col("word"), col("partial"))
      .agg(min(col("pos")).as("pos"))
  }

  /** Application-side emission (the reference merges the pairs file into
    * the words file, applications/Makefile): for every posting of a
    * containing word, emit the partial word at the SAME positions with
    * the same document length. Shaped for `IndexBuilder.build(
    * extraDocTerms=...)`: (doc_id, term, tf, positions, dl) with
    * tf == positions.length (the block framing invariant). Emitted
    * partials are bare words, so they count into the index's BM25
    * document-length model exactly like the reference's merged words
    * file.
    */
  def expandDocTerms(docTerms: DataFrame, pairs: DataFrame): DataFrame =
    docTerms.join(pairs.select(col("word").as("term"), col("partial")), "term")
      .groupBy(col("doc_id"), col("partial"))
      .agg(sum(col("tf")).as("tf"),
        sort_array(flatten(collect_list(col("positions")))).as("positions"),
        first(col("dl")).as("dl"))
      .select(col("doc_id"), col("partial").as("term"),
        col("tf"), col("positions"), col("dl"))
}
