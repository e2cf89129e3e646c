package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Excerpt/snippet generation (reference: ExcerptsGenerator.cpp -- fetch
  * top-hit docs, re-find query words incl. prefixes, window of +-er words,
  * <hl> highlighting). Pure Catalyst array functions over the doc text --
  * the top-k doc set is tiny, the work is one broadcast semi-join plus
  * per-row array ops.
  */
object Excerpts {

  private val SepRegex = "[!\"#$%&'()*+,\\-./@\\[\\\\\\]^{|}~:;<=>? ]+"

  private def matchPred(t: Column, exact: Seq[String], prefixes: Seq[String]): Column = {
    val es = exact.map(w => t === w)
    val ps = prefixes.map(p => t.startsWith(p))
    (es ++ ps).reduceOption(_ || _).getOrElse(lit(false))
  }

  /** For each doc in `hits` (must have doc_id), produce a +-radius-token
    * window around the FIRST matching token, matches wrapped in <hl>.
    * Output: (doc_id, excerpt); docs with no match (shouldn't happen for
    * real hits) get an empty excerpt.
    */
  def generate(corpus: DataFrame, hits: DataFrame,
               exact: Seq[String], prefixes: Seq[String],
               radius: Int = 2): DataFrame = {
    val toks = filter(split(lower(col("text")), SepRegex), t => t =!= "")
    val big = lit(Int.MaxValue)
    // first matching 0-based token index
    val firstIdx = array_min(transform(toks,
      (t, i) => when(matchPred(t, exact, prefixes), i).otherwise(big)))
    val start0 = greatest(firstIdx - radius, lit(0)) // 0-based window start
    // window is [max(m-r,0), m+r]: length shrinks when clamped at the left
    val win = slice(toks, start0 + 1, firstIdx + radius - start0 + 1)
    val highlighted = transform(win, t =>
      when(matchPred(t, exact, prefixes), concat(lit("<hl>"), t, lit("</hl>"))).otherwise(t))
    corpus
      .join(hits.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        when(firstIdx === big, lit(""))
          .otherwise(array_join(highlighted, " ")).as("excerpt"))
  }
}
