package graft.query

/** The reference's full score-aggregation algebra and per-query knobs
  * (QueryParameters.h:150-163, ScoreAggregators.h:6-125,
  * QueryParameters.cpp:114-170): five independent aggregation positions,
  * each Sum / Max (/ SumWithBonus where a position distance exists), plus
  * the per-query proximity-window override (QueryParameters.cpp:12-13,
  * neighbourhoodStart/End) and the BEST_MATCH_BONUS.
  *
  * Score model note: the engine computes BM25 at query time (north rule),
  * so "multiple occurrences of the same word in a document" are folded
  * into tf. The occurrence-level aggregations map as:
  *   Sum -> BM25(tf)  (all occurrences contribute, tf-saturated)
  *   Max -> BM25(1)   (the one best occurrence; occurrences of a word
  *                     share one static score in the reference, so Max
  *                     over them is a single occurrence's score)
  */
case class QueryParams(
    /** docScoreAggDifferentQueryParts -- how per-part doc scores combine
      * across the query's part chain. SumWithBonus adds the proximity
      * bonuses (PHRASE/NEAR/EXACT_MATCH_BONUS, ScoreAggregators.h:87-125).
      */
    partsAgg: QueryParams.Agg = QueryParams.Sum,
    /** docScoreAggSameCompletion -- occurrences of the SAME word within a
      * document (Sum = BM25(tf), Max = BM25(1); see score model note).
      */
    sameCompletionAgg: QueryParams.Agg = QueryParams.Sum,
    /** docScoreAggDifferentCompletions -- different matching words of one
      * part within a document (e.g. two completions of a prefix).
      */
    completionsAgg: QueryParams.Agg = QueryParams.Sum,
    /** wordScoreAggSameDocument -- a completion's occurrences within one
      * document, on the word-ranking (completions) side.
      */
    wordSameDocAgg: QueryParams.Agg = QueryParams.Sum,
    /** wordScoreAggDifferentDocuments -- a completion's per-document
      * scores combined across documents, on the completions side.
      */
    wordDiffDocsAgg: QueryParams.Agg = QueryParams.Sum,
    /** BEST_MATCH_BONUS (Globals.h:233; default 0 = off). */
    bestMatchBonus: Double = 0.0,
    /** Per-query neighbourhood override for the '..' separator
      * (QueryParameters.cpp:12-13: neighbourhoodStart/End, default
      * [-10, 10]; settable per request).
      */
    window: Option[(Int, Int)] = None,
    /** Reference `rewriteQuery` normalization matching (Query.cpp:391-468,
      * parser -s flag): bare words match their normalized-variant terms
      * too; see [[QueryParser.parse]].
      */
    normalizeWords: Boolean = false) {
  require(sameCompletionAgg != QueryParams.SumWithBonus &&
    completionsAgg != QueryParams.SumWithBonus &&
    wordSameDocAgg != QueryParams.SumWithBonus &&
    wordDiffDocsAgg != QueryParams.SumWithBonus,
    "SumWithBonus needs a position distance; only partsAgg supports it")
}

object QueryParams {

  sealed trait Agg
  case object Sum extends Agg
  case object Max extends Agg
  case object SumWithBonus extends Agg

  val Default: QueryParams = QueryParams()

  private def aggFromChar(c: Char): Agg = c match {
    case 'S' => Sum
    case 'M' => Max
    case 'B' => SumWithBonus
    case other => throw new IllegalArgumentException(
      s"score aggregation char must be S, M or B, got '$other'")
  }

  /** The reference `s=` URL parameter (QueryParameters.cpp:141-153): FOUR
    * characters setting [docScoreAggSameCompletion,
    * docScoreAggDifferentCompletions, wordScoreAggSameDocument,
    * wordScoreAggDifferentDocuments]; docScoreAggDifferentQueryParts is a
    * separate default (SCORE_AGG_SUM) not included in the char string.
    */
  def withAggChars(chars: String, base: QueryParams = Default): QueryParams = {
    require(chars.length == 4, s"scoreAggChars must have 4 letters: '$chars'")
    base.copy(
      sameCompletionAgg = aggFromChar(chars(0)),
      completionsAgg = aggFromChar(chars(1)),
      wordSameDocAgg = aggFromChar(chars(2)),
      wordDiffDocsAgg = aggFromChar(chars(3)))
  }
}
