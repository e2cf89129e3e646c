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
    normalizeWords: Boolean = false,
    /** `f=` firstHitToSend (QueryParameters.h:51, 0-based): hits
      * [firstHit, firstHit + k) of the total order are returned -- the
      * pagination offset.
      */
    firstHit: Int = 0,
    /** `rd=` how to rank docs (QueryParameters.h:92-101): "score"
      * (RANK_DOCS_BY_SCORE) or "doc" (RANK_DOCS_BY_DOC_ID).
      */
    rankDocs: String = "score",
    /** `rd=` trailing sort-order char ('a'scending / 'd'escending,
      * QueryParameters.cpp setHowToRank); None = the mode's default
      * (score: desc, doc id: asc).
      */
    sortDocsAsc: Option[Boolean] = None,
    /** `rw=` how to rank words/completions (QueryParameters.h:103-113):
      * "score" | "dc" (doc count) | "oc" (occurrence count) | "word"
      * (RANK_WORDS_BY_WORD_ID -- dense ids are lexicographic, so word-id
      * order IS term order).
      */
    rankWords: String = "score",
    /** `rw=` trailing sort-order char; None = the mode's default
      * (score/dc/oc: desc, word: asc).
      */
    sortWordsAsc: Option[Boolean] = None,
    /** `en=` max excerpts per hit (QueryParameters.h:57; reference default
      * 5 -- ours is 1, the single-window behavior the gates pin).
      */
    excerptsPerHit: Int = 1,
    /** `fd=` fuzzy damping in [0.01, 1.0] (QueryParameters.h:54,
      * CompleterBase.TopK.cpp:754: fuzzy-matched completions' scores are
      * multiplied by this). Reference default 0.5; ours 1.0 = undamped
      * (the fuzzy gates pin undamped BM25). Applied to the BM25
      * contribution of fuzzy atoms ([[Eval]]); fuzzy alternatives inside
      * an OR share the pooled relation and are not damped (documented
      * divergence).
      */
    fuzzyDamping: Double = 1.0) {
  require(sameCompletionAgg != QueryParams.SumWithBonus &&
    completionsAgg != QueryParams.SumWithBonus &&
    wordSameDocAgg != QueryParams.SumWithBonus &&
    wordDiffDocsAgg != QueryParams.SumWithBonus,
    "SumWithBonus needs a position distance; only partsAgg supports it")
  require(firstHit >= 0, s"firstHit must be >= 0, got $firstHit")
  require(Set("score", "doc").contains(rankDocs), s"unknown rd rank mode: $rankDocs")
  require(Set("score", "dc", "oc", "word").contains(rankWords),
    s"unknown rw rank mode: $rankWords")
  require(excerptsPerHit >= 0, s"excerptsPerHit must be >= 0, got $excerptsPerHit")
  require(fuzzyDamping >= 0.01 && fuzzyDamping <= 1.0,
    s"fuzzyDamping must be in [0.01, 1.0], got $fuzzyDamping") // reference clamp, QueryParameters.cpp:320-321
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

  /** Split a `rd=`/`rw=` URL value into (enum int, sort-order override):
    * reference setHowToRank (QueryParameters.cpp) -- atoi of the value plus
    * an optional trailing 'a'/'d' order char. Unknown enum values are
    * rejected (the reference blindly casts; a 400 beats silent misranking).
    */
  private def splitRank(value: String): (String, Option[Boolean]) = {
    val (numPart, order) = value.toLowerCase match {
      case v if v.endsWith("a") => (v.dropRight(1), Some(true))
      case v if v.endsWith("d") => (v.dropRight(1), Some(false))
      case v => (v, None)
    }
    (numPart, order)
  }

  /** The `rd=` URL parameter (RANK_DOCS_BY_SCORE=0 / RANK_DOCS_BY_DOC_ID=1,
    * QueryParameters.h:92-101, + 'a'/'d' order suffix).
    */
  def withRankDocs(value: String, base: QueryParams = Default): QueryParams = {
    val (num, order) = splitRank(value)
    val mode = num match {
      case "0" | "" => "score"
      case "1" => "doc"
      case other => throw new IllegalArgumentException(s"unsupported rd rank mode: $other")
    }
    base.copy(rankDocs = mode, sortDocsAsc = order)
  }

  /** The `rw=` URL parameter (RANK_WORDS_BY_SCORE=0 / DOC_COUNT=1 /
    * OCC_COUNT=2 / WORD_ID=3, QueryParameters.h:103-113, + 'a'/'d').
    */
  def withRankWords(value: String, base: QueryParams = Default): QueryParams = {
    val (num, order) = splitRank(value)
    val mode = num match {
      case "0" | "" => "score"
      case "1" => "dc"
      case "2" => "oc"
      case "3" => "word"
      case other => throw new IllegalArgumentException(s"unsupported rw rank mode: $other")
    }
    base.copy(rankWords = mode, sortWordsAsc = order)
  }
}
