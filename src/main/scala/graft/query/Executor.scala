package graft.query

import org.apache.spark.sql.DataFrame
import QueryParser._

/** Logical-path facade: evaluates a parsed reference-grammar query against
  * a corpus via [[Eval]] over a [[CorpusAtomSource]]. The physical-index
  * path is [[IndexExecutor]]; both share the one [[Eval]] state machine.
  */
object Executor {

  /** Synonym groups (reference: `<db>.synonym-groups`,
    * SynonymDictionary.h:29). Loaded once from the packaged groups file --
    * format: one group per line, comma-separated words, `#` comments,
    * whitespace ignored, a trailing `*` marks words that do not expand to
    * their group (the 31st-bit flag in the reference).
    */
  lazy val SynonymGroups: Seq[Set[String]] = SynonymDictionary.defaultGroups.map(_.words)

  def synonymsOf(w: String): Set[String] = SynonymDictionary.defaultExpand(w)

  /** Fuzzy threshold: edit distance <= max(1, len/4) (reference: normalized
    * distance ~0.28, FuzzySearcher.h:24-107).
    */
  def fuzzyThreshold(w: String): Int = math.max(1, w.length / 4)

  /** Proximity bonuses (reference: SumWithBonus aggregation,
    * Globals.h:266-301 -- PHRASE_MATCH_BONUS=16, NEAR_MATCH_BONUS=8,
    * EXACT_MATCH_BONUS=4).
    */
  def bonusFor(sep: Sep): Double = sep match {
    case Phrase => 16.0
    case Near => 8.0
    case SamePos => 4.0
    case SameDoc => 0.0
    // flexi: adjacent (|n| = 1) scores like a phrase; within the default
    // neighbourhood like near (SumProxAggregation, ScoreAggregators.h:99-125
    // keys the bonus off the position distance, not the separator object)
    case Flexi(n) =>
      if (math.abs(n) == 1) 16.0 else if (math.abs(n) < 10) 8.0 else 0.0
  }

  /** Atom source for a corpus: routed through the process serving history
    * ([[QueryHistory.default]]) so atom relations persist under ONE
    * deterministic LRU/byte-budget owner -- every facade entry point is
    * history-backed (reference: every query answers through the one
    * process History, CompleterBase.cpp:1106-1266).
    */
  private def src(corpus: DataFrame, normVariants: Boolean = false): AtomSource =
    new CachedCorpusAtomSource(corpus, normVariants, QueryHistory.default)

  def evalDocs(corpus: DataFrame, q: ParsedQuery): DataFrame =
    Eval.evalDocs(src(corpus), q)

  def evalDocs(corpus: DataFrame, q: ParsedQuery, bonuses: Boolean): DataFrame =
    Eval.evalDocs(src(corpus), q, bonuses)

  /** Top-k hits: total order (score desc, doc_id asc). */
  def topK(corpus: DataFrame, query: String, k: Int, bonuses: Boolean = false,
           bestMatchBonus: Double = 0.0): DataFrame =
    Eval.topK(src(corpus), query, k, bonuses, bestMatchBonus)

  /** Top-k under the full score-aggregation algebra / per-query knobs.
    * params.normalizeWords turns on BOTH the query rewrite and the
    * normalized-variant terms in the corpus relation (the logical twin of
    * an index built with normVariants=true).
    */
  def topK(corpus: DataFrame, query: String, k: Int, params: QueryParams): DataFrame =
    Eval.topK(src(corpus, params.normalizeWords), query, k, params)

  /** Hits under the full request surface (`rd=`/`f=`; [[Eval.hits]]). */
  def hits(corpus: DataFrame, query: String, k: Int, params: QueryParams): DataFrame =
    Eval.hits(src(corpus, params.normalizeWords), query, k, params)

  /** Completions of the last part within the docs matching the whole query. */
  def completions(corpus: DataFrame, query: String, k: Int): DataFrame =
    Eval.completions(src(corpus), query, k)

  def completions(corpus: DataFrame, query: String, k: Int,
                  params: QueryParams): DataFrame =
    Eval.completions(src(corpus, params.normalizeWords), query, k, params)
}
