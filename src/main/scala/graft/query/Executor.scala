package graft.query

import graft.core.Analysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import QueryParser._

/** Evaluates a parsed reference-grammar query against a corpus, mirroring
  * processComplexQuery's left-deep part chain (CompleterBase.cpp:1007-1850):
  * the accumulated result is a (doc_id, score) relation plus, for windowed
  * separators, the positions of the previous part's matches.
  *
  * Scoring: per-part doc score = summed BM25 over the part's matched terms
  * in the doc; parts combine with Sum (docScoreAggDifferentQueryParts=Sum).
  * Windowed separators (phrase/near/same-pos) constrain docs via a
  * position theta-join; scores still aggregate over whole-doc tf (fixed in
  * the goldens -- see SURVEY.md §7.3 hard part 5).
  */
object Executor {

  /** Static synonym dictionary (reference: <db>.synonym-groups,
    * SynonymDictionary.h). Deterministic so the SQL oracle can inline the
    * expansion.
    */
  val SynonymGroups: Seq[Set[String]] = Seq(
    Set("fast", "quick", "rapid"),
    Set("big", "large", "huge"),
    Set("small", "little", "tiny"),
    Set("merge", "join"))

  def synonymsOf(w: String): Set[String] =
    SynonymGroups.find(_.contains(w)).getOrElse(Set(w)) + w

  /** Fuzzy threshold: edit distance <= max(1, len/4) (reference: normalized
    * distance ~0.28, FuzzySearcher.h:24-107).
    */
  def fuzzyThreshold(w: String): Int = math.max(1, w.length / 4)

  /** Matched doc-term relation for one atom:
    * (doc_id, term, tf, positions, score). Term expansion (prefix / fuzzy /
    * synonym / range / OR) happens as a predicate on the doc-term relation
    * -- distributed, prunable, no driver round-trip.
    */
  private def atomScored(corpus: DataFrame, atom: Atom): DataFrame = {
    val dt = Analysis.docTermsCached(corpus)
    val st = Analysis.statsCached(corpus)
    def score(matching: DataFrame, dfTbl: DataFrame): DataFrame =
      matching.join(broadcast(dfTbl), "term")
        .select(col("doc_id"), col("term"), col("tf"), col("positions"),
          Analysis.bm25Col(st.n_docs, st.avgdl, col("tf"), col("df"), col("dl")).as("score"))
    atom match {
      case w: Word if w.fuzzy =>
        // fuzzy candidates from the VOCAB-sized (term, df) relation, then a
        // broadcast join on postings: edit distance is evaluated once per
        // vocabulary entry, never once per posting row (reference builds a
        // FastSS/permuted-lexicon candidate index for the same reason,
        // fuzzysearch/FuzzySearcher.h:24-107)
        val cands = Analysis.termDfCached(corpus)
          .filter(levenshtein(col("term"), lit(w.text)) <= fuzzyThreshold(w.text))
        score(dt.toDF(), cands)
      case _ =>
        val matching = dt.toDF().filter(atomPredicate(atom))
        val dfTbl = matching.groupBy(col("term")).agg(count(lit(1)).as("df"))
        score(matching, dfTbl)
    }
  }

  private def atomPredicate(atom: Atom): Column = atom match {
    case w: Word => wordPredicate(w)
    case WordRange(lo, hi) => col("term") >= lo && col("term") <= hi
    case OrAtoms(alts) => alts.map(wordPredicate).reduce(_ || _)
    case _: JoinBlock =>
      throw new IllegalArgumentException("join block handled separately")
  }

  private def wordPredicate(w: Word): Column = {
    if (w.prefix) col("term").startsWith(w.text)
    else if (w.fuzzy) levenshtein(col("term"), lit(w.text)) <= fuzzyThreshold(w.text)
    else if (w.synonym) col("term").isin(synonymsOf(w.text).toSeq: _*)
    else col("term") === w.text // exact and plain words match the term itself
  }

  private def isNot(atom: Atom): Boolean = atom match {
    case w: Word => w.not
    case _ => false
  }

  /** Proximity bonuses (reference: SumWithBonus aggregation,
    * Globals.h:266-301 -- PHRASE_MATCH_BONUS=16, NEAR_MATCH_BONUS=8,
    * EXACT_MATCH_BONUS=4).
    */
  def bonusFor(sep: Sep): Double = sep match {
    case Phrase => 16.0
    case Near => 8.0
    case SamePos => 4.0
    case SameDoc => 0.0
  }

  def evalDocs(corpus: DataFrame, q: ParsedQuery): DataFrame =
    evalDocs(corpus, q, bonuses = false)

  /** Evaluate to (doc_id, score), score rounded to 4dp, unordered.
    * With bonuses=true, windowed matches add the reference's SumWithBonus
    * constants to the doc score.
    */
  def evalDocs(corpus: DataFrame, q: ParsedQuery, bonuses: Boolean): DataFrame = {
    case class State(scores: DataFrame, positions: DataFrame)

    def partDocScores(a: Atom): DataFrame = a match {
      case JoinBlock(l, r) => evalJoinBlock(corpus, l, r)
      case _ => atomScored(corpus, a)
        .groupBy(col("doc_id")).agg(sum(col("score")).as("score"))
    }
    def partPositions(a: Atom): DataFrame = a match {
      case JoinBlock(_, _) => null
      case _ => atomScored(corpus, a)
        .select(col("doc_id"), explode(col("positions")).as("pos"))
    }

    val first = q.parts.head
    require(!isNot(first.atom), "query cannot start with a NOT part")
    var state = State(partDocScores(first.atom), partPositions(first.atom))

    q.parts.tail.foreach { part =>
      val window = part.sep.flatMap(_.window)
      if (isNot(part.atom)) {
        // NOT: anti-join on matching docs (OUTPUT_NON_MATCHES)
        val negDocs = atomScored(corpus, part.atom).select(col("doc_id")).distinct()
        state = State(state.scores.join(negDocs, Seq("doc_id"), "left_anti"),
          state.positions)
      } else if (window.isEmpty) {
        // plain AND: docId equi-join, scores sum (the special-posting carry)
        val cur = partDocScores(part.atom)
        val joined = state.scores.toDF("doc_id", "s1")
          .join(cur.toDF("doc_id", "s2"), "doc_id")
          .select(col("doc_id"), (col("s1") + col("s2")).as("score"))
        state = State(joined, partPositions(part.atom))
      } else {
        // windowed AND: position theta-join against previous part's matches
        val (lo, hi) = window.get
        val curScored = atomScored(corpus, part.atom)
        val curPos = curScored.select(col("doc_id").as("d2"), explode(col("positions")).as("p2"))
        val matched = state.positions.toDF("doc_id", "p1")
          .join(curPos, col("doc_id") === col("d2") &&
            (col("p2") - col("p1")).between(lo, hi))
        val matchedDocs = matched.select(col("doc_id")).distinct()
        val cur = curScored.groupBy(col("doc_id")).agg(sum(col("score")).as("s2"))
        val bonus = if (bonuses) bonusFor(part.sep.get) else 0.0
        val joined = state.scores.toDF("doc_id", "s1")
          .join(cur, "doc_id")
          .join(matchedDocs, "doc_id")
          .select(col("doc_id"), (col("s1") + col("s2") + lit(bonus)).as("score"))
        // the next window chains ONLY from positions of this part that
        // actually matched the previous part's window (reference:
        // intersectTwoPostingLists emits the second list's matched
        // postings, CompleterBase.Intersect.cpp:477-548) -- carrying all
        // of the atom's positions would let a.b.c match docs where 'a b'
        // and 'b c' occur at unrelated places
        val newPos = matched.select(col("doc_id"), col("p2").as("pos")).distinct()
        state = State(joined, newPos)
      }
    }
    state.scores.select(col("doc_id"), round(col("score"), 4).as("score"))
  }

  /** Top-k hits: total order (score desc, doc_id asc). */
  def topK(corpus: DataFrame, query: String, k: Int, bonuses: Boolean = false): DataFrame =
    evalDocs(corpus, QueryParser.parse(query), bonuses)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)

  /** Completions of the last part within the docs matching the whole query
    * (computeTopCompletions over the final result).
    */
  def completions(corpus: DataFrame, query: String, k: Int): DataFrame = {
    val parsed = QueryParser.parse(query)
    val docs = evalDocs(corpus, parsed).select(col("doc_id"))
    atomScored(corpus, parsed.parts.last.atom)
      .join(docs, Seq("doc_id"), "left_semi")
      .groupBy(col("term"))
      .agg(round(sum(col("score")), 4).as("score"),
        count(lit(1)).as("dc"), sum(col("tf")).as("oc"))
      .orderBy(col("score").desc, col("term").asc)
      .limit(k)
  }

  /** Join block [q1#q2]: completions of the two sides' last parts that
    * occur in BOTH results (CompleterBase.Join.cpp hash join); docs of
    * either side containing a common term, scores re-aggregated.
    */
  private def evalJoinBlock(corpus: DataFrame, l: ParsedQuery, r: ParsedQuery): DataFrame = {
    def side(pq: ParsedQuery): DataFrame = {
      val docs = evalDocs(corpus, pq).select(col("doc_id"))
      atomScored(corpus, pq.parts.last.atom)
        .join(docs, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("term"), col("score"))
    }
    val ls = side(l)
    val rs = side(r)
    val commonTerms = ls.select(col("term")).distinct()
      .join(rs.select(col("term")).distinct(), Seq("term"), "left_semi")
    ls.unionByName(rs)
      .join(broadcast(commonTerms), Seq("term"), "left_semi")
      .groupBy(col("doc_id")).agg(sum(col("score")).as("score"))
  }
}
