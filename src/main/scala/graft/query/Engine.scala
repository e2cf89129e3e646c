package graft.query

import graft.core.{Analysis, DocTerm}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Logical query operators over the (doc_id, term, tf, positions, dl)
  * relation, expressed Spark-first: every reference operator
  * (SURVEY.md §2.3) becomes a join/agg/filter plan that Catalyst optimizes.
  *
  * Reference semantics mapping:
  *  - AND  = intersectTwoPostingLists OUTPUT_MATCHES
  *    (CompleterBase.Intersect.cpp:299-778) -> docId equi-join; the
  *    "special posting" score carry (Intersect.cpp:477-548) is the
  *    pre-aggregated per-doc score summed across query parts.
  *  - NOT  = OUTPUT_NON_MATCHES (Intersect.cpp:444-456) -> left_anti join.
  *  - OR   = mergeTwoPostingLists (CompleterBase.cpp:338-376) -> union.
  *  - prefix -> word range (CompleterBase.cpp:2505-2636) -> term range
  *    predicate (prunable by min/max stats).
  *  - phrase/proximity = position window check (Separator.cpp:139-159)
  *    -> position theta-join.
  *  - JOIN block (CompleterBase.Join.cpp) -> semi-join on term.
  *  - top-k hits/completions (CompleterBase.TopK.cpp) ->
  *    groupBy + orderBy + limit (TakeOrderedAndProject).
  *
  * Scores are Okapi BM25 (north rule) with Sum aggregation across query
  * parts and across completions of a prefix
  * (docScoreAggDifferentQueryParts / DifferentCompletions = Sum;
  * reference defaults Globals.h:266-301 modulo bonuses, fixed in goldens).
  */
object Engine {

  /** (doc_id, term, score) for exact terms. */
  def scored(corpus: DataFrame, terms: Seq[String]): DataFrame =
    Analysis.scoredForTerms(corpus, terms)

  /** (doc_id, term, score) for all terms with the given prefix. */
  def scoredForPrefix(corpus: DataFrame, prefix: String): DataFrame = {
    val dt = Analysis.docTermsCached(corpus)
    val st = Analysis.statsCached(corpus)
    val matching = dt.filter(col("term").startsWith(prefix))
    val dfTbl = matching.groupBy(col("term")).agg(count(lit(1)).as("df"))
    matching.join(broadcast(dfTbl), "term")
      .select(col("doc_id"), col("term"), col("tf"),
        Analysis.bm25Col(st.n_docs, st.avgdl, col("tf"), col("df"), col("dl")).as("score"))
  }

  /** Single-term top-k: (doc_id, score) ordered score desc, doc_id asc. */
  def topKSingle(corpus: DataFrame, term: String, k: Int): DataFrame =
    scored(corpus, Seq(term))
      .select(col("doc_id"), round(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)

  /** Conjunctive (AND) top-k: docs containing ALL terms; score = sum of
    * per-term BM25. One shuffle (groupBy doc_id); the n-way intersection is
    * the HAVING count = n filter, not n-1 chained joins.
    */
  def topKAnd(corpus: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val distinctTerms = terms.distinct
    scored(corpus, distinctTerms)
      .groupBy(col("doc_id"))
      .agg(round(sum(col("score")), 4).as("score"), count(lit(1)).as("nterms"))
      .filter(col("nterms") === distinctTerms.size)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Disjunctive (OR) top-k: docs containing ANY term, summed BM25. */
  def topKOr(corpus: DataFrame, terms: Seq[String], k: Int): DataFrame =
    topKOrAgg(corpus, terms, k, "sum")

  /** Score-aggregation algebra knob (reference: ScoreAggregators.h:6-125,
    * the `s=SSSS` parameter -- each aggregation position is Sum or Max).
    * agg applies across a doc's matching query terms.
    */
  def topKOrAgg(corpus: DataFrame, terms: Seq[String], k: Int, agg: String): DataFrame = {
    val aggCol = agg match {
      case "sum" => sum(col("score"))
      case "max" => max(col("score"))
      case other => throw new IllegalArgumentException(s"unknown agg: $other")
    }
    scored(corpus, terms.distinct)
      .groupBy(col("doc_id"))
      .agg(round(aggCol, 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** NOT: docs matching `term`, minus docs matching any `negTerms`
    * (reference: OUTPUT_NON_MATCHES / leading '-'). left_anti on doc_id.
    */
  def topKNot(corpus: DataFrame, term: String, negTerms: Seq[String], k: Int): DataFrame = {
    val pos = scored(corpus, Seq(term))
    val neg = Analysis.docTermsCached(corpus).filter(col("term").isin(negTerms: _*))
      .select(col("doc_id")) // anti-join build side dedups; no distinct
    pos.join(neg, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), round(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Prefix (autocompletion) doc ranking: score = sum of BM25 over all
    * matching completions present in the doc.
    */
  def topKPrefix(corpus: DataFrame, prefix: String, k: Int): DataFrame =
    scoredForPrefix(corpus, prefix)
      .groupBy(col("doc_id"))
      .agg(round(sum(col("score")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)

  /** Top-k completions of a prefix: (term, score, dc, oc) -- score = summed
    * BM25 over docs, dc = distinct docs, oc = total occurrences
    * (reference: computeTopCompletions, TopK.cpp:603-860).
    * Rank: score desc, term asc (total order).
    */
  def topKCompletions(corpus: DataFrame, prefix: String, k: Int): DataFrame =
    topKCompletionsBy(corpus, prefix, k, "score")

  /** Completion rank-mode knob (reference: rank modes score/dc/oc/word,
    * QueryParameters.h:94-103, `rw=` URL parameter).
    */
  def topKCompletionsBy(corpus: DataFrame, prefix: String, k: Int, rankBy: String): DataFrame = {
    val base = scoredForPrefix(corpus, prefix)
      .groupBy(col("term"))
      .agg(round(sum(col("score")), 4).as("score"),
        count(lit(1)).as("dc"),
        sum(col("tf")).as("oc"))
    val ordered = rankBy match {
      case "score" => base.orderBy(col("score").desc, col("term").asc)
      case "dc" => base.orderBy(col("dc").desc, col("term").asc)
      case "oc" => base.orderBy(col("oc").desc, col("term").asc)
      case "word" => base.orderBy(col("term").asc)
      case other => throw new IllegalArgumentException(s"unknown rank mode: $other")
    }
    ordered.limit(k)
  }

  /** OUTPUT_ALL mode (reference: Separator.h:33-47, Intersect.cpp:244-292):
    * keep ALL docs matching the current part (here: a prefix), carrying the
    * aggregated score of the prior part where the doc matched it --
    * a left join with coalesced scores.
    */
  def outputAll(corpus: DataFrame, priorTerm: String, prefix: String, k: Int): DataFrame = {
    val prior = scored(corpus, Seq(priorTerm))
      .groupBy(col("doc_id")).agg(sum(col("score")).as("s1"))
    scoredForPrefix(corpus, prefix)
      .groupBy(col("doc_id")).agg(sum(col("score")).as("s2"))
      .join(prior, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        round(col("s2") + coalesce(col("s1"), lit(0.0)), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Hit rank-mode knob (reference: rank by score / docId,
    * QueryParameters.h:94-103, `rd=` URL parameter).
    */
  def topKSingleBy(corpus: DataFrame, term: String, k: Int, rankBy: String): DataFrame = {
    val base = scored(corpus, Seq(term))
      .select(col("doc_id"), round(col("score"), 4).as("score"))
    val ordered = rankBy match {
      case "score" => base.orderBy(col("score").desc, col("doc_id").asc)
      case "doc" => base.orderBy(col("doc_id").asc)
      case "doc_desc" => base.orderBy(col("doc_id").desc)
      case other => throw new IllegalArgumentException(s"unknown rank mode: $other")
    }
    ordered.limit(k)
  }

  /** Lexicographic word-range query `lo--hi` (reference:
    * CompleterBase.cpp:2543-2565): docs containing any term in [lo, hi],
    * summed BM25. The BETWEEN predicate prunes index partitions.
    */
  def topKWordRange(corpus: DataFrame, lo: String, hi: String, k: Int): DataFrame = {
    val dt = Analysis.docTermsCached(corpus)
    val st = Analysis.statsCached(corpus)
    val matching = dt.filter(col("term") >= lo && col("term") <= hi)
    val dfTbl = matching.groupBy(col("term")).agg(count(lit(1)).as("df"))
    matching.join(broadcast(dfTbl), "term")
      .select(col("doc_id"),
        Analysis.bm25Col(st.n_docs, st.avgdl, col("tf"), col("df"), col("dl")).as("score"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("score")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Phrase: t2 immediately follows t1 (separator "." = window [1,1],
    * Separator.cpp:139-159). Position theta-join on exploded positions.
    * Returns matching docs with the number of phrase occurrences.
    */
  def phraseDocs(corpus: DataFrame, t1: String, t2: String): DataFrame =
    proximityDocs(corpus, t1, t2, 1, 1)

  /** Proximity: positions satisfy pos2 - pos1 in [lo, hi]
    * (".." = [-10, 10], NEIGHBORHOOD_SIZE; Globals.h:113).
    */
  def proximityDocs(corpus: DataFrame, t1: String, t2: String, lo: Int, hi: Int): DataFrame = {
    val dt = Analysis.docTermsCached(corpus)
    val p1 = dt.filter(col("term") === t1)
      .select(col("doc_id"), explode(col("positions")).as("p1"))
    val p2 = dt.filter(col("term") === t2)
      .select(col("doc_id").as("doc_id2"), explode(col("positions")).as("p2"))
    p1.join(p2, p1("doc_id") === p2("doc_id2") &&
        (p2("p2") - p1("p1")).between(lo, hi))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
      .orderBy(col("doc_id"))
  }

  /** Field-weighted ranking (reference: per-field --score at ingest,
    * CsvParserOptions.h:33-60, and the TITLE_MATCH_BONUS at query time,
    * ScoreAggregators.h:6 / Globals.h:266-301): the document text is the
    * concatenation of its fields; a doc whose match occurs in a
    * bonus-carrying field (e.g. the title) gets that field's bonus added
    * once -- max across fields when several apply. So a title hit outranks
    * an otherwise-equal body hit by exactly the bonus.
    *
    * fields: (column name, bonus) in concatenation order; bonus 0 = plain
    * body field.
    */
  def topKFieldBonus(docs: DataFrame, fields: Seq[(String, Double)],
                     term: String, k: Int): DataFrame = {
    val corpus = docs.select(col("doc_id").cast("long").as("doc_id"),
      concat_ws(" ", fields.map(f => col(f._1)): _*).as("text"))
    val base = scored(corpus, Seq(term))
      .groupBy(col("doc_id")).agg(sum(col("score")).as("score"))
    // one row per (doc, bonus field containing the term); narrow tokenize
    // of just the bonus fields -- never the whole corpus
    val bonus = fields.filter(_._2 != 0.0).map { case (f, b) =>
        graft.core.Facets.fieldRows(docs, f, col(f))
          .filter(col("term") === s":field:$f:$term")
          .select(col("doc_id"), lit(b).as("fbonus"))
      }.reduceOption(_ unionByName _)
      .map(_.groupBy(col("doc_id")).agg(max(col("fbonus")).as("fbonus")))
    val withBonus = bonus match {
      case Some(fb) => base.join(fb, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          (col("score") + coalesce(col("fbonus"), lit(0.0))).as("score"))
      case None => base
    }
    withBonus.select(col("doc_id"), round(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** JOIN block `[q1#q2]` (CompleterBase.Join.cpp): keep the terms (with
    * prefix) that occur in BOTH result sets -- e.g. completions of `prefix`
    * appearing both in docs matching t1 and docs matching t2. Semi-joins on
    * term; Catalyst picks broadcast/hash.
    */
  def joinBlockTerms(corpus: DataFrame, prefix: String, t1: String, t2: String): DataFrame = {
    val dt = Analysis.docTermsCached(corpus)
    def side(t: String): DataFrame = {
      // semi-join build sides dedup in their hash relations -- the one
      // distinct below (the output contract) replaces three exchanges
      val docs = dt.filter(col("term") === t).select(col("doc_id"))
      dt.filter(col("term").startsWith(prefix))
        .join(docs, Seq("doc_id"), "left_semi")
        .select(col("term"))
    }
    side(t1).join(side(t2), Seq("term"), "left_semi")
      .distinct().orderBy(col("term"))
  }
}
