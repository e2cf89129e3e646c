package graft

import graft.core.WebCorpus
import graft.query.{Excerpts, Executor}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end query-language queries: each runs a reference-grammar query
  * string through QueryParser + Executor; oracles re-derive the semantics
  * in SQL. Gates the whole parse -> plan -> score -> top-k path.
  */
object QpQueries {

  private def corpus(s: SparkSession, d: String): DataFrame = WebCorpus.fromDocuments(s, d)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qp_and_prefix" -> ((s, d) => Executor.topK(corpus(s, d), "spark st*", 10)),
    "qp_phrase" -> ((s, d) => Executor.topK(corpus(s, d), "batch.batch", 10)),
    "qp_near" -> ((s, d) => Executor.topK(corpus(s, d), "spark..join", 10)),
    "qp_not" -> ((s, d) => Executor.topK(corpus(s, d), "spark -join", 10)),
    "qp_or" -> ((s, d) => Executor.topK(corpus(s, d), "spark|hash", 10)),
    "qp_fuzzy" -> ((s, d) => Executor.topK(corpus(s, d), "spak~", 10)),
    "qp_synonym" -> ((s, d) => Executor.topK(corpus(s, d), "merge^", 10)),
    "qp_range" -> ((s, d) => Executor.topK(corpus(s, d), "batch--filter", 10)),
    "qp_completions" -> ((s, d) => Executor.completions(corpus(s, d), "spark st*", 10)),
    "qp_phrase_bonus" -> ((s, d) => Executor.topK(corpus(s, d), "batch.batch", 10, bonuses = true)),
    // 3-part windowed chain: positions must be CONTIGUOUS across all three
    // parts (gates the matched-position carry, not just pairwise windows)
    "qp_chain3" -> ((s, d) => Executor.topK(corpus(s, d), "stream.table.hash", 10)),
    // BEST_MATCH_BONUS: docs containing the EXACT word of the last prefix
    // part get +4 (CompleterBase.cpp:723-732; bonus default 0 = off)
    "qp_bestmatch" -> ((s, d) =>
      Executor.topK(corpus(s, d), "spark stream*", 10, bestMatchBonus = 4.0)),
    "qp_excerpts" -> ((s, d) => {
      val c = corpus(s, d)
      val hits = Executor.topK(c, "spark st*", 10)
      Excerpts.generate(c, hits, exact = Seq("spark"), prefixes = Seq("st"), radius = 2)
    }),
    // full-fidelity excerpts: er/en params, one window PER match (up to
    // en), every match inside a window highlighted
    "qp_excerpts_multi" -> ((s, d) => {
      val c = corpus(s, d)
      val hits = Executor.topK(c, "batch", 10)
      Excerpts.generateAll(c, hits, exact = Seq("batch"), prefixes = Seq.empty,
        er = 2, en = 2)
    })
  )

  private def andPrefixHits(extra: String): String =
    s"""SELECT doc_id, round(sum(score), 4) AS score
       |FROM scored WHERE term = 'spark' OR term LIKE 'st%'
       |GROUP BY doc_id
       |HAVING bool_or(term = 'spark') AND bool_or(term LIKE 'st%')
       |$extra""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "qp_and_prefix" ->
      s"""${Oracles.BaseCtes}
         |${andPrefixHits("ORDER BY score DESC, doc_id ASC LIMIT 10")}""".stripMargin,
    "qp_phrase" ->
      s"""${Oracles.BaseCtes}, adj AS (
         |  SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |  ON a.doc_id = b.doc_id AND a.term = 'batch' AND b.term = 'batch'
         |  AND b.pos - a.pos = 1
         |)
         |SELECT s.doc_id, round(2 * sum(s.score), 4) AS score
         |FROM scored s JOIN adj USING (doc_id) WHERE s.term = 'batch'
         |GROUP BY s.doc_id ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,
    "qp_phrase_bonus" ->
      s"""${Oracles.BaseCtes}, adj AS (
         |  SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |  ON a.doc_id = b.doc_id AND a.term = 'batch' AND b.term = 'batch'
         |  AND b.pos - a.pos = 1
         |)
         |SELECT s.doc_id, round(2 * sum(s.score) + 16.0, 4) AS score
         |FROM scored s JOIN adj USING (doc_id) WHERE s.term = 'batch'
         |GROUP BY s.doc_id ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,
    "qp_bestmatch" ->
      s"""${Oracles.BaseCtes}
         |SELECT doc_id, round(sum(score) +
         |         CASE WHEN bool_or(term = 'stream') THEN 4.0 ELSE 0.0 END, 4) AS score
         |FROM scored WHERE term = 'spark' OR term LIKE 'stream%'
         |GROUP BY doc_id
         |HAVING bool_or(term = 'spark') AND bool_or(term LIKE 'stream%')
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,
    "qp_chain3" ->
      s"""${Oracles.BaseCtes}, chain AS (
         |  SELECT DISTINCT a.doc_id FROM toks a
         |  JOIN toks b ON a.doc_id = b.doc_id AND b.pos - a.pos = 1
         |  JOIN toks c ON b.doc_id = c.doc_id AND c.pos - b.pos = 1
         |  WHERE a.term = 'stream' AND b.term = 'table' AND c.term = 'hash'
         |)
         |SELECT s.doc_id, round(sum(s.score), 4) AS score
         |FROM scored s JOIN chain USING (doc_id)
         |WHERE s.term IN ('stream', 'table', 'hash')
         |GROUP BY s.doc_id ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,
    "qp_near" ->
      s"""${Oracles.BaseCtes}, nearby AS (
         |  SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |  ON a.doc_id = b.doc_id AND a.term = 'spark' AND b.term = 'join'
         |  AND b.pos - a.pos BETWEEN -10 AND 10
         |)
         |SELECT s.doc_id, round(sum(s.score), 4) AS score
         |FROM scored s JOIN nearby USING (doc_id) WHERE s.term IN ('spark', 'join')
         |GROUP BY s.doc_id HAVING count(*) = 2
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,
    "qp_not" ->
      s"""${Oracles.BaseCtes}
         |SELECT doc_id, round(sum(score), 4) AS score
         |FROM scored WHERE term = 'spark'
         |  AND doc_id NOT IN (SELECT doc_id FROM dt WHERE term = 'join')
         |GROUP BY doc_id ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,
    "qp_or" -> Oracles.topDocs("term IN ('spark', 'hash')"),
    "qp_fuzzy" -> Oracles.topDocs("levenshtein(term, 'spak') <= 1"),
    "qp_synonym" -> Oracles.topDocs(
      "term IN (" + Executor.synonymsOf("merge").toSeq.sorted.map(t => s"'$t'").mkString(", ") + ")"),
    "qp_range" -> Oracles.topDocs("term >= 'batch' AND term <= 'filter'"),
    "qp_completions" ->
      s"""${Oracles.BaseCtes}, hits AS (
         |${andPrefixHits("")}
         |)
         |SELECT s.term, round(sum(s.score), 4) AS score,
         |       CAST(count(*) AS BIGINT) AS dc, CAST(sum(s.tf) AS BIGINT) AS oc
         |FROM scored s JOIN hits USING (doc_id) WHERE s.term LIKE 'st%'
         |GROUP BY s.term ORDER BY score DESC, term ASC LIMIT 10""".stripMargin,
    "qp_excerpts_multi" ->
      s"""${Oracles.BaseCtes}, doc_toks AS (
         |  SELECT doc_id, list(term ORDER BY pos) AS toks FROM toks GROUP BY 1
         |), hits AS (
         |  SELECT doc_id, round(sum(score), 4) AS score FROM scored
         |  WHERE term = 'batch' GROUP BY doc_id
         |  ORDER BY score DESC, doc_id ASC LIMIT 10
         |), anchors AS (
         |  SELECT doc_id, pos,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rk
         |  FROM toks WHERE term = 'batch'
         |    AND doc_id IN (SELECT doc_id FROM hits)
         |), wins AS (
         |  SELECT a.doc_id, a.pos,
         |    array_to_string(list_transform(
         |      dt.toks[greatest(a.pos - 1, 1) : a.pos + 3],
         |      t -> CASE WHEN t = 'batch' THEN '<hl>' || t || '</hl>' ELSE t END), ' ') AS w
         |  FROM anchors a JOIN doc_toks dt USING (doc_id) WHERE a.rk <= 2
         |)
         |SELECT doc_id, string_agg(w, ' ... ' ORDER BY pos) AS excerpt
         |FROM wins GROUP BY doc_id""".stripMargin,
    "qp_excerpts" ->
      s"""${Oracles.BaseCtes}, doc_toks AS (
         |  SELECT doc_id, list(term ORDER BY pos) AS toks FROM toks GROUP BY 1
         |), hits AS (
         |${andPrefixHits("ORDER BY score DESC, doc_id ASC LIMIT 10")}
         |), firstm AS (
         |  SELECT doc_id, min(pos) AS m FROM toks
         |  WHERE term = 'spark' OR term LIKE 'st%' GROUP BY 1
         |)
         |SELECT h.doc_id,
         |  array_to_string(list_transform(
         |    dt.toks[greatest(f.m - 1, 1) : f.m + 3],
         |    t -> CASE WHEN t = 'spark' OR starts_with(t, 'st')
         |              THEN '<hl>' || t || '</hl>' ELSE t END), ' ') AS excerpt
         |FROM hits h JOIN doc_toks dt USING (doc_id) JOIN firstm f USING (doc_id)""".stripMargin
  )
}
