package graft

import graft.query.IndexExecutor
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The qp_* query family served from the PHYSICAL posting-block index:
  * every reference-grammar shape runs QueryParser -> Eval over an
  * IndexAtomSource (dictionary candidates -> pruned block scan -> native
  * decode -> BM25). Oracles are the SAME SQL as the logical qp_* gates --
  * a hash match proves the two paths are result-identical, i.e. the index
  * IS the engine (the corpus is never touched at query time).
  */
object QpixQueries {

  private def rd(s: SparkSession, d: String) = IndexQueries.reader(s, d)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qpix_and_prefix" -> ((s, d) => IndexExecutor.topK(rd(s, d), "spark st*", 10)),
    "qpix_phrase" -> ((s, d) => IndexExecutor.topK(rd(s, d), "batch.batch", 10)),
    "qpix_near" -> ((s, d) => IndexExecutor.topK(rd(s, d), "spark..join", 10)),
    "qpix_not" -> ((s, d) => IndexExecutor.topK(rd(s, d), "spark -join", 10)),
    "qpix_or" -> ((s, d) => IndexExecutor.topK(rd(s, d), "spark|hash", 10)),
    "qpix_fuzzy" -> ((s, d) => IndexExecutor.topK(rd(s, d), "spak~", 10)),
    "qpix_synonym" -> ((s, d) => IndexExecutor.topK(rd(s, d), "merge^", 10)),
    "qpix_range" -> ((s, d) => IndexExecutor.topK(rd(s, d), "batch--filter", 10)),
    "qpix_completions" -> ((s, d) => IndexExecutor.completions(rd(s, d), "spark st*", 10)),
    "qpix_phrase_bonus" -> ((s, d) => IndexExecutor.topK(rd(s, d), "batch.batch", 10, bonuses = true)),
    "qpix_chain3" -> ((s, d) => IndexExecutor.topK(rd(s, d), "stream.table.hash", 10)),
    "qpix_bestmatch" -> ((s, d) =>
      IndexExecutor.topK(rd(s, d), "spark stream*", 10, bestMatchBonus = 4.0)),
    "qpix_excerpts" -> ((s, d) => IndexExecutor.excerpts(rd(s, d), "spark st*", 10,
      exact = Seq("spark"), prefixes = Seq("st"), radius = 2)),
    "qpix_excerpts_multi" -> ((s, d) => {
      val r = rd(s, d)
      val hits = IndexExecutor.topK(r, "batch", 10)
      graft.query.Excerpts.generateAll(r.docs, hits,
        exact = Seq("batch"), prefixes = Seq.empty, er = 2, en = 2)
    })
  )

  /** Identical semantics => identical oracles: reuse the qp_* SQL. */
  val oracleSql: Map[String, String] =
    QpQueries.oracleSql.map { case (k, v) => k.replaceFirst("^qp_", "qpix_") -> v }
}
