package graft.api

import graft.query.{Excerpts, Executor, QueryParser}
import org.apache.spark.sql.DataFrame

case class Hit(id: Long, score: Double, excerpt: String)
case class Completion(text: String, score: Double, dc: Long, oc: Long)
case class SearchResult(query: String, hits: Seq[Hit], completions: Seq[Completion]) {

  /** Reference-shaped JSON (CompletionServer.cpp:1597-1711):
    * completions with sc/dc/oc, hits with score/id/excerpt.
    */
  def toJson: String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val cs = completions.map(c =>
      s"""{"text":"${esc(c.text)}","sc":${c.score},"dc":${c.dc},"oc":${c.oc}}""").mkString(",")
    val hs = hits.map(h =>
      s"""{"id":${h.id},"score":${h.score},"excerpt":"${esc(h.excerpt)}"}""").mkString(",")
    s"""{"result":{"query":"${esc(query)}",""" +
      s""""completions":{"sent":${completions.size},"c":[$cs]},""" +
      s""""hits":{"sent":${hits.size},"hit":[$hs]}}}"""
  }
}

/** User-facing search facade: one call = parse -> evaluate -> top-k hits +
  * completions + excerpts (the reference's HTTP handler semantics,
  * minus HTTP). `search` runs the logical path over a corpus; `searchIndex`
  * the physical path over a built index + docs store.
  */
object Search {

  def search(corpus: DataFrame, query: String, k: Int = 10,
             completionsK: Int = 10, excerptRadius: Int = 2): SearchResult =
    assemble(query, k, completionsK,
      Executor.topK(corpus, query, k),
      Executor.completions(corpus, query, completionsK),
      (hits, ex, pf) => Excerpts.generate(corpus, hits, ex, pf, excerptRadius))

  /** Physical-path variant: hits/completions from the block index, excerpt
    * text from its docs store; the corpus is never read. With `cache`, a
    * serving session's atoms resolve through the history
    * ([[graft.query.IndexQueryCache]]): prefix extensions filter cached
    * relations instead of re-scanning blocks.
    */
  def searchIndex(reader: graft.index.IndexReader, query: String, k: Int = 10,
                  completionsK: Int = 10, excerptRadius: Int = 2,
                  cache: Option[graft.query.IndexQueryCache] = None,
                  params: graft.query.QueryParams = graft.query.QueryParams.Default): SearchResult = {
    val topk = cache match {
      case Some(c) => graft.query.IndexExecutor.topK(reader, query, k, params, c)
      case None => graft.query.IndexExecutor.topK(reader, query, k, params)
    }
    // stays by-name through assemble: completions plan (and its candidate
    // round-trips) only builds when the last part is a prefix
    def compl = cache match {
      case Some(c) =>
        graft.query.IndexExecutor.completions(reader, query, completionsK, params, c)
      case None =>
        graft.query.IndexExecutor.completions(reader, query, completionsK, params)
    }
    assemble(query, k, completionsK, topk, compl,
      (hits, ex, pf) =>
        // no docs store built next to this index -> hits without excerpts
        // (the reference server likewise needs docs.DB for excerpts)
        if (reader.hasDocsStore)
          Excerpts.generate(reader.docs, hits, ex, pf, excerptRadius)
        else hits.sparkSession.emptyDataFrame
          .select(org.apache.spark.sql.functions.lit(0L).as("doc_id"),
            org.apache.spark.sql.functions.lit("").as("excerpt"))
          .limit(0))
  }

  private def assemble(query: String, k: Int, completionsK: Int,
                       hitsDf: DataFrame, completionsDf: => DataFrame,
                       excerptsFor: (DataFrame, Seq[String], Seq[String]) => DataFrame): SearchResult = {
    val parsed = QueryParser.parse(query)
    // highlight terms: exact words + prefixes of the query
    val words = parsed.parts.map(_.atom).collect {
      case w: QueryParser.Word if !w.not => w
      // representative word alternative (OR alts may also be ranges)
      case QueryParser.OrAtoms(alts)
          if alts.exists(_.isInstanceOf[QueryParser.Word]) =>
        alts.collectFirst { case w: QueryParser.Word => w }.get
    }
    val exact = words.filterNot(_.prefix).map(_.text)
    val prefixes = words.filter(_.prefix).map(_.text)
    val excerpts = excerptsFor(hitsDf, exact, prefixes)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val hits = hitsDf.collect().map { r =>
      Hit(r.getLong(0), r.getDouble(1), excerpts.getOrElse(r.getLong(0), ""))
    }.toSeq

    val lastIsPrefix = parsed.parts.last.atom match {
      case w: QueryParser.Word => w.prefix
      case _ => false
    }
    val comps =
      if (!lastIsPrefix) Seq.empty
      else completionsDf.collect().map { r =>
        Completion(r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))
      }.toSeq

    SearchResult(query, hits, comps)
  }
}
