package graft.api

import graft.query.{Excerpts, Executor, QueryParser}
import org.apache.spark.sql.DataFrame

/** One hit; url comes from the docs store / a corpus `url` column when
  * present (reference: hits carry title+url from docs.DB,
  * CompletionServer.cpp:1556-1563), else "".
  */
case class Hit(id: Long, score: Double, excerpt: String, url: String = "")
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
      s"""{"id":${h.id},"score":${h.score},"url":"${esc(h.url)}",""" +
        s""""excerpt":"${esc(h.excerpt)}"}""").mkString(",")
    s"""{"result":{"query":"${esc(query)}",""" +
      s""""completions":{"sent":${completions.size},"c":[$cs]},""" +
      s""""hits":{"sent":${hits.size},"hit":[$hs]}}}"""
  }

  /** Reference-shaped XML -- the reference's DEFAULT wire format
    * (CompletionServer.cpp:1468-1594): `<result>` with `<query>`,
    * `<status>`, `<completions sent=..>` of `<c sc dc oc>` elements and
    * `<hits sent=.. first=..>` of `<hit score id>` elements carrying
    * `<url>` (from the docs store) and `<excerpt>`s. Elements we cannot
    * fill (`<info>` needs a hit title source; per-query log ids and
    * timings live in the server) are omitted rather than faked.
    */
  def toXml(firstHit: Int = 0): String = {
    def esc(s: String) = s.flatMap {
      case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
      case '"' => "&quot;"; case c => c.toString
    }
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\r\n<result>\r\n"
    sb ++= s"<query>${esc(query)}</query>\r\n"
    sb ++= "<status code=\"200\">OK</status>\r\n"
    sb ++= s"""<completions sent="${completions.size}">\r\n"""
    completions.foreach { c =>
      sb ++= s"""<c sc="${c.score}" dc="${c.dc}" oc="${c.oc}">${esc(c.text)}</c>\r\n"""
    }
    sb ++= "</completions>\r\n"
    sb ++= s"""<hits sent="${hits.size}" first="$firstHit">\r\n"""
    hits.foreach { h =>
      sb ++= s"""<hit score="${h.score}" id="${h.id}">\r\n"""
      if (h.url.nonEmpty) sb ++= s"<url>${esc(h.url)}</url>\r\n"
      if (h.excerpt.nonEmpty) sb ++= s"<excerpt>${esc(h.excerpt)}</excerpt>\r\n"
      sb ++= "</hit>\r\n"
    }
    sb ++= "</hits>\r\n</result>\r\n"
    sb.toString
  }
}

/** User-facing search facade: one call = parse -> evaluate -> top-k hits +
  * completions + excerpts (the reference's HTTP handler semantics,
  * minus HTTP). `search` runs the logical path over a corpus; `searchIndex`
  * the physical path over a built index + docs store.
  */
object Search {

  /** Logical-path search. The full request surface rides in `params`:
    * `firstHit` paginates the hit window, `rankDocs`/`rankWords` pick the
    * orderings, `excerptsPerHit` the excerpt count (reference `f=`, `rd=`,
    * `rw=`, `en=`; QueryParameters.cpp:290-305).
    */
  def search(corpus: DataFrame, query: String, k: Int = 10,
             completionsK: Int = 10, excerptRadius: Int = 2,
             params: graft.query.QueryParams = graft.query.QueryParams.Default): SearchResult =
    assemble(query, k, completionsK,
      Executor.hits(corpus, query, k, params),
      Executor.completions(corpus, query, completionsK, params),
      (hits, ex, pf) =>
        Excerpts.generateAll(corpus, hits, ex, pf, excerptRadius, params.excerptsPerHit),
      hits => if (corpus.columns.contains("url")) urlsOf(corpus, hits) else Map.empty)

  /** Physical-path variant: hits/completions from the block index, excerpt
    * text from its docs store; the corpus is never read. With `cache`, a
    * serving session's atoms resolve through that explicit history;
    * without one they route through the process default
    * ([[graft.query.QueryHistory.default]]) -- prefix extensions filter
    * cached relations instead of re-scanning blocks either way.
    */
  def searchIndex(reader: graft.index.IndexReader, query: String, k: Int = 10,
                  completionsK: Int = 10, excerptRadius: Int = 2,
                  cache: Option[graft.query.IndexQueryCache] = None,
                  params: graft.query.QueryParams = graft.query.QueryParams.Default): SearchResult =
    // borrow scope: every history relation handed to this request stays
    // eviction-guarded until assemble() has fully materialized the
    // result -- a concurrent request's oversized insert (or our own)
    // cannot unpersist a relation mid-collect (IndexQueryCache.borrow)
    cache.getOrElse(graft.query.QueryHistory.default).borrow {
      searchIndexInner(reader, query, k, completionsK, excerptRadius, cache, params)
    }

  private def searchIndexInner(reader: graft.index.IndexReader, query: String, k: Int,
                  completionsK: Int, excerptRadius: Int,
                  cache: Option[graft.query.IndexQueryCache],
                  params: graft.query.QueryParams): SearchResult = {
    // serve* facades: the driver-resident grammar path under its guards
    // (zero Spark jobs warm), the distributed plans past them
    val topk = graft.query.IndexExecutor.serveHits(reader, query, k, params, cache)
    // stays by-name through assemble: completions plan (and its candidate
    // round-trips) only builds when the last part is a prefix
    def compl = graft.query.IndexExecutor.serveCompletions(
      reader, query, completionsK, params, cache)
    assemble(query, k, completionsK, topk, compl,
      (hits, ex, pf) =>
        // no docs store built next to this index -> hits without excerpts
        // (the reference server likewise needs docs.DB for excerpts)
        if (reader.hasDocsStore)
          // locally-served hits read texts from the driver docs LRU (zero
          // jobs warm); distributed hits keep the semi-join
          graft.query.LocalServe.excerptsAll(reader, hits, ex, pf,
            excerptRadius, params.excerptsPerHit).getOrElse(
            Excerpts.generateAll(reader.docs, hits, ex, pf, excerptRadius,
              params.excerptsPerHit))
        else hits.sparkSession.emptyDataFrame
          .select(org.apache.spark.sql.functions.lit(0L).as("doc_id"),
            org.apache.spark.sql.functions.lit("").as("excerpt"))
          .limit(0),
      hits =>
        if (reader.hasDocsStore)
          graft.query.LocalServe.urls(reader, hits)
            .getOrElse(urlsOf(reader.docs, hits))
        else Map.empty)
  }

  /** Hit urls from a (doc_id, url, ...) relation: broadcast semi-join on
    * the k hit ids, one k-sized driver round-trip.
    */
  private def urlsOf(docs: DataFrame, hits: DataFrame): Map[Long, String] = {
    import org.apache.spark.sql.functions.col
    docs.join(hits.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("url"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  private def assemble(query: String, k: Int, completionsK: Int,
                       hitsDf0: DataFrame, completionsDf: => DataFrame,
                       excerptsFor: (DataFrame, Seq[String], Seq[String]) => DataFrame,
                       urlsFor: DataFrame => Map[Long, String]): SearchResult = {
    // Execute the top-k plan ONCE and re-expose the k rows as a
    // LocalRelation: the excerpt join, the url join and the final hit
    // assembly below all consume the hits, and a distributed-fallback plan
    // (over-budget postings, fuzzy best-match) would otherwise run end-to-end
    // for EACH consumer. A LocalRelation also satisfies the
    // LocalServe.excerptsAll guard, so fallback hits still serve excerpts
    // and urls from the driver docs LRU (one pruned scan cold, zero jobs
    // warm) instead of two per-request semi-joins. For the warm serving
    // path the hits are already a (cached) LocalRelation and this collect
    // runs no jobs.
    val hitsDf = hitsDf0.sparkSession.createDataFrame(
      java.util.Arrays.asList(hitsDf0.collect(): _*), hitsDf0.schema)
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
    val urls = urlsFor(hitsDf)

    val hits = hitsDf.collect().map { r =>
      Hit(r.getLong(0), r.getDouble(1), excerpts.getOrElse(r.getLong(0), ""),
        urls.getOrElse(r.getLong(0), ""))
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
