package graft.query

import graft.core.Analysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Result cache / history (reference: History.h:25-110 -- byte-budgeted
  * LRU of query -> QueryResult, plus the prefix-filtering fast path
  * copyAndFilter, CompleterBase.cpp:2435-2504: answer `schedul*` by
  * filtering the cached postings of `schedu*` instead of touching the
  * index).
  *
  * Spark translation: an LRU of query string -> persisted Dataset. The
  * filtering fast path re-filters the cached matched doc-term relation by
  * the narrower term range -- no re-scan, no re-tokenize; Catalyst plans a
  * filter over the in-memory relation.
  */
class QueryCache(maxEntries: Int = 200) {

  private case class Entry(prefix: String, matched: DataFrame)
  private val lru = new java.util.LinkedHashMap[String, Entry](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, Entry]): Boolean = {
      val evict = size() > maxEntries
      if (evict) e.getValue.matched.unpersist()
      evict
    }
  }

  var hits = 0L
  var filteredHits = 0L
  var misses = 0L

  /** Matched doc-term relation for a prefix query, via cache:
    * exact hit, or filter of any cached shorter prefix, or compute+persist.
    */
  def matchedForPrefix(corpus: DataFrame, prefix: String): DataFrame = synchronized {
    val exact = lru.get(prefix)
    if (exact != null) { hits += 1; return exact.matched }
    // copyAndFilter fast path: longest cached proper prefix of `prefix`
    val candidates = lru.entrySet().iterator()
    var best: Entry = null
    while (candidates.hasNext) {
      val e = candidates.next().getValue
      if (prefix.startsWith(e.prefix) && (best == null || e.prefix.length > best.prefix.length))
        best = e
    }
    val matched =
      if (best != null) {
        filteredHits += 1
        best.matched.filter(col("term").startsWith(prefix))
      } else {
        misses += 1
        Analysis.docTerms(corpus).toDF().filter(col("term").startsWith(prefix))
      }
    val persisted = matched.persist()
    lru.put(prefix, Entry(prefix, persisted))
    persisted
  }

  /** Re-top-k from the cached matched relation under a (possibly new) k
    * and rank mode -- the reference's History fast path when only the
    * result window or sort changes (CompleterBase.cpp:1106-1266): the
    * postings come from the cache, never from the index/corpus; only the
    * aggregation + TakeOrdered re-runs.
    */
  def topHitsForPrefix(corpus: DataFrame, prefix: String, k: Int,
                       rankBy: String = "score"): DataFrame = {
    val matched = matchedForPrefix(corpus, prefix)
    val st = Analysis.statsCached(corpus)
    val dfTbl = matched.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val base = matched.join(broadcast(dfTbl), "term")
      .select(col("doc_id"),
        Analysis.bm25Col(st.n_docs, st.avgdl, col("tf"), col("df"), col("dl")).as("score"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("score")), 4).as("score"))
    val ordered = rankBy match {
      case "score" => base.orderBy(col("score").desc, col("doc_id").asc)
      case "doc" => base.orderBy(col("doc_id").asc)
      case "doc_desc" => base.orderBy(col("doc_id").desc)
      case other => throw new IllegalArgumentException(s"unknown rank mode: $other")
    }
    ordered.limit(k)
  }

  /** Warm list (reference: --warm-history-queries, src/README.md:40-47):
    * pre-materialize the hot prefixes so first user queries hit the cache.
    */
  def warm(corpus: DataFrame, prefixes: Seq[String]): Unit =
    prefixes.foreach { p => matchedForPrefix(corpus, p).count() }

  def clear(): Unit = synchronized {
    lru.values().forEach(_.matched.unpersist())
    lru.clear()
    hits = 0; filteredHits = 0; misses = 0
  }
}
