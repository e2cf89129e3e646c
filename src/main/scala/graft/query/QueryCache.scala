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

/** History for the PHYSICAL path (reference: History.h:25-110 +
  * copyAndFilter, CompleterBase.cpp:2435-2504, which the reference applies
  * to index results -- the HYB blocks are only touched when no history
  * entry can be filtered): an LRU of atom -> persisted scored posting
  * relation. A prefix atom extending a cached one (`schedul*` after
  * `schedu*`) -- or an exact word under a cached prefix -- is answered by
  * FILTERING the cached in-memory relation: zero block locate/decode jobs.
  * Scores stay correct because BM25 is per-(doc, term) with global df,
  * unchanged by narrowing the term set.
  *
  * One instance per (reader, epoch) serving session; entries are persisted
  * Datasets (MEMORY_AND_DISK), unpersisted on evict. Eviction is the ONE
  * deliberate unpersist in the query path: it is deterministic (capacity
  * overflow, least-recently-used entry) -- asynchronous GC-timed reaping
  * was tried and rejected because unpersisting a SQL-cached plan while a
  * query may still be executing corrupted results (see
  * AtomSource.atomScoredCached). An LRU victim is by construction the
  * entry least likely to be referenced by an in-flight query.
  */
class IndexQueryCache(maxEntries: Int = 200) {
  import QueryParser._

  /** Entries are keyed by (index dir, index epoch, atom): one cache can
    * safely serve several readers / survive a rebuild into the same dir
    * without serving another index's postings.
    */
  private type Key = (String, Long, Atom)
  private val lru = new java.util.LinkedHashMap[Key, DataFrame](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[Key, DataFrame]): Boolean = {
      val evict = size() > maxEntries
      if (evict) e.getValue.unpersist()
      evict
    }
  }

  var hits = 0L
  var filteredHits = 0L
  var misses = 0L

  /** Scored relation for `atom`: exact hit, filter of a cached broader
    * prefix, or compute (+persist).
    *
    * The monitor guards only map lookups/puts -- `compute` runs blocking
    * driver jobs (block locate round-trips) and MUST NOT serialize a
    * serving session's unrelated queries behind one miss. Two threads
    * missing the same atom concurrently may both compute; the loser's
    * (never-persisted) plan is discarded.
    */
  def atomScored(dir: String, epoch: Long, atom: Atom,
                 compute: Atom => DataFrame): DataFrame = {
    val key = (dir, epoch, atom)
    val fast: Either[Unit, DataFrame] = synchronized {
      val exact = lru.get(key)
      if (exact != null) { hits += 1; Right(exact) }
      else {
        // copyAndFilter: the narrowing predicate for `atom` under a cached
        // broader prefix entry, if either is expressible (plan-only, no jobs)
        val want = atom match {
          case w: Word if !w.not && !w.fuzzy && !w.synonym && !w.exact && w.prefix =>
            Some((w.text, col("term").startsWith(w.text)))
          case w: Word if !w.not && !w.fuzzy && !w.synonym =>
            Some((w.text, col("term") === w.text))
          case _ => None
        }
        val narrowed = want.flatMap { case (text, pred) =>
          var best: Option[(String, DataFrame)] = None
          lru.forEach { (k, v) =>
            k match {
              case (`dir`, `epoch`, c: Word) if c.prefix && !c.not &&
                  text.startsWith(c.text) &&
                  best.forall(_._1.length < c.text.length) =>
                best = Some((c.text, v))
              case _ => ()
            }
          }
          best.map { case (_, broader) => broader.filter(pred) }
        }
        narrowed match {
          case Some(df) =>
            filteredHits += 1
            val persisted = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            lru.put(key, persisted)
            Right(persisted)
          case None => misses += 1; Left(())
        }
      }
    }
    fast match {
      case Right(df) => df
      case Left(_) =>
        val computed = compute(atom) // outside the lock: may run driver jobs
        synchronized {
          val won = lru.get(key)
          if (won != null) won // another thread beat us; ours was never persisted
          else {
            val persisted =
              computed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            lru.put(key, persisted)
            persisted
          }
        }
    }
  }

  def clear(): Unit = synchronized {
    lru.values().forEach(_.unpersist())
    lru.clear()
    hits = 0; filteredHits = 0; misses = 0
  }
}
