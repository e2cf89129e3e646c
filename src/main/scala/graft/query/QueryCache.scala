package graft.query

import graft.core.Analysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Result cache / history (reference: History.h:25-110 -- byte-budgeted
  * LRU of query -> QueryResult, plus the prefix-filtering fast path
  * copyAndFilter, CompleterBase.cpp:2435-2504: answer `schedul*` by
  * filtering the cached postings of `schedu*` instead of touching the
  * index).
  *
  * Spark translation: an LRU of query string -> persisted Dataset, evicted
  * by BOTH an entry cap and a byte budget (reference: HISTORY_MAX_SIZE,
  * Globals.cpp -- the history owns a bounded number of BYTES, not entries;
  * 200 cached `a*`-sized relations is unbounded memory at production
  * scale). Entry sizes are measured once at insert from the materialized
  * relation (see [[QueryHistory.estimateBytes]]). The filtering fast path
  * re-filters the cached matched doc-term relation by the narrower term
  * range -- no re-scan, no re-tokenize; Catalyst plans a filter over the
  * in-memory relation.
  */
class QueryCache(maxEntries: Int = 200,
                 maxBytes: Long = QueryHistory.DefaultMaxBytes) {

  /** inflight counts derivations currently materializing OUTSIDE the lock
    * from this entry's relation: eviction skips such entries, so the base
    * of an in-flight copyAndFilter is never unpersisted mid-job (the
    * round-3 corruption scenario) -- the recency refresh alone cannot
    * guarantee that against an oversized insert evicting everything.
    */
  private case class Entry(prefix: String, matched: DataFrame, bytes: Long,
                           inflight: java.util.concurrent.atomic.AtomicInteger =
                             new java.util.concurrent.atomic.AtomicInteger(0))
  private val lru = new java.util.LinkedHashMap[String, Entry](16, 0.75f, true)
  private var totalBytes = 0L

  var hits = 0L
  var filteredHits = 0L
  var misses = 0L
  var evictions = 0L

  /** Matched doc-term relation for a prefix query, via cache:
    * exact hit, or filter of any cached shorter prefix, or compute+persist.
    *
    * The monitor guards only map lookups/puts (same discipline as
    * [[IndexQueryCache.atomScored]]): persist and the size measurement run
    * blocking driver jobs and must not serialize a serving session's
    * unrelated queries behind one cold miss. Two threads missing the same
    * prefix may both compute; the loser's handle is dropped (its
    * semantically-equal plan shares the winner's single Spark cache entry).
    */
  def matchedForPrefix(corpus: DataFrame, prefix: String): DataFrame = {
    val fast: Either[(Option[DataFrame], Option[Entry]), DataFrame] = synchronized {
      val exact = lru.get(prefix)
      if (exact != null) { hits += 1; Right(exact.matched) }
      else {
        // copyAndFilter fast path: longest cached proper prefix of `prefix`
        val candidates = lru.entrySet().iterator()
        var best: Entry = null
        while (candidates.hasNext) {
          val e = candidates.next().getValue
          if (prefix.startsWith(e.prefix) && (best == null || e.prefix.length > best.prefix.length))
            best = e
        }
        if (best != null) {
          filteredHits += 1
          // refresh the base entry's recency AND mark it in flight: the
          // derived plan materializes outside the lock, and eviction must
          // neither pick the hottest base (LRU) nor unpersist it mid-job
          // (the inflight skip in evictOverBudget)
          lru.get(best.prefix)
          best.inflight.incrementAndGet()
          Left((Some(best.matched.filter(col("term").startsWith(prefix))), Some(best)))
        } else {
          misses += 1
          Left((None, None))
        }
      }
    }
    fast match {
      case Right(df) => df
      case Left((planOpt, baseOpt)) =>
        // outside the lock: may run driver jobs (tokenize scan, persist
        // materialization via the size measurement)
        try {
          val matched = planOpt.getOrElse(
            Analysis.docTerms(corpus).toDF().filter(col("term").startsWith(prefix)))
          val persisted = matched.persist()
          val bytes = QueryHistory.estimateBytes(persisted)
          synchronized {
            val won = lru.get(prefix)
            if (won != null) {
              // lost the race. If the two plans are semantically equal they
              // share ONE Spark cache entry, which the winner's eviction
              // releases -- unpersisting here would yank it from under the
              // winner's possibly in-flight query. If they are NOT equal
              // (we scanned cold, the winner filtered a cached base), ours
              // is a distinct entry nobody references: release it or it
              // pins executor storage forever.
              if (!persisted.queryExecution.analyzed
                    .sameResult(won.matched.queryExecution.analyzed))
                persisted.unpersist()
              won.matched
            } else {
              lru.put(prefix, Entry(prefix, persisted, bytes))
              totalBytes += bytes
              evictOverBudget()
              persisted
            }
          }
        } finally baseOpt.foreach(_.inflight.decrementAndGet())
    }
  }

  /** Evict least-recently-used entries while over the entry cap or byte
    * budget; the just-inserted (youngest) entry is never the victim, so a
    * single oversized relation stays cached alone rather than thrashing.
    * Entries with in-flight derivations are skipped -- unpersisting a base
    * while a filter-of-base materializes corrupted results (round 3).
    */
  private def evictOverBudget(): Unit = {
    val it = lru.entrySet().iterator()
    var seen = 0
    val candidates = lru.size - 1 // everything but the youngest
    while ((lru.size > maxEntries || totalBytes > maxBytes) &&
        it.hasNext && seen < candidates) {
      val eldest = it.next()
      seen += 1
      if (eldest.getValue.inflight.get() == 0) {
        eldest.getValue.matched.unpersist()
        totalBytes -= eldest.getValue.bytes
        evictions += 1
        it.remove()
      }
    }
  }

  /** Current estimated cached bytes (spec hook). */
  def cachedBytes: Long = synchronized(totalBytes)
  def size: Int = synchronized(lru.size)

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
    // same in-flight discipline as eviction: a base whose derivation is
    // materializing outside the lock is dropped from the map but NOT
    // unpersisted (a rare bounded leak beats the mid-job unpersist)
    lru.values().forEach(e => if (e.inflight.get() == 0) e.matched.unpersist())
    lru.clear()
    totalBytes = 0
    hits = 0; filteredHits = 0; misses = 0; evictions = 0
  }
}

/** Process-wide serving history and its helpers.
  *
  * The reference runs ONE History per server process (History.h:25-77;
  * StartCompletionServer allocates it once); every query entry point --
  * with or without an explicit cache argument -- answers through it. The
  * Spark analog: [[QueryHistory.default]] is the one deterministic owner
  * of persisted atom relations for every facade ([[Executor]],
  * [[IndexExecutor]], [[graft.api.Search]]) that is not handed an explicit
  * [[IndexQueryCache]]. There is deliberately NO other persist path in the
  * query engine (the round-3 one-way process persist budget is deleted):
  * eviction is always the history's LRU + byte budget, so a long-lived
  * serving session's executor storage is bounded and decode-once
  * memoization never silently dies.
  */
object QueryHistory {

  /** Reference History byte budget default (Globals.cpp: HISTORY_MAX_SIZE,
    * 32 MB). Explicit caches default to this.
    */
  val DefaultMaxBytes: Long = 32L << 20

  /** The process-wide default history. Sized above the class default
    * (serving boxes are larger than the 2008 reference default; override
    * with -Dgraft.history.maxBytes / -Dgraft.history.maxEntries).
    */
  lazy val default: IndexQueryCache = new IndexQueryCache(
    maxEntries = sys.props.getOrElse("graft.history.maxEntries", "200").toInt,
    maxBytes = sys.props.getOrElse("graft.history.maxBytes", (256L << 20).toString).toLong)

  /** Stable per-object ids for corpus DataFrames: the logical path keys
    * its history entries by corpus INSTANCE (a serving session holds one
    * corpus DataFrame), never by plan equality -- two in-memory corpora
    * with identical schemas must not share cache rows, and
    * System.identityHashCode alone can collide. WEAK keys: a session that
    * builds a fresh frame per request (`spark.read.parquet(...)` then
    * `Executor.topK`) must not accumulate one retained plan per request
    * forever -- a collected corpus simply gets a new id next time, and its
    * orphaned history entries age out of the LRU. Identity semantics hold
    * because Dataset does not override equals/hashCode (Object identity);
    * only DataFrames are passed here.
    */
  private val corpusIds = new java.util.WeakHashMap[AnyRef, java.lang.Long]()
  private val nextCorpusId = new java.util.concurrent.atomic.AtomicLong(0L)
  def corpusId(corpus: AnyRef): Long = corpusIds.synchronized {
    val existing = corpusIds.get(corpus)
    if (existing != null) existing
    else {
      val id = nextCorpusId.incrementAndGet()
      corpusIds.put(corpus, id)
      id
    }
  }

  /** Estimated logical bytes of a (persisted) relation: one aggregation
    * job over the cached data summing per-column sizes (fixed-width types
    * by their default size, strings/binary/arrays by measured length).
    * The analog of the reference History recording each QueryResult's
    * buffer size (History.h:61-77); runs on the in-memory relation the
    * query was about to materialize anyway.
    */
  def estimateBytes(df: DataFrame): Long = {
    import org.apache.spark.sql.types._
    val perRow: Seq[Column] = df.schema.fields.toSeq.map { f =>
      f.dataType match {
        case StringType | BinaryType =>
          coalesce(length(col(f.name)).cast("long"), lit(0L)) + lit(16L)
        case at: ArrayType =>
          greatest(coalesce(size(col(f.name)).cast("long"), lit(0L)), lit(0L)) *
            lit(at.elementType.defaultSize.toLong) + lit(16L)
        case dt => lit(dt.defaultSize.toLong)
      }
    }
    val sumCol = perRow.reduceOption(_ + _).getOrElse(lit(0L))
    val row = df.agg(sum(sumCol).as("bytes")).head()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }
}

/** History for the PHYSICAL path (reference: History.h:25-110 +
  * copyAndFilter, CompleterBase.cpp:2435-2504, which the reference applies
  * to index results -- the HYB blocks are only touched when no history
  * entry can be filtered): an LRU of atom -> persisted scored posting
  * relation, bounded by entry count AND a byte budget (History's
  * HISTORY_MAX_SIZE). A prefix atom extending a cached one (`schedul*`
  * after `schedu*`) -- or an exact word under a cached prefix -- is
  * answered by FILTERING the cached in-memory relation: zero block
  * locate/decode jobs. Scores stay correct because BM25 is per-(doc, term)
  * with global df, unchanged by narrowing the term set.
  *
  * Entries are persisted Datasets (MEMORY_AND_DISK), measured once at
  * insert ([[QueryHistory.estimateBytes]]) and unpersisted on evict.
  * Eviction is the ONE deliberate unpersist in the query path: it is
  * deterministic (capacity/byte overflow, least-recently-used entry) --
  * asynchronous GC-timed reaping was tried and rejected because
  * unpersisting a SQL-cached plan while a query may still be executing
  * corrupted results. An LRU victim is by construction the entry least
  * likely to be referenced by an in-flight query.
  *
  * Hand-out protection is two-layered: the in-flight guard covers the
  * cache's own copyAndFilter derivations end-to-end, and the
  * [[IndexQueryCache.borrow]] scope extends the same refcount discipline
  * to EVERY relation handed out inside a caller-delimited region (the
  * serving facade wraps each request in one), so an exact hit cannot be
  * evicted mid-materialization under byte pressure. Outside any borrow
  * scope the old mitigation still applies: a hit refreshes recency, so
  * the LRU victim is by construction the entry least likely in flight.
  */
class IndexQueryCache(maxEntries: Int = 200,
                      maxBytes: Long = QueryHistory.DefaultMaxBytes) {
  import QueryParser._

  /** Entries are keyed by (index dir | corpus id, index epoch, atom): one
    * cache safely serves several readers / corpora / survives a rebuild
    * into the same dir without serving another index's postings.
    */
  private type Key = (String, Long, Atom)
  /** owned = this cache persisted the relation and may unpersist it on
    * evict. A relation can arrive already SQL-cached (Spark's cache
    * manager is keyed by semantic plan, so a semantically-equal relation
    * persisted elsewhere shares one cache entry): its bytes still count
    * against the budget (the entry pins that much storage) but eviction
    * must not unpersist what another owner may still serve.
    */
  /** inflight: derivations currently materializing outside the lock from
    * this entry's relation; eviction skips such entries (see QueryCache).
    */
  /** dropped: the entry left the map (clear) while references were still
    * out; the LAST reference release performs the deferred unpersist --
    * without it a clear() during a borrow scope would leak the scope's
    * whole working set of persisted relations until JVM exit.
    */
  private case class Entry(df: DataFrame, bytes: Long, owned: Boolean,
                           pinned: Boolean = false,
                           inflight: java.util.concurrent.atomic.AtomicInteger =
                             new java.util.concurrent.atomic.AtomicInteger(0),
                           dropped: java.util.concurrent.atomic.AtomicBoolean =
                             new java.util.concurrent.atomic.AtomicBoolean(false))

  /** Release one reference; if the entry was dropped from the map while
    * referenced, the last release unpersists (double-unpersist on a
    * release race is a harmless no-op in Spark).
    */
  private def releaseRef(e: Entry): Unit =
    if (e.inflight.decrementAndGet() == 0 && e.dropped.get() && e.owned)
      e.df.unpersist()
  private val lru = new java.util.LinkedHashMap[Key, Entry](16, 0.75f, true)
  private var totalBytes = 0L

  /** While true, inserts are PINNED: exempt from LRU/byte eviction for the
    * cache's lifetime (reference `--keep-in-history-queries`,
    * StartCompletionServer.cpp 'A': results for the named queries are
    * computed once and never leave the history -- typically the expensive
    * one-letter prefixes). Startup-only switch, set around the keep-query
    * pass before the server accepts traffic; pinned bytes still count
    * against the budget so the remaining headroom for unpinned entries is
    * honest.
    */
  @volatile private var pinInserts = false

  /** Run `f` with insert-pinning on (see [[pinInserts]]). */
  def pinningInserts[T](f: => T): T = {
    pinInserts = true
    try f finally pinInserts = false
  }

  /** Borrow scope: while `f` runs on THIS thread, every entry the cache
    * hands out (exact hit, filtered-derivation base, fresh insert) holds
    * an extra in-flight reference, released when the scope exits. This
    * closes the documented residual hazard of the bare hand-out path: a
    * returned relation could be evicted -- and its Spark cache entry
    * unpersisted -- by ANOTHER request's oversized insert (or even this
    * request's own later insert) while the caller's job was still
    * materializing it. Wrap one request's parse -> evaluate ->
    * materialize in `borrow { ... }` (the serving facade
    * [[graft.api.Search.searchIndex]] does) and eviction skips its
    * relations until the scope closes; the discipline and the guard are
    * the same as the copyAndFilter `inflight` path. Scopes nest; the
    * thread-local frame costs nothing when no scope is active.
    *
    * Budget bound while scopes are open: every handed-out entry is
    * inflight-pinned for the scope's duration, so under a small byte
    * budget `evictOverBudget` may free nothing and `totalBytes` can
    * exceed `maxBytes` by up to ONE request's distinct-atom working set
    * per concurrently open scope. Operators sizing `maxBytes` should
    * treat the budget as advisory headroom, not a hard cap, while
    * requests are in flight.
    */
  def borrow[T](f: => T): T = {
    val prev = borrowFrame.get()
    val frame = new java.util.ArrayList[Entry]()
    borrowFrame.set(frame)
    try f finally {
      frame.forEach(releaseRef)
      borrowFrame.set(prev)
    }
  }

  private val borrowFrame = new ThreadLocal[java.util.ArrayList[Entry]]()

  /** Register a handed-out entry with the active borrow scope, if any.
    * Called under the monitor (entry liveness) -- the increment lands
    * before any evictor can next examine the entry.
    */
  private def lend(e: Entry): Unit = {
    val frame = borrowFrame.get()
    if (frame != null) { e.inflight.incrementAndGet(); frame.add(e) }
  }

  /** Number of pinned entries (spec hook). */
  def pinnedCount: Int = synchronized {
    var n = 0
    lru.values().forEach(e => if (e.pinned) n += 1)
    n
  }

  var hits = 0L
  var filteredHits = 0L
  var misses = 0L
  var evictions = 0L

  /** Scored relation for `atom`: exact hit, filter of a cached broader
    * prefix, or compute (+persist).
    *
    * The monitor guards only map lookups/puts -- `compute`, persist and
    * the size measurement run blocking driver jobs and MUST NOT serialize
    * a serving session's unrelated queries behind one miss. Two threads
    * missing the same atom concurrently may both compute; the loser's
    * handle is simply dropped (its semantically-equal plan shares the
    * winner's single Spark cache entry -- see the in-method comment).
    */
  def atomScored(dir: String, epoch: Long, atom: Atom,
                 compute: Atom => DataFrame): DataFrame = {
    val key = (dir, epoch, atom)
    val fast: Either[(Option[DataFrame], Option[Entry]), DataFrame] = synchronized {
      val exact = lru.get(key)
      if (exact != null) { hits += 1; lend(exact); Right(exact.df) }
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
          var best: Option[(Word, Entry)] = None
          lru.forEach { (k, v) =>
            k match {
              case (`dir`, `epoch`, c: Word) if c.prefix && !c.not &&
                  text.startsWith(c.text) &&
                  best.forall(_._1.text.length < c.text.length) =>
                best = Some((c, v))
              case _ => ()
            }
          }
          best.map { case (broader, entry) =>
            // deriving from the broader entry is an access: refresh its
            // recency so the hottest base prefix is not the next LRU
            // victim, and mark it in flight so eviction cannot unpersist
            // it while the derived plan materializes outside the lock
            lru.get((dir, epoch, broader))
            entry.inflight.incrementAndGet()
            lend(entry) // base stays guarded for the caller's whole scope
            (entry.df.filter(pred), entry)
          }
        }
        narrowed match {
          case Some((df, base)) => filteredHits += 1; Left((Some(df), Some(base)))
          case None => misses += 1; Left((None, None))
        }
      }
    }
    fast match {
      case Right(df) => df
      case Left((planOpt, baseOpt)) =>
        try {
        // outside the lock: may run driver jobs (block locate, decode,
        // size measurement)
        val plan0 = planOpt.getOrElse(compute(atom))
        // shape the persisted relation to the session's query parallelism:
        // atom relations inherit the block scan's partitioning (32 cached
        // partitions locally), but every WARM query re-reads them, paying
        // per-partition task overhead each time. coalesce to
        // spark.sql.shuffle.partitions -- the latency-phase setting (8)
        // locally, a no-op at production partition counts (coalesce never
        // raises), so the shape stays scale-safe.
        val owned = plan0.storageLevel == org.apache.spark.storage.StorageLevel.NONE
        val target = scala.util.Try(
          plan0.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
          .getOrElse(0)
        // coalesce only what WE persist -- a relation that arrived
        // persisted keeps its owner's shape (coalescing it would hide its
        // storage level and double-persist a derived plan)
        val plan = if (owned && target > 0) plan0.coalesce(target) else plan0
        val persisted =
          if (owned) plan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          else plan // arrived persisted: owned elsewhere, never unpersist it
        val bytes = QueryHistory.estimateBytes(persisted)
        synchronized {
          val won = lru.get(key)
          if (won != null) {
            // Another thread beat us to the insert. When the two threads'
            // plans are semantically equal they share ONE Spark cache
            // entry, which the winner's eviction will release --
            // unpersisting here would yank that shared entry out from
            // under the winner's possibly in-flight query (the round-3
            // corruption scenario). When they are NOT equal (one raced
            // through the cold compute, the other filtered a cached
            // broader prefix), ours is a distinct entry nobody references:
            // release it (only if WE persisted it) or it pins executor
            // storage until JVM exit.
            if (owned && !persisted.queryExecution.analyzed
                  .sameResult(won.df.queryExecution.analyzed))
              persisted.unpersist()
            lend(won)
            won.df
          } else {
            val e = Entry(persisted, bytes, owned, pinned = pinInserts)
            lru.put(key, e)
            totalBytes += bytes
            lend(e) // guard our own insert before eviction can see it
            evictOverBudget()
            persisted
          }
        }
        } finally baseOpt.foreach(releaseRef)
    }
  }

  /** Evict least-recently-used UNPINNED entries while over the entry cap
    * or byte budget; the just-inserted (youngest) entry is never the
    * victim -- one oversized relation evicts the rest and stays cached
    * alone rather than thrashing in and out. Pinned entries are skipped
    * (never evicted), so a budget fully occupied by pins simply stops
    * evicting -- the reference's keep-queries behave the same way.
    */
  private def evictOverBudget(): Unit = {
    val it = lru.entrySet().iterator()
    var seen = 0
    val candidates = lru.size - 1 // everything but the youngest
    while ((lru.size > maxEntries || totalBytes > maxBytes) &&
        it.hasNext && seen < candidates) {
      val eldest = it.next()
      seen += 1
      // skip pinned entries AND bases of in-flight derivations (an
      // unpersist under a materializing filter-of-base corrupted results
      // -- round 3); the in-flight skip is transient, the entry is
      // evictable again once the derivation lands
      if (!eldest.getValue.pinned && eldest.getValue.inflight.get() == 0) {
        if (eldest.getValue.owned) eldest.getValue.df.unpersist()
        totalBytes -= eldest.getValue.bytes
        evictions += 1
        it.remove()
      }
    }
  }

  /** Current estimated cached bytes / entry count (spec hooks). */
  def cachedBytes: Long = synchronized(totalBytes)
  def size: Int = synchronized(lru.size)

  def clear(): Unit = synchronized {
    // referenced entries (in-flight derivations, active borrow scopes)
    // are marked dropped instead of unpersisted here; the LAST reference
    // release performs the deferred unpersist (releaseRef) -- nothing
    // leaks, and nothing is yanked from under a materializing query
    lru.values().forEach { e =>
      if (e.owned) {
        e.dropped.set(true)
        if (e.inflight.get() == 0) e.df.unpersist()
      }
    }
    lru.clear()
    totalBytes = 0
    hits = 0; filteredHits = 0; misses = 0; evictions = 0
  }
}
