package graft.query

import graft.core.Analysis
import graft.index.{Codec, IndexReader}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import QueryParser._

/** Driver-resident GRAMMAR serving -- the local/distributed seam of
  * [[IndexReader.serveTopKOr]] extended to the full query grammar
  * (phrase / near / window chains, NOT, OR, prefix, range, synonym,
  * fuzzy, the 5-knob score algebra, pagination and rank modes).
  *
  * The reference answers every interactive query from RAM-resident
  * posting lists (README.md:16-18; CompleterBase intersects in-process
  * arrays; History.h caches whole results). The distributed [[Eval]] plans
  * are the 10^12-doc path and stay pinned by every correctness gate; this
  * object is the serving fast path in front of them: when every atom of a
  * parsed query resolves to a driver-budget-sized posting volume, the
  * atoms' decoded scored postings are fetched ONCE (one pruned collect per
  * cold atom, LRU-bounded) and the whole part chain -- aggregation
  * algebra, window matching, NOT, top-k -- runs as in-process array
  * arithmetic returning a LocalRelation: ZERO Spark jobs warm.
  *
  * Parity is the contract (spec: LocalServeSpec runs both paths over every
  * grammar shape): same BM25 operand order as [[Analysis.bm25Col]], same
  * 4dp HALF_UP rounding applied BEFORE ordering (Spark round semantics),
  * same total orders, same partial/empty semantics. Join blocks
  * `[q1#q2#...]` evaluate locally too (sub-queries recurse under default
  * params, the distributed twin's contract). Queries past the guards --
  * head atoms over [[IndexReader.MaxLocalPostingsPerQuery]], hull-sized
  * candidate sets, a fuzzy best-match resolution -- return None and the
  * caller falls back to the distributed plans, so at web scale the
  * driver never holds more than the postings budget.
  */
object LocalServe {

  /** One atom's decoded scored postings, driver-resident: parallel arrays,
    * one entry per (term, doc) pair, grouped by term and doc-sorted within
    * a term (the per-(doc, term) row shape of [[AtomSource.atomScored]]).
    * `terms` holds shared references into the candidate slice, not copies.
    */
  final case class LocalAtom(terms: Array[String], docIds: Array[Long],
                             tfs: Array[Long], scores: Array[Double],
                             score1s: Array[Double],
                             positions: Array[Array[Int]]) {
    def nRows: Int = docIds.length
    /** LRU weight: row entries + held positions (both ~16-24 bytes). */
    lazy val weight: Long = {
      var w = nRows.toLong
      var i = 0
      while (i < positions.length) { w += positions(i).length; i += 1 }
      w
    }
  }

  private val EmptyPos = Array.empty[Int]
  private val EmptyAtom = LocalAtom(Array.empty, Array.empty, Array.empty,
    Array.empty, Array.empty, Array.empty)

  /** Per-reader decoded-atom LRU, keyed by (index epoch, atom) so a rebuild
    * into the same directory never serves stale lists; bounded by the same
    * postings budget as the keyword-path list cache
    * ([[IndexReader.LocalListBudgetPostings]]). Held in a weak map keyed by
    * reader INSTANCE: the cache dies with its reader, so rebuilds /
    * short-lived readers cannot accumulate driver memory.
    */
  private final class AtomCache {
    private val lru = new java.util.LinkedHashMap[(Long, Atom), LocalAtom](16, 0.75f, true)
    private var weight = 0L
    def count: Int = synchronized(lru.size)
    def get(epoch: Long, atom: Atom): LocalAtom = synchronized(lru.get((epoch, atom)))
    def put(epoch: Long, atom: Atom, la: LocalAtom): LocalAtom = synchronized {
      val key = (epoch, atom)
      if (lru.get(key) == null) {
        lru.put(key, la)
        weight += la.weight
        val it = lru.entrySet().iterator()
        while (weight > IndexReader.LocalListBudgetPostings && lru.size > 1 &&
            it.hasNext) {
          val e = it.next()
          if (e.getKey != key) { weight -= e.getValue.weight; it.remove() }
        }
      }
      lru.get(key)
    }
  }

  private val caches = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[IndexReader, AtomCache]())
  private def cacheFor(reader: IndexReader): AtomCache =
    caches.computeIfAbsent(reader, _ => new AtomCache)

  /** spec hook: decoded atoms currently held for this reader. */
  private[graft] def cachedAtomCount(reader: IndexReader): Int =
    cacheFor(reader).count

  // ---- atom resolution ------------------------------------------------------

  /** The atom's decoded scored rows, from the reader's LRU or one pruned
    * collect; None when the atom cannot come onto the driver (hull-sized
    * candidate set, or posting volume past the per-query budget).
    */
  private def localAtom(reader: IndexReader, src: IndexAtomSource,
                        atom: Atom): Option[LocalAtom] = {
    val cache = cacheFor(reader)
    val hit = cache.get(reader.indexEpoch, atom)
    if (hit != null) return Some(hit)
    val (runs, slice) = src.candidateRunsSlice(atom)
    if (runs.isEmpty) return Some(EmptyAtom) // unknown word: empty, still local
    slice match {
      case None => None // hull-sized candidate set: stays distributed
      case Some(cand) =>
        if (cand.iterator.map(_._3).sum > IndexReader.MaxLocalPostingsPerQuery)
          return None // head atom: stays distributed
        Some(cache.put(reader.indexEpoch, atom, fetchAtom(reader, runs, cand)))
    }
  }

  /** Resolve every distinct atom of a part chain; all COLD atoms are
    * fetched with ONE pruned collect over the union of their block runs
    * (a cold k-atom query costs one Spark job for postings, not k -- the
    * reference likewise answers one query with one pass over its words'
    * block fetches, HYBCompleter.cpp:661-746). Correctness is unchanged:
    * [[IndexReader.blocksForIdRuns]] is a single OR-predicate scan (no row
    * duplication), an atom's candidate runs cover every segment of its
    * candidate term ids, and each atom keeps only its own candidate set's
    * rows. None when any atom must stay distributed (hull-sized candidate
    * set or over-budget posting volume) -- decided BEFORE any fetch, so a
    * fallback query no longer pays partial fetch jobs.
    */
  private def localAtoms(reader: IndexReader, src: IndexAtomSource,
                         wanted: Seq[Atom]): Option[java.util.HashMap[Atom, LocalAtom]] = {
    val cache = cacheFor(reader)
    val atoms = new java.util.HashMap[Atom, LocalAtom]()
    val colds = new scala.collection.mutable.ArrayBuffer[
      (Atom, Seq[(Long, Long)], Array[(Long, String, Long)])]
    src.prefetchPlainWords(wanted) // cold plain words: ONE dictionary job
    for (a <- wanted.distinct) {
      val hit = cache.get(reader.indexEpoch, a)
      if (hit != null) atoms.put(a, hit)
      else {
        val (runs, slice) = src.candidateRunsSlice(a)
        if (runs.isEmpty) atoms.put(a, EmptyAtom) // unknown word: empty, local
        else slice match {
          case None => return None // hull-sized candidate set: distributed
          case Some(cand) =>
            if (cand.iterator.map(_._3).sum > IndexReader.MaxLocalPostingsPerQuery)
              return None // head atom: stays distributed
            colds += ((a, runs, cand))
        }
      }
    }
    if (colds.nonEmpty) {
      val rows = reader.blocksForIdRuns(colds.iterator.flatMap(_._2).toSeq)
        .select(blockCols(reader).map(col): _*)
        .collect()
      for ((a, _, cand) <- colds) {
        val byId = cand.iterator.map(c => c._1 -> ((c._2, c._3))).toMap
        val segs = rows.filter(r => byId.contains(r.getLong(0)))
          .sortBy(r => (r.getLong(0), r.getLong(1)))
        atoms.put(a, cache.put(reader.indexEpoch, a, buildAtom(reader, byId, segs)))
      }
    }
    Some(atoms)
  }

  private def blockCols(reader: IndexReader): Seq[String] =
    Seq("term_id", "first_doc_id", "n_docs", "doc_deltas", "tfs",
      "dls") ++ (if (reader.hasPositions) Seq("positions") else Nil)

  /** One collect over the pruned block scan, decoded driver-side with the
    * same [[Codec]] the distributed Generator uses and scored with the
    * exact [[Analysis.bm25Col]] operand order (spec-pinned double parity).
    */
  private def fetchAtom(reader: IndexReader, runs: Seq[(Long, Long)],
                        cand: Array[(Long, String, Long)]): LocalAtom = {
    val byId = cand.iterator.map(c => c._1 -> ((c._2, c._3))).toMap
    val segs = reader.blocksForIdRuns(runs)
      .select(blockCols(reader).map(col): _*)
      .collect()
      .filter(r => byId.contains(r.getLong(0))) // exact candidate set only
      .sortBy(r => (r.getLong(0), r.getLong(1)))
    buildAtom(reader, byId, segs)
  }

  /** Decode + score collected block segments into a [[LocalAtom]]. `segs`
    * must be (term_id, first_doc_id)-sorted and contain exactly the
    * candidate set's segments.
    */
  private def buildAtom(reader: IndexReader, byId: Map[Long, (String, Long)],
                        segs: Array[org.apache.spark.sql.Row]): LocalAtom = {
    val hasPos = reader.hasPositions
    val n = segs.iterator.map(_.getInt(2)).sum
    val terms = new Array[String](n)
    val docIds = new Array[Long](n)
    val tfs = new Array[Long](n)
    val scores = new Array[Double](n)
    val score1s = new Array[Double](n)
    val positions = new Array[Array[Int]](n)
    var off = 0
    segs.foreach { r =>
      val (term, df) = byId(r.getLong(0))
      val m = r.getInt(2)
      val ds = Codec.decodeDeltas(reader.doclistCodec, r.getAs[Array[Byte]](3), m)
      val tf = Codec.decodeLongs(reader.doclistCodec, r.getAs[Array[Byte]](4), m)
      val dl = Codec.decodeLongs(reader.doclistCodec, r.getAs[Array[Byte]](5), m)
      val pos = if (hasPos)
        Codec.decodePositions(reader.doclistCodec, r.getAs[Array[Byte]](6), tf)
      else null
      val idfV = reader.idf(df)
      var i = 0
      while (i < m) {
        terms(off) = term
        docIds(off) = ds(i)
        tfs(off) = tf(i)
        val dlD = dl(i).toDouble
        val denom = Analysis.K1 * ((1.0 - Analysis.B) + Analysis.B * dlD / reader.avgdl)
        scores(off) = idfV * (tf(i).toDouble * (Analysis.K1 + 1.0)) / (tf(i) + denom)
        score1s(off) = idfV * (1.0 * (Analysis.K1 + 1.0)) / (1.0 + denom)
        positions(off) = if (hasPos) pos(i) else EmptyPos
        off += 1
        i += 1
      }
    }
    LocalAtom(terms, docIds, tfs, scores, score1s, positions)
  }

  // ---- part-chain evaluation ------------------------------------------------

  /** Accumulated doc relation: doc-sorted parallel arrays; `mpos` (null
    * when the chain carries no positions) is the most recent non-NOT
    * part's MATCHED positions per doc -- [[Eval.evalDocs]]'s State.
    */
  private final case class Rel(docIds: Array[Long], scores: Array[Double],
                               mpos: Array[Array[Int]]) {
    def hasPos: Boolean = mpos != null
  }

  private def isNot(atom: Atom): Boolean = atom match {
    case w: Word => w.not
    case _ => false
  }

  private def isFuzzy(atom: Atom): Boolean = atom match {
    case w: Word => w.fuzzy
    case _ => false
  }

  /** One part's doc relation under the score algebra -- the local twin of
    * [[Eval.evalDocs]]'s partRel: per-(doc, term) contribution under
    * sameCompletionAgg, combined across the part's terms under
    * completionsAgg, plus the best-match bonus on docs matching `bw`;
    * positions gathered per doc when a later window chains from this part.
    */
  private def partRel(la: LocalAtom, params: QueryParams, damping: Double,
                      bw: Option[String], bm: Double, withPos: Boolean): Rel = {
    val termMax = params.sameCompletionAgg == QueryParams.Max
    val complMax = params.completionsAgg == QueryParams.Max
    val idx = new java.util.HashMap[java.lang.Long, Integer](
      math.max(16, la.nRows))
    val docs = new scala.collection.mutable.ArrayBuffer[Long]
    val scores = new scala.collection.mutable.ArrayBuffer[Double]
    val bmHit = new scala.collection.mutable.ArrayBuffer[Boolean]
    val posBufs =
      if (withPos) new scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Int]]
      else null
    var i = 0
    while (i < la.nRows) {
      val d = la.docIds(i)
      val c = (if (termMax) la.score1s(i) else la.scores(i)) * damping
      var j = idx.get(d)
      if (j == null) {
        j = docs.length
        idx.put(d, j)
        docs += d
        scores += c
        bmHit += false
        if (withPos) posBufs += new scala.collection.mutable.ArrayBuffer[Int]
      } else if (complMax) {
        if (c > scores(j)) scores(j) = c
      } else scores(j) += c
      if (bw.isDefined && bw.get == la.terms(i)) bmHit(j) = true
      if (withPos) posBufs(j) ++= la.positions(i)
      i += 1
    }
    val order = docs.indices.sortBy(docs(_)).toArray
    val outD = new Array[Long](order.length)
    val outS = new Array[Double](order.length)
    val outP = if (withPos) new Array[Array[Int]](order.length) else null
    var r = 0
    while (r < order.length) {
      val j = order(r)
      outD(r) = docs(j)
      outS(r) = if (bmHit(j)) scores(j) + bm else scores(j)
      if (withPos) outP(r) = posBufs(j).toArray
      r += 1
    }
    Rel(outD, outS, outP)
  }

  /** Evaluate the part chain to raw (unrounded) doc scores; None when any
    * atom cannot be served locally. Mirrors [[Eval.evalDocs]] exactly --
    * every branch here has its distributed twin there, and LocalServeSpec
    * pins the two equal over every grammar shape.
    */
  /** Local twin of [[Eval.evalJoinBlock]]: each side's sub-query evaluates
    * under DEFAULT params (the distributed twin calls the 2-arg evalDocs),
    * its last atom's (doc, term, score) rows are restricted to the side's
    * result docs, terms present in ALL sides survive, and docs of any side
    * holding a common term sum their rows' scores. None -> some side must
    * stay distributed (whole query falls back, like every other seam).
    */
  private def evalJoinBlockLocal(reader: IndexReader, src: IndexAtomSource,
                                 ps: Seq[ParsedQuery]): Option[Rel] = {
    val sides = ps.map { pq =>
      val rel = evalDocsLocal(reader, src, pq, QueryParams.Default) match {
        case Some(r) => r
        case None => return None
      }
      val la = localAtom(reader, src, pq.parts.last.atom) match {
        case Some(l) => l
        case None => return None
      }
      val docSet = new java.util.HashSet[java.lang.Long](math.max(16, rel.docIds.length))
      rel.docIds.foreach(docSet.add(_))
      (la, docSet)
    }
    // terms common to ALL sides (the reference's hash join / our bitmask
    // agg, CompleterBase.Join.cpp) -- a side contributes a term iff one of
    // its result docs holds it
    val common = sides.map { case (la, docSet) =>
      val ts = new java.util.HashSet[String]()
      var i = 0
      while (i < la.nRows) {
        if (docSet.contains(la.docIds(i))) ts.add(la.terms(i))
        i += 1
      }
      ts
    }.reduce { (a, b) => a.retainAll(b); a }
    // docs of either side containing a common term, scores re-aggregated
    val acc = new java.util.TreeMap[Long, java.lang.Double]()
    sides.foreach { case (la, docSet) =>
      var i = 0
      while (i < la.nRows) {
        if (docSet.contains(la.docIds(i)) && common.contains(la.terms(i)))
          acc.merge(la.docIds(i), la.scores(i), (x, y) => x + y)
        i += 1
      }
    }
    val outD = new Array[Long](acc.size)
    val outS = new Array[Double](acc.size)
    var r = 0
    acc.forEach { (d, s) => outD(r) = d; outS(r) = s; r += 1 }
    Some(Rel(outD, outS, null))
  }

  private def evalDocsLocal(reader: IndexReader, src: IndexAtomSource,
                            q: ParsedQuery, params: QueryParams): Option[Rel] = {
    val parts = q.parts
    val lastIdx = parts.length - 1
    def bmFor(i: Int): Double = if (i == lastIdx) params.bestMatchBonus else 0.0
    def windowOf(sep: Sep): Option[(Int, Int)] = sep match {
      case Near => params.window.orElse(sep.window)
      case _ => sep.window
    }
    def nextWindowed(idx: Int): Boolean =
      parts.drop(idx + 1).dropWhile(p => isNot(p.atom)).headOption.exists(p =>
        !p.atom.isInstanceOf[JoinBlock] && p.sep.flatMap(windowOf).isDefined)
    // a windowed separator on a positions-off index must fail with Eval's
    // error, not silently fall back -- refuse the local path, Eval throws
    if (!reader.hasPositions &&
        parts.exists(_.sep.flatMap(windowOf).isDefined)) return None

    def damp(a: Atom): Double =
      if (isFuzzy(a) && params.fuzzyDamping < 1.0) params.fuzzyDamping else 1.0
    /** best-match word resolved with driver-memoized vocab lookups only;
      * a fuzzy best-match needs a distributed closest-word scan -> None
      * (whole query falls back). Some(None) = resolved, no best match.
      */
    def bestMatch(a: Atom, bm: Double): Option[Option[String]] =
      if (bm == 0.0) Some(None)
      else a match {
        case w: Word if w.prefix =>
          Some(Some(w.text).filter(t => reader.termInfo(Seq(t)).contains(t)))
        case w: Word if w.fuzzy => None
        case _ => Some(None)
      }
    def combineParts(s1: Double, s2: Double, bonus: Double): Double =
      params.partsAgg match {
        case QueryParams.Max => math.max(s1, s2)
        case QueryParams.SumWithBonus => s1 + s2 + bonus
        case _ => s1 + s2
      }

    // flatten join-block sub-queries so ONE batched fetch covers every
    // atom of the whole request (sub-query recursion then runs all-warm)
    def flatAtoms(pq: ParsedQuery): Seq[Atom] = pq.parts.flatMap(_.atom match {
      case JoinBlock(ps) => ps.flatMap(flatAtoms)
      case a => Seq(a)
    })
    val atoms = localAtoms(reader, src, flatAtoms(q)) match {
      case Some(m) => m
      case None => return None
    }
    var totalRows = 0L
    atoms.values.forEach(la => totalRows += la.nRows)
    if (totalRows > IndexReader.MaxLocalPostingsPerQuery) return None

    val first = parts.head
    require(!isNot(first.atom), "query cannot start with a NOT part")
    def part(i: Int, withPos: Boolean): Option[Rel] = parts(i).atom match {
      // best-match bonus is ignored for a join block, like the distributed
      // partRel; its result carries no positions
      case JoinBlock(ps) => evalJoinBlockLocal(reader, src, ps)
      case a =>
        bestMatch(a, bmFor(i)).map(bw =>
          partRel(atoms.get(a), params, damp(a), bw, bmFor(i), withPos))
    }
    var state = part(0, nextWindowed(0)) match {
      case Some(r) => r
      case None => return None
    }

    var idx = 1
    while (idx < parts.length) {
      val p = parts(idx)
      // a window needs positions on BOTH sides; a join block has none, so
      // a separator adjacent to one degrades to plain same-doc AND (the
      // distributed loop's `positionless` rule)
      val positionless = !state.hasPos || p.atom.isInstanceOf[JoinBlock]
      val window = if (positionless) None else p.sep.flatMap(windowOf)
      if (isNot(p.atom)) {
        // NOT: anti-join; positions (if any) ride through
        val neg = atoms.get(p.atom)
        val negSet = new java.util.HashSet[java.lang.Long](math.max(16, neg.nRows))
        var i = 0
        while (i < neg.nRows) { negSet.add(neg.docIds(i)); i += 1 }
        val keep = state.docIds.indices.filter(i => !negSet.contains(state.docIds(i)))
        state = Rel(keep.map(state.docIds).toArray, keep.map(state.scores).toArray,
          if (state.hasPos) keep.map(state.mpos).toArray else null)
      } else if (window.isEmpty) {
        // plain AND: doc equi-join, scores combined under partsAgg
        val cur = part(idx, nextWindowed(idx)) match {
          case Some(r) => r
          case None => return None
        }
        val (d, s, m) = mergeAnd(state, cur, combineParts(_, _, 0.0))
        state = Rel(d, s, m)
      } else {
        // windowed AND: current part's positions within [lo, hi] of a
        // previously matched position; the next window chains only from
        // positions that matched
        val (lo, hi) = window.get
        val cur = part(idx, withPos = true) match {
          case Some(r) => r
          case None => return None
        }
        val bonus =
          if (params.partsAgg == QueryParams.SumWithBonus)
            Executor.bonusFor(p.sep.get)
          else 0.0
        state = mergeWindow(state, cur, lo, hi, combineParts(_, _, bonus))
      }
      idx += 1
    }
    Some(state)
  }

  /** Sorted-array doc equi-join; keeps the RIGHT side's positions when
    * present (the AND branch's `cur.hasPos`).
    */
  private def mergeAnd(a: Rel, b: Rel, combine: (Double, Double) => Double):
      (Array[Long], Array[Double], Array[Array[Int]]) = {
    val d = new scala.collection.mutable.ArrayBuffer[Long]
    val s = new scala.collection.mutable.ArrayBuffer[Double]
    val m = if (b.hasPos) new scala.collection.mutable.ArrayBuffer[Array[Int]] else null
    var i = 0
    var j = 0
    while (i < a.docIds.length && j < b.docIds.length) {
      val cmp = java.lang.Long.compare(a.docIds(i), b.docIds(j))
      if (cmp < 0) i += 1
      else if (cmp > 0) j += 1
      else {
        d += a.docIds(i)
        s += combine(a.scores(i), b.scores(j))
        if (m != null) m += b.mpos(j)
        i += 1
        j += 1
      }
    }
    (d.toArray, s.toArray, if (m == null) null else m.toArray)
  }

  /** Windowed doc join: keep b's positions p2 with some previously matched
    * p1 satisfying lo <= p2 - p1 <= hi (i.e. p1 in [p2-hi, p2-lo], found by
    * binary search over a sorted copy of a's matched positions); docs with
    * no surviving position drop out -- [[Eval.evalDocs]]'s windowed branch.
    */
  private def mergeWindow(a: Rel, b: Rel, lo: Int, hi: Int,
                          combine: (Double, Double) => Double): Rel = {
    val d = new scala.collection.mutable.ArrayBuffer[Long]
    val s = new scala.collection.mutable.ArrayBuffer[Double]
    val m = new scala.collection.mutable.ArrayBuffer[Array[Int]]
    var i = 0
    var j = 0
    while (i < a.docIds.length && j < b.docIds.length) {
      val cmp = java.lang.Long.compare(a.docIds(i), b.docIds(j))
      if (cmp < 0) i += 1
      else if (cmp > 0) j += 1
      else {
        val prev = a.mpos(i).clone()
        java.util.Arrays.sort(prev)
        val kept = b.mpos(j).filter { p2 =>
          // first prev position >= p2 - hi; matched iff it is <= p2 - lo
          var lo2 = 0
          var hi2 = prev.length
          while (lo2 < hi2) {
            val mid = (lo2 + hi2) >>> 1
            if (prev(mid) < p2 - hi) lo2 = mid + 1 else hi2 = mid
          }
          lo2 < prev.length && prev(lo2) <= p2 - lo
        }
        if (kept.nonEmpty) {
          d += a.docIds(i)
          s += combine(a.scores(i), b.scores(j))
          m += kept
        }
        i += 1
        j += 1
      }
    }
    Rel(d.toArray, s.toArray, m.toArray)
  }

  // ---- whole-result history ---------------------------------------------------
  //
  // The reference History caches whole QueryResults keyed by the query
  // string, re-used only when the request parameters are compatible
  // (History.h:25-110; CompleterBase.cpp:1125-1139). The local twin: a
  // per-reader LRU of (epoch, kind, query, k, params) -> the final page
  // rows. Pages are k-sized, so the entry cap bounds memory at a few MB;
  // a warm repeated query costs a map lookup + LocalRelation build.

  private final class ResultCache {
    private val lru = new java.util.LinkedHashMap[
      (Long, String, String, Int, QueryParams), AnyRef](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Long, String, String, Int, QueryParams), AnyRef]): Boolean =
        size > LocalServe.ResultCacheMaxEntries
    }
    def get(k: (Long, String, String, Int, QueryParams)): AnyRef =
      synchronized(lru.get(k))
    def put(k: (Long, String, String, Int, QueryParams), v: AnyRef): Unit =
      synchronized { lru.put(k, v); () }
    def count: Int = synchronized(lru.size)
  }

  /** Result-history entry cap (pages are k-sized rows, so this bounds the
    * cache at a few MB -- the reference's History byte budget role).
    */
  val ResultCacheMaxEntries: Int = 4096

  /** A/B kill switch (SPARK_GRAFT_NO_RESULT_HISTORY=1): disable the
    * whole-result page cache so latency probes can separate history-hit
    * cost from the local compute path.
    */
  private lazy val resultHistoryEnabled: Boolean =
    !sys.env.get("SPARK_GRAFT_NO_RESULT_HISTORY").contains("1")

  private val resultCaches = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[IndexReader, ResultCache]())
  private def resultCacheFor(reader: IndexReader): ResultCache =
    resultCaches.computeIfAbsent(reader, _ => new ResultCache)

  /** spec hook */
  private[graft] def cachedResultCount(reader: IndexReader): Int =
    resultCacheFor(reader).count

  // ---- top-k / completions facades -------------------------------------------

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The local twin of [[Eval.hits]]: 4dp rounding applied BEFORE the
    * ordering (the distributed contract: evalDocs rounds, hits sorts), page
    * [firstHit, firstHit + k) of the total order. Only a candidate window
    * is rounded: rounding is monotone and moves a value <= 5e-5, so only
    * docs within 1e-4 of the boundary's raw score can cross it -- the same
    * argument [[IndexReader.serveTopKOr]]'s spec pins.
    */
  def hits(reader: IndexReader, query: String, k: Int,
           params: QueryParams): Option[DataFrame] = {
    if (!IndexReader.localServeEnabled) return None
    val spark = reader.spark
    import spark.implicits._
    val histKey = (reader.indexEpoch, "h", query, k, params)
    val cached = if (resultHistoryEnabled) resultCacheFor(reader).get(histKey) else null
    if (cached != null) return Some(cached.asInstanceOf[DataFrame])
    val parsed = QueryParser.parse(query, params.normalizeWords)
    val src = new IndexAtomSource(reader)
    evalDocsLocal(reader, src, parsed, params).map { rel =>
      val n = params.firstHit + k
      val page: Seq[(Long, Double)] = params.rankDocs match {
        case "doc" =>
          val asc = params.sortDocsAsc.getOrElse(true)
          val ids = if (asc) rel.docIds.indices else rel.docIds.indices.reverse
          ids.slice(params.firstHit, n)
            .map(i => (rel.docIds(i), round4(rel.scores(i))))
        case _ if n == 0 => Seq.empty // k = 0: an empty page of the order
        case _ =>
          val asc = params.sortDocsAsc.getOrElse(false)
          val cand: Array[Int] =
            if (n >= rel.docIds.length) rel.docIds.indices.toArray
            else {
              // raw boundary via a size-n heap, then the 1e-4 safety margin
              val heap = new java.util.PriorityQueue[java.lang.Double](n,
                if (asc) java.util.Comparator.reverseOrder[java.lang.Double]()
                else java.util.Comparator.naturalOrder[java.lang.Double]())
              rel.scores.foreach { v =>
                if (heap.size < n) heap.add(v)
                else if (if (asc) v < heap.peek() else v > heap.peek()) {
                  heap.poll(); heap.add(v)
                }
              }
              val cut = heap.peek()
              rel.scores.indices.filter(i =>
                if (asc) rel.scores(i) <= cut + 1e-4
                else rel.scores(i) >= cut - 1e-4).toArray
            }
          val rounded = cand.map(i => (rel.docIds(i), round4(rel.scores(i))))
          val sorted =
            if (asc) rounded.sortBy { case (doc, sc) => (sc, doc) }
            else rounded.sortBy { case (doc, sc) => (-sc, doc) }
          sorted.slice(params.firstHit, n).toSeq
      }
      // cache the DataFrame itself: its QueryExecution memoizes, so a
      // history hit re-collects the planned LocalRelation (sub-ms) instead
      // of re-running analysis + planning (~10 ms) on fresh page rows
      val df = page.toDF("doc_id", "score")
      resultCacheFor(reader).put(histKey, df)
      df
    }
  }

  /** The local twin of [[Eval.completions]]: the last part's terms within
    * the matching docs, scored under the word-side knobs, ranked by `rw=`.
    */
  def completions(reader: IndexReader, query: String, k: Int,
                  params: QueryParams): Option[DataFrame] = {
    if (!IndexReader.localServeEnabled) return None
    val spark = reader.spark
    import spark.implicits._
    val histKey = (reader.indexEpoch, "c", query, k, params)
    val cached = if (resultHistoryEnabled) resultCacheFor(reader).get(histKey) else null
    if (cached != null) return Some(cached.asInstanceOf[DataFrame])
    val parsed = QueryParser.parse(query, params.normalizeWords)
    // completions over a trailing join block are not part of the grammar
    // (the distributed path rejects the block atom); fall back so the
    // behavior stays the distributed path's, not a silent variant
    if (parsed.parts.last.atom.isInstanceOf[JoinBlock]) return None
    val src = new IndexAtomSource(reader)
    for {
      rel <- evalDocsLocal(reader, src, parsed, params)
      la <- localAtom(reader, src, parsed.parts.last.atom)
    } yield {
      val docSet = new java.util.HashSet[java.lang.Long](math.max(16, rel.docIds.length))
      rel.docIds.foreach(docSet.add(_))
      val damping = damp0(parsed.parts.last.atom, params)
      val perDocMax = params.wordSameDocAgg == QueryParams.Max
      val acrossMax = params.wordDiffDocsAgg == QueryParams.Max
      // per-term accumulators, keyed by shared term reference
      val accS = new java.util.LinkedHashMap[String, java.lang.Double]()
      val accDc = new java.util.HashMap[String, java.lang.Long]()
      val accOc = new java.util.HashMap[String, java.lang.Long]()
      var i = 0
      while (i < la.nRows) {
        if (docSet.contains(la.docIds(i))) {
          val t = la.terms(i)
          val c = (if (perDocMax) la.score1s(i) else la.scores(i)) * damping
          val prev = accS.get(t)
          if (prev == null) accS.put(t, c)
          else accS.put(t, if (acrossMax) math.max(prev, c) else prev + c)
          accDc.merge(t, 1L, (a, b) => a + b)
          accOc.merge(t, la.tfs(i), (a, b) => a + b)
        }
        i += 1
      }
      val rows = new scala.collection.mutable.ArrayBuffer[(String, Double, Long, Long)]
      accS.forEach((t, s) => rows += ((t, round4(s), accDc.get(t), accOc.get(t))))
      val ordered = params.rankWords match {
        case "dc" =>
          if (params.sortWordsAsc.getOrElse(false)) rows.sortBy(r => (r._3, r._1))
          else rows.sortBy(r => (-r._3, r._1))
        case "oc" =>
          if (params.sortWordsAsc.getOrElse(false)) rows.sortBy(r => (r._4, r._1))
          else rows.sortBy(r => (-r._4, r._1))
        case "word" =>
          if (params.sortWordsAsc.getOrElse(true)) rows.sortBy(_._1)
          else rows.sortBy(_._1)(Ordering[String].reverse)
        case _ =>
          if (params.sortWordsAsc.getOrElse(false)) rows.sortBy(r => (r._2, r._1))
          else rows.sortBy(r => (-r._2, r._1))
      }
      val page = ordered.take(k).toSeq
      val df = page.toDF("term", "score", "dc", "oc")
      resultCacheFor(reader).put(histKey, df)
      df
    }
  }

  private def damp0(a: Atom, params: QueryParams): Double =
    if (isFuzzy(a) && params.fuzzyDamping < 1.0) params.fuzzyDamping else 1.0

  // ---- driver-resident docs store (excerpt/url serving) ----------------------
  //
  // The reference serves excerpt text from a memory-mapped docs.DB record
  // fetch per hit (ExcerptsGenerator.cpp; docs.DB built offline). The
  // distributed twin is a semi-join over the docs parquet per request --
  // correct at any scale but 1-2 jobs per query. When the HITS side is
  // already a LocalRelation (the grammar path above), hit texts come from
  // a per-reader byte-budgeted LRU instead (one pruned scan per cold doc
  // set), and excerpt generation runs the exact Excerpts.generateAll
  // algorithm in-process: a warm full search -- hits, completions,
  // excerpts, urls -- runs ZERO Spark jobs. Interactive typing chains
  // (`a`, `aa`, `aal`) re-rank the same top docs, so the LRU hit rate is
  // the autocompletion hit rate.

  private final class DocsCache {
    private val lru = new java.util.LinkedHashMap[Long, (String, String)](16, 0.75f, true)
    private var chars = 0L
    def count: Int = synchronized(lru.size)
    def get(id: Long): (String, String) = synchronized(lru.get(id))
    def put(id: Long, v: (String, String)): Unit = synchronized {
      if (lru.get(id) == null) {
        lru.put(id, v)
        chars += v._1.length + v._2.length
        val it = lru.entrySet().iterator()
        while (chars > LocalServe.DocsCacheBudgetChars && lru.size > 1 && it.hasNext) {
          val e = it.next()
          if (e.getKey != id) {
            chars -= e.getValue._1.length + e.getValue._2.length
            it.remove()
          }
        }
      }
    }
  }

  /** Docs-LRU byte budget (chars; ~2 bytes each -> ~64 MB). */
  val DocsCacheBudgetChars: Long = 32L * 1024 * 1024

  private val docsCaches = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[IndexReader, DocsCache]())
  private def docsCacheFor(reader: IndexReader): DocsCache =
    docsCaches.computeIfAbsent(reader, _ => new DocsCache)

  /** spec hook */
  private[graft] def cachedDocCount(reader: IndexReader): Int =
    docsCacheFor(reader).count

  /** (url, text) for each hit id present in the docs store, misses fetched
    * in ONE pruned scan (doc_id IN-list reaches the parquet row-group
    * stats); warm ids run zero jobs.
    */
  private def docTexts(reader: IndexReader,
                       ids: Seq[Long]): Map[Long, (String, String)] = {
    val cache = docsCacheFor(reader)
    val out = scala.collection.mutable.Map.empty[Long, (String, String)]
    val misses = scala.collection.mutable.ArrayBuffer.empty[Long]
    ids.distinct.foreach { id =>
      val hit = cache.get(id)
      if (hit != null) out(id) = hit else misses += id
    }
    if (misses.nonEmpty) {
      reader.docs.filter(col("doc_id").isin(misses.toSeq: _*))
        .select(col("doc_id"), col("url"), col("text"))
        .collect()
        .foreach { r =>
          val v = (r.getString(1), r.getString(2))
          cache.put(r.getLong(0), v)
          out(r.getLong(0)) = v
        }
    }
    out.toMap
  }

  /** True iff the relation is already driver-resident -- collecting it
    * runs no jobs, so the local docs path adds none.
    */
  private def isLocalRelation(df: DataFrame): Boolean =
    df.queryExecution.analyzed.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])

  /** The exact [[Excerpts.generateAll]] algorithm in-process, using the
    * same lowercase code path Catalyst's `lower` uses (UTF8String), the
    * same separator regex and window arithmetic -- spec-pinned identical.
    */
  private[graft] def generateAllLocal(text: String, exact: Seq[String],
                                      prefixes: Seq[String], er: Int,
                                      en: Int): String = {
    val lowered = org.apache.spark.unsafe.types.UTF8String
      .fromString(text).toLowerCase.toString
    val toks = lowered.split(Excerpts.SepRegexStr, -1).filter(_.nonEmpty)
    def matches(t: String): Boolean =
      t.split("\\^", -1).exists(p =>
        exact.exists(_ == p) || prefixes.exists(p.startsWith))
    val matchIdx = toks.indices.filter(i => matches(toks(i)))
    val windows = matchIdx.take(en).map { m =>
      val start = math.max(m - er, 0)
      toks.slice(start, math.min(m + er + 1, toks.length))
        .map(t => if (matches(t)) s"<hl>$t</hl>" else t)
        .mkString(" ")
    }
    windows.mkString(" ... ")
  }

  /** Driver-resident excerpts for an already-local hits relation: Some of
    * a (doc_id, excerpt) LocalRelation when both the hits and the doc
    * texts are served locally; None -> caller keeps the distributed
    * semi-join ([[Excerpts.generateAll]]).
    */
  def excerptsAll(reader: IndexReader, hits: DataFrame, exact: Seq[String],
                  prefixes: Seq[String], er: Int, en: Int): Option[DataFrame] = {
    if (!IndexReader.localServeEnabled || !reader.hasDocsStore ||
        !isLocalRelation(hits)) return None
    val spark = reader.spark
    import spark.implicits._
    val ids = hits.collect().map(_.getLong(0)).toSeq
    val texts = docTexts(reader, ids)
    Some(ids.flatMap(id => texts.get(id).map(t =>
      (id, generateAllLocal(t._2, exact, prefixes, er, en))))
      .toDF("doc_id", "excerpt"))
  }

  /** Driver-resident hit urls (the [[graft.api.Search]] urlsOf twin). */
  def urls(reader: IndexReader, hits: DataFrame): Option[Map[Long, String]] = {
    if (!IndexReader.localServeEnabled || !reader.hasDocsStore ||
        !isLocalRelation(hits)) return None
    val ids = hits.collect().map(_.getLong(0)).toSeq
    Some(docTexts(reader, ids).map { case (id, (url, _)) => id -> url })
  }
}
