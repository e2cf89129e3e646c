package graft.index

import graft.core.Analysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query-side access to a built index directory.
  *
  * Pruning mirrors the reference's block locate (HYBCompleter.cpp:661-746,
  * binary search on boundary word ids): a term-range predicate
  * `term_id BETWEEN lo AND hi` plus `bucket BETWEEN lo/B AND hi/B` hits
  * parquet partition-dir pruning and row-group min/max skipping -- only
  * the blocks overlapping the range are read.
  *
  * WAND: batch-shaped block-max pruning. Blocks carry
  * block_max_tfpart; contribution bound of block b of term t is
  * ub(b) = idf(t) * block_max_tfpart(b). With theta = a lower bound on the
  * final k-th score, a block can be skipped iff
  * ub(b) + sum over other query terms t' of (max ub of t'-blocks
  * OVERLAPPING b's docId range) < theta: any doc with its t-postings in b
  * has total score below theta, so dropping the block can neither remove a
  * true top-k doc nor promote a false one (partial scores only shrink).
  * The overlap restriction is what cursor-based BM-WAND gets from aligning
  * cursors on docId; here it is a docId-grid join over block metadata,
  * fully distributed. theta comes from exactly scoring the densest block
  * per term (phase 1).
  */
class IndexReader(val spark: SparkSession, val dir: String,
                  cacheBlocks: Boolean = true,
                  /** below this block count, two-phase WAND costs more
                    * driver round trips than it saves */
                  wandMinBlocks: Int = 64) extends Serializable {
  import spark.implicits._

  /** docId-grid resolution for the WAND overlap bound: each query term
    * contributes at most this many (cell, ub) rows, independent of its
    * block count.
    */
  val WandGridCells = 1024L

  /** ONE shard-visibility snapshot per reader: the epoch and the blocks
    * relation BOTH derive from it, so a reader can never carry a
    * pre-append epoch while serving post-append postings (two independent
    * FS snapshots could interleave with a landing shard).
    */
  private lazy val censusSnapshot = IndexReader.shardCensus(spark, dir)

  /** Identity of the built index this reader was opened against: the
    * dictionary commit's mtime COMBINED with the VISIBLE shard layout from
    * [[censusSnapshot]]. Memoization keyed by (dir, epoch) cannot serve
    * stale values after a rebuild into the same directory (mtime changes),
    * and -- because streaming delta shards and compactions change the
    * visible postings WITHOUT touching the dictionary commit -- a
    * process-wide cache shared across readers cannot serve pre-append
    * postings to a new reader that sees the appended shard. Visibility
    * (not raw dir contents) is the right identity: crash debris and
    * re-delivered merged shards leave results unchanged and keep the
    * epoch, so warm entries survive them. Names are sorted: two readers
    * over an unchanged layout MUST agree on the epoch or every
    * shared-cache lookup misses. The dictionary mtime reads through the
    * Hadoop FileSystem API -- java.io.File answers 0 for hdfs://s3a://
    * paths, which would freeze the epoch across rebuilds on exactly the
    * production stores. On filesystem errors the epoch degrades to a
    * process-unique NEGATIVE value: a reader we cannot fingerprint never
    * shares cache entries (stale sharing is the failure that matters;
    * recomputing is just slow).
    */
  lazy val indexEpoch: Long =
    try {
      val p = new org.apache.hadoop.fs.Path(s"$dir/dictionary/_SUCCESS")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      var h = if (fs.exists(p)) fs.getFileStatus(p).getModificationTime else 0L
      censusSnapshot.visible.sorted.foreach(n => h = 31 * h + n.hashCode)
      31 * h + censusSnapshot.nextCompactId
    } catch { case scala.util.control.NonFatal(_) =>
      IndexReader.epochFallback.decrementAndGet()
    }

  // Rebuild-in-place detection (eager, at construction): a rebuild
  // reproduces the SAME shard names, so this reader's recomputed plans
  // canonicalize equal to the pre-rebuild reader's Spark-cached relations
  // (root-path identity; measured -- a fresh same-path read resolves to a
  // prior instance's persisted relation) even though the epoch differs.
  // A rebuild written through THIS session is already covered by Spark's
  // write-side recacheByPath; this guard covers the production case the
  // write side cannot see -- a rebuild by a DIFFERENT process (build job
  // fleet) under a long-lived serving JVM. The first reader that observes
  // a NEW epoch for a dir invalidates everything cached under it;
  // same-epoch readers (the common serving case) keep sharing warm caches.
  locally {
    val prev = IndexReader.lastEpoch.put(dir, java.lang.Long.valueOf(indexEpoch))
    if (prev != null && prev.longValue() != indexEpoch)
      try spark.catalog.refreshByPath(dir)
      catch { case scala.util.control.NonFatal(_) => () }
  }

  lazy val dictionary: DataFrame = spark.read.parquet(s"$dir/dictionary").cache()
  /** Docs store (buildDocsDB analog) -- present when the build ran
    * [[IndexBuilder.buildDocsStore]]; serves excerpt text.
    */
  lazy val docs: DataFrame = spark.read.parquet(s"$dir/docs")

  /** Whether the docs store (buildDocsDB analog) was built next to this
    * index -- excerpt serving degrades gracefully without it. Only a
    * POSITIVE answer is memoized: a transient filesystem error (remote
    * store timeout) must not permanently disable excerpts for a
    * long-lived serving session.
    */
  @volatile private var docsStoreSeen = false
  def hasDocsStore: Boolean = docsStoreSeen || {
    val present =
      try {
        val p = new org.apache.hadoop.fs.Path(s"$dir/docs")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
      } catch { case _: Throwable => false }
    if (present) docsStoreSeen = true
    present
  }
  private lazy val statsRow = spark.read.parquet(s"$dir/stats").head()
  lazy val nDocs: Long = statsRow.getAs[Long]("n_docs")
  lazy val avgdl: Double = statsRow.getAs[Double]("avgdl")
  /** bucket width the index was built with (persisted in stats). */
  lazy val bucketSize: Long =
    if (statsRow.schema.fieldNames.contains("bucket_size"))
      statsRow.getAs[Long]("bucket_size")
    else IndexBuilder.DefaultBucketSize.toLong
  /** Compression codec the index was built with (persisted in stats;
    * pre-codec-family indexes are varint).
    */
  lazy val doclistCodec: Int = Codec.idOf(
    if (statsRow.schema.fieldNames.contains("doclist_codec"))
      statsRow.getAs[String]("doclist_codec")
    else "varint")

  /** false = positions-off index (IndexBuilder storePositions=false):
    * doc-level queries are untouched; windowed/phrase queries refuse.
    */
  lazy val hasPositions: Boolean =
    !statsRow.schema.fieldNames.contains("store_positions") ||
      statsRow.getAs[Boolean]("store_positions")

  /** BY_PREFIXES boundary cut ids, when the index was built with
    * prefix-boundary block formation (HYBIndex.cpp:247-264 analog): sorted
    * first-term-ids of each boundary group, loaded once (tiny).
    */
  lazy val prefixCuts: Option[Array[Long]] = {
    val present =
      try {
        val p = new org.apache.hadoop.fs.Path(s"$dir/boundaries/_SUCCESS")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
      } catch { case _: Throwable => false }
    if (!present) None
    else Some(spark.read.parquet(s"$dir/boundaries")
      .select(col("cut_id")).as[Long].collect().sorted)
  }

  /** Bucket of a term id under the index's block-formation mode; MONOTONE
    * in term_id in both modes, so contiguous id ranges map to contiguous
    * bucket ranges and every BETWEEN-based pruning predicate stays valid.
    */
  def bucketOf(id: Long): Long = prefixCuts match {
    case Some(cuts) => IndexBuilder.upperBound(cuts, id).toLong
    case None => id / bucketSize
  }

  private def emptyHits: DataFrame =
    spark.range(0).select(col("id").as("doc_id"), lit(0.0).as("score"))
  /** Block segments. Cached by default for a query-serving session (the
    * in-memory relation still skips batches via min/max stats); pass
    * cacheBlocks=false for one-shot scans. Caching auto-disables above
    * [[IndexReader.CacheBlocksMaxBytes]] (override with spark conf
    * `graft.index.cacheBlocksMaxBytes`) -- a 100-TB index must never be
    * pulled through the block cache by a naive caller.
    */
  lazy val blocks: DataFrame = {
    // compaction visibility (frozen at first scan, like the shard list
    // itself): hide shards merged by a committed compaction whose dirs
    // the GC has not removed yet, and half-written `compact-*` shards
    // whose commit never landed. The common case -- nothing hidden --
    // reads the dir whole; otherwise only the visible shard dirs are
    // listed (a torn file in a crashed shard must not even be footered).
    val census = censusSnapshot // the SAME snapshot the epoch hashed
    // ALWAYS read via the explicit visible shard paths, never the dir
    // root: Spark's cache manager substitutes semantically-equal plans,
    // and a parquet relation canonicalizes by its ROOT PATHS (InMemoryFileIndex
    // equality), not the discovered files -- a root-path read would let a
    // post-append reader's recomputed atom plan silently resolve to a
    // PRE-append persisted relation. Explicit shard paths make the plan
    // identity follow the visible layout: same layout shares cache
    // entries, a changed layout cannot. Root-path fallback only for a
    // NON-SHARDED layout (present empty) -- an all-hidden dir must not
    // have its merged/torn shards read whole.
    val b =
      if (census.present.isEmpty) spark.read.parquet(s"$dir/blocks")
      else if (census.visible.isEmpty)
        // every present shard is hidden (merged by a committed compaction
        // whose output dir is gone, or uncommitted crash debris): the
        // postings are unreachable -- fail loudly rather than read merged
        // or torn shards whole
        throw new IllegalStateException(
          s"$dir/blocks has shards but none are visible (lost compaction output?)")
      else spark.read.option("basePath", s"$dir/blocks")
        .parquet(census.visible.map(s => s"$dir/blocks/shard=$s"): _*)
    val maxBytes = spark.conf.getOption("graft.index.cacheBlocksMaxBytes")
      .map(_.toLong).getOrElse(IndexReader.CacheBlocksMaxBytes)
    // size through the Hadoop FileSystem API, so hdfs:// and s3a:// indexes
    // (the production case the guard exists for) are measured like local
    // dirs; an unmeasurable size counts as TOO BIG -- never cache blind.
    // Memoized by (dir, epoch): getContentSummary is a full recursive
    // listing, and on an object store a serving fleet's reader churn must
    // not pay it per construction (the epoch already fingerprints the
    // layout, so a changed dir cannot reuse a stale size).
    if (IndexReader.dirBytesMemo.size() > 1024) IndexReader.dirBytesMemo.clear()
    def dirBytes: Long =
      IndexReader.dirBytesMemo.computeIfAbsent((dir, indexEpoch), _ =>
        try {
          val p = new org.apache.hadoop.fs.Path(s"$dir/blocks")
          java.lang.Long.valueOf(p.getFileSystem(
            spark.sparkContext.hadoopConfiguration).getContentSummary(p).getLength)
        } catch { case _: Throwable => java.lang.Long.valueOf(Long.MaxValue) })
        .longValue()
    if (cacheBlocks && dirBytes <= maxBytes) b.cache() else b
  }

  def idf(df: Long): Double = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)

  /** Driver-side vocabulary memo (the reference holds its whole vocabulary
    * in RAM, Vocabulary.h): term -> (term_id, df) and prefix -> id range
    * resolve through a bounded in-JVM map, so a WARM serving session pays
    * ZERO dictionary jobs per query. Safe because a reader's dictionary is
    * immutable: streaming delta shards reuse the batch dictionary (unseen
    * terms are dropped and counted as drift), and rebuilds into the same
    * dir are a new reader (indexEpoch). Negative answers memoize too --
    * repeated misses (typos, drift terms) are the common case in serving.
    * On overflow the maps reset wholesale; bound is entries, not bytes
    * (keys are query-sized strings).
    */
  private val VocabMemoMax = 1 << 20
  private val termInfoMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Option[(Long, Long)]]()
  private val prefixRangeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Option[(Long, Long)]]()
  private val blockCountMemo =
    new java.util.concurrent.ConcurrentHashMap[Seq[Long], java.lang.Long]()
  private val vocabSliceMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Array[(Long, String, Long)]]]()

  /** term -> (term_id, df); driver-side lookup of a handful of terms.
    * Memoized per reader; only uncached terms touch the dictionary.
    */
  def termInfo(terms: Seq[String]): Map[String, (Long, Long)] = {
    val hits = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val misses = scala.collection.mutable.ArrayBuffer.empty[String]
    terms.distinct.foreach { t =>
      termInfoMemo.get(t) match {
        case null => misses += t
        case cached => cached.foreach(v => hits(t) = v)
      }
    }
    if (misses.nonEmpty) {
      if (termInfoMemo.size() > VocabMemoMax) termInfoMemo.clear()
      val found = dictionary.filter(col("term").isin(misses.toSeq: _*))
        .select(col("term"), col("term_id"), col("df"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      misses.foreach { t =>
        termInfoMemo.put(t, found.get(t))
        found.get(t).foreach(v => hits(t) = v)
      }
    }
    hits.toMap
  }

  /** prefix -> contiguous term_id range [lo, hi] (prefixToRange analog,
    * CompleterBase.cpp:2505-2636; dense lexicographic ids make any prefix
    * a contiguous id range). Memoized per reader.
    */
  def prefixRange(prefix: String): Option[(Long, Long)] = {
    val cached = prefixRangeMemo.get(prefix)
    if (cached != null) return cached
    if (prefixRangeMemo.size() > VocabMemoMax) prefixRangeMemo.clear()
    val r = dictionary.filter(col("term").startsWith(prefix))
      .agg(min(col("term_id")), max(col("term_id"))).head()
    val res = if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
    prefixRangeMemo.put(prefix, res)
    res
  }

  /** Driver-held (term_id, term, df) slice of a prefix's id range,
    * memoized when the range is small enough: the reference holds its
    * WHOLE vocabulary in RAM (Vocabulary.h); we hold the warm prefixes'
    * slices, so a warm prefix query attaches term/df through a local
    * relation -- no dictionary-scan broadcast-build job per query. Ranges
    * beyond [[IndexReader.MaxSliceTerms]] return None (the caller keeps
    * the broadcast join; a hot `a*` on a 100M-term vocabulary must not be
    * pulled onto the driver). The first call pays the same one collect job
    * the broadcast build used to pay; every later call pays zero.
    */
  private def vocabSlice(prefix: String, lo: Long, hi: Long): Option[DataFrame] =
    vocabSliceRows(prefix, lo, hi).map(rows => rows.toSeq.toDF("term_id", "term", "df"))

  /** The raw memoized slice rows behind [[vocabSlice]] -- also the per-term
    * df source for the driver-resident prefix serving path.
    */
  private def vocabSliceRows(prefix: String, lo: Long,
                             hi: Long): Option[Array[(Long, String, Long)]] = {
    if (hi - lo + 1 > IndexReader.MaxSliceTerms) return None
    if (vocabSliceMemo.size() > IndexReader.MaxSlicePrefixes) vocabSliceMemo.clear()
    vocabSliceMemo.computeIfAbsent(prefix, _ =>
      Some(dictionary.filter(col("term_id").between(lo, hi))
        .select(col("term_id"), col("term"), col("df"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))))
  }

  /** Pruned block scan for a term-id range. */
  def blocksForRange(lo: Long, hi: Long): DataFrame =
    blocks.filter(col("bucket").between(bucketOf(lo), bucketOf(hi)) &&
      col("term_id").between(lo, hi))

  /** Pruned block scan for an explicit term-id set. */
  def blocksForIds(ids: Seq[Long]): DataFrame =
    blocks.filter(col("term_id").isin(ids: _*) &&
      col("bucket").isin(ids.map(bucketOf).distinct: _*))

  /** Pruned block scan for a set of contiguous term-id runs (the block
    * locate analog for SCATTERED candidate sets -- synonym groups, fuzzy
    * candidates, OR alternatives): the reference fetches blocks per word
    * range / per term (HYBCompleter.cpp:661-746, INVCompleter.h:94-130),
    * never the [min, max] hull of the whole set. Bucket predicates + the
    * per-run BETWEEN disjunction reach the parquet scan (partition-dir
    * pruning + row-group min/max skipping). Plan size stays bounded at any
    * span: a run covering many buckets (the hull fallback for huge
    * candidate sets, or a--z on a 100M-term vocabulary) uses BETWEEN
    * instead of enumerating bucket literals, and the disjunctions are
    * BALANCED Or-trees (depth log2(n), no deep-recursion risk in Catalyst).
    */
  def blocksForIdRuns(runs: Seq[(Long, Long)]): DataFrame = {
    require(runs.nonEmpty, "empty run set")
    def orTree(ps: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
      if (ps.length == 1) ps.head
      else { val (a, b) = ps.splitAt(ps.length / 2); orTree(a) || orTree(b) }
    val bucketPreds = runs.map { case (lo, hi) =>
      val (bLo, bHi) = (bucketOf(lo), bucketOf(hi))
      if (bHi - bLo < IndexReader.MaxBucketLiterals)
        col("bucket").isin((bLo to bHi): _*)
      else col("bucket").between(bLo, bHi)
    }
    val idPreds = runs.map { case (lo, hi) => col("term_id").between(lo, hi) }
    blocks.filter(orTree(bucketPreds) && orTree(idPreds))
  }

  /** Decode blocks to (term_id, doc_id, tf, dl) via the custom Catalyst
    * Generator (GenerateExec, no object-encoder boundary).
    */
  def decode(blockDf: DataFrame): DataFrame =
    blockDf.select(col("term_id"),
      PostingsDecode.postingsDecode(col("n_docs"), col("doc_deltas"),
        col("tfs"), col("dls"), doclistCodec))

  /** Decode including per-doc positions: (term_id, doc_id, tf, dl, positions). */
  def decodeWithPositions(blockDf: DataFrame): DataFrame =
    blockDf.select(col("term_id"),
      PostingsDecode.postingsDecodeWithPositions(col("n_docs"), col("doc_deltas"),
        col("tfs"), col("dls"), col("positions"), doclistCodec))

  /** BM25 score column over decoded postings with per-term df attached.
    * The df table is query-sized (one row per query term), so it inlines
    * as a literal-map lookup -- a codegen'd expression, no broadcast-build
    * job per query (a warm serving session pays exactly ONE job: the
    * pruned decode scan). Guarded: candidate sets beyond literal-plan size
    * fall back to the broadcast join.
    */
  private def scoreDecoded(decoded: DataFrame, dfByTermId: Map[Long, Long]): DataFrame = {
    val withDf =
      if (dfByTermId.size <= IndexReader.MaxDfLiterals) {
        val kvs = dfByTermId.toSeq.flatMap { case (t, d) => Seq(lit(t), lit(d)) }
        // inner-join semantics: decoded rows are pre-filtered to these
        // term ids, so the lookup never misses; the filter keeps the
        // contract explicit rather than relying on the caller
        decoded.withColumn("df", element_at(map(kvs: _*), col("term_id")))
          .filter(col("df").isNotNull)
      } else {
        val dfTbl = dfByTermId.toSeq.toDF("term_id", "df")
        decoded.join(broadcast(dfTbl), "term_id")
      }
    withDf.withColumn("score",
      Analysis.bm25Col(nDocs, avgdl, col("tf"), col("df"), col("dl")))
  }

  /** Exact disjunctive top-k over the physical index WITHOUT pruning
    * (baseline for the WAND gate).
    */
  def topKOrFull(terms: Seq[String], k: Int): DataFrame =
    fullWithInfo(termInfo(terms), k)

  private def fullWithInfo(info: Map[String, (Long, Long)], k: Int): DataFrame = {
    if (info.isEmpty) return emptyHits
    val ids = info.values.map(_._1).toSeq
    val scored = scoreDecoded(decode(blocksForIds(ids)),
      info.values.map(v => v._1 -> v._2).toMap)
    scored.groupBy(col("doc_id"))
      .agg(round(sum(col("score")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Conjunctive (AND) top-k over the physical index: decode the query
    * terms' blocks, docId group with HAVING count = n (same plan family as
    * the logical engine, inputs from blocks).
    */
  def topKAnd(terms: Seq[String], k: Int): DataFrame = {
    val info = termInfo(terms)
    if (info.size < terms.distinct.size) return emptyHits
    val ids = info.values.map(_._1).toSeq
    scoreDecoded(decode(blocksForIds(ids)), info.values.map(v => v._1 -> v._2).toMap)
      .groupBy(col("doc_id"))
      .agg(round(sum(col("score")), 4).as("score"), count(lit(1)).as("n"))
      .filter(col("n") === ids.size)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Proximity/phrase over the physical index: positions decoded from the
    * blocks, window theta-join (Separator semantics).
    */
  def proximityDocs(t1: String, t2: String, lo: Int, hi: Int): DataFrame = {
    require(hasPositions,
      "positions-off index: windowed/phrase queries need storePositions=true")
    val info = termInfo(Seq(t1, t2).distinct)
    if (info.size < Seq(t1, t2).distinct.size)
      return spark.range(0).select(col("id").as("doc_id"), lit(0L).as("n_matches"))
    def posOf(t: String): DataFrame = {
      val (tid, _) = info(t)
      decodeWithPositions(blocks.filter(col("term_id") === tid &&
          col("bucket") === bucketOf(tid)))
        .select(col("doc_id"), explode(col("positions")).as("pos"))
    }
    // self-phrase (t1 == t2): decode once, self-join two aliases
    val base = posOf(t1)
    val p1 = base.toDF("doc_id", "p1")
    val p2 = (if (t1 == t2) base else posOf(t2)).toDF("d2", "p2")
    p1.join(p2, col("doc_id") === col("d2") && (col("p2") - col("p1")).between(lo, hi))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_matches"))
      .orderBy(col("doc_id"))
  }

  /** Top-k completions of a prefix from the physical index:
    * (term, score, dc, oc) -- computeTopCompletions over blocks.
    */
  def topKCompletions(prefix: String, k: Int): DataFrame = {
    prefixRange(prefix) match {
      case None => spark.range(0).select(col("id").cast("string").as("term"),
        lit(0.0).as("score"), col("id").as("dc"), col("id").as("oc"))
      case Some((lo, hi)) =>
        val dfTbl = vocabSlice(prefix, lo, hi).getOrElse(
          dictionary.filter(col("term_id").between(lo, hi))
            .select(col("term_id"), col("term"), col("df")))
        decode(blocksForRange(lo, hi))
          .join(broadcast(dfTbl), "term_id")
          .withColumn("score", Analysis.bm25Col(nDocs, avgdl, col("tf"), col("df"), col("dl")))
          .groupBy(col("term"))
          .agg(round(sum(col("score")), 4).as("score"),
            count(lit(1)).as("dc"), sum(col("tf")).as("oc"))
          .orderBy(col("score").desc, col("term").asc)
          .limit(k)
    }
  }

  /** WAND with pruning statistics: (result, totalBlocks, scannedBlocks). */
  def topKOrWandStats(terms: Seq[String], k: Int): (DataFrame, Long, Long) =
    wandImpl(terms, k)

  /** Exact disjunctive top-k WITH block-max pruning (WAND analog). */
  def topKOrWand(terms: Seq[String], k: Int): DataFrame =
    wandImpl(terms, k)._1

  private def wandImpl(terms: Seq[String], k: Int): (DataFrame, Long, Long) = {
    val info = termInfo(terms)
    if (info.isEmpty) return (emptyHits, 0L, 0L)
    val dfByTermId = info.values.map(v => v._1 -> v._2).toMap
    val idfByTermId = dfByTermId.map { case (tid, d) => tid -> idf(d) }
    val ids = dfByTermId.keys.toSeq

    // All per-block state stays DISTRIBUTED throughout -- a head term at
    // 10^12 docs has millions of blocks and the driver must never see one
    // row (or one expression-tree node) per block. Driver round-trips are
    // bounded: one count, k phase-1 rows, one count, the k results. The
    // first count is memoized per term-id set: the blocks relation is
    // frozen per reader (cached at first scan; delta shards appear to a
    // NEW reader), so a warm repeated query skips the job entirely.
    val qBlocks = blocksForIds(ids)
    // same wholesale reset discipline as the vocab memos: distinct term-id
    // SETS are unbounded over a serving session (every new keyword
    // combination adds a key), unlike distinct terms. The count job runs
    // OUTSIDE the map (get / compute / putIfAbsent, not computeIfAbsent):
    // a cold multi-second count inside the CHM bin lock would stall
    // unrelated queries hashing to the same bin -- the same
    // miss-must-not-serialize discipline as the query caches.
    if (blockCountMemo.size() > VocabMemoMax) blockCountMemo.clear()
    val memoKey = ids.sorted
    val memoized = blockCountMemo.get(memoKey)
    val totalBlocks =
      if (memoized != null) memoized.longValue()
      else {
        val n = qBlocks.count()
        blockCountMemo.putIfAbsent(memoKey, java.lang.Long.valueOf(n))
        n
      }
    if (totalBlocks == 0) return (emptyHits, 0L, 0L)
    if (totalBlocks <= wandMinBlocks)
      return (fullWithInfo(info, k), totalBlocks, totalBlocks)

    // Phase 1: per term, the densest blocks (by block-max, ties toward low
    // first_doc_id so the per-term doc ranges align and overlap) until
    // they cover >= k docs; exactly scoring them yields theta, a valid
    // lower bound on the final k-th score (partial sums only grow).
    // The per-term window sorts METADATA only; selection joins back as a
    // semi-join, never a literal predicate.
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term_id"))
      .orderBy(col("block_max_tfpart").desc, col("first_doc_id").asc)
    val p1Keys = qBlocks
      .select(col("term_id"), col("first_doc_id"), col("n_docs"), col("block_max_tfpart"))
      .withColumn("cum_before",
        coalesce(sum(col("n_docs").cast("long")).over(
          pw.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .filter(col("cum_before") < k)
      .select(col("term_id"), col("first_doc_id"))
    val p1Blocks = qBlocks.join(broadcast(p1Keys), Seq("term_id", "first_doc_id"), "left_semi")
    val p1Scores = scoreDecoded(decode(p1Blocks), dfByTermId)
      .groupBy(col("doc_id")).agg(sum(col("score")).as("score"))
      .orderBy(col("score").desc).limit(k)
      .collect()
    val theta = if (p1Scores.length < k) 0.0 else p1Scores.last.getAs[Double]("score")
    if (theta == 0.0) return (fullWithInfo(info, k), totalBlocks, totalBlocks)

    // Phase 2: prune block b of term t iff no doc in b can reach theta:
    //   ub(b) + sum over other terms t' of (max ub of t'-blocks OVERLAPPING
    //   b's docId range) < theta.
    // The overlap bound is the essence of cursor-based block-max WAND (the
    // cursors align on docId); the global-max-per-term bound is useless on
    // skew: every head-term block would "survive" via the rare term's
    // global ub even where the rare term has no postings at all.
    // Spark shape: a docId GRID. Each term's blocks are exploded to the
    // grid cells they intersect; cell_ub(t, c) = max ub of t's blocks in
    // cell c (a metadata-sized agg); a block's other-term bound sums, over
    // other terms, the max cell_ub across its span. Everything stays
    // distributed -- the driver never sees a per-block row.
    // The 1e-4 safety margin keeps pruning exact UNDER THE 4-DP ROUNDED
    // OUTPUT: a pruned doc's true score is < theta - 1e-4, so its rounded
    // score can never tie the rounded k-th score and steal a slot via the
    // doc_id tiebreak.
    // idf is query-sized too: literal-map lookup, no broadcast-build job
    val idfKvs = idfByTermId.toSeq.flatMap { case (t, v) => Seq(lit(t), lit(v)) }
    val cellW = math.max(1L, nDocs / WandGridCells)
    val meta = qBlocks
      .select(col("term_id"), col("first_doc_id"), col("last_doc_id"),
        col("block_max_tfpart"))
      .withColumn("ub",
        col("block_max_tfpart") * element_at(map(idfKvs: _*), col("term_id")))
    val cells = meta.select(col("term_id"), col("first_doc_id"), col("ub"),
      explode(sequence(floor(col("first_doc_id") / cellW).cast("long"),
        floor(col("last_doc_id") / cellW).cast("long"))).as("cell"))
    val cellUb = cells.groupBy(col("cell"), col("term_id").as("t2"))
      .agg(max(col("ub")).as("cell_ub"))
    val otherBound = cells.select(col("term_id"), col("first_doc_id"), col("cell"))
      .join(cellUb, "cell")
      .filter(col("t2") =!= col("term_id"))
      .groupBy(col("term_id"), col("first_doc_id"), col("t2"))
      .agg(max(col("cell_ub")).as("o_ub"))
      .groupBy(col("term_id"), col("first_doc_id"))
      .agg(sum(col("o_ub")).as("other_bound"))
    val survivingKeys = meta
      .join(otherBound, Seq("term_id", "first_doc_id"), "left_outer")
      .filter(col("ub") + coalesce(col("other_bound"), lit(0.0)) >= theta - 1e-4)
      .select(col("term_id"), col("first_doc_id"))
    val surviving = qBlocks.join(survivingKeys, Seq("term_id", "first_doc_id"), "left_semi")
    val scanned = surviving.count()
    if (scanned >= totalBlocks)
      return (fullWithInfo(info, k), totalBlocks, totalBlocks)

    val result = scoreDecoded(decode(surviving), dfByTermId)
      .groupBy(col("doc_id"))
      .agg(round(sum(col("score")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
    (result, totalBlocks, scanned)
  }

  /** Prefix top-k docs over the physical index: score = summed BM25 over
    * all completions present (same semantics as Engine.topKPrefix).
    */
  def topKPrefixDocs(prefix: String, k: Int): DataFrame = {
    prefixRange(prefix) match {
      case None => spark.range(0).select(col("id").as("doc_id"), lit(0.0).as("score"))
      case Some((lo, hi)) =>
        val dfTbl = vocabSlice(prefix, lo, hi)
          .map(_.select(col("term_id"), col("df")))
          .getOrElse(dictionary.filter(col("term_id").between(lo, hi))
            .select(col("term_id"), col("df")))
        decode(blocksForRange(lo, hi))
          .join(broadcast(dfTbl), "term_id")
          .withColumn("score", Analysis.bm25Col(nDocs, avgdl, col("tf"), col("df"), col("dl")))
          .groupBy(col("doc_id"))
          .agg(round(sum(col("score")), 4).as("score"))
          .orderBy(col("score").desc, col("doc_id").asc)
          .limit(k)
    }
  }

  // ---- Driver-resident serving fast path -----------------------------------
  //
  // The reference serves RAM-resident posting lists -- its whole
  // interactivity story (README.md:16-18; History.h result cache;
  // CompleterBase intersects in-process arrays). The Spark analog: when a
  // query's total posting volume is SMALL (torso/tail terms -- the vast
  // majority of interactive queries), decode its lists ONCE onto the
  // driver (one pruned scan job per cold term, LRU-bounded), and answer
  // score+top-k as plain in-process arithmetic -- ZERO Spark jobs warm.
  // Head terms and big prefixes exceed the guards and keep the distributed
  // plan, so at 10^12 docs the driver never holds more than the postings
  // budget: the same local/distributed split every production engine
  // makes, with the budget as the explicit seam.

  /** Decoded posting list of one term, driver-resident (sorted by doc id:
    * per-term blocks cover disjoint docId ranges, so concatenating blocks
    * in first_doc_id order preserves the within-block sort).
    */
  private case class LocalList(docIds: Array[Long], tfs: Array[Long], dls: Array[Long])

  private val localListLru =
    new java.util.LinkedHashMap[Long, LocalList](16, 0.75f, true)
  private var localListPostings = 0L
  /** spec hooks */
  private[graft] def localListCount: Int = localListLru.synchronized(localListLru.size)

  /** The term's decoded list from the driver LRU, fetching (one pruned
    * collect job) and decoding on miss; None when the term's df exceeds
    * the per-term guard. The fetch+decode runs OUTSIDE the lock (the
    * IndexQueryCache lesson: a miss must not serialize other threads'
    * hits); concurrent misses of one term race benignly, the loser's
    * arrays are dropped.
    */
  private def localList(termId: Long, df: Long): Option[LocalList] = {
    if (df > IndexReader.MaxLocalPostingsPerTerm) return None
    localListLru.synchronized {
      val hit = localListLru.get(termId)
      if (hit != null) return Some(hit)
    }
    val segs = blocksForIds(Seq(termId))
      .select(col("first_doc_id"), col("n_docs"), col("doc_deltas"),
        col("tfs"), col("dls"))
      .collect()
      .sortBy(_.getLong(0))
    val n = segs.map(_.getInt(1)).sum
    val docIds = new Array[Long](n)
    val tfs = new Array[Long](n)
    val dls = new Array[Long](n)
    var off = 0
    segs.foreach { r =>
      val m = r.getInt(1)
      System.arraycopy(Codec.decodeDeltas(doclistCodec, r.getAs[Array[Byte]](2), m),
        0, docIds, off, m)
      System.arraycopy(Codec.decodeLongs(doclistCodec, r.getAs[Array[Byte]](3), m),
        0, tfs, off, m)
      System.arraycopy(Codec.decodeLongs(doclistCodec, r.getAs[Array[Byte]](4), m),
        0, dls, off, m)
      off += m
    }
    val list = LocalList(docIds, tfs, dls)
    localListLru.synchronized {
      if (localListLru.get(termId) == null) {
        localListLru.put(termId, list)
        localListPostings += n
        val it = localListLru.entrySet().iterator()
        while (localListPostings > IndexReader.LocalListBudgetPostings &&
            localListLru.size > 1 && it.hasNext) {
          val e = it.next()
          if (e.getKey != termId) {
            localListPostings -= e.getValue.docIds.length
            it.remove()
          }
        }
      }
      Some(localListLru.get(termId))
    }
  }

  /** In-process BM25 sum + top-k over driver-resident lists -- the same
    * formula, rounding (Spark round = BigDecimal HALF_UP) and total order
    * (score desc, doc_id asc) as the distributed plans; the result is a
    * LocalRelation, so collecting it runs zero jobs.
    */
  private def localTopK(lists: Seq[(Long, LocalList)], k: Int): DataFrame = {
    val agg = new java.util.HashMap[java.lang.Long, java.lang.Double](1024)
    lists.foreach { case (df, l) =>
      val idfV = idf(df)
      var i = 0
      while (i < l.docIds.length) {
        val tf = l.tfs(i).toDouble
        val dl = l.dls(i).toDouble
        val s = idfV * (tf * (Analysis.K1 + 1.0)) /
          (tf + Analysis.K1 * ((1.0 - Analysis.B) + Analysis.B * dl / avgdl))
        agg.merge(l.docIds(i), s, (a, b) => a + b)
        i += 1
      }
    }
    // top-k selection without rounding/sorting the full doc set: 4dp
    // HALF_UP rounding is monotone and moves a value by <= 5e-5, so only
    // docs within 1e-4 of the k-th RAW score can cross it after rounding.
    // Select that window with a size-k min-heap, then round (the exact
    // Spark semantics -- BigDecimal HALF_UP) and totally order only the
    // window.
    val heap = new java.util.PriorityQueue[java.lang.Double](math.max(k, 1))
    agg.forEach((_, s) => {
      if (heap.size < k) heap.add(s)
      else if (s > heap.peek()) { heap.poll(); heap.add(s) }
    })
    val cut = if (heap.isEmpty) Double.NegativeInfinity else heap.peek() - 1e-4
    val cand = new scala.collection.mutable.ArrayBuffer[(Long, Double)](2 * k)
    agg.forEach((d, s) => if (s >= cut) cand += ((d.longValue(),
      BigDecimal(s.doubleValue()).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    cand.sortInPlaceBy { case (d, s) => (-s, d) }
    cand.take(k).toSeq.toDF("doc_id", "score")
  }

  /** Serving facade for disjunctive (and single-keyword) top-k: the
    * driver-resident path when the query's posting volume fits
    * `maxLocalPostings`, the distributed WAND plan otherwise. Results are
    * identical either way (spec-pinned); only the execution locus differs.
    */
  def serveTopKOr(terms: Seq[String], k: Int,
                  maxLocalPostings: Long = IndexReader.MaxLocalPostingsPerQuery): DataFrame = {
    val info = termInfo(terms)
    if (info.isEmpty) return emptyHits
    if (!IndexReader.localServeEnabled ||
        info.values.map(_._2).sum > maxLocalPostings)
      return topKOrWand(terms, k)
    val lists = info.values.toSeq.map { case (tid, df) => (df, localList(tid, df)) }
    if (lists.exists(_._2.isEmpty)) return topKOrWand(terms, k)
    localTopK(lists.map { case (df, l) => (df, l.get) }, k)
  }

  /** Serving facade for prefix top-k docs: driver-resident when the
    * prefix's vocabulary slice is memoizable AND its posting volume fits
    * the budget; `topKPrefixDocs` otherwise (a hot `a*` on a web-scale
    * index stays distributed).
    */
  def servePrefixDocs(prefix: String, k: Int,
                      maxLocalPostings: Long = IndexReader.MaxLocalPostingsPerQuery): DataFrame =
    prefixRange(prefix) match {
      case None => emptyHits
      case Some((lo, hi)) =>
        val sliceOpt =
          if (IndexReader.localServeEnabled) vocabSliceRows(prefix, lo, hi) else None
        sliceOpt match {
          case Some(slice) if slice.iterator.map(_._3).sum <= maxLocalPostings =>
            val lists = slice.toSeq.map { case (tid, _, df) => (df, localList(tid, df)) }
            if (lists.exists(_._2.isEmpty)) topKPrefixDocs(prefix, k)
            else localTopK(lists.map { case (df, l) => (df, l.get) }, k)
          case _ => topKPrefixDocs(prefix, k)
        }
    }
}

object IndexReader {
  /** Above this on-disk size the block cache auto-disables even when the
    * caller asked for it (serving-session convenience must not become a
    * cache-thrash at production scale). 16 GiB default fits the sandbox
    * heap; production sets `graft.index.cacheBlocksMaxBytes`.
    */
  val CacheBlocksMaxBytes: Long = 16L << 30

  /** Process-unique NEGATIVE epochs for readers whose layout could not be
    * fingerprinted (filesystem error): such a reader never shares cache
    * entries -- see [[IndexReader.indexEpoch]].
    */
  private[index] val epochFallback = new java.util.concurrent.atomic.AtomicLong(-1L)

  /** dir -> last epoch observed by a reader construction; an epoch CHANGE
    * triggers the rebuild-in-place cache invalidation (see the
    * construction-time block in the class).
    */
  private[index] val lastEpoch =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** A run spanning at least this many buckets switches from an IN-list of
    * bucket literals to a BETWEEN predicate (identical pruning, constant
    * plan size).
    */
  val MaxBucketLiterals: Long = 256L

  /** Above this many query terms the per-term df lookup switches from a
    * literal-map expression back to a broadcast join (bounded plan size).
    */
  val MaxDfLiterals: Int = 256

  /** A prefix whose id range spans more terms than this is never pulled
    * onto the driver by [[IndexReader!.vocabSlice]] -- a hot `a*` on a
    * 100M-term vocabulary keeps the distributed broadcast join.
    */
  val MaxSliceTerms: Long = 4096L

  /** Distinct prefixes the slice memo holds before a wholesale reset
    * (bounds driver memory at MaxSlicePrefixes * MaxSliceTerms tuples).
    */
  val MaxSlicePrefixes: Int = 512

  /** Driver-resident serving guards: a term with more postings than this
    * never comes onto the driver (head terms stay distributed)...
    */
  val MaxLocalPostingsPerTerm: Long = 128L * 1024

  /** ...a query whose terms' total posting volume exceeds this falls back
    * to the distributed plan...
    */
  val MaxLocalPostingsPerQuery: Long = 256L * 1024

  /** ...and the per-reader decoded-list LRU evicts past this many held
    * postings (~24 bytes each -> ~48 MB), so an adversarial query stream
    * cannot grow driver memory unboundedly.
    */
  val LocalListBudgetPostings: Long = 2L * 1024 * 1024

  /** A/B kill switch: SPARK_GRAFT_NO_LOCAL_SERVE=1 forces every serve*
    * facade onto the distributed plans.
    */
  lazy val localServeEnabled: Boolean =
    !sys.env.get("SPARK_GRAFT_NO_LOCAL_SERVE").contains("1")

  /** Shard visibility under the compaction log.
    * @param present  every `shard=` dir currently under blocks/
    * @param visible  the shards a reader must serve: present, minus shards
    *                 merged by a COMMITTED compaction, minus `compact-*`
    *                 shards whose commit never landed (crash mid-compact)
    * @param nextCompactId  1 + highest committed compaction id
    */
  case class ShardCensus(present: Seq[String], visible: Seq[String],
                         nextCompactId: Long) {
    def hidden: Seq[String] = present.filterNot(visible.toSet)
  }

  /** Resolve shard visibility for an index dir (driver-side; one FS
    * listing + one tiny read of the committed compaction log -- row count
    * == shards ever merged). The log is the COMMIT, not the data move:
    * [[graft.index.IndexBuilder.compact]] writes the merged shard first
    * (invisible here until its commit dir gains _SUCCESS), so a crash at
    * any point leaves a census that serves exactly the old postings.
    */
  /** Merged-shard names of ONE committed compaction commit dir, resolved
    * without a Spark job on the common path: process memo keyed by
    * (commit path, _SUCCESS mtime) -- a committed commit dir is immutable
    * (the compact writer only overwrites BEFORE its _SUCCESS lands, and a
    * rebuild that wipes `compactions/` gives the reused id a new mtime) --
    * then the `_merged.txt` sidecar via one driver-side FS read, then (old
    * index or crash exactly between _SUCCESS and sidecar) the original
    * parquet read. Reader construction over a compacted index is
    * otherwise a per-reader Spark job.
    */
  /** Sidecar file name: underscore-prefixed so Spark's parquet file
    * listing skips it -- the commit dir must stay readable as a plain
    * parquet directory for the fallback path (and for any external
    * reader of commit logs).
    */
  private[index] val MergedSidecarName = "_merged.txt"

  /** Terminating sentinel line: a sidecar without it is torn/partial and
    * MUST be ignored (fall back to the parquet commit read) -- a truncated
    * list would silently resurrect merged shards as visible, serving
    * duplicate postings.
    */
  private[index] val MergedSidecarSentinel = "#end"

  private val mergedMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Seq[String]]()

  /** blocks-dir byte size by (dir, epoch) -- see the cache-guard comment in
    * [[IndexReader.blocks]]. Entries are 2 machine words; the clear guard
    * only matters for pathological dir churn.
    */
  private[index] val dirBytesMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), java.lang.Long]()

  private[graft] def mergedShardsOf(spark: SparkSession, commitDir: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val success = new org.apache.hadoop.fs.Path(s"$commitDir/_SUCCESS")
    val sidecar = new org.apache.hadoop.fs.Path(
      s"$commitDir/$MergedSidecarName")
    val fs = success.getFileSystem(conf)
    // Memo key carries (mtime, length) of BOTH the _SUCCESS marker and
    // the sidecar: mtime alone collides when a rebuild wipes
    // `compactions/` and recreates the same commit id within one
    // coarse-granularity timestamp tick; the sidecar's own stat makes
    // that implausible (and naturally invalidates on sidecar arrival).
    def stat(p: org.apache.hadoop.fs.Path): String =
      try { val st = fs.getFileStatus(p); s"${st.getModificationTime}:${st.getLen}" }
      catch { case scala.util.control.NonFatal(_) => "absent" }
    val successStat = stat(success)
    val key = (commitDir, s"$successStat|${stat(sidecar)}")
    val hit = if (successStat != "absent") mergedMemo.get(key) else null
    if (hit != null) return hit
    // Sidecar fast path: valid ONLY if the terminating sentinel is the
    // last line (a torn/partial write parses as a shorter list otherwise
    // -- merged shards would stay visible and serve duplicate postings).
    val fromSidecar: Option[Seq[String]] =
      try {
        val in = fs.open(sidecar)
        val lines =
          try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
            .split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
          finally in.close()
        if (lines.lastOption.contains(MergedSidecarSentinel))
          Some(lines.dropRight(1))
        else None
      } catch { case scala.util.control.NonFatal(_) => None }
    val names: Seq[String] = fromSidecar.getOrElse {
      spark.read.parquet(commitDir)
        .select("merged_shard").collect().map(_.getString(0)).toSeq
    }
    if (successStat != "absent") {
      if (mergedMemo.size() > 1024) mergedMemo.clear() // unbounded dirs guard
      mergedMemo.putIfAbsent(key, names)
    }
    names
  }

  def shardCensus(spark: SparkSession, dir: String): ShardCensus = {
    val conf = spark.sparkContext.hadoopConfiguration
    def subdirs(path: String, prefix: String): Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith(prefix)).map(_.stripPrefix(prefix)).sorted
    }
    def committed(path: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")
      p.getFileSystem(conf).exists(p)
    }
    val present = subdirs(s"$dir/blocks", "shard=")
    val commits = subdirs(s"$dir/compactions", "commit=")
      .filter(n => committed(s"$dir/compactions/commit=$n"))
    val merged: Set[String] =
      if (commits.isEmpty) Set.empty
      else commits.flatMap(n =>
        mergedShardsOf(spark, s"$dir/compactions/commit=$n")).toSet
    val committedCompacts = commits.map(n => s"compact-$n").toSet
    // every shard dir is its own job with its own _SUCCESS (batch shards:
    // IndexBuilder per-shard writes; stream-*: appendBatch; compact-*:
    // compact) -- a dir WITHOUT the marker is a landing or crashed write
    // and must be invisible, or a reader opened mid-append would cache
    // partial postings under the SAME epoch the completed shard later
    // fingerprints to (shard names don't change on retry). compact-*
    // additionally needs its commit-LOG _SUCCESS: the merged data lands
    // before the log entry that makes the swap atomic.
    val visible = present.filter(s => committed(s"$dir/blocks/shard=$s"))
      .filterNot(merged)
      .filterNot(s => s.startsWith("compact-") && !committedCompacts(s))
    ShardCensus(present, visible,
      commits.map(_.toLong).maxOption.getOrElse(-1L) + 1L)
  }
}
