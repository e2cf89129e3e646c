package graft.query

import graft.core.Analysis
import graft.index.IndexReader
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryParser._

/** Physical-path atom source: an atom resolves to dictionary candidates
  * (the term-level predicate -- prefix / fuzzy / synonym / range / OR --
  * is evaluated once per VOCABULARY entry), then to a bucket- and
  * min/max-pruned block scan decoded by the native Generator and scored
  * with BM25 from the persisted df/stats.
  *
  * This is the reference's architecture: every query shape goes through
  * the block index (HYBCompleter.cpp:115-270, block locate :661-746) --
  * at 10^12 docs a query must never touch, let alone re-tokenize, the
  * corpus.
  */
class IndexAtomSource(reader: IndexReader) extends AtomSource {

  private def emptyScored: DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("term", StringType),
      StructField("tf", LongType),
      StructField("positions", ArrayType(IntegerType)),
      StructField("score", DoubleType)))
    reader.spark.createDataFrame(reader.spark.sparkContext.emptyRDD[Row], schema)
  }

  def atomScored(atom: Atom): DataFrame = {
    // candidate relation: (term_id, term, df). Fuzzy atoms go through the
    // FastSS deletion-neighborhood index when built (candidates =
    // variant-IN-list lookups, edit distance verified on candidates only);
    // other atoms (and fuzzy without the index, or beyond its built
    // distance) are vocab-sized dictionary predicates.
    val cand = (atom match {
      case w: Word if w.fuzzy =>
        val thr = Executor.fuzzyThreshold(w.text)
        if (graft.index.FuzzyIndex.exists(reader.dir) &&
            thr <= graft.index.FuzzyIndex.maxDeletes(reader.spark, reader.dir))
          graft.index.FuzzyIndex.candidates(
            reader.spark, reader.dir, reader.dictionary, w.text, thr)
        else reader.dictionary.filter(CorpusAtomSource.atomPredicate(atom))
      case _ => reader.dictionary.filter(CorpusAtomSource.atomPredicate(atom))
    }).select(col("term_id"), col("term"), col("df"))
    // one 2-long driver round-trip per atom (memoized per index + atom --
    // a serving session answers repeated shapes with zero extra jobs):
    // the candidate term-id RANGE. Dense lexicographic ids make
    // prefixes/ranges contiguous, so the block scan below prunes
    // partitions (bucket dirs) and row groups (term_id min/max) before
    // the broadcast join applies the exact set (block locate analog,
    // HYBCompleter.cpp:661-746).
    if (IndexAtomSource.rangeCache.size() > IndexAtomSource.RangeCacheMax)
      IndexAtomSource.rangeCache.clear() // crude bound; entries are cheap to recompute
    val range = IndexAtomSource.rangeCache.computeIfAbsent(
      (reader.dir, reader.indexEpoch, atom), _ => {
        val r = cand.agg(min(col("term_id")), max(col("term_id"))).head()
        if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
      })
    if (range.isEmpty) return emptyScored
    val (lo, hi) = range.get
    reader.decodeWithPositions(reader.blocksForRange(lo, hi))
      .join(broadcast(cand), "term_id")
      .select(col("doc_id"), col("term"), col("tf"), col("positions"),
        Analysis.bm25Col(reader.nDocs, reader.avgdl,
          col("tf"), col("df"), col("dl")).as("score"))
  }

  protected def vocabContains(w: String): Boolean =
    !reader.dictionary.filter(col("term") === w).isEmpty

  protected def closestVocabWord(w: String, thr: Int): Option[String] =
    reader.dictionary
      .filter(levenshtein(col("term"), lit(w)) <= thr)
      .select(col("term"), levenshtein(col("term"), lit(w)).as("d"))
      .orderBy(col("d").asc, col("term").asc)
      .limit(1).collect().headOption.map(_.getString(0))
}

object IndexAtomSource {
  /** (index dir, index epoch, atom) -> candidate term-id range; atoms
    * repeat across a serving session and ranges are immutable per built
    * index -- the epoch key makes a rebuild into the same dir a different
    * cache row, and the size bound keeps an adversarial atom stream from
    * growing the map without limit.
    */
  private[query] val RangeCacheMax = 65536
  private[query] val rangeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Atom), Option[(Long, Long)]]()
}

/** Physical-path facade: the full reference grammar served from the
  * compressed posting-block index via the shared [[Eval]] state machine.
  */
object IndexExecutor {

  def topK(reader: IndexReader, query: String, k: Int,
           bonuses: Boolean = false, bestMatchBonus: Double = 0.0): DataFrame =
    Eval.topK(new IndexAtomSource(reader), query, k, bonuses, bestMatchBonus)

  def completions(reader: IndexReader, query: String, k: Int): DataFrame =
    Eval.completions(new IndexAtomSource(reader), query, k)

  def evalDocs(reader: IndexReader, q: ParsedQuery,
               bonuses: Boolean = false): DataFrame =
    Eval.evalDocs(new IndexAtomSource(reader), q, bonuses)

  /** Excerpts for the top-k hits of a query, text served from the index's
    * docs store (buildDocsDB analog) -- the corpus itself is never read.
    */
  def excerpts(reader: IndexReader, query: String, k: Int,
               exact: Seq[String], prefixes: Seq[String],
               radius: Int = 2): DataFrame = {
    val hits = topK(reader, query, k)
    Excerpts.generate(reader.docs, hits, exact, prefixes, radius)
  }
}
