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
  * ub(b) + sum over other query terms t' of max_b' ub(b') < theta:
  * any doc with its t-postings in b has total score below theta, so
  * dropping the block can neither remove a true top-k doc nor promote a
  * false one (partial scores only shrink). theta comes from exactly
  * scoring the densest block per term (phase 1). This is the
  * Spark-idiomatic, exact equivalent of cursor-based BM-WAND.
  */
class IndexReader(val spark: SparkSession, val dir: String,
                  cacheBlocks: Boolean = true) extends Serializable {
  import spark.implicits._

  lazy val dictionary: DataFrame = spark.read.parquet(s"$dir/dictionary").cache()
  private lazy val statsRow = spark.read.parquet(s"$dir/stats").head()
  lazy val nDocs: Long = statsRow.getAs[Long]("n_docs")
  lazy val avgdl: Double = statsRow.getAs[Double]("avgdl")
  /** Block segments. Cached by default for a query-serving session (the
    * in-memory relation still skips batches via min/max stats); pass
    * cacheBlocks=false for one-shot scans of indexes larger than memory.
    */
  lazy val blocks: DataFrame = {
    val b = spark.read.parquet(s"$dir/blocks")
    if (cacheBlocks) b.cache() else b
  }

  def idf(df: Long): Double = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)

  /** term -> (term_id, df); driver-side lookup of a handful of terms. */
  def termInfo(terms: Seq[String]): Map[String, (Long, Long)] =
    dictionary.filter(col("term").isin(terms: _*))
      .select(col("term"), col("term_id"), col("df"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  /** prefix -> contiguous term_id range [lo, hi] (prefixToRange analog,
    * CompleterBase.cpp:2505-2636; dense lexicographic ids make any prefix
    * a contiguous id range).
    */
  def prefixRange(prefix: String): Option[(Long, Long)] = {
    val r = dictionary.filter(col("term").startsWith(prefix))
      .agg(min(col("term_id")), max(col("term_id"))).head()
    if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
  }

  /** Pruned block scan for a term-id range. */
  def blocksForRange(lo: Long, hi: Long): DataFrame = {
    val b = IndexBuilder.DefaultBucketSize
    blocks.filter(col("bucket").between(lo / b, hi / b) &&
      col("term_id").between(lo, hi))
  }

  /** Decode blocks to (term_id, doc_id, tf, dl) via the custom Catalyst
    * Generator (GenerateExec, no object-encoder boundary).
    */
  def decode(blockDf: DataFrame): DataFrame =
    blockDf.select(col("term_id"),
      PostingsDecode.postingsDecode(col("n_docs"), col("doc_deltas"),
        col("tfs"), col("dls")))

  /** Decode including per-doc positions: (term_id, doc_id, tf, dl, positions). */
  def decodeWithPositions(blockDf: DataFrame): DataFrame =
    blockDf.select(col("term_id"),
      PostingsDecode.postingsDecodeWithPositions(col("n_docs"), col("doc_deltas"),
        col("tfs"), col("dls"), col("positions")))

  /** BM25 score column over decoded postings joined with per-term df. */
  private def scoreDecoded(decoded: DataFrame, dfByTermId: Map[Long, Long]): DataFrame = {
    val dfTbl = dfByTermId.toSeq.toDF("term_id", "df")
    decoded.join(broadcast(dfTbl), "term_id")
      .withColumn("score",
        Analysis.bm25Col(nDocs, avgdl, col("tf"), col("df"), col("dl")))
  }

  /** Exact disjunctive top-k over the physical index WITHOUT pruning
    * (baseline for the WAND gate).
    */
  def topKOrFull(terms: Seq[String], k: Int): DataFrame = {
    val info = termInfo(terms)
    if (info.isEmpty) return spark.emptyDataFrame.withColumn("doc_id", lit(0L)).withColumn("score", lit(0.0)).limit(0)
    val ids = info.values.map(_._1).toSeq
    val blockDf = blocks.filter(col("term_id").isin(ids: _*) &&
      col("bucket").isin(ids.map(_ / IndexBuilder.DefaultBucketSize).distinct: _*))
    val scored = scoreDecoded(decode(blockDf), info.values.map(v => v._1 -> v._2).toMap)
    scored.groupBy(col("doc_id"))
      .agg(round(sum(col("score")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Exact disjunctive top-k WITH block-max pruning (WAND analog). */
  def topKOrWand(terms: Seq[String], k: Int): DataFrame = {
    val info = termInfo(terms)
    if (info.isEmpty) return topKOrFull(terms, k)
    val dfByTermId = info.values.map(v => v._1 -> v._2).toMap
    val idfByTermId = dfByTermId.map { case (tid, d) => tid -> idf(d) }
    val ids = dfByTermId.keys.toSeq

    // Block metadata to the driver: tiny (one row per ~64k postings).
    val meta = blocks
      .filter(col("term_id").isin(ids: _*) &&
        col("bucket").isin(ids.map(_ / IndexBuilder.DefaultBucketSize).distinct: _*))
      .select(col("term_id"), col("first_doc_id"), col("block_max_tfpart"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2) * idfByTermId(r.getLong(0))))

    if (meta.isEmpty) return topKOrFull(terms, k)
    // tiny candidate set: the two-phase pruning costs more driver round
    // trips than it saves -- scan directly
    if (meta.length <= 64) return topKOrFull(terms, k)

    // Phase 1: exactly score the single highest-ub block per term -> theta
    // (a valid lower bound on the final k-th score: partial sums only grow).
    val phase1Keys = meta.groupBy(_._1).map { case (_, bs) => bs.maxBy(_._3) }
      .map(b => (b._1, b._2)).toSet
    val p1Filter = phase1Keys
      .map { case (tid, fdoc) => col("term_id") === tid && col("first_doc_id") === fdoc }
      .reduce(_ || _)
    val p1Blocks = blocks
      .filter(col("bucket").isin(ids.map(_ / IndexBuilder.DefaultBucketSize).distinct: _*))
      .filter(p1Filter)
    val p1Scores = scoreDecoded(decode(p1Blocks), dfByTermId)
      .groupBy(col("doc_id")).agg(sum(col("score")).as("score"))
      .orderBy(col("score").desc).limit(k)
      .collect()
    val theta = if (p1Scores.length < k) 0.0 else p1Scores.last.getAs[Double]("score")

    // Phase 2: prune blocks that cannot put any of their docs above theta.
    val maxUbByTerm = meta.groupBy(_._1).map { case (t, bs) => t -> bs.map(_._3).max }
    val sumOthersUb = ids.map(t => t -> (maxUbByTerm.values.sum - maxUbByTerm(t))).toMap
    val surviving = meta.filter { case (tid, _, ub) => ub + sumOthersUb(tid) >= theta }
    if (surviving.length == meta.length || theta == 0.0) return topKOrFull(terms, k)

    val survFilter = surviving
      .map { case (tid, fdoc, _) => col("term_id") === tid && col("first_doc_id") === fdoc }
      .reduce(_ || _)
    val blockDf = blocks
      .filter(col("bucket").isin(ids.map(_ / IndexBuilder.DefaultBucketSize).distinct: _*))
      .filter(survFilter)
    scoreDecoded(decode(blockDf), dfByTermId)
      .groupBy(col("doc_id"))
      .agg(round(sum(col("score")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Prefix top-k docs over the physical index: score = summed BM25 over
    * all completions present (same semantics as Engine.topKPrefix).
    */
  def topKPrefixDocs(prefix: String, k: Int): DataFrame = {
    prefixRange(prefix) match {
      case None => spark.range(0).select(col("id").as("doc_id"), lit(0.0).as("score"))
      case Some((lo, hi)) =>
        val dfTbl = dictionary.filter(col("term_id").between(lo, hi))
          .select(col("term_id"), col("df"))
        decode(blocksForRange(lo, hi))
          .join(broadcast(dfTbl), "term_id")
          .withColumn("score", Analysis.bm25Col(nDocs, avgdl, col("tf"), col("df"), col("dl")))
          .groupBy(col("doc_id"))
          .agg(round(sum(col("score")), 4).as("score"))
          .orderBy(col("score").desc, col("doc_id").asc)
          .limit(k)
    }
  }
}
