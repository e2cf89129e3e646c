package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composed filter chain a training-data
  * pipeline actually runs (the C4/Gopher/RefinedWeb recipe) — length
  * gate, language gate, repetition gate, exact-dedup canonicalization —
  * as ONE audited relation instead of opaque drops. Every per-doc signal
  * comes from the gated operators in [[TextAnalysis]] / [[Dedup]]; this
  * module only composes them, so the audit is exactly as trustworthy as
  * its parts.
  *
  * Scale shape: four doc_id-keyed equi-joins over per-doc aggregates
  * (each input relation is one row per doc). The only corpus-wide state
  * is the md5(text) exact-dup grouping — a hash aggregation keyed on the
  * digest, never a pairwise comparison.
  */
object Curation {

  /** Per-doc audit: which gates each document passes and whether it is
    * kept. A document is kept iff it passes all gates AND is the
    * canonical (minimum doc_id) copy of its exact-text group. Flags are
    * 0/1 longs so the relation round-trips bit-exactly through any
    * engine.
    */
  /** The audit's joined core: the MAP-ONLY signals (length gate, language
    * gate, any caller extras like the PII gate) are fused into ONE narrow
    * projection over the corpus scan -- each fused signal is one fewer
    * full corpus scan + doc_id shuffle join than the one-relation-per-
    * signal formulation (at 10^12 docs the joins, not the regexes, are
    * the cost) -- and only the signals that genuinely aggregate
    * (repetition grams, exact-dup canonicalization) join on doc_id.
    */
  private def auditJoined(docs: DataFrame, minTokens: Long,
                          maxDupBigramFrac: Double, keepLang: String,
                          narrowExtra: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    // two projection steps (scores, then argmax over their refs) -- see
    // the [[TextAnalysis.langScoreCols]] scaladoc for why
    val narrow = docs.select(
      col("doc_id").cast("long").as("doc_id") +:
        (TextAnalysis.nTokensCol >= minTokens).as("pass_len") +:
        (TextAnalysis.langScoreCols ++
          narrowExtra.map { case (n, c) => c.as(n) }): _*)
      .select(
        col("doc_id") +: col("pass_len") +:
          (TextAnalysis.langPredFromScores === keepLang).as("pass_lang") +:
          narrowExtra.map { case (n, _) => col(n) }: _*)
    val rep = TextAnalysis.repetition(docs)
      .select(col("doc_id"),
        (col("dup_bigram_frac") <= maxDupBigramFrac).as("pass_rep"))
    val hashed = docs.select(col("doc_id").cast("long").as("doc_id"),
      md5(col("text")).as("h"))
    val canon = hashed
      .join(hashed.groupBy(col("h")).agg(min(col("doc_id")).as("cdoc")), "h")
      .select(col("doc_id"), (col("doc_id") === col("cdoc")).as("is_canonical"))
    narrow.join(rep, "doc_id").join(canon, "doc_id")
  }

  def audit(docs: DataFrame, minTokens: Long = 20,
            maxDupBigramFrac: Double = 0.1,
            keepLang: String = "en"): DataFrame =
    auditJoined(docs, minTokens, maxDupBigramFrac, keepLang, Nil)
      .select(
        col("doc_id"),
        col("pass_len").cast("long").as("pass_len"),
        col("pass_lang").cast("long").as("pass_lang"),
        col("pass_rep").cast("long").as("pass_rep"),
        col("is_canonical").cast("long").as("is_canonical"),
        (col("pass_len") && col("pass_lang") && col("pass_rep")
          && col("is_canonical")).cast("long").as("kept"))

  /** The kept set: doc_ids surviving the full chain. */
  def kept(docs: DataFrame, minTokens: Long = 20,
           maxDupBigramFrac: Double = 0.1,
           keepLang: String = "en"): DataFrame =
    audit(docs, minTokens, maxDupBigramFrac, keepLang)
      .where(col("kept") === 1L).select(col("doc_id"))

  /** The audit with the round-4 signals folded in: unigram-LM perplexity
    * (CCNet-style fluency gate) and PII presence join the length /
    * language / repetition / canonical gates. Same shape as [[audit]] —
    * one row per doc, 0/1 long flags, kept = conjunction — and the same
    * scale story (each added signal is one more doc_id-keyed equi-join
    * over a per-doc aggregate; PII is map-only).
    */
  def auditFull(docs: DataFrame, minTokens: Long = 20,
                maxDupBigramFrac: Double = 0.1,
                keepLang: String = "en",
                maxPerplexity: Double = 30.0): DataFrame = {
    // PII is map-only: it rides the fused narrow projection (see
    // auditJoined); only perplexity -- which needs the corpus-wide LM --
    // adds a join over the base audit
    val base = auditJoined(docs, minTokens, maxDupBigramFrac, keepLang,
      Seq("pass_pii" -> TextAnalysis.piiFreeCol))
    val ppl = TextAnalysis.unigramPerplexity(docs)
      .select(col("doc_id"),
        (col("n_tokens") > 0L && col("perplexity") <= maxPerplexity)
          .as("pass_ppl"))
    base.join(ppl, "doc_id")
      .select(col("doc_id"),
        col("pass_len").cast("long").as("pass_len"),
        col("pass_lang").cast("long").as("pass_lang"),
        col("pass_rep").cast("long").as("pass_rep"),
        col("pass_ppl").cast("long").as("pass_ppl"),
        col("pass_pii").cast("long").as("pass_pii"),
        col("is_canonical").cast("long").as("is_canonical"),
        (col("pass_len") && col("pass_lang") && col("pass_rep") &&
          col("pass_ppl") && col("pass_pii") && col("is_canonical"))
          .cast("long").as("kept"))
  }

  /** Hex threshold for a keep fraction over the md5-u32 sampling domain:
    * a doc is kept iff the first 8 hex chars of md5(doc_id) compare below
    * this string. "g" sorts above every hex digit, so frac >= 1 keeps all.
    */
  def sampleThreshold(frac: Double): String = {
    val f = math.min(1.0, math.max(0.0, frac))
    val t = math.round(f * 4294967296.0) // 2^32
    if (t >= 4294967296L) "g" else f"$t%08x"
  }

  /** Deterministic mixture sampling: keep each document with a per-group
    * probability (the training-mix weighting step — up-/down-sample
    * sources to a target distribution). The coin is the first 8 hex
    * chars of md5(doc_id) compared against [[sampleThreshold]], so the
    * sample is reproducible across engines and runs, independent of
    * partitioning, and consistent under incremental re-runs (a doc's
    * fate never changes when its neighbors do — the property crawl-scale
    * pipelines need for resumable sampling).
    *
    * Scale shape: map-only — one narrow projection, no shuffle, no RNG
    * state; the weight table is a literal CASE chain (mixtures have
    * dozens of sources, not millions).
    */
  def sampleByWeight(docs: DataFrame, weights: Map[String, Double],
                     groupCol: String = "source",
                     defaultFrac: Double = 0.0): DataFrame = {
    val thr = weights.toSeq.sortBy(_._1).foldLeft(
      lit(sampleThreshold(defaultFrac))) { case (acc, (g, f)) =>
        when(col(groupCol) === g, lit(sampleThreshold(f))).otherwise(acc)
    }
    docs.select(col("doc_id").cast("long").as("doc_id"),
      col(groupCol).as("grp"),
      (substring(md5(col("doc_id").cast("string")), 1, 8) < thr)
        .cast("long").as("kept"))
  }

  /** Deterministic train/val/test split assignment: every document lands
    * in exactly one of the three sets, reproducibly across engines, runs
    * and partitionings. The coin is md5 over `doc_id` SALTED with
    * ":split" so the split is statistically independent of the
    * [[sampleByWeight]] coin (an unsalted shared coin would make every
    * down-sampled doc also a val/test doc — a classic leakage bug).
    * Cumulative thresholds give disjoint sets: coin < t(valFrac) -> val,
    * coin < t(valFrac+testFrac) -> test, else train.
    *
    * Scale shape: map-only, no shuffle, no RNG state; incremental
    * re-crawls never move an existing doc between splits.
    */
  def splitAssign(docs: DataFrame, valFrac: Double = 0.05,
                  testFrac: Double = 0.05): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac <= 1.0,
      s"bad split fractions: val=$valFrac test=$testFrac")
    val coin = substring(
      md5(concat(col("doc_id").cast("string"), lit(":split"))), 1, 8)
    docs.select(col("doc_id").cast("long").as("doc_id"),
      when(coin < lit(sampleThreshold(valFrac)), lit("val"))
        .when(coin < lit(sampleThreshold(valFrac + testFrac)), lit("test"))
        .otherwise(lit("train")).as("split"))
  }

  /** Per-language token-length percentiles — the threshold-DERIVATION step
    * of the Gopher/RefinedWeb recipes (their length/quality cuts are
    * percentile-calibrated per language on a corpus sample, not hardcoded).
    * Returns one row per predicted language: doc count + the requested
    * exact percentiles of `n_tokens` (linear interpolation, the
    * quantile_cont convention both Spark's `percentile` and DuckDB use).
    *
    * Scale shape: a map-side-combined histogram aggregation keyed on
    * (language, n_tokens) — cardinality bounded by distinct token
    * counts, tiny relative to docs — then percentile interpolation off
    * the cumulative counts. Exact AND bounded-memory: no per-group value
    * buffer anywhere (Spark's exact `percentile` would buffer every
    * value of a language in one reducer — the body comment has the
    * full argument).
    */
  def qualityThresholds(docs: DataFrame,
                        ps: Seq[Double] = Seq(0.1, 0.5, 0.9)): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), s"bad ps: $ps")
    // token count and language are both map-only signals over the same
    // scan: fuse them into one projection pair (no doc_id join before the
    // languages-sized aggregation); two steps so the regex-heavy score
    // subtrees stay codegen'd column refs, not an interpreted grouping key
    val sig = docs
      .select(TextAnalysis.nTokensCol.as("n_tokens") +: TextAnalysis.langScoreCols: _*)
      .select(col("n_tokens"), TextAnalysis.langPredFromScores.as("lang_pred"))
    // EXACT percentiles in histogram form. Spark's exact `percentile` is
    // an imperative aggregate that buffers EVERY value per group in
    // reducer memory, and the group key is a handful of languages -- at
    // corpus scale that is a full shuffle onto ~5 keys with unbounded
    // per-key buffers. The same exact answer falls out of the value
    // HISTOGRAM instead: n_tokens has bounded cardinality (distinct
    // token counts, tiny relative to docs), so groupBy(lang, n_tokens)
    // is a map-side-combined hash agg, the per-language cumulative
    // window runs over histogram rows only, and the interpolation reads
    // the two order statistics it needs straight off the cumulative
    // ranges. Same linear-interpolation convention as Spark `percentile`
    // / DuckDB `quantile_cont`: h = p*(N-1), x[k] + (h-k)*(x[k+1]-x[k]).
    import org.apache.spark.sql.expressions.Window
    val hist = sig.groupBy(col("lang_pred"), col("n_tokens"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("lang_pred")).orderBy(col("n_tokens"))
    // histogram row covers 0-based order-statistic indices [start, end)
    val cum = hist
      .select(col("lang_pred"), col("n_tokens").cast("double").as("nt"),
        col("c"), sum(col("c")).over(w).as("cend"))
      .withColumn("cstart", col("cend") - col("c"))
      .withColumn("nd", sum(col("c")).over(
        Window.partitionBy(col("lang_pred"))))
    val pcols = ps.map { p =>
      val h = lit(p) * (col("nd").cast("double") - 1.0)
      val k = floor(h)
      def at(i: Column) =
        max(when(col("cstart") <= i && col("cend") > i, col("nt")))
      val xk = at(k)
      val xk1 = coalesce(at(k + 1), at(k)) // k+1 == N only when frac == 0
      round(xk + max(h - k) * (xk1 - xk), 4).as(s"p${math.round(p * 100)}")
    }
    cum.groupBy(col("lang_pred"))
      .agg(max(col("nd")).as("n_docs"), pcols: _*)
  }

  /** Token-budget sequence packing: assign documents (in doc_id order) to
    * training shards of ~`budget` tokens each — shard = floor(running
    * token count BEFORE this doc / budget), the standard streaming-pack
    * rule (a doc spilling over a boundary starts lands in the shard its
    * prefix sum says, so shards are contiguous doc_id ranges and every
    * shard but the last holds >= budget - max_doc_len tokens).
    *
    * Scale shape: a naive global cumulative-sum window is ONE partition —
    * a 100-TB killer. This is the two-level distributed prefix sum
    * instead: per-bucket token totals (doc_id ranges), one tiny window
    * over the bucket aggregates (rows = corpus/bucketSize), broadcast the
    * bucket offsets back, then a per-bucket window for the intra-bucket
    * cumsum. No stage ever sees more than a bucket in one partition.
    */
  def packByBudget(docs: DataFrame, budget: Long,
                   bucketSize: Long = 1L << 20): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val nt = TextAnalysis.quality(docs)
      .select(col("doc_id"), col("n_tokens"),
        (col("doc_id") / bucketSize).cast("long").as("b"))
    val bucketTotals = nt.groupBy(col("b")).agg(sum(col("n_tokens")).as("bt"))
    val offsets = bucketTotals.select(col("b"),
      coalesce(sum(col("bt")).over(
          Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)).as("off"))
    nt.join(broadcast(offsets), "b")
      .select(col("doc_id"), col("n_tokens"),
        (col("off") + coalesce(sum(col("n_tokens")).over(
            Window.partitionBy(col("b")).orderBy(col("doc_id"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L))).as("prior"))
      .select(col("doc_id"), col("n_tokens"),
        floor(col("prior") / budget).cast("long").as("shard_id"))
  }

  /** Context-window chunking with overlap — the sequence-prep step between
    * curation and tokenization: each document's token stream is split into
    * chunks of at most `maxTokens` tokens, consecutive chunks overlapping
    * by `overlap` tokens (stride = maxTokens - overlap; chunk starts are
    * 0, stride, 2*stride, ... and the sequence STOPS once a window
    * reaches the end of the doc: a doc of n > 0 tokens yields
    * 1 + ceil(max(0, n - maxTokens) / stride) chunks, the last possibly
    * short. The stop rule matters: "while start < n" would emit a
    * trailing chunk fully contained in the previous one whenever the
    * previous window already covered the tail -- duplicated tokens fed
    * to downstream packing).
    * Returns (doc_id, chunk_id, start_pos, n_tokens, chunk_hash) with
    * chunk_hash = md5 of the space-joined chunk tokens — the deterministic
    * identity downstream packing/dedup keys on.
    *
    * Scale shape: ONE narrow projection — token split, chunk-start
    * sequence and per-chunk slice+hash are all array arithmetic inside the
    * row (the [[Dedup.gramHashes]] pattern): no shuffle, no window, no
    * per-chunk join; output size is the chunk count, not tokens × chunks.
    */
  def chunkByTokens(docs: DataFrame, maxTokens: Int = 10,
                    overlap: Int = 2): DataFrame = {
    require(maxTokens >= 1 && overlap >= 0 && overlap < maxTokens,
      s"bad chunking: maxTokens=$maxTokens overlap=$overlap")
    val stride = maxTokens - overlap
    docs.select(col("doc_id").cast("long").as("doc_id"),
        Dedup.toksArr.as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
      .select(col("doc_id"), posexplode(
        when(col("n") > 0, transform(
          sequence(lit(0),
            ceil(greatest(col("n") - maxTokens, lit(0)).cast("double") / stride)
              .cast("int")),
          i => struct(
            (i * stride).cast("long").as("start_pos"),
            least(col("n") - i * stride, lit(maxTokens)).cast("long").as("n_tokens"),
            md5(concat_ws(" ",
              slice(col("toks"), i * stride + 1, lit(maxTokens)))).as("chunk_hash"))))
          .otherwise(array())).as(Seq("chunk_id", "c")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("c.start_pos").as("start_pos"), col("c.n_tokens").as("n_tokens"),
        col("c.chunk_hash").as("chunk_hash"))
  }

  /** Benchmark decontamination: per training document, how many of its
    * token n-gram positions also occur in the evaluation set (any doc).
    * The standard pre-training hygiene pass (the GPT-3 appendix / PaLM
    * recipe): a training doc sharing any n-gram with an eval item is
    * flagged so the trainer can drop or scrub it.
    *
    * Scale shape: the eval-set gram table is tiny relative to the corpus
    * (benchmarks are 10^3-10^5 items vs 10^12 docs), so it is broadcast
    * and the check is a map-side semi-join over the training grams —
    * never a corpus-sized shuffle. Returns one row per training doc:
    * (doc_id, n_grams, n_hit, contaminated 0/1).
    */
  def contamination(docs: DataFrame, evalDocs: DataFrame, n: Int = 5): DataFrame = {
    val trainGrams = Dedup.gramHashes(docs, n)
    val evalGrams = Dedup.gramHashes(evalDocs, n).select(col("g")).distinct()
    val totals = trainGrams.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
    val hits = trainGrams.join(broadcast(evalGrams), Seq("g"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    docs.select(col("doc_id").cast("long").as("doc_id"))
      .join(totals, Seq("doc_id"), "left")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) > 0L).cast("long").as("contaminated"))
  }
}
