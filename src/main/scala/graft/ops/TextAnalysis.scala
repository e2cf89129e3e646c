package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Catalyst expressions (whole-stage codegen, no UDFs) and all
  * reproducible in ANSI SQL for the oracle.
  */
object TextAnalysis {

  /** Marker stopwords per language for the n-gram/stopword language-ID
    * heuristic. Deterministic: score = marker hits; argmax with
    * lexicographic tie-break; 'und' (undetermined) when zero hits.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "los", "y", "es", "una"),
    "fr" -> Seq("le", "la", "et", "est", "une"))

  /** Whole-word occurrence count of ANY of `tokens`, in ONE regex pass:
    * `\ba\b|\bb\b|...` (\b matches DuckDB RE2 and Java regex alike).
    * Counting-equivalent to summing a per-token
    * `size(regexp_extract_all(lower(text), '\btoken\b'))` — each `\b..\b`
    * alternative consumes exactly one whole word, so
    * a text word matches the alternation iff it equals one of the tokens,
    * and non-overlapping left-to-right matching counts every such word
    * exactly once regardless of alternative order. One scan of the text
    * instead of `tokens.length` scans (and `regexp_count` instead of
    * materializing a match array per row): on a 100 TB map-only curation
    * pass the regex scans ARE the stage, so this is a direct
    * `tokens.length`x cut of the per-task work (guide §1.2 step 2).
    */
  private def countAnyToken(tokens: Seq[String]): Column =
    regexp_count(lower(col("text")),
      lit(tokens.map(t => s"\\b$t\\b").mkString("|")))

  /** Per-language marker-score columns (`_score_<lang>`), for map-only
    * consumers ([[graft.ops.Curation]]) that fuse language ID into an
    * existing projection instead of paying a separate scan + doc_id join.
    * Kept as a SEPARATE projection step from [[langBestFromScores]]: the
    * argmax chain references every score several times, and inlining the
    * regex-heavy score subtrees there re-evaluates them wherever the
    * consumer's expression lands outside whole-stage codegen (measured:
    * an ObjectHashAggregate grouping key interpreted the inlined chain
    * ~1 s slower at sf0.1 than the two-step shape; CollapseProject's
    * non-cheap-duplication guard preserves the boundary).
    */
  private[ops] def langScoreCols: Seq[Column] =
    LangMarkers.toSeq.sortBy(_._1).map { case (lang, toks) =>
      countAnyToken(toks).cast("long").as(s"_score_$lang")
    }

  /** argmax (score, lang) struct over already-projected [[langScoreCols]],
    * lexicographic tie-break.
    */
  private[ops] def langBestFromScores: Column =
    LangMarkers.keys.toSeq.sorted
      .map(l => struct(col(s"_score_$l").as("s"), lit(l).as("l")))
      .reduce((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))

  /** Predicted language over [[langScoreCols]] ('und' on zero hits). */
  private[ops] def langPredFromScores: Column = {
    val best = langBestFromScores
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }

  /** Reference-tokenizer token count as a pure column. */
  private[ops] def nTokensCol: Column =
    size(filter(split(col("text"), Dedup.SepClass), t => t =!= "")).cast("long")

  /** (doc_id, lang_pred, n_markers): heuristic language identification. */
  def langId(docs: DataFrame): DataFrame = {
    val best = langBestFromScores
    docs.select(col("doc_id").cast("long").as("doc_id") +: langScoreCols: _*)
      .select(col("doc_id"),
        when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und")).as("lang_pred"),
        best.getField("s").as("n_markers"))
  }

  /** Quality metrics per doc: token count, char count, mean token length,
    * stopword ratio, alpha ratio, and a composite quality score in [0,1].
    */
  def quality(docs: DataFrame, stopwords: Seq[String] = Seq("the", "a", "of")): DataFrame = {
    val toks = split(col("text"), Dedup.SepClass)
    val nTokens = size(filter(toks, t => t =!= ""))
    val nStop = countAnyToken(stopwords)
    val nChars = length(col("text"))
    val alphaChars = length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      nTokens.cast("long").as("n_tokens"),
      nChars.cast("long").as("n_chars"),
      round(nChars.cast("double") / greatest(nTokens, lit(1)), 4).as("mean_tok_len"),
      round(nStop.cast("double") / greatest(nTokens, lit(1)), 4).as("stopword_ratio"),
      round(alphaChars.cast("double") / greatest(nChars, lit(1)), 4).as("alpha_ratio"),
      round(
        least(nTokens.cast("double") / 100.0, lit(1.0)) * lit(0.5)
          + (lit(1.0) - least(nStop.cast("double") / greatest(nTokens, lit(1)), lit(1.0))) * lit(0.25)
          + (alphaChars.cast("double") / greatest(nChars, lit(1))) * lit(0.25),
        4).as("quality"))
  }

  /** Token counts three ways: whitespace split, reference tokenizer
    * (separator class), and a BPE-ish regex (letter runs / digit runs /
    * single other chars).
    */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val ws = size(filter(split(col("text"), " +"), t => t =!= ""))
    val ref = size(filter(split(col("text"), Dedup.SepClass), t => t =!= ""))
    val bpe = size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
    docs.select(col("doc_id").cast("long").as("doc_id"),
      ws.cast("long").as("n_ws"), ref.cast("long").as("n_ref"), bpe.cast("long").as("n_bpe"))
  }

  /** Repetition signals per doc (the Gopher-rule family: repeated text is
    * the strongest single low-quality indicator for web-scale training
    * data): fraction of token occurrences whose token repeats within the
    * doc, and the bigram concentration (top-bigram share + duplicated-
    * bigram share). Computed by explode + two hash aggregations keyed on
    * (doc_id, gram) — the shuffle key contains doc_id, so the work spreads
    * over the cluster no matter how long individual documents are (an
    * all-array per-row formulation would be O(len^2) on the longest doc).
    */
  def repetition(docs: DataFrame): DataFrame = {
    val toks = Dedup.toksArr
    val base = docs
      .select(col("doc_id").cast("long").as("doc_id"), explode(toks).as("term"))
    val uniAgg = base.groupBy(col("doc_id"), col("term")).count()
      .groupBy(col("doc_id")).agg(
        sum(col("count")).as("n_tokens"),
        sum(when(col("count") > 1, col("count")).otherwise(0L)).as("dup_u"))
    // bigrams of consecutive tokens as IN-ROW array arithmetic (the
    // [[Dedup.gramHashes]] pattern): a narrow explode replaces the old
    // posexplode + doc_id-partitioned window `lead` -- one fewer shuffle
    // AND no per-doc sort, since the token array is already in position
    // order inside the row (a window's (doc_id, pos) sort re-derives what
    // the array encodes for free). Values are identical: lead over
    // posexplode positions = the next array element.
    val biAgg = docs
      .select(col("doc_id").cast("long").as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), explode(
        when(size(col("toks")) >= 2,
          transform(sequence(lit(1), size(col("toks")) - 1),
            i => concat_ws(" ", element_at(col("toks"), i),
              element_at(col("toks"), i + 1))))
          .otherwise(array())).as("bigram"))
      .groupBy(col("doc_id"), col("bigram")).count()
      .groupBy(col("doc_id")).agg(
        sum(col("count")).as("n_bigrams"),
        max(col("count")).as("top_c"),
        sum(when(col("count") > 1, col("count")).otherwise(0L)).as("dup_b"))
    docs.select(col("doc_id").cast("long").as("doc_id"))
      .join(uniAgg, Seq("doc_id"), "left")
      .join(biAgg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("dup_u"), lit(0L)).cast("double")
          / greatest(coalesce(col("n_tokens"), lit(0L)), lit(1L)), 4).as("dup_word_frac"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("top_c"), lit(0L)).cast("double")
          / greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)), 4).as("top_bigram_frac"),
        round(coalesce(col("dup_b"), lit(0L)).cast("double")
          / greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)), 4).as("dup_bigram_frac"))
  }

  /** Unigram language-model perplexity per doc — the CCNet-style quality
    * signal (low perplexity under an in-domain LM = fluent text; high =
    * noise). The LM here is the corpus's own unigram distribution
    * (cf/total), so the operator is self-contained and bit-reproducible;
    * at production scale the `cf` relation is swapped for a trained LM
    * table with the same (term, cf) shape. ppl = exp(mean over tokens of
    * -ln p(token)). One (doc_id, term)-free explode + a vocabulary-sized
    * join; the totals relation is a 1-row cross join, never a driver
    * scalar baked into the plan.
    */
  def unigramPerplexity(docs: DataFrame): DataFrame = {
    val toks = Dedup.toksArr
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
      explode(toks).as("term"))
    val cf = base.groupBy(col("term")).agg(count(lit(1)).as("cf"))
    val tot = base.agg(count(lit(1)).cast("double").as("tot"))
    val perDoc = base.join(cf, "term").crossJoin(tot)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(exp(avg(-log(col("cf") / col("tot")))), 4).as("perplexity"))
    docs.select(col("doc_id").cast("long").as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("perplexity"), lit(0.0)).as("perplexity"))
  }

  /** PII patterns — RE2-safe (no backrefs / lookarounds) so the same
    * pattern text runs identically under Java regex (Spark) and RE2
    * (DuckDB oracle, and most scale-out scrubbing stacks).
    */
  val EmailRe: String = """[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"""
  val PhoneRe: String = """\b\d{3}-\d{3}-\d{4}\b"""
  val Ipv4Re: String = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  /** True iff `text` holds no PII match -- the [[pii]] gate as a pure
    * column, fusible into an existing map-only projection.
    */
  private[ops] def piiFreeCol: Column =
    regexp_count(col("text"), lit(EmailRe)) +
      regexp_count(col("text"), lit(PhoneRe)) +
      regexp_count(col("text"), lit(Ipv4Re)) === 0

  /** PII detection + redaction per doc: counts of emails / NANP-style
    * phone numbers / IPv4 addresses, plus the md5 of the text with each
    * occurrence replaced by a typed placeholder. Redaction order is fixed
    * (email, then IP, then phone) so engines agree when patterns could
    * overlap. Pure Catalyst regex expressions — narrow, no shuffle, no
    * UDFs; at 100 TB this is a map-only pass over the corpus.
    */
  def pii(docs: DataFrame): DataFrame = {
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_email"),
      regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phone"),
      regexp_count(col("text"), lit(Ipv4Re)).cast("long").as("n_ip"),
      md5(redacted).as("redacted_hash"))
  }

  /** Corpus-wide top-k most frequent token n-grams — the boilerplate-mining
    * pass (cookie banners, nav bars, license headers surface as head
    * n-grams; C4-style pipelines mine them before line-level filtering).
    * Returns exactly k rows (gram, n_docs, n_occurrences), deterministic
    * tie-break (count desc, then gram asc).
    *
    * Scale shape: one per-doc window builds the grams (partitioned by
    * doc_id, never global), one hash aggregation keyed on the gram (the
    * only corpus-wide shuffle; partial map-side combine makes head grams
    * cheap, not hot), and the top-k is TakeOrderedAndProject — O(k) rows
    * ever reach the driver, no global sort.
    */
  def topNgrams(docs: DataFrame, n: Int = 2, k: Int = 20): DataFrame = {
    require(n >= 1 && k >= 1, s"bad n=$n k=$k")
    val toks = Dedup.toksArr
    // per-doc sliding n-grams as in-row array arithmetic (the
    // [[Dedup.gramHashes]] pattern) -- replaces the old posexplode +
    // doc_id-partitioned window with n-1 `lead` passes: one fewer shuffle,
    // no per-doc sort, and the gram build stays in whole-stage codegen.
    // Grams are space-joined runs of n consecutive tokens, exactly the
    // window formulation's output (a window lead beyond the doc tail made
    // the gram NULL and was filtered; here the sequence simply stops).
    val withGram = docs
      .select(col("doc_id").cast("long").as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), explode(
        when(size(col("toks")) >= n,
          transform(sequence(lit(1), size(col("toks")) - (n - 1)),
            i => concat_ws(" ", slice(col("toks"), i, lit(n)))))
          .otherwise(array())).as("g"))
    withGram.groupBy(col("g").as("gram"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("gram").asc)
      .limit(k)
  }

  /** Per-document top-k TF-IDF keywords — the classic keyword-extraction /
    * document-representation pass (topic labeling, weak supervision,
    * per-doc metadata for retrieval mixes). tfidf = tf * ln(N / df) over
    * the corpus's own document frequencies, rounded to 4dp BEFORE ranking
    * so the (tfidf desc, term asc) order is total and engine-reproducible
    * (the exp/ln 4dp parity argument of [[unigramPerplexity]]).
    *
    * Scale shape: two hash aggregations (per-(doc, term) tf, per-term df),
    * a vocabulary-sized equi-join, the 1-row N relation as a cross join
    * (never a driver scalar in the plan), and ONE window partitioned by
    * doc_id for the per-doc rank — work spreads with the corpus, no
    * global sort, no explode beyond the tokenizer's.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, s"bad k=$k")
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
      explode(Dedup.toksArr).as("term"))
    val dt = base.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfs = dt.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    // per-doc top-k as a HASH aggregation + in-row sort of the doc's own
    // (tfidf, term) list instead of a row_number window: the window paid
    // a full per-partition SORT of the corpus-sized scored relation to
    // rank inside each doc, where the per-doc list is bounded by the
    // doc's distinct-term count anyway. struct(-tfidf, term) ascending ==
    // (tfidf desc, term asc) -- negation of the 4dp-rounded double is
    // exact, so the rank order is bit-identical to the window form.
    dt.join(dfs, "term").crossJoin(n)
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("n") / col("df")), 4).as("tfidf"))
      .groupBy(col("doc_id"))
      .agg(slice(sort_array(collect_list(
        struct((-col("tfidf")).as("neg"), col("term"), col("tfidf")))),
        1, k).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("doc_id"), col("t.term").as("term"), col("t.tfidf").as("tfidf"),
        (col("i") + 1).cast("long").as("rk"))
  }

  /** Positional document fingerprint: sum over tokens of
    * (pos+1) * (md5-derived 32-bit token hash), mod 1e9+7. Order-sensitive,
    * pure integer arithmetic -> bit-exact in any engine.
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    val toks = Dedup.toksArr
    val P = 1000000007L
    val fp = aggregate(
      zip_with(toks, sequence(lit(1), greatest(size(toks), lit(1))),
        (t, i) => i.cast("long") * conv(substring(md5(t), 1, 8), 16, 10).cast("long")),
      lit(0L), (acc, x) => (acc + x) % P) % P
    docs.select(col("doc_id").cast("long").as("doc_id"),
      when(size(toks) === 0, lit(0L)).otherwise(fp).as("fingerprint"))
  }
}
