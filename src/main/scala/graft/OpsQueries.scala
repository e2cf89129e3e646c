package graft

import graft.core.WebCorpus
import graft.ops.{Curation, Dedup, Events, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline queries (dedup / similarity / text analysis /
  * multimodal / streaming) + DuckDB oracles.
  */
object OpsQueries {

  /** Small single-file inputs scan as 1-2 partitions, serializing every
    * per-doc map stage (tokenize/shingle/hash) onto one core while the
    * rest idle; spread them to the session parallelism. At production
    * scale the scan already has >= defaultParallelism splits and this is
    * a no-op — the guard is plan-time, not a data-dependent job.
    */
  private def spread(df: DataFrame, memoKey: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // `.rdd.getNumPartitions` builds (and physically plans) a second
    // QueryExecution for the scan on every call; the split count of a
    // fixed file set under a fixed parallelism is a plan-time constant,
    // so probe it once per (file, parallelism) and reuse (guide §1.2:
    // don't re-pay per-query work that is invariant across queries)
    val n = spreadMemo.computeIfAbsent(s"$memoKey#$p",
      _ => Integer.valueOf(df.rdd.getNumPartitions))
    if (n < p) df.repartition(p) else df
  }

  private val spreadMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spread(spark.read.parquet(s"$sfDir/documents.parquet"), s"$sfDir/documents.parquet")
  private def embs(spark: SparkSession, sfDir: String): DataFrame =
    spread(spark.read.parquet(s"$sfDir/embeddings.parquet"), s"$sfDir/embeddings.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact" -> ((s, d) => Dedup.exactGroups(docs(s, d))),
    "dd_keep" -> ((s, d) => Dedup.dedupedDocs(docs(s, d))
      .orderBy(col("doc_id"))),
    "dd_clusters" -> ((s, d) => Dedup.duplicateClusters(
        Dedup.lshCandidatePairs(docs(s, d), n = 5, nHashes = 8, bands = 4))
      .orderBy(col("doc_id"))),
    "dd_keepset" -> ((s, d) => Dedup.nearDupKeepSet(docs(s, d))
      .orderBy(col("doc_id"))),
    // gate-side orderBy: the operators return UNORDERED pair sets (a
    // production run never pays a global sort of the output); the sort
    // here exists only for the deterministic oracle compare
    "dd_jaccard_pairs" -> ((s, d) => Dedup.jaccardPairs(docs(s, d), n = 5, threshold = 0.5)
      .orderBy(col("a"), col("b"))),
    "dd_lsh_pairs" -> ((s, d) => Dedup.lshCandidatePairs(docs(s, d), n = 5, nHashes = 8, bands = 4)
      .orderBy(col("a"), col("b"))),
    "dd_simhash" -> ((s, d) => Dedup.simhash(docs(s, d), bits = 16)),
    "dd_embcos_pairs" -> ((s, d) => Dedup.embeddingCosPairs(embs(s, d), planes = 8, tau = 0.35)),
    "dd_embcos_keep" -> ((s, d) => Dedup.embeddingKeepSet(embs(s, d), planes = 8, tau = 0.35)
      .orderBy(col("vec_id"))),
    "sim_cosine_topk" -> ((s, d) => Similarity.cosineTopK(embs(s, d), queryId = 0L, k = 10)),
    "sim_lsh_buckets" -> ((s, d) => Similarity.lshBuckets(embs(s, d), planes = 8)),
    "sim_lsh_pairs" -> ((s, d) => Similarity.lshPairs(embs(s, d), planes = 8, tau = 0.3)),
    "sim_ivf_cells" -> ((s, d) => Similarity.ivfAssign(embs(s, d), nCells = 16)),
    "sim_ivf_topk" -> ((s, d) => Similarity.ivfTopK(embs(s, d), queryId = 42L, k = 10)),
    "ta_langid" -> ((s, d) => TextAnalysis.langId(docs(s, d))),
    "ta_quality" -> ((s, d) => TextAnalysis.quality(docs(s, d))),
    "ta_tokcount" -> ((s, d) => TextAnalysis.tokenCounts(docs(s, d))),
    "ta_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(docs(s, d))),
    "mm_decode_meta" -> ((s, d) =>
      Multimodal.decodeMeta(WebCorpus.fromDocuments(s, d)).toDF()
        .select(col("url"), col("n_bytes"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), col("n_frames").cast("long").as("n_frames"),
          col("format"))),
    "mm_frames" -> ((s, d) =>
      Multimodal.sampleFrames(Multimodal.decodeMeta(WebCorpus.fromDocuments(s, d)), stride = 2)
        .select(col("url"), col("n_frames").cast("long").as("n_frames"),
          col("frame_idx").cast("long").as("frame_idx"))),
    "st_window_agg" -> ((s, d) => Events.streamWindowAgg(s, d)),
    "st_sessions" -> ((s, d) => Events.sessionize(s.read.parquet(s"$d/events.parquet"))),
    "st_dedup" -> ((s, d) => Events.streamDedupCounts(s, d)),
    "ta_repetition" -> ((s, d) => TextAnalysis.repetition(docs(s, d))),
    "ta_perplexity" -> ((s, d) => TextAnalysis.unigramPerplexity(docs(s, d))),
    "dd_url_keep" -> ((s, d) => Dedup.urlKeepLatest(urlVariantCorpus(s, d))
      .orderBy(col("doc_id"))),
    "dd_substr_spans" -> ((s, d) => Dedup.duplicatedSpans(docs(s, d), n = 4)
      .orderBy(col("doc_id"), col("span_start"))),
    "cu_audit" -> ((s, d) => Curation.audit(docs(s, d)).orderBy(col("doc_id"))),
    // eval set = every 50th doc's full text, i.e. deliberately leaked
    // benchmark items: those docs (and any near-dups sharing a 5-gram)
    // must come back flagged
    "cu_decontam" -> ((s, d) => Curation.contamination(
        docs(s, d), docs(s, d).filter(col("doc_id") % 50 === 0), n = 5)
      .orderBy(col("doc_id"))),
    "ta_pii" -> ((s, d) => TextAnalysis.pii(piiCorpus(s, d)).orderBy(col("doc_id"))),
    "sim_kmeans_cells" -> ((s, d) => Similarity.kmeansAssign(embs(s, d), k = 8, iters = 2)),
    "cu_audit_full" -> ((s, d) => Curation.auditFull(docs(s, d), maxPerplexity = 30.0)
      .orderBy(col("doc_id"))),
    "dd_substr_scrub" -> ((s, d) => Dedup.scrubSpans(docs(s, d), n = 4)
      .orderBy(col("doc_id"))),
    "dd_substr_keepone" -> ((s, d) => Dedup.scrubSpansKeepOne(docs(s, d), n = 4)
      .orderBy(col("doc_id"))),
    "cu_sample_mix" -> ((s, d) => Curation.sampleByWeight(docs(s, d),
      SampleMixWeights.toMap, defaultFrac = SampleMixDefault)
      .orderBy(col("doc_id"))),
    "cu_pack" -> ((s, d) => Curation.packByBudget(docs(s, d),
      budget = 512, bucketSize = 64).orderBy(col("doc_id"))),
    "cu_split" -> ((s, d) => Curation.splitAssign(docs(s, d),
      valFrac = SplitValFrac, testFrac = SplitTestFrac).orderBy(col("doc_id"))),
    "cu_thresholds" -> ((s, d) => Curation.qualityThresholds(docs(s, d))
      .orderBy(col("lang_pred"))),
    "ta_top_bigrams" -> ((s, d) => TextAnalysis.topNgrams(docs(s, d), n = 2, k = 20)),
    "ta_tfidf" -> ((s, d) => TextAnalysis.tfidfTopTerms(docs(s, d), k = 3)
      .orderBy(col("doc_id"), col("rk"))),
    "cu_chunks" -> ((s, d) => Curation.chunkByTokens(docs(s, d),
      maxTokens = 10, overlap = 2).orderBy(col("doc_id"), col("chunk_id")))
  )

  /** Train/val/test split gate fractions (10% val, 10% test). */
  private val SplitValFrac = 0.1
  private val SplitTestFrac = 0.1

  /** Mixture-sampling gate weights: full keep, half, quarter, drop, and a
    * 10% default for the other sixteen sources.
    */
  private val SampleMixWeights =
    Seq("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.0)
  private val SampleMixDefault = 0.1

  /** Corpus with deterministic PII appended (the synthetic documents carry
    * none): every doc gains exactly one email / phone / IPv4 by doc_id
    * residue, so detection counts and the redacted hash are predictable.
    */
  private def piiCorpus(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
        .when(col("doc_id") % 3 === 1, lit(" call 555-867-5309"))
        .otherwise(concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7")))
      ).as("text"))

  /** Crawl-style URL-variant corpus for the `dd_url_keep` gate: every page
    * appears twice — once under its canonical synthetic URL, once under a
    * noisy re-fetch one second later (uppercase scheme, `www.`, trailing
    * slash, `utm_` tracking param, fragment). `Dedup.canonicalUrl` must
    * map both to the same key and the re-fetch must win.
    */
  private def urlVariantCorpus(s: SparkSession, d: String): DataFrame = {
    val c = WebCorpus.fromDocuments(s, d)
      .select(col("url"), col("warc_ts"), col("doc_id"))
    val variant = c.select(
      concat(lit("HTTP://www."), regexp_replace(col("url"), "^https://", ""),
        lit("/?utm_source=feed#frag")).as("url"),
      (col("warc_ts") + expr("INTERVAL 1 SECOND")).as("warc_ts"),
      (col("doc_id") + lit(1000000L)).as("doc_id"))
    c.unionByName(variant)
  }

  // ---- oracle SQL ----

  /** doc -> ordered token list CTEs (shared with Oracles.BaseCtes shape). */
  private val ShinglesCtes: String =
    s"""${Oracles.BaseCtes}, doc_toks AS (
       |  SELECT doc_id, list(term ORDER BY pos) AS toks FROM toks GROUP BY 1
       |), sh AS (
       |  SELECT DISTINCT doc_id,
       |         toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4] AS shingle
       |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i FROM doc_toks)
       |)""".stripMargin

  private def simhashSql: String = {
    val sums = (0 until 16).map { j =>
      val bit = s"((CAST('0x' || substr(md5(term), ${j / 4 + 1}, 1) AS INT) >> ${3 - j % 4}) & 1)"
      s"sum(tf * ($bit * 2 - 1)) AS s$j"
    }.mkString(", ")
    val combine = (0 until 16).map { j =>
      s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString(" + ")
    s"""${Oracles.BaseCtes}, sums AS (
       |  SELECT doc_id, $sums FROM dt GROUP BY doc_id
       |) SELECT doc_id, CAST($combine AS BIGINT) AS simhash FROM sums""".stripMargin
  }

  /** LSH candidate pairs as a reusable CTE chain (ends with `pairs`). */
  private val LshPairsCtes: String =
    s"""$ShinglesCtes, mh AS (
       |  SELECT doc_id, gi.i,
       |         min(md5(CAST(gi.i AS VARCHAR) || ':' || shingle)) AS mh
       |  FROM sh, (SELECT unnest(range(0, 8)) AS i) gi GROUP BY 1, 2
       |), bandsig AS (
       |  SELECT doc_id, CAST(i // 2 AS INT) AS band,
       |         md5(string_agg(mh, ',' ORDER BY i)) AS bsig
       |  FROM mh GROUP BY 1, 2
       |), pairs AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bandsig x JOIN bandsig y ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id
       |)""".stripMargin

  /** Connected components over `pairs` via a recursive reachability CTE
    * (mirrors Dedup.duplicateClusters' min-label fixpoint). */
  private val ClustersCtes: String =
    s"""$LshPairsCtes, edges AS (
       |  SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs
       |), reach (x, r) AS (
       |  SELECT x, x FROM (SELECT DISTINCT x FROM edges)
       |  UNION
       |  SELECT e.x, reach.r FROM edges e JOIN reach ON e.y = reach.x
       |), clusters AS (
       |  SELECT x, min(r) AS c FROM reach GROUP BY x
       |)""".stripMargin.replaceFirst("^WITH ", "WITH RECURSIVE ")

  private val EmbExpCtes: String =
    """WITH exp AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM exp GROUP BY 1
      |)""".stripMargin

  /** Sign-LSH bucketed cosine pairs as a reusable CTE chain, ending with
    * `cospairs(a, b, cos)` where a < b and cos >= tau (mirrors
    * Similarity.lshPairs / Dedup.embeddingCosPairs).
    */
  private def embCosPairsCtes(tau: Double): String =
    s"""$EmbExpCtes, b AS (
       |  SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(${
      (0 until 8).map(j => s"(CASE WHEN embedding[${j + 1}] > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    } AS BIGINT) AS bucket FROM embeddings
       |), pairs AS (
       |  SELECT x.vec_id AS a, y.vec_id AS b FROM b x JOIN b y USING (bucket) WHERE x.vec_id < y.vec_id
       |), dots AS (
       |  SELECT p.a, p.b, sum(ea.x * eb.x) AS dot
       |  FROM pairs p JOIN exp ea ON ea.vec_id = p.a JOIN exp eb ON eb.vec_id = p.b AND ea.i = eb.i
       |  GROUP BY 1, 2
       |), cospairs AS (
       |  SELECT d.a, d.b, round(d.dot / (na.nrm * nb.nrm), 4) AS cos
       |  FROM dots d JOIN norms na ON na.vec_id = d.a JOIN norms nb ON nb.vec_id = d.b
       |  WHERE round(d.dot / (na.nrm * nb.nrm), 4) >= $tau
       |)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "dd_exact" ->
      """SELECT md5(text) AS text_hash, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(min(doc_id) AS BIGINT) AS min_doc_id, CAST(max(doc_id) AS BIGINT) AS max_doc_id
        |FROM documents GROUP BY 1 HAVING count(*) > 1""".stripMargin,
    "dd_jaccard_pairs" ->
      s"""$ShinglesCtes, shc AS (
         |  SELECT * FROM sh WHERE shingle IN (
         |    SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1000)
         |), sizes AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS ns FROM shc GROUP BY 1
         |), common AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS common
         |  FROM shc x JOIN shc y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT c.a, c.b, round(CAST(c.common AS DOUBLE) / (sa.ns + sb.ns - c.common), 4) AS jaccard
         |FROM common c JOIN sizes sa ON sa.doc_id = c.a JOIN sizes sb ON sb.doc_id = c.b
         |WHERE CAST(c.common AS DOUBLE) / (sa.ns + sb.ns - c.common) >= 0.5
         |ORDER BY a, b""".stripMargin,
    "dd_lsh_pairs" ->
      s"""$LshPairsCtes SELECT a, b FROM pairs ORDER BY a, b""",
    "dd_keep" ->
      """SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,
    "dd_clusters" ->
      s"""$ClustersCtes
         |SELECT x AS doc_id, CAST(c AS BIGINT) AS cluster
         |FROM clusters ORDER BY doc_id""".stripMargin,
    "dd_keepset" ->
      s"""$ClustersCtes, keep1 AS (
         |  SELECT CAST(min(x) AS BIGINT) AS doc_id FROM clusters GROUP BY c
         |), unpaired AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
         |  WHERE doc_id NOT IN (SELECT x FROM clusters)
         |)
         |SELECT doc_id FROM keep1 UNION ALL SELECT doc_id FROM unpaired
         |ORDER BY doc_id""".stripMargin,
    "dd_simhash" -> simhashSql,
    "sim_cosine_topk" ->
      s"""$EmbExpCtes, q AS (SELECT i, x AS y FROM exp WHERE vec_id = 0),
         |dots AS (
         |  SELECT e.vec_id, sum(e.x * q.y) AS dot
         |  FROM exp e JOIN q USING (i) WHERE e.vec_id <> 0 GROUP BY 1
         |)
         |SELECT d.vec_id, round(d.dot / (n.nrm * (SELECT nrm FROM norms WHERE vec_id = 0)), 4) AS cos
         |FROM dots d JOIN norms n USING (vec_id)
         |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin,
    "sim_lsh_buckets" ->
      ("SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(" +
        (0 until 8).map(j => s"(CASE WHEN embedding[${j + 1}] > 0 THEN ${1L << j} ELSE 0 END)")
          .mkString(" + ") +
        " AS BIGINT) AS bucket FROM embeddings"),
    "sim_lsh_pairs" ->
      s"""${embCosPairsCtes(0.3)}
         |SELECT a, b, cos FROM cospairs ORDER BY a, b""".stripMargin,
    "dd_embcos_pairs" ->
      s"""${embCosPairsCtes(0.35)}
         |SELECT a, b, cos FROM cospairs ORDER BY a, b""".stripMargin,
    "dd_embcos_keep" ->
      s"""${embCosPairsCtes(0.35)}, edges AS (
         |  SELECT a AS x, b AS y FROM cospairs UNION SELECT b, a FROM cospairs
         |), reach (x, r) AS (
         |  SELECT x, x FROM (SELECT DISTINCT x FROM edges)
         |  UNION
         |  SELECT e.x, reach.r FROM edges e JOIN reach ON e.y = reach.x
         |), clusters AS (
         |  SELECT x, min(r) AS c FROM reach GROUP BY x
         |), keep1 AS (
         |  SELECT CAST(min(x) AS BIGINT) AS vec_id FROM clusters GROUP BY c
         |), unpaired AS (
         |  SELECT CAST(vec_id AS BIGINT) AS vec_id FROM embeddings
         |  WHERE vec_id NOT IN (SELECT x FROM clusters)
         |)
         |SELECT vec_id FROM keep1 UNION ALL SELECT vec_id FROM unpaired
         |ORDER BY vec_id""".stripMargin.replaceFirst("^WITH ", "WITH RECURSIVE "),
    "sim_ivf_cells" ->
      s"""$EmbExpCtes, cids AS (
         |  SELECT DISTINCT vec_id FROM exp ORDER BY vec_id ASC LIMIT 16
         |), cexp AS (
         |  SELECT vec_id AS cid, i, x AS y FROM exp WHERE vec_id IN (SELECT vec_id FROM cids)
         |), cnorms AS (
         |  SELECT vec_id AS cid, nrm AS cnrm FROM norms WHERE vec_id IN (SELECT vec_id FROM cids)
         |), cos AS (
         |  SELECT e.vec_id, c.cid,
         |         round(sum(e.x * c.y) / (n.nrm * cn.cnrm), 6) AS cos
         |  FROM exp e JOIN cexp c USING (i)
         |  JOIN norms n ON n.vec_id = e.vec_id JOIN cnorms cn ON cn.cid = c.cid
         |  GROUP BY e.vec_id, c.cid, n.nrm, cn.cnrm
         |), rk AS (
         |  SELECT vec_id, cid,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rk
         |  FROM cos)
         |SELECT vec_id, CAST(cid AS BIGINT) AS cell FROM rk WHERE rk = 1""".stripMargin,
    "sim_ivf_topk" ->
      s"""$EmbExpCtes, cids AS (
         |  SELECT DISTINCT vec_id FROM exp ORDER BY vec_id ASC LIMIT 16
         |), cexp AS (
         |  SELECT vec_id AS cid, i, x AS y FROM exp WHERE vec_id IN (SELECT vec_id FROM cids)
         |), cnorms AS (
         |  SELECT vec_id AS cid, nrm AS cnrm FROM norms WHERE vec_id IN (SELECT vec_id FROM cids)
         |), cos AS (
         |  SELECT e.vec_id, c.cid,
         |         round(sum(e.x * c.y) / (n.nrm * cn.cnrm), 6) AS cos
         |  FROM exp e JOIN cexp c USING (i)
         |  JOIN norms n ON n.vec_id = e.vec_id JOIN cnorms cn ON cn.cid = c.cid
         |  GROUP BY e.vec_id, c.cid, n.nrm, cn.cnrm
         |), assign AS (
         |  SELECT vec_id, cid AS cell FROM (
         |    SELECT vec_id, cid,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rk
         |    FROM cos) WHERE rk = 1
         |), qexp AS (SELECT i, x AS qx FROM exp WHERE vec_id = 42),
         |qnrm AS (SELECT nrm AS qnrm FROM norms WHERE vec_id = 42),
         |probed AS (
         |  SELECT c.cid AS cell FROM cexp c JOIN qexp USING (i)
         |  JOIN cnorms cn ON cn.cid = c.cid CROSS JOIN qnrm
         |  GROUP BY c.cid, cn.cnrm, qnrm
         |  ORDER BY round(sum(c.y * qx) / (cn.cnrm * qnrm), 6) DESC, c.cid ASC LIMIT 4
         |), cand AS (
         |  SELECT a.vec_id FROM assign a JOIN probed USING (cell) WHERE a.vec_id <> 42
         |)
         |SELECT e.vec_id, round(sum(e.x * q.qx) / (n.nrm * (SELECT qnrm FROM qnrm)), 4) AS cos
         |FROM exp e JOIN cand USING (vec_id) JOIN qexp q USING (i)
         |JOIN norms n ON n.vec_id = e.vec_id
         |GROUP BY e.vec_id, n.nrm
         |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin,
    "ta_langid" -> {
      val langs = TextAnalysis.LangMarkers.toSeq.sortBy(_._1)
      val scoreCols = langs.map { case (l, toks) =>
        toks.map(t => s"len(regexp_extract_all(lower(text), '\\b$t\\b'))").mkString(" + ") +
          s" AS score_$l"
      }.mkString(", ")
      // argmax, first-lexicographic lang wins ties (== the Scala fold where
      // only a strictly greater score replaces the incumbent)
      val m = "greatest(" + langs.map(l => s"score_${l._1}").mkString(", ") + ")"
      val pick = langs.map(_._1).map(l => s"WHEN score_$l = m THEN '$l'").mkString(" ")
      s"""WITH s AS (SELECT doc_id, $scoreCols FROM documents),
         |b AS (SELECT doc_id, $m AS m, * FROM s)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |       CASE WHEN m = 0 THEN 'und' $pick END AS lang_pred,
         |       CAST(m AS BIGINT) AS n_markers
         |FROM b""".stripMargin
    },
    "ta_quality" -> {
      val sep = Oracles.SepClass
      val stop = Seq("the", "a", "of")
        .map(t => s"len(regexp_extract_all(lower(text), '\\b$t\\b'))").mkString(" + ")
      s"""WITH m AS (
         |  SELECT doc_id,
         |    len(list_filter(regexp_split_to_array(text, '$sep'), t -> t <> '')) AS n_tokens,
         |    length(text) AS n_chars,
         |    ($stop) AS n_stop,
         |    length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha
         |  FROM documents)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |  CAST(n_tokens AS BIGINT) AS n_tokens, CAST(n_chars AS BIGINT) AS n_chars,
         |  round(CAST(n_chars AS DOUBLE) / greatest(n_tokens, 1), 4) AS mean_tok_len,
         |  round(CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1), 4) AS stopword_ratio,
         |  round(CAST(n_alpha AS DOUBLE) / greatest(n_chars, 1), 4) AS alpha_ratio,
         |  round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
         |      + (1.0 - least(CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1), 1.0)) * 0.25
         |      + (CAST(n_alpha AS DOUBLE) / greatest(n_chars, 1)) * 0.25, 4) AS quality
         |FROM m""".stripMargin
    },
    "ta_tokcount" -> {
      val sep = Oracles.SepClass
      s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |  CAST(len(list_filter(regexp_split_to_array(text, ' +'), t -> t <> '')) AS BIGINT) AS n_ws,
         |  CAST(len(list_filter(regexp_split_to_array(text, '$sep+'), t -> t <> '')) AS BIGINT) AS n_ref,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe
         |FROM documents""".stripMargin
    },
    "ta_fingerprint" ->
      s"""${Oracles.BaseCtes}
         |SELECT doc_id,
         |  CAST(sum((pos + 1) * CAST('0x' || substr(md5(term), 1, 8) AS BIGINT)) % 1000000007 AS BIGINT) AS fingerprint
         |FROM toks GROUP BY doc_id""".stripMargin,
    // one REAL stock-JDK-decoded format per html-length mod-4 class:
    // 0 -> PNG via javax.imageio (Multimodal.makePng: n_bytes = 68 +
    // height*(1 + 3*width), dims from the html length); 2 -> baseline
    // JPEG (Multimodal.makeJpeg: constant 155 bytes, imageio format name
    // 'JPEG' lowercased); 1 -> PCM WAV via javax.sound.sampled
    // (Multimodal.makeWav: n_bytes = 44 + frames*channels*2; width/
    // height carry sample-rate/channels, type name 'WAVE' lowercased);
    // 3 -> an AVI container (Multimodal.makeAvi: constant 88 bytes) whose
    // RIFF avih header really parses to the rule's dims + 5 frames
    "mm_decode_meta" ->
      """WITH m AS (
        |  SELECT 'https://example.org/' || source || '/doc/' || doc_id AS url,
        |         33 + octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT url,
        |  CAST(CASE n % 4
        |       WHEN 0 THEN 68 + ((n // 64) % 64 + 1) * (1 + 3 * (n % 64 + 1))
        |       WHEN 2 THEN 155
        |       WHEN 1 THEN 44 + (n % 64 + 1) * ((n // 4) % 2 + 1) * 2
        |       ELSE 88 END AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN n % 4 = 1 THEN 8000 + (n % 8) * 1000
        |       ELSE n % 64 + 1 END AS BIGINT) AS width,
        |  CAST(CASE WHEN n % 4 = 1 THEN (n // 4) % 2 + 1
        |       ELSE (n // 64) % 64 + 1 END AS BIGINT) AS height,
        |  CAST(CASE n % 4 WHEN 1 THEN n % 64 + 1
        |       WHEN 3 THEN 5 ELSE 1 END AS BIGINT) AS n_frames,
        |  CASE n % 4 WHEN 0 THEN 'png' WHEN 2 THEN 'jpeg'
        |       WHEN 1 THEN 'wave' ELSE 'avi' END AS format
        |FROM m""".stripMargin,
    "mm_frames" ->
      """WITH m AS (
        |  SELECT 'https://example.org/' || source || '/doc/' || doc_id AS url,
        |         33 + octet_length(encode(text)) AS n
        |  FROM documents), mf AS (
        |  SELECT url, CASE n % 4 WHEN 1 THEN n % 64 + 1
        |              WHEN 3 THEN 5 ELSE 1 END AS nf
        |  FROM m)
        |SELECT url, CAST(nf AS BIGINT) AS n_frames, CAST(unnest(range(0, nf, 2)) AS BIGINT) AS frame_idx
        |FROM mf ORDER BY url, frame_idx""".stripMargin,
    "st_window_agg" ->
      """SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS win_start, event_type,
        |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "st_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_no
        |  FROM o)
        |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       min(ts) AS session_start, max(ts) AS session_end
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // doubled delivery collapsed by streaming dedup == plain batch counts
    "st_dedup" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "ta_repetition" ->
      s"""${Oracles.BaseCtes},
         |uc AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
         |ua AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |       CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_u
         |       FROM uc GROUP BY 1),
         |bg AS (SELECT doc_id,
         |       term || ' ' || lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
         |       FROM toks),
         |bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg
         |       WHERE bigram IS NOT NULL GROUP BY 1, 2),
         |ba AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
         |       CAST(max(c) AS BIGINT) AS top_c,
         |       CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_b
         |       FROM bc GROUP BY 1)
         |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
         |  COALESCE(ua.n_tokens, 0) AS n_tokens,
         |  round(CAST(COALESCE(ua.dup_u, 0) AS DOUBLE) / greatest(COALESCE(ua.n_tokens, 0), 1), 4) AS dup_word_frac,
         |  COALESCE(ba.n_bigrams, 0) AS n_bigrams,
         |  round(CAST(COALESCE(ba.top_c, 0) AS DOUBLE) / greatest(COALESCE(ba.n_bigrams, 0), 1), 4) AS top_bigram_frac,
         |  round(CAST(COALESCE(ba.dup_b, 0) AS DOUBLE) / greatest(COALESCE(ba.n_bigrams, 0), 1), 4) AS dup_bigram_frac
         |FROM documents d
         |LEFT JOIN ua ON d.doc_id = ua.doc_id
         |LEFT JOIN ba ON d.doc_id = ba.doc_id""".stripMargin,
    "ta_perplexity" ->
      s"""${Oracles.BaseCtes},
         |cfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS c FROM toks GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM toks),
         |p AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |      round(exp(avg(-ln(c / t))), 4) AS perplexity
         |      FROM toks JOIN cfs USING (term) CROSS JOIN tot GROUP BY doc_id)
         |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
         |  COALESCE(p.n_tokens, 0) AS n_tokens,
         |  COALESCE(p.perplexity, 0.0) AS perplexity
         |FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id""".stripMargin,
    "dd_url_keep" ->
      """WITH v AS (
        |  SELECT 'https://example.org/' || source || '/doc/' || doc_id AS url,
        |         CAST(doc_id AS BIGINT) AS ts_ord, CAST(doc_id AS BIGINT) AS doc_id
        |  FROM documents
        |  UNION ALL
        |  SELECT 'HTTP://www.example.org/' || source || '/doc/' || doc_id
        |           || '/?utm_source=feed#frag' AS url,
        |         CAST(doc_id + 1 AS BIGINT) AS ts_ord,
        |         CAST(doc_id + 1000000 AS BIGINT) AS doc_id
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, ts_ord,
        |    regexp_replace(url, '(?i)^[a-z][a-z0-9+.-]*://', '') AS s1,
        |    lower(regexp_extract(s1, '^([^/]*)', 1)) || regexp_replace(s1, '^[^/]*', '') AS s2,
        |    regexp_replace(s2, '^www\.', '') AS s3,
        |    regexp_replace(s3, '#.*$', '') AS s4,
        |    regexp_replace(s4, '([?&])utm_[^&#]*', '\1', 'g') AS s5,
        |    regexp_replace(regexp_replace(s5, '\?&+', '?', 'g'), '&{2,}', '&', 'g') AS s6,
        |    regexp_replace(s6, '[?&]+$', '') AS s7,
        |    regexp_replace(s7, '/index\.html?$', '/') AS s8,
        |    regexp_replace(s8, '/$', '') AS canon_url
        |  FROM v
        |), r AS (
        |  SELECT canon_url, doc_id,
        |    row_number() OVER (PARTITION BY canon_url ORDER BY ts_ord DESC, doc_id DESC) AS rk,
        |    CAST(count(*) OVER (PARTITION BY canon_url) AS BIGINT) AS n_versions
        |  FROM c)
        |SELECT canon_url, doc_id, n_versions FROM r WHERE rk = 1""".stripMargin,
    "dd_substr_spans" ->
      s"""${Oracles.BaseCtes},
         |sh AS (SELECT doc_id, pos,
         |  array_to_string(list(term) OVER (PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING), ' ') AS g,
         |  len(list(term) OVER (PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)) AS glen
         |  FROM toks),
         |f AS (SELECT doc_id, pos, md5(g) AS g FROM sh WHERE glen = 4),
         |dup AS (SELECT g FROM f GROUP BY g HAVING count(*) > 1),
         |hits AS (SELECT doc_id, pos FROM f WHERE g IN (SELECT g FROM dup)),
         |isl AS (SELECT doc_id, pos,
         |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |        FROM hits)
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         |       CAST(max(pos) + 3 AS BIGINT) AS span_end,
         |       CAST(max(pos) - min(pos) + 4 AS BIGINT) AS span_tokens
         |FROM isl GROUP BY doc_id, grp""".stripMargin,
    // 5-gram decontamination vs the leaked eval set (doc_id % 50 = 0):
    // the gram window mirrors dd_substr_spans' list-window construction
    "cu_decontam" ->
      s"""${Oracles.BaseCtes},
         |gr AS (SELECT doc_id, pos,
         |  md5(array_to_string(list(term) OVER (PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING), ' ')) AS g,
         |  len(list(term) OVER (PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)) AS glen
         |  FROM toks),
         |g5 AS (SELECT doc_id, pos, g FROM gr WHERE glen = 5),
         |ev AS (SELECT DISTINCT g FROM g5 WHERE doc_id % 50 = 0),
         |t AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM g5 GROUP BY 1),
         |h AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit
         |      FROM g5 WHERE g IN (SELECT g FROM ev) GROUP BY 1)
         |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
         |  COALESCE(t.n_grams, 0) AS n_grams,
         |  COALESCE(h.n_hit, 0) AS n_hit,
         |  CAST(CASE WHEN COALESCE(h.n_hit, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
         |FROM documents d
         |LEFT JOIN t ON d.doc_id = t.doc_id
         |LEFT JOIN h ON d.doc_id = h.doc_id""".stripMargin,
    // same RE2-safe patterns, same fixed redaction order (email, IP, phone)
    "ta_pii" ->
      s"""WITH p AS (
         |  SELECT doc_id, text || CASE
         |    WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
         |    WHEN doc_id % 3 = 1 THEN ' call 555-867-5309'
         |    ELSE ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' END AS text
         |  FROM documents)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |  CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailRe}')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(text, '${TextAnalysis.PhoneRe}')) AS BIGINT) AS n_phone,
         |  CAST(len(regexp_extract_all(text, '${TextAnalysis.Ipv4Re}')) AS BIGINT) AS n_ip,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |    '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
         |    '${TextAnalysis.Ipv4Re}', '<IP>', 'g'),
         |    '${TextAnalysis.PhoneRe}', '<PHONE>', 'g')) AS redacted_hash
         |FROM p""".stripMargin,
    // two unrolled Lloyd iterations (init = first 8 vec_ids, every cosine
    // and centroid component rounded to 6dp), then the final assignment
    "sim_kmeans_cells" -> {
      def iterCtes(t: Int): String =
        s"""cn$t AS (SELECT cid, sqrt(sum(y * y)) AS cnrm FROM c$t GROUP BY 1),
           |cos$t AS (
           |  SELECT e.vec_id, c.cid, round(sum(e.x * c.y) / (n.nrm * cn.cnrm), 6) AS cos
           |  FROM exp e JOIN c$t c USING (i)
           |  JOIN norms n ON n.vec_id = e.vec_id JOIN cn$t cn ON cn.cid = c.cid
           |  GROUP BY e.vec_id, c.cid, n.nrm, cn.cnrm),
           |a$t AS (SELECT vec_id, cid FROM (
           |  SELECT vec_id, cid,
           |         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rk
           |  FROM cos$t) WHERE rk = 1),
           |c${t + 1} AS (SELECT a.cid, e.i, round(avg(e.x), 6) AS y
           |  FROM exp e JOIN a$t a USING (vec_id) GROUP BY 1, 2)""".stripMargin
      s"""$EmbExpCtes, c0 AS (
         |  SELECT vec_id AS cid, i, round(x, 6) AS y FROM exp
         |  WHERE vec_id IN (SELECT DISTINCT vec_id FROM exp ORDER BY vec_id ASC LIMIT 8)),
         |${iterCtes(0)},
         |${iterCtes(1)},
         |${iterCtes(2)}
         |SELECT vec_id, CAST(cid AS BIGINT) AS cell FROM a2""".stripMargin
    },
    "cu_audit" -> s"""$auditOracleCtes
         |SELECT CAST(tl.doc_id AS BIGINT) AS doc_id,
         |  CAST(CASE WHEN tl.nt >= 20 THEN 1 ELSE 0 END AS BIGINT) AS pass_len,
         |  CAST(CASE WHEN lp.lang_pred = 'en' THEN 1 ELSE 0 END AS BIGINT) AS pass_lang,
         |  CAST(CASE WHEN rep.dbf <= 0.1 THEN 1 ELSE 0 END AS BIGINT) AS pass_rep,
         |  CAST(cn.is_can AS BIGINT) AS is_canonical,
         |  CAST(CASE WHEN tl.nt >= 20 AND lp.lang_pred = 'en' AND rep.dbf <= 0.1
         |            AND cn.is_can = 1 THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM tl
         |JOIN lp ON tl.doc_id = lp.doc_id
         |JOIN rep ON tl.doc_id = rep.doc_id
         |JOIN cn ON tl.doc_id = cn.doc_id""".stripMargin,
    // the audit plus the round-4 signals: unigram-LM perplexity and PII
    "cu_audit_full" ->
      s"""$auditOracleCtes,
         |cfs2 AS (SELECT term, CAST(count(*) AS DOUBLE) AS c FROM toks GROUP BY 1),
         |tot2 AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM toks),
         |pq AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nt2,
         |       round(exp(avg(-ln(c / t))), 4) AS ppl
         |       FROM toks JOIN cfs2 USING (term) CROSS JOIN tot2 GROUP BY doc_id),
         |pfl AS (SELECT d.doc_id,
         |        CASE WHEN COALESCE(pq.nt2, 0) > 0 AND COALESCE(pq.ppl, 0) <= 30.0
         |             THEN 1 ELSE 0 END AS pass_ppl
         |        FROM documents d LEFT JOIN pq ON d.doc_id = pq.doc_id),
         |pix AS (SELECT doc_id,
         |        CASE WHEN len(regexp_extract_all(text, '${TextAnalysis.EmailRe}'))
         |                + len(regexp_extract_all(text, '${TextAnalysis.PhoneRe}'))
         |                + len(regexp_extract_all(text, '${TextAnalysis.Ipv4Re}')) = 0
         |             THEN 1 ELSE 0 END AS pass_pii
         |        FROM documents)
         |SELECT CAST(tl.doc_id AS BIGINT) AS doc_id,
         |  CAST(CASE WHEN tl.nt >= 20 THEN 1 ELSE 0 END AS BIGINT) AS pass_len,
         |  CAST(CASE WHEN lp.lang_pred = 'en' THEN 1 ELSE 0 END AS BIGINT) AS pass_lang,
         |  CAST(CASE WHEN rep.dbf <= 0.1 THEN 1 ELSE 0 END AS BIGINT) AS pass_rep,
         |  CAST(pfl.pass_ppl AS BIGINT) AS pass_ppl,
         |  CAST(pix.pass_pii AS BIGINT) AS pass_pii,
         |  CAST(cn.is_can AS BIGINT) AS is_canonical,
         |  CAST(CASE WHEN tl.nt >= 20 AND lp.lang_pred = 'en' AND rep.dbf <= 0.1
         |            AND pfl.pass_ppl = 1 AND pix.pass_pii = 1
         |            AND cn.is_can = 1 THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM tl
         |JOIN lp ON tl.doc_id = lp.doc_id
         |JOIN rep ON tl.doc_id = rep.doc_id
         |JOIN pfl ON tl.doc_id = pfl.doc_id
         |JOIN pix ON tl.doc_id = pix.doc_id
         |JOIN cn ON tl.doc_id = cn.doc_id""".stripMargin,
    // the scrub half of exact-substring dedup: every token inside a
    // duplicated 4-token span is dropped, all occurrences
    "dd_substr_scrub" ->
      s"""${Oracles.BaseCtes},
         |sh AS (SELECT doc_id, pos,
         |  array_to_string(list(term) OVER (PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING), ' ') AS g,
         |  len(list(term) OVER (PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)) AS glen
         |  FROM toks),
         |f AS (SELECT doc_id, pos, md5(g) AS g FROM sh WHERE glen = 4),
         |dup AS (SELECT g FROM f GROUP BY g HAVING count(*) > 1),
         |hits AS (SELECT doc_id, pos FROM f WHERE g IN (SELECT g FROM dup)),
         |isl AS (SELECT doc_id, pos,
         |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |        FROM hits),
         |spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 3 AS e
         |          FROM isl GROUP BY doc_id, grp),
         |k AS (SELECT t.doc_id, t.pos, t.term FROM toks t
         |      WHERE NOT EXISTS (SELECT 1 FROM spans s
         |        WHERE s.doc_id = t.doc_id AND t.pos BETWEEN s.s AND s.e)),
         |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |      string_agg(term, ' ' ORDER BY pos) AS joined FROM k GROUP BY 1),
         |tt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens FROM toks GROUP BY 1)
         |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
         |  COALESCE(tt.n_tokens, 0) AS n_tokens,
         |  COALESCE(tt.n_tokens, 0) - COALESCE(a.n_kept, 0) AS n_dropped,
         |  md5(COALESCE(a.joined, '')) AS scrubbed_hash
         |FROM documents d
         |LEFT JOIN tt ON d.doc_id = tt.doc_id
         |LEFT JOIN a ON d.doc_id = a.doc_id""".stripMargin,
    // keep-one exact-substring scrub: the same chain, minus each
    // duplicated gram's CANONICAL (globally first by (doc_id, pos))
    // occurrence, which survives
    "dd_substr_keepone" ->
      s"""${Oracles.BaseCtes},
         |sh AS (SELECT doc_id, pos,
         |  array_to_string(list(term) OVER (PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING), ' ') AS g,
         |  len(list(term) OVER (PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)) AS glen
         |  FROM toks),
         |f AS (SELECT doc_id, pos, md5(g) AS g FROM sh WHERE glen = 4),
         |dup AS (SELECT g FROM f GROUP BY g HAVING count(*) > 1),
         |df2 AS (SELECT doc_id, pos, g,
         |        row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
         |        FROM f WHERE g IN (SELECT g FROM dup)),
         |hits AS (SELECT doc_id, pos FROM df2 WHERE rn > 1),
         |isl AS (SELECT doc_id, pos,
         |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |        FROM hits),
         |spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 3 AS e
         |          FROM isl GROUP BY doc_id, grp),
         |k AS (SELECT t.doc_id, t.pos, t.term FROM toks t
         |      WHERE NOT EXISTS (SELECT 1 FROM spans s
         |        WHERE s.doc_id = t.doc_id AND t.pos BETWEEN s.s AND s.e)),
         |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |      string_agg(term, ' ' ORDER BY pos) AS joined FROM k GROUP BY 1),
         |tt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens FROM toks GROUP BY 1)
         |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
         |  COALESCE(tt.n_tokens, 0) AS n_tokens,
         |  COALESCE(tt.n_tokens, 0) - COALESCE(a.n_kept, 0) AS n_dropped,
         |  md5(COALESCE(a.joined, '')) AS scrubbed_hash
         |FROM documents d
         |LEFT JOIN tt ON d.doc_id = tt.doc_id
         |LEFT JOIN a ON d.doc_id = a.doc_id""".stripMargin,
    "cu_sample_mix" -> sampleMixOracle,
    // deterministic split: same salted-md5 coin, thresholds rendered by
    // the SAME Scala function the operator uses
    "cu_split" -> splitOracle,
    // per-language exact token-length percentiles; DuckDB quantile_cont
    // and Spark's percentile share the linear-interpolation convention
    "cu_thresholds" ->
      s"""$auditOracleCtes
         |SELECT lp.lang_pred, CAST(count(*) AS BIGINT) AS n_docs,
         |  round(quantile_cont(tl.nt, 0.1), 4) AS p10,
         |  round(quantile_cont(tl.nt, 0.5), 4) AS p50,
         |  round(quantile_cont(tl.nt, 0.9), 4) AS p90
         |FROM tl JOIN lp ON tl.doc_id = lp.doc_id
         |GROUP BY 1""".stripMargin,
    // corpus-wide top-20 bigrams, deterministic tie-break (count desc,
    // gram asc) so the k-th boundary is engine-independent
    "ta_top_bigrams" ->
      s"""${Oracles.BaseCtes},
         |bg AS (SELECT doc_id,
         |  term || ' ' || lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS g
         |  FROM toks)
         |SELECT g AS gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_occurrences
         |FROM bg WHERE g IS NOT NULL GROUP BY 1
         |ORDER BY n_occurrences DESC, gram ASC LIMIT 20""".stripMargin,
    // per-doc top-k TF-IDF keywords: tfidf = tf * ln(N / df), rounded to
    // 4dp BEFORE the (tfidf desc, term asc) rank -- BaseCtes already
    // carries dt/dfs/st
    "ta_tfidf" ->
      s"""${Oracles.BaseCtes},
         |ti AS (
         |  SELECT dt.doc_id, dt.term,
         |         round(dt.tf * ln(CAST(st.n AS DOUBLE) / dfs.df), 4) AS tfidf
         |  FROM dt JOIN dfs USING (term) CROSS JOIN st
         |), rk AS (
         |  SELECT doc_id, term, tfidf,
         |         CAST(row_number() OVER (
         |           PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rk
         |  FROM ti)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id, term, tfidf, rk
         |FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    // context-window chunking, maxTokens=10 overlap=2 -> stride 8: chunk
    // starts 0, 8, 16, ... stopping once a window reaches the doc's end
    // (1 + ceil(max(0, n-10)/8) chunks -- no redundant tail chunk fully
    // contained in the previous window); hash = md5 of the joined slice
    "cu_chunks" ->
      s"""${Oracles.BaseCtes},
         |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1),
         |starts AS (
         |  SELECT doc_id, n,
         |         unnest(range(0,
         |           1 + CAST(ceil(CAST(greatest(n - 10, 0) AS DOUBLE) / 8) AS BIGINT))) AS chunk_id
         |  FROM cnt WHERE n > 0
         |), chunks AS (
         |  SELECT s.doc_id, s.chunk_id, s.chunk_id * 8 AS start_pos,
         |         least(s.n - s.chunk_id * 8, 10) AS n_tokens,
         |         md5(string_agg(t.term, ' ' ORDER BY t.pos)) AS chunk_hash
         |  FROM starts s JOIN toks t ON t.doc_id = s.doc_id
         |    AND t.pos >= s.chunk_id * 8 AND t.pos < s.chunk_id * 8 + 10
         |  GROUP BY 1, 2, 3, 4)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |       CAST(start_pos AS BIGINT) AS start_pos,
         |       CAST(n_tokens AS BIGINT) AS n_tokens, chunk_hash
         |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin,
    // token-budget packing: shard = floor(prefix-sum-before-doc / budget);
    // the oracle's single global window IS the naive plan the Spark side
    // replaces with the two-level bucket prefix sum
    "cu_pack" ->
      s"""${Oracles.BaseCtes},
         |tl AS (SELECT d.doc_id, CAST(COALESCE(t.c, 0) AS BIGINT) AS n_tokens
         |       FROM documents d LEFT JOIN
         |         (SELECT doc_id, count(*) AS c FROM toks GROUP BY 1) t
         |       ON d.doc_id = t.doc_id),
         |p AS (SELECT doc_id, n_tokens,
         |      COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
         |      FROM tl)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens,
         |  CAST(floor(prior / 512.0) AS BIGINT) AS shard_id FROM p""".stripMargin
  )

  /** Oracle for the deterministic mixture sample: the same md5-u32
    * threshold compare, thresholds rendered by the SAME Scala function
    * the operator uses.
    */
  private def sampleMixOracle: String = {
    val cases = SampleMixWeights.map { case (g, f) =>
      s"WHEN '$g' THEN '${Curation.sampleThreshold(f)}'"
    }.mkString(" ")
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, source AS grp,
       |  CAST(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
       |    CASE source $cases
       |         ELSE '${Curation.sampleThreshold(SampleMixDefault)}' END
       |  THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM documents""".stripMargin
  }

  /** Oracle for the deterministic split: the salted-md5 coin against the
    * cumulative thresholds, both rendered by the operator's own functions.
    */
  private def splitOracle: String = {
    val coin = "substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8)"
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CASE WHEN $coin < '${Curation.sampleThreshold(SplitValFrac)}' THEN 'val'
       |       WHEN $coin < '${Curation.sampleThreshold(SplitValFrac + SplitTestFrac)}' THEN 'test'
       |       ELSE 'train' END AS split
       |FROM documents""".stripMargin
  }

  /** Shared audit CTE chain (token length, language argmax, bigram
    * repetition, exact-dup canonical) used by both audit oracles.
    */
  private def auditOracleCtes: String = {
    val langs = TextAnalysis.LangMarkers.toSeq.sortBy(_._1)
    val scoreCols = langs.map { case (l, toks) =>
      toks.map(t => s"len(regexp_extract_all(lower(text), '\\b$t\\b'))").mkString(" + ") +
        s" AS score_$l"
    }.mkString(", ")
    val m = "greatest(" + langs.map(l => s"score_${l._1}").mkString(", ") + ")"
    val pick = langs.map(_._1).map(l => s"WHEN score_$l = m THEN '$l'").mkString(" ")
    s"""${Oracles.BaseCtes},
       |tl AS (SELECT d.doc_id, CAST(COALESCE(t.c, 0) AS BIGINT) AS nt
       |       FROM documents d LEFT JOIN
       |         (SELECT doc_id, count(*) AS c FROM toks GROUP BY 1) t
       |       ON d.doc_id = t.doc_id),
       |ls AS (SELECT doc_id, $scoreCols FROM documents),
       |lb AS (SELECT doc_id, $m AS m, * FROM ls),
       |lp AS (SELECT doc_id, CASE WHEN m = 0 THEN 'und' $pick END AS lang_pred FROM lb),
       |bgc AS (SELECT doc_id,
       |        term || ' ' || lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
       |        FROM toks),
       |bcc AS (SELECT doc_id, bigram, count(*) AS c FROM bgc
       |        WHERE bigram IS NOT NULL GROUP BY 1, 2),
       |bac AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb,
       |        CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup
       |        FROM bcc GROUP BY 1),
       |rep AS (SELECT d.doc_id,
       |        round(CAST(COALESCE(b.dup, 0) AS DOUBLE) / greatest(COALESCE(b.nb, 0), 1), 4) AS dbf
       |        FROM documents d LEFT JOIN bac b ON d.doc_id = b.doc_id),
       |hx AS (SELECT doc_id, md5(text) AS h FROM documents),
       |cn AS (SELECT hx.doc_id,
       |       CASE WHEN hx.doc_id = mn.cdoc THEN 1 ELSE 0 END AS is_can
       |       FROM hx JOIN (SELECT h, min(doc_id) AS cdoc FROM hx GROUP BY 1) mn
       |       ON hx.h = mn.h)""".stripMargin
  }
}
