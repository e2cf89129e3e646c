package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator claimed done in SURVEY.md §2 has a `queries` entry here;
  * SQL-expressible ones also have a DuckDB oracle in `oracleSql`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * BM25 top-10 for a keyword over the web corpus.
    */
  def entry(spark: SparkSession): DataFrame =
    FtQueries.bm25Single(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
    }),
    "ft_termcounts" -> FtQueries.termCounts _,
    "ft_dictionary" -> FtQueries.dictionary _,
    "ft_postings" -> FtQueries.postings _,
    "ft_stats" -> FtQueries.stats _,
    "ft_bm25_single" -> FtQueries.bm25Single _,
    "ft_bm25_and" -> FtQueries.bm25And _,
    "ft_bm25_or" -> FtQueries.bm25Or _,
    "ft_bm25_not" -> FtQueries.bm25Not _,
    "ft_prefix_docs" -> FtQueries.prefixDocs _,
    "ft_completions" -> FtQueries.completions _,
    "ft_phrase" -> FtQueries.phrase _,
    "ft_proximity" -> FtQueries.proximity _,
    "ft_wordrange" -> FtQueries.wordRange _,
    "ft_joinblock" -> FtQueries.joinBlock _,
    "ft_or_max" -> FtQueries.bm25OrMax _,
    "ft_output_all" -> FtQueries.outputAll _,
    "ft_bm25_bydoc" -> FtQueries.bm25ByDoc _,
    "ft_completions_dc" -> FtQueries.completionsByDc _,
    "fc_counts" -> FtQueries.facetCounts _,
    "fc_filtered" -> FtQueries.facetCountsFiltered _,
    "fc_ordering" -> FtQueries.orderingRange _,
    "ix_decoded_postings" -> IndexQueries.decodedPostings _,
    "ix_wand_topk" -> IndexQueries.wandTopK _,
    "ix_prefix_docs" -> IndexQueries.prefixDocs _,
    "ixbp_prefix_docs" -> IndexQueries.bpPrefixDocs _,
    "ixbps_prefix_docs" -> IndexQueries.bpsPrefixDocs _,
    "xmlix_prefix_docs" -> IndexQueries.xmlPrefixDocs _,
    "csvix_prefix_docs" -> IndexQueries.csvPrefixDocs _,
    "jsonlix_prefix_docs" -> IndexQueries.jsonlPrefixDocs _,
    "warcix_prefix_docs" -> IndexQueries.warcPrefixDocs _,
    "ixnp_wand_topk" -> IndexQueries.npWandTopK _,
    "ixc_compact_postings" -> IndexQueries.compactedPostings _,
    "ixcg_decoded_postings" -> IndexQueries.gammaDecodedPostings _,
    "ixcp_wand_topk" -> IndexQueries.pforWandTopK _,
    "ixch_decoded_postings" -> IndexQueries.huffmanDecodedPostings _,
    "ix_and" -> IndexQueries.andTopK _,
    "ix_phrase" -> IndexQueries.phraseDocs _,
    "ix_completions" -> IndexQueries.completions _,
    "ix_build_metrics" -> IndexQueries.buildMetrics _,
    "fcix_counts" -> IndexQueries.facetCounts _,
    "fcix_filtered" -> IndexQueries.facetCountsFiltered _,
    "fcix_ordering" -> IndexQueries.orderingRange _,
    "fcix_info" -> IndexQueries.infoWords _,
    "fw_title" -> FtQueries.fieldWeighted _,
    "fwix_title" -> IndexQueries.fieldWeightedIx _,
    "pw_pairs" -> IndexQueries.partialPairs _,
    "pwix_partial_docs" -> IndexQueries.partialDocs _,
    "fzix_clusters" -> IndexQueries.fuzzyClusters _
  ) ++ OpsQueries.queries ++ QpQueries.queries ++ QpixQueries.queries

  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> "SELECT l_returnflag, sum(l_quantity) AS sum_qty FROM lineitem GROUP BY 1"
  ) ++ Oracles.all ++ Map(
    "ix_decoded_postings" ->
      s"${Oracles.BaseCtes} SELECT doc_id, term, tf FROM dt",
    "ix_wand_topk" -> Oracles.topDocs("term IN ('spark', 'hash', 'merge')"),
    "ix_prefix_docs" -> Oracles.topDocs("term LIKE 'st%'"),
    // BY_PREFIXES-built index must serve the identical prefix results
    "ixbp_prefix_docs" -> Oracles.topDocs("term LIKE 'st%'"),
    // BY_PREFIX_SIZE (boundaries = the vocab's length-2 prefixes) likewise
    "ixbps_prefix_docs" -> Oracles.topDocs("term LIKE 'st%'"),
    // XML-ingested index: same prefix oracle, with parquet doc ids mapped
    // to the XML parse positions (1-based row_number in doc_id order --
    // XmlIngest's dense-rank id assignment)
    "xmlix_prefix_docs" -> Oracles.positionalPrefixSql,
    // CSV-ingested index: line numbers coincide with the XML parse
    // positions (both are the 1-based doc_id rank), so the SAME oracle
    // proves the CSV field-role path end to end
    "csvix_prefix_docs" -> Oracles.positionalPrefixSql,
    // JSONL-ingested index: docId = line number + 1, the same 1-based
    // position ids, so the shared positional oracle applies a third time
    "jsonlix_prefix_docs" -> Oracles.positionalPrefixSql,
    // WARC-built index: record positions are the same 1-based doc_id
    // ranks; this one additionally exercises the ordinary corpus build
    "warcix_prefix_docs" -> Oracles.positionalPrefixSql,
    // positions-off index: doc-level WAND scoring identical to the full one
    "ixnp_wand_topk" -> Oracles.topDocs("term IN ('spark', 'hash', 'merge')"),
    // partial words (reference partialwords/): dictionary words contained
    // in corpus vocabulary words, with 1-based first-occurrence position
    "pw_pairs" -> {
      val dict = IndexQueries.PartialDict.map(w => s"'$w'").mkString(", ")
      s"""${Oracles.BaseCtes},
         |voc AS (SELECT DISTINCT term AS word FROM toks),
         |dict AS (SELECT unnest([$dict]) AS word)
         |SELECT v.word, d.word AS partial,
         |       CAST(strpos(v.word, d.word) AS BIGINT) AS pos
         |FROM voc v JOIN dict d
         |ON strpos(v.word, d.word) > 0 AND v.word <> d.word""".stripMargin
    },
    // index with partial-word postings merged in: querying 'tab' serves
    // the 'table' docs, scored BM25 over the EXPANDED index (partial
    // postings are bare words, so df and the document-length model see
    // them exactly as the reference's merged words file would)
    "pwix_partial_docs" -> {
      val dict = IndexQueries.PartialDict.map(w => s"'$w'").mkString(", ")
      s"""${Oracles.BaseCtes},
         |pm AS (SELECT t.word, d.word AS partial
         |       FROM (SELECT DISTINCT term AS word FROM toks) t
         |       JOIN (SELECT unnest([$dict]) AS word) d
         |       ON strpos(t.word, d.word) > 0 AND t.word <> d.word),
         |pdt AS (SELECT dt.doc_id, pm.partial, CAST(sum(dt.tf) AS BIGINT) AS tf
         |        FROM dt JOIN pm ON dt.term = pm.word GROUP BY 1, 2),
         |pdfs AS (SELECT partial, CAST(count(*) AS BIGINT) AS df FROM pdt GROUP BY 1),
         |pnp AS (SELECT CAST((SELECT sum(tf) FROM dt) +
         |                    (SELECT COALESCE(sum(tf), 0) FROM pdt) AS DOUBLE) AS np),
         |pscored AS (
         |  SELECT pdt.doc_id, pdt.partial AS term,
         |         ${graft.core.Analysis.bm25Sql("pdt.tf", "pdfs.df", "dls.dl",
                      "st.n", "(pnp.np / st.n)")} AS score
         |  FROM pdt JOIN pdfs USING (partial)
         |  JOIN dls ON pdt.doc_id = dls.doc_id
         |  CROSS JOIN st CROSS JOIN pnp)
         |SELECT doc_id, round(sum(score), 4) AS score FROM pscored
         |WHERE term = 'tab'
         |GROUP BY doc_id ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin
    },
    // fuzzy word clusters (BuildFuzzySearchClusters mode2 analog):
    // centers = terms with cf >= 500, candidates via the up-to-2-deletion
    // FastSS neighborhoods (the theorem needs d deletions per side for
    // ed <= d), exact levenshtein verify, <= 2 memberships per word
    // ranked (dist, center cf desc, center id)
    "fzix_clusters" ->
      s"""${Oracles.BaseCtes},
         |voc AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM toks GROUP BY 1),
         |vid AS (SELECT term, cf,
         |        CAST(row_number() OVER (ORDER BY term) - 1 AS BIGINT) AS term_id FROM voc),
         |d1 AS (SELECT term_id, term, cf,
         |       CASE WHEN i = 0 THEN term
         |            ELSE substr(term, 1, i - 1) || substr(term, i + 1) END AS v
         |       FROM (SELECT term_id, term, cf,
         |             unnest(range(0, len(term) + 1)) AS i FROM vid)),
         |d2 AS (SELECT DISTINCT term_id, term, cf,
         |       CASE WHEN j = 0 THEN v
         |            ELSE substr(v, 1, j - 1) || substr(v, j + 1) END AS v
         |       FROM (SELECT term_id, term, cf, v,
         |             unnest(range(0, len(v) + 1)) AS j FROM d1)),
         |cd AS (SELECT v, term_id AS cluster_id, term AS center, cf AS center_cf
         |       FROM d2 WHERE cf >= 500),
         |cand AS (SELECT DISTINCT cd.cluster_id, cd.center, cd.center_cf,
         |                w.term_id, w.term
         |         FROM d2 w JOIN cd USING (v)),
         |f AS (SELECT cluster_id, center_cf, term_id, term,
         |      CAST(levenshtein(term, center) AS BIGINT) AS dist
         |      FROM cand WHERE levenshtein(term, center) <= 2),
         |r AS (SELECT cluster_id, term_id, term, dist,
         |      row_number() OVER (PARTITION BY term_id
         |        ORDER BY dist ASC, center_cf DESC, cluster_id ASC) AS rk
         |      FROM f)
         |SELECT cluster_id, term_id, term, dist FROM r WHERE rk <= 2""".stripMargin,
    // non-default block codecs must serve identical results (gamma: full
    // decode round-trip; pfor: WAND top-k)
    // streamed-then-compacted index: every posting survives the append ->
    // compact -> commit -> GC lifecycle; terms outside the batch (even-doc)
    // vocabulary are dropped as documented dictionary drift
    "ixc_compact_postings" ->
      s"""${Oracles.BaseCtes} SELECT doc_id, term, tf FROM dt
         |WHERE term IN (SELECT DISTINCT term FROM toks WHERE doc_id % 2 = 0)""".stripMargin,
    "ixcg_decoded_postings" ->
      s"${Oracles.BaseCtes} SELECT doc_id, term, tf FROM dt",
    "ixcp_wand_topk" -> Oracles.topDocs("term IN ('spark', 'hash', 'merge')"),
    "ixch_decoded_postings" ->
      s"${Oracles.BaseCtes} SELECT doc_id, term, tf FROM dt",
    "ix_and" -> Oracles.all("ft_bm25_and"),
    "ix_phrase" -> Oracles.all("ft_phrase"),
    "ix_completions" -> Oracles.all("ft_completions"),
    "fcix_counts" -> Oracles.all("fc_counts"),
    "fcix_filtered" -> Oracles.all("fc_filtered"),
    "fcix_ordering" -> Oracles.all("fc_ordering"),
    // :info: words echo the build configuration -- the oracle IS that
    // static configuration
    "fcix_info" ->
      """SELECT term FROM (VALUES (':info:encoding:utf-8'),
        |  (':info:facet:lang'), (':info:facet:source'),
        |  (':info:name:webdocs')) AS t(term) ORDER BY term""".stripMargin,
    "fw_title" -> Oracles.fieldWeightedSql,
    "fwix_title" -> Oracles.fieldWeightedSql
  ) ++ OpsQueries.oracleSql ++ QpQueries.oracleSql ++ QpixQueries.oracleSql
}
