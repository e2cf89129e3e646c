package graft.core

/** Sequential, obviously-correct reference scorer (no Spark): plain Scala
  * loops implementing the same tokenization + BM25 + aggregation semantics.
  * This is the "truth revision" of the reference's end2end.py differential
  * pattern (SURVEY.md §5.2, §7.1): its output over the fixture corpus is
  * committed as golden files, and the distributed engine must be
  * rank-identical to it.
  */
object SequentialScorer {

  case class Doc(id: Long, text: String)

  def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** All per-(doc, term) BM25 scores for terms selected by `pred`. */
  private def scores(docs: Seq[Doc], pred: String => Boolean): Map[(Long, String), Double] = {
    val tokenized = docs.map(d => d.id -> Tokenizer.tokenize(d.text))
    val n = docs.size
    val avgdl = if (n == 0) 0.0 else tokenized.map(_._2.length.toLong).sum.toDouble / n
    val tfs = for {
      (id, toks) <- tokenized
      (term, g) <- toks.groupBy(identity) if pred(term)
    } yield ((id, term), (g.size.toLong, toks.length.toLong))
    val df = tfs.groupBy(_._1._2).map { case (t, xs) => t -> xs.size.toLong }
    tfs.map { case ((id, term), (tf, dl)) =>
      val idf = math.log((n - df(term) + 0.5) / (df(term) + 0.5) + 1.0)
      val tfPart = (tf * (Analysis.K1 + 1.0)) /
        (tf + Analysis.K1 * ((1.0 - Analysis.B) + Analysis.B * dl / avgdl))
      (id, term) -> idf * tfPart
    }.toMap
  }

  private def topDocs(perDoc: Map[Long, Double], k: Int): Seq[(Long, Double)] =
    perDoc.toSeq.map { case (id, s) => (id, round4(s)) }
      .sortBy { case (id, s) => (-s, id) }.take(k)

  /** Disjunctive (OR / single-term) top-k, Sum aggregation. */
  def topKOr(docs: Seq[Doc], terms: Set[String], k: Int): Seq[(Long, Double)] =
    topDocs(scores(docs, terms.contains).groupBy(_._1._1)
      .map { case (id, xs) => id -> xs.values.sum }, k)

  /** Conjunctive (AND) top-k: docs containing every term. */
  def topKAnd(docs: Seq[Doc], terms: Set[String], k: Int): Seq[(Long, Double)] = {
    val byDoc = scores(docs, terms.contains).groupBy(_._1._1)
    topDocs(byDoc.collect { case (id, xs) if xs.size == terms.size =>
      id -> xs.values.sum }, k)
  }

  /** Prefix top-k docs: Sum over matching completions. */
  def topKPrefix(docs: Seq[Doc], prefix: String, k: Int): Seq[(Long, Double)] =
    topDocs(scores(docs, _.startsWith(prefix)).groupBy(_._1._1)
      .map { case (id, xs) => id -> xs.values.sum }, k)

  /** Top-k completions: (term, score, dc, oc) ranked score desc, term asc. */
  def topKCompletions(docs: Seq[Doc], prefix: String, k: Int): Seq[(String, Double, Long, Long)] = {
    val sc = scores(docs, _.startsWith(prefix))
    val tokenized = docs.map(d => d.id -> Tokenizer.tokenize(d.text))
    val occ = (for {
      (id, toks) <- tokenized
      (term, g) <- toks.groupBy(identity) if term.startsWith(prefix)
    } yield (id, term, g.size.toLong))
    occ.groupBy(_._2).map { case (term, xs) =>
      val score = round4(xs.map(x => sc((x._1, term))).sum)
      (term, score, xs.size.toLong, xs.map(_._3).sum)
    }.toSeq.sortBy { case (t, s, _, _) => (-s, t) }.take(k)
  }
}
