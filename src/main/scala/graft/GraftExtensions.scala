package graft

import graft.index.{PostingsDecode, PostingsDecodeWithPositions}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so plain `spark.sql` users can
  * decode posting blocks without touching the Scala API:
  *
  * {{{
  * spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * spark.sql("""
  *   SELECT term_id, p.* FROM blocks
  *   LATERAL VIEW graft_postings_decode(n_docs, doc_deltas, tfs, dls) p
  * """)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_postings_decode"),
      info("graft_postings_decode",
        "graft_postings_decode(n_docs, doc_deltas, tfs, dls) - explodes an encoded posting block to (doc_id, tf, dl) rows"),
      (args: Seq[Expression]) => PostingsDecode(args(0), args(1), args(2), args(3))))
    e.injectFunction((
      FunctionIdentifier("graft_postings_decode_pos"),
      info("graft_postings_decode_pos",
        "graft_postings_decode_pos(n_docs, doc_deltas, tfs, dls, positions) - explodes an encoded posting block to (doc_id, tf, dl, positions) rows"),
      (args: Seq[Expression]) => PostingsDecodeWithPositions(args(0), args(1), args(2), args(3), args(4))))
  }
}
