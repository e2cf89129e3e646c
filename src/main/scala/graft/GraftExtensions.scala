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
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  /** Optional trailing codec-name argument (a foldable string, e.g.
    * 'pfor'); defaults to varint when absent. Evaluated once at plan time.
    */
  private def codecOf(arg: Expression): Int = {
    require(arg.foldable, "codec argument must be a literal string")
    graft.index.Codec.idOf(arg.eval(null).toString)
  }

  private[graft] val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_postings_decode"),
      info("graft_postings_decode",
        "graft_postings_decode(n_docs, doc_deltas, tfs, dls[, codec]) - explodes an encoded posting block to (doc_id, tf, dl) rows; codec = 'varint' (default) | 'gamma' | 'rice' | 'simple8b' | 'pfor' | 'huffman'"),
      (args: Seq[Expression]) =>
        if (args.length >= 5) PostingsDecode(args(0), args(1), args(2), args(3), codecOf(args(4)))
        else PostingsDecode(args(0), args(1), args(2), args(3))),
    (FunctionIdentifier("graft_postings_decode_pos"),
      info("graft_postings_decode_pos",
        "graft_postings_decode_pos(n_docs, doc_deltas, tfs, dls, positions[, codec]) - explodes an encoded posting block to (doc_id, tf, dl, positions) rows"),
      (args: Seq[Expression]) =>
        if (args.length >= 6)
          PostingsDecodeWithPositions(args(0), args(1), args(2), args(3), args(4), codecOf(args(5)))
        else PostingsDecodeWithPositions(args(0), args(1), args(2), args(3), args(4))))

  /** Register the functions on an ALREADY-created session. Extensions only
    * apply at session construction -- `builder().withExtensions(...)
    * .getOrCreate()` silently ignores them when a session exists (the
    * usual case in shells and shared-session test JVMs); this is the
    * escape hatch for that case.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
