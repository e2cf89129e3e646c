package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst Generator that explodes one encoded posting block into
  * (doc_id, tf, dl) rows -- the decode path without the typed-Dataset
  * Deserialize/SerializeFromObject boundary (one GenerateExec node instead,
  * emitting InternalRows straight into the downstream codegen stage).
  *
  * Catalyst-preference rationale (builder guide (b)): a scalar Expression
  * cannot return multiple rows; a Generator is the native multi-row
  * extension point (same mechanism as explode/posexplode).
  */
case class PostingsDecode(
    nDocs: Expression,
    docDeltas: Expression,
    tfs: Expression,
    dls: Expression,
    codec: Int = Codec.Varint) extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(nDocs, docDeltas, tfs, dls)

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("dl", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val n = nDocs.eval(input).asInstanceOf[Int]
    if (n == 0) return Iterator.empty
    val docIds = Codec.decodeDeltas(codec, docDeltas.eval(input).asInstanceOf[Array[Byte]], n)
    val tfArr = Codec.decodeLongs(codec, tfs.eval(input).asInstanceOf[Array[Byte]], n)
    val dlArr = Codec.decodeLongs(codec, dls.eval(input).asInstanceOf[Array[Byte]], n)
    new Iterator[InternalRow] {
      private var i = 0
      private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
      def hasNext: Boolean = i < n
      def next(): InternalRow = {
        row.update(0, docIds(i)); row.update(1, tfArr(i)); row.update(2, dlArr(i))
        i += 1
        row
      }
    }
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(nDocs = newChildren(0), docDeltas = newChildren(1),
      tfs = newChildren(2), dls = newChildren(3))
}

/** Positions variant: (doc_id, tf, dl, positions array). */
case class PostingsDecodeWithPositions(
    nDocs: Expression,
    docDeltas: Expression,
    tfs: Expression,
    dls: Expression,
    positions: Expression,
    codec: Int = Codec.Varint) extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(nDocs, docDeltas, tfs, dls, positions)

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("dl", LongType, nullable = false),
    StructField("positions", ArrayType(IntegerType, containsNull = false), nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val n = nDocs.eval(input).asInstanceOf[Int]
    if (n == 0) return Iterator.empty
    val docIds = Codec.decodeDeltas(codec, docDeltas.eval(input).asInstanceOf[Array[Byte]], n)
    val tfArr = Codec.decodeLongs(codec, tfs.eval(input).asInstanceOf[Array[Byte]], n)
    val dlArr = Codec.decodeLongs(codec, dls.eval(input).asInstanceOf[Array[Byte]], n)
    val posArr = Codec.decodePositions(codec, positions.eval(input).asInstanceOf[Array[Byte]], tfArr)
    Iterator.tabulate(n) { i =>
      InternalRow(docIds(i), tfArr(i), dlArr(i),
        new GenericArrayData(posArr(i)))
    }
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(nDocs = newChildren(0), docDeltas = newChildren(1),
      tfs = newChildren(2), dls = newChildren(3), positions = newChildren(4))
}

object PostingsDecode {
  // Spark 4 Column <-> catalyst Expression bridge (classic session API)
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Column wrapper: use as df.select(col("term_id"), postings_decode(...)) */
  def postingsDecode(nDocs: Column, docDeltas: Column, tfs: Column, dls: Column,
                     codec: Int = Codec.Varint): Column =
    column(PostingsDecode(expression(nDocs), expression(docDeltas),
      expression(tfs), expression(dls), codec))

  def postingsDecodeWithPositions(nDocs: Column, docDeltas: Column, tfs: Column,
                                  dls: Column, positions: Column,
                                  codec: Int = Codec.Varint): Column =
    column(PostingsDecodeWithPositions(expression(nDocs), expression(docDeltas),
      expression(tfs), expression(dls), expression(positions), codec))
}
