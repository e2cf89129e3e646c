package graft

import graft.index.Codec
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property tests for the posting-block codec (varint + delta), the
  * equivalent of the reference's codesTest.Simple9_enc golden
  * (SURVEY.md §5.1). Seeded deterministic sampling (no scalatestplus
  * bridge in the offline cache).
  */
class CodecSpec extends AnyFunSuite {

  private def rng = new Random(42)

  test("varint round-trips arbitrary non-negative longs") {
    val r = rng
    for (_ <- 1 to 200) {
      val n = r.nextInt(200)
      val arr = Array.fill(n)(r.nextLong().abs.max(0L))
      val enc = Codec.encodeVarLongs(arr)
      assert(Codec.decodeVarLongs(enc, n).toSeq === arr.toSeq)
    }
    // boundary values around 7-bit group edges
    val edges = Array(0L, 1L, 127L, 128L, 16383L, 16384L, (1L << 35) - 1, 1L << 35, Long.MaxValue)
    assert(Codec.decodeVarLongs(Codec.encodeVarLongs(edges), edges.length).toSeq === edges.toSeq)
  }

  test("delta codec round-trips sorted docId sequences") {
    val r = rng
    for (_ <- 1 to 200) {
      val n = r.nextInt(300)
      val arr = Array.fill(n)(r.nextLong().abs % (1L << 40)).sorted
      val enc = Codec.encodeDeltas(arr)
      assert(Codec.decodeDeltas(enc, n).toSeq === arr.toSeq)
    }
  }

  test("position lists round-trip with per-doc framing") {
    val r = rng
    for (_ <- 1 to 100) {
      val nDocs = r.nextInt(30)
      val perDoc = Array.fill(nDocs)(Array.fill(1 + r.nextInt(20))(r.nextInt(1000000)).sorted)
      val tfs = perDoc.map(_.length.toLong)
      val enc = Codec.encodePositions(perDoc)
      val dec = Codec.decodePositions(enc, tfs)
      assert(dec.map(_.toSeq).toSeq === perDoc.map(_.toSeq).toSeq)
    }
  }

  test("delta encoding of dense ids is ~1 byte per value") {
    val ids = Array.tabulate(10000)(i => i.toLong * 3)
    val enc = Codec.encodeDeltas(ids)
    assert(enc.length <= ids.length + 2)
  }

  test("encodeDeltas rejects unsorted input") {
    intercept[IllegalArgumentException](Codec.encodeDeltas(Array(5L, 3L)))
  }
}
