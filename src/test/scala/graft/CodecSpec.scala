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

  // ---- codec family (gamma / rice / simple8b / pfor), reference codes.h ----

  private val allCodecs =
    Seq(Codec.Varint, Codec.Gamma, Codec.Rice, Codec.Simple8b, Codec.PFor,
      Codec.Huffman)

  /** Value shapes the family must survive: dense small gaps, zipf-ish,
    * zero runs (simple8b's run selectors), isolated huge outliers (rice
    * escape, pfor exceptions), all-equal, empty, single.
    */
  private def shapes(r: Random): Seq[Array[Long]] = Seq(
    Array.empty[Long],
    Array(0L),
    Array((1L << 59) - 1),
    Array.fill(500)(r.nextInt(4).toLong),
    Array.fill(300)(0L),
    Array.fill(200)(r.nextLong().abs % (1L << 59)),
    Array.tabulate(257)(i => if (i % 97 == 0) (1L << 55) + i else r.nextInt(30).toLong),
    Array.fill(128)(7L),
    Array.fill(64)(0L) ++ Array.fill(64)(r.nextInt(1000).toLong) ++ Array.fill(300)(0L),
    Array.tabulate(1000)(_.toLong))

  test("every codec round-trips every value shape") {
    val r = rng
    for (arr <- shapes(r); codec <- allCodecs) {
      val dec = Codec.decodeLongs(codec, Codec.encodeLongs(codec, arr), arr.length)
      assert(dec.toSeq === arr.toSeq, s"codec ${Codec.nameOf(codec)}")
    }
  }

  test("every codec round-trips sorted docId deltas and position framing") {
    val r = rng
    for (codec <- allCodecs) {
      for (_ <- 1 to 50) {
        val n = r.nextInt(300)
        val arr = Array.fill(n)(r.nextLong().abs % (1L << 40)).sorted
        assert(Codec.decodeDeltas(codec, Codec.encodeDeltas(codec, arr), n).toSeq === arr.toSeq,
          s"codec ${Codec.nameOf(codec)}")
      }
      val perDoc = Array.fill(40)(Array.fill(1 + r.nextInt(20))(r.nextInt(1000000)).sorted)
      val tfs = perDoc.map(_.length.toLong)
      val dec = Codec.decodePositions(codec, Codec.encodePositions(codec, perDoc), tfs)
      assert(dec.map(_.toSeq).toSeq === perDoc.map(_.toSeq).toSeq, s"codec ${Codec.nameOf(codec)}")
    }
  }

  test("bit codecs beat varint on dense small-gap lists") {
    // gaps of a dense posting list: mostly 1-4 -- varint pays >= 8 bits per
    // gap, gamma ~3, rice ~2-3, pfor ~2-3; simple8b ~3
    val r = rng
    val gaps = Array.fill(10000)(1L + r.nextInt(4))
    val varintLen = Codec.encodeLongs(Codec.Varint, gaps).length
    for (codec <- Seq(Codec.Gamma, Codec.Rice, Codec.Simple8b, Codec.PFor,
        Codec.Huffman)) {
      val len = Codec.encodeLongs(codec, gaps).length
      assert(len < varintLen, s"${Codec.nameOf(codec)}: $len !< $varintLen")
    }
  }

  test("rice escape bounds pathological outlier cost") {
    // one huge gap among tiny ones must cost ~(escape + 64) bits, not
    // value/2^k unary bits
    val arr = Array.fill(100)(1L).patch(50, Seq(1L << 58), 1)
    val enc = Codec.encodeLongs(Codec.Rice, arr)
    assert(enc.length < 200, s"rice outlier encoding blew up: ${enc.length} bytes")
    assert(Codec.decodeLongs(Codec.Rice, enc, arr.length).toSeq === arr.toSeq)
  }

  test("codec ids and names round-trip; unknown name rejected") {
    for (codec <- allCodecs)
      assert(Codec.idOf(Codec.nameOf(codec)) === codec)
    intercept[IllegalArgumentException](Codec.idOf("snappy"))
  }

  test("huffman adapts to a skewed length distribution gamma cannot") {
    // 95% of gaps need 10 bits, 5% need 1: gamma spends 19 bits on every
    // big gap (9 zeros + 10), huffman ~1 code bit + 9 raw bits
    val r = rng
    val arr = Array.fill(20000)(
      if (r.nextInt(20) == 0) 0L else 512L + r.nextInt(512))
    val g = Codec.encodeLongs(Codec.Gamma, arr).length
    val h = Codec.encodeLongs(Codec.Huffman, arr).length
    assert(h < g, s"huffman $h !< gamma $g")
    assert(Codec.decodeLongs(Codec.Huffman,
      Codec.encodeLongs(Codec.Huffman, arr), arr.length).toSeq === arr.toSeq)
  }
}
