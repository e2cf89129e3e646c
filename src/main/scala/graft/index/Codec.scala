package graft.index

import scala.collection.mutable.ArrayBuffer

/** Varint / delta codecs for posting blocks.
  *
  * Role analog: the reference's Simple9 gap compression of doclists and
  * positionlists (Simple9CompressionAlgorithm.h:25-96, codes.h:11-25,
  * HYBIndex.cpp:80-88). The north rule prescribes docID-delta +
  * varint/PForDelta; we use unsigned LEB128 varints over gaps -- simple,
  * branch-light, and decode speed is dominated by Spark row overhead at
  * query time anyway.
  *
  * All methods are allocation-conscious pure Scala so they can run inside
  * mapPartitions/Aggregator hot loops and be property-tested without Spark.
  */
object Codec {

  /** Append one unsigned LEB128 varint. Values must be >= 0. */
  def writeVarLong(buf: ArrayBuffer[Byte], value: Long): Unit = {
    require(value >= 0, s"varint requires non-negative value, got $value")
    var v = value
    while ((v & ~0x7fL) != 0L) {
      buf += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    buf += v.toByte
  }

  /** Encode a non-decreasing sequence as gaps (first value absolute). */
  def encodeDeltas(values: Array[Long]): Array[Byte] = {
    val buf = new ArrayBuffer[Byte](values.length * 2)
    var prev = 0L
    var i = 0
    while (i < values.length) {
      val v = values(i)
      require(v >= prev, s"encodeDeltas requires sorted input: $v < $prev")
      writeVarLong(buf, v - prev)
      prev = v
      i += 1
    }
    buf.toArray
  }

  /** Encode arbitrary non-negative values (no delta). */
  def encodeVarLongs(values: Array[Long]): Array[Byte] = {
    val buf = new ArrayBuffer[Byte](values.length * 2)
    var i = 0
    while (i < values.length) { writeVarLong(buf, values(i)); i += 1 }
    buf.toArray
  }

  /** Decode `n` varints. */
  def decodeVarLongs(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var p = 0
    var i = 0
    while (i < n) {
      var v = 0L
      var shift = 0
      var b = 0
      do {
        b = bytes(p) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        p += 1
      } while ((b & 0x80) != 0)
      out(i) = v
      i += 1
    }
    out
  }

  /** Decode `n` gap-encoded values back to absolutes. */
  def decodeDeltas(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = decodeVarLongs(bytes, n)
    var i = 1
    while (i < n) { out(i) += out(i - 1); i += 1 }
    out
  }

  /** Encode per-doc position lists: for each doc its positions are
    * gap-encoded (first absolute), docs concatenated in docId order.
    * Counts come from the parallel tf array (useGaps=2 framing analog,
    * HYBIndex.cpp:80-88).
    */
  def encodePositions(positionsPerDoc: Array[Array[Int]]): Array[Byte] = {
    val buf = new ArrayBuffer[Byte]()
    var d = 0
    while (d < positionsPerDoc.length) {
      val ps = positionsPerDoc(d)
      var prev = 0L
      var i = 0
      while (i < ps.length) {
        writeVarLong(buf, ps(i) - prev)
        prev = ps(i)
        i += 1
      }
      d += 1
    }
    buf.toArray
  }

  /** Decode per-doc position lists given per-doc counts (tfs). */
  def decodePositions(bytes: Array[Byte], tfs: Array[Long]): Array[Array[Int]] = {
    val total = tfs.map(_.toInt).sum
    val flat = decodeVarLongs(bytes, total)
    val out = new Array[Array[Int]](tfs.length)
    var p = 0
    var d = 0
    while (d < tfs.length) {
      val n = tfs(d).toInt
      val ps = new Array[Int](n)
      var prev = 0L
      var i = 0
      while (i < n) {
        prev += flat(p)
        ps(i) = prev.toInt
        p += 1
        i += 1
      }
      out(d) = ps
      d += 1
    }
    out
  }
}
