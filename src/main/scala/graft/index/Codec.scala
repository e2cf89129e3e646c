package graft.index

import scala.collection.mutable.ArrayBuffer

/** Posting-block codecs.
  *
  * Role analog: the reference compiles one compression algorithm into each
  * index (codes.h:27-62 lists Simple9, Elias-gamma/delta, Golomb alongside
  * the default; Simple9CompressionAlgorithm.h:25-96, HYBIndex.cpp:80-88).
  * We mirror that as a per-index choice persisted in `stats/doclist_codec`
  * and dispatched once per decode expression:
  *
  *   - varint   : unsigned LEB128 over gaps -- branch-light, byte-aligned;
  *                the north rule's "varint" option and the pre-codec-family
  *                on-disk format (indexes without stats/doclist_codec).
  *   - gamma    : Elias-gamma bit code (codes.h Elias analog) -- best for
  *                tiny gaps (dense posting lists), no parameter.
  *   - rice     : Golomb-Rice with per-list parameter k (codes.h Golomb
  *                analog); unary-quotient escape keeps pathological gaps
  *                bounded at 64+escape bits.
  *   - simple8b : word-aligned packing, 16 selectors over 60-bit payloads
  *                (Anh & Moffat "Index compression using 64-bit words" --
  *                the 64-bit successor of the reference's Simple9).
  *   - pfor     (default): patched frame-of-reference over 128-value chunks
  *                (Zukowski et al. PForDelta) -- the north rule's explicit
  *                scale option: fixed-width bit-packing for the 90th
  *                percentile, varint-patched exceptions. Measured ~35%
  *                smaller and ~2x faster to decode than varint (BENCH.md).
  *   - huffman  : canonical Huffman over per-value bit lengths (codes.h
  *                Huffman analog) -- a per-block code table matched to the
  *                block's actual gap-length distribution; gamma is the
  *                fixed-code special case of it.
  *
  * All methods are allocation-conscious pure Scala so they can run inside
  * mapPartitions/Generator hot loops and be property-tested without Spark.
  * Every codec round-trips arbitrary non-negative Longs (simple8b/pfor
  * values additionally must fit 60 bits -- docIds at 10^12 scale use 40).
  */
object Codec {

  // ---------------------------------------------------------------- codec ids
  val Varint = 0
  val Gamma = 1
  val Rice = 2
  val Simple8b = 3
  val PFor = 4
  val Huffman = 5

  private val names = Array("varint", "gamma", "rice", "simple8b", "pfor", "huffman")
  def nameOf(id: Int): String = names(id)
  def idOf(name: String): Int = {
    val i = names.indexOf(name)
    require(i >= 0, s"unknown codec '$name' (known: ${names.mkString(", ")})")
    i
  }

  // ------------------------------------------------------------------- varint
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

  // ------------------------------------------------------------ bit plumbing
  /** MSB-first bit writer over a growing byte buffer. */
  private final class BitWriter {
    private val buf = new ArrayBuffer[Byte]()
    private var cur = 0
    private var used = 0 // bits used in cur, from the MSB

    def writeBit(b: Int): Unit = {
      cur |= (b & 1) << (7 - used)
      used += 1
      if (used == 8) { buf += cur.toByte; cur = 0; used = 0 }
    }

    /** Write the low `n` bits of `v`, most significant first. n in [0,64]. */
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }

    /** `q` one-bits then a zero terminator. */
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBit(1); i += 1 }
      writeBit(0)
    }

    def result(): Array[Byte] = {
      if (used > 0) { buf += cur.toByte; cur = 0; used = 0 }
      buf.toArray
    }
  }

  /** MSB-first bit reader. Reading past the end yields zero bits (the
    * writer's final-byte padding), never an exception within one value.
    */
  private final class BitReader(bytes: Array[Byte]) {
    private var pos = 0 // absolute bit position

    def readBit(): Int = {
      val b = (bytes(pos >>> 3) >>> (7 - (pos & 7))) & 1
      pos += 1
      b
    }

    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def readUnary(): Int = {
      var q = 0
      while (readBit() == 1) q += 1
      q
    }
  }

  // -------------------------------------------------------------- Elias-gamma
  /** Elias-gamma of v+1 (gamma encodes integers >= 1): N zeros, then the
    * N+1 bits of v+1 starting with its leading 1.
    */
  private def encodeGamma(values: Array[Long]): Array[Byte] = {
    val w = new BitWriter
    var i = 0
    while (i < values.length) {
      val v = values(i)
      require(v >= 0 && v < Long.MaxValue, s"gamma requires 0 <= v < 2^63-1, got $v")
      val x = v + 1
      val n = 63 - java.lang.Long.numberOfLeadingZeros(x)
      var z = 0
      while (z < n) { w.writeBit(0); z += 1 }
      w.writeBits(x, n + 1)
      i += 1
    }
    w.result()
  }

  private def decodeGamma(bytes: Array[Byte], n: Int): Array[Long] = {
    val r = new BitReader(bytes)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var z = 0
      while (r.readBit() == 0) z += 1
      out(i) = ((1L << z) | r.readBits(z)) - 1
      i += 1
    }
    out
  }

  // -------------------------------------------------------------- Golomb-Rice
  /** Unary quotients longer than this escape to a raw 64-bit value, so one
    * outlier gap can never blow the encoding up (plain Golomb has no such
    * bound).
    */
  private val RiceEscapeQ = 40

  /** Rice parameter for a list: log2 of the MEDIAN (for geometric gaps the
    * median ~ 0.69 * mean, giving the classic Golomb optimum, but unlike
    * the mean it is robust to the one huge outlier gap that would
    * otherwise blow k up and bloat every small value). Clamped to [0, 58].
    */
  private def riceParam(values: Array[Long]): Int = {
    if (values.isEmpty) return 0
    val sorted = values.sorted
    val median = math.max(1L, sorted(sorted.length / 2))
    math.min(58, 63 - java.lang.Long.numberOfLeadingZeros(median))
  }

  /** Header byte = k, then per value: unary quotient, k remainder bits;
    * quotient >= RiceEscapeQ writes the escape marker + 64 raw bits.
    */
  private def encodeRice(values: Array[Long]): Array[Byte] = {
    val k = riceParam(values)
    val w = new BitWriter
    var i = 0
    while (i < values.length) {
      val v = values(i)
      require(v >= 0, s"rice requires non-negative value, got $v")
      val q = v >>> k
      if (q >= RiceEscapeQ) {
        w.writeUnary(RiceEscapeQ)
        w.writeBits(v, 64)
      } else {
        w.writeUnary(q.toInt)
        w.writeBits(v, k)
      }
      i += 1
    }
    k.toByte +: w.result()
  }

  private def decodeRice(bytes: Array[Byte], n: Int): Array[Long] = {
    if (n == 0) return Array.emptyLongArray
    val k = bytes(0) & 0xff
    val r = new BitReader(java.util.Arrays.copyOfRange(bytes, 1, bytes.length))
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val q = r.readUnary()
      out(i) =
        if (q >= RiceEscapeQ) r.readBits(64)
        else (q.toLong << k) | r.readBits(k)
      i += 1
    }
    out
  }

  // ---------------------------------------------------------------- Simple8b
  // selector -> (values per word, bits per value); selectors 0/1 are
  // zero-runs (240/120 zeros, no payload bits used)
  private val S8bCount = Array(240, 120, 60, 30, 20, 15, 12, 10, 8, 7, 6, 5, 4, 3, 2, 1)
  private val S8bBits = Array(0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 15, 20, 30, 60)

  /** 64-bit words: 4-bit selector + 60-bit payload (big-endian bytes). The
    * final word may describe more slots than values remain; the decoder
    * stops at n.
    */
  private def encodeSimple8b(values: Array[Long]): Array[Byte] = {
    val buf = new ArrayBuffer[Byte](values.length)
    var i = 0
    while (i < values.length) {
      val remaining = values.length - i
      // longest zero-run from i, capped at 240
      var zeros = 0
      while (zeros < 240 && zeros < remaining && values(i + zeros) == 0L) zeros += 1
      var word = 0L
      var consumed = 0
      if (zeros >= 240) {
        consumed = 240 // selector 0: word stays 0
      } else if (zeros == remaining && zeros > 120) {
        consumed = zeros // trailing all-zero run; decoder stops at n
      } else if (zeros >= math.min(120, remaining)) {
        word = 1L << 60
        consumed = math.min(120, remaining)
      } else {
        // smallest selector (most values per word) whose window all fits
        var sel = 2
        var done = false
        while (!done) {
          val cnt = math.min(S8bCount(sel), remaining)
          val bits = S8bBits(sel)
          val limit = if (bits == 60) Long.MaxValue else (1L << bits) - 1
          var ok = true
          var j = 0
          while (ok && j < cnt) {
            val v = values(i + j)
            require(v >= 0 && v < (1L << 60), s"simple8b requires 0 <= v < 2^60, got $v")
            if (v > limit) ok = false
            j += 1
          }
          if (ok) {
            word = sel.toLong << 60
            var off = 0
            j = 0
            while (j < cnt) {
              word |= values(i + j) << off
              off += bits
              j += 1
            }
            consumed = cnt
            done = true
          } else sel += 1
        }
      }
      var b = 56
      while (b >= 0) { buf += ((word >>> b) & 0xff).toByte; b -= 8 }
      i += consumed
    }
    buf.toArray
  }

  private def decodeSimple8b(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var i = 0
    var p = 0
    while (i < n) {
      var word = 0L
      var b = 0
      while (b < 8) { word = (word << 8) | (bytes(p) & 0xffL); p += 1; b += 1 }
      val sel = (word >>> 60).toInt
      val cnt = S8bCount(sel)
      val bits = S8bBits(sel)
      if (bits == 0) {
        var j = 0
        while (j < cnt && i < n) { out(i) = 0L; i += 1; j += 1 }
      } else {
        val mask = if (bits == 60) (1L << 60) - 1 else (1L << bits) - 1
        var off = 0
        var j = 0
        while (j < cnt && i < n) {
          out(i) = (word >>> off) & mask
          off += bits
          i += 1
          j += 1
        }
      }
    }
    out
  }

  // ---------------------------------------------------------------- PForDelta
  private val PForChunk = 128

  private def bitsNeeded(v: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(v)

  /** Per 128-value chunk: [b: byte][nExc: byte][ceil(m*b/8) packed low-b-bit
    * bytes][exceptions: varint position-delta + varint high part]. b covers
    * the ~90th percentile; larger values patch their high bits.
    */
  private def encodePFor(values: Array[Long]): Array[Byte] = {
    val buf = new ArrayBuffer[Byte](values.length)
    var start = 0
    while (start < values.length) {
      val m = math.min(PForChunk, values.length - start)
      val bits = new Array[Int](m)
      var j = 0
      while (j < m) {
        val v = values(start + j)
        require(v >= 0 && v < (1L << 60), s"pfor requires 0 <= v < 2^60, got $v")
        bits(j) = bitsNeeded(v)
        j += 1
      }
      // b = smallest width covering >= 90% of the chunk (histogram of bit
      // widths; no per-chunk sort in the encode hot loop)
      val hist = new Array[Int](61)
      j = 0
      while (j < m) { hist(bits(j)) += 1; j += 1 }
      val target = math.ceil(0.9 * m).toInt
      var b = 0
      var cum = hist(0)
      while (cum < target) { b += 1; cum += hist(b) }
      var nExc = 0
      j = 0
      while (j < m) { if (bits(j) > b) nExc += 1; j += 1 }
      buf += b.toByte
      buf += nExc.toByte
      // packed low parts
      val w = new BitWriter
      j = 0
      while (j < m) {
        w.writeBits(values(start + j) & (if (b == 60) (1L << 60) - 1 else (1L << b) - 1), b)
        j += 1
      }
      if (b > 0) buf ++= w.result()
      // exceptions, positions delta-coded
      var prevPos = 0
      j = 0
      while (j < m) {
        if (bits(j) > b) {
          writeVarLong(buf, (j - prevPos).toLong)
          writeVarLong(buf, values(start + j) >>> b)
          prevPos = j
        }
        j += 1
      }
      start += m
    }
    buf.toArray
  }

  private def decodePFor(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var i = 0
    var p = 0
    while (i < n) {
      val m = math.min(PForChunk, n - i)
      val b = bytes(p) & 0xff; p += 1
      val nExc = bytes(p) & 0xff; p += 1
      if (b > 0) {
        val packedBytes = (m * b + 7) / 8
        val r = new BitReader(java.util.Arrays.copyOfRange(bytes, p, p + packedBytes))
        var j = 0
        while (j < m) { out(i + j) = r.readBits(b); j += 1 }
        p += packedBytes
      }
      var prevPos = 0
      var e = 0
      while (e < nExc) {
        // inline varint reads (position delta, then high part)
        var posD = 0L; var shift = 0; var byt = 0
        do { byt = bytes(p) & 0xff; posD |= (byt & 0x7fL) << shift; shift += 7; p += 1 } while ((byt & 0x80) != 0)
        var high = 0L; shift = 0
        do { byt = bytes(p) & 0xff; high |= (byt & 0x7fL) << shift; shift += 7; p += 1 } while ((byt & 0x80) != 0)
        val pos = prevPos + posD.toInt
        out(i + pos) |= high << b
        prevPos = pos
        e += 1
      }
      i += m
    }
    out
  }

  // ------------------------------------------------------------------ Huffman
  /** Canonical Huffman over the BIT-LENGTH of each value (codes.h Huffman
    * analog adapted to unbounded gaps): symbol s in [1,64] is the length of
    * x = v+1; each value is coded as Huffman(s) followed by the s-1 bits of
    * x below its leading 1. Gamma is the special case Huffman-len(s) =
    * 2s-1; a per-block Huffman table instead matches the block's actual
    * length distribution. Header: 64 six-bit canonical code lengths
    * (48 bytes), worth it at posting-block granularity and irrelevant to
    * correctness below it.
    */
  private def encodeHuffman(values: Array[Long]): Array[Byte] = {
    if (values.isEmpty) return Array.emptyByteArray
    val sym = new Array[Int](values.length)
    val freq = new Array[Long](65) // symbols 1..64
    var i = 0
    while (i < values.length) {
      val v = values(i)
      require(v >= 0 && v < Long.MaxValue, s"huffman requires 0 <= v < 2^63-1, got $v")
      val s = 64 - java.lang.Long.numberOfLeadingZeros(v + 1)
      sym(i) = s
      freq(s) += 1
      i += 1
    }
    val lens = huffmanLengths(freq)
    val codes = canonicalCodes(lens)
    val w = new BitWriter
    var s = 1
    while (s <= 64) { w.writeBits(lens(s).toLong, 6); s += 1 }
    i = 0
    while (i < values.length) {
      val sm = sym(i)
      w.writeBits(codes(sm), lens(sm))
      if (sm > 1) w.writeBits(values(i) + 1, sm - 1) // bits below the leading 1
      i += 1
    }
    w.result()
  }

  /** Code lengths from a standard two-queue Huffman build over the symbols
    * with freq > 0 (deterministic: ties broken by symbol order). A single
    * distinct symbol gets length 1 so the decoder always consumes bits.
    * Max depth <= 63 (at most 64 leaves), which fits the 6-bit header.
    */
  private def huffmanLengths(freq: Array[Long]): Array[Int] = {
    val present = (1 to 64).filter(freq(_) > 0)
    val lens = new Array[Int](65)
    if (present.length == 1) { lens(present.head) = 1; return lens }
    // node = (weight, depth-map of contained leaves); use an ordered heap
    final case class Node(w: Long, order: Long, leaves: List[Int])
    val pq = new scala.collection.mutable.PriorityQueue[Node]()(
      Ordering.by[Node, (Long, Long)](n => (n.w, n.order)).reverse)
    var ord = 0L
    present.foreach { s => pq.enqueue(Node(freq(s), ord, List(s))); ord += 1 }
    while (pq.size > 1) {
      val a = pq.dequeue(); val b = pq.dequeue()
      (a.leaves ++ b.leaves).foreach(s => lens(s) += 1)
      pq.enqueue(Node(a.w + b.w, ord, a.leaves ++ b.leaves)); ord += 1
    }
    lens
  }

  /** Canonical code assignment: codes in increasing (length, symbol) order. */
  private def canonicalCodes(lens: Array[Int]): Array[Long] = {
    val codes = new Array[Long](65)
    val bySym = (1 to 64).filter(lens(_) > 0).sortBy(s => (lens(s), s))
    var code = 0L
    var prevLen = 0
    bySym.foreach { s =>
      code <<= (lens(s) - prevLen)
      codes(s) = code
      code += 1
      prevLen = lens(s)
    }
    codes
  }

  private def decodeHuffman(bytes: Array[Byte], n: Int): Array[Long] = {
    if (n == 0) return Array.emptyLongArray
    val r = new BitReader(bytes)
    val lens = new Array[Int](65)
    var s = 1
    while (s <= 64) { lens(s) = r.readBits(6).toInt; s += 1 }
    // canonical decode tables: per length, the first code and the symbols
    val maxLen = lens.max
    val count = new Array[Int](maxLen + 1)
    (1 to 64).foreach(s => if (lens(s) > 0) count(lens(s)) += 1)
    val firstCode = new Array[Long](maxLen + 1)
    val offset = new Array[Int](maxLen + 1)
    var code = 0L
    var total = 0
    var l = 1
    while (l <= maxLen) {
      firstCode(l) = code
      offset(l) = total
      code = (code + count(l)) << 1
      total += count(l)
      l += 1
    }
    val symTable = (1 to 64).filter(lens(_) > 0).sortBy(s => (lens(s), s)).toArray
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var c = 0L
      var len = 0
      var sym = -1
      while (sym < 0) {
        c = (c << 1) | r.readBit()
        len += 1
        if (len <= maxLen && count(len) > 0 && c - firstCode(len) < count(len))
          sym = symTable(offset(len) + (c - firstCode(len)).toInt)
      }
      out(i) =
        if (sym == 1) 0L
        else ((1L << (sym - 1)) | r.readBits(sym - 1)) - 1
      i += 1
    }
    out
  }

  // ------------------------------------------------------- generic dispatch
  /** Encode arbitrary non-negative values with the given codec. */
  def encodeLongs(codec: Int, values: Array[Long]): Array[Byte] = codec match {
    case Varint => encodeVarLongs(values)
    case Gamma => encodeGamma(values)
    case Rice => encodeRice(values)
    case Simple8b => encodeSimple8b(values)
    case PFor => encodePFor(values)
    case Huffman => encodeHuffman(values)
    case other => throw new IllegalArgumentException(s"unknown codec id $other")
  }

  /** Decode `n` values with the given codec. */
  def decodeLongs(codec: Int, bytes: Array[Byte], n: Int): Array[Long] = codec match {
    case Varint => decodeVarLongs(bytes, n)
    case Gamma => decodeGamma(bytes, n)
    case Rice => decodeRice(bytes, n)
    case Simple8b => decodeSimple8b(bytes, n)
    case PFor => decodePFor(bytes, n)
    case Huffman => decodeHuffman(bytes, n)
    case other => throw new IllegalArgumentException(s"unknown codec id $other")
  }

  // ------------------------------------------------------- posting framings
  /** Encode a non-decreasing sequence as gaps (first value absolute). */
  def encodeDeltas(values: Array[Long]): Array[Byte] = encodeDeltas(Varint, values)

  def encodeDeltas(codec: Int, values: Array[Long]): Array[Byte] = {
    val gaps = new Array[Long](values.length)
    var prev = 0L
    var i = 0
    while (i < values.length) {
      val v = values(i)
      require(v >= prev, s"encodeDeltas requires sorted input: $v < $prev")
      gaps(i) = v - prev
      prev = v
      i += 1
    }
    encodeLongs(codec, gaps)
  }

  /** Decode `n` gap-encoded values back to absolutes. */
  def decodeDeltas(bytes: Array[Byte], n: Int): Array[Long] = decodeDeltas(Varint, bytes, n)

  def decodeDeltas(codec: Int, bytes: Array[Byte], n: Int): Array[Long] = {
    val out = decodeLongs(codec, bytes, n)
    var i = 1
    while (i < n) { out(i) += out(i - 1); i += 1 }
    out
  }

  /** Encode per-doc position lists: for each doc its positions are
    * gap-encoded (first absolute), docs concatenated in docId order.
    * Counts come from the parallel tf array (useGaps=2 framing analog,
    * HYBIndex.cpp:80-88).
    */
  def encodePositions(positionsPerDoc: Array[Array[Int]]): Array[Byte] =
    encodePositions(Varint, positionsPerDoc)

  def encodePositions(codec: Int, positionsPerDoc: Array[Array[Int]]): Array[Byte] = {
    var total = 0
    var d = 0
    while (d < positionsPerDoc.length) { total += positionsPerDoc(d).length; d += 1 }
    val gaps = new Array[Long](total)
    var p = 0
    d = 0
    while (d < positionsPerDoc.length) {
      val ps = positionsPerDoc(d)
      var prev = 0L
      var i = 0
      while (i < ps.length) {
        gaps(p) = ps(i) - prev
        prev = ps(i)
        p += 1
        i += 1
      }
      d += 1
    }
    encodeLongs(codec, gaps)
  }

  /** Decode per-doc position lists given per-doc counts (tfs). */
  def decodePositions(bytes: Array[Byte], tfs: Array[Long]): Array[Array[Int]] =
    decodePositions(Varint, bytes, tfs)

  def decodePositions(codec: Int, bytes: Array[Byte], tfs: Array[Long]): Array[Array[Int]] = {
    var total = 0L
    var t = 0
    while (t < tfs.length) { total += tfs(t); t += 1 }
    val flat = decodeLongs(codec, bytes, total.toInt)
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
