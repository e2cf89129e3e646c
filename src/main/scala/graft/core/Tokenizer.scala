package graft.core

/** Locale-free tokenizer matching the reference engine's SimpleTextParser.
  *
  * Reference semantics (ad-freiburg/completesearch,
  * src/parser/SimpleTextParser.cpp:12-13, 65-83): a token is a maximal run
  * of non-separator bytes; the separator set is exactly
  * {{{ !"#$%&'()*+,-./@[\]^{|}~:;<=>?  }}} plus the space character.
  * Underscore and digits are word characters. Lowercasing is map-based and
  * locale-free (reference: src/utility/StringConverter, CONVERSION_TO_LOWER)
  * -- we never call String.toLowerCase with the default locale.
  *
  * This object is pure Scala (no Spark imports) so it can be used both from
  * typed Dataset flatMaps and from plain unit tests. It is the single source
  * of truth for tokenization; the SQL oracle mirrors it with a regex split
  * over lower(text), which is equivalent for ASCII input.
  */
object Tokenizer extends Serializable {

  /** Exactly the reference separator set (SimpleTextParser.cpp:12-13). */
  val SeparatorChars: String = "!\"#$%&'()*+,-./@[\\]^{|}~:;<=>? "

  // Byte-indexed separator map, mirroring SimpleTextParser::setSeparators
  // (a char _map[256]). Only bytes listed above are separators; control
  // chars (\t, \n, \r) are NOT separators in the reference -- callers that
  // want whitespace splitting must normalize first (see extractText).
  private val sepMap: Array[Boolean] = {
    val m = new Array[Boolean](256)
    SeparatorChars.foreach(c => m(c.toInt & 0xff) = true)
    m
  }

  @inline def isSeparator(c: Char): Boolean = c < 256 && sepMap(c.toInt)

  /** Locale-free ASCII lowercase; non-ASCII code points pass through
    * unchanged (the reference's ISO-8859-1/UTF-8 fold maps are a separate,
    * optional normalization step -- see [[normalizeDiacritics]]).
    */
  def toLowerAscii(s: String): String = {
    var i = 0
    var changed = false
    val n = s.length
    while (i < n && !changed) { val c = s.charAt(i); changed = c >= 'A' && c <= 'Z'; i += 1 }
    if (!changed) s
    else {
      val a = s.toCharArray
      var j = 0
      while (j < a.length) {
        val c = a(j)
        if (c >= 'A' && c <= 'Z') a(j) = (c + 32).toChar
        j += 1
      }
      new String(a)
    }
  }

  /** German-style transliteration (ä->ae etc.) -- an OPTIONAL extra the
    * reference does not apply in its map (utf8.map keeps umlauts: ä->ä);
    * kept for corpora that want `mueller` to find `müller`.
    */
  def normalizeDiacritics(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case 'ä' | 'Ä' => sb.append("ae"); case 'ö' | 'Ö' => sb.append("oe")
      case 'ü' | 'Ü' => sb.append("ue"); case 'ß' => sb.append("ss")
      case c => sb.append(normalize(c.toString))
    }
    sb.toString
  }

  // ---- CONVERSION_TO_NORM: the reference's full utf8.map port ----
  //
  // The reference normalizes codepoints <= 2047 via utility/utf8.map
  // (2,048 entries; StringConverter.h: MAX_UTF8_CODEPOINT = 2047,
  // everything above passes through). The map's norm column is almost
  // entirely "lowercase + strip combining marks" (Unicode NFD), so we
  // compute that algorithmically and overlay the 342 entries where the map
  // deviates (umlauts/ø kept as lowercase self, stroke/hook letters folded
  // to their base, Arabic letter-forms folded, etc.) from a compact
  // generated (codepoint -> norm codepoint) resource. TokenizerSpec
  // verifies ALL 2,048 codepoints against the reference map file itself.

  private def baseNormChar(cp: Int): String = {
    val low = Character.toLowerCase(cp)
    val d = java.text.Normalizer.normalize(
      new String(Character.toChars(low)), java.text.Normalizer.Form.NFD)
    val sb = new StringBuilder
    var i = 0
    while (i < d.length) {
      val c = d.codePointAt(i)
      val t = Character.getType(c)
      if (t != Character.NON_SPACING_MARK && t != Character.ENCLOSING_MARK &&
        t != Character.COMBINING_SPACING_MARK) sb.appendAll(Character.toChars(c))
      i += Character.charCount(c)
    }
    if (sb.isEmpty) new String(Character.toChars(low)) // bare combining mark: self
    else sb.toString
  }

  private lazy val NormTable: Array[String] = {
    val t = Array.tabulate(2048)(baseNormChar)
    val in = getClass.getResourceAsStream("/graft/norm-exceptions.txt")
    require(in != null, "norm-exceptions resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().foreach { ln =>
      val Array(cp, norm) = ln.split('\t')
      t(cp.toInt) = new String(Character.toChars(norm.toInt))
    } finally src.close()
    t
  }

  /** Locale-free normalization matching the reference's CONVERSION_TO_NORM
    * over utility/utf8.map byte-for-byte: codepoints <= 2047 map through
    * the table, everything above passes through unchanged
    * (StringConverter.h sample: "René Descartes" -> "rené descartes" with
    * the accent stripped -> "rene descartes").
    */
  def normalize(s: String): String = {
    if (s == null || s.isEmpty) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 2048) sb.append(NormTable(cp))
      else sb.appendAll(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** Tokenize: maximal runs of non-separator chars, lowercased.
    * Returns tokens in document order. Position = index in this sequence
    * (0-based), matching the reference words-file position semantics
    * (WordsFile.h:30-45: one position per emitted word, in order).
    */
  def tokenize(text: String): IndexedSeq[String] = {
    if (text == null || text.isEmpty) return Vector.empty
    val out = Vector.newBuilder[String]
    val n = text.length
    var pos = 0
    while (pos < n) {
      while (pos < n && isSeparator(text.charAt(pos))) pos += 1
      val start = pos
      while (pos < n && !isSeparator(text.charAt(pos))) pos += 1
      if (pos > start) out += toLowerAscii(text.substring(start, pos))
    }
    out.result()
  }

  /** Tokens with 0-based positions. */
  def tokenizeWithPositions(text: String): IndexedSeq[(String, Int)] = {
    val ts = tokenize(text)
    ts.zipWithIndex
  }

  /** Tokens with positions PLUS the reference's normalized-variant words
    * (CsvParser.cpp:120-131, parser -s flag): for each token whose
    * CONVERSION_TO_NORM form differs from its lowercase form, an extra
    * `norm:lower` word is emitted at the SAME position (so `rené` is
    * indexed as `rené` and `rene:rené`; a bare query `rene` -> `rene|rene:*`
    * then finds it). Variant words do not count toward document length.
    */
  def tokenizeWithVariants(text: String): IndexedSeq[(String, Int)] = {
    val base = tokenize(text)
    val out = Vector.newBuilder[(String, Int)]
    var i = 0
    while (i < base.length) {
      val t = base(i)
      out += ((t, i))
      val n = normalize(t)
      if (n != t) out += ((s"$n:$t", i))
      i += 1
    }
    out.result()
  }

  /** Java-regex / RE2-compatible character class for the separator set --
    * used to build the DuckDB oracle SQL so both engines split identically
    * on ASCII input.
    */
  val SeparatorRegexClass: String =
    """[!"#$%&'()*+,\-./@\[\\\]^{|}~:;<=>? ]"""
}
