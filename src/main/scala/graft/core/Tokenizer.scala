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

  /** Subset of the reference's utf8.map diacritic folding
    * (utility/utf8.map: mueller-style folding). Optional -- off in the
    * default pipeline, used only when `foldDiacritics = true`.
    */
  def normalizeDiacritics(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case 'ä' => sb.append("ae"); case 'ö' => sb.append("oe")
      case 'ü' => sb.append("ue"); case 'ß' => sb.append("ss")
      case 'Ä' => sb.append("ae"); case 'Ö' => sb.append("oe")
      case 'Ü' => sb.append("ue")
      case 'á' | 'à' | 'â' | 'Á' | 'À' | 'Â' => sb.append('a')
      case 'é' | 'è' | 'ê' | 'É' | 'È' | 'Ê' => sb.append('e')
      case 'í' | 'ì' | 'î' | 'Í' | 'Ì' | 'Î' => sb.append('i')
      case 'ó' | 'ò' | 'ô' | 'Ó' | 'Ò' | 'Ô' => sb.append('o')
      case 'ú' | 'ù' | 'û' | 'Ú' | 'Ù' | 'Û' => sb.append('u')
      case c => sb.append(c)
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

  /** Java-regex / RE2-compatible character class for the separator set --
    * used to build the DuckDB oracle SQL so both engines split identically
    * on ASCII input.
    */
  val SeparatorRegexClass: String =
    """[!"#$%&'()*+,\-./@\[\\\]^{|}~:;<=>? ]"""
}
