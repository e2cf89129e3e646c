package graft.query

/** The reference query grammar (Query.cpp:252-388, Globals.cpp:51-58,
  * CompleterBase.cpp:2505-2636), as an AST + parser:
  *
  *   - parts separated by SEP_CHARS:
  *       ' '  same document        (window = none)
  *       '.'  phrase / adjacent    (window [1, 1])
  *       '..' near                 (window [-10, 10], NEIGHBORHOOD_SIZE)
  *       '='  same position        (window [0, 0])
  *   - within a part: `a|b|c` OR alternatives
  *   - atom suffixes/prefixes:
  *       `w*`     prefix (autocompletion word range)
  *       `-w`     NOT (docs must not match)
  *       `w$`     exact word (no rewrite)
  *       `w~`     fuzzy (edit-distance candidate expansion)
  *       `w^`     synonym-group expansion
  *       `a--b`   lexicographic word range
  *   - `[q1#q2]` join block: completions common to both sub-results
  */
object QueryParser {

  sealed trait Sep { def window: Option[(Int, Int)] }
  case object SameDoc extends Sep { val window = None }
  case object Phrase extends Sep { val window = Some((1, 1)) }
  case object Near extends Sep { val window = Some((-10, 10)) }
  case object SamePos extends Sep { val window = Some((0, 0)) }

  sealed trait Atom
  /** One query word with its modifiers. */
  case class Word(text: String, prefix: Boolean = false, not: Boolean = false,
                  exact: Boolean = false, fuzzy: Boolean = false,
                  synonym: Boolean = false) extends Atom
  case class WordRange(lo: String, hi: String) extends Atom
  case class OrAtoms(alts: Seq[Word]) extends Atom
  case class JoinBlock(left: ParsedQuery, right: ParsedQuery) extends Atom

  /** sep is the separator BETWEEN this part and the previous one
    * (None for the first part).
    */
  case class Part(atom: Atom, sep: Option[Sep])
  case class ParsedQuery(parts: Seq[Part])

  def parse(q: String): ParsedQuery = {
    val trimmed = q.trim
    require(trimmed.nonEmpty, "empty query")
    ParsedQuery(splitParts(trimmed))
  }

  /** Split on separators at depth 0 (outside [..] blocks). */
  private def splitParts(q: String): Seq[Part] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[Part]
    val cur = new StringBuilder
    var depth = 0
    var i = 0
    var pendingSep: Option[Sep] = None
    def flush(nextSep: Option[Sep]): Unit = {
      val s = cur.toString.trim
      if (s.nonEmpty) { parts += Part(parseAtom(s), pendingSep); pendingSep = nextSep }
      else if (nextSep.isDefined) pendingSep = nextSep
      cur.clear()
    }
    while (i < q.length) {
      val c = q.charAt(i)
      if (c == '[') { depth += 1; cur += c; i += 1 }
      else if (c == ']') { depth -= 1; cur += c; i += 1 }
      else if (depth == 0 && c == '.') {
        if (i + 1 < q.length && q.charAt(i + 1) == '.') { flush(Some(Near)); i += 2 }
        else { flush(Some(Phrase)); i += 1 }
      } else if (depth == 0 && c == '=') { flush(Some(SamePos)); i += 1 }
      else if (depth == 0 && (c == ' ' || c == ',' || c == ';')) { flush(Some(SameDoc)); i += 1 }
      else { cur += c; i += 1 }
    }
    flush(None)
    parts.toSeq
  }

  private def parseAtom(s: String): Atom = {
    if (s.startsWith("[") && s.endsWith("]")) {
      val inner = s.substring(1, s.length - 1)
      val hash = topLevelIndexOf(inner, '#')
      require(hash >= 0, s"join block without '#': $s")
      return JoinBlock(parse(inner.substring(0, hash)), parse(inner.substring(hash + 1)))
    }
    if (s.contains("--")) {
      val Array(lo, hi) = s.split("--", 2)
      return WordRange(lo, hi)
    }
    if (s.contains('|')) return OrAtoms(s.split('\\' + "|").toSeq.map(parseWord))
    parseWord(s)
  }

  private def topLevelIndexOf(s: String, ch: Char): Int = {
    var depth = 0
    s.zipWithIndex.foreach { case (c, i) =>
      if (c == '[') depth += 1
      else if (c == ']') depth -= 1
      else if (c == ch && depth == 0) return i
    }
    -1
  }

  private def parseWord(s0: String): Word = {
    var s = s0
    var not = false; var prefix = false; var exact = false
    var fuzzy = false; var synonym = false
    if (s.startsWith("-")) { not = true; s = s.substring(1) }
    if (s.endsWith("*")) { prefix = true; s = s.dropRight(1) }
    else if (s.endsWith("$")) { exact = true; s = s.dropRight(1) }
    else if (s.endsWith("~")) { fuzzy = true; s = s.dropRight(1) }
    else if (s.endsWith("^")) { synonym = true; s = s.dropRight(1) }
    Word(graft.core.Tokenizer.toLowerAscii(s), prefix, not, exact, fuzzy, synonym)
  }
}
