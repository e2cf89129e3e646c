package graft.query

/** Synonym-group dictionary (reference: synonymsearch/SynonymDictionary.h
  * `readFromFile`, :29-48). File format:
  *   1. one synonym group per line;
  *   2. words separated by commas;
  *   3. any whitespace ignored;
  *   4. lines starting with `#` are comments;
  *   5. a word with a trailing `*` carries the asterisk flag: a search for
  *      that word does NOT list the other members of its group (the
  *      31st-bit groupId flag in the reference), though the word itself is
  *      still listed when other members expand.
  * A word may belong to more than one group.
  */
object SynonymDictionary {

  /** One group: all member words, plus which of them are starred. */
  case class Group(words: Set[String], starred: Set[String])

  def parse(lines: IterableOnce[String]): Seq[Group] =
    lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { line =>
        val raw = line.split(',').map(_.replaceAll("\\s", "")).filter(_.nonEmpty)
        val starred = raw.filter(_.endsWith("*")).map(_.dropRight(1)).toSet
        val words = raw.map(w => if (w.endsWith("*")) w.dropRight(1) else w).toSet
        Group(words, starred)
      }
      .filter(_.words.nonEmpty)
      .toSeq

  def parseResource(path: String): Seq[Group] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"synonym groups resource not found: $path")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  /** Expansion of `w` under `groups`: union of the groups containing `w`
    * where `w` is not starred, plus `w` itself.
    */
  def expand(w: String, groups: Seq[Group]): Set[String] =
    groups.filter(g => g.words.contains(w) && !g.starred.contains(w))
      .flatMap(_.words).toSet + w

  /** The packaged default groups (`<db>.synonym-groups` analog). */
  lazy val defaultGroups: Seq[Group] = parseResource("/graft/synonym-groups.txt")

  def defaultExpand(w: String): Set[String] = expand(w, defaultGroups)
}
