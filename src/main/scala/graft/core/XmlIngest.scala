package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** XML corpus ingest (reference: XmlParserNew.cpp -- the applications'
  * other standard input format; one `<doc>` element per document, child
  * elements are fields). Field-role semantics are [[CsvField]]'s, shared
  * with [[CsvIngest]] (CsvParserOptions.h:33-60); repeated child elements
  * are multiple values of the field.
  *
  * Spark shape: `binaryFile` source rows parse STREAMING with the JDK's
  * StAX pull parser (javax.xml.stream, zero new dependencies, never a
  * DOM) inside a flatMap -- files parallelize across executors, memory
  * per task is one document's fields. External entities and DTDs are
  * disabled (untrusted input must not read local files / the network).
  * docId = dense rank over (file path, position in file): deterministic
  * across runs and parallelism levels, 1-based (doc 0 carries the
  * `:info:` metadata words, as in the CSV path).
  */
object XmlIngest {

  /** Separator joining repeated child elements of one doc (an ASCII unit
    * separator: cannot appear in sane XML text).
    */
  val MultiSep = "\u001f"

  /** Parse one XML payload: an iterator of docs, each a map of child
    * element name -> text (repeated children joined with [[MultiSep]]).
    * Text of nested elements concatenates into the enclosing field.
    */
  def parseDocs(bytes: Array[Byte], docTag: String): Iterator[Map[String, String]] = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_COALESCING, true)
    val r = f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val docs = scala.collection.mutable.ArrayBuffer.empty[Map[String, String]]
    var inDoc = false
    var depth = 0 // depth relative to the doc element
    var field: String = null
    val cur = scala.collection.mutable.LinkedHashMap.empty[String, StringBuilder]
    val text = new StringBuilder
    import javax.xml.stream.XMLStreamConstants._
    while (r.hasNext) {
      r.next() match {
        case START_ELEMENT =>
          val name = r.getLocalName
          if (!inDoc && name == docTag) { inDoc = true; depth = 0; cur.clear() }
          else if (inDoc) {
            depth += 1
            if (depth == 1) { field = name; text.clear() }
          }
        case CHARACTERS | CDATA =>
          if (inDoc && depth >= 1) text ++= r.getText
        case END_ELEMENT =>
          if (inDoc) {
            if (depth == 0 && r.getLocalName == docTag) {
              inDoc = false
              docs += cur.view.mapValues(_.toString).toMap
            } else if (depth >= 1) {
              if (depth == 1 && field != null) {
                val sb = cur.getOrElseUpdate(field, new StringBuilder)
                if (sb.nonEmpty) sb ++= MultiSep
                sb ++= text.toString.trim
                field = null
              }
              depth -= 1
            }
          }
        case _ => ()
      }
    }
    r.close()
    docs.iterator
  }

  /** Parse XML file(s) into (words, docs) -- the exact [[CsvIngest.parse]]
    * output shape, so everything downstream (IndexBuilder extraDocTerms,
    * facet queries, docs store) is input-format agnostic.
    * words: (doc_id, term, score, pos) -- pos = -1 for artificial words.
    * docs: (doc_id, <show fields...>).
    */
  def parse(spark: SparkSession, path: String, fields: Seq[CsvField],
            docTag: String = "doc"): (DataFrame, DataFrame) = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
    val raw = files.flatMap { case (p, bytes) =>
      parseDocs(bytes, docTag).zipWithIndex.map { case (m, i) =>
        // zero-padded in-file position keeps the key order == parse order
        (p + "\u0000" + f"$i%012d", m)
      }
    }.toDF("_key", "fields")
    // 0-based dense rank + 1: doc ids start at 1, doc 0 is :info:
    val withId = DenseRank.withDenseId(raw, "_key", "_id")
      .select((col("_id") + 1).as("doc_id"), col("fields"))
      .as[(Long, Map[String, String])]

    val fieldSpecs = fields
    val words = withId.flatMap { case (docId, m) =>
      // XML multi-values come from repeated elements; an explicit
      // withinFieldSep additionally splits within each value
      FieldRoles.emit(docId, fieldSpecs, f =>
        m.getOrElse(f.name, "")
          .split(java.util.regex.Pattern.quote(MultiSep), -1).toSeq
          .flatMap(v => FieldRoles.splitValues(f, v)))
    }.toDF("doc_id", "term", "score", "pos")

    // :info: words (CsvParser.cpp:877-910 analog) on reserved doc 0
    val info = FieldRoles.infoEntries(path, fields, "utf-8")
      .map { case (k, v) => (0L, Facets.infoTerm(k, v), 1, -1) }
      .toDF("doc_id", "term", "score", "pos")
    val allWords = words.unionByName(info)

    val showFields = fields.filter(_.show)
    val docs = withId.toDF("doc_id", "fields")
      .select(col("doc_id") +:
        showFields.map(f =>
          coalesce(element_at(col("fields"), f.name), lit("")).as(f.name)): _*)

    (allWords, docs)
  }
}
