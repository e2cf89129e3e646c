package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Role of one CSV/TSV column (reference: CsvParserOptions.h:33-60 --
  * --full-text, --show, --excerpts, --filter, --facets, --ordering,
  * per-field --score).
  */
case class CsvField(
    name: String,
    fulltext: Boolean = false,
    show: Boolean = false,
    facet: Boolean = false,
    filter: Boolean = false,
    ordering: Boolean = false,
    score: Int = 1,
    withinFieldSep: Option[String] = None)

/** The ONE implementation of the reference's field-role word emission
  * (CsvParser.cpp / CsvParserOptions.h:33-60), shared by the CSV, XML
  * and JSONL ingests: full-text tokens with positions, and the
  * artificial `:facet:` / `:filter:` / `:ordering:` namespace words at
  * pos -1. Each ingest supplies only how a field's VALUES are obtained
  * from its record shape (cells, repeated elements, JSON arrays).
  */
object FieldRoles {

  /** Words-file rows (doc_id, term, score, pos) for one document. */
  def emit(docId: Long, fields: Seq[CsvField],
           valuesOf: CsvField => Seq[String]): Iterator[(Long, String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int, Int)]
    var pos = 0
    fields.foreach { f =>
      valuesOf(f).filter(_.nonEmpty).foreach { v =>
        if (f.fulltext) {
          Tokenizer.tokenize(v).foreach { t =>
            out += ((docId, t, f.score, pos)); pos += 1
          }
        }
        if (f.facet) out += ((docId, s":facet:${f.name}:$v", f.score, -1))
        if (f.filter) Tokenizer.tokenize(v).foreach { t =>
          out += ((docId, s":filter:${f.name}:$t", f.score, -1))
        }
        if (f.ordering) out += ((docId,
          s":ordering:${f.name}:${Tokenizer.toLowerAscii(v)}", f.score, -1))
      }
    }
    out.iterator
  }

  /** Split one raw value on the field's within-field separator (CSV/JSONL
    * multi-value convention; XML uses repeated elements instead and
    * additionally applies this).
    */
  def splitValues(f: CsvField, raw: String): Seq[String] =
    f.withinFieldSep match {
      case Some(s) => raw.split(java.util.regex.Pattern.quote(s), -1).toSeq
      case None => Seq(raw)
    }

  /** The `:info:` metadata entries on reserved doc 0
    * (CsvParser.cpp:877-910): build-config echo -- encoding, db name,
    * facet fields, multiple-value fields.
    */
  def infoEntries(path: String, fields: Seq[CsvField],
                  encoding: String): Seq[(String, String)] = {
    val base = new java.io.File(path).getName.split('.').head
    Seq("encoding" -> encoding.toLowerCase(java.util.Locale.ROOT),
        "name" -> base) ++
      fields.filter(_.facet).map(f => "facet" -> f.name) ++
      fields.filter(_.withinFieldSep.isDefined).map(f => "multiple" -> f.name)
  }
}

/** CSV/TSV ingest with reference field-role semantics (CsvParser.cpp):
  * one record per line, TAB-separated, header names fields; docId = line
  * number. Emits the words-file relation (term, doc_id, score, pos)
  * including the artificial facet/filter/ordering words, plus the docs
  * relation for excerpt/show fields.
  */
object CsvIngest {

  /** Parse a delimited file into (words, docs).
    * words: (doc_id, term, score, pos) -- pos = -1 for artificial words.
    * docs: (doc_id, <show fields...>).
    *
    * `encoding` is the reference's two-charset surface (StringConverter.h
    * loads utf8.map AND iso8859-1.map): legacy ISO-8859-1 databases
    * decode through Spark's text source with the charset applied, and
    * the SAME normalization serves both -- the reference iso8859-1.map's
    * norm column is codepoint-identical to utf8.map's on all 256 ISO
    * codepoints (TokenizerSpec pins this against both map files), so no
    * second fold table exists to diverge.
    */
  def parse(spark: SparkSession, path: String, fields: Seq[CsvField],
            delimiter: String = "\t",
            encoding: String = "UTF-8"): (DataFrame, DataFrame) = {
    import spark.implicits._
    // docId = line number (reference semantics) -> zipWithIndex over the
    // text file; deterministic for file sources. One of the few genuinely
    // RDD-shaped needs (stable line numbering). Non-UTF-8 encodings read
    // the same splittable TextInputFormat but decode each line's RAW
    // bytes with the requested charset (Text.toString is UTF-8-only;
    // ISO-8859-1 is single-byte so split boundaries stay line-aligned)
    // -- read order, and therefore line numbering, is identical.
    val lines =
      (if (encoding.equalsIgnoreCase("UTF-8"))
        spark.sparkContext.textFile(path)
      else {
        val enc = encoding
        spark.sparkContext.hadoopFile(path,
            classOf[org.apache.hadoop.mapred.TextInputFormat],
            classOf[org.apache.hadoop.io.LongWritable],
            classOf[org.apache.hadoop.io.Text])
          .map { case (_, t) =>
            new String(t.getBytes, 0, t.getLength, enc)
          }
      }).zipWithIndex()
    val header = lines.filter(_._2 == 0L).map(_._1).collect().head
      .split(java.util.regex.Pattern.quote(delimiter), -1)
    val colIdx = fields.map(f => f -> header.indexOf(f.name))
    colIdx.find(_._2 < 0).foreach { case (f, _) =>
      throw new IllegalArgumentException(s"field ${f.name} not in header: ${header.mkString(",")}")
    }
    val delim = delimiter
    val fieldSpecs = colIdx.map { case (f, i) => (f, i) }

    val rows = lines.filter(_._2 > 0L).map { case (line, ln) =>
      (ln, line.split(java.util.regex.Pattern.quote(delim), -1))
    }.toDS()

    val words = rows.flatMap { case (docId, cells) =>
      val byField = fieldSpecs.map { case (f, i) =>
        f -> (if (i < cells.length) cells(i) else "")
      }.toMap
      FieldRoles.emit(docId, fieldSpecs.map(_._1),
        f => FieldRoles.splitValues(f, byField(f)))
    }.toDF("doc_id", "term", "score", "pos")

    // :info: words (CsvParser.cpp:877-910) on the reserved doc_id 0 (the
    // header line), queryable as completions of `:info:`
    val info = FieldRoles.infoEntries(path, fields, encoding)
      .map { case (k, v) => (0L, Facets.infoTerm(k, v), 1, -1) }
      .toDF("doc_id", "term", "score", "pos")
    val allWords = words.unionByName(info)

    val showFields = fields.filter(_.show)
    val docs = rows.map { case (docId, cells) =>
      val shown = fieldSpecs.filter(_._1.show).map { case (_, i) =>
        if (i < cells.length) cells(i) else ""
      }
      (docId, shown)
    }.toDF("doc_id", "shown")
      .select(col("doc_id") +:
        showFields.zipWithIndex.map { case (f, j) =>
          element_at(col("shown"), j + 1).as(f.name)
        }: _*)

    (allWords, docs)
  }
}
