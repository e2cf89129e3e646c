package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSONL corpus ingest — one JSON object per line, the de-facto
  * interchange format of web-scale text corpora (and the natural third
  * database format next to the reference's CSV/XML parsers; field-role
  * semantics are [[CsvField]]'s, shared via [[FieldRoles]]).
  *
  * Conventions:
  *   - docId = line number + 1 (1-based like the CSV path; JSONL has no
  *     header line, doc 0 stays reserved for the `:info:` words);
  *   - a JSON ARRAY value is the multi-value form (like XML repeated
  *     elements); `withinFieldSep` additionally splits within each
  *     element; scalar values stringify (numbers/booleans as their JSON
  *     text), null/missing fields are empty;
  *   - lines that are blank or not JSON objects are skipped with their
  *     line number retained, so doc ids stay stable under cleanup.
  *
  * Spark shape: the same splittable line source as the CSV path
  * (`textFile` + `zipWithIndex` for stable line numbering); Jackson (on
  * Spark's classpath) parses each line inside the flatMap — streaming,
  * one record of state per task.
  */
object JsonlIngest {

  /** One Jackson mapper per executor JVM: ObjectMapper is thread-safe
    * for reads and heavyweight to construct; module (object) fields are
    * initialized lazily per JVM and never serialized into the closure.
    */
  private object Json {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  }

  /** Parse a JSONL file into (words, docs) — the exact
    * [[CsvIngest.parse]] output shape, so everything downstream
    * (IndexBuilder, facet queries, docs store) is input-format agnostic.
    */
  def parse(spark: SparkSession, path: String, fields: Seq[CsvField])
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    val fieldSpecs = fields
    // persisted: BOTH outputs (words and docs) consume `rows`, and the
    // per-line Jackson parse is the heaviest per-record work of this
    // ingest -- without the persist every line is read and parsed twice
    // per build. MEMORY_AND_DISK so a corpus-sized ingest spills instead
    // of evicting; the ContextCleaner frees the blocks once both
    // consumers' plans are garbage-collected.
    val rows = spark.sparkContext.textFile(path).zipWithIndex()
      .flatMap { case (line, ln) =>
        if (line.trim.isEmpty) None
        else {
          val node = try Json.mapper.readTree(line)
          catch { case scala.util.control.NonFatal(_) => null }
          if (node == null || !node.isObject) None
          else {
            val m: Map[String, Seq[String]] = fieldSpecs.map { f =>
              val v = node.get(f.name)
              f.name -> {
                if (v == null || v.isNull) Seq.empty[String]
                else if (v.isArray) {
                  val b = Seq.newBuilder[String]
                  v.forEach(e => b += (if (e.isTextual) e.asText else e.toString))
                  b.result()
                } else Seq(if (v.isTextual) v.asText else v.toString)
              }
            }.toMap
            Some((ln + 1, m))
          }
        }
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val words = rows.flatMap { case (docId, m) =>
      FieldRoles.emit(docId, fieldSpecs, f =>
        m.getOrElse(f.name, Seq.empty)
          .flatMap(v => FieldRoles.splitValues(f, v)))
    }.toDF("doc_id", "term", "score", "pos")

    val info = FieldRoles.infoEntries(path, fields, "utf-8")
      .map { case (k, v) => (0L, Facets.infoTerm(k, v), 1, -1) }
      .toDF("doc_id", "term", "score", "pos")
    val allWords = words.unionByName(info)

    val showFields = fields.filter(_.show)
    val docs = rows.map { case (docId, m) =>
      (docId, showFields.map(f => m.getOrElse(f.name, Seq.empty).mkString(" ")))
    }.toDF("doc_id", "shown")
      .select(col("doc_id") +:
        showFields.zipWithIndex.map { case (f, j) =>
          element_at(col("shown"), j + 1).as(f.name)
        }: _*)

    (allWords, docs)
  }
}
