package graft

import graft.core.{CsvField, CsvIngest}
import org.scalatest.funsuite.AnyFunSuite

/** CsvParserTest analog (reference CsvParserTest.cpp:122-492): write a
  * small delimited file, assert exact words/docs rows for each field role.
  */
class CsvIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def writeCsv(lines: Seq[String]): String = {
    val f = java.nio.file.Files.createTempFile("graft_csv", ".tsv")
    java.nio.file.Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("full-text, facet, filter, ordering and show roles") {
    val path = writeCsv(Seq(
      "Autor\tJahr\tTitel",
      "Mann, Thomas\t1924\tDer Zauberberg",
      "Kafka; Franz\t1915\tDie Verwandlung"))
    val fields = Seq(
      CsvField("Titel", fulltext = true, show = true, score = 2),
      CsvField("Autor", facet = true, filter = true),
      CsvField("Jahr", ordering = true, show = true))
    val (words, docs) = CsvIngest.parse(spark, path, fields)
    val w = words.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet

    // doc 1 (line 1): full-text words with positions + artificial words
    assert(w.contains((1L, "der", 2, 0)))
    assert(w.contains((1L, "zauberberg", 2, 1)))
    assert(w.contains((1L, ":facet:Autor:Mann, Thomas", 1, -1)))
    assert(w.contains((1L, ":filter:Autor:mann", 1, -1)))
    assert(w.contains((1L, ":filter:Autor:thomas", 1, -1)))
    assert(w.contains((1L, ":ordering:Jahr:1924", 1, -1)))
    assert(w.contains((2L, "verwandlung", 2, 1)))
    assert(w.contains((2L, ":facet:Autor:Kafka; Franz", 1, -1)))

    val d = docs.orderBy("doc_id").collect()
    assert(d.map(_.getAs[String]("Titel")).toSeq === Seq("Der Zauberberg", "Die Verwandlung"))
    assert(d.map(_.getAs[String]("Jahr")).toSeq === Seq("1924", "1915"))
  }

  test("within-field separator splits multi-values (movies.tsv shape)") {
    val path = writeCsv(Seq(
      "film\tgenre",
      "Alien\thorror#scifi"))
    val (words, _) = CsvIngest.parse(spark, path, Seq(
      CsvField("film", fulltext = true),
      CsvField("genre", facet = true, withinFieldSep = Some("#"))))
    val w = words.collect().map(r => r.getString(1)).toSet
    assert(w.contains(":facet:genre:horror"))
    assert(w.contains(":facet:genre:scifi"))
    assert(w.contains("alien"))
  }
}
