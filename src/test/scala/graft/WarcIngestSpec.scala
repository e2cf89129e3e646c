package graft

import graft.core.{WarcIngest, WebCorpus}
import org.scalatest.funsuite.AnyFunSuite

/** WARC framing parse: real record framing (header block, Content-Length
  * byte framing, HTTP header strip), non-response skipping, torn-tail
  * safety, and the corpus relation end to end.
  */
class WarcIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val Crlf = "\r\n"

  test("renderRecord/parseRecords round-trip; warcinfo skipped; torn tail dropped") {
    val html1 = "<html><body><p>hello world</p></body></html>".getBytes("UTF-8")
    val html2 = "<html><body><p>zwei &amp; drei</p></body></html>".getBytes("UTF-8")
    val warcinfo = (s"WARC/1.0${Crlf}WARC-Type: warcinfo${Crlf}Content-Length: 4$Crlf$Crlf" +
      s"described$Crlf$Crlf").getBytes("US-ASCII")
    // NOTE: warcinfo's Content-Length (4) deliberately under-frames its
    // body ("desc"); the parser must still resync because it skips by
    // declared length -- the stray "ribed" then fails the version-line
    // check and ends the parse at the last whole record. Build a SECOND
    // stream where framing is correct to check full multi-record parse.
    val good = {
      val o = new java.io.ByteArrayOutputStream()
      o.write((s"WARC/1.0${Crlf}WARC-Type: warcinfo${Crlf}Content-Length: 9$Crlf$Crlf" +
        s"described$Crlf$Crlf").getBytes("US-ASCII"))
      o.write(WarcIngest.renderRecord("https://a/1", "2024-01-01T00:00:00Z", html1))
      o.write(WarcIngest.renderRecord("https://a/2", "2024-01-02T00:00:00Z", html2))
      o.toByteArray
    }
    val recs = WarcIngest.parseRecords(good).toList
    assert(recs.map(_._1) === List("https://a/1", "https://a/2")) // warcinfo skipped
    assert(recs.head._2 === "2024-01-01T00:00:00Z")
    assert(recs.head._3.toSeq === html1.toSeq) // HTTP head stripped, body exact
    assert(recs(1)._3.toSeq === html2.toSeq)

    // torn tail: truncate the last record mid-payload -- the parse must
    // end at the last WHOLE record, never emit a partial document
    val torn = java.util.Arrays.copyOfRange(good, 0, good.length - 20)
    val tornRecs = WarcIngest.parseRecords(torn).toList
    assert(tornRecs.map(_._1) === List("https://a/1"))

    // under-framed garbage stream still terminates without throwing
    assert(WarcIngest.parseRecords(warcinfo).toList === Nil)
    assert(WarcIngest.parseRecords("junk not warc".getBytes).toList === Nil)
  }

  test("parseRecordsStream is record-at-a-time: first record costs one buffer, not the file") {
    // a ~10 MB stream of identical records, served through a COUNTING
    // stream: after consuming the first record the parser must have read
    // at most one fixed buffer (64 KB) + one record -- the structural
    // bounded-memory property that lets a ~1 GiB Common Crawl shard
    // ingest without whole-file buffering.
    val rec = WarcIngest.renderRecord("https://s/1", "2024-01-01T00:00:00Z",
      ("<html><body><p>" + ("x " * 40) + "</p></body></html>").getBytes("UTF-8"))
    val n = (10 * 1024 * 1024) / rec.length + 1
    var readCount = 0L
    val in = new java.io.InputStream {
      private var i = 0L
      private val total = n.toLong * rec.length
      override def read(): Int = {
        if (i >= total) -1
        else { val b = rec((i % rec.length).toInt) & 0xff; i += 1; readCount += 1; b }
      }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (i >= total) -1
        else {
          var k = 0
          while (k < len && i < total) {
            b(off + k) = rec((i % rec.length).toInt); i += 1; k += 1
          }
          readCount += k; k
        }
      }
    }
    val it = WarcIngest.parseRecordsStream(in)
    val first = it.next()
    assert(first._1 === "https://s/1")
    assert(readCount <= (1 << 16) + rec.length,
      s"read $readCount bytes for the first record -- not streaming")
    // and the stream parses out completely with the exact record count
    assert(1 + it.size === n)
  }

  test("truncated HTTP header block skips the record; non-HTTP payload passes whole") {
    // payload starts with an HTTP status line but the CRLFCRLF terminator
    // was torn off by the writer: indexing the header text as document
    // body would poison the corpus -> the record is skipped
    val truncated = (s"WARC/1.0${Crlf}WARC-Type: response$Crlf" +
      s"WARC-Target-URI: https://t/1${Crlf}Content-Length: 21$Crlf$Crlf" +
      s"HTTP/1.1 200 OK${Crlf}X: y$Crlf$Crlf").getBytes("US-ASCII")
    assert(WarcIngest.parseRecords(truncated).toList === Nil)
    // a response payload with no HTTP head at all is taken whole, as before
    val raw = (s"WARC/1.0${Crlf}WARC-Type: response$Crlf" +
      s"WARC-Target-URI: https://t/2${Crlf}Content-Length: 5$Crlf$Crlf" +
      s"plain$Crlf$Crlf").getBytes("US-ASCII")
    val recs = WarcIngest.parseRecords(raw).toList
    assert(recs.map(_._1) === List("https://t/2"))
    assert(new String(recs.head._3, "US-ASCII") === "plain")
  }

  test("corpus: WARC files become the standard corpus relation, text inverts byte-identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc")
    val texts = Seq("alpha beta gamma", "delta & <epsilon>")
    def record(t: String, i: Int): Array[Byte] = {
      // the WebCorpus wrapper, entity-escaped like real html
      val esc = t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      WarcIngest.renderRecord(s"https://w/$i", s"2024-01-0${i + 1}T00:00:00Z",
        s"<html><body><p>$esc</p></body></html>".getBytes("UTF-8"))
    }
    val os = java.nio.file.Files.newOutputStream(dir.resolve("a.warc"))
    try texts.zipWithIndex.foreach { case (t, i) => os.write(record(t, i)) }
    finally os.close()
    // the gzipped twin: CONCATENATED per-record gzip members, the real
    // Common Crawl .warc.gz layout — must parse identically
    val gz = java.nio.file.Files.newOutputStream(dir.resolve("b.warc.gz"))
    try texts.zipWithIndex.foreach { case (t, i) =>
      val g = new java.util.zip.GZIPOutputStream(gz)
      g.write(record(t, i + 2)); g.finish() // member per record, stream stays open
    } finally gz.close()
    val both = WarcIngest.corpus(spark, dir.toString).orderBy("doc_id").collect()
    assert(both.length === 4)
    assert(both.map(_.getAs[String]("text")).toSeq === texts ++ texts)
    val c = both.take(2)
    assert(c.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L))
    assert(c.map(_.getAs[String]("url")).toSeq === Seq("https://w/0", "https://w/1"))
    // extractText inverts the wrapper incl. entities: byte-identical text
    assert(c.map(_.getAs[String]("text")).toSeq === texts)
    assert(c.head.getAs[java.sql.Timestamp]("warc_ts") !== null)
    // html column carries the exact response body bytes
    assert(new String(c.head.getAs[Array[Byte]]("html"), "UTF-8")
      .contains("<p>alpha beta gamma</p>"))
  }
}
