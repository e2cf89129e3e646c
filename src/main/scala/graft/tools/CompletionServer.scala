package graft.tools

import graft.index.IndexReader
import org.apache.spark.sql.SparkSession

/** startCompletionServer analog (reference: StartCompletionServer.cpp /
  * CompletionServer.cpp:1597-1711): a minimal HTTP front on the
  * physical-path search facade, built on the JDK's embedded HttpServer --
  * no extra dependencies, the Spark session IS the backend.
  *
  * GET /?q=<query>[&h=<hits>][&c=<completions>][&er=<excerpt radius>]
  *     [&s=<4 agg chars>][&n=<a..b>][&callback=<fn>]
  * answers the reference-shaped JSON (`SearchResult.toJson`); `callback`
  * wraps it JSONP-style (QueryParameters formatDefault XML is not served
  * -- JSON only, the reference's `format=json` mode). `s=` sets the four
  * word/doc score-aggregation knobs per request
  * (QueryParameters.cpp:141-153, e.g. `s=SMSM`); `n=a..b` overrides the
  * `..` neighbourhood (QueryParameters.cpp:12-13, e.g. `n=-3..3`).
  * Queries run the FULL grammar off the block index through the
  * serving-session history ([[graft.query.IndexQueryCache]]), so a typing
  * stream of prefixes extends cached relations instead of re-scanning
  * blocks.
  */
object CompletionServer {

  /** Start a server on `port` (0 = ephemeral); returns the bound server.
    * One Spark session serves all requests; Spark handles intra-query
    * parallelism, the HTTP executor stays single-threaded per the
    * embedded server default.
    */
  def start(spark: SparkSession, indexDir: String, port: Int): com.sun.net.httpserver.HttpServer = {
    val reader = new IndexReader(spark, indexDir)
    reader.dictionary.count() // warm the dictionary before the first request
    val cache = new graft.query.IndexQueryCache()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(port), 0)
    server.createContext("/", (exchange: com.sun.net.httpserver.HttpExchange) => {
      // (status, body, jsonp?) -- ALL request processing stays inside the
      // try so malformed input (bad %-escape, non-numeric h=, n without
      // '..', bad s= chars, hostile callback) is a 400, never a dropped
      // connection or a fake 500
      val response: (Int, String, Boolean) =
        try {
          val params = parseQueryString(
            Option(exchange.getRequestURI.getRawQuery).getOrElse(""))
          params.get("q") match {
            case None | Some("") => (400, """{"error":"missing q parameter"}""", false)
            case Some(q) =>
              val k = params.get("h").map(_.toInt).getOrElse(10)
              val ck = params.get("c").map(_.toInt).getOrElse(10)
              val er = params.get("er").map(_.toInt).getOrElse(2)
              val qp0 = params.get("s")
                .map(graft.query.QueryParams.withAggChars(_))
                .getOrElse(graft.query.QueryParams.Default)
              val qp = params.get("n").map { n =>
                n.split("\\.\\.", 2) match {
                  case Array(a, b) => qp0.copy(window = Some((a.toInt, b.toInt)))
                  case _ => throw new IllegalArgumentException(s"bad n window: $n")
                }
              }.getOrElse(qp0)
              // JSONP callback restricted to identifier chars: the value is
              // reflected into an executable response, so anything else is
              // script injection
              val cb = params.get("callback")
              cb.foreach { c =>
                if (!c.matches("[A-Za-z0-9_$.]+"))
                  throw new IllegalArgumentException("invalid callback")
              }
              try {
                val result = graft.api.Search.searchIndex(
                  reader, q, k = k, completionsK = ck, excerptRadius = er,
                  cache = Some(cache), params = qp)
                cb match {
                  case Some(c) => (200, s"$c(${result.toJson})", true)
                  case None => (200, result.toJson, false)
                }
              } catch {
                case e: Throwable => // backend fault, not client input
                  (500, s"""{"error":"${e.getClass.getSimpleName}"}""", false)
              }
          }
        } catch {
          case e: Throwable => // anything thrown by input handling
            (400, s"""{"error":"bad request: ${e.getClass.getSimpleName}"}""", false)
        }
      val bytes = response._2.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      exchange.getResponseHeaders.set("Content-Type",
        if (response._3) "application/javascript; charset=utf-8"
        else "application/json; charset=utf-8")
      exchange.sendResponseHeaders(response._1, bytes.length)
      val os = exchange.getResponseBody
      try os.write(bytes) finally os.close()
    })
    server.start()
    server
  }

  private[graft] def parseQueryString(raw: String): Map[String, String] = {
    def dec(s: String) =
      java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)
    raw.split('&').filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      val (k, v) = if (i < 0) (kv, "") else (kv.substring(0, i), kv.substring(i + 1))
      dec(k) -> dec(v) // keys decode too: /?%71=spark is q=spark
    }.toMap
  }
}

/** CLI entry: `CompletionServerMain <indexDir> [port]` (default 8181). */
object CompletionServerMain {
  def main(args: Array[String]): Unit = {
    val Array(indexDir, rest @ _*) = args: @unchecked
    val port = rest.headOption.map(_.toInt).getOrElse(8181)
    val spark = Cli.session("graft-completionServer")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val server = CompletionServer.start(spark, indexDir, port)
    println(s"graft completion server listening on port " +
      s"${server.getAddress.getPort} (GET /?q=<query>&h=10&c=10)")
    Thread.currentThread().join() // serve until killed
  }
}
