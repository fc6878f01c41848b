package graft.http

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import scala.util.control.NonFatal
import graft.tsdb.Graft

/** Thin HTTP facade over the embedded [[Graft]] API — the reference's server
  * surface (lib/orestes.js:69-230: /write, /read, /series, /select_distinct,
  * /delete) re-expressed over the Spark engine. Built on the JDK's
  * `com.sun.net.httpserver` (zero extra dependencies); JSON via the Jackson
  * already on Spark's classpath.
  *
  * This is a control-plane convenience, not the data plane: each handler
  * parses a small JSON body, drives the corresponding Graft call, and
  * JSON-serializes the (query-sized) result. The heavy lifting stays inside
  * Spark; only final results cross the HTTP boundary.
  *
  * POST bodies:
  *  - /write            {"space"?, "points": [{"time","value", ...tags}]}
  *  - /read             {"space"?, "filter"?, "start"?, "end"?}  → series arrays
  *  - /count            same as /read → per-series point counts
  *  - /series           same as /read → distinct tag sets
  *  - /select_distinct  {"space"?, "keys": [...], "filter"?}
  *  - /delete           {"space"?, "keep_days"}
  */
class GraftHttpServer(graft: Graft, spark: org.apache.spark.sql.SparkSession,
                      port: Int = 0) {
  private val mapper = new ObjectMapper()
  private var server: HttpServer = _

  private def textOr(node: JsonNode, key: String, dflt: String): String =
    if (node != null && node.has(key)) node.get(key).asText() else dflt
  private def longOr(node: JsonNode, key: String, dflt: Long): Long =
    if (node != null && node.has(key)) node.get(key).asLong() else dflt
  private def filterOf(node: JsonNode): String =
    if (node != null && node.has("filter")) node.get("filter").toString
    else """{"match_all":{}}"""

  /** One JSON line per row (Spark's toJSON), assembled into a JSON array.
    * Only for query-sized results (write errors, distinct tag values); big
    * reads go through [[handleStream]].
    */
  private def rowsJson(df: org.apache.spark.sql.DataFrame): String =
    df.toJSON.collect().mkString("[", ",", "]")

  /** Streaming read handler — the reference pages every big read through an
    * ES scroll cursor (lib/elasticsearch/query.js:27-32, orestes-query.js
    * fetch loops) so the server never holds the full result; the Spark
    * analog is `toLocalIterator` (one partition materialized at a time)
    * behind HTTP chunked transfer encoding (response length 0). Driver
    * memory is bounded by one partition regardless of result size, and the
    * first rows reach the client while later partitions are still being
    * computed.
    */
  private def handleStream(path: String)(f: JsonNode => org.apache.spark.sql.DataFrame): Unit =
    server.createContext(path, (ex: HttpExchange) => {
      var headersSent = false
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val node = if (body.trim.isEmpty) null else mapper.readTree(body)
        val rows = f(node).toJSON.toLocalIterator()
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, 0) // length 0 = chunked transfer
        headersSent = true
        val os = ex.getResponseBody
        os.write("""{"series":[""".getBytes(StandardCharsets.UTF_8))
        var first = true
        while (rows.hasNext) {
          if (!first) os.write(','.toInt)
          os.write(rows.next().getBytes(StandardCharsets.UTF_8))
          first = false
          os.flush() // each chunk leaves before the next partition computes
        }
        os.write("]}".getBytes(StandardCharsets.UTF_8))
      } catch {
        case e: IllegalArgumentException if !headersSent => sendFull(ex, 400, errJson(e))
        case NonFatal(e) if !headersSent                 => sendFull(ex, 500, errJson(e))
        // mid-stream failure: headers are gone; closing the exchange
        // truncates the chunked body, which the client sees as a broken read
      } finally ex.close()
    })

  private def sendFull(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  private def handle(path: String)(f: JsonNode => String): Unit =
    server.createContext(path, (ex: HttpExchange) => {
      val resp =
        try {
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val node = if (body.trim.isEmpty) null else mapper.readTree(body)
          (200, f(node))
        } catch {
          case e: IllegalArgumentException => (400, errJson(e))
          case NonFatal(e)                 => (500, errJson(e))
        }
      val bytes = resp._2.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(resp._1, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })

  private def errJson(e: Throwable): String =
    mapper.createObjectNode().put("error", String.valueOf(e.getMessage)).toString

  /** Start listening; returns the bound port (ephemeral when `port` = 0). */
  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    handle("/write") { node =>
      require(node != null && node.has("points") && node.get("points").isArray,
        """body must be {"points": [...]}""")
      val space = textOr(node, "space", "default")
      import spark.implicits._
      val lines = node.get("points").elements()
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (lines.hasNext) buf += lines.next().toString
      require(buf.nonEmpty, "points must be non-empty")
      val points = spark.read.json(buf.toSeq.toDS())
      val errors = graft.write(points, space)
      s"""{"errors":${rowsJson(errors)}}"""
    }
    handleStream("/read") { node =>
      graft.readSeries(filterOf(node), textOr(node, "space", "default"),
        longOr(node, "start", Long.MinValue), longOr(node, "end", Long.MaxValue))
    }
    handleStream("/count") { node =>
      graft.countPoints(filterOf(node), textOr(node, "space", "default"),
        longOr(node, "start", Long.MinValue), longOr(node, "end", Long.MaxValue))
    }
    handleStream("/series") { node =>
      graft.seriesList(filterOf(node), textOr(node, "space", "default"),
        longOr(node, "start", Long.MinValue), longOr(node, "end", Long.MaxValue))
    }
    handle("/select_distinct") { node =>
      require(node != null && node.has("keys") && node.get("keys").isArray,
        """body must include "keys": [...]""")
      val keys = {
        val it = node.get("keys").elements()
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) b += it.next().asText()
        b.toSeq
      }
      val out = graft.selectDistinct(keys, filterOf(node), textOr(node, "space", "default"))
      s"""{"values":${rowsJson(out)}}"""
    }
    handle("/delete") { node =>
      require(node != null && node.has("keep_days"), """body must include "keep_days"""")
      val dropped = graft.remove(node.get("keep_days").asInt(),
        textOr(node, "space", "default"))
      s"""{"dropped_buckets":${dropped.mkString("[", ",", "]")}}"""
    }
    server.setExecutor(null) // serve on the dispatch thread; a facade, not a pool
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)
}
