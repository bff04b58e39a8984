package graft.serving

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.cells.CellIndex.BBox
import graft.fixtures.Fixtures.{NodeRow, RelMemberRow, RelationRow, WayRow}
import graft.operators.PlanetExtract
import graft.operators.PlanetExtract.PlanetTables
import graft.sources.{PbfCodec, VexSink}

/**
 * S7: the reference's HTTP serving layer (vexserver.js:19-75) re-expressed
 * as a driver-embedded endpoint over the Spark tables — the same pattern
 * as Spark's own UI server: the engine stays a library, and this thin
 * JDK-httpserver wrapper exposes the bounded-extract surface.
 *
 * Contract replicated from vexserver.js:
 *  - `GET /?north=<lat>&south=<lat>&east=<lon>&west=<lon>` (or the
 *    one-letter aliases `n/s/e/w`), any parameter order;
 *  - missing/non-numeric params -> 400 with the reference's usage text
 *    (vexserver.js:27-34); inverted or out-of-range boxes -> 400 with the
 *    reference's exact messages (vexserver.js:36-52);
 *  - success -> `application/octet-stream` with the reference's
 *    `osm_export_<midlat>_<midlon>.pbf` attachment name
 *    (vexserver.js:56-61) and a PBF body (nodes -> ways -> relations,
 *    streamed in 8k blocks);
 *  - extension: `&format=vex` serves the VEX encoding instead (the
 *    reference selects VEX by output-file extension, vex.c:866-869 —
 *    a server query param is the HTTP analogue), with the entity counts
 *    the format itself lacks in `X-Vex-Nodes` / `X-Vex-Ways` headers.
 *
 * Extract semantics = [[PlanetExtract.bbox]] fixed mode (cell-granular,
 * emit-once nodes), materialized driver-side like every bounded-extract
 * sink (writePbfFileLocal contract) — serving is a small-result surface;
 * planet-scale output goes through the distributed sinks instead.
 */
final class ExtractServer(t: PlanetTables, host: String = "0.0.0.0",
                          port: Int = 8282) {

  private val server = HttpServer.create(new InetSocketAddress(host, port), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(null)   // serve on the dispatcher thread (bounded use)

  /** Start serving; returns the BOUND port (pass port=0 for ephemeral). */
  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)

  private def respond(ex: HttpExchange, code: Int, ctype: String,
                      body: Array[Byte]): Unit = {
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(code, body.length.toLong)
    try ex.getResponseBody.write(body) finally ex.close()
  }
  private def bad(ex: HttpExchange, msg: String): Unit =
    respond(ex, 400, "text/plain", msg.getBytes("UTF-8"))

  private def handle(ex: HttpExchange): Unit =
    try handleInner(ex)
    catch {
      case e: Throwable =>
        try respond(ex, 500, "text/plain",
          s"extract failed: ${e.getMessage}".getBytes("UTF-8"))
        catch { case _: Throwable => ex.close() }
    }

  private def handleInner(ex: HttpExchange): Unit = {
    val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      .split("&").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
    def num(full: String, short: String): Double =
      q.get(full).orElse(q.get(short)).map(s =>
        try s.toDouble catch { case _: NumberFormatException => Double.NaN })
        .getOrElse(Double.NaN)
    val north = num("north", "n"); val south = num("south", "s")
    val east = num("east", "e"); val west = num("west", "w")
    if (north.isNaN || south.isNaN || east.isNaN || west.isNaN)
      return bad(ex,
        "Usage: ?north=<lat>&south=<lat>&east=<lon>&west=<lon>\n" +
          "   or: ?n=<lat>&s=<lat>&e=<lon>&w=<lon>\norder is not important")
    if (north <= south || east <= west)
      return bad(ex, "North must be north of south; east must be east of west")
    if (north < -90 || north > 90 || south < -90 || south > 90)
      return bad(ex, "Latitudes must be between -90 and 90")
    if (west < -180 || west > 180 || east < -180 || east > 180)
      return bad(ex, "Longitudes must be between -180 and 180")

    val (nodes, ways, rels) = extractEntityIters(BBox(west, south, east, north))
    val vexFormat = q.get("format").contains("vex")
    val suffix = if (vexFormat) "vex" else "pbf"
    val disposition =
      s"attachment;filename=osm_export_${jsNum((north + south) / 2)}_" +
        s"${jsNum((east + west) / 2)}.$suffix"
    if (vexFormat) {
      // VEX stays buffered: its entity COUNTS ride in response headers
      // (the format itself has none), and headers must be committed
      // before the first body byte — counting requires encoding first.
      // Bounded-extract-by-contract covers it; the PBF path below is the
      // reference-parity surface and streams.
      val bos = new java.io.ByteArrayOutputStream()
      val (nn, nw) = VexSink.write(bos, nodes.toSeq, ways.toSeq)
      ex.getResponseHeaders.set("X-Vex-Nodes", nn.toString)
      ex.getResponseHeaders.set("X-Vex-Ways", nw.toString)
      ex.getResponseHeaders.set("Content-Disposition", disposition)
      respond(ex, 200, "application/octet-stream", bos.toByteArray)
    } else {
      // STREAMED response (vexserver.js:65-68 pipes the child's stdout
      // the same way): chunked transfer, the encoder pulls lazily from
      // the per-kind toLocalIterator, so driver memory holds one result
      // partition + one 8k entity block — never the whole extract
      // (round 6; the buffered form materialized all three entity sets
      // AND the full PBF byte array). A mid-stream failure can no longer
      // become a 500 (headers are committed) — the truncated-body
      // tradeoff every streaming server makes.
      ex.getResponseHeaders.set("Content-Type", "application/octet-stream")
      ex.getResponseHeaders.set("Content-Disposition", disposition)
      ex.sendResponseHeaders(200, 0)
      try PbfCodec.writePbfFileStreaming(ex.getResponseBody, nodes, ways, rels)
      finally ex.close()
    }
  }

  /** JS Number stringification for the attachment name: integral values
    * print without the ".0" Java's Double.toString would add (the
    * reference's midpoints come out of JS arithmetic, vexserver.js:60). */
  private def jsNum(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  private def mapOf(r: Row, field: String): Map[String, String] =
    if (r.schema.fieldNames.contains(field))
      Option(r.getAs[Map[String, String]](field)).getOrElse(Map.empty)
    else Map.empty

  /** Entity-level bbox extract — exactly [[PlanetExtract.bbox]]'s row set
    * (fixed mode, via the SHARED PlanetExtract.selectedEntityFrames
    * selection so the HTTP surface cannot drift from the extract
    * semantics) with full payloads, as LAZY per-kind iterators:
    * `toLocalIterator` fetches one result partition at a time, so the
    * driver never holds a whole entity set (round 6 — the collect() form
    * was the one scale-unsafe driver materialization left in the repo).
    * Emission order inside each kind is id-ascending: orderBy produces
    * range-partitioned output, and toLocalIterator walks partitions in
    * order, so the streamed order equals the collected order
    * (deterministic responses; byte-golden reference order is
    * [[PlanetExtract.bboxOrdered]]'s job). */
  private def extractEntityIters(b: BBox)
      : (Iterator[NodeRow], Iterator[WayRow], Iterator[RelationRow]) = {
    import scala.jdk.CollectionConverters._
    val (selNodes, selWays, selRels) =
      PlanetExtract.selectedEntityFrames(t, b)
    val nodes = selNodes
      .select(t.nodes.columns.map(col): _*).orderBy("id")
      .toLocalIterator().asScala
      .map(r => NodeRow(r.getAs[Long]("id"), r.getAs[Double]("lon"),
        r.getAs[Double]("lat"), mapOf(r, "tags")))
    val ways = selWays.orderBy("id").toLocalIterator().asScala
      .map(r => WayRow(r.getAs[Long]("id"),
        r.getAs[scala.collection.Seq[Long]]("refs").toArray,
        mapOf(r, "tags")))
    val rels = selRels.orderBy("id").toLocalIterator().asScala
      .map(r => RelationRow(r.getAs[Long]("id"),
        r.getAs[scala.collection.Seq[Row]]("members").map(m =>
          RelMemberRow(m.getAs[String]("role"), m.getAs[Byte]("mtype"),
            m.getAs[Long]("ref"))).toArray,
        mapOf(r, "tags")))
    (nodes, ways, rels)
  }
}
