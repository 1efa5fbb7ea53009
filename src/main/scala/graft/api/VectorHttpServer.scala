package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import graft.core.VectorRecord

/** The reference's served-API surface over the facade
  * (API.gRPC/Services/RestServices.cs:15-92 routes;
  * API.gRPC/Protos/Vector.proto:31-38 +
  * API.gRPC/Services/VectorService.cs:18-110 method semantics).
  *
  * Transport substitution (declared): the reference serves gRPC
  * (protobuf/HTTP2) and REST side by side from ASP.NET. This build has no
  * protobuf/grpc dependency surface, so BOTH are served as JSON over the
  * JDK's built-in HTTP server; every gRPC rpc maps to a route with the
  * same observable semantics:
  *
  * | rpc / REST route            | here                          |
  * |-----------------------------|-------------------------------|
  * | GetVectors                  | GET    /vectors               |
  * | AddVector / POST /vector    | POST   /vector  → 201+Location|
  * | GetVectorById / GET /vector/{id} | GET /vector/{id} → 200/404|
  * | UpdateVector / PUT /vector/{id}  | PUT /vector/{id} → 200/404|
  * | (delete)  DELETE /vector/{id}    | DELETE /vector/{id} → 204/404|
  * | SearchNearest / POST /vectors/searchNearest?k= | same → 200  |
  * | ClearVectors / DELETE /db/clear  | same → 204               |
  *
  * DTO shape: `{id, values[], tags[], originalText}`; search responses add
  * `dist`. Update drops tags/attributes exactly like the facade
  * (VectorList.cs:184-187 quirk). Search uses the facade's default
  * algorithm + threshold, like `_db.Search(query, k)` in VectorService
  * (`:74-84`).
  *
  * Serving note: this is a driver-embedded control-plane API (the Spark
  * driver is the single writer, exactly like the reference's in-process
  * VectorDatabase); the data plane stays the distributed query surface.
  */
class VectorHttpServer(val db: NeighborlySpark, port: Int = 0) {

  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.setExecutor(null) // serial dispatch: the facade is single-writer
  server.createContext("/", (ex: HttpExchange) => handle(ex))

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)

  // ----------------------------------------------------------- dispatch

  private def handle(ex: HttpExchange): Unit =
    try {
      val path = ex.getRequestURI.getPath
      (ex.getRequestMethod, path) match {
        case ("GET", "/vectors")                   => getVectors(ex)
        case ("POST", "/vector")                   => addVector(ex)
        case ("GET", VectorId(id))                 => getVectorById(ex, id)
        case ("PUT", VectorId(id))                 => updateVector(ex, id)
        case ("DELETE", VectorId(id))              => deleteVector(ex, id)
        case ("POST", "/vectors/searchNearest")    => searchNearest(ex)
        case ("GET", "/metrics")                   => metrics(ex)
        case ("DELETE", "/db/clear")               => clearVectors(ex)
        case _                                     => respond(ex, 404, None)
      }
    } catch {
      case e: IllegalArgumentException =>
        val err = mapper.createObjectNode(); err.put("error", e.getMessage)
        respond(ex, 400, Some(err))
      case scala.util.control.NonFatal(e) =>
        val err = mapper.createObjectNode(); err.put("error", String.valueOf(e))
        respond(ex, 500, Some(err))
    } finally ex.close()

  private object VectorId {
    def unapply(path: String): Option[String] =
      if (path.startsWith("/vector/") && path.length > 8) Some(path.drop(8)) else None
  }

  // ------------------------------------------------------------- routes

  /** GetVectors (VectorService.cs:18-37): the whole table by default
    * (reference parity: GetVectors returns everything), with optional
    * `?limit=&offset=` paging — id-ordered so pages are stable — for
    * engine-scale tables where materializing the full table on the
    * driver is not an option. Clients beyond toy scale should page. */
  private def getVectors(ex: HttpExchange): Unit = {
    val params = queryParams(ex)
    val limit = params.get("limit").map(_.toInt)
    val offset = params.get("offset").map(_.toInt).getOrElse(0)
    // either param activates paging (an offset without a limit pages to
    // the end — never silently ignored)
    val frame = if (limit.isDefined || offset > 0) {
      require(limit.forall(_ >= 0) && offset >= 0, "limit/offset must be non-negative")
      db.vectors.orderBy(org.apache.spark.sql.functions.col("id"))
        .offset(offset).limit(limit.getOrElse(Int.MaxValue))
    } else db.vectors
    val arr = mapper.createArrayNode()
    frame.collect().foreach { r =>
      arr.add(recordNode(VectorHttpServer.rowToRecord(r), None))
    }
    respond(ex, 200, Some(arr))
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).toSeq
      .flatMap(_.split('&').toSeq)
      .flatMap { kv => kv.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _ => None
      } }.toMap

  /** POST /vector (RestServices.cs:15-23): 201 + Location, echoes the DTO. */
  private def addVector(ex: HttpExchange): Unit = {
    val dto = mapper.readTree(ex.getRequestBody)
    val id = db.addVector(parseDto(dto))
    ex.getResponseHeaders.set("Location", s"/vector/$id")
    respond(ex, 201, Some(recordNode(db.getVector(id).get, None)))
  }

  /** GET /vector/{id} (RestServices.cs:25-40): 200 or 404. */
  private def getVectorById(ex: HttpExchange, id: String): Unit =
    db.getVector(id) match {
      case Some(r) => respond(ex, 200, Some(recordNode(r, None)))
      case None => respond(ex, 404, None)
    }

  /** PUT /vector/{id} (RestServices.cs:42-56): update keeps the id, drops
    * tags/attributes (the facade's VectorList.Update parity); 200/404. */
  private def updateVector(ex: HttpExchange, id: String): Unit = {
    val dto = parseDto(mapper.readTree(ex.getRequestBody))
    if (db.updateVector(id, dto.values, dto.original_text))
      respond(ex, 200, Some(recordNode(db.getVector(id).get, None)))
    else respond(ex, 404, None)
  }

  /** DELETE /vector/{id} (RestServices.cs:58-71): 204 or 404. */
  private def deleteVector(ex: HttpExchange, id: String): Unit =
    if (db.removeVector(id)) respond(ex, 204, None) else respond(ex, 404, None)

  /** POST /vectors/searchNearest?k= (RestServices.cs:73-87 /
    * VectorService.cs:74-84): facade default dispatch, full records +
    * dist in result order — ONE Spark action per request via
    * `searchRecords` (the k-row hit set joins back to the table; no
    * per-hit driver round-trips). */
  private def searchNearest(ex: HttpExchange): Unit = {
    val k = queryParams(ex).get("k").map(_.toInt).getOrElse(10)
    val dto = parseDto(mapper.readTree(ex.getRequestBody))
    val arr = mapper.createArrayNode()
    db.searchRecords(dto.values, k).foreach { case (r, dist) =>
      arr.add(recordNode(r, Some(dist)))
    }
    respond(ex, 200, Some(arr))
  }

  /** GET /metrics — the OTel-export analog (VectorDatabase.cs:342-348
    * registers an ObservableGauge + per-search activities; this serves
    * the same signals as JSON): live vector count (observable — read on
    * request), search span counters, and the serve-group job count. */
  private def metrics(ex: HttpExchange): Unit = {
    val m = db.metrics
    val n = mapper.createObjectNode()
    n.put("vectorCount", m.vectorCount)
    n.put("searchCount", m.searchCount.get())
    n.put("searchNanos", m.searchNanos.get())
    n.put("serveJobs", m.serveJobs.get())
    respond(ex, 200, Some(n))
  }

  /** DELETE /db/clear (RestServices.cs:89-92 / ClearVectors :100-110). */
  private def clearVectors(ex: HttpExchange): Unit = { db.clear(); respond(ex, 204, None) }

  // ---------------------------------------------------------------- dto

  private def parseDto(n: JsonNode): VectorRecord = {
    require(n != null && n.has("values") && n.get("values").isArray,
      "body must be a vector DTO with a float 'values' array")
    val vs = n.get("values").asInstanceOf[ArrayNode]
    val values = Array.tabulate(vs.size())(i => vs.get(i).floatValue())
    val tags: Array[Short] =
      if (n.has("tags") && n.get("tags").isArray) {
        val ts = n.get("tags").asInstanceOf[ArrayNode]
        Array.tabulate(ts.size())(i => ts.get(i).shortValue())
      } else Array.empty
    VectorRecord(
      if (n.hasNonNull("id")) n.get("id").asText() else "",
      values, tags,
      if (n.hasNonNull("originalText")) n.get("originalText").asText() else "")
  }

  private def recordNode(r: VectorRecord, dist: Option[Double]): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("id", r.id)
    val vs = n.putArray("values"); r.values.foreach(vs.add)
    val ts = n.putArray("tags"); r.tags.foreach(t => ts.add(t.toInt))
    n.put("originalText", r.original_text)
    dist.foreach(d => n.put("dist", d))
    n
  }

  private def respond(ex: HttpExchange, code: Int, body: Option[JsonNode]): Unit =
    body match {
      case None => ex.sendResponseHeaders(code, -1)
      case Some(n) =>
        val bytes = mapper.writeValueAsString(n).getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(code, bytes.length.toLong)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
    }
}

object VectorHttpServer {

  /** Build a SERVED facade the way the reference's service process does:
    * the hosted `VectorDatabase` (API.gRPC/Program.cs:14 singleton)
    * always runs the debounced background index thread
    * (VectorDatabase.cs:124,501-540), so `autoRebuild` defaults ON here —
    * unlike the embedded facade, where it stays opt-in. A served write
    * therefore invalidates warm indexes immediately (the always-fresh
    * fallback guarantee) and the warm path comes back on its own after
    * the 5 s quiet period, with no client-visible action. */
  def serve(spark: org.apache.spark.sql.SparkSession, dimension: Int,
      port: Int = 0, autoRebuild: Boolean = true,
      autoRebuildDelayMs: Long = 5000): VectorHttpServer =
    new VectorHttpServer(new NeighborlySpark(spark, dimension,
      autoRebuild = autoRebuild, autoRebuildDelayMs = autoRebuildDelayMs), port)

  private[api] def rowToRecord(r: org.apache.spark.sql.Row): VectorRecord = VectorRecord(
    r.getAs[String]("id"),
    r.getAs[scala.collection.Seq[Float]]("values").toArray,
    r.getAs[scala.collection.Seq[Short]]("tags").toArray,
    r.getAs[String]("original_text"),
    r.getAs[Byte]("priority"), r.getAs[Long]("user_id"), r.getAs[Long]("org_id"))
}
