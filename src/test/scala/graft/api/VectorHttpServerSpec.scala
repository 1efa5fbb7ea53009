package graft.api

import graft.SparkSpec

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** In-process round-trip over the served API — the analog of
  * Tests/Integration/RestTests.cs / GrpcTests.cs (add → get → search →
  * update → delete → clear). */
class VectorHttpServerSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def req(base: String, method: String, path: String, body: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"$base$path"))
    val r = method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m, HttpRequest.BodyPublishers.ofString(body))
    }
    client.send(r.build(), HttpResponse.BodyHandlers.ofString())
  }

  test("REST/gRPC-parity round-trip: add, get, list, search, update, delete, clear") {
    val db = new NeighborlySpark(spark, 2)
    val srv = new VectorHttpServer(db)
    val port = srv.start()
    val base = s"http://127.0.0.1:$port"
    try {
      // AddVector → 201 + Location (RestServices.cs:15-23)
      val add = req(base, "POST", "/vector",
        """{"id":"v1","values":[0.0,0.0],"tags":[1],"originalText":"origin"}""")
      assert(add.statusCode() === 201)
      assert(add.headers().firstValue("Location").get === "/vector/v1")

      req(base, "POST", "/vector", """{"id":"v2","values":[3.0,0.0],"originalText":"far"}""")

      // GetVectorById → 200 with DTO; unknown id → 404 (RestServices.cs:25-40)
      val got = req(base, "GET", "/vector/v1")
      assert(got.statusCode() === 200)
      assert(got.body().contains("\"origin\"") && got.body().contains("\"tags\":[1]"))
      assert(req(base, "GET", "/vector/nope").statusCode() === 404)

      // GetVectors → whole table (VectorService.cs:18-37)
      val all = req(base, "GET", "/vectors")
      assert(all.statusCode() === 200)
      assert(all.body().contains("\"v1\"") && all.body().contains("\"v2\""))

      // SearchNearest: facade default dispatch + threshold (VectorService.cs:74-84)
      val hits = req(base, "POST", "/vectors/searchNearest?k=2",
        """{"values":[0.1,0.0]}""")
      assert(hits.statusCode() === 200)
      assert(hits.body().contains("\"v1\"") && hits.body().contains("\"dist\""))
      assert(!hits.body().contains("\"v2\"")) // dist 2.9 > default threshold 0.5

      // UpdateVector: keeps id, drops tags (VectorList.cs:184-187 quirk); 404 for unknown
      val upd = req(base, "PUT", "/vector/v1",
        """{"values":[1.0,1.0],"originalText":"moved"}""")
      assert(upd.statusCode() === 200)
      val after = req(base, "GET", "/vector/v1")
      assert(after.body().contains("\"moved\"") && after.body().contains("\"tags\":[]"))
      assert(req(base, "PUT", "/vector/nope", """{"values":[1.0,1.0]}""").statusCode() === 404)

      // malformed body → 400, not a hung connection
      assert(req(base, "POST", "/vector", """{"nope":true}""").statusCode() === 400)

      // DELETE → 204 then 404 (RestServices.cs:58-71)
      assert(req(base, "DELETE", "/vector/v2").statusCode() === 204)
      assert(req(base, "DELETE", "/vector/v2").statusCode() === 404)

      // ClearVectors → 204, table empties (VectorService.cs:100-110)
      assert(req(base, "DELETE", "/db/clear").statusCode() === 204)
      assert(db.count === 0L)
      assert(req(base, "GET", "/vectors").body() === "[]")
    } finally srv.stop()
  }

  test("GET /metrics serves the gauge and search counters") {
    val db = new NeighborlySpark(spark, 2)
    (1 to 3).foreach(i => db.addVector(
      graft.core.VectorRecord(s"m$i", Array(i.toFloat, 0f))))
    val srv = new VectorHttpServer(db)
    val base = s"http://127.0.0.1:${srv.start()}"
    try {
      req(base, "POST", "/vectors/searchNearest?k=2", """{"values":[0.0,0.0]}""")
      val body = req(base, "GET", "/metrics").body()
      assert(body.contains("\"vectorCount\":3"))
      assert(body.contains("\"searchCount\":1"))
      assert(body.contains("\"searchNanos\""))
    } finally srv.stop()
  }

  test("GET /vectors pages with limit/offset, id-ordered") {
    val db = new NeighborlySpark(spark, 2)
    (1 to 5).foreach(i => db.addVector(
      graft.core.VectorRecord(f"v$i%02d", Array(i.toFloat, 0f))))
    val srv = new VectorHttpServer(db)
    val base = s"http://127.0.0.1:${srv.start()}"
    try {
      val page = req(base, "GET", "/vectors?limit=2&offset=1").body()
      assert(page.contains("\"v02\"") && page.contains("\"v03\""))
      assert(!page.contains("\"v01\"") && !page.contains("\"v04\""))
      // no params → reference parity, the whole table
      val all = req(base, "GET", "/vectors").body()
      (1 to 5).foreach(i => assert(all.contains(f""""v$i%02d"""")))
    } finally srv.stop()
  }

  test("unpaged GET /vectors streams record-by-record, never an O(table) buffer") {
    val db = new NeighborlySpark(spark, 2)
    val n = 25
    (1 to n).foreach(i => db.addVector(
      graft.core.VectorRecord(f"s$i%02d", Array(i.toFloat, 0f))))
    val srv = new VectorHttpServer(db)
    val base = s"http://127.0.0.1:${srv.start()}"
    try {
      val before = srv.streamedRestListRecords.get()
      val all = req(base, "GET", "/vectors")
      assert(all.statusCode() === 200)
      // chunked transfer: no Content-Length — the server never computed
      // a full-table body up front
      assert(all.headers().firstValue("Content-Length").isEmpty)
      // every record went through the incremental write path (a buffered
      // ArrayNode reply would leave the counter untouched)
      assert(srv.streamedRestListRecords.get() - before === n.toLong)
      // and the streamed concatenation is still one valid JSON array
      val parsed = new com.fasterxml.jackson.databind.ObjectMapper().readTree(all.body())
      assert(parsed.isArray && parsed.size() === n)
      // the paged path streams through the same counter
      req(base, "GET", "/vectors?limit=3")
      assert(srv.streamedRestListRecords.get() - before === (n + 3).toLong)
    } finally srv.stop()
  }

  test("searchNearest answers a k=10 search in O(1) Spark jobs, not k+1") {
    val db = new NeighborlySpark(spark, 2)
    (1 to 30).foreach(i => db.addVector(
      graft.core.VectorRecord(f"v$i%02d", Array(i.toFloat / 100f, 0f))))
    val srv = new VectorHttpServer(db)
    val base = s"http://127.0.0.1:${srv.start()}"
    try {
      // warm the serve path once (first call pays codegen/session setup)
      req(base, "POST", "/vectors/searchNearest?k=10", """{"values":[0.0,0.0]}""")
      waitForListeners()
      val before = db.metrics.serveJobs.get()
      val searches = db.metrics.searchCount.get()
      val hits = req(base, "POST", "/vectors/searchNearest?k=10", """{"values":[0.0,0.0]}""")
      assert(hits.statusCode() === 200)
      assert(hits.body().contains("\"v01\"") && hits.body().contains("\"dist\""))
      waitForListeners()
      val jobs = db.metrics.serveJobs.get() - before
      // one collect action; AQE/broadcast may add a helper job — never the
      // k+1 per-hit pattern (would be ≥ 11 here)
      assert(jobs >= 1 && jobs <= 3, s"searchNearest ran $jobs serve jobs")
      assert(db.metrics.searchCount.get() === searches + 1)
      assert(db.metrics.searchNanos.get() > 0)
      assert(db.metrics.vectorCount === 30L) // observable gauge, live table
    } finally srv.stop()
  }

  private def waitForListeners(): Unit = {
    // listener bus is async; drain before reading counters
    val deadline = System.nanoTime() + 5e9.toLong
    var last = -1L
    while (System.nanoTime() < deadline && {
      val now = spark.sparkContext.statusTracker.getActiveJobIds().length
      val stable = now == 0 && last == 0; last = now; !stable
    }) Thread.sleep(50)
    Thread.sleep(200)
  }
}
