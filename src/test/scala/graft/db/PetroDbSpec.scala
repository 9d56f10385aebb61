package graft.db

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.TestSpark

/** PetroDB source tests against an in-process HTTP server emulating the
  * remote API (token auth, project/sample/spot navigation). */
class PetroDbSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  var server: HttpServer = _
  var port: Int = _
  @volatile var tokenIssued = 0

  def handler(fn: HttpExchange => (Int, String)): HttpHandler = (ex: HttpExchange) => {
    val (code, body) = fn(ex)
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  def authed(ex: HttpExchange): Boolean =
    Option(ex.getRequestHeaders.getFirst("Authorization")).exists(_.startsWith("Bearer tok"))

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/token", handler { _ =>
      tokenIssued += 1
      (200, s"""{"access_token": "tok$tokenIssued", "token_type": "bearer"}""")
    })
    server.createContext("/search/project/", handler { ex =>
      if (!authed(ex)) (401, "{}")
      else (200, """{"id": 7, "name": "TestProject"}""")
    })
    server.createContext("/samples/", handler { ex =>
      if (!authed(ex)) (401, "{}")
      else (200, """[{"id": 1, "name": "S1"}, {"id": 2, "name": "S2"}]""")
    })
    server.createContext("/spots/", handler { ex =>
      if (!authed(ex)) (401, "{}")
      else {
        val sid = ex.getRequestURI.getPath.split("/").last.toInt
        val base = sid * 100
        (200,
          s"""[{"id": ${base + 1}, "sample": "S$sid", "label": "a", "mineral": "Garnet",
              "values": {"SiO2": 37.5, "FeO": 28.0, "Al2O3": 21.0}},
             {"id": ${base + 2}, "sample": "S$sid", "label": "b", "mineral": "Biotite",
              "values": {"SiO2": 36.0, "K2O": 9.5}}]""".replaceAll("\n\\s+", " "))
      }
    })
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  def api = new PetroApi(s"http://127.0.0.1:$port", "u", "p")

  test("login + project navigation resolves sample ids") {
    assert(PetroDb.sampleIds(api, "TestProject") == Seq(1L, 2L))
  }

  test("distributed spot fetch -> pivoted analysis table with filters") {
    val a = api
    val ids = PetroDb.sampleIds(a, "TestProject")
    val json = PetroDb.spotsJson(spark, a, 7, ids)
    val df = PetroDb.spotsDf(json, Seq("SiO2", "FeO", "Al2O3", "K2O"))
    assert(df.count() == 4)
    val garnets = PetroDb.spotsDf(json, Seq("SiO2", "FeO"),
      filters = Map("mineral" -> "Garnet"))
    val rows = garnets.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getLong(0)).toSeq == Seq(101L, 201L)) // sorted by id
    assert(rows.head.getDouble(4) == 37.5)
  }

  test("read-only guard blocks mutations before the network") {
    val ex = intercept[IllegalStateException] { api.post("/spots/7/1", "{}") }
    assert(ex.getMessage.contains("read-only"))
  }

  test("401 triggers re-login and retry") {
    val a = api
    a.get("/samples/7") // first call logs in
    val before = tokenIssued
    // a fresh client instance with stale in-memory token state simulates
    // expiry: force by logging in again through a new instance
    val a2 = new PetroApi(s"http://127.0.0.1:$port", "u", "p")
    a2.get("/samples/7")
    assert(tokenIssued > before)
  }

  test("mineral_data union with discriminator; payload export drops <=0") {
    import org.apache.spark.sql.functions._
    val a = api
    val json = PetroDb.spotsJson(spark, a, 7, Seq(1L))
    val spots = PetroDb.spotsDf(json, Seq("SiO2", "FeO"))
    val union = PetroDb.mineralData(spots, spots.limit(1))
    assert(union.filter(col("kind") === "profile").count() == 1)
    val payloads = PetroDb.toPayloads(
      spots.withColumn("FeO", lit(-1.0)), "label", "mineral", Seq("SiO2", "FeO"))
    val p = payloads.collect().map(_.getString(0))
    assert(p.forall(s => !s.contains("FeO"))) // dropped: <= 0
    assert(p.head.contains("SiO2"))
  }
}
