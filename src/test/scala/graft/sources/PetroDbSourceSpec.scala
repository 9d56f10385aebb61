package graft.sources

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** DataSource V2 reader against an in-process PetroDB-shaped server:
  * partition-per-sample planning, executor-side auth, column pruning. */
class PetroDbSourceSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  var server: HttpServer = _
  var port: Int = _
  @volatile var spotCalls = 0

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
      (200, """{"access_token": "tok1", "token_type": "bearer"}""")
    })
    server.createContext("/search/project/", handler { ex =>
      if (!authed(ex)) (401, "{}") else (200, """{"id": 7, "name": "P"}""")
    })
    server.createContext("/samples/", handler { ex =>
      if (!authed(ex)) (401, "{}")
      else (200, """[{"id": 1, "name": "S1"}, {"id": 2, "name": "S2"}, {"id": 3, "name": "S3"}]""")
    })
    server.createContext("/spots/", handler { ex =>
      if (!authed(ex)) (401, "{}")
      else {
        spotCalls += 1
        val sid = ex.getRequestURI.getPath.split("/").last.toInt
        if (sid == 3) (404, "{}") // empty sample: reader must skip, not fail
        else {
          val base = sid * 100
          (200,
            s"""[{"id": ${base + 1}, "sample": "S$sid", "label": "a", "mineral": "Garnet",
                "values": {"SiO2": 37.5, "FeO": 28.0}},
               {"id": ${base + 2}, "sample": "S$sid", "label": "b", "mineral": "Biotite",
                "values": {"SiO2": 36.0, "K2O": 9.5}}]""".replaceAll("\n\\s+", " "))
        }
      }
    })
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  def load() = spark.read.format("petrodb")
    .option("url", s"http://127.0.0.1:$port")
    .option("user", "u").option("password", "p")
    .option("project", "P")
    .load()

  test("short-name registration, partition-per-sample read, 4xx samples skipped") {
    val df = load()
    assert(df.rdd.getNumPartitions == 3, "one input partition per sample")
    val rows = df.orderBy("id").collect()
    assert(rows.length == 4, "sample 3's 404 is skipped, not fatal")
    assert(rows.map(_.getLong(0)).toSeq == Seq(101L, 102L, 201L, 202L))
    assert(rows.head.getString(3) == "Garnet")
    val m = rows.head.getMap[String, Double](4)
    assert(m("SiO2") == 37.5 && m("FeO") == 28.0)
  }

  test("column pruning reaches the reader (narrow ReadSchema, no values parse)") {
    val narrow = load().select("id", "mineral")
    val scan = narrow.queryExecution.executedPlan.toString
    // DSv2 plans print the scan's (pruned) output column list inline
    assert("BatchScan petrodb\\[id#\\d+L, mineral#\\d+\\]".r.findFirstIn(scan).isDefined
        && !scan.contains("values#"),
      s"pruned schema not pushed to the scan:\n$scan")
    assert(narrow.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("Garnet", "Biotite", "Garnet", "Biotite"))
  }

  test("string-equality filters push into the reader and are not re-applied by Spark") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val garnets = load().filter(col("mineral") === "Garnet")
    val plan = garnets.queryExecution.executedPlan
    val scan = plan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get
    assert(scan.scan.description().contains("EqualTo(mineral,Garnet)"),
      s"filter not pushed: ${scan.scan.description()}")
    // the equality is fully handled by the source — Spark keeps only
    // its synthesized isnotnull residual, not the comparison itself
    assert(!plan.toString.contains("= Garnet"),
      s"residual mineral equality left in plan:\n$plan")
    val rows = garnets.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(101L, 201L))
    assert(rows.forall(_.getString(3) == "Garnet"))
  }

  test("source rows pivot to the same analysis table as the mapPartitions path") {
    import graft.db.{PetroApi, PetroDb}
    val api = new PetroApi(s"http://127.0.0.1:$port", "u", "p")
    val viaRdd = PetroDb.spotsDf(
      PetroDb.spotsJson(spark, api, 7, Seq(1L, 2L, 3L)), Seq("SiO2", "FeO", "K2O"))
    val viaSource = load().select(
      Seq(col("id"), col("sample"), col("label"), col("mineral")) ++
        Seq("SiO2", "FeO", "K2O").map(c => element_at(col("values"), c).as(c)): _*)
      .orderBy("id")
    assert(viaSource.collect().toSeq == viaRdd.collect().toSeq)
  }
}
