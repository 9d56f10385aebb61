package graft.db

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Error from the remote PetroDB API. */
final class ApiError(val status: Int, msg: String) extends RuntimeException(msg)

/** Minimal JWT-auth REST client for a PetroDB-style microprobe database
  * (reference: src/petropandas/_database.py:176-304 `_PetroAPI`).
  *
  * - POST /token with form credentials -> bearer token
  * - auto re-login + retry once on 401
  * - `readOnly=true` blocks POST/PUT/DELETE before any network call
  *
  * Serializable so executors can open their own connections for
  * partition-parallel fetch (one task per sample replaces the
  * reference's ThreadPoolExecutor fan-out, _database.py:85-107).
  */
final class PetroApi(apiUrl: String, user: String, password: String,
    timeoutSec: Int = 10, val readOnly: Boolean = true) extends Serializable {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(timeoutSec)).build()
  @transient private var token: String = _

  private def login(): Unit = {
    val body = s"username=${java.net.URLEncoder.encode(user, "UTF-8")}" +
      s"&password=${java.net.URLEncoder.encode(password, "UTF-8")}"
    val req = HttpRequest.newBuilder(URI.create(s"$apiUrl/token"))
      .timeout(Duration.ofSeconds(timeoutSec))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new ApiError(resp.statusCode(), s"login failed: ${resp.body()}")
    // naive token extraction: {"access_token": "..."}
    token = """"access_token"\s*:\s*"([^"]+)"""".r
      .findFirstMatchIn(resp.body()).map(_.group(1))
      .getOrElse(throw new ApiError(200, "no access_token in response"))
  }

  private def send(method: String, path: String, body: Option[String]): String = {
    if (readOnly && method != "GET")
      throw new IllegalStateException(s"read-only client: $method $path blocked")
    if (token == null) login()
    def mk = {
      val b = HttpRequest.newBuilder(URI.create(s"$apiUrl$path"))
        .timeout(Duration.ofSeconds(timeoutSec))
        .header("Authorization", s"Bearer $token")
      (method match {
        case "GET" => b.GET()
        case "POST" => b.header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body.getOrElse("")))
        case "PUT" => b.header("Content-Type", "application/json")
          .PUT(HttpRequest.BodyPublishers.ofString(body.getOrElse("")))
        case "DELETE" => b.DELETE()
      }).build()
    }
    var resp = client.send(mk, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() == 401) { // re-auth once (reference :265-271)
      login()
      resp = client.send(mk, HttpResponse.BodyHandlers.ofString())
    }
    if (resp.statusCode() >= 400)
      throw new ApiError(resp.statusCode(), s"$method $path -> ${resp.statusCode()}")
    resp.body()
  }

  def get(path: String): String = send("GET", path, None)
  def post(path: String, body: String): String = send("POST", path, Some(body))
  def put(path: String, body: String): String = send("PUT", path, Some(body))
  def delete(path: String): String = send("DELETE", path, None)
}

/** PetroDB entity navigation + DataFrame export
  * (reference: src/petropandas/_database.py:461-1226).
  *
  * Entity listing (projects, samples) happens on the driver (small);
  * per-sample spot fetch is distributed — one Spark task per sample id,
  * each opening its own connection (`mapPartitions`), returning raw JSON
  * that is parsed into columns with from_json (Catalyst-native). */
object PetroDb {

  /** JSON schema of one spot record as served by the API. */
  val spotSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("sample", StringType),
    StructField("label", StringType), StructField("mineral", StringType),
    StructField("values", MapType(StringType, DoubleType))))

  /** Driver-side: resolve a project by name -> its sample ids
    * (reference: Project.samples, _database.py:539-557). */
  def sampleIds(api: PetroApi, project: String): Seq[Long] = {
    val pj = api.get(s"/search/project/${java.net.URLEncoder.encode(project, "UTF-8")}")
    val pid = """"id"\s*:\s*(\d+)""".r.findFirstMatchIn(pj).map(_.group(1).toLong)
      .getOrElse(throw new ApiError(404, s"project $project not found"))
    val sj = api.get(s"/samples/$pid")
    """"id"\s*:\s*(\d+)""".r.findAllMatchIn(sj).map(_.group(1).toLong).toSeq
  }

  /** Distributed spot fetch: one task per sample; APIError-skipping like
    * the reference fan-out (reference: _fetch_concurrently,
    * _database.py:85-107). Returns one row per spot JSON object. */
  def spotsJson(spark: SparkSession, api: PetroApi, pid: Long,
      sampleIds: Seq[Long]): DataFrame = {
    import spark.implicits._
    val raw = spark.sparkContext
      .parallelize(sampleIds, math.max(1, sampleIds.length))
      .mapPartitions { ids =>
        ids.flatMap { sid =>
          try {
            val body = api.get(s"/spots/$pid/$sid")
            // split a top-level JSON array into objects (flat records)
            """\{[^{}]*(?:\{[^{}]*\}[^{}]*)*\}""".r.findAllIn(body)
          } catch { case _: ApiError => Iterator.empty }
        }
      }
    raw.toDF("json")
  }

  /** S5/M1: records -> analysis table. Parses spot JSON, pivots the
    * oxide `values` map to columns (driver-known key set), appends
    * sample/label/mineral, applies equality filters, sorts by id
    * (reference: Records.df, _database.py:1163-1226). */
  def spotsDf(json: DataFrame, oxideCols: Seq[String],
      filters: Map[String, String] = Map.empty): DataFrame = {
    val parsed = json.select(from_json(col("json"), spotSchema).as("r"))
      .select(col("r.id").as("id"), col("r.sample").as("sample"),
        col("r.label").as("label"), col("r.mineral").as("mineral"),
        col("r.values").as("values"))
    val withCols = parsed.select(
      Seq(col("id"), col("sample"), col("label"), col("mineral")) ++
        oxideCols.map(c => element_at(col("values"), c).as(c)): _*)
    val filtered = filters.foldLeft(withCols) { case (d, (k, v)) =>
      d.filter(col(k) === lit(v))
    }
    filtered.orderBy("id")
  }

  /** S6: union of spot + profile-spot frames for one mineral with a
    * `kind` discriminator (reference: mineral_data,
    * _database.py:564-579). */
  def mineralData(spots: DataFrame, profileSpots: DataFrame): DataFrame =
    spots.withColumn("kind", lit("spot"))
      .unionByName(profileSpots.withColumn("kind", lit("profile")),
        allowMissingColumns = true)

  /** M2: rows -> JSON POST payloads; values <= 0 are dropped
    * (reference: _zero_negative_nan + create_spots,
    * _database.py:76-83,698-717). */
  def toPayloads(df: DataFrame, labelCol: String, mineralCol: String,
      oxideCols: Seq[String]): DataFrame = {
    val cleaned = oxideCols.map(c =>
      when(col(c) <= 0.0 || isnan(col(c)), lit(null)).otherwise(col(c)).as(c))
    df.select(Seq(trim(col(labelCol)).as("label"),
      trim(col(mineralCol)).as("mineral")) ++ cleaned: _*)
      .select(to_json(struct(col("label"), col("mineral"),
        struct(oxideCols.map(col): _*).as("values"))).as("payload"))
  }
}
