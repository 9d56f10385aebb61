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

  /** JSON schema of one area record (no mineral; reference AreaRecords
    * cols = [label], _database.py:1206-1214). */
  val areaSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("label", StringType),
    StructField("values", MapType(StringType, DoubleType))))

  /** JSON schema of one profile spot (ordered by `index` along the
    * traverse; label/mineral are attached from the owning profile —
    * reference Profile.spots, _database.py:1014-1037). */
  val profileSpotSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("index", LongType),
    StructField("values", MapType(StringType, DoubleType))))

  /** A profile header within a sample (reference: Profile,
    * _database.py:962-1012). */
  final case class ProfileRef(id: Long, label: String, mineral: Option[String])

  // ---- driver-side JSON helpers (flat records; no JSON lib in scope) -------

  /** Split a top-level JSON array body into object strings (one nesting
    * level, matching the flat record shapes the API serves). */
  private def jsonObjects(body: String): Iterator[String] =
    """\{[^{}]*(?:\{[^{}]*\}[^{}]*)*\}""".r.findAllIn(body)

  private def longField(obj: String, name: String): Option[Long] =
    (s""""$name"\\s*:\\s*(\\d+)""").r.findFirstMatchIn(obj).map(_.group(1).toLong)

  private def strField(obj: String, name: String): Option[String] =
    (s""""$name"\\s*:\\s*"([^"]*)"""").r.findFirstMatchIn(obj).map(_.group(1))

  /** Driver-side: resolve a project by name -> its id
    * (reference: PetroDB.projects, _database.py:369-390). */
  def projectId(api: PetroApi, project: String): Long = {
    val pj = api.get(s"/search/project/${java.net.URLEncoder.encode(project, "UTF-8")}")
    longField(pj, "id")
      .getOrElse(throw new ApiError(404, s"project $project not found"))
  }

  /** Driver-side: resolve a project by name -> its sample ids
    * (reference: Project.samples, _database.py:539-557). */
  def sampleIds(api: PetroApi, project: String): Seq[Long] =
    sampleIdsOf(api, projectId(api, project))

  /** [[sampleIds]] for an already-resolved project id (saves the extra
    * catalog round trip when the caller has resolved it, e.g. the DSV2
    * scan's planInputPartitions). */
  def sampleIdsOf(api: PetroApi, pid: Long): Seq[Long] = {
    val sj = api.get(s"/samples/$pid")
    """"id"\s*:\s*(\d+)""".r.findAllMatchIn(sj).map(_.group(1).toLong).toSeq
  }

  /** Driver-side: list or mineral-filter the profiles of one sample
    * (reference: Sample.profiles, _database.py:797-832). */
  def profiles(api: PetroApi, pid: Long, sid: Long,
      mineral: Option[String] = None): Seq[ProfileRef] = {
    val body = api.get(s"/profiles/$pid/$sid")
    jsonObjects(body).flatMap { obj =>
      for (id <- longField(obj, "id"); label <- strField(obj, "label"))
        yield ProfileRef(id, label, strField(obj, "mineral"))
    }.filter(p => mineral.forall(m => p.mineral.contains(m))).toSeq
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

  /** Distributed area fetch — one task per sample, same shape as
    * [[spotsJson]] (reference: Sample.areas, _database.py:727-737). */
  def areasJson(spark: SparkSession, api: PetroApi, pid: Long,
      sampleIds: Seq[Long]): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .parallelize(sampleIds, math.max(1, sampleIds.length))
      .mapPartitions { ids =>
        ids.flatMap { sid =>
          try jsonObjects(api.get(s"/areas/$pid/$sid"))
          catch { case _: ApiError => Iterator.empty }
        }
      }.toDF("json")
  }

  /** Areas -> analysis table: label + pivoted values, sorted by id
    * (reference: AreaRecords.df, _database.py:1163-1214). */
  def areasDf(json: DataFrame, oxideCols: Seq[String],
      filters: Map[String, String] = Map.empty): DataFrame = {
    val parsed = json.select(from_json(col("json"), areaSchema).as("r"))
      .select(col("r.id").as("id"), col("r.label").as("label"),
        col("r.values").as("values"))
    val withCols = parsed.select(
      Seq(col("id"), col("label")) ++
        oxideCols.map(c => element_at(col("values"), c).as(c)): _*)
    filters.foldLeft(withCols) { case (d, (k, v)) =>
      d.filter(col(k) === lit(v))
    }.orderBy("id")
  }

  /** Distributed profile-spot fetch — one task per profile; each spot
    * row carries the owning profile's label/mineral, exactly as the
    * reference attaches them (Profile.spots, _database.py:1014-1037). */
  def profileSpotsJson(spark: SparkSession, api: PetroApi, pid: Long,
      sid: Long, profs: Seq[ProfileRef]): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .parallelize(profs, math.max(1, profs.length))
      .mapPartitions { ps =>
        ps.flatMap { p =>
          try jsonObjects(api.get(s"/profilespots/$pid/$sid/${p.id}"))
            .map(obj => (obj, p.label, p.mineral.orNull))
          catch { case _: ApiError => Iterator.empty }
        }
      }.toDF("json", "label", "mineral")
  }

  /** Profile spots -> ordered traverse table: (id, index, label, mineral,
    * oxide columns), sorted by position along the profile (O3 ordering;
    * reference: ProfileSpotRecords.df sorted by index). */
  def profileSpotsDf(json: DataFrame, oxideCols: Seq[String]): DataFrame = {
    val parsed = json.select(from_json(col("json"), profileSpotSchema).as("r"),
        col("label"), col("mineral"))
      .select(col("r.id").as("id"), col("r.index").as("index"),
        col("label"), col("mineral"), col("r.values").as("values"))
    parsed.select(
      Seq(col("id"), col("index"), col("label"), col("mineral")) ++
        oxideCols.map(c => element_at(col("values"), c).as(c)): _*)
      .orderBy("index", "id")
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

  /** S3 writer: batched spot creation — POST one JSON array per
    * partition to /spots/{pid}/{sid} (reference: Sample.create_spots,
    * _database.py:698-725, which posts a single driver-side batch; here
    * each partition posts its own batch, so a large frame writes in
    * parallel without collecting to the driver). Returns the created
    * spot records as a raw-JSON frame parseable with [[spotsDf]].
    * Requires a client constructed with readOnly=false. */
  def createSpots(spark: SparkSession, api: PetroApi, pid: Long, sid: Long,
      payloads: DataFrame): DataFrame = {
    require(!api.readOnly,
      "createSpots needs a PetroApi with readOnly=false (reference ReadOnlyError)")
    import spark.implicits._
    payloads.select(col("payload")).as[String].rdd
      .mapPartitions { batch =>
        val b = batch.toSeq
        if (b.isEmpty) Iterator.empty
        else jsonObjects(api.post(s"/spots/$pid/$sid", b.mkString("[", ",", "]")))
      }.toDF("json")
  }

  /** S3 writer: batched profile-spot creation — POST one JSON array per
    * partition to /profilespots/{pid}/{sid}/{fid} (reference:
    * Profile.create_spots, _database.py:1066-1106). `df` needs an
    * `index` column (position along the traverse) plus oxide columns;
    * values <= 0/NaN are dropped like [[toPayloads]]. */
  def createProfileSpots(spark: SparkSession, api: PetroApi, pid: Long,
      sid: Long, fid: Long, df: DataFrame, oxideCols: Seq[String]): DataFrame = {
    require(!api.readOnly,
      "createProfileSpots needs a PetroApi with readOnly=false")
    import spark.implicits._
    val cleaned = oxideCols.map(c =>
      when(col(c) <= 0.0 || isnan(col(c)), lit(null)).otherwise(col(c)).as(c))
    val payloads = df.select(col("index") +: cleaned: _*)
      .select(to_json(struct(col("index"),
        struct(oxideCols.map(col): _*).as("values"))).as("payload"))
    payloads.as[String].rdd
      .mapPartitions { batch =>
        val b = batch.toSeq
        if (b.isEmpty) Iterator.empty
        else jsonObjects(api.post(s"/profilespots/$pid/$sid/$fid",
          b.mkString("[", ",", "]")))
      }.toDF("json")
  }
}
