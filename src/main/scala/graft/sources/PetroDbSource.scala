package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.db.{ApiError, PetroApi, PetroDb}

/** DataSource V2 table over a PetroDB REST endpoint — the Spark-native
  * form of the reference's remote database source (reference:
  * src/petropandas/_database.py:461-760, Project/Sample navigation +
  * spot export):
  *
  * {{{
  * spark.read.format("petrodb")
  *   .option("url", "https://db.example.org/api")
  *   .option("user", "u").option("password", "p")
  *   .option("project", "MyProject")
  *   .load()
  * }}}
  *
  * Scale design:
  *  - `planInputPartitions` resolves project -> sample ids on the
  *    driver (a handful of tiny catalog calls) and emits ONE
  *    InputPartition PER SAMPLE, so the spot fetch fans out across the
  *    cluster — the distributed generalization of the reference's
  *    single-process ThreadPoolExecutor (_database.py:85-107). Each
  *    reader opens its own authenticated connection on the executor.
  *  - Column pruning is pushed into the reader
  *    (SupportsPushDownRequiredColumns): `select(id, mineral)` skips
  *    parsing labels and the oxide map entirely — visible as the
  *    narrowed ReadSchema on the BatchScan node.
  *  - A sample whose fetch 4xxes is skipped, matching the reference
  *    fan-out's APIError contract.
  */
final class PetroDbSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "petrodb"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PetroDbSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // TableProvider hands back whatever schema the user passed via
    // spark.read.schema(...). This source's schema is fixed by the REST
    // payload — honoring an arbitrary user schema is impossible, and
    // silently ignoring it would return fullSchema rows under the
    // user's declared types. Reject anything that isn't exactly ours.
    require(schema == PetroDbSource.fullSchema,
      s"petrodb does not support user-specified schemas: got $schema, " +
        s"the source schema is fixed to ${PetroDbSource.fullSchema} " +
        "(use select() to prune columns — pruning is pushed into the reader)")
    new PetroDbTable()
  }
}

object PetroDbSource {
  /** One row per spot; `values` is the raw oxide map (pivot to columns
    * with element_at / PetroDb.spotsDf downstream). */
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("sample", StringType),
    StructField("label", StringType),
    StructField("mineral", StringType),
    StructField("values", MapType(StringType, DoubleType))))
}

private[sources] final class PetroDbTable extends Table with SupportsRead {
  override def name(): String = "petrodb"
  override def schema(): StructType = PetroDbSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PetroDbScanBuilder(options)
}

private[sources] final class PetroDbScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = PetroDbSource.fullSchema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** String-equality predicates on the metadata columns are evaluated
    * in the reader BEFORE any row is built (a regex probe on the raw
    * record), so filtered-out spots never pay JSON->InternalRow
    * conversion; everything else stays with Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition {
      case EqualTo(a, _: String) => Set("sample", "label", "mineral")(a)
      case _ => false
    }
    pushed = sup
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new PetroDbScan(
    options.get("url"),
    options.getOrDefault("user", ""),
    options.getOrDefault("password", ""),
    options.get("project"),
    options.getInt("timeoutsec", 10),
    required, pushed)
}

private[sources] final case class SamplePartition(pid: Long, sid: Long)
  extends InputPartition

private[sources] final class PetroDbScan(url: String, user: String,
    password: String, project: String, timeoutSec: Int,
    required: StructType, pushed: Array[Filter]) extends Scan with Batch {
  require(url != null, "petrodb: option 'url' is required")
  require(project != null, "petrodb: option 'project' is required")
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"petrodb project=$project PushedFilters: ${pushed.mkString("[", ", ", "]")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val api = new PetroApi(url, user, password, timeoutSec)
    val pid = PetroDb.projectId(api, project)
    PetroDb.sampleIdsOf(api, pid)
      .map(sid => SamplePartition(pid, sid): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PetroDbReaderFactory(url, user, password, timeoutSec, required,
      pushed.collect { case EqualTo(a, v: String) => (a, v) })
}

private[sources] final class PetroDbReaderFactory(url: String, user: String,
    password: String, timeoutSec: Int, required: StructType,
    eqFilters: Array[(String, String)]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SamplePartition]
    new PetroDbPartitionReader(url, user, password, timeoutSec, required,
      eqFilters, p)
  }
}

/** Executor-side reader: one GET per sample, flat-record JSON split with
  * the same regex contract as [[graft.db.PetroDb]]; only the columns in
  * `required` are parsed. */
private[sources] final class PetroDbPartitionReader(url: String, user: String,
    password: String, timeoutSec: Int, required: StructType,
    eqFilters: Array[(String, String)], p: SamplePartition)
    extends PartitionReader[InternalRow] {

  private lazy val objects: Iterator[String] = {
    val api = new PetroApi(url, user, password, timeoutSec)
    try {
      val body = api.get(s"/spots/${p.pid}/${p.sid}")
      """\{[^{}]*(?:\{[^{}]*\}[^{}]*)*\}""".r.findAllIn(body)
        .filter(obj => eqFilters.forall { case (a, v) =>
          strField(obj, a) == UTF8String.fromString(v)
        })
    } catch { case _: ApiError => Iterator.empty }
  }
  private var current: InternalRow = _

  private def longField(obj: String, name: String): Any =
    (s""""$name"\\s*:\\s*(\\d+)""").r.findFirstMatchIn(obj)
      .map(m => java.lang.Long.valueOf(m.group(1).toLong)).orNull
  private def strField(obj: String, name: String): Any =
    (s""""$name"\\s*:\\s*"([^"]*)"""").r.findFirstMatchIn(obj)
      .map(m => UTF8String.fromString(m.group(1))).orNull
  private def mapField(obj: String, name: String): Any =
    (s""""$name"\\s*:\\s*\\{([^}]*)\\}""").r.findFirstMatchIn(obj).map { m =>
      val pairs = """"([^"]+)"\s*:\s*(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)""".r
        .findAllMatchIn(m.group(1))
        .map(p => (UTF8String.fromString(p.group(1)), p.group(2).toDouble))
        .toArray
      new ArrayBasedMapData(
        new GenericArrayData(pairs.map(_._1.asInstanceOf[Any])),
        new GenericArrayData(pairs.map(_._2.asInstanceOf[Any])))
    }.orNull

  private def toRow(obj: String): InternalRow =
    InternalRow.fromSeq(required.fields.toSeq.map { f =>
      f.name match {
        case "id" => longField(obj, "id")
        case "sample" => strField(obj, "sample")
        case "label" => strField(obj, "label")
        case "mineral" => strField(obj, "mineral")
        case "values" => mapField(obj, "values")
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
    })

  override def next(): Boolean =
    if (objects.hasNext) { current = toRow(objects.next()); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
