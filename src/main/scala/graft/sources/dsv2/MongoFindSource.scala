package graft.sources.dsv2

import java.util.{Map => JMap}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.CanonicalJson
import graft.core.CanonicalJson._

/** MongoDB `find` scan as a DataSource V2 connector with negotiated
  * Exact pushdown (cdf: crates/cdf-source-mongodb/src/resource.rs:
  * 340-356 capabilities, query.rs:107-222 filter → find document;
  * uniform negotiation record per connector, cdf-engine
  * table_provider.rs:151-178).
  *
  * Pushdown classification, per predicate:
  *  - Exact ({ = <> > >= < <= IN IS NULL IS NOT NULL } on a declared
  *    column with a renderable literal): compiled into the find
  *    command's filter document as Extended JSON v2 — the server
  *    evaluates it faithfully, nothing re-checked.
  *  - Unsupported: residual; Spark re-applies it over decoded rows.
  * Projection prunes via the find command's projection document; LIMIT
  * pushes (all pushed predicates are Exact).
  *
  * The transport is `findCommandJson => NDJSON-of-ExtendedJSON` — the
  * exact request/response pair MongoDB's wire speaks; a deployment
  * plugs a real driver into the seam (zero-egress container exercises
  * the full command compilation + decode). ONE command per scan
  * (driver-side, where any Mongo cursor lives); response documents fan
  * out across `partitions` InputPartitions so decode + residual
  * re-check run distributed. Decode handles canonical AND relaxed
  * Extended JSON scalars ($numberLong/$numberInt/$numberDouble/
  * $numberDecimal/$date/$oid, or plain literals).
  */
object MongoRegistry {
  final case class Entry(
      collection: String,
      schema: StructType,
      transport: String => String,
      pushable: Set[String],
      partitions: Int = 4)
  private val tables = TrieMap.empty[String, Entry]
  /** negotiation record: the find command each scan actually issued. */
  val issuedCommands = TrieMap.empty[String, Vector[String]]
  def register(name: String, e: Entry): Unit = { tables.put(name, e); issuedCommands.put(name, Vector.empty) }
  def get(name: String): Entry = tables.getOrElse(name,
    throw new IllegalArgumentException(s"unknown mongo collection: $name"))
  def recordCommand(name: String, cmd: String): Unit =
    issuedCommands.updateWith(name)(v => Some(v.getOrElse(Vector.empty) :+ cmd))
}

class MongoFindSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MongoRegistry.get(options.get("collection")).schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new MongoFindTable(properties.get("collection"))
  override def supportsExternalMetadata(): Boolean = false
}

final class MongoFindTable(name: String) extends Table with SupportsRead {
  private val entry = MongoRegistry.get(name)
  override def name(): String = s"mongo:$name"
  override def schema(): StructType = entry.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MongoFindScanBuilder(name, entry)
}

final class MongoFindScanBuilder(name: String, entry: MongoRegistry.Entry)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var exactFilters: Array[Filter] = Array.empty
  private var filterDoc: Seq[String] = Seq.empty
  private var projection: StructType = entry.schema
  private var limit: Option[Int] = None

  /** Extended JSON v2 literal (canonical for numerics — the typed form
    * the server compares without coercion surprises). Null literals are
    * NOT renderable: Mongo's {$eq:null}/{$in:[null]} match null-or-missing
    * documents while Spark's `col = NULL` / `col IN (NULL,...)` never
    * match, so a comparison carrying null must stay residual — the JSON
    * `null` is reserved for the explicit IsNull/IsNotNull clauses. */
  private def extLit(v: Any): Option[String] = v match {
    case null => None
    case s: String => Some(CanonicalJson.render(JStr(s)))
    case b: Boolean => Some(if (b) "true" else "false")
    case i: java.lang.Integer => Some(s"""{"$$numberInt":"$i"}""")
    case l: java.lang.Long => Some(s"""{"$$numberLong":"$l"}""")
    case d: java.lang.Double => Some(s"""{"$$numberDouble":"$d"}""")
    case f: java.lang.Float => Some(s"""{"$$numberDouble":"${f.toDouble}"}""")
    case d: java.math.BigDecimal => Some(s"""{"$$numberDecimal":"${d.toPlainString}"}""")
    case d: scala.math.BigDecimal => Some(s"""{"$$numberDecimal":"${d.bigDecimal.toPlainString}"}""")
    case _ => None
  }

  private def field(c: String): String = CanonicalJson.render(JStr(c))

  /** predicate → find-filter clause (Exact set only). */
  private def clause(f: Filter): Option[String] = f match {
    case EqualTo(c, v) if entry.pushable(c) =>
      extLit(v).map(l => s"""{${field(c)}:{"$$eq":$l}}""")
    case GreaterThan(c, v) if entry.pushable(c) =>
      extLit(v).map(l => s"""{${field(c)}:{"$$gt":$l}}""")
    case GreaterThanOrEqual(c, v) if entry.pushable(c) =>
      extLit(v).map(l => s"""{${field(c)}:{"$$gte":$l}}""")
    case LessThan(c, v) if entry.pushable(c) =>
      extLit(v).map(l => s"""{${field(c)}:{"$$lt":$l}}""")
    case LessThanOrEqual(c, v) if entry.pushable(c) =>
      extLit(v).map(l => s"""{${field(c)}:{"$$lte":$l}}""")
    case In(c, vs) if entry.pushable(c) =>
      val ls = vs.toSeq.map(extLit)
      if (ls.forall(_.isDefined)) Some(s"""{${field(c)}:{"$$in":[${ls.flatten.mkString(",")}]}}""")
      else None
    case IsNull(c) if entry.pushable(c) => Some(s"""{${field(c)}:{"$$eq":null}}""")
    case IsNotNull(c) if entry.pushable(c) => Some(s"""{${field(c)}:{"$$ne":null}}""")
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val classified = filters.map(f => f -> clause(f))
    exactFilters = classified.collect { case (f, Some(_)) => f }
    filterDoc = classified.collect { case (_, Some(c)) => c }.toSeq
    classified.collect { case (f, None) => f } // residual re-check
  }
  override def pushedFilters(): Array[Filter] = exactFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    projection = StructType(entry.schema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  /** all pushed predicates are Exact → a server-side limit is safe. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  override def build(): Scan = {
    val cols = if (projection.isEmpty) StructType(entry.schema.fields.take(1)) else projection
    val filter = filterDoc match {
      case Seq() => "{}"
      case Seq(one) => one
      case many => s"""{"$$and":[${many.mkString(",")}]}"""
    }
    val proj = cols.fieldNames.map(c => s"${field(c)}:1").mkString("{", ",", "}")
    val cmd = s"""{"find":${field(entry.collection)},"filter":$filter,"projection":$proj""" +
      limit.fold("")(l => s""","limit":$l""") + "}"
    new MongoFindScan(name, entry, cols, cmd)
  }
}

final class MongoFindScan(name: String, entry: MongoRegistry.Entry,
    projection: StructType, command: String) extends Scan with Batch {

  override def readSchema(): StructType = projection
  override def toBatch: Batch = this
  override def description(): String = s"MongoFindScan($command)"

  override def planInputPartitions(): Array[InputPartition] = {
    MongoRegistry.recordCommand(name, command)
    val body = entry.transport(command)
    val lines = body.split('\n').iterator.map(_.trim).filter(_.nonEmpty).toVector
    val n = math.max(1, math.min(entry.partitions, lines.size))
    lines.grouped(math.max(1, (lines.size + n - 1) / n))
      .map(chunk => MongoDocsPartition(chunk): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MongoReaderFactory(projection)
}

final case class MongoDocsPartition(lines: Vector[String]) extends InputPartition

final class MongoReaderFactory(projection: StructType) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val lines = partition.asInstanceOf[MongoDocsPartition].lines
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(projection)

    // canonical + relaxed Extended JSON v2 scalar decode
    def unwrap(j: J): J = j match {
      case JObj(fs) =>
        val m = fs.toMap
        m.get("$numberLong").orElse(m.get("$numberInt")) match {
          case Some(JStr(v)) => JInt(v.toLong)
          case _ => m.get("$numberDouble") match {
            case Some(JStr(v)) => JNum(v.toDouble)
            case _ => m.get("$numberDecimal").orElse(m.get("$oid")) match {
              case Some(s @ JStr(_)) => s
              case _ => m.get("$date") match {
                case Some(inner) => unwrap(inner) // {"$date":{"$numberLong":..}} or ISO string
                case None => j
              }
            }
          }
        }
      case other => other
    }

    def conv(j0: J, dt: DataType): Any = (unwrap(j0), dt) match {
      case (JNull, _) => null
      case (JInt(v), LongType) => v
      case (JInt(v), IntegerType) => v.toInt
      case (JInt(v), DoubleType) => v.toDouble
      case (JNum(v), DoubleType) => v
      case (JNum(v), FloatType) => v.toFloat
      case (JStr(v), StringType) => v
      case (JBool(v), BooleanType) => v
      case (JStr(v), d: DecimalType) => BigDecimal(v)
      case (JInt(v), d: DecimalType) => BigDecimal(v).setScale(d.scale)
      case (JInt(ms), TimestampType) => new java.sql.Timestamp(ms) // $date millis
      case (JStr(v), TimestampType) =>
        new java.sql.Timestamp(java.time.Instant.parse(v).toEpochMilli)
      case (other, t) => throw new IllegalArgumentException(
        s"mongo decode: cannot read $other as $t")
    }

    val it = lines.iterator.map { line =>
      val fields = CanonicalJson.objFields(CanonicalJson.parse(line))
      val vals = projection.fields.map(f =>
        fields.get(f.name).map(conv(_, f.dataType)).orNull)
      toCatalyst(Row.fromSeq(vals.toSeq)).asInstanceOf[InternalRow]
    }

    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
