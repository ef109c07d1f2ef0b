package graft.sources.dsv2

import java.util.{Map => JMap}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, NamedReference, NullOrdering, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.CanonicalJson
import graft.core.CanonicalJson._

/** MongoDB scan as a DataSource V2 connector speaking BOTH command
  * shapes the reference compiles to — `find` and `aggregate`
  * (cdf: crates/cdf-source-mongodb/src/resource.rs:340-356
  * capabilities, query.rs:107-222 filter → find/aggregate; uniform
  * negotiation record per connector, cdf-engine
  * table_provider.rs:151-178).
  *
  * Pushdown classification, per predicate:
  *  - Exact ({ = <> > >= < <= IN IS NULL IS NOT NULL } on a declared
  *    column with a renderable literal): compiled into the find
  *    command's filter document as Extended JSON v2 — the server
  *    evaluates it faithfully, nothing re-checked.
  *  - Unsupported: residual; Spark re-applies it over decoded rows.
  * Projection prunes via the find command's projection document; LIMIT
  * pushes (all pushed predicates are Exact); ORDER BY + LIMIT becomes
  * the find command's sort document when Spark's requested null
  * placement matches BSON sort order (nulls first asc / last desc);
  * GROUP BY + {count/sum/min/max/avg} compiles to an aggregate
  * pipeline `$match → $group → $project` with COMPLETE-pushdown
  * semantics — Spark re-aggregates nothing, so the offer is made only
  * when every group key and aggregate is servable exactly.
  *
  * The transport is `findCommandJson => NDJSON-of-ExtendedJSON` — the
  * exact request/response pair MongoDB's wire speaks. Two scan modes:
  *  - `wire`-backed (the 100 TB path): one find command PER SHARD
  *    filter; each task opens its OWN OP_MSG socket and drains its
  *    cursor batch-by-batch ([[graft.sources.MongoWire.WireCursor]]) —
  *    result documents never transit the driver.
  *  - seam-backed (bounded fixtures): ONE transport command
  *    driver-side, response lines fanned out across `partitions`
  *    InputPartitions for distributed decode + residual re-check.
  * Decode handles canonical AND relaxed Extended JSON scalars
  * ($numberLong/$numberInt/$numberDouble/$numberDecimal/$date/$oid,
  * or plain literals).
  */
object MongoRegistry {
  final case class Entry(
      collection: String,
      schema: StructType,
      transport: String => String,
      pushable: Set[String],
      partitions: Int = 4,
      /** (host, port, db): when set, the scan bypasses `transport` and
        * runs EXECUTOR-SIDE — each task opens its own OP_MSG socket and
        * streams its cursor batch-by-batch ([[graft.sources.MongoWire.WireCursor]]);
        * result documents never transit the driver. */
      wire: Option[(String, Int, String)] = None,
      /** disjoint Extended-JSON filter clauses covering the keyspace
        * (e.g. _id ranges); with `wire` set, a plain find fans out one
        * task + connection + cursor per shard. */
      shardFilters: Seq[String] = Seq.empty)
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
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownTopN with SupportsPushDownAggregates
    with SupportsPushDownOffset {

  private var exactFilters: Array[Filter] = Array.empty
  private var filterDoc: Seq[String] = Seq.empty
  private var projection: StructType = entry.schema
  private var limit: Option[Int] = None
  private var offset: Option[Int] = None
  private var sortDoc: Option[String] = None
  private var residualHeld = false
  /** set when a complete aggregation is pushed: ($group+$project stages, output schema) */
  private var aggPushed: Option[(Seq[String], StructType)] = None

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
    val residual = classified.collect { case (f, None) => f }
    residualHeld = residual.nonEmpty
    residual // residual re-check
  }
  override def pushedFilters(): Array[Filter] = exactFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    // with an aggregation pushed the scan's output schema IS the
    // aggregate shape; the find projection no longer applies
    if (aggPushed.isEmpty)
      projection = StructType(entry.schema.fields.filter(f =>
        requiredSchema.fieldNames.contains(f.name)))

  /** all pushed predicates are Exact → a server-side limit is safe.
    * Under a pushed aggregation the limit becomes a `$limit` stage
    * after the `$project` — the server rows are final group rows, so
    * keeping any l of them matches Spark's global-limit semantics. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  /** OFFSET → the find command's `skip` (mongod applies skip before
    * limit) or a `$skip` stage after a pushed `$group`. Spark's
    * contract: a co-pushed limit arrives as limit+offset (rows
    * INCLUDING the skipped prefix), so the emitted limit is
    * `limit - offset`. Exact-only law, same as limit. */
  override def pushOffset(o: Int): Boolean =
    if (residualHeld) false else { offset = Some(o); true }

  private def renderedLimit: Option[Int] =
    (limit, offset) match {
      case (Some(l), Some(o)) => Some(math.max(0, l - o))
      case (l, _) => l
    }

  /** ORDER BY + LIMIT into the find command's sort document (cdf
    * forwards OrderBy to sources, crates/cdf-kernel/src/resource.rs:
    * 611-622; Exact-only law table_provider.rs:126-137). Mongo's sort
    * places null/missing FIRST ascending and LAST descending (BSON
    * total order) — exactly Spark's defaults — so any other requested
    * null placement is refused rather than silently misordered. */
  override def pushTopN(orders: Array[SortOrder], l: Int): Boolean = {
    if (residualHeld || aggPushed.isDefined) return false
    val terms = orders.toSeq.map { o =>
      (o.expression(), o.direction(), o.nullOrdering()) match {
        case (ref: NamedReference, SortDirection.ASCENDING, NullOrdering.NULLS_FIRST)
            if ref.fieldNames.length == 1 && entry.schema.fieldNames.contains(ref.fieldNames()(0)) =>
          Some(s"${field(ref.fieldNames()(0))}:1")
        case (ref: NamedReference, SortDirection.DESCENDING, NullOrdering.NULLS_LAST)
            if ref.fieldNames.length == 1 && entry.schema.fieldNames.contains(ref.fieldNames()(0)) =>
          Some(s"${field(ref.fieldNames()(0))}:-1")
        case _ => None
      }
    }
    if (!terms.forall(_.isDefined)) return false
    sortDoc = Some(terms.flatten.mkString("{", ",", "}"))
    limit = Some(l)
    true
  }

  /** the server evaluates the full sort + limit; the scan returns the
    * top-N in order (one partition), so Spark drops its own Sort. */
  override def isPartiallyPushed(): Boolean = false

  // ------------------------------------------------- aggregate pipeline

  /** GROUP BY → `$group` stage (cdf compiles filters into find OR
    * aggregate, crates/cdf-source-mongodb/src/query.rs:107-222). Only
    * COMPLETE pushdown is offered: the transport issues one command for
    * the whole collection, so partial re-aggregation semantics (Spark
    * merging per-partition partials) never apply. Null-grouping parity:
    * Mongo groups null and MISSING under one null key; engine-side the
    * same docs decode to null, so the groups coincide. */
  private def compileAgg(agg: Aggregation): Option[(Seq[String], StructType)] = {
    if (residualHeld) return None // Exact-only law, same as limit/top-N
    // global (no GROUP BY) aggregation stays engine-side: Mongo's
    // $group over an empty (or fully $match-filtered) input emits ZERO
    // rows where Spark's global aggregate must emit exactly one
    // (count=0, sum/min/max/avg NULL) — a complete pushdown would
    // silently swallow that row
    if (agg.groupByExpressions.isEmpty) return None
    val groups: Seq[Option[String]] = agg.groupByExpressions.toSeq.map {
      case ref: NamedReference if ref.fieldNames.length == 1 &&
          entry.schema.fieldNames.contains(ref.fieldNames()(0)) => Some(ref.fieldNames()(0))
      case _ => None
    }
    if (!groups.forall(_.isDefined)) return None
    val groupCols = groups.flatten
    // a group column literally named `_id` would collide with the
    // $group key document: the $project would carry both an `_id`
    // exclusion and an `_id` inclusion — an invalid spec a real
    // mongod rejects. Refuse; the engine aggregates instead.
    if (groupCols.contains("_id")) return None
    def colOf(e: Expression): Option[StructField] = e match {
      case ref: NamedReference if ref.fieldNames.length == 1 =>
        entry.schema.fields.find(_.name == ref.fieldNames()(0))
      case _ => None
    }
    def sumType(dt: DataType): Option[DataType] = dt match {
      case ByteType | ShortType | IntegerType | LongType => Some(LongType)
      case FloatType | DoubleType => Some(DoubleType)
      case d: DecimalType => Some(DecimalType(math.min(38, d.precision + 10), d.scale))
      case _ => None
    }
    // non-null count accumulator: BSON total order puts missing/
    // undefined and null at the bottom, so `$lte null` is exactly
    // "not a value" — used for Count(col) and for $sum's null parity
    def nnCount(c: String) = s"""{"$$sum":{"$$cond":[{"$$lte":["$$$c",null]},0,1]}}"""
    // per aggregate: (accumulators it needs, $project value, result type)
    val funcs: Seq[Option[(Seq[(String, String)], String, DataType)]] =
      agg.aggregateExpressions.toSeq.zipWithIndex.map { case (fn, i) =>
        val n = s"a$i"
        fn match {
          case _: CountStar => Some((Seq(n -> """{"$sum":1}"""), "1", LongType))
          case c: Count if !c.isDistinct =>
            colOf(c.column).map(f => (Seq(n -> nnCount(f.name)), "1", LongType))
          case s: Sum if !s.isDistinct =>
            // parity fix: $sum over a group with NO values yields 0
            // where Spark's sum yields NULL — pair the $sum with a
            // non-null count and project NULL when that count is 0
            colOf(s.column).flatMap(f => sumType(f.dataType).map { t =>
              (Seq(n -> s"""{"$$sum":"$$${f.name}"}""", s"${n}n" -> nnCount(f.name)),
                s"""{"$$cond":[{"$$eq":["$$${n}n",0]},null,"$$$n"]}""", t)
            })
          case m: Min =>
            colOf(m.column).map(f => (Seq(n -> s"""{"$$min":"$$${f.name}"}"""), "1", f.dataType))
          case m: Max =>
            colOf(m.column).map(f => (Seq(n -> s"""{"$$max":"$$${f.name}"}"""), "1", f.dataType))
          case a: Avg if !a.isDistinct =>
            // decimal avg stays engine-side (Spark's p+4/s+4 result
            // scale has no server-side equivalent); $avg already
            // yields null over a valueless group, matching Spark
            colOf(a.column).collect {
              case f if Set[DataType](ByteType, ShortType, IntegerType, LongType,
                FloatType, DoubleType).contains(f.dataType) =>
                (Seq(n -> s"""{"$$avg":"$$${f.name}"}"""), "1", DoubleType)
            }
          case _ => None // distinct / general / UDAF: not offered
        }
      }
    if (!funcs.forall(_.isDefined)) return None
    val compiled = funcs.flatten
    val accNames = compiled.flatMap(_._1.map(_._1))
    if (groupCols.exists(accNames.contains(_))) return None // name collision guard
    val idDoc =
      if (groupCols.isEmpty) "null"
      else groupCols.zipWithIndex.map { case (c, i) => s""""g$i":"$$$c"""" }.mkString("{", ",", "}")
    val groupStage = s"""{"$$group":{"_id":$idDoc""" +
      compiled.flatMap(_._1).map { case (n, acc) => s""","$n":$acc""" }.mkString + "}}"
    val projectStage = s"""{"$$project":{"_id":0""" +
      groupCols.zipWithIndex.map { case (c, i) => s""",${field(c)}:"$$_id.g$i"""" }.mkString +
      compiled.zipWithIndex.map { case ((_, proj, _), i) => s""","a$i":$proj""" }.mkString + "}}"
    val outSchema = StructType(
      groupCols.map(c => entry.schema.fields.find(_.name == c).get) ++
        compiled.zipWithIndex.map { case ((_, _, t), i) => StructField(s"a$i", t) })
    Some((Seq(groupStage, projectStage), outSchema))
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean = compileAgg(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    // complete-or-nothing: without complete support Spark would treat
    // returned rows as PARTIAL aggregates, which a one-shot command
    // over the whole collection can never honestly provide
    compileAgg(agg) match {
      case some @ Some(_) => aggPushed = some; true
      case None => false
    }
  }

  override def build(): Scan = {
    val filter = filterDoc match {
      case Seq() => "{}"
      case Seq(one) => one
      case many => s"""{"$$and":[${many.mkString(",")}]}"""
    }
    aggPushed match {
      case Some((stages, outSchema)) =>
        val matchStage = if (filterDoc.isEmpty) Seq.empty else Seq(s"""{"$$match":$filter}""")
        val pipeline = (matchStage ++ stages ++
          offset.map(o => s"""{"$$skip":$o}""").toSeq ++
          renderedLimit.map(l => s"""{"$$limit":$l}""").toSeq)
          .mkString("[", ",", "]")
        val cmd = s"""{"aggregate":${field(entry.collection)},"pipeline":$pipeline,"cursor":{}}"""
        new MongoFindScan(name, entry, outSchema, cmd)
      case None =>
        val cols = if (projection.isEmpty) StructType(entry.schema.fields.take(1)) else projection
        val proj = cols.fieldNames.map(c => s"${field(c)}:1").mkString("{", ",", "}")
        def findCmd(f: String): String =
          s"""{"find":${field(entry.collection)},"filter":$f,"projection":$proj""" +
            sortDoc.fold("")(s => s""","sort":$s""") +
            offset.fold("")(o => s""","skip":$o""") +
            renderedLimit.fold("")(l => s""","limit":$l""") + "}"
        // a plain wire find (no global sort/skip/limit) fans out one
        // cursor per declared shard; anything with global semantics
        // must stay a single cursor
        val shardable = entry.wire.isDefined && entry.shardFilters.nonEmpty &&
          sortDoc.isEmpty && limit.isEmpty && offset.isEmpty
        val wireCmds =
          if (shardable) entry.shardFilters.map { sc =>
            val conj = filterDoc :+ sc
            findCmd(if (conj.sizeIs == 1) conj.head else s"""{"$$and":[${conj.mkString(",")}]}""")
          } else Seq(findCmd(filter))
        new MongoFindScan(name, entry, cols, findCmd(filter),
          singlePartition = sortDoc.isDefined, wireCommands = wireCmds)
    }
  }
}

final class MongoFindScan(name: String, entry: MongoRegistry.Entry,
    projection: StructType, command: String,
    singlePartition: Boolean = false,
    wireCommands: Seq[String] = Seq.empty) extends Scan with Batch {

  override def readSchema(): StructType = projection
  override def toBatch: Batch = this
  override def description(): String = s"MongoFindScan($command)"

  // memoized: Spark plans partitions more than once per scan (planning
  // + execution); the command set — and on the seam path the transport
  // call itself — must happen exactly once
  private lazy val planned: Array[InputPartition] = entry.wire match {
    case Some((host, port, db)) =>
      // EXECUTOR-SIDE: no command issued here — each partition's task
      // opens its own socket and streams its cursor incrementally
      val cmds = if (wireCommands.isEmpty) Seq(command) else wireCommands
      cmds.map { c =>
        MongoRegistry.recordCommand(name, c)
        MongoWirePartition(c, host, port, db): InputPartition
      }.toArray
    case None =>
      MongoRegistry.recordCommand(name, command)
      val body = entry.transport(command)
      val lines = body.split('\n').iterator.map(_.trim).filter(_.nonEmpty).toVector
      val n = if (singlePartition) 1 else math.max(1, math.min(entry.partitions, lines.size))
      lines.grouped(math.max(1, (lines.size + n - 1) / n))
        .map(chunk => MongoDocsPartition(chunk): InputPartition).toArray
  }

  override def planInputPartitions(): Array[InputPartition] = planned

  override def createReaderFactory(): PartitionReaderFactory =
    new MongoReaderFactory(projection)
}

final case class MongoDocsPartition(lines: Vector[String]) extends InputPartition

/** one cursor, opened and drained INSIDE the task. */
final case class MongoWirePartition(command: String, host: String, port: Int, db: String)
    extends InputPartition

final class MongoReaderFactory(projection: StructType) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
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

    def decodeLine(line: String): InternalRow = {
      val fields = CanonicalJson.objFields(CanonicalJson.parse(line))
      val vals = projection.fields.map(f =>
        fields.get(f.name).map(conv(_, f.dataType)).orNull)
      toCatalyst(Row.fromSeq(vals.toSeq)).asInstanceOf[InternalRow]
    }

    def reader(it: Iterator[InternalRow], onClose: () => Unit): PartitionReader[InternalRow] =
      RowReaders.fromIterator(it, onClose)

    partition match {
      case MongoDocsPartition(lines) =>
        reader(lines.iterator.map(decodeLine), () => ())
      case MongoWirePartition(cmd, host, port, db) =>
        require(org.apache.spark.TaskContext.get() != null,
          "mongo wire scan must open its socket inside a task, never on the driver")
        val cursor = new graft.sources.MongoWire.WireCursor(host, port, db, cmd)
        reader(cursor.map(decodeLine), () => cursor.close())
      case other =>
        throw new IllegalArgumentException(s"mongo reader: unexpected partition $other")
    }
  }
}
