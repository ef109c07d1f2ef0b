package graft.sources.dsv2

import java.util.{Map => JMap}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.CanonicalJson
import graft.core.CanonicalJson._
import graft.sources.ClickHouse

/** ClickHouse scan as a first-class DataSource V2 connector: Catalyst's
  * pushed filters are negotiated into the ClickHouse dialect and appear
  * verbatim in the generated `SELECT ... FORMAT JSONEachRow` — the same
  * per-connector negotiation record the reference keeps
  * (cdf: crates/cdf-engine/src/table_provider.rs:151-178; ClickHouse
  * capability set crates/cdf-source-clickhouse/src/resource.rs:284-300).
  *
  * Fidelity classification, per predicate:
  *  - Exact: one of { = > >= < <= } on a declared-pushable column with a
  *    renderable literal → pushed into the SQL WHERE, NOT re-checked.
  *  - Unsupported (any other shape): stays engine-side; Spark receives
  *    it back as a residual and re-applies it over the fetched rows.
  * Projection prunes to the required columns in the SELECT list; LIMIT
  * pushes because every pushed predicate is Exact
  * (table_provider.rs:126-137 — a superset response would forbid it).
  *
  * Scale shape, two modes:
  *  - `http`-backed (the 100 TB path): one dialect query PER SHARD
  *    predicate, POSTed and streamed line-by-line INSIDE each task —
  *    result bytes never transit the driver, per-task memory is one
  *    line + one row.
  *  - seam-backed (bounded fixtures): ONE transport call driver-side,
  *    lines fanned out across `partitions` InputPartitions for
  *    distributed decode + residual re-check.
  */
object ClickHouseRegistry {
  final case class Entry(
      table: String,
      schema: StructType,
      transport: ClickHouse.Transport,
      pushable: Set[String],
      partitions: Int = 4,
      /** HTTP-interface endpoint: when set, the scan bypasses
        * `transport` and runs EXECUTOR-SIDE — each task POSTs its own
        * dialect query and streams the JSONEachRow response off the
        * socket line-by-line; result bytes never transit the driver. */
      http: Option[String] = None,
      /** raw disjoint shard predicates (dialect SQL) covering the
        * table; with `http` set, a plain scan fans out one task +
        * query per shard. */
      shardWheres: Seq[String] = Seq.empty)
  private val tables = TrieMap.empty[String, Entry]
  /** negotiation record: the dialect SQL each scan actually issued. */
  val issuedSql = TrieMap.empty[String, Vector[String]]
  def register(name: String, e: Entry): Unit = { tables.put(name, e); issuedSql.put(name, Vector.empty) }
  def get(name: String): Entry = tables.getOrElse(name,
    throw new IllegalArgumentException(s"unknown clickhouse table: $name"))
  def recordSql(name: String, sql: String): Unit =
    issuedSql.updateWith(name)(v => Some(v.getOrElse(Vector.empty) :+ sql))
}

class ClickHouseSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ClickHouseRegistry.get(options.get("table")).schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ClickHouseTable(properties.get("table"))
  override def supportsExternalMetadata(): Boolean = false
}

final class ClickHouseTable(name: String) extends Table with SupportsRead {
  private val entry = ClickHouseRegistry.get(name)
  override def name(): String = s"clickhouse:$name"
  override def schema(): StructType = entry.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ClickHouseScanBuilder(name, entry)
}

final class ClickHouseScanBuilder(name: String, entry: ClickHouseRegistry.Entry)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownTopN with SupportsPushDownAggregates
    with SupportsPushDownOffset {

  private var exact: Seq[ClickHouse.Pred] = Seq.empty
  private var exactFilters: Array[Filter] = Array.empty
  private var projection: StructType = entry.schema
  private var limit: Option[Long] = None
  private var offset: Option[Long] = None
  private var order: Seq[ClickHouse.Order] = Seq.empty
  private var residualHeld = false
  /** set when a complete aggregation is pushed: (select items, group-by
    * idents, output schema). */
  private var aggPushed: Option[(Seq[String], Seq[String], StructType)] = None

  /** renderable literal for the dialect (ClickHouse.literal's domain). */
  private def renderable(v: Any): Boolean = v match {
    case _: String | _: java.lang.Boolean | _: java.math.BigDecimal => true
    case _: Number => true
    case _ => false
  }

  private def toPred(f: Filter): Option[ClickHouse.Pred] = {
    def p(c: String, op: String, v: Any): Option[ClickHouse.Pred] =
      if (entry.pushable.contains(c) && renderable(v)) Some(ClickHouse.Pred(c, op, v)) else None
    f match {
      case EqualTo(c, v) => p(c, "=", v)
      case GreaterThan(c, v) => p(c, ">", v)
      case GreaterThanOrEqual(c, v) => p(c, ">=", v)
      case LessThan(c, v) => p(c, "<", v)
      case LessThanOrEqual(c, v) => p(c, "<=", v)
      case _ => None
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ex, residual) = filters.partition(f => toPred(f).isDefined)
    exact = ex.flatMap(toPred).toSeq
    exactFilters = ex
    residualHeld = residual.nonEmpty
    residual // engine-side re-check for everything the dialect can't say
  }
  override def pushedFilters(): Array[Filter] = exactFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep declared column ORDER (the SELECT list is schema-ordered);
    // with an aggregation pushed the output schema IS the agg shape
    if (aggPushed.isEmpty)
      projection = StructType(entry.schema.fields.filter(f =>
        requiredSchema.fieldNames.contains(f.name)))

  /** every pushed predicate is Exact, so a source-side LIMIT can never
    * drop a row a residual would have kept. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l.toLong); true }

  /** OFFSET pushdown. Spark's contract: when a limit is also pushed it
    * arrives as limit+offset (rows INCLUDING the skipped prefix), so
    * the dialect renders `LIMIT (limit-offset) OFFSET offset` —
    * skip-then-take, equivalent to Spark's take-(l+o)-then-skip-o.
    * Same Exact-only law as limit. */
  override def pushOffset(o: Int): Boolean =
    if (residualHeld) false else { offset = Some(o.toLong); true }

  private def renderedLimit: Option[Long] =
    (limit, offset) match {
      case (Some(l), Some(o)) => Some(math.max(0L, l - o))
      case (l, _) => l
    }

  /** ORDER BY + LIMIT forwarded whole (cdf forwards OrderBy to sources,
    * crates/cdf-kernel/src/resource.rs:611-622). Legal only when every
    * pushed predicate is Exact (table_provider.rs:126-137): under a
    * residual, a server-side top-N could retain rows the engine then
    * filters, dropping rows that belonged in the true top-N. Catalyst
    * never offers TopN across a residual Filter, but the law is the
    * connector's to uphold, so it is checked here too. */
  override def pushTopN(orders: Array[SortOrder], l: Int): Boolean = {
    if (residualHeld || aggPushed.isDefined) return false
    val terms = orders.toSeq.map { o =>
      o.expression() match {
        case ref: NamedReference if ref.fieldNames.length == 1 &&
            entry.schema.fieldNames.contains(ref.fieldNames()(0)) =>
          Some(ClickHouse.Order(ref.fieldNames()(0),
            desc = o.direction() == SortDirection.DESCENDING,
            nullsLast = o.nullOrdering() == NullOrdering.NULLS_LAST))
        case _ => None // expression sorts stay engine-side
      }
    }
    if (!terms.forall(_.isDefined)) return false
    order = terms.flatten
    limit = Some(l.toLong)
    true
  }

  /** the server evaluates the full ORDER BY + LIMIT, so the scan output
    * IS the top-N in order — Spark drops its own Sort entirely. */
  override def isPartiallyPushed(): Boolean = false

  // ------------------------------------------------ aggregate pushdown

  /** GROUP BY + {count/sum/min/max/avg} render directly into the
    * dialect SQL with COMPLETE-pushdown semantics (one query computes
    * final groups; Spark re-aggregates nothing) — symmetric with the
    * Mongo aggregate pipeline. Null parity is EXPLICIT in the SQL: the
    * `-OrNull` combinator makes sum/min/max/avg return NULL when a
    * group has no non-NULL input, exactly Spark's semantics, instead
    * of relying on the server's Nullable-argument defaults. */
  private def compileAgg(agg: Aggregation): Option[(Seq[String], Seq[String], StructType)] = {
    if (residualHeld) return None // Exact-only law, same as limit/top-N
    val groups: Seq[Option[StructField]] = agg.groupByExpressions.toSeq.map {
      case ref: NamedReference if ref.fieldNames.length == 1 =>
        entry.schema.fields.find(_.name == ref.fieldNames()(0))
      case _ => None
    }
    if (!groups.forall(_.isDefined)) return None
    val groupFields = groups.flatten
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[StructField] =
      e match {
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
    val numeric: Set[DataType] =
      Set(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
    val items: Seq[Option[(String, DataType)]] =
      agg.aggregateExpressions.toSeq.zipWithIndex.map { case (fn, i) =>
        val alias = s"a$i"
        fn match {
          case _: CountStar => Some((s"count(*) AS $alias", LongType))
          case c: Count if !c.isDistinct =>
            colOf(c.column).map(f => (s"count(${ClickHouse.ident(f.name)}) AS $alias", LongType))
          case s: Sum if !s.isDistinct =>
            colOf(s.column).flatMap(f => sumType(f.dataType).map(t =>
              (s"sumOrNull(${ClickHouse.ident(f.name)}) AS $alias", t)))
          case m: Min =>
            colOf(m.column).map(f => (s"minOrNull(${ClickHouse.ident(f.name)}) AS $alias", f.dataType))
          case m: Max =>
            colOf(m.column).map(f => (s"maxOrNull(${ClickHouse.ident(f.name)}) AS $alias", f.dataType))
          case a: Avg if !a.isDistinct =>
            // decimal avg stays engine-side (Spark's p+4/s+4 result
            // scale has no dialect equivalent)
            colOf(a.column).collect {
              case f if numeric.contains(f.dataType) =>
                (s"avgOrNull(${ClickHouse.ident(f.name)}) AS $alias", DoubleType)
            }
          case _ => None // distinct / general / UDAF: not offered
        }
      }
    if (!items.forall(_.isDefined)) return None
    val aggItems = items.flatten
    if (groupFields.exists(f => aggItems.indices.map(i => s"a$i").contains(f.name)))
      return None // name collision guard
    val selectItems = groupFields.map(f => ClickHouse.ident(f.name)) ++ aggItems.map(_._1)
    val outSchema = StructType(groupFields ++
      aggItems.zipWithIndex.map { case ((_, t), i) => StructField(s"a$i", t) })
    Some((selectItems, groupFields.map(_.name), outSchema))
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean = compileAgg(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    // complete-or-nothing: one dialect query computes final groups; a
    // partial-aggregate contract (Spark merging partials) is never
    // honestly servable from a single-shot transport
    compileAgg(agg) match {
      case some @ Some(_) => aggPushed = some; true
      case None => false
    }

  override def build(): Scan = {
    aggPushed match {
      case Some((selectItems, groupIdents, outSchema)) =>
        val spec = ClickHouse.ScanSpec(entry.table, Seq.empty, exact,
          limit = renderedLimit, selectItems = selectItems, groupBy = groupIdents,
          offset = offset)
        new ClickHouseScan(name, entry, outSchema, spec)
      case None =>
        val cols = if (projection.isEmpty) StructType(entry.schema.fields.take(1)) else projection
        val spec = ClickHouse.ScanSpec(entry.table, cols.fieldNames.toSeq, exact,
          orderBy = order, limit = renderedLimit, offset = offset)
        // a fully-pushed top-N must come back as ONE partition: Spark has
        // removed its Sort, so row order = partition-concatenation order
        new ClickHouseScan(name, entry, cols, spec, singlePartition = order.nonEmpty)
    }
  }
}

final class ClickHouseScan(name: String, entry: ClickHouseRegistry.Entry,
    projection: StructType, spec: ClickHouse.ScanSpec,
    singlePartition: Boolean = false) extends Scan with Batch {

  override def readSchema(): StructType = projection
  override def toBatch: Batch = this
  override def description(): String = s"ClickHouseScan(${spec.sql})"

  /** Wire-backed entries plan one dialect query PER SHARD and open
    * nothing here — tasks stream their own responses. Seam-backed
    * entries keep the one-driver-query shape (bounded fixtures).
    * Memoized: Spark plans partitions more than once per scan; the
    * record — and on the seam path the transport call — must happen
    * exactly once. */
  private lazy val planned: Array[InputPartition] = entry.http match {
    case Some(endpoint) =>
      // global semantics (order/limit/offset/group/aggregate) pin the
      // read to ONE query; a plain scan fans out over the declared
      // shards. selectItems non-empty = a pushed aggregate — a GLOBAL
      // one has groupBy empty, and sharding it would return one
      // partial row per shard with Spark's own aggregate already
      // removed (complete pushdown), silently multiplying results.
      val shardable = !singlePartition && spec.orderBy.isEmpty && spec.limit.isEmpty &&
        spec.offset.isEmpty && spec.groupBy.isEmpty && spec.selectItems.isEmpty &&
        entry.shardWheres.nonEmpty
      val specs =
        if (shardable) entry.shardWheres.map(w => spec.copy(rawWheres = spec.rawWheres :+ w))
        else Seq(spec)
      specs.map { s =>
        ClickHouseRegistry.recordSql(name, s.sql)
        ClickHouseHttpPartition(s.sql, endpoint): InputPartition
      }.toArray
    case None =>
      ClickHouseRegistry.recordSql(name, spec.sql)
      val body = entry.transport(spec.sql)
      val lines = body.split('\n').iterator.map(_.trim).filter(_.nonEmpty).toVector
      val n = if (singlePartition) 1 else math.max(1, math.min(entry.partitions, lines.size))
      lines.grouped(math.max(1, (lines.size + n - 1) / n))
        .map(chunk => ClickHouseLinesPartition(chunk): InputPartition).toArray
  }

  override def planInputPartitions(): Array[InputPartition] = planned

  override def createReaderFactory(): PartitionReaderFactory =
    new ClickHouseReaderFactory(projection)
}

final case class ClickHouseLinesPartition(lines: Vector[String]) extends InputPartition

/** one dialect query, POSTed and streamed INSIDE the task. */
final case class ClickHouseHttpPartition(sql: String, endpoint: String) extends InputPartition

final class ClickHouseReaderFactory(projection: StructType) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(projection)

    def conv(j: J, dt: DataType): Any = (j, dt) match {
      case (JNull, _) => null
      case (JInt(v), LongType) => v
      case (JInt(v), IntegerType) => v.toInt
      case (JInt(v), ShortType) => v.toShort
      case (JInt(v), ByteType) => v.toByte
      case (JInt(v), DoubleType) => v.toDouble
      case (JInt(v), FloatType) => v.toFloat
      case (JNum(v), DoubleType) => v
      case (JNum(v), FloatType) => v.toFloat
      case (JStr(v), StringType) => v
      case (JBool(v), BooleanType) => v
      case (JInt(v), d: DecimalType) => BigDecimal(v).setScale(d.scale)
      case (JNum(v), d: DecimalType) => BigDecimal(v).setScale(d.scale, BigDecimal.RoundingMode.HALF_UP)
      case (JStr(v), d: DecimalType) => BigDecimal(v)
      case (JStr(v), DateType) => java.sql.Date.valueOf(v)
      case (JStr(v), TimestampType) => java.sql.Timestamp.valueOf(v.replace("T", " "))
      case (other, t) => throw new IllegalArgumentException(
        s"clickhouse decode: cannot read $other as $t")
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
      case ClickHouseLinesPartition(lines) =>
        reader(lines.iterator.map(decodeLine), () => ())
      case ClickHouseHttpPartition(sql, endpoint) =>
        require(org.apache.spark.TaskContext.get() != null,
          "clickhouse http scan must open its connection inside a task, never on the driver")
        val in = new graft.sources.ClickHouseHttpClient(endpoint).executeStream(sql)
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
        val lineIt = Iterator.continually(br.readLine()).takeWhile(_ != null)
          .map(_.trim).filter(_.nonEmpty)
        reader(lineIt.map(decodeLine), () => br.close())
      case other =>
        throw new IllegalArgumentException(s"clickhouse reader: unexpected partition $other")
    }
  }
}
