package graft.sources.dsv2

import java.util.{Map => JMap}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector with negotiated pushdown fidelity — the
  * Spark-native re-expression of the reference's
  * `QueryableResourceTableProvider` (cdf: crates/cdf-engine/src/
  * table_provider.rs:33-260; fidelity negotiation planning.rs:1169-1310).
  *
  * Per-predicate classification (resource.rs:523-529):
  *  - Exact: applied source-side, NOT returned to Spark (no re-check)
  *  - Inexact: source returns a SUPERSET; the predicate is also
  *    returned as residual so Spark re-applies it (the engine re-check)
  *  - Unsupported: returned untouched, evaluated engine-side only
  * Limit pushes only when every pushed predicate is Exact
  * (table_provider.rs:126-137).
  *
  * The backing store is an in-memory registry (this container has zero
  * egress); each registered partition becomes one `InputPartition`, so
  * partition planning and the union-completeness law are real.
  */
object PagedRegistry {
  final case class Fid(exact: Set[String], inexact: Set[String])
  final case class Entry(schema: StructType, partitions: Seq[Seq[Row]], fid: Fid)
  private val tables = TrieMap.empty[String, Entry]
  def register(name: String, e: Entry): Unit = tables.put(name, e)
  /** append rows (the streaming log grows; readers pick them up next trigger). */
  def append(name: String, rows: Seq[Row]): Unit = {
    val e = get(name)
    tables.put(name, e.copy(partitions = e.partitions :+ rows))
  }
  def get(name: String): Entry = tables.getOrElse(name,
    throw new IllegalArgumentException(s"unknown paged table: $name"))
}

class PagedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedRegistry.get(options.get("table")).schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new PagedTable(properties.get("table"))
  override def supportsExternalMetadata(): Boolean = false
}

final class PagedTable(name: String) extends Table with SupportsRead {
  private val entry = PagedRegistry.get(name)
  override def name(): String = s"paged:$name"
  override def schema(): StructType = entry.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(name, entry)
}

final class PagedScanBuilder(name: String, entry: PagedRegistry.Entry)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var inexactPushed: Array[Filter] = Array.empty
  private var projection: StructType = entry.schema
  private var limit: Option[Int] = None

  private def colOf(f: Filter): Option[String] = f match {
    case EqualTo(c, _) => Some(c)
    case GreaterThan(c, _) => Some(c)
    case GreaterThanOrEqual(c, _) => Some(c)
    case LessThan(c, _) => Some(c)
    case LessThanOrEqual(c, _) => Some(c)
    case IsNotNull(c) => Some(c)
    case IsNull(c) => Some(c)
    case In(c, _) => Some(c)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (exact, rest) = filters.partition(f =>
      colOf(f).exists(entry.fid.exact.contains))
    val (inexact, unsupported) = rest.partition(f =>
      colOf(f).exists(entry.fid.inexact.contains))
    pushed = exact ++ inexact
    inexactPushed = inexact
    // residuals Spark must re-check: inexact (superset) + unsupported
    inexact ++ unsupported
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    projection = requiredSchema

  /** limit pushes only when nothing Inexact survives (a superset would
    * make source-side limit drop matching rows). */
  override def pushLimit(l: Int): Boolean =
    if (inexactPushed.isEmpty) { limit = Some(l); true } else false

  override def build(): Scan =
    new PagedScan(name, entry, projection, pushed, inexactPushed, limit)
}

final class PagedScan(name: String, entry: PagedRegistry.Entry,
    projection: StructType, pushed: Array[Filter],
    inexact: Array[Filter], limit: Option[Int]) extends Scan with Batch {

  override def readSchema(): StructType = projection
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new PagedMicroBatchStream(name)
  override def description(): String =
    s"PagedScan($name, pushed=${pushed.mkString(",")}, " +
      s"inexact=${inexact.mkString(",")}, limit=$limit)"

  override def planInputPartitions(): Array[InputPartition] =
    entry.partitions.indices.map(i => PagedPartition(name, i): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(name, projection, pushed, inexact.toSet, limit)
}

final case class PagedPartition(table: String, idx: Int) extends InputPartition

final class PagedReaderFactory(table: String, projection: StructType,
    pushed: Array[Filter], inexact: Set[Filter], limit: Option[Int])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagedPartition]
    val entry = PagedRegistry.get(table)
    val schema = entry.schema
    val nameIdx = schema.fieldNames.zipWithIndex.toMap

    def eval(f: Filter, r: Row): Boolean = {
      def v(c: String): Any = r.get(nameIdx(c))
      // Spark numeric semantics exactly (capability truth-telling under
      // adversarial values, cdf VISION §20.1): NaN is greatest and
      // self-equal; -0.0 equals 0.0.
      def norm(d: Double): Double = if (d == 0.0) 0.0 else d
      def num(a: Any): Option[Double] = a match {
        case n: Number => Some(n.doubleValue()); case _ => None
      }
      def cmp(c: String, x: Any): Int =
        java.lang.Double.compare(norm(v(c).toString.toDouble), norm(x.toString.toDouble))
      f match {
        case EqualTo(c, x) => (num(v(c)), num(x)) match {
          case (Some(_), Some(_)) => v(c) != null && cmp(c, x) == 0
          case _ => v(c) == x
        }
        case GreaterThan(c, x) => v(c) != null && cmp(c, x) > 0
        case GreaterThanOrEqual(c, x) => v(c) != null && cmp(c, x) >= 0
        case LessThan(c, x) => v(c) != null && cmp(c, x) < 0
        case LessThanOrEqual(c, x) => v(c) != null && cmp(c, x) <= 0
        case IsNotNull(c) => v(c) != null
        case IsNull(c) => v(c) == null
        case In(c, xs) => xs.contains(v(c))
        case _ => true
      }
    }

    // Exact filters apply faithfully; Inexact ones return a SUPERSET
    // (every 3rd row leaks through) — the engine's residual re-check
    // must trim it, which the conformance test asserts.
    def keep(r: Row, rowIdx: Int): Boolean = pushed.forall { f =>
      val base = eval(f, r)
      if (inexact.contains(f)) base || rowIdx % 3 == 0 else base
    }

    val rows = entry.partitions(p.idx).zipWithIndex
      .filter { case (r, i) => keep(r, i) }
      .map(_._1)
    val limited = limit.fold(rows)(rows.take)

    val colIdxs = projection.fieldNames.map(nameIdx).toSeq
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(projection)
    val it = limited.iterator.map { r =>
      toCatalyst(Row.fromSeq(colIdxs.map(r.get))).asInstanceOf[InternalRow]
    }

    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
