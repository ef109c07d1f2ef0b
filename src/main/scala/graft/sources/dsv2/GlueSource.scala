package graft.sources.dsv2

import java.util.{Map => JMap}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, Filter, TableScan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.GlueCatalog

/** Glue-catalog table as a DataSource V2 connector, completing the
  * uniform per-connector negotiation surface beside ClickHouse / Mongo
  * / REST (cdf: crates/cdf-engine/src/table_provider.rs:151-178
  * records negotiation identically for every connector; Glue discovery
  * crates/cdf-source-glue/src/driver.rs:1073).
  *
  * Negotiation, per predicate — the SAME classification as the driver
  * seam (`GlueCatalog.classifyFilters`, so the two surfaces can never
  * disagree):
  *  - catalog-side (Exact): EqualTo / In / IsNotNull over a PARTITION
  *    KEY — answered from the catalog's authoritative partition values;
  *    pruned locations are never opened, nothing re-checked.
  *  - residual: everything else; Spark re-applies it above the scan AND
  *    it is planted inside the underlying parquet read, where the
  *    format's own native pushdown takes it the rest of the way.
  *
  * Execution goes through [[org.apache.spark.sql.connector.read.V1Scan]]
  * — the public bridge Spark's own JDBC DSv2 connector uses — so the
  * data path underneath stays the stock vectorized parquet scan over
  * the pruned location list (a hand-rolled DSv2 parquet reader would
  * trade whole-stage codegen for nothing). The one cost is a
  * row-conversion boundary at the bridge, which is why the driver seam
  * (`GlueCatalog.scanWithFilters`) remains the hot path for engine
  * pipelines; this connector is the uniform-negotiation surface.
  */
object GlueRegistry {
  final case class Entry(transport: GlueCatalog.Transport, database: String, table: String)
  private val tables = TrieMap.empty[String, Entry]
  /** negotiation record: what each scan actually pruned vs re-checked. */
  val negotiations = TrieMap.empty[String, Vector[GlueCatalog.Negotiation]]
  def register(name: String, e: Entry): Unit = { tables.put(name, e); negotiations.put(name, Vector.empty) }
  def get(name: String): Entry = tables.getOrElse(name,
    throw new IllegalArgumentException(s"unknown glue table: $name"))
  def record(name: String, n: GlueCatalog.Negotiation): Unit =
    negotiations.updateWith(name)(v => Some(v.getOrElse(Vector.empty) :+ n))
}

class GlueSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val e = GlueRegistry.get(options.get("table"))
    val tbl = GlueCatalog.getTables(e.transport, e.database).find(_.name == e.table)
      .getOrElse(throw new IllegalArgumentException(s"glue table not found: ${e.table}"))
    GlueCatalog.fullSchema(tbl)
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GlueDsv2Table(properties.get("table"))
  override def supportsExternalMetadata(): Boolean = false
}

final class GlueDsv2Table(name: String) extends Table with SupportsRead {
  private val entry = GlueRegistry.get(name)
  private lazy val tbl = GlueCatalog.getTables(entry.transport, entry.database)
    .find(_.name == entry.table)
    .getOrElse(throw new IllegalArgumentException(s"glue table not found: ${entry.table}"))
  private lazy val partitions =
    GlueCatalog.getPartitions(entry.transport, entry.database, entry.table)
  override def name(): String = s"glue:$name"
  override def schema(): StructType = GlueCatalog.fullSchema(tbl)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GlueScanBuilder(name, tbl, partitions)
}

final class GlueScanBuilder(name: String, tbl: GlueCatalog.GlueTable,
    partitions: Seq[GlueCatalog.GluePartition])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var allFilters: Seq[Filter] = Seq.empty
  private var catalogSide: Array[Filter] = Array.empty
  private var projection: StructType = GlueCatalog.fullSchema(tbl)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (cat, residual, _) = GlueCatalog.classifyFilters(tbl, filters.toSeq)
    allFilters = filters.toSeq
    catalogSide = cat.toArray
    residual.toArray // Spark re-checks; the parquet scan also gets them
  }
  override def pushedFilters(): Array[Filter] = catalogSide

  override def pruneColumns(requiredSchema: StructType): Unit =
    projection = StructType(GlueCatalog.fullSchema(tbl).fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = {
    val spark = SparkSession.active
    val (df, negotiation) = GlueCatalog.scanWithFilters(spark, tbl, partitions, allFilters)
    GlueRegistry.record(name, negotiation)
    val cols = if (projection.isEmpty) StructType(GlueCatalog.fullSchema(tbl).fields.take(1))
      else projection
    new GlueV1Scan(df.select(cols.fieldNames.map(col).toSeq: _*), cols)
  }
}

/** V1 bridge: DSv2 negotiation above, the stock vectorized parquet
  * DataFrame below (same pattern as Spark's JDBCScan).
  *
  * Known bridge limitation: Catalyst wraps every V1Scan in
  * `V1ScanWrapper`, which forwards ONLY readSchema — a
  * SupportsReportStatistics implementation here is silently ignored,
  * so post-prune size estimates cannot reach the join planner through
  * this connector. Pipelines that want size-aware planning (broadcast
  * of a small pruned read) should use the driver seam
  * (`GlueCatalog.scanWithFilters`), whose DataFrame carries the
  * parquet relation's real statistics natively. */
final class GlueV1Scan(df: DataFrame, projection: StructType) extends V1Scan {
  override def readSchema(): StructType = projection
  override def toV1TableScan[T <: BaseRelation with TableScan](context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = projection
      override def buildScan(): RDD[Row] = df.rdd
    }.asInstanceOf[T]
}
