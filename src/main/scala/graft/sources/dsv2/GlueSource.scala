package graft.sources.dsv2

import java.util.{Map => JMap, OptionalLong}

import scala.collection.concurrent.TrieMap

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.Filter
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
  * Execution: a NATIVE DSv2 Batch whose input partitions execute the
  * pruned parquet DataFrame's own compiled RDD (`queryExecution
  * .toRdd`) — the data path underneath stays the stock vectorized
  * parquet scan over the pruned location list (a hand-rolled DSv2
  * parquet reader would trade whole-stage codegen for nothing), and
  * unlike the earlier V1Scan bridge there is no Row conversion
  * boundary AND the scan reports REAL statistics: Catalyst's
  * `V1ScanWrapper` forwards only readSchema, which silently discarded
  * SupportsReportStatistics; the native Batch surfaces the underlying
  * plan's post-prune sizeInBytes, so a small Glue-mounted table
  * broadcast-joins without hints (Dsv2Spec proves the plan).
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
    // single-FileScan shape: the compiled RDD ships into DSv2 readers,
    // which a UnionRDD plan cannot survive (its getDependencies
    // resolves child partitions, transient on executors)
    val (df, negotiation) = GlueCatalog.scanSingleWithFilters(spark, tbl, partitions, allFilters)
    GlueRegistry.record(name, negotiation)
    val cols = if (projection.isEmpty) StructType(GlueCatalog.fullSchema(tbl).fields.take(1))
      else projection
    new GlueDfScan(df.select(cols.fieldNames.map(col).toSeq: _*), cols)
  }
}

/** Native DSv2 Batch over the pruned parquet DataFrame's compiled
  * RDD[InternalRow]: the reader FACTORY carries the RDD (serialized
  * once into the stage's task binary) and each InputPartition carries
  * only its split, so the vectorized parquet read, pushed filters and
  * whole-stage codegen underneath run
  * unchanged inside the DSv2 reader — and, because this is NOT a
  * V1Scan, [[SupportsReportStatistics]] actually reaches Catalyst:
  * sizeInBytes is the underlying optimized plan's post-prune estimate,
  * which is what lets the join planner broadcast a small Glue table. */
final class GlueDfScan(df: DataFrame, projection: StructType)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = projection
  override def toBatch: Batch = this
  override def description(): String = s"GlueDfScan(${projection.fieldNames.mkString(",")})"

  override def estimateStatistics(): Statistics = {
    val s = df.queryExecution.optimizedPlan.stats
    new Statistics {
      override def sizeInBytes(): OptionalLong =
        OptionalLong.of(s.sizeInBytes.min(BigInt(Long.MaxValue)).toLong)
      override def numRows(): OptionalLong =
        s.rowCount.map(c => OptionalLong.of(c.min(BigInt(Long.MaxValue)).toLong))
          .getOrElse(OptionalLong.empty())
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // narrow-plan law: an executor-side iterator() call cannot resolve
    // shuffle dependencies, so the compiled plan must be exchange-free
    // (it is by construction — scan+filter+project — but a future
    // non-narrow residual must fail typed here, not hang at runtime)
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a
    }
    if (exchanges.nonEmpty)
      throw graft.core.GraftError.Plan(
        s"glue scan: pruned plan contains an exchange (${exchanges.head.nodeName}) — " +
          "the narrow compiled-RDD execution shape cannot carry a shuffle")
    df.queryExecution.toRdd.partitions.map(p => GlueRddPartition(p): InputPartition)
  }

  /** the factory CARRIES the compiled RDD: it is serialized once into
    * the stage's broadcast task binary (the shape Spark itself uses for
    * lineage), so partitions ship only their split — O(P) bytes, not
    * one embedded lineage copy per partition (O(P^2)). */
  override def createReaderFactory(): PartitionReaderFactory =
    new GlueRddReaderFactory(df.queryExecution.toRdd)
}

final case class GlueRddPartition(split: org.apache.spark.Partition) extends InputPartition

final class GlueRddReaderFactory(rdd: RDD[InternalRow]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val gp = partition.asInstanceOf[GlueRddPartition]
    val it = rdd.iterator(gp.split, TaskContext.get())
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
