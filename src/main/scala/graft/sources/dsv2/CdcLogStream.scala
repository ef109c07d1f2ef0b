package graft.sources.dsv2

import java.util.{Map => JMap}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.streaming.Settlement

/** CDC change-log micro-batch source with TRANSACTION-ATOMIC offsets
  * (cdf: crates/cdf-runtime/src/cdc_log_source.rs:34-340 —
  * `SettlementUnitKind` / `SettlementCadencePolicy`: a settlement unit
  * closes on byte/op ceilings but NEVER splits a source transaction).
  *
  * Spark-first shape: the packing law lives in the source's ADMISSION
  * CONTROL. Every offset this source will ever hand to the engine —
  * and therefore every offset that can reach the checkpoint log — is a
  * settlement-unit boundary, which is by construction a transaction
  * boundary. A micro-batch is exactly one settlement unit; a restart
  * resumes at a unit boundary; a destination observes all of a
  * transaction's effects or none. The offset json is typed and
  * human-readable (`{"tx_id": N}`), directly comparable to a ledger
  * cursor (SURVEY §1.4).
  */
object CdcLogRegistry {
  final case class Entry(
      schema: StructType,
      rows: Seq[Row],            // commit order; txCol monotone non-decreasing
      txCol: String,
      policy: Settlement.Policy,
      bytesPerOp: Long) {
    val txIdx: Int = schema.fieldIndex(txCol)
    /** settlement-unit end boundaries (inclusive tx ids), from the
      * shared packing rule — the SAME code path the conformance test
      * validates. */
    def boundaries: Seq[Long] = {
      val txns = rows.groupBy(_.getLong(txIdx)).toSeq.sortBy(_._1).map {
        case (tx, rs) => Settlement.Txn(tx, rs.size, rs.size * bytesPerOp)
      }
      Settlement.pack(txns, policy).map(_.last.txId)
    }
  }
  private val tables = TrieMap.empty[String, Entry]
  def register(name: String, e: Entry): Unit = {
    val txs = e.rows.map(_.getLong(e.txIdx))
    require(txs == txs.sorted, "cdc log must be in commit order")
    tables.put(name, e)
  }
  def append(name: String, rows: Seq[Row]): Unit = {
    val e = get(name)
    register(name, e.copy(rows = e.rows ++ rows))
  }
  def get(name: String): Entry = tables.getOrElse(name,
    throw new IllegalArgumentException(s"unknown cdc log: $name"))
}

/** Typed offset: the last transaction id fully contained in the
  * prefix. Always a settlement-unit boundary when produced by
  * [[CdcMicroBatchStream]]. */
final case class TxnOffset(txId: Long) extends Offset {
  override def json(): String = s"""{"tx_id":$txId}"""
}
object TxnOffset {
  val Start: TxnOffset = TxnOffset(Long.MinValue)
  def fromJson(s: String): TxnOffset =
    TxnOffset("\"tx_id\":(-?\\d+)".r.findFirstMatchIn(s)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad txn offset json: $s")))
}

class CdcLogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdcLogRegistry.get(options.get("table")).schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new CdcLogTable(properties.get("table"))
  override def supportsExternalMetadata(): Boolean = false
}

final class CdcLogTable(name: String) extends Table with SupportsRead {
  override def name(): String = s"cdclog:$name"
  override def schema(): StructType = CdcLogRegistry.get(name).schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = CdcLogRegistry.get(name).schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CdcMicroBatchStream(name)
        override def description(): String = s"CdcLogScan($name)"
      }
    }
}

final class CdcMicroBatchStream(table: String)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def entry = CdcLogRegistry.get(table)
  // Trigger.AvailableNow drains up to the log end captured at query
  // start; later appends wait for the next run.
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = entry.boundaries.lastOption

  override def initialOffset(): Offset = TxnOffset.Start
  override def deserializeOffset(json: String): Offset = TxnOffset.fromJson(json)
  override def commit(end: Offset): Unit = () // log is durable; nothing to ack
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** One settlement unit per micro-batch: the next boundary after
    * `start`, never past the AvailableNow cap. This is where
    * never-split-a-transaction is enforced — no other offset can be
    * produced, so no other offset can be checkpointed. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[TxnOffset].txId
    val bounds = entry.boundaries
    val capped = availableNowCap.fold(bounds)(c => bounds.filter(_ <= c))
    TxnOffset(capped.find(_ > s).getOrElse(s))
  }

  override def reportLatestOffset(): Offset =
    TxnOffset(entry.boundaries.lastOption.getOrElse(Long.MinValue))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(start, limit)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TxnOffset].txId
    val e = end.asInstanceOf[TxnOffset].txId
    if (e <= s) Array.empty else Array(CdcRangePartition(table, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcRangeReaderFactory(table)
}

/** (fromTx, toTx] slice of the log — a whole settlement unit. */
final case class CdcRangePartition(table: String, fromTx: Long, toTx: Long)
    extends InputPartition

final class CdcRangeReaderFactory(table: String) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcRangePartition]
    val entry = CdcLogRegistry.get(table)
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(entry.schema)
    val it = entry.rows.iterator
      .filter { r => val tx = r.getLong(entry.txIdx); tx > p.fromTx && tx <= p.toTx }
      .map(r => toCatalyst(r).asInstanceOf[InternalRow])
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
