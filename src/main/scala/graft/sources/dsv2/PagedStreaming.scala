package graft.sources.dsv2

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}

/** Micro-batch streaming over the paged registry: the DSv2 streaming
  * source with TYPED, human-readable offsets (cdf: positions are
  * first-class values, not engine-private blobs — SURVEY §1.4; this is
  * the Spark-source embodiment of that rule: the checkpointed offset
  * is `{"rows": N}`, directly comparable to a ledger cursor).
  *
  * Semantics: the registry's row list is an append-only log; an offset
  * is a prefix length. Each trigger reads (start, end]; commit is
  * no-op because the log is durable. Restart from a checkpoint resumes
  * at the committed prefix — rows are delivered exactly once.
  */
final case class RowCountOffset(rows: Long) extends Offset {
  override def json(): String = s"""{"rows":$rows}"""
}

object RowCountOffset {
  def fromJson(s: String): RowCountOffset =
    RowCountOffset("\"rows\":(\\d+)".r.findFirstMatchIn(s)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad offset json: $s")))
}

final class PagedMicroBatchStream(table: String) extends MicroBatchStream {
  private def totalRows: Long =
    PagedRegistry.get(table).partitions.map(_.size.toLong).sum

  override def latestOffset(): Offset = RowCountOffset(totalRows)
  override def initialOffset(): Offset = RowCountOffset(0)
  override def deserializeOffset(json: String): Offset = RowCountOffset.fromJson(json)
  override def commit(end: Offset): Unit = () // log is durable; nothing to ack
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RowCountOffset].rows
    val e = end.asInstanceOf[RowCountOffset].rows
    if (e <= s) Array.empty
    else Array(PagedRangePartition(table, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedRangeReaderFactory(table)
}

final case class PagedRangePartition(table: String, start: Long, end: Long)
    extends InputPartition

final class PagedRangeReaderFactory(table: String) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagedRangePartition]
    val entry = PagedRegistry.get(table)
    val slice = entry.partitions.flatten.slice(p.start.toInt, p.end.toInt)
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(entry.schema)
    val it = slice.iterator.map(r => toCatalyst(r).asInstanceOf[InternalRow])
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
