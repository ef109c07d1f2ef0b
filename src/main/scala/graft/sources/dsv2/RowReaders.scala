package graft.sources.dsv2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader

/** The one Iterator→PartitionReader adapter every wire connector
  * needs (Mongo OP_MSG cursors, ClickHouse HTTP streams, PG COPY
  * streams): pulls on demand, closes its transport exactly once.
  * Shared so a future change (e.g. close-on-failure mid-iteration)
  * lands in one place, not three. */
private[dsv2] object RowReaders {
  def fromIterator(it: Iterator[InternalRow],
      onClose: () => Unit = () => ()): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = current
      override def close(): Unit = onClose()
    }
}
