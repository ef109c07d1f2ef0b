package graft.sources.dsv2

import java.util.{Map => JMap}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.CanonicalJson
import graft.core.CanonicalJson._

/** MongoDB change stream as a Structured Streaming micro-batch source
  * with RESUME-TOKEN offsets (cdf: crates/cdf-source-mongodb — change-
  * stream resources with resume tokens and multi-document transaction
  * settlement; the reference packs settlement units that never split a
  * transaction, cdc_log_source.rs:34-340).
  *
  * Offset domain: the resume token (`_id._data`) — a hex KeyString
  * whose LEXICOGRAPHIC order is stream order, so an offset is a plain
  * string bound and restart = strictly-greater filter, exactly the
  * claim `MongoChangeStream.afterToken` makes for the batch seam.
  *
  * Transaction law, Spark-first: a multi-document transaction's events
  * share one commit `clusterTime` and are CONTIGUOUS in token order.
  * A change stream cannot know mid-group whether more events of the
  * trailing commit are still in flight, so in continuous mode the
  * frontier this source offers the engine HOLDS BACK the trailing
  * commit group — an offset is only ever a boundary between complete
  * groups, and therefore no checkpoint can split a transaction (the
  * same admission-control shape as CdcMicroBatchStream's settlement
  * boundaries). Trigger.AvailableNow drains to the cap captured at
  * query start: a drained stream's tail groups are complete by the
  * server's commit guarantee.
  *
  * Rows are (resume_token, event-JSON); the typed decode is
  * `MongoChangeStream.decodeEnvelope`/`decodeDocument` over the
  * streamed frame — codegen'd get_json_object columns, so the decode
  * scales with the stream's partitioning, not the driver.
  */
object MongoStreamRegistry {
  final case class Event(token: String, commitKey: String, json: String)
  final case class Entry(events: Vector[Event], partitions: Int = 4)

  private val tables = TrieMap.empty[String, Entry]

  private def parse(eventJson: String): Event = {
    val f = CanonicalJson.objFields(CanonicalJson.parse(eventJson))
    val token = f.get("_id").map(CanonicalJson.objFields).flatMap(_.get("_data")) match {
      case Some(JStr(t)) => t
      case other => throw new IllegalArgumentException(s"change event without _id._data: $other")
    }
    // Events sharing a clusterTime form one commit group. An event
    // WITHOUT a clusterTime must get a UNIQUE key (its own resume
    // token) — a shared sentinel like 0 would fuse unrelated events
    // into a phantom group and, when the newest event lacks a
    // clusterTime, truncate the frontier to before the FIRST such
    // event, stalling offset advancement (liveness).
    val ck = f.get("clusterTime").map(CanonicalJson.objFields)
      .flatMap(_.get("$timestamp")).map(CanonicalJson.objFields) match {
      case Some(ts) =>
        def l(k: String): Long = ts.get(k) match {
          case Some(JInt(v)) => v
          case _ => 0L
        }
        s"ct:${(l("t") << 32) | l("i")}"
      case None => s"tok:$token"
    }
    Event(token, ck, eventJson)
  }

  def register(name: String, partitions: Int = 4): Unit =
    tables.put(name, Entry(Vector.empty, partitions))

  /** Append committed change events (the only kind a real change
    * stream ever delivers). Tokens must extend the stream in order. */
  def append(name: String, eventJsons: Seq[String]): Unit = {
    val e = get(name)
    val evs = eventJsons.map(parse)
    val all = e.events ++ evs
    require(all.map(_.token) == all.map(_.token).sorted.distinct,
      "resume tokens must be strictly increasing (stream order)")
    tables.put(name, e.copy(events = all))
  }

  def get(name: String): Entry = tables.getOrElse(name,
    throw new IllegalArgumentException(s"unknown change stream: $name"))

  val schema: StructType = StructType(Seq(
    StructField("resume_token", StringType, nullable = false),
    StructField("event", StringType, nullable = false)))
}

/** Typed offset: the greatest resume token fully contained in the
  * prefix ("" = before the first event). */
final case class TokenOffset(token: String) extends Offset {
  override def json(): String =
    s"""{"resume_token":${CanonicalJson.render(JStr(token))}}"""
}
object TokenOffset {
  val Start: TokenOffset = TokenOffset("")
  def fromJson(s: String): TokenOffset = {
    val f = CanonicalJson.objFields(CanonicalJson.parse(s))
    f.get("resume_token") match {
      case Some(JStr(t)) => TokenOffset(t)
      case other => throw new IllegalArgumentException(s"bad token offset json: $other")
    }
  }
}

class MongoStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MongoStreamRegistry.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new MongoStreamTable(properties.get("stream"))
  override def supportsExternalMetadata(): Boolean = false
}

final class MongoStreamTable(name: String) extends Table with SupportsRead {
  override def name(): String = s"mongostream:$name"
  override def schema(): StructType = MongoStreamRegistry.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = MongoStreamRegistry.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new MongoStreamMicroBatch(name)
        override def description(): String = s"MongoChangeStreamScan($name)"
      }
    }
}

final class MongoStreamMicroBatch(stream: String)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def entry = MongoStreamRegistry.get(stream)
  @volatile private var availableNowCap: Option[String] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = entry.events.lastOption.map(_.token)

  override def initialOffset(): Offset = TokenOffset.Start
  override def deserializeOffset(json: String): Offset = TokenOffset.fromJson(json)
  override def commit(end: Offset): Unit = () // server cursor resumes by token
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** The safe frontier. Continuous mode: everything up to but NOT
    * including the trailing commit group (its completeness is unproven
    * until a later commit appears). AvailableNow: the cap captured at
    * query start — the drained tail is complete by the server's
    * commit-before-delivery guarantee. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[TokenOffset].token
    val evs = entry.events
    val frontier = availableNowCap match {
      case Some(cap) => Some(cap)
      case None =>
        evs.lastOption.flatMap { last =>
          val complete = evs.takeWhile(_.commitKey != last.commitKey)
          complete.lastOption.map(_.token)
        }
    }
    TokenOffset(frontier.filter(_ > s).getOrElse(s))
  }

  override def reportLatestOffset(): Offset =
    TokenOffset(entry.events.lastOption.map(_.token).getOrElse(""))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(start, limit)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TokenOffset].token
    val e = end.asInstanceOf[TokenOffset].token
    val slice = entry.events.filter(ev => ev.token > s && ev.token <= e)
    if (slice.isEmpty) return Array.empty
    val n = math.max(1, math.min(entry.partitions, slice.size))
    slice.grouped(math.max(1, (slice.size + n - 1) / n))
      .map(chunk => MongoEventsPartition(chunk.map(ev => (ev.token, ev.json))): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new MongoEventsReaderFactory
}

final case class MongoEventsPartition(events: Vector[(String, String)]) extends InputPartition

final class MongoEventsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val events = partition.asInstanceOf[MongoEventsPartition].events
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(MongoStreamRegistry.schema)
    val it = events.iterator.map { case (tok, json) =>
      toCatalyst(Row(tok, json)).asInstanceOf[InternalRow]
    }
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
