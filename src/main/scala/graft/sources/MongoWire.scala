package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.{ByteBuffer, ByteOrder}

import graft.core.CanonicalJson
import graft.core.CanonicalJson._

/** MongoDB wire protocol CLIENT — OP_MSG (opcode 2013), the modern
  * command transport (mongodb.com/docs/manual/reference/
  * mongodb-wire-protocol, public spec). One command document per
  * round trip: the JSON command the engine's Mongo connectors already
  * compile ([[dsv2.MongoFindSource]]'s find/aggregate shapes) is BSON-
  * encoded with `$db` attached, framed as a kind-0 section, and the
  * reply's `cursor.firstBatch` documents come back as the
  * NDJSON-of-Extended-JSON body the registry transport contract
  * expects — so `wireTransport` is a DROP-IN transport: everything
  * above it (pushdown negotiation, decode, residual re-check) runs
  * unchanged over real wire bytes.
  *
  * Batching: replies with a live cursor id are drained with `getMore`
  * on the same connection until the server returns id 0 — the
  * documented cursor protocol. No live mongod exists in this
  * container; MongoWireSpec drives this client against an embedded
  * OP_MSG fixture over TCP. */
object MongoWire {

  final val OpMsg = 2013

  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  /** frame one kind-0 section command; returns the reply body doc. */
  def roundTrip(socket: Socket, requestId: Int, commandBson: Array[Byte]): Seq[(String, J)] = {
    val out = new DataOutputStream(socket.getOutputStream)
    val in = new DataInputStream(socket.getInputStream)
    val len = 16 + 4 + 1 + commandBson.length
    out.write(le32(len))
    out.write(le32(requestId))
    out.write(le32(0)) // responseTo
    out.write(le32(OpMsg))
    out.write(le32(0)) // flagBits
    out.write(0) // section kind 0
    out.write(commandBson)
    out.flush()

    val hdr = new Array[Byte](16); in.readFully(hdr)
    val hb = ByteBuffer.wrap(hdr).order(ByteOrder.LITTLE_ENDIAN)
    val msgLen = hb.getInt
    hb.getInt; hb.getInt
    val op = hb.getInt
    require(op == OpMsg, s"mongo wire: unexpected reply opcode $op")
    val rest = new Array[Byte](msgLen - 16); in.readFully(rest)
    val rb = ByteBuffer.wrap(rest).order(ByteOrder.LITTLE_ENDIAN)
    rb.getInt // flagBits
    val kind = rb.get()
    require(kind == 0, s"mongo wire: unexpected section kind $kind")
    val body = new Array[Byte](rest.length - 5)
    rb.get(body)
    Bson.decodeDoc(body)
  }

  private def num(j: J): Long = j match {
    case JInt(v) => v
    case JNum(v) => v.toLong
    case JObj(fs) => fs.toMap.get("$numberLong").orElse(fs.toMap.get("$numberInt")) match {
      case Some(JStr(s)) => s.toLong
      case _ => throw new IllegalArgumentException(s"mongo wire: not a number: $j")
    }
    case other => throw new IllegalArgumentException(s"mongo wire: not a number: $other")
  }

  private def checkOk(r: Seq[(String, J)]): Map[String, J] = {
    val m = r.toMap
    m.get("ok") match {
      case Some(JNum(1.0)) | Some(JInt(1)) => m
      case _ =>
        val msg = m.get("errmsg") match { case Some(JStr(s)) => s; case _ => r.toString }
        throw new java.sql.SQLException(s"mongo wire error: $msg")
    }
  }

  /** An INCREMENTAL cursor over one command: opens its own connection,
    * yields the firstBatch documents, and issues `getMore` LAZILY as
    * the consumer drains — at most one server batch is ever in memory,
    * so an executor task streaming a 100 TB collection shard holds
    * batch-bounded state, never the whole result. Closes its socket
    * when the cursor is exhausted (or on close()). */
  final class WireCursor(host: String, port: Int, db: String, commandJson: String)
      extends Iterator[String] with AutoCloseable {

    private val socket = new Socket(host, port)
    private var batch: Iterator[J] = Iterator.empty
    private var cursorId = 0L
    private var ns = ""
    private var reqId = 1
    private var closed = false

    locally {
      // the whole handshake is close-guarded: a parse failure (bad
      // command JSON) must release the already-open socket, not just
      // a wire failure
      try {
        val cmd = CanonicalJson.parse(commandJson) match {
          case JObj(fs) => JObj((fs :+ ("$db" -> (JStr(db): J))).toVector)
          case other => throw new IllegalArgumentException(s"mongo wire: bad command: $other")
        }
        val m = checkOk(roundTrip(socket, reqId, Bson.encodeDoc(cmd.v)))
        reqId += 1
        absorb(m, "firstBatch")
      } catch { case e: Throwable => close(); throw e }
    }

    private def absorb(m: Map[String, J], batchKey: String): Unit = {
      val cursor = m.get("cursor").map(CanonicalJson.objFields)
      batch = cursor.flatMap(_.get(batchKey)) match {
        case Some(JArr(xs)) => xs.iterator
        case _ => Iterator.empty
      }
      cursorId = cursor.flatMap(_.get("id")).map(num).getOrElse(0L)
      cursor.flatMap(_.get("ns")).collect { case JStr(s) => ns = s }
    }

    override def hasNext: Boolean = {
      while (!batch.hasNext && cursorId != 0L) {
        val coll = ns.substring(ns.indexOf('.') + 1)
        val getMore = JObj.of(
          "getMore" -> JObj.of("$numberLong" -> JStr(cursorId.toString)),
          "collection" -> JStr(coll),
          "$db" -> JStr(db))
        val m =
          try checkOk(roundTrip(socket, reqId, Bson.encodeDoc(getMore.v)))
          catch { case e: Throwable => close(); throw e }
        reqId += 1
        absorb(m, "nextBatch")
      }
      val h = batch.hasNext
      if (!h) close()
      h
    }

    override def next(): String = {
      if (!hasNext) throw new NoSuchElementException("wire cursor drained")
      CanonicalJson.render(batch.next())
    }

    override def close(): Unit = if (!closed) { closed = true; socket.close() }
  }

  /** A drop-in [[MongoRegistry]] transport: JSON command in,
    * NDJSON-of-Extended-JSON documents out, over real OP_MSG bytes —
    * a driver-side convenience over [[WireCursor]] for bounded
    * results. Scans at scale register a wire ENDPOINT instead
    * ([[MongoRegistry.Entry.wire]]) so each task streams its own
    * cursor executor-side. */
  def wireTransport(host: String, port: Int, db: String): String => String = { commandJson =>
    val cursor = new WireCursor(host, port, db, commandJson)
    try cursor.mkString("\n") finally cursor.close()
  }
}
