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

  /** A drop-in [[MongoRegistry]] transport: JSON command in,
    * NDJSON-of-Extended-JSON documents out, over real OP_MSG bytes.
    * Each scan opens ONE connection, runs the command, drains the
    * cursor with getMore, and closes — the per-partition connection
    * shape a distributed load uses. */
  def wireTransport(host: String, port: Int, db: String): String => String = { commandJson =>
    val socket = new Socket(host, port)
    try {
      val cmd = CanonicalJson.parse(commandJson) match {
        case JObj(fs) => JObj((fs :+ ("$db" -> (JStr(db): J))).toVector)
        case other => throw new IllegalArgumentException(s"mongo wire: bad command: $other")
      }
      var reply = roundTrip(socket, 1, Bson.encodeDoc(cmd.v))
      def check(r: Seq[(String, J)]): Map[String, J] = {
        val m = r.toMap
        m.get("ok") match {
          case Some(JNum(1.0)) | Some(JInt(1)) => m
          case _ =>
            val msg = m.get("errmsg") match { case Some(JStr(s)) => s; case _ => r.toString }
            throw new java.sql.SQLException(s"mongo wire error: $msg")
        }
      }
      val docs = Vector.newBuilder[J]
      var m = check(reply)
      var cursor = m.get("cursor").map(CanonicalJson.objFields)
      cursor.flatMap(_.get("firstBatch")).foreach {
        case JArr(xs) => docs ++= xs
        case _ => ()
      }
      var cursorId = cursor.flatMap(_.get("id")).map(num).getOrElse(0L)
      val ns = cursor.flatMap(_.get("ns")).collect { case JStr(s) => s }.getOrElse("")
      var reqId = 2
      while (cursorId != 0L) {
        val coll = ns.substring(ns.indexOf('.') + 1)
        val getMore = JObj.of(
          "getMore" -> JObj.of("$numberLong" -> JStr(cursorId.toString)),
          "collection" -> JStr(coll),
          "$db" -> JStr(db))
        reply = roundTrip(socket, reqId, Bson.encodeDoc(getMore.v))
        reqId += 1
        m = check(reply)
        cursor = m.get("cursor").map(CanonicalJson.objFields)
        cursor.flatMap(_.get("nextBatch")).foreach {
          case JArr(xs) => docs ++= xs
          case _ => ()
        }
        cursorId = cursor.flatMap(_.get("id")).map(num).getOrElse(0L)
      }
      docs.result().map(CanonicalJson.render).mkString("\n")
    } finally socket.close()
  }
}
