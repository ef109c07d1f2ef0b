package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import graft.core.CanonicalJson
import graft.core.CanonicalJson._

/** BSON codec (bsonspec.org, the public specification) bridging to the
  * engine's JSON AST under MongoDB Extended JSON v2 conventions — the
  * same document language the existing Mongo transports speak, so the
  * wire path and the seam path share every layer above the bytes.
  *
  * Encode: canonical Extended JSON wrappers become their BSON types
  * ({"$numberLong":"5"} → int64, {"$numberInt"} → int32,
  * {"$numberDouble"} → double, {"$oid"} → ObjectId,
  * {"$date":{"$numberLong":ms}} → UTC datetime,
  * {"$timestamp":{t,i}} → timestamp, {"$binary":{base64,subType}} →
  * binary); plain JSON scalars take their natural BSON type (JInt →
  * int64, JNum → double). Decode emits the same canonical wrappers
  * for types JSON cannot carry natively, and plain scalars otherwise —
  * exactly the canonical/relaxed mix the engine's decoders accept.
  * Anchored to the specification's published example bytes in
  * MongoWireSpec (not just round-trip-consistent with itself). */
object Bson {

  // ------------------------------------------------------------ encode

  def encodeDoc(fields: Seq[(String, J)]): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    fields.foreach { case (k, v) => writeElement(body, k, v) }
    val total = body.size() + 5
    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(total)
    out.put(body.toByteArray)
    out.put(0.toByte)
    out.array()
  }

  private def cname(out: ByteArrayOutputStream, name: String): Unit = {
    out.write(name.getBytes(UTF_8)); out.write(0)
  }

  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
  private def le64(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  private def writeElement(out: ByteArrayOutputStream, name: String, v: J): Unit = {
    def tag(t: Int): Unit = { out.write(t); cname(out, name) }
    v match {
      case JNull => tag(0x0A)
      case JBool(b) => tag(0x08); out.write(if (b) 1 else 0)
      case JInt(l) => tag(0x12); out.write(le64(l))
      case JNum(d) => tag(0x01); out.write(le64(java.lang.Double.doubleToLongBits(d)))
      case JStr(s) =>
        tag(0x02)
        val b = s.getBytes(UTF_8)
        out.write(le32(b.length + 1)); out.write(b); out.write(0)
      case JArr(xs) =>
        tag(0x04)
        out.write(encodeDoc(xs.zipWithIndex.map { case (x, i) => i.toString -> x }))
      case obj @ JObj(fs) =>
        val m = fs.toMap
        // Extended JSON v2 canonical ambiguity: a single-field document
        // whose key is a wrapper name IS the wrapped scalar (the spec's
        // own round-trip rule), so a wrapper key with a MALFORMED value
        // is a typed error, never a NumberFormatException and never a
        // silent fall-through to a plain document the reader would then
        // re-type on the way back.
        def wrapped[T](key: String, s: String)(parse: String => T): T =
          try parse(s)
          catch {
            case e: NumberFormatException => throw new IllegalArgumentException(
              s"bson encode: Extended JSON wrapper $key carries malformed value '$s'", e)
          }
        (m.get("$numberLong"), m.get("$numberInt"), m.get("$numberDouble")) match {
          case (Some(JStr(s)), _, _) if fs.size == 1 =>
            tag(0x12); out.write(le64(wrapped("$numberLong", s)(_.toLong)))
          case (_, Some(JStr(s)), _) if fs.size == 1 =>
            tag(0x10); out.write(le32(wrapped("$numberInt", s)(_.toInt)))
          case (_, _, Some(JStr(s))) if fs.size == 1 =>
            tag(0x01)
            out.write(le64(java.lang.Double.doubleToLongBits(wrapped("$numberDouble", s)(_.toDouble))))
          case _ => m.get("$oid") match {
            case Some(JStr(hex)) if fs.size == 1 =>
              tag(0x07)
              if (hex.length != 24 || !hex.forall(c => Character.digit(c, 16) >= 0))
                throw new IllegalArgumentException(
                  s"bson encode: Extended JSON wrapper $$oid carries malformed value '$hex'")
              out.write(hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
            case _ => m.get("$date") match {
              case Some(inner) if fs.size == 1 =>
                val ms = inner match {
                  case JObj(ifs) => ifs.toMap.get("$numberLong") match {
                    case Some(JStr(s)) => s.toLong
                    case _ => throw new IllegalArgumentException(s"bad $$date: $inner")
                  }
                  case JStr(iso) => java.time.Instant.parse(iso).toEpochMilli
                  case JInt(l) => l
                  case other => throw new IllegalArgumentException(s"bad $$date: $other")
                }
                tag(0x09); out.write(le64(ms))
              case _ => m.get("$timestamp") match {
                case Some(JObj(tfs)) if fs.size == 1 =>
                  val tm = tfs.toMap
                  def l(k: String): Long = tm.get(k) match {
                    case Some(JInt(x)) => x; case _ => 0L
                  }
                  tag(0x11)
                  out.write(le32(l("i").toInt)); out.write(le32(l("t").toInt))
                case _ => m.get("$binary") match {
                  case Some(JObj(bfs)) if fs.size == 1 =>
                    val bm = bfs.toMap
                    val data = bm.get("base64") match {
                      case Some(JStr(b64)) => java.util.Base64.getDecoder.decode(b64)
                      case _ => throw new IllegalArgumentException("bad $binary")
                    }
                    val sub = bm.get("subType") match {
                      case Some(JStr(s)) => Integer.parseInt(s, 16)
                      case _ => 0
                    }
                    tag(0x05)
                    out.write(le32(data.length)); out.write(sub); out.write(data)
                  case _ => // plain embedded document
                    tag(0x03); out.write(encodeDoc(obj.v))
                }
              }
            }
          }
        }
    }
  }

  // ------------------------------------------------------------ decode

  def decodeDoc(bytes: Array[Byte]): Seq[(String, J)] =
    decodeDoc(ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN))

  private def decodeDoc(b: ByteBuffer): Seq[(String, J)] = {
    val total = b.getInt
    val fields = Seq.newBuilder[(String, J)]
    var t = b.get()
    while (t != 0) {
      val name = readCName(b)
      fields += name -> readValue(b, t)
      t = b.get()
    }
    fields.result()
  }

  private def readCName(b: ByteBuffer): String = {
    val sb = new ByteArrayOutputStream()
    var c = b.get()
    while (c != 0) { sb.write(c); c = b.get() }
    new String(sb.toByteArray, UTF_8)
  }

  private def readValue(b: ByteBuffer, t: Byte): J = t match {
    case 0x0A => JNull
    case 0x08 => JBool(b.get() != 0)
    case 0x10 => JObj.of("$numberInt" -> JStr(b.getInt.toString))
    case 0x12 => JInt(b.getLong)
    case 0x01 => JNum(java.lang.Double.longBitsToDouble(b.getLong))
    case 0x02 =>
      val len = b.getInt
      val d = new Array[Byte](len - 1); b.get(d); b.get() // trailing NUL
      JStr(new String(d, UTF_8))
    case 0x03 => JObj(decodeDoc(b).toVector)
    case 0x04 => JArr(decodeDoc(b).map(_._2).toVector)
    case 0x07 =>
      val d = new Array[Byte](12); b.get(d)
      JObj.of("$oid" -> JStr(d.map(x => f"${x & 0xff}%02x").mkString))
    case 0x09 =>
      JObj.of("$date" -> JObj.of("$numberLong" -> JStr(b.getLong.toString)))
    case 0x11 =>
      val i = b.getInt.toLong & 0xffffffffL
      val tt = b.getInt.toLong & 0xffffffffL
      JObj.of("$timestamp" -> JObj.of("t" -> JInt(tt), "i" -> JInt(i)))
    case 0x05 =>
      val len = b.getInt
      val sub = b.get()
      val d = new Array[Byte](len); b.get(d)
      JObj.of("$binary" -> JObj.of(
        "base64" -> JStr(java.util.Base64.getEncoder.encodeToString(d)),
        "subType" -> JStr(f"${sub & 0xff}%02x")))
    case other => throw new IllegalArgumentException(
      f"bson: unsupported element type 0x$other%02x")
  }

  /** JSON text ↔ BSON conveniences for the wire layer. */
  def encodeJson(json: String): Array[Byte] =
    CanonicalJson.parse(json) match {
      case JObj(fs) => encodeDoc(fs)
      case other => throw new IllegalArgumentException(s"bson: not a document: $other")
    }
  def decodeToJson(bytes: Array[Byte]): String =
    CanonicalJson.render(JObj(decodeDoc(bytes).toVector))
}
