package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.CanonicalJson
import graft.core.CanonicalJson._
import graft.sources.{Bson, MongoWire}

/** MongoDB wire path: BSON codec anchored to the specification's
  * published bytes, OP_MSG framing over a real TCP socket, cursor
  * batching with getMore, and the DSv2 connector running UNCHANGED
  * over the wire transport. */
class MongoWireSpec extends SparkSpec {

  // ------------------------------------------------- embedded fixture

  /** OP_MSG-speaking server: decodes the command document, evaluates
    * find/aggregate against registered docs (filter subset matching
    * what the connector compiles), pages results in batches of 2 so
    * getMore is genuinely exercised, and answers unknown commands
    * with ok:0 — the documented error shape. */
  private final class Fixture(docs: Vector[Map[String, J]]) {
    private val server = new ServerSocket(0)
    def port: Int = server.getLocalPort
    @volatile private var running = true
    private val cursors = mutable.Map.empty[Long, Vector[J]]
    private var nextCursor = 100L

    /** connection log: executor-side scans open one socket per task. */
    val connects = new java.util.concurrent.atomic.AtomicInteger(0)

    private val thread = new Thread(() => {
      while (running) {
        try {
          val s = server.accept()
          connects.incrementAndGet()
          val w = new Thread(() => {
            try handle(s) catch { case _: Throwable => () } finally s.close()
          }, "mongo-wire-fixture-conn")
          w.setDaemon(true); w.start() // concurrent, like a real mongod
        } catch { case _: Throwable => () }
      }
    }, "mongo-wire-fixture")
    thread.setDaemon(true); thread.start()
    def stop(): Unit = { running = false; server.close() }

    private def matches(doc: Map[String, J], filter: Map[String, J]): Boolean =
      filter.forall {
        case ("$and", JArr(cs)) => cs.forall(c => matches(doc, CanonicalJson.objFields(c)))
        case (k, JObj(ops)) => ops.forall { case (op, lit) =>
          val v = doc.get(k).getOrElse(JNull)
          def cmp(a: J, b: J): Option[Int] = (a, b) match {
            case (JInt(x), JInt(y)) => Some(x.compare(y))
            case (JNum(x), JNum(y)) => Some(x.compare(y))
            case (JInt(x), JNum(y)) => Some(x.toDouble.compare(y))
            case (JNum(x), JInt(y)) => Some(x.compare(y.toDouble))
            case (JStr(x), JStr(y)) => Some(x.compare(y))
            case _ => None
          }
          op match {
            case "$eq" => if (lit == JNull) v == JNull else cmp(v, lit).contains(0)
            case "$ne" => v != JNull && !cmp(v, lit).contains(0)
            case "$gt" => cmp(v, lit).exists(_ > 0)
            case "$gte" => cmp(v, lit).exists(_ >= 0)
            case "$lt" => cmp(v, lit).exists(_ < 0)
            case "$lte" => cmp(v, lit).exists(_ <= 0)
            case "$in" => lit match {
              case JArr(xs) => xs.exists(x => cmp(v, x).contains(0))
              case _ => false
            }
            case other => sys.error(s"fixture op $other")
          }
        }
        case (k, lit) => doc.get(k).contains(lit)
      }

    private def reply(requestId: Int, body: JObj, out: DataOutputStream): Unit = {
      val bson = Bson.encodeDoc(body.v)
      val len = 16 + 4 + 1 + bson.length
      val b = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(len); b.putInt(999); b.putInt(requestId); b.putInt(MongoWire.OpMsg)
      b.putInt(0); b.put(0.toByte); b.put(bson)
      out.write(b.array()); out.flush()
    }

    private def cursorReply(batchKey: String, docs: Vector[J], ns: String): JObj = {
      val (batch, rest) = docs.splitAt(2)
      val id = if (rest.isEmpty) 0L
        else cursors.synchronized { nextCursor += 1; cursors(nextCursor) = rest; nextCursor }
      JObj.of(
        "cursor" -> JObj.of(
          batchKey -> JArr(batch),
          "id" -> JInt(id),
          "ns" -> JStr(ns)),
        "ok" -> JNum(1.0))
    }

    private def handle(s: Socket): Unit = {
      val in = new DataInputStream(s.getInputStream)
      val out = new DataOutputStream(s.getOutputStream)
      while (true) {
        val hdr = new Array[Byte](16)
        in.readFully(hdr)
        val hb = ByteBuffer.wrap(hdr).order(ByteOrder.LITTLE_ENDIAN)
        val msgLen = hb.getInt; val reqId = hb.getInt; hb.getInt
        require(hb.getInt == MongoWire.OpMsg)
        val rest = new Array[Byte](msgLen - 16); in.readFully(rest)
        val rb = ByteBuffer.wrap(rest).order(ByteOrder.LITTLE_ENDIAN)
        rb.getInt; require(rb.get() == 0)
        val body = new Array[Byte](rest.length - 5); rb.get(body)
        val cmd = Bson.decodeDoc(body).toMap

        if (cmd.contains("find")) {
          val coll = cmd("find") match { case JStr(c) => c; case o => o.toString }
          if (coll == "missing.collection")
            reply(reqId, JObj.of("ok" -> JNum(0.0),
              "errmsg" -> JStr(s"ns not found: $coll"), "code" -> JInt(26)), out)
          else {
            val filter = cmd.get("filter").map(CanonicalJson.objFields).getOrElse(Map.empty)
            val proj = cmd.get("projection").map(CanonicalJson.objFields).getOrElse(Map.empty)
            val kept0 = docs.filter(matches(_, filter)).map { d =>
              val cols = if (proj.isEmpty) d.toVector
                else d.filter { case (k, _) => proj.contains(k) }.toVector
              JObj(cols): J
            }
            // honor the pushed sort document (first term suffices here)
            val kept = cmd.get("sort").map(CanonicalJson.objFields) match {
              case Some(s) if s.nonEmpty =>
                val (c, dirJ) = s.head
                val desc = (dirJ match {
                  case JInt(v) => v
                  case JNum(v) => v.toLong
                  case _ => 1L
                }) < 0
                val sorted = kept0.sortBy(d => CanonicalJson.objFields(d).get(c) match {
                  case Some(JInt(v)) => v.toDouble
                  case Some(JNum(v)) => v
                  case _ => Double.MinValue
                })
                if (desc) sorted.reverse else sorted
              case _ => kept0
            }
            val limited = cmd.get("limit").collect {
              case JInt(l) => kept.take(l.toInt)
              case JObj(fs) => kept.take(fs.toMap.get("$numberInt").collect {
                case JStr(s) => s.toInt }.getOrElse(kept.size))
            }.getOrElse(kept)
            reply(reqId, cursorReply("firstBatch", limited, s"wiredb.$coll"), out)
          }
        } else if (cmd.contains("getMore")) {
          val id = cmd("getMore") match {
            case JInt(v) => v
            case JObj(fs) => fs.toMap.get("$numberLong").collect { case JStr(v) => v.toLong }.get
            case o => sys.error(s"bad getMore $o")
          }
          val rest0 = cursors.synchronized(cursors.remove(id)).getOrElse(Vector.empty)
          reply(reqId, cursorReply("nextBatch", rest0, "wiredb.events"), out)
        } else {
          reply(reqId, JObj.of("ok" -> JNum(0.0),
            "errmsg" -> JStr(s"no such command: ${cmd.keys.headOption.getOrElse("?")}")), out)
        }
      }
    }
  }

  // ---------------------------------------------------------- codec

  test("BSON codec matches the specification's published example bytes") {
    // bsonspec.org: {"hello": "world"} =
    // \x16\x00\x00\x00\x02hello\x00\x06\x00\x00\x00world\x00\x00
    val bytes = Bson.encodeJson("""{"hello":"world"}""")
    val expect = Array[Int](
      0x16, 0x00, 0x00, 0x00, 0x02, 'h', 'e', 'l', 'l', 'o', 0x00,
      0x06, 0x00, 0x00, 0x00, 'w', 'o', 'r', 'l', 'd', 0x00, 0x00).map(_.toByte)
    assert(bytes.toSeq == expect.toSeq)

    // extended JSON wrappers round-trip through their BSON types
    val doc = """{"a":{"$numberInt":"7"},"b":{"$numberLong":"9007199254740993"},""" +
      """"c":{"$numberDouble":"2.5"},"d":{"$oid":"6500000000000000000000aa"},""" +
      """"e":{"$date":{"$numberLong":"1700000001000"}},""" +
      """"f":{"$timestamp":{"t":1700000003,"i":2}},"g":null,"h":true,""" +
      """"i":"text","j":[1,2],"k":{"nested":"doc"}}"""
    val round = Bson.decodeToJson(Bson.encodeJson(doc))
    val f = CanonicalJson.objFields(CanonicalJson.parse(round))
    assert(f("a") == JObj.of("$numberInt" -> JStr("7")))
    assert(f("b") == JInt(9007199254740993L)) // int64 decodes relaxed
    assert(f("c") == JNum(2.5))
    assert(f("d") == JObj.of("$oid" -> JStr("6500000000000000000000aa")))
    assert(f("e") == JObj.of("$date" -> JObj.of("$numberLong" -> JStr("1700000001000"))))
    // CanonicalJson orders keys canonically — compare as fields
    assert(f("f") match {
      case JObj(Seq(("$timestamp", ts))) =>
        CanonicalJson.objFields(ts) == Map("t" -> JInt(1700000003L), "i" -> JInt(2))
      case _ => false
    })
    assert(f("g") == JNull && f("h") == JBool(true) && f("i") == JStr("text"))
    assert(f("j") == JArr(Vector(JInt(1), JInt(2))))
    assert(f("k") == JObj.of("nested" -> JStr("doc")))

    // malformed wrapper payloads are typed errors, not NumberFormatException
    val badLong = intercept[IllegalArgumentException](
      Bson.encodeJson("""{"a":{"$numberLong":"not-a-number"}}"""))
    assert(badLong.getMessage.contains("$numberLong"), badLong.getMessage)
    val badOid = intercept[IllegalArgumentException](
      Bson.encodeJson("""{"a":{"$oid":"zz00000000000000000000zz"}}"""))
    assert(badOid.getMessage.contains("$oid"), badOid.getMessage)
  }

  // ------------------------------------------------------- wire e2e

  test("DSv2 connector runs unchanged over OP_MSG: pushdown compiles, wire carries, cursor pages, values decode") {
    import graft.sources.dsv2.MongoRegistry
    val docs = (1 to 7).map { i =>
      Map[String, J](
        "id" -> JInt(i.toLong),
        "qty" -> (if (i == 4) JNull else JNum(i * 1.5)),
        "tag" -> JStr(s"t${i % 3}"))
    }.toVector
    val fixture = new Fixture(docs)
    try {
      val schemaM = StructType(Seq(
        StructField("id", LongType), StructField("qty", DoubleType),
        StructField("tag", StringType)))
      MongoRegistry.register("wire_events", MongoRegistry.Entry(
        "events", schemaM,
        MongoWire.wireTransport("127.0.0.1", fixture.port, "wiredb"),
        pushable = Set("id", "qty", "tag")))
      val df = spark.read.format("graft.sources.dsv2.MongoFindSource")
        .option("collection", "wire_events").load()
        .filter(col("id") > 1L) // Exact → compiled into the find over the wire
        .orderBy("id")
      val got = df.collect().map(r =>
        (r.getLong(0), Option(if (r.isNullAt(1)) null else r.getDouble(1)), r.getString(2))).toSeq
      assert(got == (2 to 7).map(i =>
        (i.toLong, if (i == 4) None else Some(i * 1.5), s"t${i % 3}")))
      // the pushed filter reached the wire command
      val cmds = MongoRegistry.issuedCommands("wire_events")
      assert(cmds.exists(_.contains(""""$gt"""")), s"pushed filter missing from $cmds")
      // 6 result docs at batch size 2 ⇒ the cursor protocol paged (getMore ran)
      assert(got.size == 6)

      // a server error surfaces typed through the wire
      MongoRegistry.register("wire_missing", MongoRegistry.Entry(
        "missing.collection", schemaM,
        MongoWire.wireTransport("127.0.0.1", fixture.port, "wiredb"),
        pushable = Set("id")))
      val e = intercept[Exception] {
        spark.read.format("graft.sources.dsv2.MongoFindSource")
          .option("collection", "wire_missing").load().collect()
      }
      def rootMsg(t: Throwable): String =
        (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(x =>
          Option(x.getMessage).getOrElse("")).mkString(" | "))
      assert(rootMsg(e).contains("ns not found"), rootMsg(e))
    } finally fixture.stop()
  }

  test("executor-side wire scan: one socket per shard task, cursors stream in-task, bytes never transit the driver") {
    import graft.sources.dsv2.MongoRegistry
    val docs = (1 to 9).map { i =>
      Map[String, J]("id" -> JInt(i.toLong), "qty" -> JNum(i * 1.5), "tag" -> JStr(s"t${i % 3}"))
    }.toVector
    val fixture = new Fixture(docs)
    try {
      val schemaM = StructType(Seq(
        StructField("id", LongType), StructField("qty", DoubleType),
        StructField("tag", StringType)))
      MongoRegistry.register("wire_sharded", MongoRegistry.Entry(
        "events", schemaM,
        // the seam is dead for wire entries — prove nothing uses it
        transport = _ => sys.error("wire entries must not use the driver-side seam"),
        pushable = Set("id", "qty", "tag"),
        wire = Some(("127.0.0.1", fixture.port, "wiredb")),
        shardFilters = Seq(
          """{"id":{"$lt":{"$numberLong":"4"}}}""",
          """{"id":{"$gte":{"$numberLong":"4"}}}""")))
      val df = spark.read.format("graft.sources.dsv2.MongoFindSource")
        .option("collection", "wire_sharded").load()
        .filter(col("id") > 1L)
      df.queryExecution.executedPlan // plan fully — still no socket
      assert(fixture.connects.get == 0,
        "planning an executor-side wire scan must not open a socket")
      val got = df.collect().map(_.getLong(0)).sorted.toSeq
      assert(got == (2L to 9L))
      assert(fixture.connects.get == 2, "one task-side socket per shard")
      // each shard command carries the pushed filter AND its own range;
      // shard 2 (6 docs at batch size 2) genuinely paged with getMore
      val cmds = MongoRegistry.issuedCommands("wire_sharded")
      assert(cmds.size == 2 && cmds.forall(_.contains(""""$gt"""")), cmds.toString)
      assert(cmds.exists(_.contains(""""$lt"""")) && cmds.exists(_.contains(""""$gte"""")))

      // global semantics (pushed top-N) pin the wire scan to ONE cursor
      val top = spark.read.format("graft.sources.dsv2.MongoFindSource")
        .option("collection", "wire_sharded").load()
        .orderBy(col("id").desc_nulls_last).limit(3)
      assert(top.collect().map(_.getLong(0)).toSeq == Seq(9L, 8L, 7L))
      assert(fixture.connects.get == 3, "a pushed top-N must be a single cursor")
    } finally fixture.stop()
  }
}
