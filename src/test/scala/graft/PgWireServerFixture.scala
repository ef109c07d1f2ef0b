package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.PgCopyBinary

/** Embedded PostgreSQL-wire-protocol SERVER fixture: speaks the real
  * v3 message flow (startup → AuthenticationOk → ReadyForQuery, simple
  * Query, COPY-IN with binary format) over a real TCP socket, backed
  * by an in-memory table store. The SQL executor covers exactly the
  * statement shapes the destination's staged-merge path emits (CREATE
  * / DROP TABLE, COPY FROM STDIN, MERGE INTO upsert, SELECT COUNT) —
  * the point of the fixture is that the CLIENT's bytes are
  * protocol-faithful, including the [[PgCopyBinary]] stream a real
  * `COPY ... WITH (FORMAT binary)` would decode. Connections are
  * handled serially; abrupt disconnects (chaos kills) drop the
  * connection and the store survives, so replays see the crashed
  * run's committed state — the semantics of a real server. */
final class PgWireServerFixture {

  final case class Table(schema: StructType, rows: mutable.ArrayBuffer[Row])
  val tables = mutable.Map.empty[String, Table] // the "database"

  /** connection log: executor-side scans open one socket per task, so
    * specs assert "0 until the action ran, N after" — the proof that
    * result bytes never transit the driver. */
  val connects = new java.util.concurrent.atomic.AtomicInteger(0)

  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort
  @volatile private var running = true

  private val thread = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        connects.incrementAndGet()
        val worker = new Thread(() => {
          try handle(sock)
          catch { case _: Throwable => () } // client died mid-flight: fine
          finally sock.close()
        }, "pgwire-fixture-conn")
        worker.setDaemon(true)
        worker.start() // concurrent connections, like a real server
      } catch { case _: Throwable => () } // accept interrupted on stop
    }
  }, "pgwire-fixture")
  thread.setDaemon(true)
  thread.start()

  def stop(): Unit = { running = false; server.close() }

  // ---------------------------------------------------------- protocol

  private def handle(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)

    // startup (SSLRequest gets an 'N' and a re-read, like a real server)
    var len = in.readInt()
    var proto = in.readInt()
    if (proto == 80877103) { // SSLRequest
      out.writeByte('N'); out.flush()
      len = in.readInt(); proto = in.readInt()
    }
    require(proto == 196608, s"fixture: unsupported protocol $proto")
    val params = new Array[Byte](len - 8); in.readFully(params)

    send(out, 'R', b => b.writeInt(0)) // AuthenticationOk
    ready(out)

    var open = true
    while (open) {
      val t = in.readByte().toChar
      val n = in.readInt() - 4
      val body = new Array[Byte](n); in.readFully(body)
      t match {
        case 'X' => open = false
        case 'Q' =>
          val sql = new String(body, 0, body.length - 1, UTF_8).trim
          try dispatch(sql, in, out)
          catch {
            case e: Throwable =>
              send(out, 'E', b => {
                b.writeByte('S'); cstr(b, "ERROR")
                b.writeByte('C'); cstr(b, "XX000")
                b.writeByte('M'); cstr(b, Option(e.getMessage).getOrElse(e.toString))
                b.writeByte(0)
              })
              ready(out)
          }
        case _ => () // ignore anything else
      }
    }
  }

  private def cstr(b: DataOutputStream, s: String): Unit = {
    b.write(s.getBytes(UTF_8)); b.writeByte(0)
  }

  private def send(out: DataOutputStream, t: Char, write: DataOutputStream => Unit): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(bos)
    write(b); b.flush()
    out.writeByte(t)
    out.writeInt(4 + bos.size())
    bos.writeTo(out)
    out.flush()
  }

  private def ready(out: DataOutputStream): Unit =
    send(out, 'Z', _.writeByte('I'))

  private def complete(out: DataOutputStream, tag: String): Unit = {
    send(out, 'C', cstr(_, tag))
    ready(out)
  }

  // --------------------------------------------------------------- SQL

  private def sparkType(pg: String): DataType = pg.trim.toLowerCase match {
    case "bigint" => LongType
    case "integer" => IntegerType
    case "double precision" => DoubleType
    case "real" => FloatType
    case "boolean" => BooleanType
    case "text" => StringType
    case "bytea" => BinaryType
    case "date" => DateType
    case "timestamp" => TimestampType
    case d if d.startsWith("numeric(") =>
      val Array(p, s) = d.stripPrefix("numeric(").stripSuffix(")").split(",").map(_.trim.toInt)
      DecimalType(p, s)
    case other => throw new IllegalArgumentException(s"fixture type: $other")
  }

  private val CreateRe =
    """(?is)CREATE TABLE (IF NOT EXISTS )?(\w+)\s*\((.*)\)\s*""".r
  private val DropRe = """(?is)DROP TABLE (IF EXISTS )?(\w+)\s*""".r
  private val CopyRe = """(?is)COPY (\w+) FROM STDIN WITH \(FORMAT binary\)\s*""".r
  private val CopyOutRe =
    """(?is)COPY \(SELECT ([`\w, ]+) FROM (\w+)( WHERE (.+))?\) TO STDOUT \(FORMAT binary\)\s*""".r
  private val WhereModRe = """(?i)\s*(\w+) %%?\s*(\d+) = (\d+)\s*""".r
  private val WhereCmpRe = """(?i)\s*(\w+)\s*(>=|<=|=|>|<)\s*(.+?)\s*""".r

  /** evaluate a WHERE conjunction (`AND`-joined mod-shard and simple
    * comparison clauses — the shapes the executor-side scan renders). */
  private def rowKeep(schema: StructType, where: String): Row => Boolean = {
    def unparen(c: String): String = {
      val t = c.trim
      if (t.startsWith("(") && t.endsWith(")")) t.substring(1, t.length - 1).trim else t
    }
    val clauses: Seq[Row => Boolean] = where.split("(?i) AND ").toSeq
      .map(unparen).map {
      case WhereModRe(c, m, r) =>
        val ci = schema.fieldIndex(c)
        row => row.getLong(ci) % m.toLong == r.toLong
      case WhereCmpRe(c, op, lit) =>
        val ci = schema.fieldIndex(c)
        val cmp: Row => Int =
          if (lit.startsWith("'")) {
            val s = lit.stripPrefix("'").stripSuffix("'").replace("''", "'")
            row => row.getString(ci).compareTo(s)
          } else {
            val d = BigDecimal(lit)
            row => BigDecimal(row.get(ci).toString).compare(d)
          }
        op match {
          case "=" => row => cmp(row) == 0
          case ">" => row => cmp(row) > 0
          case ">=" => row => cmp(row) >= 0
          case "<" => row => cmp(row) < 0
          case "<=" => row => cmp(row) <= 0
        }
      case other => throw new IllegalArgumentException(s"fixture where: $other")
    }
    row => clauses.forall(_(row))
  }
  private val MergeRe =
    """(?is)MERGE INTO (\w+) t USING (\w+) s ON t\.(\w+) = s\.\3\s+WHEN MATCHED THEN UPDATE SET .*WHEN NOT MATCHED THEN INSERT .*""".r
  private val CountRe = """(?is)SELECT COUNT\(\*\) FROM (\w+)\s*""".r

  // store access serialized across concurrent connection handlers
  private def dispatch(sql: String, in: DataInputStream, out: DataOutputStream): Unit =
    tables.synchronized { sql match {
      case CreateRe(ifNot, name, colsDef) =>
        if (tables.contains(name) && ifNot == null)
          throw new IllegalArgumentException(s"relation $name already exists")
        if (!tables.contains(name)) {
          val fields = colsDef.split(""",(?![^(]*\))""").map(_.trim).filter(_.nonEmpty).map { cd =>
            val sp = cd.indexOf(' ')
            StructField(cd.substring(0, sp), sparkType(cd.substring(sp + 1)))
          }
          tables(name) = Table(StructType(fields), mutable.ArrayBuffer.empty)
        }
        complete(out, "CREATE TABLE")

      case DropRe(ifExists, name) =>
        if (!tables.contains(name) && ifExists == null)
          throw new IllegalArgumentException(s"relation $name does not exist")
        tables.remove(name)
        complete(out, "DROP TABLE")

      case CopyRe(name) =>
        val tbl = tables.getOrElse(name,
          throw new IllegalArgumentException(s"relation $name does not exist"))
        // CopyInResponse: binary overall, per-column binary formats
        send(out, 'G', b => {
          b.writeByte(1)
          b.writeShort(tbl.schema.length)
          tbl.schema.foreach(_ => b.writeShort(1))
        })
        // accumulate CopyData until CopyDone/CopyFail
        val buf = new java.io.ByteArrayOutputStream()
        var copying = true
        var failed = false
        while (copying) {
          val t = in.readByte().toChar
          val n = in.readInt() - 4
          val body = new Array[Byte](n); in.readFully(body)
          t match {
            case 'd' => buf.write(body)
            case 'c' => copying = false
            case 'f' => copying = false; failed = true
            case _ => ()
          }
        }
        if (failed) throw new IllegalArgumentException("COPY failed by client")
        val rows = PgCopyBinary.decodeStream(buf.toByteArray, tbl.schema).toVector
        tbl.rows ++= rows
        complete(out, s"COPY ${rows.size}")

      case CopyOutRe(colList, name, _, whereOpt) =>
        val tbl = tables.getOrElse(name,
          throw new IllegalArgumentException(s"relation $name does not exist"))
        val cols = colList.split(",").map(_.trim).filter(_.nonEmpty)
        val proj = StructType(cols.map(c => tbl.schema(tbl.schema.fieldIndex(c))))
        val idx = cols.map(tbl.schema.fieldIndex)
        val kept = Option(whereOpt) match {
          case None => tbl.rows.toVector
          case Some(w) => tbl.rows.toVector.filter(rowKeep(tbl.schema, w))
        }
        val projected = kept.map(r => Row.fromSeq(idx.toSeq.map(r.get)))
        // CopyOutResponse: binary, per-column binary formats
        send(out, 'H', b => {
          b.writeByte(1)
          b.writeShort(proj.length)
          proj.foreach(_ => b.writeShort(1))
        })
        // per-TUPLE CopyData frames, like a real server — exercises the
        // client's incremental frame-boundary handling
        send(out, 'd', _.write(PgCopyBinary.headerBytes))
        projected.foreach(r => send(out, 'd', _.write(PgCopyBinary.encodeTuple(r, proj))))
        send(out, 'd', _.write(PgCopyBinary.trailerBytes))
        send(out, 'c', _ => ())
        complete(out, s"COPY ${kept.size}")

      case MergeRe(target, stage, key) =>
        val t = tables.getOrElse(target,
          throw new IllegalArgumentException(s"relation $target does not exist"))
        val s = tables.getOrElse(stage,
          throw new IllegalArgumentException(s"relation $stage does not exist"))
        val ki = t.schema.fieldIndex(key)
        var touched = 0
        s.rows.foreach { sr =>
          val k = sr.get(s.schema.fieldIndex(key))
          val idx = t.rows.indexWhere(_.get(ki) == k)
          if (idx >= 0) t.rows(idx) = sr else t.rows += sr
          touched += 1
        }
        complete(out, s"MERGE $touched")

      case CountRe(name) =>
        val tbl = tables.getOrElse(name,
          throw new IllegalArgumentException(s"relation $name does not exist"))
        // RowDescription with one int8 column, text format
        send(out, 'T', b => {
          b.writeShort(1)
          cstr(b, "count")
          b.writeInt(0); b.writeShort(0); b.writeInt(20); b.writeShort(8)
          b.writeInt(-1); b.writeShort(0)
        })
        send(out, 'D', b => {
          b.writeShort(1)
          val v = tbl.rows.size.toString.getBytes(UTF_8)
          b.writeInt(v.length); b.write(v)
        })
        complete(out, "SELECT 1")

      case other => throw new IllegalArgumentException(s"fixture cannot parse: $other")
    } }
}
