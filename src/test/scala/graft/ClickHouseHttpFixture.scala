package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.types._

import graft.core.CanonicalJson
import graft.core.CanonicalJson._
import graft.sources.ClickHouse

/** Embedded ClickHouse-HTTP-interface SERVER fixture: a real HTTP
  * endpoint (JDK HttpServer) whose statement executor covers exactly
  * the shapes the staged-EXCHANGE publish path emits — CREATE / DROP
  * TABLE, INSERT ... FORMAT JSONEachRow with the payload in the body
  * (query in the URL, the documented bulk-load shape), the
  * last-writer dedup INSERT-SELECT, EXCHANGE TABLES, and count/SELECT
  * probes answered as JSONEachRow. Errors return non-200 with text,
  * like a real server. The store survives dropped connections, so
  * chaos replays see the crashed run's committed state. */
final class ClickHouseHttpFixture {

  final case class Table(schema: StructType, rows: mutable.ArrayBuffer[Map[String, Any]])
  val tables = mutable.Map.empty[String, Table]

  /** request log: executor-side scans POST one query per task, so
    * specs assert "0 until the action ran, N after". */
  val requests = new java.util.concurrent.atomic.AtomicInteger(0)

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  def port: Int = server.getAddress.getPort
  def endpoint: String = s"http://127.0.0.1:$port"

  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      requests.incrementAndGet()
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val queryParam = Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
        .find(_.startsWith("query=")).map(q =>
          java.net.URLDecoder.decode(q.stripPrefix("query="), "UTF-8"))
      val (sql, payload) = queryParam match {
        case Some(q) => (q.trim, body)
        case None => (body.trim, "")
      }
      val (code, resp) =
        try (200, tables.synchronized(dispatch(sql, payload)))
        catch { case e: Throwable => (500, s"Code: 62. DB::Exception: ${e.getMessage}") }
      val bytes = resp.getBytes(UTF_8)
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    }
  })
  // concurrent requests, like a real server (executor-side scan tasks
  // arrive in parallel)
  server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "clickhouse-fixture"); t.setDaemon(true); t
  }))
  server.start()
  def stop(): Unit = server.stop(0)

  // --------------------------------------------------------------- SQL

  private val CreateRe =
    """(?is)CREATE TABLE (IF NOT EXISTS )?`?(\w+)`?\s*\((.*)\)\s*ENGINE\s*=\s*MergeTree\s*ORDER BY.*""".r
  private val DropRe = """(?is)DROP TABLE (IF EXISTS )?`?(\w+)`?\s*""".r
  private val InsertRowsRe = """(?is)INSERT INTO `?(\w+)`?\s+FORMAT JSONEachRow\s*""".r
  private val DedupRe =
    """(?is)INSERT INTO `?(\w+)`?\s+SELECT .* FROM \(SELECT \*, row_number\(\) OVER \(PARTITION BY (.+?) ORDER BY `?(\w+)`? DESC, `?__src`? DESC\) AS __rn FROM \(SELECT .*, 0 AS `?__src`? FROM `?(\w+)`? UNION ALL SELECT .*, 1 AS `?__src`? FROM `?(\w+)`?\)\) WHERE __rn = 1\s*""".r
  private val ExchangeRe = """(?is)EXCHANGE TABLES `?(\w+)`? AND `?(\w+)`?\s*""".r
  private val CountRe =
    """(?is)SELECT count\(\*?\) AS (\w+) FROM `?(\w+)`?(?: WHERE (.+?))?\s+FORMAT JSONEachRow\s*""".r
  private val SelectRe =
    """(?is)SELECT ([`\w, ]+) FROM `?(\w+)`?(?: WHERE (.+?))?(?: ORDER BY (.+?))?(?: LIMIT (\d+))?(?: OFFSET (\d+))?\s+FORMAT JSONEachRow\s*""".r
  private val WhereModRe = """(?i)\s*`?(\w+)`?\s*%%?\s*(\d+)\s*=\s*(\d+)\s*""".r
  private val WhereCmpRe = """(?i)\s*`?(\w+)`?\s*(>=|<=|=|>|<)\s*(.+?)\s*""".r

  /** evaluate a WHERE conjunction — the shapes the DSv2 scan renders
    * (Pred.sql comparisons plus raw mod-shard clauses). */
  private def unparen(c: String): String = {
    val t = c.trim
    if (t.startsWith("(") && t.endsWith(")")) t.substring(1, t.length - 1).trim else t
  }

  private def rowKeep(where: String): Map[String, Any] => Boolean = {
    val clauses: Seq[Map[String, Any] => Boolean] = where.split("(?i) AND ").toSeq
      .map(unparen).map {
      case WhereModRe(c, m, r) =>
        row => row(c).asInstanceOf[Long] % m.toLong == r.toLong
      case WhereCmpRe(c, op, lit) =>
        val cmp: Map[String, Any] => Option[Int] =
          if (lit.startsWith("'")) {
            val s = lit.stripPrefix("'").stripSuffix("'")
              .replace("\\'", "'").replace("\\\\", "\\")
            row => row(c) match { case v: String => Some(v.compareTo(s)); case _ => None }
          } else if (lit == "true" || lit == "false") {
            val b = lit.toBoolean
            row => row(c) match { case v: Boolean => Some(v.compareTo(b)); case _ => None }
          } else {
            val d = BigDecimal(lit)
            row => row(c) match {
              case null => None
              case v => Some(BigDecimal(v.toString).compare(d))
            }
          }
        op match {
          case "=" => row => cmp(row).contains(0)
          case ">" => row => cmp(row).exists(_ > 0)
          case ">=" => row => cmp(row).exists(_ >= 0)
          case "<" => row => cmp(row).exists(_ < 0)
          case "<=" => row => cmp(row).exists(_ <= 0)
        }
      case other => throw new IllegalArgumentException(s"fixture where: $other")
    }
    row => clauses.forall(_(row))
  }

  private def sparkTypeOf(ch: String): DataType = ClickHouse.sparkType(
    ch.trim.stripPrefix("Nullable(").stripSuffix(")"))

  private def parseRow(line: String, schema: StructType): Map[String, Any] = {
    val f = CanonicalJson.objFields(CanonicalJson.parse(line))
    schema.fields.map { fd =>
      fd.name -> (f.get(fd.name) match {
        case None | Some(JNull) => null
        case Some(JInt(v)) => v
        case Some(JNum(v)) => v
        case Some(JStr(v)) => v
        case Some(JBool(v)) => v
        case Some(other) => other.toString
      })
    }.toMap
  }

  private def render(v: Any): String = v match {
    case null => "null"
    case s: String => CanonicalJson.render(JStr(s))
    case b: Boolean => b.toString
    case n => n.toString
  }

  private def dispatch(sql: String, payload: String): String = sql match {
    case CreateRe(ifNot, name, colsDef) =>
      if (tables.contains(name)) {
        if (ifNot == null) throw new IllegalArgumentException(s"Table $name already exists")
      } else {
        val fields = colsDef.split(""",(?![^(]*\))""").map(_.trim).filter(_.nonEmpty).map { cd =>
          val sp = cd.indexOf(' ')
          StructField(cd.substring(0, sp).stripPrefix("`").stripSuffix("`"),
            sparkTypeOf(cd.substring(sp + 1)))
        }
        tables(name) = Table(StructType(fields), mutable.ArrayBuffer.empty)
      }
      ""

    case DropRe(ifExists, name) =>
      if (!tables.contains(name) && ifExists == null)
        throw new IllegalArgumentException(s"Table $name does not exist")
      tables.remove(name); ""

    case InsertRowsRe(name) =>
      val t = tables.getOrElse(name, throw new IllegalArgumentException(s"no table $name"))
      val rows = payload.split('\n').iterator.map(_.trim).filter(_.nonEmpty)
        .map(parseRow(_, t.schema)).toVector
      t.rows ++= rows; ""

    case DedupRe(target, partKeys, orderCol, current, incoming) =>
      val tgt = tables.getOrElse(target, throw new IllegalArgumentException(s"no table $target"))
      val cur = tables.getOrElse(current, throw new IllegalArgumentException(s"no table $current"))
      val inc = tables.getOrElse(incoming, throw new IllegalArgumentException(s"no table $incoming"))
      val keys = partKeys.split(",").map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq
      // union with __src (0 = current, 1 = incoming); last writer per
      // key: max (orderCol, __src)
      val all = cur.rows.map(r => (r, 0)) ++ inc.rows.map(r => (r, 1))
      val winners = all.groupBy { case (r, _) => keys.map(r) }
        .values.map(_.maxBy { case (r, src) =>
          (r(orderCol).asInstanceOf[Long], src)
        }._1)
      tgt.rows ++= winners; ""

    case ExchangeRe(a, b) =>
      val ta = tables.getOrElse(a, throw new IllegalArgumentException(s"no table $a"))
      val tb = tables.getOrElse(b, throw new IllegalArgumentException(s"no table $b"))
      tables(a) = tb; tables(b) = ta; ""

    case CountRe(alias, name, whereOpt) =>
      val t = tables.getOrElse(name, throw new IllegalArgumentException(s"no table $name"))
      val n = Option(whereOpt) match {
        case None => t.rows.size
        case Some(w) => t.rows.count(rowKeep(w))
      }
      s"""{"$alias":$n}""" + "\n"

    case SelectRe(colList, name, whereOpt, orderOpt, limitOpt, offsetOpt) =>
      val t = tables.getOrElse(name, throw new IllegalArgumentException(s"no table $name"))
      val cols = colList.split(",").map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq
      val kept = Option(whereOpt) match {
        case None => t.rows.toVector
        case Some(w) => t.rows.toVector.filter(rowKeep(w))
      }
      val ordered = Option(orderOpt) match {
        case None => kept
        case Some(o) =>
          // first term only: `col` ASC|DESC [NULLS FIRST|LAST]
          val term = o.split(",").head.trim
          val desc = term.toUpperCase.contains(" DESC")
          val c = term.split("\\s+").head.stripPrefix("`").stripSuffix("`")
          val sorted = kept.sortBy(r => BigDecimal(r(c).toString))
          if (desc) sorted.reverse else sorted
      }
      val off = Option(offsetOpt).map(_.toInt).getOrElse(0)
      val sliced = Option(limitOpt).map(_.toInt) match {
        case Some(l) => ordered.slice(off, off + l)
        case None => ordered.drop(off)
      }
      sliced.map(r => cols.map(c =>
        s"""${CanonicalJson.render(JStr(c))}:${render(r(c))}""").mkString("{", ",", "}"))
        .mkString("", "\n", "\n")

    case other => throw new IllegalArgumentException(s"fixture cannot parse: $other")
  }
}
