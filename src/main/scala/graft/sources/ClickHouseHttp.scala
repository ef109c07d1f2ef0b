package graft.sources

import java.net.{HttpURLConnection, URL, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.types.StructType

/** ClickHouse HTTP interface CLIENT — the live half of the ClickHouse
  * destination (cdf: crates/cdf-dest-clickhouse/src/session.rs:147-176
  * drives the staged EXCHANGE publish over the server's HTTP
  * endpoint). The protocol is the PUBLIC one (clickhouse.com/docs/
  * interfaces/http): POST body = statement; INSERT statements carry
  * the FORMAT JSONEachRow payload after the query (query in the URL,
  * rows in the body); errors are non-200 with the server text.
  *
  * No live ClickHouse exists in this container, so the client is
  * exercised against an embedded HTTP fixture in ClickHouseSpec —
  * request shapes are protocol-faithful either way; a deployment
  * points `endpoint` at a real server. */
final class ClickHouseHttpClient(endpoint: String) {

  private def postStream(url: String, body: Array[Byte]): java.io.InputStream = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "text/plain; charset=UTF-8")
    val out = conn.getOutputStream
    try { out.write(body); out.flush() } finally out.close()
    val code = conn.getResponseCode
    if (code >= 400) {
      val es = conn.getErrorStream
      val msg = if (es == null) "" else {
        try new String(es.readAllBytes(), UTF_8) finally es.close()
      }
      throw new java.sql.SQLException(s"clickhouse http $code: ${msg.take(500)}")
    }
    val in = conn.getInputStream
    if (in == null) java.io.InputStream.nullInputStream() else in
  }

  private def post(url: String, body: Array[Byte]): String = {
    val in = postStream(url, body)
    try new String(in.readAllBytes(), UTF_8) finally in.close()
  }

  /** statement (DDL / SELECT / EXCHANGE); response body returned
    * verbatim (JSONEachRow for SELECT ... FORMAT JSONEachRow). */
  def execute(sql: String): String = post(endpoint + "/", sql.getBytes(UTF_8))

  /** SELECT whose response body is consumed as a STREAM — the
    * executor-side scan path reads JSONEachRow lines off the socket
    * incrementally, never materializing the payload (caller closes). */
  def executeStream(sql: String): java.io.InputStream =
    postStream(endpoint + "/", sql.getBytes(UTF_8))

  /** INSERT with inline payload: query travels in the URL, the
    * JSONEachRow lines in the body — the documented bulk-load shape. */
  def insert(sql: String, jsonEachRowBody: String): Unit = {
    val q = URLEncoder.encode(sql, "UTF-8")
    post(s"$endpoint/?query=$q", jsonEachRowBody.getBytes(UTF_8))
    ()
  }

  /** the read seam's transport (sql → JSONEachRow body). */
  def transport: ClickHouse.Transport = execute
}

object ClickHouseHttp {

  /** The staged EXCHANGE publish OVER HTTP (same statement plan as
    * [[ClickHouse.publishPlan]], same replay law the ClickHouseSpec
    * chaos case proves statement-by-statement): recreate the
    * package-hash-named work tables, bulk-insert the incoming rows as
    * JSONEachRow, build the publish stage with last-writer dedup, ONE
    * atomic EXCHANGE TABLES, drop the work tables, then an EXACT
    * count receipt probe. `chaos` fires between commit steps
    * ("loaded" → after the incoming insert, "staged" → after the
    * stage build, "published" → after the EXCHANGE, before cleanup).
    * Replay from any crash converges: work tables are dropped
    * IF EXISTS up front, and the dedup is last-writer with incoming
    * winning ties, so re-publishing an already-published package
    * rebuilds an identical table and the EXCHANGE is a no-op swap of
    * equals. Returns the probe count. */
  def publishViaHttp(client: ClickHouseHttpClient, table: String, schema: StructType,
      mergeKeys: Seq[String], orderCol: String, packageHash: String,
      jsonRows: Seq[String], chaos: String => Unit = _ => ()): Long = {
    import ClickHouse.ident
    val h = packageHash.take(16)
    val incoming = s"__incoming_$h"
    val stage = s"__publish_$h"
    val colsDdl = schema.fields.map(f =>
      s"${ident(f.name)} ${ClickHouse.chType(f.dataType, f.nullable)}").mkString(", ")
    val keyList = mergeKeys.map(ident).mkString(", ")
    // destination table must exist for the union to read it
    client.execute(s"CREATE TABLE IF NOT EXISTS ${ident(table)} ($colsDdl) " +
      s"ENGINE = MergeTree ORDER BY ($keyList)")
    // replay safety: a crashed run's work tables are overwritten
    client.execute(s"DROP TABLE IF EXISTS ${ident(incoming)}")
    client.execute(s"DROP TABLE IF EXISTS ${ident(stage)}")
    val plan = ClickHouse.publishPlan(table, schema, mergeKeys, orderCol, packageHash)
    plan.foreach { st =>
      if (st.sql.startsWith(s"INSERT INTO ${ident(incoming)} FORMAT")) {
        client.insert(st.sql, jsonRows.mkString("\n"))
        chaos("loaded")
      } else {
        client.execute(st.sql)
        if (st.sql.startsWith(s"INSERT INTO ${ident(stage)} ")) chaos("staged")
        if (st.sql.startsWith("EXCHANGE TABLES")) chaos("published")
      }
    }
    val body = client.execute(
      s"SELECT count() AS n FROM ${ident(table)} FORMAT JSONEachRow")
    graft.core.CanonicalJson.objFields(
      graft.core.CanonicalJson.parse(body.trim.split('\n').head)) match {
      case f => f.get("n") match {
        case Some(graft.core.CanonicalJson.JInt(v)) => v
        case Some(graft.core.CanonicalJson.JStr(v)) => v.toLong
        case other => throw new IllegalStateException(s"bad count probe: $other")
      }
    }
  }
}
