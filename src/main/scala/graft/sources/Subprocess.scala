package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.CanonicalJson._
import graft.core.Position

/** Tier-4 subprocess adapters: Singer taps and NDJSON emitters over
  * stdio (cdf: crates/cdf-subprocess/, SURVEY §2.1 "Subprocess
  * adapters (Tier 4)").
  *
  * The child process is inherently a single serial stream, so the
  * adapter runs driver-side (exactly like the reference and like
  * RestSource's paginators) and hands Spark a bounded batch per
  * stream; scale-out happens by running many taps under partition
  * scopes (`Runner.runPartitioned`), not by parallelizing one pipe.
  *
  * Singer protocol (public spec): newline-delimited JSON messages —
  *   {"type":"SCHEMA","stream":s,"schema":{json-schema}}
  *   {"type":"RECORD","stream":s,"record":{...}}
  *   {"type":"STATE","value":{...}}
  * The final STATE blob becomes a typed `Position.ForeignState`
  * ("carried verbatim" — the reference never interprets foreign
  * state), so resume goes through the same ledger machinery as every
  * other source.
  */
object Subprocess {

  final case class SingerResult(
      streams: Map[String, DataFrame],
      state: Option[Position.ForeignState],
      recordCounts: Map[String, Long])

  /** Run `command`, parse Singer messages from stdout until EOF (the
    * drain shape: taps exit when caught up). `maxRecords` bounds the
    * fetch (preview/bounded runs). */
  def singer(spark: SparkSession, command: Seq[String],
      maxRecords: Long = Long.MaxValue): SingerResult = {
    val proc = new ProcessBuilder(command: _*).redirectErrorStream(false).start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
    val schemas = mutable.Map.empty[String, StructType]
    val rows = mutable.Map.empty[String, mutable.ArrayBuffer[Row]]
    var state: Option[Position.ForeignState] = None
    var total = 0L
    try {
      var line = reader.readLine()
      while (line != null && total < maxRecords) {
        if (line.trim.nonEmpty) {
          val msg = objFields(parse(line))
          msg.get("type") match {
            case Some(JStr("SCHEMA")) =>
              val stream = str(msg, "stream")
              schemas(stream) = jsonSchemaToSpark(msg("schema"))
              rows.getOrElseUpdate(stream, mutable.ArrayBuffer.empty)
            case Some(JStr("RECORD")) =>
              val stream = str(msg, "stream")
              val st = schemas.getOrElse(stream, throw new IllegalArgumentException(
                s"singer RECORD for stream '$stream' before its SCHEMA"))
              rows.getOrElseUpdate(stream, mutable.ArrayBuffer.empty) +=
                recordToRow(objFields(msg("record")), st)
              total += 1
            case Some(JStr("STATE")) =>
              state = Some(Position.ForeignState("singer", render(msg("value"))))
            case _ => // ACTIVATE_VERSION / METRIC etc.: pass through untouched
          }
        }
        line = reader.readLine()
      }
    } finally {
      reader.close()
      proc.destroy()
      proc.waitFor()
    }
    val dfs = schemas.map { case (stream, st) =>
      stream -> spark.createDataFrame(
        spark.sparkContext.parallelize(rows(stream).toSeq,
          math.max(1, math.min(rows(stream).size, 8))), st)
    }.toMap
    SingerResult(dfs, state, rows.map { case (k, v) => k -> v.size.toLong }.toMap)
  }

  final case class AirbyteResult(
      streams: Map[String, DataFrame],
      state: Option[Position.ForeignState],
      recordCounts: Map[String, Long])

  /** Airbyte protocol adapter (public spec: `{"type":"RECORD","record":
    * {"stream":s,"data":{...},"emitted_at":ms}}`, `{"type":"STATE",
    * "state":{...}}`, `{"type":"CATALOG","catalog":{"streams":[...]}}`).
    * Stream schemas come from the declared `schemas` map or from a
    * CATALOG message (json_schema per stream, either flat or nested
    * under "stream"); the STATE blob is carried verbatim as a
    * `ForeignState("airbyte", ...)` — same resume posture as Singer. */
  def airbyte(spark: SparkSession, command: Seq[String],
      schemas: Map[String, StructType] = Map.empty,
      maxRecords: Long = Long.MaxValue): AirbyteResult = {
    val proc = new ProcessBuilder(command: _*).redirectErrorStream(false).start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
    val known = mutable.Map.empty[String, StructType] ++ schemas
    val rows = mutable.Map.empty[String, mutable.ArrayBuffer[Row]]
    var state: Option[Position.ForeignState] = None
    var total = 0L
    try {
      var line = reader.readLine()
      while (line != null && total < maxRecords) {
        if (line.trim.nonEmpty) {
          val msg = objFields(parse(line))
          msg.get("type") match {
            case Some(JStr("CATALOG")) =>
              msg.get("catalog").map(objFields).flatMap(_.get("streams")).foreach {
                case JArr(ss) => ss.foreach { s =>
                  val sf = objFields(s)
                  // configured catalogs nest under "stream"; source
                  // catalogs are flat
                  val f = sf.get("stream").map(objFields).getOrElse(sf)
                  for (JStr(name) <- f.get("name"); js <- f.get("json_schema"))
                    known(name) = jsonSchemaToSpark(js)
                }
                case _ => ()
              }
            case Some(JStr("RECORD")) =>
              val rec = objFields(msg("record"))
              val stream = str(rec, "stream")
              val st = known.getOrElse(stream, throw new IllegalArgumentException(
                s"airbyte RECORD for undeclared stream '$stream' (no schema, no CATALOG)"))
              rows.getOrElseUpdate(stream, mutable.ArrayBuffer.empty) +=
                recordToRow(objFields(rec("data")), st)
              total += 1
            case Some(JStr("STATE")) =>
              state = Some(Position.ForeignState("airbyte", render(msg("state"))))
            case _ => // LOG / TRACE / SPEC / CONNECTION_STATUS: pass through
          }
        }
        line = reader.readLine()
      }
    } finally {
      reader.close()
      proc.destroy()
      proc.waitFor()
    }
    val dfs = rows.map { case (stream, rs) =>
      val st = known(stream)
      stream -> spark.createDataFrame(
        spark.sparkContext.parallelize(rs.toSeq, math.max(1, math.min(rs.size, 8))), st)
    }.toMap
    AirbyteResult(dfs, state, rows.map { case (k, v) => k -> v.size.toLong }.toMap)
  }

  /** Plain NDJSON-over-stdio adapter: one JSON object per stdout line →
    * DataFrame (schema via Spark's JSON inference over the batch). */
  def ndjson(spark: SparkSession, command: Seq[String],
      maxRecords: Long = Long.MaxValue): DataFrame = {
    val proc = new ProcessBuilder(command: _*).start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
    val lines = mutable.ArrayBuffer.empty[String]
    try {
      var line = reader.readLine()
      while (line != null && lines.size < maxRecords) {
        if (line.trim.nonEmpty) lines += line
        line = reader.readLine()
      }
    } finally { reader.close(); proc.destroy(); proc.waitFor() }
    import spark.implicits._
    spark.read.json(lines.toSeq.toDS())
  }

  // ---------------------------------------------------------- internals

  private def str(m: Map[String, J], k: String): String = m(k) match {
    case JStr(v) => v
    case other => throw new IllegalArgumentException(s"singer field $k: $other")
  }

  /** Minimal JSON-schema → Spark: integer/number/string/boolean, with
    * `["T","null"]` unions for nullability (the subset Singer taps
    * emit for flat streams; nested objects are captured as JSON
    * strings — the variant-capture posture). */
  private[sources] def jsonSchemaToSpark(schema: J): StructType = {
    val props = objFields(schema).get("properties") match {
      case Some(o: JObj) => o.v
      case other => throw new IllegalArgumentException(s"json-schema without properties: $other")
    }
    StructType(props.map { case (name, spec) =>
      val f = objFields(spec)
      val (tpe, nullable) = f.get("type") match {
        case Some(JStr(t)) => (t, false)
        case Some(JArr(ts)) =>
          val names = ts.collect { case JStr(t) => t }
          (names.filterNot(_ == "null").headOption.getOrElse("string"), names.contains("null"))
        case _ => ("string", true)
      }
      val dt = tpe match {
        case "integer" => LongType
        case "number" => DoubleType
        case "boolean" => BooleanType
        case "object" | "array" => StringType // variant capture: keep raw JSON
        case _ => StringType
      }
      StructField(name, dt, nullable)
    })
  }

  private[sources] def recordToRow(rec: Map[String, J], st: StructType): Row =
    Row.fromSeq(st.fields.map { f =>
      rec.get(f.name) match {
        case None | Some(JNull) => null
        case Some(v) => (f.dataType, v) match {
          case (LongType, JInt(i)) => i
          case (LongType, JNum(n)) => n.toLong
          case (DoubleType, JNum(n)) => n
          case (DoubleType, JInt(i)) => i.toDouble
          case (BooleanType, JBool(b)) => b
          case (StringType, JStr(s)) => s
          case (StringType, other) => render(other) // object/array → raw JSON
          case (dt, other) => throw new IllegalArgumentException(
            s"singer value ${render(other)} does not fit $dt for ${f.name}")
        }
      }
    }.toSeq)
}
