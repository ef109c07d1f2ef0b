package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.CanonicalJson._
import graft.core.Position

/** Tier-2 Python resources over the subprocess seam (cdf:
  * crates/cdf-python/ + python/cdf_sdk/resource.py — user-authored
  * `@resource` generators with declared name/schema/cursor/bounded/
  * write-disposition, driven by the engine with a resume position).
  *
  * The reference embeds an interpreter; here the child runs
  * `python3 script.py` against `python/graft_sdk.py` (stdlib only) and
  * speaks a typed NDJSON protocol. The decisive difference from the
  * Tier-4 Singer adapter: positions are TYPED graft positions (parsed
  * with `Position.fromJson`, resume injected as the same JSON), not
  * foreign blobs carried verbatim — a Python resource resumes through
  * the ledger exactly like a native one.
  *
  * Like every driver-side fetch loop here, scale-out is by partition
  * scopes (one child per partition under `Runner.runPartitioned`),
  * never by parallelizing one pipe.
  */
object PythonResource {

  final case class Declared(name: String, schema: StructType, cursor: Option[String],
      bounded: Boolean, primaryKey: Seq[String], writeDisposition: String)

  final case class Result(declared: Declared, df: DataFrame,
      position: Option[Position], records: Long)

  private def sparkType(t: String): DataType = t match {
    case "long" => LongType
    case "double" => DoubleType
    case "string" => StringType
    case "boolean" => BooleanType
    case other => throw new IllegalArgumentException(s"tier-2 schema type: $other")
  }

  /** Driver-side intake budget. The child stream is buffered on the
    * driver before `parallelize` (package granularity — exactly where
    * the reference's embedded interpreter hands rows to the engine), so
    * a misdeclared unbounded resource must fail TYPED instead of
    * OOMing the driver. Exceeding either cap raises
    * [[graft.core.GraftError.Resource]] (non-transient: re-running
    * cannot succeed until the resource is re-scoped or the budget
    * raised). Distinct from `maxRecords`, which is a caller's
    * deliberate page bound and truncates without error. */
  final case class Budget(maxRecords: Long = 1_000_000L, maxBytes: Long = 256L << 20)

  def run(spark: SparkSession, script: String, resume: Option[Position] = None,
      python: String = "python3", maxRecords: Long = Long.MaxValue,
      budget: Budget = Budget()): Result = {
    val pb = new ProcessBuilder(python, script)
    val env = pb.environment()
    resume.foreach(p => env.put("GRAFT_RESUME_POSITION", render(p.toJson)))
    // the SDK resolves from the repo's python/ dir or alongside the script
    val sdkDir = new java.io.File("python").getAbsolutePath
    env.put("PYTHONPATH", sdkDir + java.io.File.pathSeparator +
      Option(env.get("PYTHONPATH")).getOrElse(""))
    val proc = pb.start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
    val err = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getErrorStream, java.nio.charset.StandardCharsets.UTF_8))

    var declared: Option[Declared] = None
    var position: Option[Position] = None
    val rows = mutable.ArrayBuffer.empty[Row]
    var bytes = 0L
    try {
      var line = reader.readLine()
      while (line != null && rows.size < maxRecords) {
        bytes += line.length + 1L
        // bytes are a line-level cap; the RECORD cap is checked only on
        // the record branch below — a resource emitting exactly
        // maxRecords records followed by its position/end metadata must
        // not be spuriously rejected by the trailing lines.
        if (bytes > budget.maxBytes)
          throw graft.core.GraftError.Resource(
            s"tier-2 resource exceeded the driver intake budget " +
              s"(${rows.size} records, $bytes bytes vs ${budget.maxRecords}/${budget.maxBytes}) — " +
              "scope the resource (cursor window, partition scopes) or raise the budget",
            transient = false)
        if (line.trim.nonEmpty) {
          val msg = objFields(parse(line))
          msg.get("type") match {
            case Some(JStr("resource")) =>
              val fields = msg("schema") match {
                case JObj(fs) => fs.map { case (name, spec) =>
                  val sf = objFields(spec)
                  StructField(name,
                    sparkType(sf.get("type").collect { case JStr(t) => t }.getOrElse("string")),
                    sf.get("nullable").collect { case JBool(b) => b }.getOrElse(true))
                }
                case other => throw new IllegalArgumentException(s"bad schema: $other")
              }
              declared = Some(Declared(
                msg.get("name").collect { case JStr(v) => v }.getOrElse("resource"),
                StructType(fields),
                msg.get("cursor").collect { case JStr(v) => v },
                msg.get("bounded").collect { case JBool(b) => b }.getOrElse(true),
                msg.get("primary_key").collect { case JArr(vs) =>
                  vs.collect { case JStr(v) => v } }.getOrElse(Seq.empty),
                msg.get("write_disposition").collect { case JStr(v) => v }.getOrElse("append")))
            case Some(JStr("record")) =>
              val d = declared.getOrElse(throw new IllegalStateException(
                "tier-2 record before resource declaration"))
              if (rows.size >= budget.maxRecords)
                throw graft.core.GraftError.Resource(
                  s"tier-2 resource exceeded the driver intake budget " +
                    s"(${rows.size} records vs ${budget.maxRecords}) — " +
                    "scope the resource (cursor window, partition scopes) or raise the budget",
                  transient = false)
              rows += toRow(objFields(msg("data")), d.schema)
            case Some(JStr("position")) =>
              position = Some(Position.fromJson(render(msg("position"))))
            case Some(JStr("error")) =>
              throw new RuntimeException("tier-2 resource failed: " +
                msg.get("message").collect { case JStr(v) => v }.getOrElse("?"))
            case _ => // forward-compatible: unknown message types skipped
          }
        }
        line = reader.readLine()
      }
    } finally {
      reader.close(); err.close(); proc.destroy(); proc.waitFor()
    }
    val d = declared.getOrElse(throw new IllegalStateException(
      "tier-2 resource emitted no declaration"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, math.max(1, math.min(rows.size, 8))),
      d.schema)
    Result(d, df, position, rows.size.toLong)
  }

  private def toRow(rec: Map[String, J], st: StructType): Row =
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
          case (StringType, other) => render(other)
          case (dt, other) => throw new IllegalArgumentException(
            s"tier-2 value ${render(other)} does not fit $dt for ${f.name}")
        }
      }
    }.toSeq)
}
