package graft.run

import org.apache.spark.sql.SparkSession

import graft.contract.TrustPreset
import graft.core.Descriptor
import graft.core.Descriptor._

/** The `.cdf.sql` authoring surface (cdf: crates/cdf-project/src/
  * resource_sql.rs:74-166; clause table :151-162; examples
  * examples/postgres/cdf/warehouse/orders.cdf.sql,
  * examples/rest-fixture/cdf/api/events.cdf.sql):
  *
  * ```
  * RESOURCE
  * TARGET warehouse.orders
  * DISPOSITION MERGE KEY o_orderkey
  * CURSOR updated_at LAG 60000
  * TRUST GOVERNED
  * EXECUTION BOUNDED
  * AS
  * SELECT ... FROM upstream WHERE ...
  * ```
  *
  * Envelope clauses compile to a [[ResourceDescriptor]] + trust
  * preset; the body must pass the Projection(Filter?(Scan)) admission
  * (graft.expr.Admission) — any other SQL shape is rejected at
  * compile time, exactly like the reference's bounded load path.
  */
object ResourceSql {

  final case class Compiled(
      descriptor: ResourceDescriptor,
      trust: TrustPreset,
      bounded: Boolean,
      selectSql: String,
      /** per-node watermark behavior of the body w.r.t. the cursor
        * column (cdf execution_extent.rs:627-643), derived at compile
        * time; empty when no cursor is declared. */
      watermarkNodes: Seq[graft.streaming.OperatorWatermarks.NodeBehavior] = Nil)

  private val clause = """(?m)^\s*(RESOURCE|TARGET|DISPOSITION|CURSOR|TRUST|EXECUTION)\b(.*)$""".r

  def compile(spark: SparkSession, text: String): Either[String, Compiled] = {
    val asIdx = "(?is)\\bAS\\b\\s*(SELECT\\b.*)$".r.findFirstMatchIn(text)
      .getOrElse(return Left("missing `AS SELECT ...` body"))
    val body = asIdx.group(1).trim.stripSuffix(";")
    val envelope = text.substring(0, asIdx.start)

    var target = ""
    var disposition: Disposition = Disposition.Append
    var cursor: Option[CursorSpec] = None
    var trust: TrustPreset = TrustPreset.Governed
    var bounded = true

    clause.findAllMatchIn(envelope).foreach { m =>
      val args = m.group(2).trim
      m.group(1) match {
        case "RESOURCE" => // marker
        case "TARGET" => target = args
        case "DISPOSITION" =>
          val parts = args.split("\\s+").toList
          disposition = parts match {
            case "APPEND" :: Nil => Disposition.Append
            case "REPLACE" :: Nil => Disposition.Replace
            case "MERGE" :: "KEY" :: keys => Disposition.Merge(keys.map(_.stripSuffix(",")))
            case "CDC_APPLY" :: "KEY" :: key :: "OP" :: op :: Nil =>
              Disposition.CdcApply(Seq(key), op)
            case other => return Left(s"unknown DISPOSITION: ${other.mkString(" ")}")
          }
        case "CURSOR" =>
          val parts = args.split("\\s+").toList
          cursor = parts match {
            case field :: Nil => Some(CursorSpec(field, 0, OrderingClaim.Inexact))
            case field :: "LAG" :: lag :: Nil =>
              Some(CursorSpec(field, lag.toLong, OrderingClaim.Inexact))
            case other => return Left(s"unknown CURSOR: ${other.mkString(" ")}")
          }
        case "TRUST" => trust = args match {
          case "RAW" => TrustPreset.Raw
          case "GOVERNED" => TrustPreset.Governed
          case "CERTIFIED" => TrustPreset.Certified
          case other => return Left(s"unknown TRUST: $other")
        }
        case "EXECUTION" => args match {
          case "BOUNDED" => bounded = true
          case s if s.startsWith("DRAIN") => bounded = false
          case other => return Left(s"unknown EXECUTION: $other")
        }
      }
    }
    if (target.isEmpty) return Left("missing TARGET clause")

    graft.expr.Admission.admit(spark, body) match {
      case Left(err) => Left(s"body rejected: $err")
      case Right(aq) =>
        // cursor resources must CARRY their event-time claim through the
        // body: a plan that drops or non-monotonically rewrites the
        // cursor column could never advance its frontier (capability
        // truth-telling — reject at compile, not at the first run)
        val wmNodes = cursor.map(cs =>
          graft.streaming.OperatorWatermarks.derive(aq.plan, cs.field)).getOrElse(Nil)
        cursor.foreach { cs =>
          if (wmNodes.lastOption.flatMap(_.outCol).isEmpty)
            return Left(s"cursor column ${cs.field} does not survive the body " +
              s"(per-node watermark behavior: ${wmNodes.map(n => s"${n.node}=${n.behavior}").mkString(", ")})")
        }
        Right(Compiled(
        ResourceDescriptor(
          id = target,
          schemaSource = SchemaSource.Discover,
          primaryKey = disposition match {
            case Disposition.Merge(ks) => ks
            case Disposition.CdcApply(ks, _) => ks
            case _ => Nil
          },
          cursor = cursor,
          disposition = disposition,
          bounded = bounded),
        trust, bounded, body, wmNodes))
    }
  }

  /** Immutable compiled-plan artifact (cdf: `.cdf/compiled/
    * <resource>@<hash>.json`, docs/architecture.md:28-33): canonical
    * JSON of the envelope + body, content-addressed by its own hash so
    * a resource's compilation is reproducible evidence. */
  def writeCompiled(c: Compiled, dir: String): (String, String) = {
    import graft.core.CanonicalJson._
    val json = JObj.of(
      "resource" -> JStr(c.descriptor.id),
      "disposition" -> JStr(c.descriptor.disposition.toString),
      "primary_key" -> JArr(c.descriptor.primaryKey.map(JStr)),
      "cursor" -> c.descriptor.cursor.map(cs => JObj.of(
        "field" -> JStr(cs.field), "lag_ms" -> JInt(cs.lagMs)): J).getOrElse(JNull),
      "trust" -> JStr(c.trust.toString),
      "bounded" -> JBool(c.bounded),
      "watermark_behavior" -> JArr(c.watermarkNodes.map(n => JObj.of(
        "node" -> JStr(n.node), "behavior" -> JStr(n.behavior.toString),
        "claim_col" -> n.outCol.map(JStr(_): J).getOrElse(JNull)): J)),
      "select" -> JStr(c.selectSql))
    val rendered = render(json)
    val hash = sha256Hex(rendered).take(16)
    val path = java.nio.file.Paths.get(dir, s"${c.descriptor.id.replace('.', '_')}@$hash.json")
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, rendered)
    (path.toString, hash)
  }

  /** Compile + execute the admitted body against registered views. */
  def query(spark: SparkSession, text: String): Either[String, org.apache.spark.sql.DataFrame] =
    compile(spark, text).map(c => spark.sql(c.selectSql))

  /** The full `cdf run` loop from authored text: compile envelope →
    * trust-preset policy → execute body → Runner spine (validate /
    * package / dest / receipt / ledger). */
  def run(spark: SparkSession, text: String, rules: Seq[graft.contract.RowRule],
      baseDir: String, ledger: graft.core.Ledger): Either[String, Runner.RunResult] =
    compile(spark, text).map { c =>
      val cfg = Runner.RunConfig(
        descriptor = c.descriptor,
        policy = TrustPreset.policy(c.trust, rules),
        depthRing = c.trust.initialDepth match {
          case graft.contract.ValidationDepth.Discovery => graft.contract.DepthController.Discovery
          case graft.contract.ValidationDepth.Full => graft.contract.DepthController.Full
          case graft.contract.ValidationDepth.Sampled(f, _) => graft.contract.DepthController.Sampled(f)
        },
        orderColumns = c.descriptor.primaryKey)
      Runner.run(spark, cfg, spark.sql(c.selectSql),
        s"$baseDir/pkg", s"$baseDir/dest", ledger)
    }
}
