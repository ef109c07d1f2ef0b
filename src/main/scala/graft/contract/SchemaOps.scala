package graft.contract

import org.apache.spark.sql.types._

import graft.core.CanonicalJson._
import graft.core.CanonicalTypes

/** Schema identity, drift admission and multi-file schema aggregation
  * (cdf: crates/cdf-kernel/src/schema_fingerprint.rs — per-batch
  * fingerprints catch mid-stream drift at the batch where it occurs;
  * schema_authority.rs — first-use discovery establishes immutable
  * authority; cdf-contract/src/aggregation.rs:123-135
  * `aggregate_arrow_schemas` — per-field widening verdicts, lossless
  * only; engine schema_admission.rs — admission verdicts).
  */
object SchemaOps {

  /** Canonical schema JSON → sha256 fingerprint. Field order is
    * semantic in a schema, so it is NOT sorted away; metadata is
    * excluded (identity is (name, type, nullable)). */
  def canonicalJson(schema: StructType): J =
    JArr(schema.fields.toSeq.map(f => JObj.of(
      "name" -> JStr(f.name),
      "type" -> JStr(f.dataType.catalogString),
      "nullable" -> JBool(f.nullable))))

  def fingerprint(schema: StructType): String = hash(canonicalJson(schema))

  /** Admission verdict for an observed schema vs the authority
    * (cdf VISION.md:700-707). */
  sealed trait AdmissionVerdict
  object AdmissionVerdict {
    case object Admit extends AdmissionVerdict
    /** new/untypeable substructure → capture as `_cdf_variant`. */
    final case class AdmitAsVariant(columns: Seq[String]) extends AdmissionVerdict
    final case class Quarantine(reason: String) extends AdmissionVerdict
    final case class RejectBatch(reason: String) extends AdmissionVerdict
  }
  import AdmissionVerdict._

  /** Policy for drift events. */
  final case class DriftPolicy(
      newColumns: String = "admit_as_variant", // admit | admit_as_variant | quarantine | reject_batch
      typeChanges: String = "reject_batch", // lossless widenings admit; else this
      missingColumns: String = "quarantine")

  /** Classify an observed batch schema against the authority. */
  def admit(authority: StructType, observed: StructType,
      policy: DriftPolicy = DriftPolicy()): AdmissionVerdict = {
    val authByName = authority.fields.map(f => f.name -> f).toMap
    val obsByName = observed.fields.map(f => f.name -> f).toMap

    val missing = authority.fields.filterNot(f => obsByName.contains(f.name)).map(_.name)
    if (missing.nonEmpty) return policy.missingColumns match {
      case "quarantine" => Quarantine(s"missing columns: ${missing.mkString(",")}")
      case _ => RejectBatch(s"missing columns: ${missing.mkString(",")}")
    }

    val changed = observed.fields.filter { f =>
      authByName.get(f.name).exists(a =>
        a.dataType != f.dataType &&
          !CanonicalTypes.isLosslessWidening(f.dataType, a.dataType))
    }.map(_.name)
    if (changed.nonEmpty) return policy.typeChanges match {
      case "quarantine" => Quarantine(s"lossy type change: ${changed.mkString(",")}")
      case _ => RejectBatch(s"lossy type change: ${changed.mkString(",")}")
    }

    val added = observed.fields.filterNot(f => authByName.contains(f.name)).map(_.name)
    if (added.nonEmpty) policy.newColumns match {
      case "admit" => Admit
      case "admit_as_variant" => AdmitAsVariant(added.toSeq)
      case "quarantine" => Quarantine(s"new columns: ${added.mkString(",")}")
      case _ => RejectBatch(s"new columns: ${added.mkString(",")}")
    }
    else Admit
  }

  /** Per-field verdict of a two-schema join. */
  sealed trait FieldVerdict
  object FieldVerdict {
    final case class Identical(t: DataType) extends FieldVerdict
    final case class Widened(to: DataType, from: DataType) extends FieldVerdict
    final case class OnlyLeft(t: DataType) extends FieldVerdict
    final case class OnlyRight(t: DataType) extends FieldVerdict
    final case class Conflict(l: DataType, r: DataType) extends FieldVerdict
  }
  import FieldVerdict._

  /** Multi-file schema aggregation with recorded per-field verdicts —
    * Spark's `mergeSchema` analogue but lossless-only and evidence-
    * recording (cdf aggregation.rs). Conflicting (non-widenable) field
    * types are an error carried in the verdict, not an exception. */
  def aggregate(a: StructType, b: StructType): Seq[(String, FieldVerdict)] = {
    val bByName = b.fields.map(f => f.name -> f).toMap
    val aNames = a.fields.map(_.name).toSet
    val fromA = a.fields.toSeq.map { fa =>
      bByName.get(fa.name) match {
        case None => fa.name -> OnlyLeft(fa.dataType)
        case Some(fb) if fa.dataType == fb.dataType => fa.name -> Identical(fa.dataType)
        case Some(fb) if CanonicalTypes.isLosslessWidening(fa.dataType, fb.dataType) =>
          fa.name -> Widened(fb.dataType, fa.dataType)
        case Some(fb) if CanonicalTypes.isLosslessWidening(fb.dataType, fa.dataType) =>
          fa.name -> Widened(fa.dataType, fb.dataType)
        case Some(fb) => fa.name -> Conflict(fa.dataType, fb.dataType)
      }
    }
    val fromB = b.fields.toSeq.filterNot(f => aNames.contains(f.name))
      .map(f => f.name -> OnlyRight(f.dataType))
    fromA ++ fromB
  }

  /** The merged schema when no verdict is a Conflict. */
  def mergedSchema(verdicts: Seq[(String, FieldVerdict)]): Either[String, StructType] = {
    val conflicts = verdicts.collect { case (n, Conflict(l, r)) => s"$n: $l vs $r" }
    if (conflicts.nonEmpty) Left(s"schema conflict: ${conflicts.mkString("; ")}")
    else Right(StructType(verdicts.map {
      case (n, Identical(t)) => StructField(n, t)
      case (n, Widened(t, _)) => StructField(n, t)
      case (n, OnlyLeft(t)) => StructField(n, t, nullable = true)
      case (n, OnlyRight(t)) => StructField(n, t, nullable = true)
      case (n, Conflict(_, _)) => throw new IllegalStateException(s"unreachable: $n")
    }))
  }
}
