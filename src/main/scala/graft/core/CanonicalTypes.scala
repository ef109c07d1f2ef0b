package graft.core

import org.apache.spark.sql.types._

/** Canonical (Arrow-shaped) type lattice ↔ Spark `DataType` mapping
  * with plan-visible fidelity verdicts (cdf: crates/cdf-kernel/src/
  * canonical_arrow.rs:29-100 `CanonicalArrowType`; fidelity rules
  * VISION.md:379-397; SURVEY §1.2 mapping table).
  *
  * Non-negotiable rules carried over:
  *  1. Decimals stay decimals — never silently Float64; precision > 38
  *     is REJECTED at plan time (the reference's own destinations
  *     reject Decimal256 in bulk-path preflight).
  *  2. Timestamps keep their zone story — zoned → TimestampType (UTC
  *     session), naive → TimestampNTZType, never silently assumed UTC.
  *  3. Everything else maps losslessly or produces a recorded
  *     `Widened`/`Rejected` verdict — never a silent coercion.
  */
object CanonicalTypes {

  sealed trait Canonical
  object Canonical {
    case object CNull extends Canonical
    case object CBool extends Canonical
    final case class CInt(bits: Int, signed: Boolean) extends Canonical
    final case class CFloat(bits: Int) extends Canonical
    final case class CDecimal(precision: Int, scale: Int) extends Canonical
    final case class CTimestamp(unit: String, tz: Option[String]) extends Canonical
    final case class CDate(bits: Int) extends Canonical
    final case class CTime(bits: Int) extends Canonical
    final case class CInterval(kind: String) extends Canonical
    case object CUtf8 extends Canonical
    case object CBinary extends Canonical
    final case class CList(elem: Canonical) extends Canonical
    final case class CStruct(fields: Seq[(String, Canonical)]) extends Canonical
    final case class CMap(k: Canonical, v: Canonical) extends Canonical
    /** encodings with no Spark equivalent — decoded at ingest. */
    final case class CDictionary(value: Canonical) extends Canonical
    final case class CRunEndEncoded(value: Canonical) extends Canonical
    final case class CUnion(variants: Seq[Canonical]) extends Canonical
  }
  import Canonical._

  /** Mapping verdict, recorded in the plan (never silent). */
  sealed trait Verdict
  object Verdict {
    final case class Lossless(t: DataType) extends Verdict
    /** representable only by widening/decoding; reason recorded. */
    final case class Widened(t: DataType, reason: String) extends Verdict
    /** no faithful representation; plan-time error. */
    final case class Rejected(reason: String) extends Verdict
  }
  import Verdict._

  def toSpark(c: Canonical): Verdict = c match {
    case CNull => Lossless(NullType)
    case CBool => Lossless(BooleanType)
    case CInt(8, true) => Lossless(ByteType)
    case CInt(16, true) => Lossless(ShortType)
    case CInt(32, true) => Lossless(IntegerType)
    case CInt(64, true) => Lossless(LongType)
    case CInt(8, false) => Widened(ShortType, "u8 widened to i16")
    case CInt(16, false) => Widened(IntegerType, "u16 widened to i32")
    case CInt(32, false) => Widened(LongType, "u32 widened to i64")
    case CInt(64, false) => Widened(DecimalType(20, 0), "u64 widened to decimal(20,0)")
    case CInt(b, _) => Rejected(s"unsupported int width $b")
    case CFloat(16) => Widened(FloatType, "f16 widened to f32")
    case CFloat(32) => Lossless(FloatType)
    case CFloat(64) => Lossless(DoubleType)
    case CFloat(b) => Rejected(s"unsupported float width $b")
    case CDecimal(p, s) if p <= 38 => Lossless(DecimalType(p, s))
    case CDecimal(p, _) => Rejected(s"decimal precision $p > 38 (Decimal256) — rejected at plan time")
    case CTimestamp("us", Some(_)) => Lossless(TimestampType)
    case CTimestamp(u, Some(_)) => Widened(TimestampType, s"timestamp($u, tz) coerced to micros; original zone kept in field metadata")
    case CTimestamp("us", None) => Lossless(TimestampNTZType)
    case CTimestamp(u, None) => Widened(TimestampNTZType, s"timestamp($u) coerced to micros, stays zoneless")
    case CDate(32) => Lossless(DateType)
    case CDate(64) => Widened(DateType, "date64 loses sub-day millis — plan-visible coercion")
    case CTime(_) => Widened(LongType, "time carried as micros-of-day integer")
    case CInterval("year_month") => Lossless(YearMonthIntervalType())
    case CInterval("day_time") => Lossless(DayTimeIntervalType())
    case CInterval("month_day_nano") => Rejected("Interval(MonthDayNano) unsupported — rejected (matches reference Parquet dest preflight)")
    case CInterval(k) => Rejected(s"unknown interval kind $k")
    case CUtf8 => Lossless(StringType)
    case CBinary => Lossless(BinaryType)
    case CList(e) => toSpark(e) match {
      case Lossless(t) => Lossless(ArrayType(t))
      case Widened(t, r) => Widened(ArrayType(t), r)
      case r: Rejected => r
    }
    case CStruct(fs) =>
      val mapped = fs.map { case (n, ct) => (n, toSpark(ct)) }
      mapped.collectFirst { case (_, r: Rejected) => r }.getOrElse {
        val fields = mapped.map {
          case (n, Lossless(t)) => StructField(n, t)
          case (n, Widened(t, _)) => StructField(n, t)
          case _ => throw new IllegalStateException("unreachable")
        }
        val reasons = mapped.collect { case (n, Widened(_, r)) => s"$n: $r" }
        if (reasons.isEmpty) Lossless(StructType(fields))
        else Widened(StructType(fields), reasons.mkString("; "))
      }
    case CMap(k, v) => (toSpark(k), toSpark(v)) match {
      case (r: Rejected, _) => r
      case (_, r: Rejected) => r
      case (kk, vv) =>
        val t = MapType(dataTypeOf(kk), dataTypeOf(vv))
        (kk, vv) match {
          case (Lossless(_), Lossless(_)) => Lossless(t)
          case _ => Widened(t, "map key/value widened")
        }
    }
    case CDictionary(v) => widen(toSpark(v), "dictionary encoding decoded at ingest")
    case CRunEndEncoded(v) => widen(toSpark(v), "run-end encoding decoded at ingest")
    case CUnion(_) => Rejected("union types unsupported — rejected at plan time")
  }

  private def dataTypeOf(v: Verdict): DataType = v match {
    case Lossless(t) => t
    case Widened(t, _) => t
    case Rejected(r) => throw new IllegalArgumentException(r)
  }

  private def widen(v: Verdict, reason: String): Verdict = v match {
    case Lossless(t) => Widened(t, reason)
    case Widened(t, r) => Widened(t, s"$reason; $r")
    case r: Rejected => r
  }

  /** Lossless widening table for schema-join / drift admission
    * (cdf: aggregation.rs:10 `is_lossless_type_widening`): may a value
    * of `from` be represented in `to` with zero information loss? */
  def isLosslessWidening(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (ByteType | ShortType | IntegerType, d: DecimalType) => d.precision - d.scale >= 10
    case (LongType, d: DecimalType) => d.precision - d.scale >= 19
    case (FloatType, DoubleType) => true
    case (a: DecimalType, b: DecimalType) =>
      b.scale >= a.scale && (b.precision - b.scale) >= (a.precision - a.scale)
    case (DateType, TimestampNTZType) => true
    case (StringType, _) | (_, StringType) => false // never silent stringify
    case _ => false
  }
}
