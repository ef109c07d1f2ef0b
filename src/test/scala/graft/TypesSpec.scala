package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.CanonicalTypes
import graft.core.CanonicalTypes.Canonical._
import graft.core.CanonicalTypes.Verdict._

/** Fidelity rules of the canonical type mapping (SURVEY §1.2):
  * decimals stay decimals, zone story preserved, unrepresentable types
  * rejected at plan time — never silent. */
class TypesSpec extends AnyFunSuite {

  test("decimals stay decimals; precision > 38 rejected at plan time") {
    assert(CanonicalTypes.toSpark(CDecimal(18, 2)) == Lossless(DecimalType(18, 2)))
    assert(CanonicalTypes.toSpark(CDecimal(38, 10)) == Lossless(DecimalType(38, 10)))
    assert(CanonicalTypes.toSpark(CDecimal(76, 10)).isInstanceOf[Rejected])
  }

  test("timestamps keep their zone story") {
    assert(CanonicalTypes.toSpark(CTimestamp("us", Some("UTC"))) == Lossless(TimestampType))
    assert(CanonicalTypes.toSpark(CTimestamp("us", None)) == Lossless(TimestampNTZType))
    // naive is never silently coerced to zoned
    CanonicalTypes.toSpark(CTimestamp("ns", None)) match {
      case Widened(TimestampNTZType, _) => ()
      case other => fail(s"expected widened NTZ, got $other")
    }
  }

  test("MonthDayNano interval and union types are rejected; encodings widen") {
    assert(CanonicalTypes.toSpark(CInterval("month_day_nano")).isInstanceOf[Rejected])
    assert(CanonicalTypes.toSpark(CUnion(Seq(CUtf8))).isInstanceOf[Rejected])
    CanonicalTypes.toSpark(CDictionary(CUtf8)) match {
      case Widened(StringType, r) => assert(r.contains("decoded"))
      case other => fail(s"expected widened, got $other")
    }
    CanonicalTypes.toSpark(CInt(64, signed = false)) match {
      case Widened(t: DecimalType, _) => assert(t == DecimalType(20, 0))
      case other => fail(s"expected decimal(20,0), got $other")
    }
  }

  test("lossless widening table") {
    import CanonicalTypes.isLosslessWidening
    assert(isLosslessWidening(IntegerType, LongType))
    assert(isLosslessWidening(FloatType, DoubleType))
    assert(!isLosslessWidening(LongType, IntegerType))
    assert(!isLosslessWidening(DoubleType, FloatType))
    assert(isLosslessWidening(DecimalType(10, 2), DecimalType(20, 4)))
    assert(!isLosslessWidening(DecimalType(20, 4), DecimalType(10, 2)))
    assert(!isLosslessWidening(LongType, StringType)) // never silent stringify
    assert(isLosslessWidening(DateType, TimestampNTZType))
  }

  test("canonical json: key order invariance + stable hashing") {
    import graft.core.CanonicalJson._
    val a = JObj(Seq("b" -> JInt(2), "a" -> JStr("x")))
    val b = JObj(Seq("a" -> JStr("x"), "b" -> JInt(2)))
    assert(render(a) == render(b))
    assert(hash(a) == hash(b))
    assert(render(a) == """{"a":"x","b":2}""")
  }
}
