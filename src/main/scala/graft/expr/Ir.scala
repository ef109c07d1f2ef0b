package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.CanonicalJson._

/** Typed scalar/predicate expression IR (cdf: crates/cdf-kernel/src/
  * expression.rs:21-360 `DeclarativeExpression`, :709-790
  * `ScalarExpressionKind`). The IR — not SQL text — is what gets
  * hashed into the compiled plan artifact; literals are bit-exact
  * (`Float64Bits`) so plan identity is byte-stable (VISION.md:1128-1131).
  *
  * Lowering targets Catalyst `Column`s 1:1, so evaluation is stock
  * codegen'd Spark; this layer only adds admission + identity.
  */
sealed trait Expr { def toJson: J }

object Expr {
  final case class Col(name: String) extends Expr {
    def toJson: J = JObj.of("col" -> JStr(name))
  }
  sealed trait Lit extends Expr
  final case class LStr(v: String) extends Lit { def toJson: J = JObj.of("str" -> JStr(v)) }
  final case class LInt(v: Long) extends Lit { def toJson: J = JObj.of("int" -> JInt(v)) }
  /** bit-exact float literal (cdf `Float64Bits`, kernel/expression.rs:299-311). */
  final case class LFloatBits(bits: Long) extends Lit {
    def toJson: J = JObj.of("f64_bits" -> JInt(bits))
    def value: Double = java.lang.Double.longBitsToDouble(bits)
  }
  object LFloat { def apply(v: Double): LFloatBits = LFloatBits(java.lang.Double.doubleToLongBits(v)) }
  final case class LBool(v: Boolean) extends Lit { def toJson: J = JObj.of("bool" -> JBool(v)) }
  case object LNull extends Lit { def toJson: J = JObj.of("null" -> JBool(true)) }
  final case class LStrList(v: Seq[String]) extends Lit {
    def toJson: J = JObj.of("str_list" -> JArr(v.map(JStr)))
  }

  sealed trait UnaryOp
  object UnaryOp { case object Not extends UnaryOp; case object Neg extends UnaryOp
    case object IsNull extends UnaryOp; case object IsNotNull extends UnaryOp }
  final case class Unary(op: UnaryOp, child: Expr) extends Expr {
    def toJson: J = JObj.of("unary" -> JStr(op.toString), "child" -> child.toJson)
  }

  sealed trait BinOp
  object BinOp {
    case object Eq extends BinOp; case object Neq extends BinOp
    case object Lt extends BinOp; case object Lte extends BinOp
    case object Gt extends BinOp; case object Gte extends BinOp
    case object Add extends BinOp; case object Sub extends BinOp
    case object Mul extends BinOp; case object Div extends BinOp
    case object Mod extends BinOp; case object And extends BinOp; case object Or extends BinOp
  }
  final case class Binary(op: BinOp, l: Expr, r: Expr) extends Expr {
    def toJson: J = JObj.of("bin" -> JStr(op.toString), "l" -> l.toJson, "r" -> r.toJson)
  }

  final case class In(child: Expr, values: LStrList) extends Expr {
    def toJson: J = JObj.of("in" -> child.toJson, "values" -> values.toJson)
  }

  sealed trait CastMode
  object CastMode { case object Implicit extends CastMode; case object Explicit extends CastMode
    case object Try extends CastMode }
  final case class Cast(child: Expr, toType: String, mode: CastMode) extends Expr {
    def toJson: J = JObj.of("cast" -> child.toJson, "to" -> JStr(toType), "mode" -> JStr(mode.toString))
  }

  /** Versioned function reference (cdf `ScalarFunctionReference`,
    * kernel/expression.rs:476-520): namespace+version pinned so plan
    * replay refuses registry drift. */
  final case class Call(namespace: String, name: String, version: String, args: Seq[Expr]) extends Expr {
    def toJson: J = JObj.of("call" -> JStr(s"$namespace.$name@$version"),
      "args" -> JArr(args.map(_.toJson)))
  }

  /** Registry of admitted (Immutable-volatility) builtins — the
    * deterministic subset (cdf: engine/expression.rs:569-600 volatility
    * gate; non-deterministic functions like rand()/now() are REJECTED
    * at admission, preserving replay determinism). */
  val FunctionNamespace = "spark.builtin.scalar"
  val FunctionVersion = "4.1.2"
  val immutableBuiltins: Set[String] = Set(
    "abs", "ceil", "floor", "round", "sqrt", "exp", "ln", "log10", "pow",
    "lower", "upper", "trim", "ltrim", "rtrim", "length", "substring", "concat",
    "concat_ws", "replace", "split", "regexp_like", "regexp_replace", "regexp_extract",
    "coalesce", "greatest", "least", "md5", "sha2", "xxhash64", "crc32",
    "year", "month", "day", "hour", "minute", "second", "date_trunc", "to_date",
    "to_timestamp", "unix_timestamp_literal", "nullif", "if", "casewhen")
  val bannedVolatile: Set[String] = Set(
    "rand", "randn", "random", "uuid", "now", "current_timestamp", "current_date",
    "current_timezone", "monotonically_increasing_id", "spark_partition_id",
    "input_file_name", "shuffle")

  /** Admission: every Call must be a pinned Immutable builtin. */
  def admit(e: Expr): Either[String, Expr] = {
    def walk(x: Expr): Option[String] = x match {
      case Call(ns, n, v, args) =>
        if (bannedVolatile.contains(n.toLowerCase))
          Some(s"non-deterministic function '$n' rejected at admission")
        else if (!immutableBuiltins.contains(n.toLowerCase))
          Some(s"function '$n' not in admitted registry $FunctionNamespace@$FunctionVersion")
        else if (ns != FunctionNamespace || v != FunctionVersion)
          Some(s"function registry drift: $ns@$v != $FunctionNamespace@$FunctionVersion")
        else args.flatMap(walk).headOption
      case Unary(_, c) => walk(c)
      case Binary(_, l, r) => walk(l).orElse(walk(r))
      case In(c, _) => walk(c)
      case Cast(c, _, _) => walk(c)
      case _ => None
    }
    walk(e).toLeft(e)
  }

  /** Lower to a Catalyst Column (stock codegen'd evaluation). */
  def lower(e: Expr): Column = e match {
    case Col(n) => col(n)
    case LStr(v) => lit(v)
    case LInt(v) => lit(v)
    case l: LFloatBits => lit(l.value)
    case LBool(v) => lit(v)
    case LNull => lit(null)
    case LStrList(v) => array(v.map(lit): _*)
    case Unary(UnaryOp.Not, c) => !lower(c)
    case Unary(UnaryOp.Neg, c) => -lower(c)
    case Unary(UnaryOp.IsNull, c) => lower(c).isNull
    case Unary(UnaryOp.IsNotNull, c) => lower(c).isNotNull
    case Binary(op, l, r) =>
      val (a, b) = (lower(l), lower(r))
      op match {
        case BinOp.Eq => a === b; case BinOp.Neq => a =!= b
        case BinOp.Lt => a < b; case BinOp.Lte => a <= b
        case BinOp.Gt => a > b; case BinOp.Gte => a >= b
        case BinOp.Add => a + b; case BinOp.Sub => a - b
        case BinOp.Mul => a * b; case BinOp.Div => a / b
        case BinOp.Mod => a % b
        case BinOp.And => a && b; case BinOp.Or => a || b
      }
    case In(c, LStrList(vs)) => lower(c).isin(vs: _*)
    case Cast(c, t, CastMode.Try) => lower(c).try_cast(t)
    case Cast(c, t, _) => lower(c).cast(t)
    case Call(_, name, _, args) => call_function(name, args.map(lower): _*)
  }

  /** Plan identity of an expression — hash of canonical IR JSON with
    * the registry pin folded in (cdf kernel/expression.rs:13-17). */
  def planHash(e: Expr): String =
    graft.core.CanonicalJson.hash(JObj.of(
      "expr" -> e.toJson,
      "registry" -> JStr(s"$FunctionNamespace@$FunctionVersion")))

  /** Expression lints (cdf: engine/expression.rs:238-252 — provable
    * `AlwaysTrue`/`AlwaysFalse` predicates are plan-time diagnostics:
    * a filter that can't reject anything usually means an authoring
    * mistake, not an optimization opportunity). */
  sealed trait Lint { def msg: String }
  object Lint {
    final case class AlwaysTrue(msg: String) extends Lint
    final case class AlwaysFalse(msg: String) extends Lint
  }

  def lint(e: Expr): Seq[Lint] = {
    val out = Seq.newBuilder[Lint]
    def walk(x: Expr): Unit = x match {
      case Binary(op, Col(a), Col(b)) if a == b => op match {
        case BinOp.Eq | BinOp.Lte | BinOp.Gte =>
          out += Lint.AlwaysTrue(s"$a ${op} $a is always true (except null)")
        case BinOp.Neq | BinOp.Lt | BinOp.Gt =>
          out += Lint.AlwaysFalse(s"$a ${op} $a is always false")
        case _ =>
      }
      case In(_, LStrList(vs)) if vs.isEmpty =>
        out += Lint.AlwaysFalse("IN () over an empty set is always false")
      case Binary(BinOp.And, l, r) => walk(l); walk(r)
      case Binary(BinOp.Or, l, r) => walk(l); walk(r)
      case Unary(_, c) => walk(c)
      case _ =>
    }
    walk(e)
    out.result()
  }

  /** `col op literal` comparison parser (cdf expression.rs:71-130) —
    * the bounded predicate grammar for pushdown negotiation. */
  private val cmp = """\s*([A-Za-z_][A-Za-z0-9_]*)\s*(=|!=|>=|<=|>|<)\s*(.+?)\s*""".r
  def parseComparison(s: String): Either[String, Expr] = s match {
    case cmp(c, op, rawLit) =>
      val litE: Expr =
        if (rawLit.startsWith("'") && rawLit.endsWith("'")) LStr(rawLit.substring(1, rawLit.length - 1))
        else if (rawLit.matches("-?\\d+")) LInt(rawLit.toLong)
        else if (rawLit.matches("-?\\d+\\.\\d+([eE][+-]?\\d+)?")) LFloat(rawLit.toDouble)
        else if (rawLit == "true" || rawLit == "false") LBool(rawLit.toBoolean)
        else return Left(s"unparseable literal: $rawLit")
      val binOp = op match {
        case "=" => BinOp.Eq; case "!=" => BinOp.Neq
        case ">" => BinOp.Gt; case ">=" => BinOp.Gte
        case "<" => BinOp.Lt; case "<=" => BinOp.Lte
      }
      Right(Binary(binOp, Col(c), litE))
    case _ => Left(s"not a comparison: $s")
  }
}
