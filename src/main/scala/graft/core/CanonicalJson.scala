package graft.core

/** Canonical JSON + content hashing — the identity discipline behind
  * hash-addressed packages and golden-manifest determinism
  * (cdf: VISION.md:762-790 package identity; golden suites
  * crates/cdf-conformance/src/golden_package/).
  *
  * Rules: object keys sorted, no insignificant whitespace, integers
  * without exponent, doubles via shortest round-trip repr, strings
  * escaped minimally. Purely driver-side; zero dependencies.
  */
object CanonicalJson {
  sealed trait J
  final case class JStr(v: String) extends J
  final case class JNum(v: Double) extends J
  final case class JInt(v: Long) extends J
  final case class JBool(v: Boolean) extends J
  case object JNull extends J
  final case class JArr(v: Seq[J]) extends J
  final case class JObj(v: Seq[(String, J)]) extends J

  object JObj { def of(kvs: (String, J)*): JObj = JObj(kvs.toVector) }

  def esc(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append("\"").toString
  }

  def render(j: J): String = j match {
    case JStr(v) => esc(v)
    case JNum(v) =>
      if (v.isNaN || v.isInfinite) esc(v.toString)
      else if (v == v.floor && math.abs(v) < 1e15) v.toLong.toString
      else v.toString
    case JInt(v) => v.toString
    case JBool(v) => v.toString
    case JNull => "null"
    case JArr(v) => v.map(render).mkString("[", ",", "]")
    case JObj(v) =>
      v.sortBy(_._1).map { case (k, x) => s"${esc(k)}:${render(x)}" }
        .mkString("{", ",", "}")
  }

  def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def hash(j: J): String = sha256Hex(render(j))
}
