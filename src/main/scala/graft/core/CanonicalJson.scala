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

  /** Structural parse — full inverse of `render` (and of any standard
    * JSON emitter): handles nesting, arrays, and the complete escape
    * set (\n \r \t \b \f \/ \uXXXX), symmetric with `esc`. Used by
    * Position.fromJson and the ledger reader so round-trips are exact
    * even for control characters (cdf stores positions/receipts as
    * real JSON values, not regex-scraped strings). */
  def parse(s: String): J = {
    var i = 0
    def err(msg: String) = throw new IllegalArgumentException(s"json parse: $msg at $i in ${s.take(200)}")
    def ws(): Unit = while (i < s.length && (s(i) == ' ' || s(i) == '\t' || s(i) == '\n' || s(i) == '\r')) i += 1
    def expect(c: Char): Unit = { if (i >= s.length || s(i) != c) err(s"expected '$c'"); i += 1 }
    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s(i) != '"') {
        s(i) match {
          case '\\' =>
            i += 1
            if (i >= s.length) err("truncated escape")
            s(i) match {
              case '"' => sb.append('"'); i += 1
              case '\\' => sb.append('\\'); i += 1
              case '/' => sb.append('/'); i += 1
              case 'n' => sb.append('\n'); i += 1
              case 'r' => sb.append('\r'); i += 1
              case 't' => sb.append('\t'); i += 1
              case 'b' => sb.append('\b'); i += 1
              case 'f' => sb.append('\f'); i += 1
              case 'u' =>
                if (i + 4 >= s.length) err("truncated \\u escape")
                sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar); i += 5
              case c => err(s"bad escape \\$c")
            }
          case c => sb.append(c); i += 1
        }
      }
      expect('"')
      sb.toString
    }
    def num(): J = {
      val start = i
      if (i < s.length && (s(i) == '-' || s(i) == '+')) i += 1
      var isInt = true
      while (i < s.length && (s(i).isDigit || s(i) == '.' || s(i) == 'e' || s(i) == 'E' ||
        s(i) == '-' || s(i) == '+')) {
        if (s(i) == '.' || s(i) == 'e' || s(i) == 'E') isInt = false
        i += 1
      }
      val t = s.substring(start, i)
      if (isInt) JInt(t.toLong) else JNum(t.toDouble)
    }
    def value(): J = {
      ws()
      if (i >= s.length) err("unexpected end")
      s(i) match {
        case '"' => JStr(str())
        case '{' =>
          i += 1; ws()
          val kvs = Vector.newBuilder[(String, J)]
          if (i < s.length && s(i) == '}') { i += 1 }
          else {
            var done = false
            while (!done) {
              ws(); val k = str(); ws(); expect(':')
              kvs += (k -> value())
              ws()
              if (i < s.length && s(i) == ',') i += 1
              else { expect('}'); done = true }
            }
          }
          JObj(kvs.result())
        case '[' =>
          i += 1; ws()
          val vs = Vector.newBuilder[J]
          if (i < s.length && s(i) == ']') { i += 1 }
          else {
            var done = false
            while (!done) {
              vs += value()
              ws()
              if (i < s.length && s(i) == ',') i += 1
              else { expect(']'); done = true }
            }
          }
          JArr(vs.result())
        case 't' => if (s.startsWith("true", i)) { i += 4; JBool(true) } else err("bad literal")
        case 'f' => if (s.startsWith("false", i)) { i += 5; JBool(false) } else err("bad literal")
        case 'n' => if (s.startsWith("null", i)) { i += 4; JNull } else err("bad literal")
        case _ => num()
      }
    }
    val v = value(); ws()
    if (i != s.length) err("trailing content")
    v
  }

  /** Field accessors over a parsed JObj. */
  def objFields(j: J): Map[String, J] = j match {
    case JObj(kvs) => kvs.toMap
    case other => throw new IllegalArgumentException(s"expected object, got $other")
  }
}
