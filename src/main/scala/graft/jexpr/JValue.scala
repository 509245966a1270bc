package graft.jexpr

import scala.collection.immutable.VectorMap

/** Dynamically-typed JSON value — the document-mode currency.
  *
  * Mirrors the reference's `Val` data model
  * (/root/reference/jetro-core/src/data/value.rs:22-53) minus the
  * representation tricks (interning, columnar lanes, zero-copy slices):
  * on Spark those jobs belong to Tungsten/Parquet, so a plain ADT is the
  * right shape here. Semantics preserved: Int/Float duality, null as the
  * missing-value sentinel, insertion-ordered objects.
  */
sealed trait JValue {
  /** jetro truthiness (reference util.rs:63-73): null→false, bool
    * itself, numbers ≠ 0, non-empty strings/arrays/objects. */
  def truthy: Boolean = this match {
    case JNull        => false
    case JBool(b)     => b
    case JInt(n)      => n != 0L
    case JFloat(f)    => f != 0.0
    case JStr(s)      => s.nonEmpty
    case JArr(xs)     => xs.nonEmpty
    case JObj(fs)     => fs.nonEmpty
    case _: JFun      => true
  }

  def kind: String = this match {
    case JNull     => "null"
    case _: JBool  => "bool"
    case _: JInt   => "number"
    case _: JFloat => "number"
    case _: JStr   => "string"
    case _: JArr   => "array"
    case _: JObj   => "object"
    case _: JFun   => "lambda"
  }

  def render: String = { val sb = new StringBuilder; JValue.write(sb, this); sb.toString }
}

case object JNull extends JValue
final case class JBool(v: Boolean) extends JValue
final case class JInt(v: Long) extends JValue
final case class JFloat(v: Double) extends JValue
final case class JStr(v: String) extends JValue
final case class JArr(v: Vector[JValue]) extends JValue
/** Insertion-ordered object (reference uses IndexMap, value.rs:46-47). */
final case class JObj(v: VectorMap[String, JValue]) extends JValue
/** Internal closure value — exists only during evaluation, renders as null. */
final case class JFun(params: Vector[String], body: Expr, captured: Map[String, JValue]) extends JValue

object JObj {
  def of(fields: (String, JValue)*): JObj = JObj(VectorMap(fields: _*))
  val empty: JObj = JObj(VectorMap.empty)
}

object JValue {
  def num(d: Double): JValue =
    if (d.isWhole && math.abs(d) < 9.007199254740992e15 && !d.isInfinite) JInt(d.toLong)
    else JFloat(d)

  /** Structural equality with Int/Float cross-comparison
    * (reference util.rs:78-96). */
  def eq(a: JValue, b: JValue): Boolean = (a, b) match {
    case (JNull, JNull)         => true
    case (JBool(x), JBool(y))   => x == y
    case (JInt(x), JInt(y))     => x == y
    case (JFloat(x), JFloat(y)) => x == y
    case (JInt(x), JFloat(y))   => x.toDouble == y
    case (JFloat(x), JInt(y))   => x == y.toDouble
    case (JStr(x), JStr(y))     => x == y
    case (JArr(x), JArr(y))     => x.length == y.length && x.lazyZip(y).forall(eq)
    case (JObj(x), JObj(y))     =>
      x.size == y.size && x.forall { case (k, v) => y.get(k).exists(eq(v, _)) }
    case _                      => false
  }

  /** Total order used by sort: numbers promoted, strings/bools lexical;
    * incomparable pairs tie (reference util.rs:99-137). */
  def cmp(a: JValue, b: JValue): Int = (a, b) match {
    case (JInt(x), JInt(y))     => java.lang.Long.compare(x, y)
    case (JFloat(x), JFloat(y)) => java.lang.Double.compare(x, y)
    case (JInt(x), JFloat(y))   => java.lang.Double.compare(x.toDouble, y)
    case (JFloat(x), JInt(y))   => java.lang.Double.compare(x, y.toDouble)
    case (JStr(x), JStr(y))     => x.compareTo(y)
    case (JBool(x), JBool(y))   => java.lang.Boolean.compare(x, y)
    case _                      => 0
  }

  /** Comparison binop: `< <= > >=` on incompatible kinds → false
    * (reference util.rs:141-170). */
  def cmpOk(a: JValue, b: JValue): Boolean = (a, b) match {
    case (JInt(_) | JFloat(_), JInt(_) | JFloat(_)) => true
    case (JStr(_), JStr(_))                         => true
    case (JBool(_), JBool(_))                       => true
    case _                                          => false
  }

  def asNum(v: JValue): Option[Double] = v match {
    case JInt(n)   => Some(n.toDouble)
    case JFloat(f) => Some(f)
    case _         => None
  }

  // ── JSON text → JValue (recursive descent; no third-party deps) ──────
  def parse(s: String): JValue = {
    val p = new JsonParser(s)
    val v = p.parseValue()
    p.skipWs()
    if (!p.atEnd) throw new JsonParseException(s"trailing input at ${p.pos}")
    v
  }

  def parseOpt(s: String): Option[JValue] =
    try Some(parse(s)) catch { case _: JsonParseException => None }

  // ── JValue → JSON text ───────────────────────────────────────────────
  def write(sb: StringBuilder, v: JValue): Unit = v match {
    case JNull | _: JFun => sb.append("null")
    case JBool(b)  => sb.append(b)
    case JInt(n)   => sb.append(n)
    case JFloat(f) => sb.append(renderDouble(f))
    case JStr(s)   => writeString(sb, s)
    case JArr(xs)  =>
      sb.append('[')
      var first = true
      xs.foreach { x => if (!first) sb.append(','); first = false; write(sb, x) }
      sb.append(']')
    case JObj(fs)  =>
      sb.append('{')
      var first = true
      fs.foreach { case (k, x) =>
        if (!first) sb.append(','); first = false
        writeString(sb, k); sb.append(':'); write(sb, x)
      }
      sb.append('}')
  }

  /** Doubles print shortest-round-trip like serde_json (312.20 → 312.2);
    * whole doubles keep a `.0` to stay floats on re-parse. */
  def renderDouble(f: Double): String = {
    if (f.isNaN || f.isInfinite) "null"
    else if (f == f.toLong && math.abs(f) < 1e15) s"${f.toLong}.0"
    else {
      val s = f.toString
      if (s.endsWith(".0")) s.dropRight(2) else s
    }
  }

  /** Display form used by f-strings / to_string: no quotes on strings,
    * floats shortest (184.5 not 184.50). */
  def display(v: JValue): String = v match {
    case JStr(s)   => s
    case JFloat(f) =>
      if (f == f.toLong && math.abs(f) < 1e15) f.toLong.toString else f.toString
    case JNull | _: JBool | _: JInt => v.render
    case _         => v.render
  }

  private def writeString(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      (s.charAt(i): @annotation.switch) match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }
}

final class JsonParseException(msg: String) extends RuntimeException(msg)

/** Minimal strict JSON parser. */
private final class JsonParser(s: String) {
  var pos = 0
  // Depth guard: a pathologically nested document must fail as a
  // catchable JsonParseException (→ null row in the eval UDFs), not as a
  // StackOverflowError that kills the executor task at scale.
  private var depth = 0
  private val MaxDepth = 512
  def atEnd: Boolean = pos >= s.length

  def skipWs(): Unit =
    while (pos < s.length && (s.charAt(pos) == ' ' || s.charAt(pos) == '\n' ||
      s.charAt(pos) == '\t' || s.charAt(pos) == '\r')) pos += 1

  private def fail(msg: String): Nothing = throw new JsonParseException(s"$msg at $pos")

  private def expect(c: Char): Unit = {
    if (atEnd || s.charAt(pos) != c) fail(s"expected '$c'")
    pos += 1
  }

  def parseValue(): JValue = {
    skipWs()
    if (atEnd) fail("unexpected end")
    s.charAt(pos) match {
      case '{' =>
        depth += 1
        if (depth > MaxDepth) fail(s"nesting deeper than $MaxDepth")
        val v = parseObj(); depth -= 1; v
      case '[' =>
        depth += 1
        if (depth > MaxDepth) fail(s"nesting deeper than $MaxDepth")
        val v = parseArr(); depth -= 1; v
      case '"' => JStr(parseString())
      case 't' => literal("true"); JBool(true)
      case 'f' => literal("false"); JBool(false)
      case 'n' => literal("null"); JNull
      case c if c == '-' || (c >= '0' && c <= '9') => parseNumber()
      case c   => fail(s"unexpected '$c'")
    }
  }

  private def literal(lit: String): Unit = {
    if (!s.startsWith(lit, pos)) fail(s"expected $lit")
    pos += lit.length
  }

  private def parseObj(): JValue = {
    expect('{'); skipWs()
    if (!atEnd && s.charAt(pos) == '}') { pos += 1; return JObj(VectorMap.empty) }
    val b = VectorMap.newBuilder[String, JValue]
    var done = false
    while (!done) {
      skipWs()
      val k = parseString()
      skipWs(); expect(':')
      val v = parseValue()
      b += (k -> v)
      skipWs()
      if (!atEnd && s.charAt(pos) == ',') pos += 1
      else { expect('}'); done = true }
    }
    JObj(b.result())
  }

  private def parseArr(): JValue = {
    expect('['); skipWs()
    if (!atEnd && s.charAt(pos) == ']') { pos += 1; return JArr(Vector.empty) }
    val buf = Vector.newBuilder[JValue]
    var done = false
    while (!done) {
      buf += parseValue()
      skipWs()
      if (!atEnd && s.charAt(pos) == ',') pos += 1
      else { expect(']'); done = true }
    }
    JArr(buf.result())
  }

  /** Escape-free fast path: scan to the closing quote and take one
    * substring (the overwhelmingly common case); fall to the
    * builder-based unescape loop only when a backslash appears. */
  private def parseString(): String = {
    expect('"')
    val start = pos
    val len = s.length
    while (pos < len) {
      val c = s.charAt(pos)
      if (c == '"') { val r = s.substring(start, pos); pos += 1; return r }
      if (c == '\\') return parseStringSlow(start)
      pos += 1
    }
    fail("unterminated string")
  }

  private def parseStringSlow(start: Int): String = {
    val sb = new StringBuilder(pos - start + 16)
    sb.append(s.substring(start, pos)) // clean prefix before the first escape
    while (true) {
      if (atEnd) fail("unterminated string")
      val c = s.charAt(pos)
      pos += 1
      if (c == '"') return sb.toString
      else if (c == '\\') {
        if (atEnd) fail("bad escape")
        val e = s.charAt(pos); pos += 1
        e match {
          case '"'  => sb.append('"')
          case '\\' => sb.append('\\')
          case '/'  => sb.append('/')
          case 'n'  => sb.append('\n')
          case 't'  => sb.append('\t')
          case 'r'  => sb.append('\r')
          case 'b'  => sb.append('\b')
          case 'f'  => sb.append('\f')
          case 'u'  =>
            if (pos + 4 > s.length) fail("bad \\u escape")
            sb.append(Integer.parseInt(s.substring(pos, pos + 4), 16).toChar)
            pos += 4
          case x    => fail(s"bad escape \\$x")
        }
      } else sb.append(c)
    }
    sys.error("unreachable")
  }

  private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'

  private def parseNumber(): JValue = {
    val start = pos
    val len = s.length
    var neg = false
    if (pos < len && s.charAt(pos) == '-') { neg = true; pos += 1 }
    // integer fast path: accumulate digits directly; fall back to the
    // substring parse on overflow or a float tail
    val digitsStart = pos
    var acc = 0L
    var overflow = false
    while (pos < len && isAsciiDigit(s.charAt(pos))) {
      if (acc > (Long.MaxValue - 9) / 10) overflow = true
      else acc = acc * 10 + (s.charAt(pos) - '0')
      pos += 1
    }
    var isFloat = false
    if (pos < len && s.charAt(pos) == '.') {
      isFloat = true; pos += 1
      while (pos < len && isAsciiDigit(s.charAt(pos))) pos += 1
    }
    if (pos < len && (s.charAt(pos) == 'e' || s.charAt(pos) == 'E')) {
      isFloat = true; pos += 1
      if (pos < len && (s.charAt(pos) == '+' || s.charAt(pos) == '-')) pos += 1
      while (pos < len && isAsciiDigit(s.charAt(pos))) pos += 1
    }
    if (pos == digitsStart) fail("bad number")
    if (!isFloat && !overflow) return JInt(if (neg) -acc else acc)
    val txt = s.substring(start, pos)
    // toDoubleOption (not toDouble): a malformed literal like "77E" must
    // surface as a catchable parse error, not a NumberFormatException
    if (isFloat) txt.toDoubleOption.map(JFloat(_)).getOrElse(fail(s"bad number '$txt'"))
    else txt.toLongOption.map(JInt(_))
      .orElse(txt.toDoubleOption.map(JFloat(_)))
      .getOrElse(fail(s"bad number '$txt'"))
  }
}
