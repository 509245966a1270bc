package graft.jexpr

import Interp.err

/** String / regex builtin surface (SURVEY §2.8; reference
  * builtins/ops/string.rs + regex.rs — names and behaviors mirrored,
  * implementations fresh). Receiver is coerced to its display string;
  * null propagates as null.
  */
object Strings {

  private val names: Set[String] = Set(
    "upper", "lower", "capitalize", "title_case", "trim", "trim_left",
    "lstrip", "trim_right", "rstrip", "snake_case", "kebab_case",
    "camel_case", "pascal_case", "reverse_str", "lines", "words",
    "chars", "chars_of", "bytes", "byte_len", "is_blank", "is_numeric", "is_alpha",
    "is_ascii", "to_number", "to_bool", "parse_int", "parse_float",
    "parse_bool", "to_base64", "from_base64", "url_encode", "url_decode",
    "html_escape", "html_unescape", "repeat", "pad_left", "pad_right",
    "center", "starts_with", "ends_with", "index_of", "last_index_of",
    "replace", "replace_all", "strip_prefix", "strip_suffix", "slice",
    "split", "indent", "dedent", "matches", "scan", "contains_any",
    "contains_all", "includes", "contains",
    "re_match", "re_match_first", "re_match_all", "re_captures",
    "re_captures_all", "re_split", "re_replace", "re_replace_all")

  def handles(name: String): Boolean = names.contains(name)

  private val regexCache = new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  private def pat(p: String): java.util.regex.Pattern = {
    var c = regexCache.get(p)
    if (c == null) { c = java.util.regex.Pattern.compile(p); regexCache.put(p, c) }
    c
  }

  private def s0(v: JValue): String = v match {
    case JStr(s) => s
    case other   => JValue.display(other)
  }

  private def argA(args: Vector[JValue], i: Int): JValue =
    if (i < args.length) args(i) else err(s"missing argument ${i + 1}")

  private def strA(args: Vector[JValue], i: Int): String =
    if (i < args.length) s0(args(i)) else err("missing string argument")

  private def intA(args: Vector[JValue], i: Int, default: Long = 0): Long =
    if (i < args.length) args(i) match {
      case JInt(n)   => n
      case JFloat(f) => f.toLong
      case other     => err(s"expected int, got ${other.kind}")
    } else default

  def call(name: String, recv: JValue, args: Vector[JValue]): JValue = {
    if (recv == JNull) return JNull
    // reference contract: a string method on a non-applicable receiver
    // returns the receiver UNCHANGED (apply_or_recv mod.rs:1448-1455 —
    // every str apply is as_str_ref-gated), never a stringified
    // coercion: [1, "a"].map(@.upper()) keeps the 1. The two methods
    // with true array receivers keep their array branches.
    val arrayForm =
      (name == "index_of" || name == "slice") && recv.isInstanceOf[JArr]
    if (!recv.isInstanceOf[JStr] && !arrayForm) return recv
    val s = s0(recv)
    name match {
      case "upper"       => JStr(s.toUpperCase)
      case "lower"       => JStr(s.toLowerCase)
      // capitalize lowercases the remainder (string.rs:172-183)
      case "capitalize"  => JStr(if (s.isEmpty) s else s.head.toUpper +: s.tail.toLowerCase)
      case "title_case" => // whitespace-preserving char walk (string.rs:188-208)
        val out = new StringBuilder(s.length)
        var atStart = true
        s.foreach { c =>
          if (c.isWhitespace) { out.append(c); atStart = true }
          else if (atStart) { out.append(c.toUpper); atStart = false }
          else out.append(c.toLower)
        }
        JStr(out.toString)
      case "trim"        => JStr(s.trim)
      case "trim_left" | "lstrip"  => JStr(s.dropWhile(_.isWhitespace))
      case "trim_right" | "rstrip" => JStr(s.reverse.dropWhile(_.isWhitespace).reverse)
      case "snake_case"  => JStr(caseWords(s).mkString("_"))
      case "kebab_case"  => JStr(caseWords(s).mkString("-"))
      case "camel_case"  =>
        val ws = caseWords(s)
        JStr(if (ws.isEmpty) "" else ws.head + ws.tail.map(_.capitalize).mkString)
      case "pascal_case" => JStr(caseWords(s).map(_.capitalize).mkString)
      case "reverse_str" => // codepoint-wise, like chars().rev() (string.rs:370)
        JStr(new java.lang.StringBuilder(s).reverse.toString)
      case "lines"       => JArr(s.split("\n", -1).toVector.map(JStr(_)))
      case "words"       => JArr(s.split("\\s+").toVector.filter(_.nonEmpty).map(JStr(_)))
      // chars_of iterates Unicode code points (string.rs:414); chars is
      // per-UTF-16-char — identical for BMP text, kept separate for parity.
      case "chars"       => JArr(s.map(c => JStr(c.toString)).toVector)
      case "chars_of" =>
        JArr(s.codePoints().toArray.toVector.map(cp => JStr(new String(Character.toChars(cp)))))
      case "bytes"       => JArr(s.getBytes("UTF-8").toVector.map(b => JInt((b & 0xff).toLong)))
      case "byte_len"    => JInt(s.getBytes("UTF-8").length.toLong)
      case "is_blank"    => JBool(s.trim.isEmpty)
      // ascii-digits only (mod.rs:2060-2062), NOT a float test
      case "is_numeric"  => JBool(s.nonEmpty && s.forall(c => c >= '0' && c <= '9'))
      case "is_alpha"    => JBool(s.nonEmpty && s.forall(_.isLetter))
      case "is_ascii"    => JBool(s.forall(_ < 128))
      case "to_number" => // Int when integral, else Float (mod.rs:2067-2075)
        s.toLongOption.map(JInt(_))
          .orElse(s.toDoubleOption.map(JFloat(_))).getOrElse(JNull)
      case "parse_float" => s.trim.toDoubleOption.map(JFloat(_)).getOrElse(JNull)
      case "parse_int"   => s.trim.toLongOption.map(JInt(_)).getOrElse(JNull)
      case "to_bool" => s match { // strict (mod.rs:2076-2080)
        case "true"  => JBool(true)
        case "false" => JBool(false)
        case _       => JNull
      }
      case "parse_bool" => s.trim.toLowerCase match { // lenient (string.rs:526-532)
        case "true" | "yes" | "1" | "on"   => JBool(true)
        case "false" | "no" | "0" | "off"  => JBool(false)
        case _                             => JNull
      }
      case "to_base64"   => JStr(java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8")))
      case "from_base64" =>
        try JStr(new String(java.util.Base64.getDecoder.decode(s), "UTF-8"))
        catch { case _: IllegalArgumentException => JNull }
      case "url_encode"  => JStr(java.net.URLEncoder.encode(s, "UTF-8"))
      case "url_decode"  =>
        try JStr(java.net.URLDecoder.decode(s, "UTF-8"))
        catch { case _: IllegalArgumentException => JNull }
      case "html_escape" =>
        JStr(s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
          .replace("\"", "&quot;").replace("'", "&#39;"))
      case "html_unescape" =>
        JStr(s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
          .replace("&quot;", "\"").replace("&#39;", "'"))
      case "repeat"      => JStr(s * intA(args, 0).toInt)
      case "pad_left"    => pad(s, args, left = true)
      case "pad_right"   => pad(s, args, left = false)
      case "center" =>
        val w = intA(args, 0).toInt
        val fill = if (args.length > 1) strA(args, 1).headOption.getOrElse(' ') else ' '
        if (s.length >= w) JStr(s)
        else {
          val total = w - s.length; val l = total / 2
          JStr(fill.toString * l + s + fill.toString * (total - l))
        }
      case "starts_with"  => JBool(s.startsWith(strA(args, 0)))
      case "ends_with"    => JBool(s.endsWith(strA(args, 0)))
      case "index_of"     => recv match {
        case JArr(xs) => // array form: null on miss (O:collection.rs:470)
          val i = xs.indexWhere(JValue.eq(_, argA(args, 0)))
          if (i < 0) JNull else JInt(i.toLong)
        case _ => // string form: -1 on miss (mod.rs:2113-2122)
          JInt(s.indexOf(strA(args, 0)).toLong)
      }
      case "last_index_of" => JInt(s.lastIndexOf(strA(args, 0)).toLong)
      case "replace"      => JStr(replaceFirstLiteral(s, strA(args, 0), strA(args, 1)))
      case "replace_all"  => JStr(s.replace(strA(args, 0), strA(args, 1)))
      case "strip_prefix" => JStr(if (s.startsWith(strA(args, 0))) s.drop(strA(args, 0).length) else s)
      case "strip_suffix" => JStr(if (s.endsWith(strA(args, 0))) s.dropRight(strA(args, 0).length) else s)
      case "slice" =>
        Interp.sliceOf(recv, Some(intA(args, 0)), if (args.length > 1) Some(intA(args, 1)) else None)
      case "split" =>
        val sep = strA(args, 0)
        if (sep.isEmpty) JArr(s.map(c => JStr(c.toString)).toVector)
        else JArr(splitLiteral(s, sep).map(JStr(_)))
      case "indent" =>
        val n = intA(args, 0).toInt
        JStr(rustLines(s).map(l => " " * n + l).mkString("\n"))
      case "dedent" => // min leading-whitespace margin (string.rs:301-319)
        val ls = rustLines(s)
        val margin = ls.filter(_.trim.nonEmpty)
          .map(l => l.length - l.dropWhile(_.isWhitespace).length)
          .minOption.getOrElse(0)
        JStr(ls.map(l => if (l.length >= margin) l.drop(margin) else l).mkString("\n"))
      case "contains_any" => argA(args, 0) match {
        case JArr(xs) => JBool(xs.exists(x => s.contains(s0(x))))
        case one      => JBool(s.contains(s0(one)))
      }
      case "contains_all" => argA(args, 0) match {
        case JArr(xs) => JBool(xs.forall(x => s.contains(s0(x))))
        case one      => JBool(s.contains(s0(one)))
      }
      case "includes" | "contains" => JBool(s.contains(strA(args, 0)))

      // `matches` is literal substring (mod.rs:2097), NOT regex
      case "matches" => JBool(s.contains(strA(args, 0)))
      // `scan` finds non-overlapping literal occurrences (string.rs:630)
      case "scan" =>
        val p = strA(args, 0)
        if (p.isEmpty) JArr(Vector.empty)
        else {
          val out = Vector.newBuilder[JValue]
          var start = s.indexOf(p)
          while (start >= 0) { out += JStr(p); start = s.indexOf(p, start + p.length) }
          JArr(out.result())
        }

      // regex family (reference ops/regex.rs)
      case "re_match" => JBool(pat(strA(args, 0)).matcher(s).find())
      case "re_match_first" =>
        val m = pat(strA(args, 0)).matcher(s)
        if (m.find()) JStr(m.group()) else JNull
      case "re_match_all" =>
        val m = pat(strA(args, 0)).matcher(s)
        val out = Vector.newBuilder[JValue]
        while (m.find()) out += JStr(m.group())
        JArr(out.result())
      case "re_captures" =>
        val m = pat(strA(args, 0)).matcher(s)
        if (!m.find()) JNull
        else JArr((0 to m.groupCount).map(g => Option(m.group(g)).map(JStr(_)).getOrElse(JNull)).toVector)
      case "re_captures_all" =>
        val m = pat(strA(args, 0)).matcher(s)
        val out = Vector.newBuilder[JValue]
        while (m.find())
          out += JArr((0 to m.groupCount).map(g => Option(m.group(g)).map(JStr(_)).getOrElse(JNull)).toVector)
        JArr(out.result())
      case "re_split" => JArr(pat(strA(args, 0)).split(s, -1).toVector.map(JStr(_)))
      case "re_replace" => JStr(pat(strA(args, 0)).matcher(s).replaceFirst(strA(args, 1)))
      case "re_replace_all" => JStr(pat(strA(args, 0)).matcher(s).replaceAll(strA(args, 1)))

      case other => err(s"unknown string method .$other()")
    }
  }

  private def pad(s: String, args: Vector[JValue], left: Boolean): JValue = {
    val w = intA(args, 0).toInt
    val fill = if (args.length > 1) strA(args, 1).headOption.getOrElse(' ') else ' '
    if (s.length >= w) JStr(s)
    else {
      val padding = fill.toString * (w - s.length)
      JStr(if (left) padding + s else s + padding)
    }
  }

  /** Word splitter for case conversions: splits on whitespace, `_`, `-`,
    * and lower→Upper camel boundaries; lowercases each word. Digits do
    * NOT arm a camel boundary (helpers.rs:9-34: prev_lower tracks
    * is_lowercase only — "v2Engine" is one word). */
  private def caseWords(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var prevLower = false
    s.foreach { c =>
      if (c.isWhitespace || c == '_' || c == '-') {
        if (cur.nonEmpty) { out += cur.toString.toLowerCase; cur.clear() }
        prevLower = false
      } else {
        if (c.isUpper && prevLower && cur.nonEmpty) { out += cur.toString.toLowerCase; cur.clear() }
        cur.append(c)
        prevLower = c.isLower
      }
    }
    if (cur.nonEmpty) out += cur.toString.toLowerCase
    out.result()
  }

  /** Rust `str::lines()` semantics: a trailing newline terminates the
    * last line rather than opening an empty one. */
  private def rustLines(s: String): Vector[String] = {
    val parts = s.split("\n", -1).toVector
    if (parts.length > 1 && parts.last.isEmpty) parts.dropRight(1) else parts
  }

  private def replaceFirstLiteral(s: String, from: String, to: String): String = {
    val i = s.indexOf(from)
    if (i < 0) s else s.substring(0, i) + to + s.substring(i + from.length)
  }

  private def splitLiteral(s: String, sep: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var start = 0
    var i = s.indexOf(sep)
    while (i >= 0) {
      out += s.substring(start, i)
      start = i + sep.length
      i = s.indexOf(sep, start)
    }
    out += s.substring(start)
    out.result()
  }
}
