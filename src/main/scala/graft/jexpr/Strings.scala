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
      // capitalize lowercases the remainder; the first CODE POINT takes
      // its full uppercase mapping, which can be multi-char — Rust
      // char::to_uppercase pushes every mapped char (string.rs:172-183,
      // "ß" → "SS")
      case "capitalize" =>
        if (s.isEmpty) JStr(s)
        else {
          val n = Character.charCount(s.codePointAt(0))
          JStr(s.substring(0, n).toUpperCase + s.substring(n).toLowerCase)
        }
      case "title_case" => // whitespace-preserving char walk (string.rs:188-208)
        val out = new StringBuilder(s.length)
        var atStart = true
        s.foreach { c =>
          if (isWs(c)) { out.append(c); atStart = true }
          else if (atStart) { out.append(c.toUpper); atStart = false }
          else out.append(c.toLower)
        }
        JStr(out.toString)
      // Rust str::trim strips the Unicode White_Space set (string.rs:
      // 152-168) — neither Java's String.trim (≤ 0x20 only) nor
      // Character.isWhitespace (adds 0x1C-0x1F, misses NBSP/NEL) is
      // that set, so both lanes share the explicit predicate
      case "trim"        => JStr(trimWs(s, left = true, right = true))
      case "trim_left" | "lstrip"  => JStr(trimWs(s, left = true, right = false))
      case "trim_right" | "rstrip" => JStr(trimWs(s, left = false, right = true))
      case "snake_case"  => JStr(caseWords(s).mkString("_"))
      case "kebab_case"  => JStr(caseWords(s).mkString("-"))
      case "camel_case"  =>
        val ws = caseWords(s)
        JStr(if (ws.isEmpty) "" else ws.head + ws.tail.map(upperFirst).mkString)
      case "pascal_case" => JStr(caseWords(s).map(upperFirst).mkString)
      case "reverse_str" => // codepoint-wise, like chars().rev() (string.rs:370)
        JStr(new java.lang.StringBuilder(s).reverse.toString)
      case "lines"       => JArr(rustLines(s).map(JStr(_)))
      // Rust split_whitespace — Unicode White_Space separators, empties
      // dropped (string.rs:388-398); \\s would be the ASCII class only
      case "words"       => JArr(splitWs(s).map(JStr(_)))
      // chars_of iterates Unicode code points (string.rs:414); chars is
      // per-UTF-16-char — identical for BMP text, kept separate for parity.
      case "chars"       => JArr(s.map(c => JStr(c.toString)).toVector)
      case "chars_of" =>
        JArr(s.codePoints().toArray.toVector.map(cp => JStr(new String(Character.toChars(cp)))))
      case "bytes"       => JArr(s.getBytes("UTF-8").toVector.map(b => JInt((b & 0xff).toLong)))
      case "byte_len"    => JInt(s.getBytes("UTF-8").length.toLong)
      case "is_blank"    => JBool(s.forall(c => isWs(c))) // all-ws, "" true (mod.rs:2059)
      // ascii-digits only (mod.rs:2060-2062), NOT a float test
      case "is_numeric"  => JBool(s.nonEmpty && s.forall(c => c >= '0' && c <= '9'))
      case "is_alpha"    => JBool(s.nonEmpty && s.forall(_.isLetter))
      case "is_ascii"    => JBool(s.forall(_ < 128))
      case "to_number" => // Int when integral, else Float (mod.rs:2067-2075)
        s.toLongOption.map(JInt(_))
          .orElse(s.toDoubleOption.map(JFloat(_))).getOrElse(JNull)
      case "parse_float" =>
        trimWs(s, left = true, right = true).toDoubleOption.map(JFloat(_)).getOrElse(JNull)
      case "parse_int"   =>
        trimWs(s, left = true, right = true).toLongOption.map(JInt(_)).getOrElse(JNull)
      case "to_bool" => s match { // strict (mod.rs:2076-2080)
        case "true"  => JBool(true)
        case "false" => JBool(false)
        case _       => JNull
      }
      case "parse_bool" => trimWs(s, left = true, right = true).toLowerCase match { // lenient (string.rs:526-532)
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
        val fill = fillOf(args)
        val n = s.codePointCount(0, s.length)
        if (n >= w) JStr(s)
        else {
          val total = w - n; val l = total / 2
          JStr(fill * l + s + fill * (total - l))
        }
      case "starts_with"  => JBool(s.startsWith(strA(args, 0)))
      case "ends_with"    => JBool(s.endsWith(strA(args, 0)))
      case "index_of"     => recv match {
        case JArr(xs) => // array form: null on miss (O:collection.rs:470)
          val i = xs.indexWhere(JValue.eq(_, argA(args, 0)))
          if (i < 0) JNull else JInt(i.toLong)
        case _ => // string form: -1 on miss; the hit position converts
          // to a CODE POINT index (mod.rs:2113-2122 counts chars of the
          // prefix before the byte offset) — Java's raw indexOf would
          // report UTF-16 units and overcount past astral chars
          val i = s.indexOf(strA(args, 0))
          JInt(if (i < 0) -1L else s.codePointCount(0, i).toLong)
      }
      case "last_index_of" =>
        val i = s.lastIndexOf(strA(args, 0))
        JInt(if (i < 0) -1L else s.codePointCount(0, i).toLong)
      case "replace"      => JStr(replaceFirstLiteral(s, strA(args, 0), strA(args, 1)))
      case "replace_all" =>
        val f = strA(args, 0); val t = strA(args, 1)
        // Rust str::replace with an empty needle inserts the replacement
        // at every CODE POINT boundary including both ends ("" → rep;
        // string.rs:100-115 replace over char boundaries). Java's
        // String.replace("") inserts per UTF-16 unit — it would split
        // surrogate pairs on astral text.
        if (f.isEmpty) {
          val cps = s.codePoints().toArray
          JStr(if (cps.isEmpty) t
               else cps.map(cp => new String(Character.toChars(cp)))
                 .mkString(t, t, t))
        } else JStr(s.replace(f, t))
      case "strip_prefix" => JStr(if (s.startsWith(strA(args, 0))) s.drop(strA(args, 0).length) else s)
      case "strip_suffix" => JStr(if (s.endsWith(strA(args, 0))) s.dropRight(strA(args, 0).length) else s)
      case "slice" =>
        Interp.sliceOf(recv, Some(intA(args, 0)), if (args.length > 1) Some(intA(args, 1)) else None)
      case "split" =>
        val sep = strA(args, 0)
        // Rust str::split with an empty pattern yields boundary empties
        // around each CODE POINT: "ab" → ["","a","b",""], "" → ["",""]
        if (sep.isEmpty)
          JArr((JStr("") +: s.codePoints().toArray.toVector
            .map(cp => JStr(new String(Character.toChars(cp))))) :+ JStr(""))
        else JArr(splitLiteral(s, sep).map(JStr(_)))
      case "indent" =>
        val n = intA(args, 0).toInt
        JStr(rustLines(s).map(l => " " * n + l).mkString("\n"))
      case "dedent" => // min leading-whitespace margin (string.rs:301-319)
        val ls = rustLines(s)
        val margin = ls.filter(l => !l.forall(c => isWs(c)))
          .map(l => l.length - l.dropWhile(c => isWs(c)).length)
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

  /** Width and fill count CODE POINTS (string.rs:569-590 measures
    * chars().count() and fills with a char) — Java's String.length
    * would over-count astral text and under-pad it. */
  private def pad(s: String, args: Vector[JValue], left: Boolean): JValue = {
    val w = intA(args, 0).toInt
    val fill = fillOf(args)
    val n = s.codePointCount(0, s.length)
    if (n >= w) JStr(s)
    else {
      val padding = fill * (w - n)
      JStr(if (left) padding + s else s + padding)
    }
  }

  /** First code point of the fill argument (a Rust `char`); space when
    * absent or empty. */
  private def fillOf(args: Vector[JValue]): String =
    if (args.length > 1) {
      val f = strA(args, 1)
      if (f.isEmpty) " "
      else f.substring(0, Character.charCount(f.codePointAt(0)))
    } else " "

  /** Unicode White_Space (Rust char::is_whitespace): 09-0D, 20, 85, A0,
    * 1680, 2000-200A, 2028, 2029, 202F, 205F, 3000. All BMP, so a
    * char-level test is exact. */
  private[jexpr] def isWs(cp: Int): Boolean =
    (cp >= 0x09 && cp <= 0x0D) || cp == 0x20 || cp == 0x85 || cp == 0xA0 ||
    cp == 0x1680 || (cp >= 0x2000 && cp <= 0x200A) || cp == 0x2028 ||
    cp == 0x2029 || cp == 0x202F || cp == 0x205F || cp == 0x3000

  private def trimWs(s: String, left: Boolean, right: Boolean): String = {
    var i = 0
    var j = s.length
    while (left && i < j && isWs(s.charAt(i))) i += 1
    while (right && j > i && isWs(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  /** Rust str::split_whitespace: White_Space runs separate, empties
    * dropped. */
  private def splitWs(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    s.foreach { c =>
      if (isWs(c)) { if (cur.nonEmpty) { out += cur.toString; cur.clear() } }
      else cur.append(c)
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }

  /** Word splitter for case conversions: splits on whitespace, `_`, `-`,
    * and lower→Upper camel boundaries; lowercases each word. Digits do
    * NOT arm a camel boundary (helpers.rs:9-34: prev_lower tracks
    * is_lowercase only — "v2Engine" is one word). */
  /** upper_first_into (reference helpers.rs:37-45): the first CODE
    * POINT takes its full uppercase mapping (can grow, "ß" → "SS"),
    * rest verbatim — NOT Scala's String.capitalize, which maps the
    * first UTF-16 unit only and misses astral case pairs and
    * multi-char growth. */
  private def upperFirst(w: String): String =
    if (w.isEmpty) w
    else {
      val n = Character.charCount(w.codePointAt(0))
      w.substring(0, n).toUpperCase + w.substring(n)
    }

  private def caseWords(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var prevLower = false
    s.foreach { c =>
      if (isWs(c) || c == '_' || c == '-') {
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
    * last line rather than opening an empty one ("" has no lines), and
    * a `\r` directly before each `\n` terminator is stripped — but NOT
    * from an unterminated final line. */
  private def rustLines(s: String): Vector[String] = {
    val parts = s.split("\n", -1)
    val terminated = parts.length - 1 // every part but the last had a \n
    val out = Vector.newBuilder[String]
    var k = 0
    while (k < terminated) {
      out += parts(k).stripSuffix("\r")
      k += 1
    }
    if (parts(terminated).nonEmpty) out += parts(terminated)
    out.result()
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
