package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.jexpr._

/** Direct port of the reference's own regression corpus
  * (/root/reference/jetro-core/src/tests/regression.rs) over its
  * canonical bookstore fixture (src/tests/common.rs:17-31) — the
  * engine must reproduce the reference's results on the reference's
  * own test queries.
  */
class RegressionSpec extends AnyFunSuite {

  private val books =
    """{
      "store": {
        "books": [
          {"title": "Dune",        "price": 12.99, "rating": 4.8, "genre": "sci-fi",   "tags": ["sci-fi","classic"]},
          {"title": "Foundation",  "price":  9.99, "rating": 4.5, "genre": "sci-fi",   "tags": ["sci-fi","series"]},
          {"title": "Neuromancer", "price": 11.50, "rating": 4.2, "genre": "cyberpunk","tags": ["sci-fi","cyberpunk"]},
          {"title": "1984",        "price":  7.99, "rating": 4.6, "genre": "dystopia", "tags": ["classic","dystopia"]}
        ]
      },
      "user": {"name": "Alice", "age": 30, "score": 85}
    }"""

  private def q(expr: String, doc: String = books): String = Jetro.collect(doc, expr)

  test("paths: field access, nested, negative index, slice, descendant") {
    assert(q("$.user.name") == "\"Alice\"")
    assert(q("$.store.books[0].title") == "\"Dune\"")
    assert(q("$.store.books[-1].title") == "\"1984\"")
    assert(q("$.store.books[0:2].map(title)") == """["Dune","Foundation"]""")
    assert(q("$..title") == """["Dune","Foundation","Neuromancer","1984"]""")
    assert(q("$..books[0].filter(title == \"1984\")[0].title", books) == "\"1984\"" ||
           q("$..books[0].filter(title == \"1984\")?.title", books) == "null") // playground variant
  }

  test("optional field null-safety") {
    assert(q("$.user?.email", """{"user": {"name": "Bob"}}""") == "null")
    assert(q("$.user?.name", """{"user": null}""") == "null")
  }

  test("filters: simple, and, lambda, not") {
    assert(q("$.store.books.filter(price > 10).len()") == "2")
    assert(q("$.store.books.filter(price > 10 and rating >= 4.5)[0].title") == "\"Dune\"")
    assert(q("$.store.books.filter(lambda b: b.price > 10).len()") == "2")
    assert(q("$.store.books.filter(not price > 10).len()") == "2")
  }

  test("maps: pluck, shorthand, computed") {
    assert(q("$.store.books.map(title)") == """["Dune","Foundation","Neuromancer","1984"]""")
    assert(q("$.store.books.map({title, price})[0]") == """{"title":"Dune","price":12.99}""")
  }

  test("aggregates: len, sum, sum(field), first/last, first(n), sort") {
    assert(q("$.store.books.len()") == "4")
    assert(q("$.nums.sum()", """{"nums": [1, 2, 3, 4]}""") == "10")
    assert(q("$.items.sum(v)", """{"items": [{"v": 1}, {"v": 2}, {"v": 3}]}""") == "6")
    assert(q("$.store.books.first().title") == "\"Dune\"")
    assert(q("$.store.books.last().title") == "\"1984\"")
    assert(q("$.store.books.first(2).map(title)") == """["Dune","Foundation"]""")
    assert(q("$.store.books.sort(price).map(title)[0]") == "\"1984\"")
    assert(q("$.store.books.sort(-price).map(title)[0]") == "\"Dune\"")
  }

  test("or / has / missing / compact") {
    assert(q("$.user.name.or(\"anon\")", """{"user": {}}""") == "\"anon\"")
    val u = """{"user": {"name": "Alice", "email": "a@b.com"}}"""
    assert(q("$.user.has(\"email\")", u) == "true")
    assert(q("$.user.has(\"phone\")", u) == "false")
    assert(q("$.user.missing(\"phone\")", """{"user": {"name": "Alice"}}""") == "true")
    assert(q("$.vals.compact()", """{"vals": [1, null, 2, null, 3]}""") == "[1,2,3]")
  }

  test("kind checks in filters") {
    assert(q("$.items.filter(v kind number)", """{"items": [{"v": 1}, {"v": "x"}, {"v": null}]}""")
      == """[{"v":1}]""")
    assert(q("$.items.filter(v kind not null)", """{"items": [{"v": 1}, {"v": null}]}""")
      == """[{"v":1}]""")
  }

  test("comprehensions: list, cond, dict, set") {
    assert(q("[b.title for b in $.store.books]") == """["Dune","Foundation","Neuromancer","1984"]""")
    assert(q("[b.title for b in $.store.books if b.price > 10]") == """["Dune","Neuromancer"]""")
    val users = """{"users": [{"id": "a1", "name": "Alice"}, {"id": "b2", "name": "Bob"}]}"""
    assert(q("{u.id: u.name for u in $.users}", users) == """{"a1":"Alice","b2":"Bob"}""")
    assert(q("{item.genre for item in $.items}.len()",
      """{"items": [{"genre": "sci-fi"}, {"genre": "sci-fi"}, {"genre": "dystopia"}]}""") == "2")
  }

  test("lambdas and lets") {
    assert(q("$.prices.map(lambda p: p * 2)", """{"prices": [10, 20, 30]}""") == "[20,40,60]")
    assert(q("let expensive = $.store.books.filter(price > 10) in expensive.len()") == "2")
    assert(q("let top = $.store.books.sort(-rating).first(2) in let titles = top.map(title) in titles")
      == """["Dune","1984"]""")
  }

  test("sequences: enumerate, pairwise, window, chunk, accumulate") {
    assert(q("$.items.enumerate()[0]", """{"items": ["a", "b", "c"]}""")
      == """{"index":0,"value":"a"}""")
    assert(q("$.vals.pairwise()", """{"vals": [1, 2, 3, 4]}""") == "[[1,2],[2,3],[3,4]]")
    assert(q("$.vals.window(3)", """{"vals": [1, 2, 3, 4, 5]}""") == "[[1,2,3],[2,3,4],[3,4,5]]")
    assert(q("$.vals.chunk(2)", """{"vals": [1, 2, 3, 4, 5]}""") == "[[1,2],[3,4],[5]]")
    assert(q("$.vals.accumulate(lambda acc, x: acc + x)", """{"vals": [1, 2, 3, 4]}""") == "[1,3,6,10]")
  }

  test("partition keys are true/false") {
    val out = q("$.nums.partition(lambda n: n % 2 == 0)", """{"nums": [1, 2, 3, 4, 5, 6]}""")
    assert(out == """{"true":[2,4,6],"false":[1,3,5]}""")
  }

  test("takewhile / dropwhile aliases and fusions") {
    val vals = """{"vals": [1, 2, 3, 4, 5]}"""
    assert(q("$.vals.takewhile(lambda v: v < 4)", vals) == "[1,2,3]")
    assert(q("$.vals.dropwhile(lambda v: v < 3)", vals) == "[3,4,5]")
    assert(q("$.vals.filter(lambda v: v > 1).dropwhile(lambda v: v < 4)",
      """{"vals": [1, 2, 3, 4, 5, 6]}""") == "[4,5,6]")
    assert(q("$.xs.map(lambda v: v * 2).unique()", """{"xs": [1, 2, 2, 3, 3, 3]}""") == "[2,4,6]")
  }

  test("globals: coalesce, chain, zip, product, range") {
    val d = """{"a": null, "b": null, "c": 42}"""
    assert(q("coalesce($.a, $.b, $.c)", d) == "42")
    assert(q("coalesce($.a, $.b, 99)", d) == "99")
    assert(q("chain($.a, $.b)", """{"a": [1, 2], "b": [3, 4]}""") == "[1,2,3,4]")
    assert(q("zip($.a, $.b)", """{"a": [1, 2, 3], "b": ["x", "y", "z"]}""")
      == """[[1,"x"],[2,"y"],[3,"z"]]""")
    assert(q("product($.colors, $.sizes).len()",
      """{"colors": ["red", "blue"], "sizes": ["S", "M"]}""") == "4")
    assert(q("range(4)", "{}") == "[0,1,2,3]")
    assert(q("range(2, 5)", "{}") == "[2,3,4]")
    assert(q("range(10, 0, -3)", "{}") == "[10,7,4,1]")
  }

  test("object construction with nesting and omit-if-null") {
    assert(q("{total: $.store.books.sum(price), count: $.store.books.len()}.count") == "4")
    val d = """{"books": [{"t":"x"},{"t":"y"}], "another": {"field": 42}, "deep": {"a": {"b": {"c": "leaf"}}}}"""
    assert(q("{a: $.books, b: {c: $.another.field}}", d)
      == """{"a":[{"t":"x"},{"t":"y"}],"b":{"c":42}}""")
    assert(q("{x: {y: {z: $.deep.a.b.c, arr: [1, $.another.field, {w: $.books[0].t}]}}}", d)
      == """{"x":{"y":{"z":"leaf","arr":[1,42,{"w":"x"}]}}}""")
    assert(q("{name: $.user.name, email?: $.user.email}", """{"user": {"name": "Alice"}}""")
      == """{"name":"Alice"}""")
  }

  test("pipes and ?| null-coalesce operator") {
    assert(q("$.store.books | len") == "4")
    assert(q("(b.price for b in $.store.books if b.price > 10) | len") == "2")
    assert(q("$.a ?| $.b", """{"a": null, "b": 42}""") == "42")
    assert(q("$.a ?| $.b", """{"a": 1, "b": 99}""") == "1")
    assert(q("$.a ?| $.b ?| $.c", """{"a": null, "b": null, "c": "found"}""") == "\"found\"")
  }

  test("binds: name, object destructure, rest, array destructure") {
    assert(q("$.store.books -> books | {count: books.len(), first: books[0].title}")
      == """{"count":4,"first":"Dune"}""")
    assert(q("$.user -> {name, age} | {greeting: name, years: age}",
      """{"user": {"name": "Alice", "age": 30, "role": "admin"}}""")
      == """{"greeting":"Alice","years":30}""")
    assert(q("$.obj -> {a, ...rest} | rest.len()", """{"obj": {"a": 1, "b": 2, "c": 3}}""") == "2")
    assert(q("$.nums -> [x, y, z] | x + y + z", """{"nums": [10, 20, 30]}""") == "60")
  }

  test("spreads") {
    assert(q("{...$.base, ...$.extra}", """{"base": {"a": 1, "b": 2}, "extra": {"c": 3}}""")
      == """{"a":1,"b":2,"c":3}""")
    assert(q("{...$.base, b: 99}", """{"base": {"a": 1, "b": 2}}""") == """{"a":1,"b":99}""")
    assert(q("[...$.a, ...$.b]", """{"a": [1, 2], "b": [3, 4]}""") == "[1,2,3,4]")
    assert(q("[1, ...$.items, 4]", """{"items": [2, 3]}""") == "[1,2,3,4]")
  }

  test("f-strings") {
    assert(q("f\"Hello {$.user.name}!\"", """{"user": {"name": "Alice", "age": 30}}""")
      == "\"Hello Alice!\"")
    assert(q("f\"{$.user.name} scored {$.user.score}\"", """{"user": {"name": "Bob", "score": 95}}""")
      == "\"Bob scored 95\"")
    assert(q("f\"Hello {$.name|upper}!\"", """{"name": "alice"}""") == "\"Hello ALICE!\"")
  }

  test("string semantics: trim family, pads, replace, split, index_of") {
    assert(q("$.s.trim()", """{"s": "  hello  "}""") == "\"hello\"")
    assert(q("$.s.trim_left()", """{"s": "  hello  "}""") == "\"hello  \"")
    assert(q("$.s.trim_right()", """{"s": "  hello  "}""") == "\"  hello\"")
    assert(q("$.s.pad_left(5)", """{"s": "hi"}""") == "\"   hi\"")
    assert(q("$.s.pad_right(5)", """{"s": "hi"}""") == "\"hi   \"")
    assert(q("$.s.pad_left(5, \"0\")", """{"s": "hi"}""") == "\"000hi\"")
    assert(q("$.s.replace(\"foo\", \"bar\")", """{"s": "foo foo foo"}""") == "\"bar foo foo\"")
    assert(q("$.s.replace_all(\"foo\", \"bar\")", """{"s": "foo foo foo"}""") == "\"bar bar bar\"")
    assert(q("$.s.split(\",\")", """{"s": "a,b,c"}""") == """["a","b","c"]""")
    assert(q("$.s.index_of(\"world\")", """{"s": "hello world"}""") == "6")
    assert(q("$.s.index_of(\"xyz\")", """{"s": "hello world"}""") == "-1") // miss → -1
    assert(q("$.s.slice(1, 4)", """{"s": "hello"}""") == "\"ell\"")
    assert(q("$.s.slice(2)", """{"s": "hello"}""") == "\"llo\"")
    assert(q("$.s.repeat(3)", """{"s": "ab"}""") == "\"ababab\"")
    assert(q("$.s.strip_prefix(\"foo\")", """{"s": "foobar"}""") == "\"bar\"")
    assert(q("$.s.strip_suffix(\"bar\")", """{"s": "foobar"}""") == "\"foo\"")
  }

  test("string semantics: to_number is int-first, strict to_bool, is_numeric digits") {
    assert(q("$.s.to_number()", """{"s": "42"}""") == "42")        // Int, not 42.0
    assert(q("$.s.to_number()", """{"s": "4.5"}""") == "4.5")
    assert(q("$.s.parse_int()", """{"s": "4.5"}""") == "null")     // strict i64
    assert(q("$.s.to_bool()", """{"s": "true"}""") == "true")
    assert(q("$.s.to_bool()", """{"s": "yes"}""") == "null")       // strict
    assert(q("$.s.parse_bool()", """{"s": "on"}""") == "true")     // lenient
    assert(q("$.s.is_numeric()", """{"s": "123"}""") == "true")
    assert(q("$.s.is_numeric()", """{"s": "1.5"}""") == "false")   // digits only
  }

  test("string semantics: matches and scan are literal") {
    assert(q("$.s.matches(\"wor\")", """{"s": "hello world"}""") == "true")
    assert(q("$.s.scan(\"o\")", """{"s": "foo boo"}""") == """["o","o","o","o"]""")
    assert(q("$.s.scan(\"aa\")", """{"s": "aaaa"}""") == """["aa","aa"]""") // non-overlapping
    assert(q("$.s.html_escape()", """{"s": "<b>Hello & World</b>"}""")
      == "\"&lt;b&gt;Hello &amp; World&lt;/b&gt;\"")
    assert(q("$.s.lines()", """{"s": "a b\nc d"}""") == """["a b","c d"]""")
    assert(q("$.s.words()", """{"s": "a b\nc d"}""") == """["a","b","c","d"]""")
    assert(q("$.s.capitalize()", """{"s": "hello world"}""") == "\"Hello world\"")
    assert(q("$.s.title_case()", """{"s": "hello world"}""") == "\"Hello World\"")
  }

  test("case conversion boundary semantics match the reference splitter") {
    // digits don't arm a camel boundary (helpers.rs:28: prev_lower = is_lowercase)
    assert(q("$.s.snake_case()", """{"s": "v2Engine"}""") == "\"v2engine\"")
    assert(q("$.s.snake_case()", """{"s": "parseHTTPResponse"}""") == "\"parse_httpresponse\"")
    assert(q("$.s.camel_case()", """{"s": "user-profile_image Name"}""") == "\"userProfileImageName\"")
    assert(q("$.s.pascal_case()", """{"s": "hello world"}""") == "\"HelloWorld\"")
    // title_case preserves whitespace runs
    assert(q("$.s.title_case()", """{"s": "a  b\tc"}""") == "\"A  B\\tC\"")
    // capitalize lowercases the remainder
    assert(q("$.s.capitalize()", """{"s": "hello WORLD"}""") == "\"Hello world\"")
    // dedent counts any leading whitespace and keeps relative indents
    assert(q("$.s.dedent()", """{"s": "  a\n    b\n  c"}""") == "\"a\\n  b\\nc\"")
  }

  test("pick with string selectors") {
    assert(q("$.user.pick(\"name\", \"age\")",
      """{"user": {"name": "Alice", "age": 30, "password": "secret"}}""")
      == """{"name":"Alice","age":30}""")
  }
}
