package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.jexpr._

/** Machine-extracted conformance corpus: every (expr, doc, expected)
  * triple from the reference's own test files whose assertion is an
  * exact-value `assert_eq!(r, json!(…))` — regression.rs, examples.rs
  * and chain_write.rs — replayed through `Jetro.collect` and compared
  * STRICTLY (JInt ≠ JFloat, so numeric kinds must match the reference
  * engine's, exactly as serde equality demands in the originals).
  * The extraction is mechanical (tools-free shapes only); looser
  * assertions (len, contains) and optimizer-internal tests are covered
  * by the hand-ported RegressionSpec / ExamplesSpec / ChainWriteSpec.
  */
class ReferenceCorpusSpec extends AnyFunSuite {

  private case class Case(name: String, doc: JValue, expr: String, expected: JValue)

  private val books = JValue.parse(
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
    }""")

  private val cases: Seq[Case] = {
    val raw = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/reference_cases.json"), "UTF-8").mkString
    val top = JValue.parse(raw).asInstanceOf[JObj].v
    val world = top("world")
    top("cases") match {
      case JArr(xs) => xs.map { c =>
        val o = c.asInstanceOf[JObj].v
        val doc = o("doc") match {
          case JStr("BOOKS") => books
          case JStr("WORLD") => world
          case d             => d
        }
        Case(o("name").asInstanceOf[JStr].v, doc,
          o("expr").asInstanceOf[JStr].v, o("expected"))
      }.toSeq
      case other => fail(s"bad corpus: ${other.kind}")
    }
  }

  test(s"corpus loaded (${cases.length} cases)") {
    assert(cases.length >= 175)
  }

  for (c <- cases) test(c.name) {
    val got = JValue.parse(Jetro.collect(c.doc.render, c.expr))
    assert(got == c.expected,
      s"\nexpr: ${c.expr}\n got: ${got.render}\nwant: ${c.expected.render}")
  }

  // The reference's equivalence assertions (regression.rs fusion_*_
  // semantics / alias tests): two surface forms must produce the same
  // value — fusion is an optimization, never a semantics change.
  private val equivalences: Seq[(String, String, String)] = Seq(
    ("""{"s":0}""", "$.store.books.filter(@.price > 10).first()",
      "$.store.books.filter(@.price > 10) | first()"),
    ("""{"xs": [3, 1, 2, 1, 3]}""", "$.xs.unique().unique()", "$.xs.unique()"),
    ("""{"s":0}""", "$.store.books.sort(price).min(price)", "$.store.books.min(price)"),
    ("""{"s":0}""", "$.store.books.reverse().max(price)", "$.store.books.max(price)"),
    ("""{"s":0}""", "$.store.books.map(@.price).sum()", "$.store.books.sum(price)"),
    ("""{"s":0}""", "$.store.books.map(@.price).avg()", "$.store.books.avg(price)"),
    ("""{"s":0}""", "$.store.books | count()", "$.store.books |> count()"),
    ("""{"a": null, "b": 5}""", "$.a ?| $.b", "$.a ?? $.b"),
    ("""{"x": 42}""", "$.x kind number", "$.x is number"),
    ("""{"x": 42}""", "$.x kind not number", "$.x is not number"),
    ("""{"user": {"name": "Bob"}}""", "$.user[\"name\"]", "$.user.{\"name\"}"),
    ("""{"s":0}""", "$.store.books.map({title})", "$.store.books[*] => {title}"),
    ("""{"s":0}""",
      "$.store.books.filter(price > 10).map({title, price})",
      "$.store.books[* if price > 10] => {title, price}"))

  test("a read stage ends the pipe write-chain: later @-writes are plain method calls") {
    // regression probe: after `| b` the piped value is a SUB-value, so
    // `@.x.set(2)` must be the builtin (returns its arg), NOT a patch,
    // and must never overwrite the rolled root document
    val doc = """{"a":0,"y":9,"b":{"x":5}}"""
    assert(Jetro.collect(doc, "$.a.set(1) | b | @.x.set(2) | $.y") == "9")
    assert(JValue.parse(Jetro.collect(doc, "$.a.set(1) | b | @.x.set(2) | $")) ==
      JValue.parse("""{"a":1,"y":9,"b":{"x":5}}"""))
    // while an UNBROKEN write pipeline still rolls through @-stages
    assert(JValue.parse(Jetro.collect("{}", "$.a.set(1) | @.b.set(2) | @.c.set(3)")) ==
      JValue.parse("""{"a":1,"b":2,"c":3}"""))
  }

  test("reference equivalence pairs: both forms agree") {
    for ((d, ea, eb) <- equivalences) {
      val doc = if (d == """{"s":0}""") books.render else d
      val a = JValue.parse(Jetro.collect(doc, ea))
      val b = JValue.parse(Jetro.collect(doc, eb))
      assert(a == b, s"$ea  vs  $eb: ${a.render} != ${b.render}")
    }
  }
}
