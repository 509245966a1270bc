package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.jexpr._

/** Port of the reference's deep-search suite
  * (/root/reference/jetro-core/src/tests/deep_search.rs): recursive
  * descent `$..field`, descent chained into further steps, literal-eq
  * refinement filters, and multi-predicate find.
  */
class DeepSearchSpec extends AnyFunSuite {

  private def q(expr: String, doc: String): String = Jetro.collect(doc, expr)

  test("descendant scan is structure-aware (quoted text is not a key)") {
    val doc = """{"a":{"test":1},"b":[{"test":2},{"other":9},{"test":3}],"comment":"the \"test\": lie"}"""
    assert(q("$..test", doc) == "[1,2,3]")
  }

  test("descendant chains into aggregates") {
    assert(q("$..id.sum()", """{"users":[{"id":1,"name":"a"},{"id":2,"name":"b"},{"id":3,"name":"c"}]}""") == "6")
    assert(q("$..p.sum()", """{"rows":[{"p":10},{"p":20},{"p":30}]}""") == "60")
  }

  test("descendant + literal-eq refinement: int, string, bool, null") {
    assert(q("$..n.filter(@ == 42)", """{"xs":[{"n":10},{"n":42},{"n":10},{"n":42},{"n":7}]}""")
      == "[42,42]")
    assert(q("""$..type.filter(@ == "action")""",
      """{"events":[{"type":"action"},{"type":"idle"},{"type":"action"},{"type":"noop"}]}""")
      == """["action","action"]""")
    val vs = """{"xs":[{"v":true},{"v":false},{"v":true},{"v":null}]}"""
    assert(q("$..v.filter(@ == true)", vs) == "[true,true]")
    assert(q("$..v.filter(@ == null)", vs) == "[null]")
    assert(q("""$..kind.filter(@ == "a")""",
      """{"items":[{"kind":"a","children":[{"v":1},{"v":2}]},{"kind":"b","children":[{"v":3},{"v":4}]}]}""")
      == """["a"]""")
  }

  test("chained descendants with positional steps") {
    val doc = """{"outer":[{"inner":[{"leaf":1},{"leaf":2}]},{"inner":[{"leaf":3},{"leaf":4}]}]}"""
    assert(q("$..outer.first()..inner.first()..leaf", doc) == "[1,2]")
  }

  test("kvplan object shaping (tests/kvplan_obj_shaping.rs)") {
    val doc = """{"books": [{"title": "a", "price": 50}, {"title": "b", "price": 150}, {"title": "c", "price": 200}], "name": {"first": "alice"}}"""
    assert(q("""{expensive: $.books.filter(@.price > 100).map(@.title), first_name: $.name.first}""", doc)
      == """{"expensive":["b","c"],"first_name":"alice"}""")
    val items = (0 until 1000).map(i => s"""{"v": $i}""").mkString("[", ",", "]")
    assert(q("""{first_two: $.items.filter(@.v > 100).map(@.v).take(2)}""", s"""{"items": $items}""")
      == """{"first_two":[101,102]}""")
  }

  test("shallow find with one and many predicates") {
    val doc = """{"xs":[{"t":"a","v":1},{"t":"a","v":2},{"t":"b","v":1}]}"""
    assert(q("""$.xs.find(@.t == "a", @.v == 1)""", doc) == """[{"t":"a","v":1}]""")
    assert(q("$.xs.find(@.v == 2)", """{"xs":[{"v":1},{"v":2}]}""") == """[{"v":2}]""")
  }
}
