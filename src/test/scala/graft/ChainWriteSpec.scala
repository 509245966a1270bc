package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.jexpr._

/** Port of the reference's chain-write/patch suite
  * (/root/reference/jetro-core/src/tests/chain_write.rs) — patch blocks,
  * DELETE, wildcards, conditional writes, and patch composition inside
  * the expression language.
  */
class ChainWriteSpec extends AnyFunSuite {

  private def q(expr: String, doc: String): String = Jetro.collect(doc, expr)

  test("patch: replace, nested replace, delete, add") {
    assert(q("""patch $ { name: "Bob" }""", """{"name": "Alice", "age": 30}""")
      == """{"name":"Bob","age":30}""")
    assert(q("""patch $ { user.name: "Bob" }""", """{"user": {"name": "Alice", "age": 30}}""")
      == """{"user":{"name":"Bob","age":30}}""")
    assert(q("patch $ { tmp: DELETE }", """{"name": "Alice", "tmp": "x", "age": 30}""")
      == """{"name":"Alice","age":30}""")
    assert(q("patch $ { age: 42 }", """{"name": "Alice"}""")
      == """{"name":"Alice","age":42}""")
  }

  test("patch: wildcard, filtered wildcard, @ leaf binding") {
    assert(q("patch $ { users[*].seen: true }",
      """{"users": [{"name": "Alice", "seen": false}, {"name": "Bob", "seen": false}]}""")
      == """{"users":[{"name":"Alice","seen":true},{"name":"Bob","seen":true}]}""")
    assert(q("""patch $ { users[* if active].role: "admin" }""",
      """{"users": [{"name": "A", "active": true, "role": "user"}, {"name": "B", "active": false, "role": "user"}]}""")
      == """{"users":[{"name":"A","active":true,"role":"admin"},{"name":"B","active":false,"role":"user"}]}""")
    assert(q("patch $ { users[*].email: @.lower() }",
      """{"users": [{"email": "ALICE@X"}, {"email": "BOB@X"}]}""")
      == """{"users":[{"email":"alice@x"},{"email":"bob@x"}]}""")
  }

  test("patch: conditional when, multiple ops, index, wildcard delete") {
    assert(q("patch $ { count: @ + 1 when $.enabled }", """{"count": 5, "enabled": true}""")
      == """{"count":6,"enabled":true}""")
    assert(q("patch $ { count: @ + 1 when $.enabled }", """{"count": 5, "enabled": false}""")
      == """{"count":5,"enabled":false}""")
    assert(q("patch $ { a: 10, b: DELETE, c: 30 }", """{"a": 1, "b": 2, "c": 3}""")
      == """{"a":10,"c":30}""")
    assert(q("patch $ { items[1]: 99 }", """{"items": [10, 20, 30]}""")
      == """{"items":[10,99,30]}""")
    assert(q("patch $ { users[* if not active]: DELETE }",
      """{"users": [{"n": "A", "active": true}, {"n": "B", "active": false}]}""")
      == """{"users":[{"n":"A","active":true}]}""")
  }

  test("patch composes: pipe, method chain, object, let, nested patch, map") {
    val d = """{"name": "Alice", "age": 30}"""
    assert(q("""patch $ { name: "Bob" } | @.name""", d) == "\"Bob\"")
    assert(q("""patch $ { name: "Bob" }.keys().sort()""", d) == """["age","name"]""")
    assert(q("""{result: patch $ { name: "Bob" }}""", """{"name": "Alice"}""")
      == """{"result":{"name":"Bob"}}""")
    assert(q("""let x = patch $ { name: "Bob" } in x.name""", d) == "\"Bob\"")
    assert(q("""patch (patch $ { name: "Bob" }) { age: 99 }""", d)
      == """{"name":"Bob","age":99}""")
    assert(q("$.users.map(patch @ { n: @ * 10 })", """{"users": [{"n": 1}, {"n": 2}, {"n": 3}]}""")
      == """[{"n":10},{"n":20},{"n":30}]""")
  }

  test("batched patches: disjoint, sibling, array index, delete+replace, synthesis") {
    assert(q("patch $ { a: 1, b: 2, c: 3 }", """{"a": 0, "b": 0, "c": 0, "d": 0}""")
      == """{"a":1,"b":2,"c":3,"d":0}""")
    assert(q("""patch $ { user.name: "alice", user.role: "admin" }""",
      """{"user": {"name": "?", "role": "?"}}""")
      == """{"user":{"name":"alice","role":"admin"}}""")
    assert(q("patch $ { items[0]: 10, items[1]: 20 }", """{"items": [0, 0, 0]}""")
      == """{"items":[10,20,0]}""")
    assert(q("patch $ { a: DELETE, b: 1 }", """{"a": 0, "b": 0}""") == """{"b":1}""")
    assert(q("""patch $ { meta.role: "admin", meta.active: true }""", """{"name": "Alice"}""")
      == """{"name":"Alice","meta":{"role":"admin","active":true}}""")
    assert(q("patch $ { a: @ + 1, b: @ * 2 }", """{"a": 5, "b": 10}""")
      == """{"a":6,"b":20}""")
  }

  test("tier1 chain-writes: subtree set, descendant set/delete, dynamic index, merge, lambda modify") {
    assert(q("""$.a.b.set({x: 42})""", """{"a": {"b": {"c": 1}}}""")
      == """{"a":{"b":{"x":42}}}""")
    assert(q("""$..id.delete()""", """{"a": {"id": 1, "b": {"id": 2, "c": {"id": 3}}}}""")
      == """{"a":{"b":{"c":{}}}}""")
    assert(q("""$.xs[$.i].set(99)""", """{"xs": [10, 20, 30, 40], "i": 2}""")
      == """{"xs":[10,20,99,40],"i":2}""")
    assert(q("""$.config.merge({port: 443, tls: true})""",
      """{"config": {"host": "a", "port": 80}}""")
      == """{"config":{"host":"a","port":443,"tls":true}}""")
    assert(q("""$.a.deep_merge({b: {y: 2}})""", """{"a": {"b": {"x": 1}}}""")
      == """{"a":{"b":{"x":1,"y":2}}}""")
    assert(q("""$.counts.n.modify(lambda x: x * 3)""", """{"counts": {"n": 5}}""")
      == """{"counts":{"n":15}}""")
    assert(q("""$.user.unset("age")""", """{"user": {"name": "Alice", "age": 30}}""")
      == """{"user":{"name":"Alice"}}""")
    // descendant set hits every matching key
    assert(q("""$..status.set("closed")""",
      """{"t": [{"status": "open"}, {"x": {"status": "open"}}]}""")
      == """{"t":[{"status":"closed"},{"x":{"status":"closed"}}]}""")
  }

  test("conditional ops against pre-patch state") {
    assert(q("""patch $ { active: true when $.role == "admin", banned: true when $.id < 0 }""",
      """{"role": "admin", "id": 7}""")
      == """{"role":"admin","id":7,"active":true}""")
  }
}
