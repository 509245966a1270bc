package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.jexpr._

/** Port of the reference's write-fusion soundness suites
  * (/root/reference/jetro-core/src/tests/patch_fusion_soundness.rs,
  * patch_fusion_phase_c.rs, patch_fusion_phase_e.rs) — the seven
  * soundness invariants of batched patches: read-after-write coherence,
  * write atomicity/ordering, scope isolation, read-flush boundaries,
  * conditional ops, aliased lets, self-referential modify. The
  * reference uses these to guard its fusion optimizer; here they pin
  * the interpreter's semantics (we have no fusion pass to mis-order
  * writes, but the SAME observable contract must hold).
  */
class PatchFusionSpec extends AnyFunSuite {

  private def q(expr: String, doc: String): String = Jetro.collect(doc, expr)

  // ── invariant 1: read-after-write coherence ─────────────────────────

  test("read after pipe write sees new value") {
    assert(q("""$.a.set(99) | @.a""", """{"a": 1}""") == "99")
    assert(q("""$.x.set(100) | @.x + @.y""", """{"x": 10, "y": 20}""") == "120")
    assert(q("""let x = $.a.set(7) in x.a""", """{"a": 0}""") == "7")
  }

  // ── invariant 2: write atomicity / ordering per batch ───────────────

  test("two writes to the same path: last wins") {
    assert(q("""patch $ { k: 1, k: 2 }""", """{"k": 0}""") == """{"k":2}""")
  }

  test("modify after set reads the pre-batch value (locked weakening)") {
    // reference patch_fusion_soundness.rs:94-109: `@` inside a patch
    // value binds to the PRE-BATCH value at that path, not the value
    // an earlier op in the same patch just wrote. 1 + 5 = 6, not 15.
    assert(q("""patch $ { k: 10, k: @ + 5 }""", """{"k": 1}""") == """{"k":6}""")
  }

  test("rooted-chain patch target does NOT roll $ forward") {
    // `patch $.sub {...}` evaluates to the patched SUB-value, not the
    // whole document — a later pipe stage's `$` must still resolve
    // against the original root, not the sub-object.
    assert(q("""patch $.sub { k: 1 } | $.other""",
      """{"sub": {"k": 0}, "other": 42}""") == "42")
    // and the expression's own value is the patched sub-object
    assert(q("""patch $.sub { k: 1 }""",
      """{"sub": {"k": 0}, "other": 42}""") == """{"k":1}""")
  }

  test("three chained sets apply in order") {
    assert(q("""$.a.set(1) | $.b.set(2) | $.c.set(3)""", "{}")
      == """{"a":1,"b":2,"c":3}""")
  }

  test("sibling sets in one batch share the parent") {
    assert(q("""patch $ { user.a: 1, user.b: 2 }""",
      """{"user": {"a": 0, "b": 0}}""")
      == """{"user":{"a":1,"b":2}}""")
  }

  // ── invariant 3: scope isolation ────────────────────────────────────

  test("lambda writes don't leak to outer scope") {
    // non-rooted chain-write keeps method-call semantics: returns rhs
    assert(q("""$.list.map(lambda o: o.id.set(99))""",
      """{"list": [{"id": 1}, {"id": 2}]}""") == "[99,99]")
  }

  test("comprehension per-iter bindings are isolated") {
    assert(q("""[x.n + 10 for x in $.list]""",
      """{"list": [{"n": 1}, {"n": 2}, {"n": 3}]}""") == "[11,12,13]")
  }

  test("nested lambda currents are distinct") {
    assert(q("""$.groups.map(lambda g: g.map(lambda x: x + 10))""",
      """{"groups": [[1, 2], [3, 4]]}""") == "[[11,12],[13,14]]")
  }

  // ── invariant 4: no reorder across reads ────────────────────────────

  test("write then read then write: final write lands") {
    val r = q("""$.a.set(10) | $.a + 100 | $.b.set(@)""", """{"a": 5}""")
    assert(r.contains("\"b\""), r)
  }

  test("read after write through pipe sees intermediate state") {
    assert(q("""$.b.set($.a + 100) | @.b""", """{"a": 1, "b": 0}""") == "101")
  }

  // ── invariant 5: conditional ops ────────────────────────────────────

  test("when guard fires on truthy, skips on falsy") {
    assert(q("""patch $ { active: true when $.role == "admin" }""",
      """{"role": "admin", "active": false}""")
      == """{"role":"admin","active":true}""")
    assert(q("""patch $ { active: true when $.role == "admin" }""",
      """{"role": "user", "active": false}""")
      == """{"role":"user","active":false}""")
  }

  test("when guard reads pre-batch state (locked weakening)") {
    // reference patch_fusion_soundness.rs:224-243: the guard's `$.id`
    // evaluates against the PRE-BATCH doc (id == 0), so even though id
    // is set to 7 first in source order, the conditional skips.
    assert(q("""patch $ { id: 7, flag: true when $.id > 5 }""",
      """{"id": 0, "flag": false}""")
      == """{"id":7,"flag":false}""")
  }

  // ── invariant 6: aliased lets ───────────────────────────────────────

  test("let aliases of root resolve for reads and patches") {
    assert(q("""let x = $ in let y = x in y.a""", """{"a": 99}""") == "99")
    assert(q("""let x = $ in let y = x in patch y { c: 3 }""", """{"a": 1}""")
      == """{"a":1,"c":3}""")
    assert(q("""let x = $ in let y = x in let z = y in patch z { c: 3 }""",
      """{"a": 1}""") == """{"a":1,"c":3}""")
    assert(q(
      """let a = $ in let b = a in let c = b in let d = c in let e = d in e.v""",
      """{"v": 7}""") == "7")
  }

  test("let init write + root write in body both land") {
    assert(q("""let x = $.a.set(1) in x.b.set(2)""", "{}")
      == """{"a":1,"b":2}""")
    assert(q("""let x = $.a.set(1) in $.b.set(2)""", "{}")
      == """{"a":1,"b":2}""")
    assert(q("""let x = $ in let y = x in $.a.set(1) | $.b.set(2)""", "{}")
      == """{"a":1,"b":2}""")
  }

  test("let alias to non-root local keeps method-call semantics") {
    // x.k.set(42) on a non-root base returns the rhs, not a patched doc
    assert(q("""let x = $.sub in x.k.set(42)""", """{"sub": {"k": 0}}""")
      == "42")
  }

  test("read of aliased local observes the init's write") {
    assert(q("""let x = $.a.set(42) in x.a""", """{"a": 0}""") == "42")
  }

  // ── invariant 7: self-referential modify ────────────────────────────

  test("modify binds @ to the pre-write value") {
    assert(q("""$.a.modify(@ + 1)""", """{"a": 5}""") == """{"a":6}""")
    assert(q("""$.a.modify(@ + $.a)""", """{"a": 5}""") == """{"a":10}""")
  }

  // ── scope-flush boundaries (phase C) ────────────────────────────────

  test("outer write flushes before a lambda/map runs") {
    assert(q("""$.added.set(true) | $.items.map(lambda x: x + 1)""",
      """{"items": [1, 2, 3]}""") == "[2,3,4]")
    assert(q("""$.touched.set(true) | [x.n + 1 for x in $.list]""",
      """{"list": [{"n": 10}, {"n": 20}, {"n": 30}]}""") == "[11,21,31]")
    assert(q("""$.tag.set("outer") | $.list.map(lambda o: o + 100)""",
      """{"list": [1, 2, 3], "tag": null}""") == "[101,102,103]")
    assert(q("""$.a.set(1) | $.list.map(lambda x: x + 100)""",
      """{"a": null, "list": [1, 2], "b": null}""") == "[101,102]")
  }

  test("branch scopes don't leak") {
    assert(q(""""then-result" if $.flag else "else-result"""",
      """{"flag": true}""") == "\"then-result\"")
    assert(q(""""then-result" if $.flag else "else-result"""",
      """{"flag": false}""") == "\"else-result\"")
    assert(q("""try $.missing.field else "fallback"""", "{}")
      == "\"fallback\"")
  }

  // ── lambda/comprehension body fusion shapes (phase E) ───────────────

  test("multi-write lambda bodies patch the binding") {
    assert(q("""$.users.map(lambda o: o.name.set("x") | o.score.set(1))""",
      """{"users": [{"name": "alice", "score": 0}, {"name": "bob", "score": 0}]}""")
      == """[{"name":"x","score":1},{"name":"x","score":1}]""")
    assert(q("""$.items.map(lambda o: o.a.set(1) | o.b.set(2) | o.c.set(3))""",
      """{"items": [{}, {}]}""")
      == """[{"a":1,"b":2,"c":3},{"a":1,"b":2,"c":3}]""")
    assert(q("""$.xs.map(lambda o: o.a.set(10) | o.b.set(20))""",
      """{"xs": [{"v": 1}, {"v": 2}]}""")
      == """[{"v":1,"a":10,"b":20},{"v":2,"a":10,"b":20}]""")
  }

  test("multi-write comprehension bodies patch the binding") {
    assert(q("""[o.id.set(o.id + 10) | o.tag.set("p") for o in $.list]""",
      """{"list": [{"id": 1}, {"id": 2}, {"id": 3}]}""")
      == """[{"id":11,"tag":"p"},{"id":12,"tag":"p"},{"id":13,"tag":"p"}]""")
  }

  test("single-write lambda/comprehension bodies keep v1 rhs semantics") {
    assert(q("""$.list.map(lambda o: o.id.set(99))""",
      """{"list": [{"id": 1}, {"id": 2}]}""") == "[99,99]")
    assert(q("""[o.v.set(100) for o in $.xs]""",
      """{"xs": [{"v": 1}, {"v": 2}]}""") == "[100,100]")
  }

  test("nested lambda multi-writes stay in the inner scope") {
    assert(q("""$.groups.map(lambda g: g.map(lambda x: x.a.set(10) | x.b.set(20)))""",
      """{"groups": [[{"v": 1}], [{"v": 2}]]}""")
      == """[[{"v":1,"a":10,"b":20}],[{"v":2,"a":10,"b":20}]]""")
  }

  // ── stress / structural integrity ───────────────────────────────────

  test("many disjoint writes in one patch all land") {
    val ops = (0 until 50).map(i => s"k$i: ${i * 2}").mkString(", ")
    val r = JValue.parse(q(s"patch $$ { $ops }", "{}"))
    (0 until 50).foreach { i =>
      assert(JValue.asNum(Interp.fieldOf(r, s"k$i")).get.toLong == i * 2L)
    }
  }

  test("deep nested sibling writes share the prefix") {
    assert(q("""$.a.b.c.d.e.f.g.set(1) | $.a.b.c.d.e.f.h.set(2)""", "{}")
      == """{"a":{"b":{"c":{"d":{"e":{"f":{"g":1,"h":2}}}}}}}""")
  }

  test("same array index written three times: last wins") {
    assert(q("""patch $ { items[0]: 10, items[0]: 20, items[0]: 30 }""",
      """{"items": [0, 0, 0]}""") == """{"items":[30,0,0]}""")
  }

  test("untouched sibling subtree stays intact") {
    val r = q("""patch $ { touched.x: 99 }""",
      """{"touched": {"x": 0}, "untouched": {"deep": {"list": [1, 2, 3]}}}""")
    assert(r == """{"touched":{"x":99},"untouched":{"deep":{"list":[1,2,3]}}}""")
  }

  test("mixed set / DELETE / modify in one patch apply in order") {
    assert(q("""patch $ { keep: 100, drop: DELETE, bump: @ + 5 }""",
      """{"keep": 1, "drop": 2, "bump": 10}""")
      == """{"keep":100,"bump":15}""")
  }

  test("comprehension over a written source sees post-write keys") {
    assert(q("""[x for x in ($.a.set(1) | $.b.set(2)).keys()]""", "{}")
      == """["a","b"]""")
  }
}
