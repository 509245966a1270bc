package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.jexpr._

/** Port of the reference's integration suite
  * (/root/reference/jetro-core/tests/complex_payload.rs): a 2,000-order ×
  * 6-item synthetic e-commerce document, with every query's expectation
  * computed independently in plain Scala — the same native-oracle
  * differential style the reference uses (native Rust vs engine).
  */
class ComplexPayloadSpec extends AnyFunSuite {

  private val N = 2000
  private val ItemsPer = 6

  private val regions = Vector("us-east", "us-west", "eu-central", "ap-southeast", "sa-south")
  private val statuses = Vector("pending", "shipped", "delivered", "cancelled", "refunded")
  private val priorities = Vector("low", "normal", "high", "urgent")
  private val cities = Vector("Tokyo", "Berlin", "São Paulo", "Nairobi", "Austin", "Toronto")
  private val countries = Vector("JP", "DE", "BR", "KE", "US", "CA")

  // Native model rows for oracle computation (complex_payload.rs:13-67).
  private case class Item(sku: String, price: Double, qty: Long)
  private case class Order(id: Long, status: String, priority: String, region: String,
                           total: Double, custId: Long, city: String, cc: String,
                           items: Vector[Item])

  private val orders: Vector[Order] = (0 until N).toVector.map { i =>
    val items = (0 until ItemsPer).toVector.map { j =>
      Item(f"SKU-${(i * ItemsPer + j) % 9973}%05d", ((i * 7 + j * 13) % 500) + 9.99, ((i + j) % 5 + 1).toLong)
    }
    val total = math.round(items.map(it => it.price * it.qty).sum * 100.0) / 100.0
    Order(100000L + i, statuses(i % 5), priorities((i / 3) % 4), regions(i % 5),
      total, 10000L + (i % 500), cities(i % 6), countries(i % 6), items)
  }

  private val doc: JValue = JObj.of(
    "orders" -> JArr(orders.map { o =>
      JObj.of(
        "id" -> JInt(o.id), "status" -> JStr(o.status), "priority" -> JStr(o.priority),
        "region" -> JStr(o.region), "total" -> JFloat(o.total),
        "customer" -> JObj.of(
          "id" -> JInt(o.custId), "name" -> JStr(s"Customer ${o.custId - 10000}"),
          "address" -> JObj.of("city" -> JStr(o.city), "country_code" -> JStr(o.cc))),
        "items" -> JArr(o.items.map(it => JObj.of(
          "sku" -> JStr(it.sku), "name" -> JStr("item"),
          "price" -> JFloat(it.price), "qty" -> JInt(it.qty)))))
    }),
    "meta" -> JObj.of("kind" -> JStr("complex_payload")))

  private def run(expr: String): JValue = Jetro.compile(expr).evalValue(doc)

  private def arr(v: JValue): Vector[JValue] = v match {
    case JArr(xs) => xs
    case other    => fail(s"expected array, got ${other.kind}")
  }

  test("q1 project nested field") {
    val out = arr(run("$.orders.map(customer.address.city)"))
    assert(out.length == N)
    assert(out.forall { case JStr(s) => cities.contains(s); case _ => false })
  }

  test("q2 project then unique") {
    assert(arr(run("$.orders.map(customer.address.country_code).unique()")).length == 6)
  }

  test("q3 filter then map id") {
    val out = arr(run("$.orders.filter(total > 500).map(id)"))
    val naive = orders.count(_.total > 500)
    assert(out.length == naive && naive > 0)
    assert(out.forall(_.isInstanceOf[JInt]))
  }

  test("q4 multi-cond filter count matches naive") {
    val naive = orders.count(o => o.status == "shipped" && o.priority == "high")
    assert(run("""$.orders.filter(status == "shipped" and priority == "high").count()""") == JInt(naive))
  }

  test("q5-q7 deep find predicates") {
    val shipped = orders.count(_.status == "shipped")
    assert(arr(run("""$..find(@.status == "shipped")""")).length == shipped)
    val sku42 = orders.flatMap(_.items).count(_.sku == "SKU-00042") // hits only item objects
    assert(arr(run("""$..find(@.sku == "SKU-00042")""")).length == sku42 && sku42 > 0)
    val both = orders.count(o => o.status == "shipped" && o.priority == "urgent")
    assert(arr(run("""$..find(@.status == "shipped", @.priority == "urgent")""")).length == both)
  }

  test("q8 deep key sum matches naive") {
    val naive = orders.map(_.total).sum
    val got = JValue.asNum(run("$..total.sum()")).get
    assert(math.abs(got - naive) < 1e-6)
  }

  test("q9 deep key extract sku count") {
    assert(arr(run("$..sku")).length == N * ItemsPer)
  }

  test("q10 group_by status partitions all rows") {
    run("$.orders.group_by(status)") match {
      case JObj(fs) =>
        assert(fs.size == 5)
        assert(fs.valuesIterator.map { case JArr(b) => b.length; case _ => 0 }.sum == N)
      case other => fail(s"expected object, got ${other.kind}")
    }
  }

  test("q11 count_by region") {
    run("$.orders.count_by(region)") match {
      case JObj(fs) =>
        assert(fs.size == 5)
        assert(fs.valuesIterator.map { case JInt(n) => n; case _ => 0L }.sum == N)
        regions.foreach(r => assert(fs(r) == JInt(orders.count(_.region == r))))
      case other => fail(s"expected object, got ${other.kind}")
    }
  }

  test("q12/q15 sum and max match naive") {
    val naive = orders.map(_.total).sum
    assert(math.abs(JValue.asNum(run("$.orders.map(total).sum()")).get - naive) < 1e-3)
    val naiveMax = orders.map(_.total).max
    assert(math.abs(JValue.asNum(run("$.orders.map(total).max()")).get - naiveMax) < 1e-9)
  }

  test("q13 list comprehension ≡ filter+map") {
    assert(run("[o.id for o in $.orders if o.total > 1000]")
      == run("$.orders.filter(total > 1000).map(id)"))
  }

  test("q14 pick projects and renames") {
    val out = arr(run("$.orders.map(customer).pick(uid: id, who: name)"))
    assert(out.length == N)
    out.head match {
      case JObj(fs) => assert(fs.keySet == Set("uid", "who"))
      case other    => fail(s"expected object, got ${other.kind}")
    }
  }

  test("q16 chain-write set replaces one leaf object") {
    val out = run("""$.orders[0].customer.address.set({"city": "Remote", "zip": "00000"})""")
    def city(i: Int) = Jetro.compile(s"$$.orders[$i].customer.address.city").evalValue(out)
    assert(city(0) == JStr("Remote"))
    assert(city(1) != JStr("Remote"))
  }

  test("q17 chain-write modify doubles nested numeric") {
    val before = orders.head.total
    val out = run("$.orders[0].total.modify(@ * 2)")
    val after = JValue.asNum(Jetro.compile("$.orders[0].total").evalValue(out)).get
    assert(math.abs(after - before * 2) < 1e-6)
  }

  test("q18 chain-write set on array element is element-local") {
    val out = run("$.orders[0].items[0].price.set(0)")
    assert(Jetro.compile("$.orders[0].items[0].price").evalValue(out) == JInt(0))
    assert(Jetro.compile("$.orders[0].items[1].price").evalValue(out) != JInt(0))
  }

  test("chain-write wildcard modify, filtered delete, unset") {
    val out = run("$.orders[*].total.modify(@ * 0.5)")
    val got = JValue.asNum(Jetro.compile("$.orders.map(total).sum()").evalValue(out)).get
    assert(math.abs(got - orders.map(_.total).sum / 2) < 1e-3)

    val pruned = run("""$.orders[* if status == "cancelled"].delete()""")
    assert(Jetro.compile("$.orders.count()").evalValue(pruned)
      == JInt(orders.count(_.status != "cancelled")))

    val anon = run("$.orders[*].customer.unset(name)")
    assert(Jetro.compile("""$.orders.filter(customer.has("name")).count()""").evalValue(anon) == JInt(0))
  }

  test("pipe-form set keeps v1 semantics (returns the value)") {
    assert(run("$.orders[0].total | set(7)") == JInt(7))
  }

  test("find/filter count fusion and min/max agree with unfused") {
    assert(run("""$.orders.find(status == "shipped").count()""")
      == run("""$.orders.filter(status == "shipped").count()"""))
    val shipped = orders.filter(_.status == "shipped").map(_.total)
    assert(math.abs(JValue.asNum(run("""$.orders.filter(status == "shipped").map(total).min()""")).get - shipped.min) < 1e-9)
    assert(math.abs(JValue.asNum(run("""$.orders.filter(status == "shipped").map(total).max()""")).get - shipped.max) < 1e-9)
  }

  test("deep find numeric ranges match naive") {
    assert(arr(run("$..find(@.total > 500)")).length == orders.count(_.total > 500))
    assert(arr(run("$..find(@.total >= 500)")).length == orders.count(_.total >= 500))
    val qtyLt3 = orders.flatMap(_.items).count(_.qty < 3)
    assert(arr(run("$..find(@.qty < 3)")).length == qtyLt3)
    assert(arr(run("$..find(500 < @.total)")).length == orders.count(_.total > 500))
  }
}
