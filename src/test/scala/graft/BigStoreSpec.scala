package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.jexpr._

/** Port of the reference's `optimized_*` end-to-end suite
  * (regression.rs:2125-2360) over its 20-book `big_store` fixture —
  * the fusion-pipeline stress queries, replayed with the reference's
  * own (sometimes loose) assertions. These complement the exact-value
  * conformance corpus: the queries are the reference's hardest chains
  * (multi-map fusion, let-CSE, group-reshape, comprehension+f-string),
  * asserted exactly as the reference asserts them. */
class BigStoreSpec extends AnyFunSuite {

  private def b(id: Int, title: String, price: Double, rating: Double,
                genre: String, tags: Seq[String], author: String,
                born: Int, pages: Int): String =
    s"""{"id":$id,"title":"$title","price":$price,"rating":$rating,""" +
      s""""genre":"$genre","tags":[${tags.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""author":{"name":"$author","born":$born},"pages":$pages}"""

  private val doc = s"""{"store":{"books":[
    ${b(1, "Dune", 12.99, 4.8, "sci-fi", Seq("sci-fi", "classic"), "Frank Herbert", 1920, 688)},
    ${b(2, "Foundation", 9.99, 4.5, "sci-fi", Seq("sci-fi", "series"), "Isaac Asimov", 1920, 255)},
    ${b(3, "Neuromancer", 11.50, 4.2, "cyberpunk", Seq("sci-fi", "cyberpunk"), "William Gibson", 1948, 271)},
    ${b(4, "1984", 7.99, 4.6, "dystopia", Seq("classic", "dystopia"), "George Orwell", 1903, 328)},
    ${b(5, "Brave New World", 8.50, 4.3, "dystopia", Seq("classic", "dystopia"), "Aldous Huxley", 1894, 311)},
    ${b(6, "Hyperion", 13.25, 4.7, "sci-fi", Seq("sci-fi", "epic"), "Dan Simmons", 1948, 482)},
    ${b(7, "Snow Crash", 10.50, 4.1, "cyberpunk", Seq("sci-fi", "cyberpunk"), "Neal Stephenson", 1959, 470)},
    ${b(8, "Fahrenheit 451", 6.99, 4.4, "dystopia", Seq("classic", "dystopia"), "Ray Bradbury", 1920, 249)},
    ${b(9, "Ender's Game", 8.75, 4.6, "sci-fi", Seq("sci-fi", "military"), "Orson Scott Card", 1951, 324)},
    ${b(10, "The Left Hand", 9.25, 4.2, "sci-fi", Seq("sci-fi", "feminist"), "Ursula K. Le Guin", 1929, 304)},
    ${b(11, "A Scanner Darkly", 8.00, 4.0, "sci-fi", Seq("sci-fi", "philosophy"), "Philip K. Dick", 1928, 280)},
    ${b(12, "Gateway", 7.50, 4.1, "sci-fi", Seq("sci-fi", "classic"), "Frederik Pohl", 1919, 313)},
    ${b(13, "Stranger", 9.00, 4.3, "sci-fi", Seq("sci-fi", "classic"), "Robert Heinlein", 1907, 438)},
    ${b(14, "Rendezvous", 10.00, 4.5, "sci-fi", Seq("sci-fi", "classic"), "Arthur C. Clarke", 1917, 304)},
    ${b(15, "Solaris", 8.25, 4.2, "sci-fi", Seq("sci-fi", "philosophy"), "Stanisław Lem", 1921, 204)},
    ${b(16, "The Road", 9.75, 4.4, "dystopia", Seq("literary", "dystopia"), "Cormac McCarthy", 1933, 287)},
    ${b(17, "Never Let Me Go", 8.50, 4.3, "dystopia", Seq("literary", "dystopia"), "Kazuo Ishiguro", 1954, 288)},
    ${b(18, "Station Eleven", 11.00, 4.5, "dystopia", Seq("literary", "dystopia"), "Emily St. John", 1979, 333)},
    ${b(19, "The Martian", 12.00, 4.7, "sci-fi", Seq("sci-fi", "survival"), "Andy Weir", 1972, 369)},
    ${b(20, "Project Hail Mary", 14.50, 4.9, "sci-fi", Seq("sci-fi", "survival"), "Andy Weir", 1972, 496)}
  ]}}"""

  private def q(expr: String): JValue = JValue.parse(Jetro.collect(doc, expr))
  private def arr(v: JValue): Vector[JValue] = v match {
    case JArr(xs) => xs
    case other    => fail(s"expected array, got ${other.kind}")
  }
  private def fld(v: JValue, n: String): JValue = Interp.fieldOf(v, n)
  private def d(v: JValue): Double = JValue.asNum(v).get

  test("deep filter+map+map fusion with sorted slice") {
    val r = arr(q("""$.store.books.filter(price >= 8.0 and price <= 12.0 and rating >= 4.2).map({title: title, cost: price, score: rating}).map({label: title, gross: cost}).sort(gross)[0:3]"""))
    assert(r.length == 3)
    val grosses = r.map(x => d(fld(x, "gross")))
    assert(grosses == grosses.sorted)
    assert(grosses.forall(g => g >= 8.0 && g <= 12.0))
  }

  test("filter+sum fusion with kind check") {
    val total = d(q("""$.store.books.filter(price kind number and genre == "sci-fi").sum(price)"""))
    val expected = 12.99 + 9.99 + 13.25 + 8.75 + 9.25 + 8.00 + 7.50 + 9.00 + 10.00 + 8.25 + 12.00 + 14.50
    assert(math.abs(total - expected) < 0.001, s"got $total want $expected")
  }

  test("nested let with CSE and avg") {
    val r = q("""let sci = $.store.books.filter(genre == "sci-fi") in {count: sci.len(), avg_price: sci.avg(price), avg_rating: sci.avg(rating), top_rated: sci.sort(rating).reverse()[0:3].map(title)}""")
    assert(fld(r, "count") == JInt(12))
    assert(d(fld(r, "avg_price")) > 8.0)
    assert(d(fld(r, "avg_rating")) > 4.0)
    val top = arr(fld(r, "top_rated"))
    assert(top.length == 3 && top.head == JStr("Project Hail Mary"))
  }

  test("find-quantifier fusion short circuit") {
    val r = q("$.store.books.filter(rating > 4.5 and id == 19).first()")
    assert(fld(r, "title") == JStr("The Martian") && fld(r, "id") == JInt(19))
  }

  test("group then aggregate complex reshape") {
    val r = arr(q("""$.store.books.filter(rating >= 4.0).group_by(genre).entries().map({genre: @[0], count: @[1].len(), avg_price: @[1].avg(price)}).sort(avg_price).reverse()"""))
    assert(r.length >= 3)
    val genres = r.map(x => fld(x, "genre"))
    assert(genres.distinct.length == genres.length)
  }

  test("map+flatten fusion with unique and sort") {
    val tags = arr(q("$.store.books.map(tags).flatten().unique().sort()"))
      .map { case JStr(s) => s; case other => fail(other.kind) }
    assert(tags == tags.sorted && tags.distinct == tags)
    assert(Seq("sci-fi", "dystopia", "cyberpunk").forall(tags.contains))
  }

  test("filter + takewhile fusion (first book fails the cut)") {
    val r = arr(q("""$.store.books.filter(price > 5.0).takewhile(price < 12.0).map(title)"""))
    assert(r.isEmpty) // Dune (12.99) is first, so takewhile cuts at 0
  }

  test("deep chain with comprehension and f-string") {
    val items = arr(q("""[f"{b.title} (${b.price})" for b in $.store.books if b.rating >= 4.5 and b.genre == "sci-fi" and b.author.born >= 1940]"""))
    assert(items.length >= 3)
    items.foreach { case JStr(s) => assert(s.contains("$")); case other => fail(other.kind) }
  }

  test("let-chained pipelines with aggregation") {
    val r = q("""let books = $.store.books in let cheap = books.filter(price < 10.0) in let expensive = books.filter(price >= 10.0) in {total: books.len(), cheap_count: cheap.len(), expensive_count: expensive.len(), cheap_avg: cheap.avg(price), expensive_avg: expensive.avg(price), delta: expensive.avg(price) - cheap.avg(price), price_range: books.max(price) - books.min(price), top_author: books.sort(rating).reverse()[0].author.name}""")
    assert(fld(r, "total") == JInt(20))
    assert(d(fld(r, "cheap_count")) > 0 && d(fld(r, "expensive_count")) > 0)
    assert(d(fld(r, "delta")) > 0.0 && d(fld(r, "price_range")) > 5.0)
    assert(fld(r, "top_author") == JStr("Andy Weir"))
  }

  test("const fold across arithmetic and comparisons") {
    val titles = arr(q("""$.store.books.filter((1 + 2) * 3 == 9 and not (5 < 3) and price > 11.0).map(title).sort()"""))
      .map { case JStr(s) => s; case other => fail(other.kind) }
    assert(titles.contains("Dune") && titles.contains("Project Hail Mary"))
  }
}
