package graft.tools

/** Ad-hoc timing breakdown of the cold doc path (parse vs compile vs
  * eval) over the bench_cold 8k-record document. Not part of any gate.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val cities = Array("Tokyo", "Berlin", "Paris", "Austin", "Toronto", "Oslo", "Lima", "Cairo")
    val sb = new StringBuilder(1 << 22)
    sb.append("{\"data\":[")
    var i = 0
    while (i < 8000) {
      if (i > 0) sb.append(',')
      val nItems = 3 + i % 5
      sb.append(s"""{"id":$i,"user":{"name":"u$i","age":${20 + i % 50},""")
      sb.append(s""""addr":{"city":"${cities(i % 8)}","zip":"z${i % 1000}"}},"items":[""")
      var j = 0
      while (j < nItems) {
        if (j > 0) sb.append(',')
        sb.append(s"""{"sku":"S${(i * 7 + j) % 9973}","qty":${j % 5 + 1},"price":${((i * 7 + j * 13) % 500) + 9.99}}""")
        j += 1
      }
      sb.append(s"""],"tags":["t${i % 11}","t${i % 7}","t${i % 3}"],"active":${i % 3 == 0},"score":${(i * 37) % 1000}}""")
      i += 1
    }
    sb.append("]}")
    val json = sb.toString
    println(s"json bytes: ${json.length}")
    val expr = """$.data.filter(active).filter(score > 200).sort(-score).take(100)
                 |.flat_map(items).filter(price > 50).map(qty * price).sum()""".stripMargin
    for (round <- 1 to 5) {
      val t0 = System.nanoTime()
      val compiled = graft.jexpr.Jetro.compile(expr)
      val t1 = System.nanoTime()
      val doc = graft.jexpr.JValue.parse(json)
      val t2 = System.nanoTime()
      val r = compiled.evalValue(doc)
      val t3 = System.nanoTime()
      println(f"round $round: compile ${(t1-t0)/1e6}%.1f ms  parse ${(t2-t1)/1e6}%.1f ms  eval ${(t3-t2)/1e6}%.1f ms  (${r})")
    }
  }
}
