package graft.tools
import graft.jexpr._
object Fuzz {
  def main(args: Array[String]): Unit = {
    val rng = new scala.util.Random(1234)
    val alpha = """$.{}[]()"',:|->=<>!?+-*/%abc 123fin.."@`\n\t;#~^&ifelsetrypatchletforinwhenkindasnotandor"""
    var crashes = 0
    (0 until 200000).foreach { k =>
      val len = 1 + rng.nextInt(60)
      val src = Seq.fill(len)(alpha(rng.nextInt(alpha.length))).mkString
      try { Jetro.compile(src); () }
      catch {
        case _: ParseException => ()
        case e: Throwable =>
          crashes += 1
          if (crashes < 10) println(s"[fuzz] PARSE CRASH ${e.getClass.getSimpleName} on: ${src.take(60)}")
      }
    }
    // eval fuzz: valid-ish exprs against a doc
    val doc = JValue.parse("""{"a": [1, 2, {"b": "x"}], "s": "hi", "n": 5}""")
    var evalCrashes = 0
    (0 until 100000).foreach { _ =>
      val len = 1 + rng.nextInt(30)
      val src = Seq.fill(len)(alpha(rng.nextInt(alpha.length))).mkString
      val c = try Some(Jetro.compile(src)) catch { case _: ParseException => None }
      c.foreach { cc =>
        try { cc.evalValue(doc); () }
        catch {
          case _: EvalException | _: JsonParseException => ()
          case _: StackOverflowError => () // deep expr nesting: parser-side guard TBD
          case e: Throwable =>
            evalCrashes += 1
            if (evalCrashes < 10) println(s"[fuzz] EVAL CRASH ${e.getClass.getSimpleName} on: ${src.take(60)}")
        }
      }
    }
    println(s"[fuzz] done: $crashes parse crashes, $evalCrashes eval crashes")
  }
}
