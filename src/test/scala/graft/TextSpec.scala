package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Semantics of the normalization and PII-redaction column builders
  * (the catalog's q_normalize/q_redact verify engine-portability; this
  * spec pins the behavioral contract on crafted edge cases). */
class TextSpec extends SparkSpec {

  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(s).toDF("t").select(Text.redactPii(col("t"))).as[String].head

  private def normOne(s: String): String =
    Seq(s).toDF("t").select(Text.normalize(col("t"))).as[String].head

  test("normalize: case, whitespace runs, trim") {
    assert(normOne("  Hello\t\n  WORLD  x ") == "hello world x")
    assert(normOne("") == "")
    assert(Seq("A B").toDF("t") // NBSP is not \s in Java regex: kept
      .select(Text.normalize(col("t"))).as[String].head == "a b")
  }

  test("normalizeAscii strips punctuation into single spaces") {
    val got = Seq("Hello, World! (v2.0) -- done.")
      .toDF("t").select(Text.normalizeAscii(col("t"))).as[String].head
    assert(got == "hello world v2 0 done")
  }

  test("redactPii: each pattern type, and the shadowing order") {
    assert(redactOne("mail bob.smith+x@sub.example.co.uk now") == "mail <EMAIL> now")
    assert(redactOne("ssn 123-45-6789 ok") == "ssn <ID> ok")
    assert(redactOne("call 555-123-4567 or 555.123.4567") == "call <PHONE> or <PHONE>")
    assert(redactOne("host 192.168.0.1 up") == "host <IP> up")
    // SSN's 3-2-4 must not be eaten by the phone's 3-3-4 and vice versa
    assert(redactOne("123-45-6789 123-456-7890") == "<ID> <PHONE>")
    // dotted phone is 3-3-4 digits, so the PHONE pattern claims it
    // before the IP pattern can (documented precedence)
    assert(redactOne("123.456.7890") == "<PHONE>")
  }

  test("redactPii leaves clean text untouched") {
    val s = "orders shipped 2024-01-02, total 1234.56 at rate 1.5"
    assert(redactOne(s) == s)
  }
}
