package graft.queries

import graft.TestSpark
import graft.functions.TextFns
import org.scalatest.funsuite.AnyFunSuite

/** PII redaction goldens: the sf documents contain no planted PII (the
  * q37 oracle there mostly checks no-op parity), so the redaction
  * behavior itself is pinned here on planted strings.
  */
class RedactPiiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def redact(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("text").select(TextFns.redactPii($"text")).head().getString(0)
  }

  test("emails, SSNs and phones redact to typed placeholders") {
    assert(redact("contact john.doe+spam@mail.example.co for details")
      == "contact <EMAIL> for details")
    assert(redact("ssn 123-45-6789 on file") == "ssn <SSN> on file")
    assert(redact("call 212-555-0173 or 646.555.0100")
      == "call <PHONE> or <PHONE>")
    assert(redact("a@b.io and 111-22-3333 and 333-444-5555")
      == "<EMAIL> and <SSN> and <PHONE>")
  }

  test("near-miss shapes are left intact") {
    // longer digit runs break the \b-delimited groups
    assert(redact("order 1234-56-7890 shipped") == "order 1234-56-7890 shipped")
    assert(redact("build 12345 at 10.0.0.1") == "build 12345 at 10.0.0.1")
    assert(redact("price 100-200 range") == "price 100-200 range")
    assert(redact("no pii here") == "no pii here")
  }

  test("email absorbs would-be SSN fragments before they match") {
    // the local part contains an SSN-shaped substring; email runs first
    assert(redact("mail 123-45-6789@corp.example please")
      == "mail <EMAIL> please")
  }
}
