package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[TextFns.redactPii]] / [[TextFns.piiCount]] on planted PII: exact
  * expected redactions (spans, not just counts), category precedence on
  * overlap-shaped inputs, and the no-PII identity. The synthetic corpus
  * carries no natural PII, so these planted cases are the behavioral
  * ground truth; `q_pii_screen`'s DuckDB twin then cross-checks the same
  * regexes engine-to-engine on the augmented corpus.
  */
class TextPiiSpec extends SparkSuite {
  import spark.implicits._

  private def redacted(s: String): String =
    Seq(s).toDF("t").select(TextFns.redactPii(col("t"))).head().getString(0)

  private def counts(s: String): Map[String, Int] =
    TextFns.PiiPatterns.map { case (cat, p) =>
      cat -> Seq(s).toDF("t").select(TextFns.piiCount(col("t"), p)).head().getInt(0)
    }.toMap

  test("each category redacts to its sentinel") {
    assert(redacted("mail bob.smith+x@corp.example.org end") == "mail <email> end")
    assert(redacted("ssn 123-45-6789 end") == "ssn <ssn> end")
    assert(redacted("call 555-867-5309 or 555.867.5309 end")
      == "call <phone> or <phone> end")
    assert(redacted("host 192.168.0.1 end") == "host <ipv4> end")
  }

  test("mixed document: all categories, counts match redaction") {
    val doc = "reach a@b.io or 10.0.0.1, ssn 078-05-1120, tel 212-555-0187."
    assert(redacted(doc) == "reach <email> or <ipv4>, ssn <ssn>, tel <phone>.")
    assert(counts(doc) == Map("email" -> 1, "ssn" -> 1, "phone" -> 1, "ipv4" -> 1))
  }

  test("precedence: digit-bearing email local part is email, not phone") {
    // email is redacted first, so the 3-3-4 digit run inside the local
    // part can never be re-matched as a phone
    val doc = "x 555-867-5309@mail.example.com y"
    assert(redacted(doc) == "x <email> y")
    assert(counts(doc)("email") == 1)
  }

  test("shape discrimination: near-misses stay untouched") {
    val doc = "v1.2.3 order 12-34-56 at 555-12-3456789 not pii"
    assert(redacted(doc) == doc)
    assert(counts(doc).values.sum == 0)
  }

  test("no-PII text is the identity") {
    val doc = "the quick brown fox jumps over 42 lazy dogs"
    assert(redacted(doc) == doc)
    assert(counts(doc).values.sum == 0)
  }
}
