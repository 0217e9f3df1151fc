package graft.functions

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PiiScrubSpec extends AnyFunSuite with TestSpark {

  private def run(texts: String*): Seq[(String, Int, Int, Int, Int)] = {
    val spark2 = spark
    import spark2.implicits._
    texts.toDF("t")
      .select(
        PiiScrub.redact(col("t")).as("r"),
        PiiScrub.countMatches(col("t"), PiiScrub.emailRe).as("e"),
        PiiScrub.countMatches(col("t"), PiiScrub.ssnRe).as("s"),
        PiiScrub.countMatches(col("t"), PiiScrub.phoneRe).as("p"),
        PiiScrub.countMatches(col("t"), PiiScrub.ipRe).as("i"))
      .as[(String, Int, Int, Int, Int)].collect().toSeq
  }

  test("each PII shape is masked with its own token and counted once") {
    val Seq(r) = run(
      "mail a.b+c@ex.org ssn 123-45-6789 call 555-123-4567 ip 10.0.0.1 end")
    assert(r._1 === "mail [EMAIL] ssn [SSN] call [PHONE] ip [IP] end")
    assert((r._2, r._3, r._4, r._5) === ((1, 1, 1, 1)))
  }

  test("clean text passes through byte-identical with zero counts") {
    val Seq(r) = run("the quick brown fox at example dot com")
    assert(r._1 === "the quick brown fox at example dot com")
    assert((r._2, r._3, r._4, r._5) === ((0, 0, 0, 0)))
  }

  test("digit-group shapes do not cross-match: SSN is not a phone and vice versa") {
    val Seq(ssnOnly, phoneOnly) = run("id 123-45-6789", "id 555-010-1234")
    assert(ssnOnly._3 === 1 && ssnOnly._4 === 0)
    assert(phoneOnly._3 === 0 && phoneOnly._4 === 1)
  }

  test("multiple occurrences all masked (global replace) and redact is idempotent") {
    val Seq(r) = run("a@b.co then c@d.org")
    assert(r._1 === "[EMAIL] then [EMAIL]")
    assert(r._2 === 2)
    val Seq(again) = run("[EMAIL] then [EMAIL]")
    assert(again._1 === "[EMAIL] then [EMAIL]")
  }

  test("word boundaries: digits embedded in longer runs do not match") {
    // 11-digit run: no 3-3-4 phone inside (no word boundary mid-run)
    val Seq(r) = run("serial 12345678901 and 1234-567-8901")
    assert(r._4 === 0)
  }

  test("counts equal the mask tokens redact() emits, even on overlaps") {
    val spark2 = spark
    import spark2.implicits._
    // adversarial overlaps: an SSN-shaped local part swallowed by the
    // email pattern (must count as email only), and an SSN exposed only
    // AFTER the preceding email mask creates a word boundary (must
    // count as the SSN the redactor actually masks)
    val rows = Seq(
      "x 123-45-6789@x.co y",
      "x a@b.co123-45-6789 y",
      "plain 123-45-6789 and a@b.co")
      .toDF("t")
      .select(
        PiiScrub.redact(col("t")).as("r"),
        PiiScrub.countRedacted(col("t"), PiiScrub.emailRe).as("e"),
        PiiScrub.countRedacted(col("t"), PiiScrub.ssnRe).as("s"))
      .as[(String, Int, Int)].collect()
    rows.foreach { case (r, e, s) =>
      assert(e === "\\[EMAIL\\]".r.findAllIn(r).size,
        s"email count vs tokens in '$r'")
      assert(s === "\\[SSN\\]".r.findAllIn(r).size,
        s"ssn count vs tokens in '$r'")
    }
  }
}
