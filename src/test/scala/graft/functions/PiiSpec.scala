package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String): (String, Int) = {
    val r = Seq(text).toDF("t")
      .select(redactPii($"t").as("red"), piiCount($"t").as("n"))
      .as[(String, Int)].head()
    r
  }

  test("redactPii replaces emails, IPs, and phones with typed placeholders") {
    val (red, n) = one(
      "mail a.user+tag@sub.example.org from 192.168.0.1 call 25-989-741-2988 done")
    assert(red == "mail <EMAIL> from <IP> call <PHONE> done")
    assert(n == 3)
  }

  test("redactPii handles multiple hits, leaves clean text alone, and never half-eats an email domain") {
    val (red, n) = one("a@b.co c@d.io")
    assert(red == "<EMAIL> <EMAIL>" && n == 2)
    assert(one("no pii here 12-34") == (("no pii here 12-34", 0)))
    // the email's dotted domain must not surface as an IP/phone after
    // redaction ordering
    val (red2, n2) = one("ping 10.20.30.40 or user@10.20.30.40.example.com")
    assert(red2 == "ping <IP> or <EMAIL>", red2)
    assert(n2 == 2)
  }

  test("normalizeText collapses case, punctuation, and whitespace variants to one form") {
    val variants = Seq("HOUSEHOLD!!! Customer 7", "household    Customer 7",
      "household Customer 7")
    val norms = variants.toDF("t").select(normalizeText($"t").as("n"))
      .as[String].collect().toSet
    assert(norms == Set("household customer 7"))
    assert(Seq("  A--b__c  9  ").toDF("t")
      .select(normalizeText($"t")).as[String].head() == "a b c 9")
  }
}
