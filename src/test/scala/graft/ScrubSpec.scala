package graft

import graft.pipeline.Scrub
import org.apache.spark.sql.functions._

class ScrubSpec extends SparkTestBase {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(Scrub.redact($"t")).collect()(0).getString(0)

  test("emails, phones, IPs redacted; multiple matches per string") {
    assert(redact("mail a.b+c@x-corp.io and d_e%f@sub.domain.org today") ===
      "mail <EMAIL> and <EMAIL> today")
    assert(redact("call 555-0199 or 555-0200") === "call <PHONE> or <PHONE>")
    assert(redact("hosts 10.0.0.1 and 192.168.255.254") === "hosts <IP> and <IP>")
  }

  test("order: email wins over its embedded digit runs; boundaries respected") {
    // digits inside an email/longer token must not half-match as phone/IP
    assert(redact("x 123-4567@mail.com y") === "x <EMAIL> y")
    assert(redact("version v1.2.3.4beta stays") === "version v1.2.3.4beta stays")
    assert(redact("num 1234-5678 stays") === "num 1234-5678 stays")
    assert(redact("mixed 555-0199 u@v.de 10.1.2.3") === "mixed <PHONE> <EMAIL> <IP>")
  }
}
