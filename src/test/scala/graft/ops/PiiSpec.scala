package graft.ops

import graft.SparkSpec

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String): (Long, Long, Long, String) = {
    val r = Pii.redact(Seq((1L, text)).toDF("id", "text"), "text").head
    (r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
      r.getAs[Long]("n_ips"), r.getAs[String]("text_redacted"))
  }

  test("emails, phones, and IPs are counted and redacted") {
    val (e, p, i, red) = one(
      "mail a.b+c@sub.example.org or +44-123-4567 from 192.168.0.1 ok")
    assert((e, p, i) == ((1L, 1L, 1L)))
    assert(red == "mail <EMAIL> or <PHONE> from <IP> ok")
  }

  test("email hosts are not mistaken for IPs (order of redaction)") {
    val (_, _, i, red) = one("x user@h1.h2.h3.example.com y")
    assert(i == 0L)
    assert(red == "x <EMAIL> y")
  }

  test("multiple matches of one kind all redact") {
    val (e, _, _, red) = one("a@b.co c@d.io")
    assert(e == 2L)
    assert(red == "<EMAIL> <EMAIL>")
  }

  test("redact counts agree with placeholders when patterns overlap; detect counts raw") {
    // The email's local part swallows a phone-shaped span: redact must
    // report n_phones=0 (no <PHONE> was written) while detect, the raw
    // per-pattern counter, still sees 1.
    val text = "reach a+1-555-1234@x.com today"
    val (e, p, _, red) = one(text)
    assert(e == 1L && p == 0L)
    assert(red == "reach <EMAIL> today")
    val d = Pii.detect(Seq((1L, text)).toDF("id", "text"), "text").head
    assert(d.getAs[Long]("n_emails") == 1L && d.getAs[Long]("n_phones") == 1L)
  }

  test("clean text passes through untouched") {
    val (e, p, i, red) = one("no personal data at all")
    assert((e, p, i) == ((0L, 0L, 0L)))
    assert(red == "no personal data at all")
  }
}
