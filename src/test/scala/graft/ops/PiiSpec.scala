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

  // ------------------------------------------------------------------
  // Credit cards (Luhn-validated)
  // ------------------------------------------------------------------

  private def cc(text: String): (java.lang.Long, String) = {
    val r = Pii.redactCc(Seq((1L, text)).toDF("id", "text"), "text").head
    (r.getAs[java.lang.Long]("n_ccs"), r.getAs[String]("text_cc_redacted"))
  }

  /** Independent JVM Luhn for cross-checking the Column expression. */
  private def luhnRef(s: String): Boolean = {
    val d = s.filter(_.isDigit).map(_ - '0')
    val sum = d.reverse.zipWithIndex.map { case (x, i) =>
      if (i % 2 == 1) { val y = x * 2; if (y > 9) y - 9 else y } else x
    }.sum
    sum % 10 == 0
  }

  test("standard card test numbers validate; off-by-one checksums do not") {
    // Classic network test PANs (16-digit Visa/MC, 15-digit Amex, 13
    // digits) — all Luhn-valid by construction.
    val valid = Seq("4111111111111111", "4012888888881881",
      "5105105105105100", "378282246310005", "4222222222222")
    val invalid = valid.map(s =>
      s.init + (((s.last - '0') + 1) % 10 + '0').toChar)
    valid.foreach { v =>
      assert(luhnRef(v), v)
      assert(cc(s"card $v end") == ((1L, "card <CC> end")), v)
    }
    invalid.foreach { v =>
      assert(!luhnRef(v), v)
      assert(cc(s"card $v end") == ((0L, s"card $v end")), v)
    }
  }

  test("dashed and spaced forms validate and redact") {
    assert(cc("pay 4111-1111-1111-1111 now") == ((1L, "pay <CC> now")))
    assert(cc("pay 4111 1111 1111 1111 now") == ((1L, "pay <CC> now")))
    // Mixed separators within one candidate still one match.
    assert(cc("pay 4111-1111 1111-1111 now") == ((1L, "pay <CC> now")))
  }

  test("an invoice-looking digit run survives; a real PAN next to it goes") {
    val (n, red) = cc("order 1234567890123456 paid with 5105105105105100")
    assert(!luhnRef("1234567890123456"))
    assert(n == 1L)
    assert(red == "order 1234567890123456 paid with <CC>")
  }

  test("column Luhn agrees with the JVM reference across random digit runs") {
    val rnd = new scala.util.Random(7)
    val runs = Seq.tabulate(60) { i =>
      val len = 13 + rnd.nextInt(7)
      (i.toLong, Seq.fill(len)(rnd.nextInt(10)).mkString)
    }
    val got = Pii.redactCc(runs.toDF("id", "text"), "text")
      .select("id", "n_ccs").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    runs.foreach { case (id, s) =>
      assert(got(id) == (if (luhnRef(s)) 1L else 0L), s)
    }
  }

  test("null text yields null count and null redaction (not fabricated zeros)") {
    val r = Pii.redactCc(Seq((1L, null.asInstanceOf[String]))
      .toDF("id", "text"), "text").head
    assert(r.isNullAt(r.fieldIndex("n_ccs")))
    assert(r.isNullAt(r.fieldIndex("text_cc_redacted")))
  }

  test("null count stays null under the legacy sizeOfNull regime (never -1)") {
    // Bare size(null) reads -1 under ansi off + legacy sizeOfNull —
    // the explicit when(t.isNull) guard is what this pins.
    withSessionConfs(Map("spark.sql.ansi.enabled" -> "false",
      "spark.sql.legacy.sizeOfNull" -> "true")) {
      val r = Pii.redactCc(Seq((1L, null.asInstanceOf[String]))
        .toDF("id", "text"), "text").head
      assert(r.isNullAt(r.fieldIndex("n_ccs")),
        s"legacy regime fabricated n_ccs=${r.get(r.fieldIndex("n_ccs"))}")
    }
  }

  test("multiple valid cards each redact") {
    val (n, red) = cc("a 4111111111111111 b 5105105105105100 c")
    assert(n == 2L)
    assert(red == "a <CC> b <CC> c")
  }

  // --- grouping-agnostic proposal (r12: the r11 pattern hard-coded
  // 4-4-4-n grouping and missed every other print format) ------------

  test("Amex 4-6-5 and Visa-13 grouped print forms redact") {
    assert(luhnRef("378282246310005") && luhnRef("4222222222222"))
    assert(cc("pay 3782 822463 10005 ok") == ((1L, "pay <CC> ok")))
    assert(cc("pay 4222 2222 22222 ok") == ((1L, "pay <CC> ok")))
  }

  test("a 19-digit contiguous PAN redacts; 20 digits is not a PAN") {
    // Build a Luhn-valid 19-digit number from an 18-digit base + its
    // check digit (independent JVM reference computes the digit).
    val base = "601111111111111111"
    val check = (0 to 9).map(_.toString).find(d => luhnRef(base + d)).get
    val pan19 = base + check
    assert(cc(s"card $pan19 end") == ((1L, "card <CC> end")))
    // Append one digit: a 20-digit run exceeds the PAN length range —
    // the maximal-run proposal rejects the WHOLE run (no 19-digit
    // prefix is ever Luhn-checked, per ADVICE r11's boundary finding).
    assert(cc(s"ref ${pan19}7 end") == ((0L, s"ref ${pan19}7 end")))
  }

  test("whole-run Luhn is tried first; a failing 19-digit run then recovers its embedded PAN") {
    // 19 digits grouped 4-4-4-4-3: the full run fails Luhn while its
    // 16-digit prefix passes. Tier 1 checks all 19 (never a bare
    // prefix — the r11 boundary-bug class); on its Luhn failure the
    // tier-2 group-boundary window [g1..g4] recovers the PAN (the
    // card + CVV fusion ADVICE r12 flagged as a silent leak).
    assert(luhnRef("4111111111111111") && !luhnRef("4111111111111111111"))
    assert(cc("x 4111-1111-1111-1111-111 y") == ((1L, "x <CC>-111 y")))
    // ...and when the WHOLE 19-digit run Luhn-passes, it redacts
    // whole: the valid 16-prefix is never proposed on its own.
    val check = (0 to 9).map(_.toString)
      .find(d => luhnRef("411111111111111141" + d)).get
    val g5 = "41" + check // 3-digit last group making the whole 19 valid
    assert(luhnRef("4111111111111111" + g5))
    assert(cc(s"x 4111-1111-1111-1111-$g5 y") == ((1L, "x <CC> y")))
  }

  test("contiguous PANs fused by a single space recover via single-group windows") {
    // One space is a legal in-PAN separator, so the two runs fuse into
    // a 32-digit candidate; >19 digits fails tier 1, and the two
    // disjoint single-group windows both redact.
    assert(cc("5105105105105100 4111111111111111") == ((2L, "<CC> <CC>")))
  }

  test("a GROUPED PAN fused into a >19-digit run recovers via multi-group windows") {
    // r12 dropped this shape (its 4-5-digit sub-runs are outside the
    // PAN length range); the group-boundary window [g1..g4] has mass
    // 16, card shape, and a passing checksum — the PAN redacts and
    // the fused token survives.
    assert(cc("pin 4111 1111 1111 1111 12345 end") ==
      ((1L, "pin <CC> 12345 end")))
  }

  test("card + CVV fused at 19 digits redacts the PAN and keeps the CVV token") {
    // The exact ADVICE r12 example: whole run (19) fails Luhn, window
    // recovers the leftmost-longest valid card.
    assert(cc("pay 4111 1111 1111 1111 123 now") ==
      ((1L, "pay <CC> 123 now")))
  }

  test("a leading short token fused to a PAN strips via window start selection") {
    // Windows may not START at a 3-digit group (non-last groups need
    // >= 4 digits), so [g2..g5] is the first candidate and wins.
    assert(cc("otp 123 4111 1111 1111 1111 sent") ==
      ((1L, "otp 123 <CC> sent")))
  }

  test("Visa-13's 4-4-4-1 form fused with a trailing token recovers") {
    // Whole run (18 digits, shape broken by the now-non-last single-
    // digit group) fails tier 1; window [g1..g4] = the 4-4-4-1 form.
    assert(luhnRef("4222222222222"))
    assert(cc("pay 4222 2222 2222 2 22222 ok") ==
      ((1L, "pay <CC> 22222 ok")))
  }

  test("windows never fire on runs of short groups (strict shape floor)") {
    // Groups of 1-3 digits can only be a window's LAST group, so a
    // fused list of short tokens has no window in the mass range even
    // when some concatenation would Luhn-pass.
    assert(cc("lotto 123 456 789 012 345 678 end") ==
      ((0L, "lotto 123 456 789 012 345 678 end")))
  }

  test("a valid PAN embedded in a longer contiguous digit run is not proposed") {
    assert(cc("acct 41111111111111119999 end") ==
      ((0L, "acct 41111111111111119999 end")))
  }

  test("single-digit-grouped runs are not card print forms (group-shape gate)") {
    // 13 space-separated single digits with the last digit CHOSEN so
    // the run is Luhn-VALID — only the group-shape gate stands between
    // a score list and destruction.
    val base = "452817396248"
    val check = (0 to 9).map(_.toString).find(d => luhnRef(base + d)).get
    val spaced = (base + check).map(_.toString).mkString(" ")
    assert(luhnRef(spaced.replace(" ", "")))
    assert(cc(s"pts $spaced end") == ((0L, s"pts $spaced end")))
    // ...while Visa-13's real 4-4-4-1 print form (single-digit LAST
    // group) still redacts: only non-final groups are gated.
    assert(luhnRef("4222222222222"))
    assert(cc("pay 4222 2222 2222 2 ok") == ((1L, "pay <CC> ok")))
  }
}
