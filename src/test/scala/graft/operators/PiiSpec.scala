package graft.operators

import graft.SparkSpec

/** Planted-data verification of [[Pii.redactPii]] — the fixture corpus
  * carries no PII-shaped strings, so this spec IS the correctness gate.
  */
class PiiSpec extends SparkSpec {

  test("emails, IPs, and formatted phones are counted and redacted; clean text unchanged") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact john.doe+spam@example.co.uk or sales@corp.io today"),
      (2L, "server at 192.168.0.1 and fallback 8.8.8.8 on port 443"),
      (3L, "call (415) 555-2671 or +1 415 555 2671 or 555-123-4567"),
      (4L, "no personal data here, just words and the number 12345"),
      (5L, "mixed: admin@host.net from 10.0.0.7 said call 650-555-0199"),
    ).toDF("doc_id", "text")

    val out = Pii.redactPii(docs).orderBy("doc_id").collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(byId(1L).getAs[Long]("n_emails") == 2L)
    assert(byId(1L).getAs[String]("redacted") ==
      "contact [EMAIL] or [EMAIL] today")

    assert(byId(2L).getAs[Long]("n_ips") == 2L)
    // "443" alone must not be an IP or phone
    assert(byId(2L).getAs[Long]("n_phones") == 0L)
    assert(byId(2L).getAs[String]("redacted") ==
      "server at [IP] and fallback [IP] on port 443")

    assert(byId(3L).getAs[Long]("n_phones") == 3L)
    assert(byId(3L).getAs[String]("redacted") ==
      "call [PHONE] or [PHONE] or [PHONE]")

    assert(byId(4L).getAs[Boolean]("has_pii") == false)
    assert(byId(4L).getAs[String]("redacted") ==
      "no personal data here, just words and the number 12345")

    val m = byId(5L)
    assert(m.getAs[Long]("n_emails") == 1L)
    assert(m.getAs[Long]("n_ips") == 1L)
    assert(m.getAs[Long]("n_phones") == 1L)
    assert(m.getAs[String]("redacted") ==
      "mixed: [EMAIL] from [IP] said call [PHONE]")
  }

  test("synthesized PII text: regex redaction agrees with the formula replay") {
    // the pii1 oracle replays counts + the redacted string from the
    // doc_id formula without running a regex — this spec closes the
    // loop on the Spark side: the REAL regex pipeline over the
    // synthesized text must land exactly on the formula's answer,
    // including ids where each PII class is absent and the digit bait
    // ("ref 12345 code A1B2") stays untouched
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ids = (0L to 60L).toDF("doc_id")
    val out = Pii.redactPii(Pii.synthesizePiiText(ids))
      .orderBy("doc_id").collect()
    for (r <- out) {
      val d = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_emails") == d % 3, s"doc $d emails")
      assert(r.getAs[Long]("n_ips") == d % 2, s"doc $d ips")
      assert(r.getAs[Long]("n_phones") == (if (d % 5 != 0) 1L else 0L), s"doc $d phones")
      val expected = Seq(
        Some("Doc"), Some(d.toString), Some("contact"),
        if (d % 3 >= 1) Some("[EMAIL]") else None,
        if (d % 3 == 2) Some("[EMAIL]") else None,
        Some("at"),
        if (d % 2 == 1) Some("[IP]") else None,
        Some("call"),
        if (d % 5 != 0) Some("[PHONE]") else None,
        Some("ref 12345 code A1B2")).flatten.mkString(" ")
      assert(r.getAs[String]("redacted") == expected, s"doc $d redacted")
    }
  }

  test("pii1 plan shape: pure per-row expressions in the scan stage — zero Exchange") {
    // redaction is the scan-stage scrub of a 100 TB release pipeline;
    // a shuffle here would be a regression in kind, not just degree
    val plan = Pii.redactPii(Pii.synthesizePiiText(
        graft.Tables.documents(spark, sf0001).select("doc_id")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"pii1 plan grew a shuffle:\n${plan.take(500)}")
  }

  test("the shipped corpus is PII-free and passes through verbatim") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf0001)
    val out = Pii.redactPii(docs)
    assert(out.where(col("has_pii")).count() == 0L,
      "fixture corpus unexpectedly contains PII-shaped strings")
    val changed = docs.select(col("doc_id"), col("text"))
      .join(out.select(col("doc_id"), col("redacted")), Seq("doc_id"))
      .where(col("text") =!= col("redacted")).count()
    assert(changed == 0L, s"$changed docs altered by redaction on a PII-free corpus")
  }
}
