package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private val d = Seq(
    (1L, "The quick brown fox, and the lazy dog.", "en"),
    (2L, "der hund und die katze ist das", "de"),
    (3L, "le chat et les chiens est une", "fr"),
  ).toDF("doc_id", "text", "lang")

  test("tokenCounts: whitespace tokens and regex subtokens") {
    val r = TextAnalysis.tokenCounts(d).orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("n_tokens") == 8)
    // words + ',' + '.' as single punctuation subtokens
    assert(r(0).getAs[Int]("n_subtokens") == 10)
    assert(r(1).getAs[Int]("n_tokens") == 7)
  }

  test("qualityScores: punctuation and stopword ratios") {
    val r = TextAnalysis.qualityScores(d).orderBy("doc_id").collect().head
    val text = "The quick brown fox, and the lazy dog."
    assert(r.getAs[Int]("n_chars_measured") == text.length)
    assert(math.abs(r.getAs[Double]("punct_ratio") - 2.0 / text.length) < 1e-12)
    // lower-cased stopword hits: the, and, the -> 3 of 8
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 3.0 / 8) < 1e-12)
  }

  test("languageId: stopword sets pick the declared language") {
    val r = TextAnalysis.languageId(d).orderBy("doc_id").collect()
    assert(r.map(_.getAs[String]("lang_predicted")).toSeq == Seq("en", "de", "fr"))
  }

  test("languageIdTrained: learns real char-gram signal and recovers held-out labels") {
    // The fixture corpus is lang-uniform by construction (lid1's census
    // documents that honestly); HERE the languages have genuinely
    // distinct character distributions, and the classifier must learn
    // them: 40 train + 10 eval docs per lang, built from disjoint
    // per-lang word pools.
    val pools = Map(
      "aa" -> Seq("zork", "blix", "quzz", "vrek", "xutt"),
      "bb" -> Seq("mano", "pelo", "rati", "sole", "luna"),
      "cc" -> Seq("grun", "heft", "wald", "korb", "dmpf"),
    )
    val docs = (for {
      (lang, words) <- pools.toSeq
      i <- 0 until 50
    } yield {
      val text = (0 until 12).map(j => words((i * 7 + j * 3) % words.length)).mkString(" ")
      val id = lang.hashCode.toLong.abs % 1000 * 1000 + i
      (id, text, lang, "srcX")
    }).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val isEval = col("doc_id") % 5 === 4 // 10 of each lang's 50
    val pred = TextAnalysis.languageIdTrained(docs, isEval)
    val joined = docs.where(isEval).select(col("doc_id"), col("lang"))
      .join(pred, Seq("doc_id"))
      .select(col("lang"), col("pred_lang")).collect()
    assert(joined.length == 30)
    val correct = joined.count(r => r.getString(0) == r.getString(1))
    assert(correct == 30,
      s"disjoint char pools must classify perfectly, got $correct/30")
  }

  test("languageIdTrained: gram-less docs predict 'und' instead of vanishing") {
    val docs = Seq(
      (1L, "normal training text here", "en", "s"),
      (2L, "more training text body", "en", "s"),
      (5L, "ab", "en", "s"), // < 3 chars: no grams
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = TextAnalysis.languageIdTrained(docs, col("doc_id") === 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((5L, "und", 0L)))
  }

  test("fingerprint: deterministic, order-sensitive") {
    val fp1 = TextAnalysis.fingerprints(d).orderBy("doc_id").collect()
    val fp2 = TextAnalysis.fingerprints(d).orderBy("doc_id").collect()
    assert(fp1.map(_.getLong(1)).toSeq == fp2.map(_.getLong(1)).toSeq)
    val swapped = Seq((1L, "quick The brown fox, and the lazy dog.", "en"))
      .toDF("doc_id", "text", "lang")
    val fpSwapped = TextAnalysis.fingerprints(swapped).collect().head.getLong(1)
    assert(fpSwapped != fp1.head.getLong(1))
  }

  test("repetition: top-token and type/token ratios; empty docs drop out") {
    val docs = Seq(
      (1L, "spam spam spam spam", "en"),
      (2L, "all words here differ", "en"),
      (3L, "   ", "en"),
    ).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.repetition(docs).orderBy("doc_id").collect()
    assert(r.length == 2, "whitespace-only doc must vanish (no tokens)")
    assert(r(0).getAs[Long]("n_tokens") == 4 && r(0).getAs[Long]("n_distinct") == 1)
    assert(r(0).getAs[Double]("top_token_ratio") == 1.0)
    assert(r(1).getAs[Double]("top_token_ratio") == 0.25)
    assert(r(1).getAs[Double]("type_token_ratio") == 1.0)
  }

  test("piiScrub: counts occurrences and digests the scrubbed text") {
    val docs = Seq(
      (1L, "mail a@b.co and c.d@e-f.org, call 12345678 now", "en"),
      (2L, "no pii here", "en"),
    ).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.piiScrub(docs).orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("n_emails") == 2)
    assert(r(0).getAs[Int]("n_long_numbers") == 1)
    assert(r(1).getAs[Int]("n_emails") == 0)
    // scrubbed text no longer contains the address, so digests differ
    assert(r(0).getAs[String]("scrubbed_md5") != r(1).getAs[String]("scrubbed_md5"))
  }

  test("quality ratios are NULL (not inf/NaN) on empty text") {
    val docs = Seq((1L, "", "en")).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.qualityScores(docs).collect().head
    // n_chars = 0 -> NULLIF guard kicks in; split("") = [""] so the
    // token-based ratios stay defined (0 stopwords of 1 empty token)
    assert(r.isNullAt(r.fieldIndex("punct_ratio")))
    assert(r.getAs[Double]("stopword_ratio") == 0.0)
  }
}
