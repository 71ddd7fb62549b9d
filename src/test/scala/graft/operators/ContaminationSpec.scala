package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  // 40-char eval passage; a 32-char span of it is leaked verbatim into
  // one train doc. Spans are md5'd over [p, p+32) at stride 8 from
  // position 1, so the leak lands on a window boundary when it starts at
  // an 8-aligned offset — place it at the very start of the train doc.
  private val passage = "the quick brown fox jumps over a lazy dog"
  private val docs = Seq(
    (1L, passage, "en", "eval-bench"), // doc_id % 2 == 1 -> eval
    (2L, passage.substring(0, 32) + " padded with unrelated tail text", "en", "web"),
    (4L, "completely unrelated training text that is long enough to window", "en", "web"),
    (6L, "short", "en", "web"), // < 32 chars: no windows, reported as (0, 0, false)
  ).toDF("doc_id", "text", "lang", "source")
    .withColumn("n_chars", length(col("text")).cast("long")) // matches documents.parquet's int64

  test("leaked span flags exactly the contaminated train doc") {
    val rep = Contamination.report(docs, col("doc_id") % 2 === 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(rep.keySet === Set(2L, 4L, 6L)) // every train doc answers; doc 1 is eval
    val (w2, c2, f2) = rep(2L)
    assert(f2 && c2 >= 1 && c2 <= w2, s"doc 2 should be contaminated: $rep")
    val (w4, c4, f4) = rep(4L)
    assert(!f4 && c4 === 0L && w4 >= 1)
    // windowless short doc: present, zero windows, not contaminated
    assert(rep(6L) === ((0L, 0L, false)))
  }

  test("report is empty-safe when the eval split is empty") {
    val rep = Contamination.report(docs, lit(false))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rep.values.forall(_ == 0L))
    assert(rep.keySet === Set(1L, 2L, 4L, 6L))
  }

  test("the eval hash set joins as a broadcast — the train scan never shuffles for it") {
    val plan = Contamination.report(docs, col("doc_id") % 2 === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan.take(600))
  }

  test("spanHashes: strided window count matches (n_chars - 32) div 8 + 1") {
    val counts = Contamination.spanHashes(docs)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Seq(1L, 2L, 4L).map { id =>
      val n = docs.where(col("doc_id") === id).head().getAs[Long]("n_chars")
      id -> ((n - 32) / 8 + 1)
    }.toMap
    assert(counts === expect)
  }

  test("byte-slice fast path: span/gram hashes identical on ASCII AND non-ASCII text") {
    // The r16 extraction fast path slices UTF-8 BYTES when a doc proves
    // ASCII and falls back to char substrings otherwise — hashes must be
    // bit-identical to the plain char formulation on every input,
    // including multibyte text where char index != byte index.
    import org.apache.spark.sql.functions.{expr, md5}
    import spark.implicits._
    val mixed = Seq(
      (1L, "plain ascii text long enough to carry several strided windows here"),
      (2L, "café naïve résumé über straße touché " +
        "déjà vu søster œuvre garçon façade jalapeño"),
      (3L, "日本語のテキストです multibyte " +
        "中文文本 mixed with ascii to cross byte boundaries often"),
    ).toDF("doc_id", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")).cast("long"))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val charSpans = mixed.where(col("n_chars") >= 32)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.sequence(
            org.apache.spark.sql.functions.lit(1L), col("n_chars") - 31,
            org.apache.spark.sql.functions.lit(8L))).as("p"),
        col("text"))
      .select(col("doc_id"), col("p"),
        md5(expr("substring(text, CAST(p AS INT), 32)")).as("h"))
    assert(canon(Contamination.spanHashes(mixed, keepPos = true)) === canon(charSpans))
    // grams: winnowedFingerprints over the same corpus, both paths agree
    val viaOp = Contamination.winnowedFingerprints(mixed)
    val charGrams = {
      val g = mixed.where(col("n_chars") >= 8)
        .select(col("doc_id"),
          org.apache.spark.sql.functions.explode(
            org.apache.spark.sql.functions.sequence(
              org.apache.spark.sql.functions.lit(1L), col("n_chars") - 7)).as("p"),
          col("text"))
        .select(col("doc_id"), col("p"),
          (Dedup.portableHash60(expr("substring(text, CAST(p AS INT), 8)"))
            % 1099511627776L).as("h"))
      Contamination.winnowSelect(g, 4)
    }
    assert(canon(viaOp) === canon(charGrams))
  }

  test("winnowing guarantee: any shared substring of length >= k + w - 1 shares a fingerprint") {
    // the strided detector can alias past a short, unaligned leak; the
    // winnowed one cannot — verify the guarantee on deliberately
    // MISALIGNED 11-char leaks at several offsets
    val leak = "SECRETLEAKX" // exactly k + w - 1 = 11 chars
    val base = "abcdefghijklmnopqrstuvwxyz0123456789abcdefghijklmnop"
    val pairs = (0 until 5).map { off =>
      val train = base.substring(0, 13 + off) + leak + base.substring(13 + off)
      (100L + off, train)
    }
    val docsDf = (pairs :+ (1L, "prefix " + leak + " suffix padding"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val fps = Contamination.winnowedFingerprints(docsDf)
    val evalFps = fps.where(col("doc_id") === 1L).select("fp").distinct()
    val hits = fps.where(col("doc_id") >= 100L)
      .join(evalFps, Seq("fp"), "left_semi")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(hits == pairs.map(_._1).toSet,
      s"every train doc carries the 11-char leak and must share a fingerprint; got $hits")
  }

  test("winnowing selection is exact at positions past 2^20") {
    // Regression: an earlier (hash << 20 | pos) tie-break composite let
    // positions past 2^20 bleed into the hash bits, corrupting window
    // minima. Feed synthetic grams straight into the selection (the
    // extractor's substring cost is O(len²) — no need to pay it here):
    // a hash h0 planted at p = 2^20 + 2 among larger neighbors must be
    // the selected minimum of every window containing it. Under the old
    // packing, h * 2^20 + p with p > 2^20 carried into h's bits and a
    // smaller-hash gram could lose to a larger-hash one.
    val base = (1 << 20).toLong
    // positions base-1 .. base+6, hashes all 1000 except 5 at base+2;
    // under the packing bug, 5 * 2^20 + (base + 2) = 5*2^20 + 2^20 + 2
    // reads as hash 6 — LOSING to a 1000-hash gram only when that also
    // overflows; the decisive corruption is the fp value itself:
    // comp div 2^20 = 6, not 5.
    val grams = (0 until 8).map { i =>
      val p = base - 1 + i
      val h = if (i == 3) 5L else 1000L
      (1L, p, h)
    }.toDF("doc_id", "p", "h")
    val fps = Contamination.winnowSelect(grams, w = 4)
      .select("fp").as[Long].collect().toSet
    assert(fps.contains(5L), s"the planted minimum hash must be selected verbatim; got $fps")
    assert(!fps.contains(6L), s"no packing carry may corrupt a selected fp; got $fps")
  }

  test("winnowedFingerprints: deterministic and position-independent for identical text") {
    val d = Seq((1L, "the same text appears twice here"), (2L, "the same text appears twice here"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val fps = Contamination.winnowedFingerprints(d)
      .collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getLong(1)).sorted.toSeq }
    assert(fps(1L) == fps(2L), "identical docs must select identical fingerprint sets")
    assert(fps(1L).nonEmpty)
  }
}
