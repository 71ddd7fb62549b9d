package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants of [[Contamination.removeDuplicateSpans]] the
  * hash-oracle can't state: planted cross-doc duplicates come OUT, and
  * exactly they — uniques, within-doc repeats, and short docs pass
  * through verbatim. Window = 32 chars, stride = 8, so a shared passage
  * aligned to the stride grid in both docs (offsets ≡ 0 mod 8) yields
  * the same set of duplicated windows in each.
  */
class SpanRemovalSpec extends SparkSpec {

  test("planted duplicates are removed, everything else passes through") {
    import spark.implicits._
    // 50-char passage, planted at 0-based offset 0 in doc 1 and offset 40
    // (≡ 0 mod 8, so the stride grids coincide) in doc 2: duplicated
    // windows at passage offsets 0/8/16 merge to one 48-char interval.
    val passage = "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG NO 42!"
    assert(passage.length == 50)
    val doc1 = passage + "a" * 46                  // n = 96
    val doc2 = "b" * 40 + passage + "c" * 6        // n = 96
    val doc3 = "Gg" * 30                           // within-doc repeats only
    val twin = "0123456789abcdef" * 6              // n = 96, (96-32) % 8 == 0
    val doc6 = "tiny"                              // < window, no spans
    val docs = Seq(
      (1L, doc1), (2L, doc2), (3L, doc3), (4L, twin), (5L, twin), (6L, doc6),
    ).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))

    val out = Contamination.removeDuplicateSpans(docs)
      .orderBy("doc_id").collect()
    assert(out.length == 6)
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap

    // conservation: removed + kept chars == original length, every doc
    for (r <- out) {
      val id = r.getAs[Long]("doc_id")
      val orig = docs.where(col("doc_id") === id).head.getAs[String]("text")
      assert(r.getAs[Long]("removed_chars") + r.getAs[Long]("n_chars_clean")
        == orig.length.toLong, s"doc $id does not conserve characters")
    }

    // docs 1+2: one merged 48-char interval each, covering the stride-
    // quantized passage ([1,48] in doc 1, [41,88] in doc 2)
    assert(byId(1L).getAs[Long]("n_spans_removed") == 1L)
    assert(byId(1L).getAs[Long]("removed_chars") == 48L)
    assert(byId(1L).getAs[String]("clean_text") == doc1.substring(48))
    assert(byId(2L).getAs[Long]("n_spans_removed") == 1L)
    assert(byId(2L).getAs[Long]("removed_chars") == 48L)
    assert(byId(2L).getAs[String]("clean_text") ==
      doc2.substring(0, 40) + doc2.substring(88))

    // doc 3: within-doc repetition alone never triggers removal
    assert(byId(3L).getAs[Long]("n_spans_removed") == 0L)
    assert(byId(3L).getAs[String]("clean_text") == doc3)

    // docs 4+5: identical twins with (n-32) % 8 == 0 are removed WHOLE
    for (id <- Seq(4L, 5L)) {
      assert(byId(id).getAs[Long]("removed_chars") == 96L, s"doc $id")
      assert(byId(id).getAs[String]("clean_text") == "", s"doc $id")
      assert(byId(id).getAs[Long]("n_chars_clean") == 0L, s"doc $id")
    }

    // doc 6: shorter than one window — no spans by definition
    assert(byId(6L).getAs[Long]("n_spans_removed") == 0L)
    assert(byId(6L).getAs[String]("clean_text") == doc6)
  }

  test("adjacent duplicated intervals merge; disjoint ones stay separate") {
    import spark.implicits._
    // two DIFFERENT shared passages planted far apart in one doc pair →
    // two merged intervals, not one (the gap between them is unique text)
    val p1 = "SHARED ALPHA PASSAGE WITH 32+ CHARS HERE!" // 41 chars
    val p2 = "SHARED BETA PASSAGE ALSO OVER 32 CHARS!!"  // 40 chars
    assert(p1.length == 41 && p2.length == 40)
    // offsets 0 and 96 in doc 1; 8 and 104 in doc 2 (both ≡ 0 mod 8)
    val d1 = p1 + "x" * (96 - p1.length) + p2 + "y" * 8
    val d2 = "z" * 8 + p1 + "w" * (104 - 8 - p1.length) + p2 + "v" * 8
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = Contamination.removeDuplicateSpans(docs)
      .orderBy("doc_id").collect()
    for (r <- out)
      assert(r.getAs[Long]("n_spans_removed") == 2L,
        s"expected two disjoint intervals, got $r")
    // the unique filler between the passages survives in both docs
    assert(out(0).getAs[String]("clean_text").contains("x" * 10))
    assert(out(1).getAs[String]("clean_text").contains("w" * 10))
  }

  test("keepFirst: the lowest doc keeps its copy verbatim; later docs lose theirs") {
    import spark.implicits._
    val twin = "0123456789abcdef" * 6 // 96 chars, stride-aligned
    val docs = Seq(
      (1L, twin), (2L, twin), (3L, twin), (4L, "unique text with no twin at all.."),
    ).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = Contamination.removeDuplicateSpans(docs, keepFirst = true)
      .orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // canonical copy (lowest id) is untouched
    assert(out(1L).getAs[String]("clean_text") == twin)
    assert(out(1L).getAs[Long]("n_spans_removed") == 0L)
    // every later twin is removed whole
    for (id <- Seq(2L, 3L)) {
      assert(out(id).getAs[String]("clean_text") == "", s"doc $id")
      assert(out(id).getAs[Long]("removed_chars") == 96L, s"doc $id")
    }
    // unrelated doc passes through under either mode
    assert(out(4L).getAs[Long]("n_spans_removed") == 0L)

    // and the default (decontamination) mode removes ALL copies,
    // including the canonical one — the two semantics differ exactly there
    val all = Contamination.removeDuplicateSpans(docs)
      .orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(all(1L).getAs[String]("clean_text") == "")
  }
}
