package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("bm25TopK ranks the term-dense short doc first") {
    val d = docs(
      1L -> "spark spark spark join",             // dense in query terms
      2L -> "spark filler filler filler filler filler filler filler",
      3L -> "filler filler filler filler",        // no hits
      4L -> "join vector",                        // two distinct rare-ish terms
    )
    val out = Relevance.bm25TopK(d, Seq("spark", "join", "vector"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 3 has no query terms -> absent
    assert(!out.map(_._1).contains(3L))
    // multi-term doc 4 (vector is rarest: df=1) outranks the one-term docs
    assert(out.head._1 === 4L && out.head._2 === 2L)
    // doc 1 (3x spark + join, short) outranks doc 2 (1x spark, long)
    val pos = out.map(_._1).zipWithIndex.toMap
    assert(pos(1L) < pos(2L))
    // scores strictly ordered (desc) with doc_id tiebreak
    assert(out.map(_._3).toSeq === out.map(_._3).sorted(Ordering[Long].reverse).toSeq)
  }

  test("bm25TopK: tf saturates (k1 bound) — 100x term count cannot 100x the score") {
    val d = docs(
      1L -> ("spark " * 100).trim,
      2L -> "spark",
    )
    val out = Relevance.bm25TopK(d, Seq("spark"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) > out(2L))
    // saturation: the (k1+1) ceiling caps the ratio well under tf ratio
    assert(out(1L) < out(2L) * 10)
  }
}
