package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The native shingle Generator must be drop-in exchangeable with the
  * composed Column form (`Dedup.shingleRows`) — full multiset identity
  * over the fixture corpus, plus the edge contracts (null text, short
  * docs, whitespace-only, duplicate shingles kept).
  */
class ShingleGenSpec extends SparkSpec {
  import spark.implicits._

  test("SQL table function output is multiset-identical to Dedup.shingleRows") {
    val docs = Tables.documents(spark, sf0001)
    docs.createOrReplaceTempView("docs_sgspec")
    val viaUdtf = spark.sql(
      """SELECT doc_id, s.shingle
        |FROM docs_sgspec LATERAL VIEW graft_shingles(text, 3) s AS shingle""".stripMargin)
      .as[(Long, String)].collect().sorted
    val viaColumns = graft.operators.Dedup.shingleRows(docs, 3)
      .as[(Long, String)].collect().sorted
    assert(viaUdtf.length === viaColumns.length)
    assert(viaUdtf === viaColumns)
  }

  test("edge contracts: null, short, whitespace-only, duplicates") {
    val d = Seq(
      (1L, null.asInstanceOf[String]),      // null -> no rows
      (2L, "one two"),                      // < k words -> no rows
      (3L, "   \t  "),                      // space-trim leaves "\t" (Spark parity)
      (4L, "a b a b a b"),                  // duplicate shingles KEPT
      (5L, "  Mixed CASE   words here "),   // lower + trim + \s+ split
    ).toDF("doc_id", "text")
    d.createOrReplaceTempView("docs_sgspec_edge")
    val got = spark.sql(
      """SELECT doc_id, s.shingle
        |FROM docs_sgspec_edge LATERAL VIEW graft_shingles(text, 2) s AS shingle""".stripMargin)
      .as[(Long, String)].collect().toSeq.sorted
    assert(!got.exists(_._1 == 1L))                       // null -> no rows
    assert(got.filter(_._1 == 2L).map(_._2) === Seq("one two")) // k=2: one shingle
    // Spark's trim strips SPACES only, so "   \t  " trims to "\t", which
    // \s+-splits (limit -1) into two empty words -> one " " shingle at
    // k=2. The generator must reproduce this exactly — it is what
    // Dedup.shingleRows computes (drop-in exchangeability over elegance).
    assert(got.filter(_._1 == 3L).map(_._2) === Seq(" "))
    assert(got.filter(_._1 == 4L).map(_._2) ===
      Seq("a b", "a b", "a b", "b a", "b a").sorted)
    assert(got.filter(_._1 == 5L).map(_._2) ===
      Seq("case words", "mixed case", "words here"))
  }
}
