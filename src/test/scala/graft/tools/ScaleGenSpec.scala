package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the ADVICE-r13 suffix-mode contract: composed suffix trees are
  * collision-free BECAUSE every copy (including 0) carries its tag —
  * with a pristine copy 0, composed copies (0,c) and (c,0) are
  * byte-identical exact duplicates, silently re-inflating the dedup
  * family's near-dup mass at composed scale factors.
  */
class ScaleGenSpec extends SparkSpec {

  test("composed suffix trees have zero cross-copy exact-duplicate texts") {
    val g1 = Scratch.dir("scalegen-g1").toString
    val g2 = Scratch.dir("scalegen-g2").toString
    ScaleGen.generate(spark, sf0001, g1, factor = 2, suffixMode = true)
    ScaleGen.generate(spark, g1, g2, factor = 2, suffixMode = true)

    val base = spark.read.parquet(s"$sf0001/documents.parquet").count()
    val docs = spark.read.parquet(s"$g2/documents.parquet")
    assert(docs.count() == base * 4, "factor 2 composed twice = 4x rows")

    // The base fixture has organic exact dups; suffix tagging must not
    // ADD any across copies: every base text group of size k must map
    // to 4 groups of size k, i.e. the dup mass scales exactly linearly.
    def dupMass(df: org.apache.spark.sql.DataFrame): Long = df
      .groupBy("text").agg(count(lit(1)).as("k"))
      .where(col("k") > 1)
      .agg(coalesce(sum(col("k")), lit(0L))).head.getLong(0)
    val baseDup = dupMass(spark.read.parquet(s"$sf0001/documents.parquet"))
    assert(dupMass(docs) == baseDup * 4,
      "composed suffix mode must not create cross-copy exact duplicates " +
        "(copy 0 must be tagged too)")
  }

  test("suffix tags are fixed-width so composition stays injective") {
    val g1 = Scratch.dir("scalegen-tag").toString
    ScaleGen.generate(spark, sf0001, g1, factor = 3, suffixMode = true)
    val texts = spark.read.parquet(s"$g1/documents.parquet")
      .select(col("doc_id"), col("text"))
    // word counts preserved: the tag appends to words, never splits them
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id") % 100000 as "k", // ids are offset by stride
        size(split(col("text"), "\\s+")).as("w"))
    val wordsPerCopy = texts
      .select(size(split(col("text"), "\\s+")).as("w"))
      .agg(sum("w")).head.getLong(0)
    val wordsBase = base.agg(sum("w")).head.getLong(0)
    assert(wordsPerCopy == wordsBase * 3, "word boundaries preserved")
  }

  test("factor rails: rotation caps at 26, suffix at 676") {
    val out = Scratch.dir("scalegen-rails").toString
    intercept[IllegalArgumentException] {
      ScaleGen.generate(spark, sf0001, out, factor = 27)
    }
    intercept[IllegalArgumentException] {
      ScaleGen.generate(spark, sf0001, out, factor = 677, suffixMode = true)
    }
  }
}
