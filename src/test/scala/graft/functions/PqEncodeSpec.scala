package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

class PqEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def q20(v: org.apache.spark.sql.Column) =
    floor(v.cast("double") * 1048576.0).cast(LongType)

  test("native kernel is bit-identical to the HOF-composed argmin folds") {
    val nSub = 8
    val emb = Tables.embeddings(spark, sf0001)
    val sample = emb.orderBy(col("vec_id")).limit(32)
      .select(col("vec_id").as("cw_id"),
        transform(col("embedding"), v => q20(v)).as("qcw"))
    val cbArr = broadcast(sample.agg(
      transform(
        array_sort(collect_list(struct(col("cw_id"), col("qcw")))),
        e => e.getField("qcw")).as("__cbv")))
    // reference: the slice+zip_with+fold composition PqEncode replaces
    def subL2(v: org.apache.spark.sql.Column, cw: org.apache.spark.sql.Column,
        s: Int, subdim: org.apache.spark.sql.Column) =
      aggregate(
        zip_with(
          slice(v, subdim * s + 1, subdim),
          slice(cw, subdim * s + 1, subdim),
          (a, b) => coalesce((a - b) * (a - b), lit(0L))),
        lit(0L),
        (acc, d) => acc + d)
    def refCode(s: Int) =
      aggregate(
        col("__cbv"),
        struct(lit(Long.MaxValue).as("d"), lit(-1L).as("j"), lit(-1L).as("pos")),
        (acc, cw) => {
          val d = subL2(col("__qv"), cw, s, col("__subdim"))
          val nextPos = acc.getField("pos") + 1L
          when(d < acc.getField("d"),
            struct(d.as("d"), nextPos.as("j"), nextPos.as("pos")))
            .otherwise(struct(acc.getField("d").as("d"),
              acc.getField("j").as("j"), nextPos.as("pos")))
        }).getField("j")
    val both = emb
      .select(col("vec_id"), col("embedding"),
        transform(col("embedding"), v => q20(v)).as("__qv"))
      .withColumn("__subdim", size(col("__qv")) / nSub)
      .crossJoin(cbArr)
      .select(
        PqEncode.encode(col("embedding"), col("__cbv"), nSub).as("native"),
        array((0 until nSub).map(s => refCode(s)): _*).as("ref"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r)
    }
  }

  test("tie-break keeps the lowest codebook position") {
    // two identical codewords: every subspace distance ties; the argmin
    // must keep position 0
    val df = Seq((Array.fill(8)(0.5f))).toDF("embedding")
      .withColumn("cb", array(
        transform(col("embedding"), v => q20(v)),
        transform(col("embedding"), v => q20(v))))
    val codes = df.select(PqEncode.encode(col("embedding"), col("cb"), 4).as("c"))
      .collect().head.getSeq[Long](0)
    assert(codes == Seq(0L, 0L, 0L, 0L))
  }

  test("null embedding elements contribute nothing; null array yields null") {
    val withNull = Seq(
      (1L, Array[java.lang.Float](1.0f, null, 1.0f, null)),
      (2L, Array[java.lang.Float](1.0f, 1.0f, 1.0f, 1.0f)),
    ).toDF("vec_id", "embedding")
    val cb = array(
      typedLit(Seq(1048576L, 1048576L, 1048576L, 1048576L)),  // codeword 0: all 1.0
      typedLit(Seq(0L, 0L, 0L, 0L)))                          // codeword 1: all 0.0
    val r = withNull
      .select(col("vec_id"), PqEncode.encode(col("embedding"), cb, 2).as("c"))
      .orderBy("vec_id").collect()
    // vec 1: null dims drop from the distance → still nearest to cw 0
    assert(r(0).getSeq[Long](1) == Seq(0L, 0L))
    assert(r(1).getSeq[Long](1) == Seq(0L, 0L))
    val nullArr = Seq((3L, null.asInstanceOf[Array[java.lang.Float]]))
      .toDF("vec_id", "embedding")
      .select(PqEncode.encode(col("embedding"), cb, 2).as("c")).collect()
    assert(nullArr.head.isNullAt(0))
  }

  test("random vectors/codebooks: kernel matches a plain-Scala reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(77L + i)))
    def refCodes(v: Array[Float], cb: Seq[Array[Float]], nSub: Int): Seq[Long] = {
      val q = v.map(x => math.floor(x.toDouble * 1048576.0).toLong)
      val qcb = cb.map(_.map(x => math.floor(x.toDouble * 1048576.0).toLong))
      val sd = v.length / nSub
      (0 until nSub).map { s =>
        var bestD = Long.MaxValue; var bestJ = -1L
        for (j <- qcb.indices) {
          var d = 0L
          for (i <- 0 until sd) {
            val di = s * sd + i
            if (di < qcb(j).length) { val df = q(di) - qcb(j)(di); d += df * df }
          }
          if (d < bestD) { bestD = d; bestJ = j }
        }
        bestJ
      }
    }
    val nSub = 4
    val gen = for {
      dim <- Gen.oneOf(4, 8, 16)
      nCw <- Gen.choose(1, 6)
      vec <- Gen.listOfN(dim, Gen.choose(-1.0f, 1.0f))
      cb <- Gen.listOfN(nCw, Gen.listOfN(dim, Gen.choose(-1.0f, 1.0f)))
    } yield (vec.toArray, cb.map(_.toArray))
    val cases = samples(gen, 20)
    val df = cases.zipWithIndex.map { case ((v, cb), i) =>
      (i.toLong, v, cb.map(_.map(x => math.floor(x.toDouble * 1048576.0).toLong).toSeq).toSeq)
    }.toDF("case_id", "embedding", "cb")
    val got = df
      .select(col("case_id"), PqEncode.encode(col("embedding"), col("cb"), nSub).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    cases.zipWithIndex.foreach { case ((v, cb), i) =>
      assert(got(i.toLong) == refCodes(v, cb, nSub), s"case $i: v=${v.toSeq} cb=${cb.map(_.toSeq)}")
    }
  }

  test("non-splittable vectors yield NULL codes, not silently-wrong ones") {
    // len 5 % nSub 2 != 0 → trailing-dim ambiguity → NULL; len 1 < nSub 2
    // → subdim 0 degeneracy → NULL; empty → NULL
    val cb = array(typedLit(Seq(0L, 0L, 0L, 0L, 0L)))
    val r = Seq(
      (1L, Array.fill(5)(0.5f)),
      (2L, Array.fill(1)(0.5f)),
      (3L, Array.empty[Float]),
      (4L, Array.fill(4)(0.5f)), // splittable control
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), PqEncode.encode(col("embedding"), cb, 2).as("c"))
      .orderBy("vec_id").collect()
    assert(r(0).isNullAt(1) && r(1).isNullAt(1) && r(2).isNullAt(1))
    assert(!r(3).isNullAt(1) && r(3).getSeq[Long](1) == Seq(0L, 0L))
  }
}
