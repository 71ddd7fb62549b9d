package graft.operators

import graft.SparkSpec
import java.security.MessageDigest

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val d = Seq((1L, "hello world"), (2L, "xyz")).toDF("doc_id", "text")

  test("mediaMeta: byte length and md5 of the payload") {
    val r = Multimodal.mediaMeta(d).orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("n_bytes") == 11)
    val expected = MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r(0).getAs[String]("digest") == expected)
  }

  test("extractFeatures: deterministic stub features, one row per doc") {
    val f1 = Multimodal.extractFeatures(spark, d).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(spark, d).collect().sortBy(_.doc_id)
    assert(f1.length == 2)
    assert(f1.head.n_bytes == 11)
    assert(f1.head.features.length == 8)
    assert(math.abs(f1.head.features.sum - 1.0f) < 1e-6) // normalized histogram
    assert(f1.zip(f2).forall { case (a, b) =>
      a.width == b.width && a.features.sameElements(b.features)
    })
  }

  test("batching: partition batches never cross partition bounds") {
    val many = (1L to 200L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, many, batchSize = 16).collect()
    assert(feats.length == 200)
    assert(feats.map(_.doc_id).distinct.length == 200)
  }

  test("png round-trip: ImageIO decode recovers the exact pixel formula sums") {
    val ids = Seq(0L, 7L, 123L).toDF("doc_id")
    val pngs = Multimodal.synthesizePng(spark, ids).collect()
    // the payloads are REAL PNGs (magic bytes), all distinct
    assert(pngs.forall(p => (p.png(1) & 0xff) == 'P' && (p.png(2) & 0xff) == 'N'))
    assert(pngs.map(_.png.toSeq).distinct.length == 3)

    val stats = Multimodal.decodePngStats(spark,
      Multimodal.synthesizePng(spark, ids)).collect().sortBy(_.doc_id)
    for (s <- stats) {
      val (w, h) = (Multimodal.pngWidth(s.doc_id), Multimodal.pngHeight(s.doc_id))
      assert(s.width == w && s.height == h)
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.pngPixel(s.doc_id, x, y)
        er += r; eg += g; eb += b
      }
      assert((s.sum_r, s.sum_g, s.sum_b) == ((er, eg, eb)),
        s"decoded channel sums diverged for doc ${s.doc_id}")
    }
  }
}
