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

  test("wav round-trip: AudioSystem decode recovers the exact PCM formula stats") {
    // 3 -> mono, 4 -> stereo (interleave path), 13 -> mono long clip
    val ids = Seq(3L, 4L, 13L).toDF("doc_id")
    val wavs = Multimodal.synthesizeWav(spark, ids).collect()
    // the payloads are REAL RIFF/WAVE containers, all distinct
    assert(wavs.forall(w => new String(w.wav.take(4), "US-ASCII") == "RIFF"
      && new String(w.wav.slice(8, 12), "US-ASCII") == "WAVE"))
    assert(wavs.map(_.wav.toSeq).distinct.length == 3)

    val stats = Multimodal.decodeWavStats(spark,
      Multimodal.synthesizeWav(spark, ids)).collect().sortBy(_.doc_id)
    for (s <- stats) {
      val ch = Multimodal.wavChannels(s.doc_id)
      val n = Multimodal.wavFrames(s.doc_id)
      assert(s.channels == ch && s.n_frames == n.toLong)
      var (sum, sumAbs, energy) = (0L, 0L, 0L)
      var peak = 0
      for (i <- 0 until n; c <- 0 until ch) {
        val v = Multimodal.wavSample(s.doc_id, c, i)
        sum += v; sumAbs += math.abs(v); energy += v.toLong * v
        peak = math.max(peak, math.abs(v))
      }
      assert((s.sum_samples, s.sum_abs, s.peak, s.energy)
        == ((sum, sumAbs, peak, energy)),
        s"decoded sample stats diverged for doc ${s.doc_id}")
    }
  }

  test("gif round-trip: every animated frame decodes to the exact formula stats") {
    // 6 -> 2 frames, 7 -> 3 frames, 16 -> 4-frame wide clip
    val ids = Seq(6L, 7L, 16L).toDF("doc_id")
    val gifs = Multimodal.synthesizeGif(spark, ids).collect()
    // the payloads are REAL animated GIFs (GIF89a magic), all distinct
    assert(gifs.forall(g => new String(g.gif.take(6), "US-ASCII").startsWith("GIF8")))
    assert(gifs.map(_.gif.toSeq).distinct.length == 3)

    val stats = Multimodal.decodeGifFrameStats(spark,
        Multimodal.synthesizeGif(spark, ids))
      .collect().groupBy(_.doc_id)
    for (id <- Seq(6L, 7L, 16L)) {
      val (w, h, nf) =
        (Multimodal.gifWidth(id), Multimodal.gifHeight(id), Multimodal.gifFrames(id))
      val frames = stats(id).sortBy(_.frame_idx)
      assert(frames.length == nf && frames.forall(_.n_frames == nf),
        s"clip $id must decode ALL $nf frames, got ${frames.length}")
      var prev: Array[Long] = null
      for (f <- 0 until nf) {
        val gray = (0 until h).flatMap(y =>
          (0 until w).map(x => 51L * Multimodal.gifPixelIdx(id, f, x, y))).toArray
        val gsum = gray.sum
        val psum = gray.zipWithIndex.map { case (g, p) => g * (p + 1) }.sum
        val dsum =
          if (prev == null) 0L
          else gray.zip(prev).map { case (a, b) => math.abs(a - b) }.sum
        prev = gray
        val s = frames(f)
        assert((s.gray_sum, s.pos_checksum, s.delta_prev) == ((gsum, psum, dsum)),
          s"decoded frame stats diverged for clip $id frame $f")
      }
    }
  }

  test("jpeg round-trip: block census survives the lossy codec exactly") {
    // 9 -> 2x3 blocks, 19 -> 3x2, 29 -> 4x3 (the m10 doc_id%10==9 slice
    // hits all (bw,bh) combinations via %3/%2)
    val ids = Seq(9L, 19L, 29L, 39L, 49L, 59L).toDF("doc_id")
    val jpegs = Multimodal.synthesizeJpeg(spark, ids).collect()
    // payloads are REAL JPEGs (SOI marker FF D8), all distinct
    assert(jpegs.forall(j => (j.jpeg(0) & 0xff) == 0xff && (j.jpeg(1) & 0xff) == 0xd8))
    assert(jpegs.map(_.jpeg.toSeq).distinct.length == 6)

    val stats = Multimodal.decodeJpegBlockStats(spark,
        Multimodal.synthesizeJpeg(spark, ids))
      .collect().map(s => s.doc_id -> s).toMap
    for (id <- Seq(9L, 19L, 29L, 39L, 49L, 59L)) {
      val (bw, bh) = (Multimodal.jpegBlocksW(id), Multimodal.jpegBlocksH(id))
      val census = for (by <- 0 until bh; bx <- 0 until bw)
        yield (bx, by, (Multimodal.jpegLevel(id, bx, by) + 8L) / 16L)
      val s = stats(id)
      assert(s.width == bw * 8 && s.height == bh * 8 && s.n_blocks == bw * bh)
      assert(s.sum_census == census.map(_._3).sum,
        s"lossy wobble exceeded the +-7 census headroom for image $id")
      assert(s.pos_checksum ==
        census.map { case (bx, by, c) => c * (by * bw + bx + 1) }.sum,
        s"block order / stride diverged for image $id")
    }
  }

  test("wav fingerprint: decoded windows reproduce the formula's loudness bits") {
    // 5 -> stereo, 15 -> mono, spanning several frame lengths
    val idSeq = Seq(5L, 15L, 25L, 35L, 45L, 55L)
    val fps = Multimodal.decodeWavFingerprint(spark,
        Multimodal.synthesizeWav(spark, idSeq.toDF("doc_id")))
      .collect().map(f => f.doc_id -> f).toMap
    for (id <- idSeq) {
      val ch = Multimodal.wavChannels(id)
      val n = Multimodal.wavFrames(id)
      val mags = (0 until n).map(i =>
        (0 until ch).map(c => math.abs(Multimodal.wavSample(id, c, i)).toLong).sum)
      val winSum = new Array[Long](16)
      val winCnt = new Array[Long](16)
      for (i <- 0 until n) { winSum(i * 16 / n) += mags(i); winCnt(i * 16 / n) += 1 }
      val total = winSum.sum
      val expected = (0 until 16)
        .filter(k => winSum(k) * n > total * winCnt(k))
        .map(1L << _).sum
      val f = fps(id)
      assert(f.channels == ch && f.n_frames == n)
      assert(f.afp == expected, s"fingerprint diverged for clip $id")
    }
  }

  test("avi round-trip: RIFF walk + per-frame MJPEG decode recover the formula") {
    // 2 -> 3 frames 4x3 blocks, 12 -> 2 frames, 22 -> 4 frames (the m11
    // doc_id%10==2 slice walks all frame counts and block-grid combos)
    val idSeq = Seq(2L, 12L, 22L, 32L, 42L, 52L)
    val ids = idSeq.toDF("doc_id")
    val avis = Multimodal.synthesizeAvi(spark, ids).collect()
    // payloads are REAL RIFF-AVI containers, all distinct
    assert(avis.forall(a =>
      new String(a.avi, 0, 4, "US-ASCII") == "RIFF" &&
        new String(a.avi, 8, 4, "US-ASCII") == "AVI "))
    assert(avis.map(_.avi.toSeq).distinct.length == idSeq.length)

    val stats = Multimodal.decodeAviFrameStats(spark,
        Multimodal.synthesizeAvi(spark, ids))
      .collect().groupBy(_.doc_id)
    for (id <- idSeq) {
      val (bw, bh, nf) =
        (Multimodal.aviBlocksW(id), Multimodal.aviBlocksH(id), Multimodal.aviFrames(id))
      val rows = stats(id).sortBy(_.frame_idx)
      assert(rows.length == nf, s"clip $id: frame count")
      for (f <- 0 until nf) {
        val census = for (by <- 0 until bh; bx <- 0 until bw)
          yield (bx, by, Multimodal.aviCensus(id, f, bx, by).toLong)
        val r = rows(f)
        assert(r.width == bw * 8 && r.height == bh * 8 && r.n_frames == nf)
        assert(r.sum_census == census.map(_._3).sum,
          s"lossy wobble exceeded the +-7 census headroom for clip $id frame $f")
        assert(r.pos_checksum ==
          census.map { case (bx, by, c) => c * (by * bw + bx + 1) }.sum,
          s"block order / stride diverged for clip $id frame $f")
        val expDelta = if (f == 0) 0L
        else census.map { case (bx, by, c) =>
          math.abs(c - Multimodal.aviCensus(id, f - 1, bx, by)) }.sum
        assert(r.delta_census == expDelta,
          s"inter-frame census delta diverged for clip $id frame $f")
      }
    }
  }

  test("avi decoder rejects an incoherent container") {
    val rec = Multimodal.synthesizeAvi(spark, Seq(2L).toDF("doc_id")).collect()(0)
    // truncate the movi list: drop the last frame chunk but keep the
    // avih frame count — the decoder must fail loudly, not skew stats
    val cut = rec.avi.length - 200
    val torn = java.util.Arrays.copyOf(rec.avi, cut)
    // patch the RIFF size so the walk stays in bounds
    val sz = cut - 8
    torn(4) = (sz & 0xff).toByte
    torn(5) = ((sz >> 8) & 0xff).toByte
    torn(6) = ((sz >> 16) & 0xff).toByte
    torn(7) = ((sz >>> 24) & 0xff).toByte
    val ds = Multimodal.decodeAviFrameStats(spark,
      Seq(Multimodal.AviRecord(2L, torn)).toDS())
    val e = intercept[org.apache.spark.SparkException] { ds.collect() }
    assert(e.getMessage != null)
  }

  test("m10 plan shape: codec mapPartitions chain, zero Exchange") {
    // synthesize -> encode -> decode is per-row codec work; like m6/m7,
    // the whole chain must stay in the scan stage (a shuffle of encoded
    // payloads would move the corpus for nothing)
    val ids = graft.Tables.documents(spark, sf0001)
      .where(org.apache.spark.sql.functions.col("doc_id") % 10 === 9)
    val plan = Multimodal.decodeJpegBlockStats(spark,
        Multimodal.synthesizeJpeg(spark, ids))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"m10 plan grew a shuffle:\n${plan.take(500)}")
  }

  test("m11 plan shape: container+codec mapPartitions chain, zero Exchange") {
    // synthesize (JPEG encode + RIFF assembly) -> decode (RIFF walk +
    // JPEG decode) is per-row codec work: the whole chain must stay in
    // the scan stage like m6/m7/m9/m10
    val ids = graft.Tables.documents(spark, sf0001)
      .where(org.apache.spark.sql.functions.col("doc_id") % 10 === 2)
    val plan = Multimodal.decodeAviFrameStats(spark,
        Multimodal.synthesizeAvi(spark, ids))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"m11 plan grew a shuffle:\n${plan.take(500)}")
  }
}
