package graft.tools

import graft.operators.Multimodal
import org.apache.spark.sql.SparkSession

/** Dev probe: GIF multi-frame round-trip exactness vs the pixel formula. */
object ScratchGif {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val idList = Seq(0L, 1L, 2L, 3L, 6L, 16L, 26L, 1006L)
    val ids = idList.toDF("doc_id")
    val got = Multimodal.decodeGifFrameStats(spark, Multimodal.synthesizeGif(spark, ids))
      .collect().map(s => (s.doc_id, s.frame_idx) -> s).toMap
    def pix(id: Long, f: Int, x: Int, y: Int): Long =
      51L * (((id * 31 + f * 59 + x * 7 + y * 13) % 16 + 16) % 16)
    var bad = 0
    idList.foreach { id =>
      val w = (8 + (id % 4) * 4).toInt
      val h = (6 + (id % 2) * 4).toInt
      val nf = (2 + id % 3).toInt
      var prev: Array[Long] = null
      (0 until nf).foreach { f =>
        val gray = (0 until h).flatMap(y => (0 until w).map(x => pix(id, f, x, y))).toArray
        val gsum = gray.sum
        val psum = gray.zipWithIndex.map { case (g, p) => g * (p + 1) }.sum
        val dsum = if (prev == null) 0L else gray.zip(prev).map { case (a, b) => math.abs(a - b) }.sum
        prev = gray
        val s = got((id, f))
        if ((s.gray_sum, s.pos_checksum, s.delta_prev, s.n_frames) != ((gsum, psum, dsum, nf))) {
          bad += 1
          println(s"MISMATCH id=$id f=$f got=(${s.gray_sum},${s.pos_checksum},${s.delta_prev},${s.n_frames}) want=($gsum,$psum,$dsum,$nf)")
        }
      }
    }
    println(s"done, $bad mismatches over ${got.size} frames")
    spark.stop()
  }
}
