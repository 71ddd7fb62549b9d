package graft.tools

/** Dev-only probe: verifies the m10 JPEG design — constant-value 8×8
  * grayscale blocks, encoded with the JDK's JPEG codec at high quality,
  * decode back with per-block mean error small enough that an integer
  * census ((mean+8) div 16 of levels 16k+8) recovers k exactly.
  * Prints the max |decoded block mean − encoded level| over a sweep.
  */
object ScratchJpeg {
  def main(args: Array[String]): Unit = {
    var worst = 0.0
    var worstInfo = ""
    for (id <- 0L until 200L) {
      val bw = (2 + id % 3).toInt // blocks across
      val bh = (2 + id % 2).toInt // blocks down
      val (w, h) = (bw * 8, bh * 8)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      for (by <- 0 until bh; bx <- 0 until bw) {
        val level = 16 * ((id * 5 + bx * 3 + by * 7) % 16).toInt + 8
        for (y <- by * 8 until by * 8 + 8; x <- bx * 8 until bx * 8 + 8)
          raster.setSample(x, y, 0, level)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.95f)
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      writer.dispose(); ios.close()
      val dec = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      val dr = dec.getRaster
      for (by <- 0 until bh; bx <- 0 until bw) {
        val level = 16 * ((id * 5 + bx * 3 + by * 7) % 16).toInt + 8
        var s = 0L
        for (y <- by * 8 until by * 8 + 8; x <- bx * 8 until bx * 8 + 8)
          s += dr.getSample(x, y, 0)
        val mean = s / 64.0
        val err = math.abs(mean - level)
        if (err > worst) { worst = err; worstInfo = s"id=$id bx=$bx by=$by level=$level mean=$mean" }
        // census recovery check
        val census = ((s / 64 + 8) / 16).toInt
        val want = ((id * 5 + bx * 3 + by * 7) % 16).toInt + 0
        val wantCensus = (level + 8) / 16
        if (census != wantCensus)
          println(s"CENSUS MISS id=$id bx=$bx by=$by level=$level mean=$mean census=$census want=$wantCensus (k=$want)")
      }
    }
    println(s"worst block-mean error: $worst  at  $worstInfo")
  }
}
