package graft.multimodal

import scala.util.Random

import graft.SparkSpec

/** Property-pins [[MediaDecoder.imagePhash]] on ARBITRARY images — the
  * oracle replay only covers the structured ImageGen family, which
  * could mask block-indexing bugs (e.g. a transposed bx/by) that its
  * regular gradients happen to survive. Here: random pixels, random
  * non-square dims, and an independent reimplementation straight off
  * the pixel array (never through the decoder).
  */
class PhashPropertySpec extends SparkSpec {

  private def pngOf(px: Array[Array[Int]]): Array[Byte] = {
    val (h, w) = (px.length, px(0).length)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(y)(x))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Reference hash computed directly from the pixel matrix. */
  private def refHash(px: Array[Array[Int]]): (Long, Long) = {
    val (h, w) = (px.length, px(0).length)
    val bs = new Array[Long](64); val bc = new Array[Long](64)
    var t = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = px(y)(x)
      val g = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
      val b = (y * 8 / h) * 8 + (x * 8 / w)
      bs(b) += g; bc(b) += 1; t += g
    }
    val n = w.toLong * h
    var (hi, lo) = (0L, 0L)
    for (b <- 0 until 64 if bs(b) * n > t * bc(b))
      if (b >= 32) hi |= 1L << (b - 32) else lo |= 1L << b
    (hi, lo)
  }

  test("decode-path hash equals the direct pixel-matrix hash on random images") {
    val rnd = new Random(42)
    for (trial <- 0 until 25) {
      val w = 8 + rnd.nextInt(40)
      val h = 8 + rnd.nextInt(40)
      val px = Array.fill(h, w)(rnd.nextInt(1 << 24))
      val got = MediaDecoder.imagePhash(pngOf(px))
        .getOrElse(fail(s"trial $trial: decode failed"))
      val (hi, lo) = refHash(px)
      assert((got.hashHi, got.hashLo) == (hi, lo),
        s"trial $trial (${w}x$h): got (${got.hashHi},${got.hashLo}), " +
          s"want ($hi,$lo)")
      assert(got.width == w && got.height == h)
    }
  }

  test("constant image hashes to all-zero bits (no block strictly above mean)") {
    val px = Array.fill(16, 16)(0x7f7f7f)
    val got = MediaDecoder.imagePhash(pngOf(px)).get
    assert(got.hashHi == 0L && got.hashLo == 0L)
  }
}
