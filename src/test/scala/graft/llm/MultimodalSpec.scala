package graft.llm

import graft.SparkSpec

/** The codec is real: these laws fail if [[Multimodal.encodeKernel]]
  * stops producing genuine PNG streams or [[Multimodal.decodeKernel]]
  * stops reading them back losslessly. */
class MultimodalSpec extends SparkSpec {

  test("encodeKernel emits a genuine PNG byte stream (magic + IHDR)") {
    for (id <- Seq(0L, 7L, 123L, 9999L)) {
      val b = Multimodal.encodeKernel(id)
      // PNG signature: 89 50 4E 47 0D 0A 1A 0A, then the IHDR chunk
      assert(b.length > 24)
      assert((b(0) & 0xff) == 0x89 &&
        new String(b.slice(1, 4), "US-ASCII") == "PNG")
      assert(new String(b.slice(12, 16), "US-ASCII") == "IHDR")
    }
  }

  test("ImageIO round-trip is lossless: decoded pixels equal the generator formula") {
    for (id <- Seq(0L, 7L, 123L, 9999L)) {
      val (w, h, px) = Multimodal.decodeKernel(Multimodal.encodeKernel(id))
      assert(w == Multimodal.pngWidth(id) && h == Multimodal.pngHeight(id))
      for (y <- 0 until h; x <- 0 until w) {
        val p = px(y * w + x)
        assert(p(0) == Multimodal.chanR(id, x, y) &&
          p(1) == Multimodal.chanG(id, x, y) &&
          p(2) == Multimodal.chanB(id, x, y),
          s"id=$id pixel ($x,$y): got ${p.toSeq}")
      }
    }
  }

  test("pixelFeatures fingerprint matches an independently computed md5") {
    // one tiny hand-checked case: 1×1 pixel (10, 11, 12) → hex "0a0b0c"
    val (fp, lum) = Multimodal.pixelFeatures(Array(Array(10, 11, 12)))
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = java.lang.Long.parseLong(
      md.digest("0a0b0c".getBytes("US-ASCII"))
        .take(6).map("%02x".format(_)).mkString, 16)
    assert(fp == want)
    assert(lum == 299L * 10 + 587L * 11 + 114L * 12)
  }
}
