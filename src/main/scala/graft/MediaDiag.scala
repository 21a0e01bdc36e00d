package graft

/** Dev diagnostics main (not part of the driver contract): per-image cost
  * of the PNG render/decode round-trip with ImageIO's disk-backed stream
  * cache on vs off — the fixture wall behind x_media_dedup's scale row.
  * Usage: runMain graft.MediaDiag [nImages]
  */
object MediaDiag {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val text = "the quick brown fox jumps over the lazy dog " * 8
    def round(label: String): Unit = {
      var i = 0
      var bytes = 0L
      val t0 = System.nanoTime()
      while (i < n) {
        val png = graft.operators.Multimodal.renderPng(i.toLong, text + i)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(png))
        bytes += png.length + img.getWidth
        i += 1
      }
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"MEDIADIAG $label $us%.1f us/image ($bytes)")
    }
    javax.imageio.ImageIO.setUseCache(true)
    round("warmup")
    round("cache_on")
    javax.imageio.ImageIO.setUseCache(false)
    round("cache_off")
    round("cache_off2")
  }
}
