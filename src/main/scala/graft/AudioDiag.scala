package graft

/** Dev decomposition for the audio fingerprint kernel (not part of the
  * driver contract): per-row microseconds for WAV render, codec decode
  * (AudioSystem stream open + drain), Goertzel hashing over raw samples,
  * and the full spectralHash64 — MediaDiag's audio twin, driving the
  * x_audio_dedup scale row the way the ImageIO-cache finding drove
  * x_media_dedup's. Pure JVM, no Spark session.
  * Usage: runMain graft.AudioDiag [nRows]
  */
object AudioDiag {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    import graft.operators.Multimodal
    def bench(what: String)(body: Int => Unit): Unit = {
      // one warm pass for JIT, then timed
      var i = 0
      while (i < math.min(n, 2000)) { body(i); i += 1 }
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { body(i); i += 1 }
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"AUDIODIAG $what%-28s ${us}%8.1f us/row  (n=$n)")
    }
    val wavs = (0 until n).map(i => Multimodal.renderWav(i.toLong, 100L + i % 700)).toArray
    bench("render")(i => { Multimodal.renderWav(i.toLong, 100L + i % 700); () })
    bench("decode_stream") { i =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wavs(i)))
      ais.readAllBytes(); ()
    }
    bench("hash_full")(i => { Multimodal.spectralHash64(wavs(i)); () })
    bench("attenuate")(i => { Multimodal.attenuateWav(wavs(i), 0.5); () })
    // goertzel alone: pre-decoded samples, re-hash
    val sampleArrays = wavs.map { w =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(w))
      val data = ais.readAllBytes()
      val m = data.length / 2
      val s = new Array[Double](m)
      var i = 0
      while (i < m) {
        s(i) = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort.toDouble
        i += 1
      }
      s
    }
    bench("goertzel_only") { i =>
      val s = sampleArrays(i)
      val freqs = Array(220.0, 320.0, 420.0, 520.0, 620.0)
      var c = 0; var acc = 0.0
      while (c < 16) {
        val lo = c * s.length / 16
        val hi = math.max(lo + 1, (c + 1) * s.length / 16)
        var k = 0
        while (k < 5) {
          val w = 2.0 * math.Pi * freqs(k) / 8000.0
          val coeff = 2.0 * math.cos(w)
          var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
          var j = lo
          while (j < hi) { s0 = s(j) + coeff * s1 - s2; s2 = s1; s1 = s0; j += 1 }
          acc += s1 * s1 + s2 * s2 - coeff * s1 * s2
          k += 1
        }
        c += 1
      }
      if (acc < -1) println("?")
    }
  }
}
