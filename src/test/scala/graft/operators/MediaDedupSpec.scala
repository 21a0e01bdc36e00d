package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaDedupSpec extends SparkSpec {

  test("dHash64: invariant under re-encode, close under one-pixel edit, far for different content") {
    def img(bytes: Array[Byte]) =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val a = Multimodal.renderPng(1L, "spark window merge batch table join")
    val b = Multimodal.renderPng(2L, "an entirely different document body here")
    val ha = Multimodal.dHash64(img(a))
    // decode + re-encode must not move the hash at all (lossless codec)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img(a), "png", out)
    assert(Multimodal.dHash64(img(out.toByteArray)) === ha)
    // one inverted pixel: small, bounded drift
    val edited = Multimodal.dHash64(img(Multimodal.invertOnePixel(a)))
    val editDist = java.lang.Long.bitCount(ha ^ edited)
    assert(editDist <= 4, s"one-pixel edit moved $editDist bits")
    // different content: far apart (band-bucket join must not flood)
    val hb = Multimodal.dHash64(img(b))
    assert(java.lang.Long.bitCount(ha ^ hb) > 8)
  }

  test("hammingPairs over image hashes recovers edited copies, nothing else at distance 0-4") {
    import spark.implicits._
    val texts = (0L until 30L).map(i =>
      (i, s"doc $i body with content token$i filler words ${i * 7}"))
    val base = texts.map { case (id, t) =>
      val png = Multimodal.renderPng(id, t)
      Multimodal.MediaRow(id, "s", "image/png", png.length.toLong, png)
    }
    val edited = texts.take(5).map { case (id, t) =>
      val png = Multimodal.invertOnePixel(Multimodal.renderPng(id, t))
      Multimodal.MediaRow(id + 1000L, "s", "image/png", png.length.toLong, png)
    }
    val media = spark.createDataset(base ++ edited)
    val hashed = Multimodal.imageHashes(media).withColumnRenamed("doc_id", "id")
    val pairs = Dedup.hammingPairs(hashed, maxHamming = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    for (i <- 0L until 5L)
      assert(pairs.contains((i, i + 1000L)), s"edited copy of $i not recovered: $pairs")
  }

  test("hammingPairs occupancy cap: subset of uncapped, identical signatures never split") {
    import spark.implicits._
    // 120 rows sharing ONE signature (a pathological hot bucket in every
    // band) plus 40 groups of 2 identical signatures scattered nearby.
    // With a tiny cap: (a) the pair list must stay a subset of the
    // uncapped clique, (b) every identical-signature pair must survive —
    // the sub-hash is seeded by the signature, so bit-equal rows share
    // every sub-bucket by construction.
    val hot = (0L until 120L).map(i => (i, 0x5A5A5A5A5A5A5A5AL))
    val twins = (0 until 40).flatMap { g =>
      val h = 0x1000000000000000L + g * 0x0101010101010101L
      Seq((1000L + 2 * g, h), (1001L + 2 * g, h))
    }
    val df = (hot ++ twins).toDF("id", "h")
    val uncapped = Dedup.hammingPairs(df, maxHamming = 0, maxOccupancy = 0)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val capped = Dedup.hammingPairs(df, maxHamming = 0, maxOccupancy = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(uncapped), "cap invented pairs")
    // the hot clique is all-identical signatures: the content seed keeps
    // them co-bucketed, so the cap removes NOTHING here (C(120,2) pairs
    // are the output, not avoidable work) — and every twin pair survives
    assert(capped == uncapped,
      s"identical-signature pairs dropped: ${(uncapped -- capped).take(5)}")
    for (g <- 0 until 40)
      assert(capped.contains((1000L + 2 * g, 1001L + 2 * g)), s"twin $g split")
  }

  test("exactHashGroups collapses identical signatures to min-id reps; distinct hashes stay apart") {
    import spark.implicits._
    val df = Seq((5L, 100L), (2L, 100L), (9L, 100L), (7L, 200L), (3L, 300L))
      .toDF("id", "h")
    val groups = Dedup.exactHashGroups(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups(5L) == 2L && groups(2L) == 2L && groups(9L) == 2L)
    assert(groups(7L) == 7L && groups(3L) == 3L)
  }

  test("spectralHash64: amplitude-invariant, tone-sensitive, short payloads None") {
    val a = Multimodal.renderWav(5L, 300L)
    val hA = Multimodal.spectralHash64(a).get
    // a REAL gain change + re-encode leaves every sign-of-band-difference
    // bit unchanged
    val att = Multimodal.attenuateWav(a, 0.5)
    assert(Multimodal.spectralHash64(att).get === hA,
      "gain change flipped spectral bits")
    // a clearly different tone (freq derives from docId) lands far away
    val b = Multimodal.renderWav(205L, 300L)
    val hB = Multimodal.spectralHash64(b).get
    assert(java.lang.Long.bitCount(hA ^ hB) > 8,
      f"distinct tones too close: ${java.lang.Long.bitCount(hA ^ hB)} bits")
    assert(Multimodal.spectralHash64(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("attenuateWav halves RMS and survives the real codec round-trip") {
    val wav = Multimodal.renderWav(9L, 200L)
    val (_, _, _, rms0) = Multimodal.decodeWav(wav).get
    val (_, _, _, rms1) = Multimodal.decodeWav(
      Multimodal.attenuateWav(wav, 0.5)).get
    assert(math.abs(rms1 / rms0 - 0.5) < 0.01, s"rms ratio ${rms1 / rms0}")
  }

  test("direct WAV render/parse match the JDK codec byte-for-byte and bit-for-bit") {
    for (id <- Seq(0L, 7L, 399L); chars <- Seq(100L, 512L, 799L)) {
      val wav = Multimodal.renderWav(id, chars)
      // the hand-written 44-byte header must be exactly what the codec
      // writes for the same PCM...
      val ais0 = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val pcm = ais0.readAllBytes()
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      assert(java.util.Arrays.equals(wav, out.toByteArray),
        s"renderWav($id,$chars) diverged from AudioSystem.write")
      // ...and the fast-path chunk walk must agree with the codec on
      // rate/frames/offsets, so the fast and fallback hash paths are
      // the same function
      val (rate, blockAlign, off, len) = Multimodal.wavPcm16(wav).get
      assert(rate === 8000.0 && blockAlign === 2 && off === 44 &&
        len === pcm.length)
      // attenuated re-encode (codec-written) parses identically too
      val att = Multimodal.attenuateWav(wav, 0.5)
      assert(Multimodal.wavPcm16(att).isDefined,
        "codec-written WAV rejected by the fast parse")
      assert(Multimodal.spectralHash64(wav) === Multimodal.spectralHash64(att))
    }
  }
}
