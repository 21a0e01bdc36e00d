package graft.operators

import java.io.ByteArrayInputStream

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Video near-dup gates: per-frame dHash stability through the real GIF
  * decode/re-encode round-trip, bounded drift under the one-frame edit
  * fixture, temporal-alignment semantics (a rotated sequence must NOT
  * match), and the pair aggregate's contracts.
  */
class VideoDedupSpec extends SparkSpec {

  import spark.implicits._

  private def frames(gif: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new ByteArrayInputStream(gif))
    try {
      val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
      try {
        reader.setInput(iis)
        (0 until reader.getNumImages(true)).map(reader.read)
      } finally reader.dispose()
    } finally iis.close()
  }

  private def reencode(imgs: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      imgs.foreach(img =>
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null))
      writer.endWriteSequence()
    } finally { try ios.close() finally writer.dispose() }
    out.toByteArray
  }

  private val text = "some deterministic doc text for the video fixture"

  test("frame hashes survive a decode + re-encode round-trip bit-identically") {
    val gif = Multimodal.renderGif(7L, text, nFrames = 8)
    val again = reencode(frames(gif))
    val h1 = frames(gif).map(Multimodal.dHash64)
    val h2 = frames(again).map(Multimodal.dHash64)
    assert(h1 == h2, "re-encode changed at least one frame hash")
  }

  test("one-frame edit drifts only that frame, within the band-join tolerance") {
    val gif = Multimodal.renderGif(7L, text, nFrames = 8)
    val edited = Multimodal.invertOnePixelInFrame(gif, frame = 3)
    val h1 = frames(gif).map(Multimodal.dHash64)
    val h2 = frames(edited).map(Multimodal.dHash64)
    assert(h1.length == 8 && h2.length == 8)
    (0 until 8).foreach { f =>
      val d = java.lang.Long.bitCount(h1(f) ^ h2(f))
      if (f == 3) assert(d <= 4, s"edited frame drifted $d bits (> 4)")
      else assert(d == 0, s"untouched frame $f drifted $d bits")
    }
  }

  test("edited copy is recovered; rotated (misaligned) copy is not") {
    // fixture payloads rendered driver-side (30 docs — the distributed
    // render path is exercised by asVideoTable in the query; here the
    // subject is the PAIR semantics): id+1000 = one-pixel edit in frame 3
    // (must match, aligned); id+2000 = frame sequence ROTATED by one
    // (must NOT match: every position now holds a different frame)
    val rows = (0L until 30L).flatMap { id =>
      val t = s"video doc number $id with body $id"
      val gif = Multimodal.renderGif(id, t, nFrames = 8)
      val edited = Multimodal.invertOnePixelInFrame(gif, frame = 3)
      val fs = frames(gif)
      val rot = reencode(fs.tail :+ fs.head)
      Seq(
        Multimodal.MediaRow(id, "src0", "image/gif", gif.length.toLong, gif),
        Multimodal.MediaRow(id + 1000L, "src0", "image/gif",
          edited.length.toLong, edited),
        Multimodal.MediaRow(id + 2000L, "src0", "image/gif",
          rot.length.toLong, rot))
    }
    val fh = Multimodal.videoFrameHashes(rows.toDS()).localCheckpoint(true)
    // full two-tier protocol: exact-group collapse, then rep near-pairs
    val groups = Multimodal.videoExactGroups(fh)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val repHashes = fh.where(col("doc_id").isin(groups.values.toSeq.distinct: _*))
    val near = Multimodal.videoPairs(repHashes, maxHamming = 4, minMatchFrames = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recovered(a: Long, b: Long): Boolean = {
      val (ra, rb) = (groups(a), groups(b))
      ra == rb || near.contains((math.min(ra, rb), math.max(ra, rb)))
    }
    (0L until 30L).foreach { id =>
      assert(recovered(id, id + 1000L), s"edited copy of $id not recovered")
      assert(!recovered(id, id + 2000L),
        s"rotated copy of $id matched despite misalignment")
    }
  }

  test("byte-identical videos collapse to one exact group") {
    val gif = Multimodal.renderGif(5L, text, nFrames = 8)
    val rows = Seq(3L, 8L, 11L).map(id =>
      Multimodal.MediaRow(id, "src0", "image/gif", gif.length.toLong, gif)) :+
      Multimodal.MediaRow(12L, "src0", "image/gif", 1L,
        Multimodal.renderGif(99L, "entirely different content", nFrames = 8))
    val groups = Multimodal.videoExactGroups(
      Multimodal.videoFrameHashes(rows.toDS()))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups(3L) == 3L && groups(8L) == 3L && groups(11L) == 3L,
      s"identical videos split across groups: $groups")
    assert(groups(12L) == 12L, "distinct video absorbed into the wrong group")
  }

  test("videoPairs never reports a video against itself") {
    val docs = Seq((1L, "src0", "one doc")).toDF("doc_id", "source", "text")
    val fh = Multimodal.videoFrameHashes(Multimodal.asVideoTable(docs))
    // all 8 frames of one video share the band space; the alignment +
    // distinct-video filter must keep the result empty
    assert(Multimodal.videoPairs(fh, maxHamming = 64, minMatchFrames = 1).isEmpty)
  }

  test("videoFrameHashes drops undecodable payloads instead of failing") {
    val bad = Seq(Multimodal.MediaRow(9L, "src0", "image/gif", 4L,
      Array[Byte](1, 2, 3, 4))).toDS()
    assert(Multimodal.videoFrameHashes(bad).isEmpty)
  }
}
