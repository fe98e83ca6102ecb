package graft.ext

import graft.SparkSpec
import graft.ext.Video.Avi

class VideoSpec extends SparkSpec {
  import spark.implicits._

  test("avi codec round-trips: decode(encode) recovers geometry and frames") {
    for (seed <- Seq(0L, 1L, 2L, 7L, 123L)) {
      val clip = Avi.decode(Avi.encode(seed))
      assert(clip.width == Avi.fixtureWidth(seed))
      assert(clip.height == Avi.fixtureHeight(seed))
      assert(clip.frames.length == Avi.fixtureFrames(seed))
      assert(clip.microsPerFrame == Avi.MicrosPerFrame)
      // spot-check one pixel through the full DIB path: image pixel
      // (f=0, y=0, x=0) lives in the LAST file row (bottom-up), bytes
      // ordered B,G,R
      val rb = Avi.rowBytes(clip.width)
      val lastRow = (clip.height - 1) * rb
      assert((clip.frames(0)(lastRow) & 0xff) == Avi.channelValue(seed, 0, 0, 0, 2))
      assert((clip.frames(0)(lastRow + 2) & 0xff) == Avi.channelValue(seed, 0, 0, 0, 0))
    }
  }

  test("walker skips the junk chunk and survives RIFF odd-size padding") {
    // seed 0 embeds the 3-byte junk chunk between frames; the decode
    // must still count avih's totalFrames exactly
    val withJunk = Avi.encode(0L)
    val without = Avi.encode(1L)
    assert(withJunk.containsSlice("JUNK".getBytes))
    assert(!without.containsSlice("JUNK".getBytes))
    assert(Avi.decode(withJunk).frames.length == Avi.fixtureFrames(0L))
  }

  test("avi parser fails loudly on malformed payloads") {
    val good = Avi.encode(5L)
    def fails(mutate: Array[Byte] => Array[Byte], what: String): Unit = {
      val bad = mutate(good.clone())
      val e = intercept[IllegalArgumentException](Avi.decode(bad))
      assert(e.getMessage.startsWith("AVI decode:"), s"$what: ${e.getMessage}")
    }
    fails(b => { b(0) = 'X'; b }, "bad magic")
    fails(b => { b(8) = 'X'; b }, "bad form type")
    fails(b => b.take(20), "truncated header")
    fails(b => { b(16) = 1; b }, "hdrl LIST size shrunk under avih")
    // totalFrames lie: avih claims one more frame than movi carries
    fails(b => { b(48) = (b(48) + 1).toByte; b }, "totalFrames mismatch")
  }

  test("decoded features match the closed form (bottom-up + BGR + padding exercised)") {
    val docs = (0L until 40L).toDF("doc_id")
    val feats = Video.decodeFeatures(Video.videoFromDocuments(docs))
      .collect().map(f => f.media_id -> f).toMap
    for (id <- 0L until 40L) {
      val w = Avi.fixtureWidth(id); val h = Avi.fixtureHeight(id)
      val nf = Avi.fixtureFrames(id)
      var sr = 0L; var sg = 0L; var sb = 0L; var srw = 0L
      for (f <- 0 until nf; y <- 0 until h; x <- 0 until w) {
        val r = Avi.channelValue(id, f, y, x, 0)
        val g = Avi.channelValue(id, f, y, x, 1)
        val b = Avi.channelValue(id, f, y, x, 2)
        sr += r; sg += g; sb += b; srw += (y + 1).toLong * (r + g + b)
      }
      val got = feats(id)
      assert(got.sum_r == sr && got.sum_g == sg && got.sum_b == sb,
        s"clip $id channel sums")
      assert(got.sum_rowweighted == srw, s"clip $id row-weighted (flip?)")
      assert(got.duration_ms == nf * 40L)
      assert(got.n_bytes ==
        100L + (if (Avi.fixtureHasJunk(id)) 12 else 0) +
          nf.toLong * (8 + h.toLong * Avi.rowBytes(w)))
    }
  }

  test("frame sampling takes every stride-th frame") {
    val docs = (0L until 10L).toDF("doc_id")
    val frames = Video.frameSample(Video.videoFromDocuments(docs), stride = 3)
      .collect().map(f => f.media_id -> f).toMap
    for (id <- 0L until 10L) {
      val nf = Avi.fixtureFrames(id)
      assert(frames(id).n_frames == nf)
      assert(frames(id).n_sampled == (nf + 2) / 3)
      var sum = 0L
      for (f <- 0 until nf if f % 3 == 0;
           y <- 0 until Avi.fixtureHeight(id);
           x <- 0 until Avi.fixtureWidth(id); c <- 0 to 2)
        sum += Avi.channelValue(id, f, y, x, c)
      assert(frames(id).sampled_sum == sum, s"clip $id sampled sum")
    }
  }
}
