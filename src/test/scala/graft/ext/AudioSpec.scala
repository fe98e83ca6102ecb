package graft.ext

import graft.SparkSpec
import graft.ext.Audio.Wav

class AudioSpec extends SparkSpec {
  import spark.implicits._

  test("wav codec round-trips: decode(encode) recovers rate and samples") {
    // seeds spanning both fixture shapes: canonical (no junk chunk)
    // and every-third clips carrying the odd-sized junk LIST chunk
    for (seed <- Seq(0L, 1L, 2L, 3L, 7L, 123456789L)) {
      val n = Wav.fixtureSamples(seed)
      val pcm = Wav.decode(Wav.encode(seed, n))
      assert(pcm.sampleRate == Wav.SampleRate)
      assert(pcm.samples.length == n)
      for (i <- 0 until n)
        assert(pcm.samples(i).toInt == Wav.sampleValue(seed, i),
          s"seed $seed sample $i")
    }
  }

  test("chunk walker skips unknown chunks and honors RIFF odd-size padding") {
    // seed 0, 3, 6... embed a 3-byte LIST chunk padded to 4; a walker
    // that forgets the pad byte lands mid-stream and misreads 'data'
    assert(Wav.fixtureHasJunk(0L) && Wav.fixtureHasJunk(3L))
    assert(!Wav.fixtureHasJunk(1L) && !Wav.fixtureHasJunk(2L))
    val pcm = Wav.decode(Wav.encode(3L, 60))
    assert(pcm.samples.length == 60)
    // hand-build a payload with TWO unknown chunks (one odd, one even)
    // around fmt to prove the walker is generic, not fixture-shaped
    val base = Wav.encode(1L, 50) // canonical: RIFF..WAVE fmt data
    val fmt = java.util.Arrays.copyOfRange(base, 12, 36)
    val data = java.util.Arrays.copyOfRange(base, 36, base.length)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length % 2
      val out = new Array[Byte](8 + body.length + pad)
      id.getBytes("US-ASCII").copyToArray(out, 0)
      out(4) = (body.length & 0xff).toByte
      out(5) = ((body.length >> 8) & 0xff).toByte
      System.arraycopy(body, 0, out, 8, body.length)
      out
    }
    val mid = chunk("INFO", Array[Byte](1, 2, 3, 4, 5)) ++ fmt ++
      chunk("cue ", Array[Byte](9, 9)) ++ data
    val riffSize = 4 + mid.length
    val hdr = new Array[Byte](12)
    "RIFF".getBytes("US-ASCII").copyToArray(hdr, 0)
    hdr(4) = (riffSize & 0xff).toByte
    hdr(5) = ((riffSize >> 8) & 0xff).toByte
    "WAVE".getBytes("US-ASCII").copyToArray(hdr, 8)
    val exotic = Wav.decode(hdr ++ mid)
    assert(exotic.samples.length == 50)
    assert(exotic.samples.toSeq == Wav.decode(base).samples.toSeq)
  }

  test("wav parser fails loudly on malformed payloads") {
    val ok = Wav.encode(1L, 50)
    intercept[IllegalArgumentException] {
      Wav.decode("RIFX".getBytes("US-ASCII") ++ ok.drop(4)) // bad magic
    }
    intercept[IllegalArgumentException] {
      Wav.decode(ok.dropRight(7)) // truncated data chunk
    }
    intercept[IllegalArgumentException] {
      // stereo: fmt channel count 2
      val bad = ok.clone(); bad(22) = 2; Wav.decode(bad)
    }
    intercept[IllegalArgumentException] {
      // non-PCM format code
      val bad = ok.clone(); bad(20) = 3; Wav.decode(bad)
    }
    intercept[IllegalArgumentException] {
      // 8-bit samples
      val bad = ok.clone(); bad(34) = 8; Wav.decode(bad)
    }
    intercept[IllegalArgumentException] {
      // data chunk before any fmt chunk
      val data = java.util.Arrays.copyOfRange(ok, 36, ok.length)
      val riffSize = 4 + data.length
      val hdr = new Array[Byte](12)
      "RIFF".getBytes("US-ASCII").copyToArray(hdr, 0)
      hdr(4) = (riffSize & 0xff).toByte
      hdr(5) = ((riffSize >> 8) & 0xff).toByte
      "WAVE".getBytes("US-ASCII").copyToArray(hdr, 8)
      Wav.decode(hdr ++ data)
    }
    intercept[IllegalArgumentException] {
      // odd data size for 16-bit PCM
      val bad = ok.clone()
      val dataSizeAt = 40 // canonical layout: data size field
      bad(dataSizeAt) = (bad(dataSizeAt) - 1).toByte
      Wav.decode(bad)
    }
  }

  test("decode features parse real bytes and match the closed form") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(50)
    val feats = Audio.decodeFeatures(Audio.audioFromDocuments(docs))
      .collect().map(f => f.media_id -> f).toMap
    val ids = docs.select("doc_id").as[Long].collect()
    assert(feats.size == ids.length)
    for (id <- ids) {
      val n = Wav.fixtureSamples(id)
      val smp = Array.tabulate(n)(Wav.sampleValue(id, _))
      val f = feats(id)
      assert(f.n_samples == n && f.sample_rate == Wav.SampleRate)
      assert(f.duration_ms == n * 1000L / Wav.SampleRate)
      assert(f.n_bytes == 44 + 2L * n + (if (Wav.fixtureHasJunk(id)) 12 else 0))
      assert(f.sum_abs == smp.map(v => math.abs(v.toLong)).sum)
      assert(f.sum_sq == smp.map(v => v.toLong * v).sum)
      assert(f.peak_abs == smp.map(v => math.abs(v.toLong)).max)
      assert(f.n_zero_cross ==
        smp.sliding(2).count(p => p(0).toLong * p(1) < 0))
    }
  }

  test("frame sampling matches a direct per-clip replay") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(30)
    val frames = Audio.frameSample(Audio.audioFromDocuments(docs),
      frameLen = 25, stride = 2).collect().map(f => f.media_id -> f).toMap
    for (id <- docs.select("doc_id").as[Long].collect()) {
      val n = Wav.fixtureSamples(id)
      val nFrames = (n + 24) / 25
      val kept = (0 until nFrames by 2).flatMap(f =>
        (f * 25) until math.min((f + 1) * 25, n))
      val g = frames(id)
      assert(g.n_frames == nFrames)
      assert(g.n_sampled == (0 until nFrames by 2).size)
      assert(g.sampled_sum_abs ==
        kept.map(i => math.abs(Wav.sampleValue(id, i).toLong)).sum)
    }
  }

  test("metadata gate passes consistent records, rejects liars, and an empty table is 0") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(20)
    val audio = Audio.audioFromDocuments(docs)
    assert(Audio.requireMetadataConsistent(audio) == 20L)
    val lying = audio.map(r => r.copy(n_samples = r.n_samples + 1))
    val ex = intercept[org.apache.spark.SparkException] {
      Audio.requireMetadataConsistent(lying)
    }
    assert(ex.getMessage != null)
    assert(Audio.requireMetadataConsistent(
      spark.emptyDataset[Audio.AudioRecord]) == 0L)
  }
}
