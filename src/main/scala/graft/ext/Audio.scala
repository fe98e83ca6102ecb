package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Audio-modality plumbing: the second REAL codec beside [[Multimodal.Ppm]].
  *
  * [[Wav]] encodes and decodes canonical RIFF/WAVE PCM — a public,
  * self-describing container that needs no native libraries — with a
  * real chunk walker (unknown chunks skipped, odd sizes padded per the
  * RIFF spec). Fixture clips are generated deterministically from
  * `doc_id` so every decoded sample statistic is replayable in closed
  * form by the SQL oracle: the Spark side must parse actual RIFF
  * chunks and little-endian PCM BYTES to produce numbers the oracle
  * recomputes from the generator formula — a wrong parse cannot
  * hash-match.
  *
  * Distributed shape mirrors the image path (reference keeps media
  * opaque through its pipeline; cf. `etl/extract.py` treating files
  * as unparsed blobs until a typed stage): payloads stay in `binary`
  * columns, decode runs per-partition via `mapPartitions` (amortized
  * init), and the binary column is never shuffled.
  */
object Audio {

  /** An audio record: opaque payload + typed metadata. */
  case class AudioRecord(media_id: Long, modality: String,
                         payload: Array[Byte], n_samples: Int,
                         sample_rate: Int, format: String)

  /** Decoded per-clip features. All integer-exact (abs/square sums,
    * peak, strict sign-change count, floor-division duration) so the
    * whole surface is bit-portable across engines. */
  case class AudioFeatures(media_id: Long, n_samples: Long,
                           sample_rate: Int, duration_ms: Long,
                           n_bytes: Long, sum_abs: Long, sum_sq: Long,
                           peak_abs: Long, n_zero_cross: Long)

  /** Strided frame sampling over a decoded clip. */
  case class AudioFrames(media_id: Long, n_frames: Long, n_sampled: Long,
                         sampled_sum_abs: Long)

  /** RIFF/WAVE PCM (16-bit mono, little-endian) encoder/decoder.
    *
    * Container grammar implemented (the Microsoft RIFF spec, public):
    * `RIFF` + u32le size + `WAVE`, then a sequence of chunks
    * `id(4) + u32le size + body + pad byte if size is odd`. The
    * decoder walks chunks, requires a PCM `fmt ` chunk before `data`,
    * and skips unknown chunks — which the fixture exercises by
    * embedding a junk odd-sized `LIST` chunk in every third clip. */
  object Wav {

    val SampleRate = 8000

    /** Deterministic fixture sample `i` for a seed (the media id).
      * Mirrors the SQL oracle's closed form — keep the two in sync or
      * nothing hash-matches. Range [-2048, 2047]: well inside int16,
      * sign-varied so zero-crossing counts are nontrivial. */
    def sampleValue(seed: Long, i: Int): Int =
      java.lang.Math.floorMod(seed * 37 + i * 17, 4096L).toInt - 2048

    /** Fixture clip length: small but non-uniform. Mirrored in the
      * oracle. */
    def fixtureSamples(mediaId: Long): Int =
      (50 + java.lang.Math.floorMod(mediaId, 101L)).toInt

    /** Every third fixture clip carries a 3-byte junk `LIST` chunk
      * (odd size → 1 pad byte) between `fmt ` and `data`, so a decoder
      * that does not really walk chunks — or forgets RIFF padding —
      * fails on a third of the corpus. */
    def fixtureHasJunk(mediaId: Long): Boolean =
      java.lang.Math.floorMod(mediaId, 3L) == 0L

    private def putU32(out: Array[Byte], at: Int, v: Long): Unit = {
      out(at) = (v & 0xff).toByte
      out(at + 1) = ((v >> 8) & 0xff).toByte
      out(at + 2) = ((v >> 16) & 0xff).toByte
      out(at + 3) = ((v >> 24) & 0xff).toByte
    }

    private def putU16(out: Array[Byte], at: Int, v: Int): Unit = {
      out(at) = (v & 0xff).toByte
      out(at + 1) = ((v >> 8) & 0xff).toByte
    }

    private def putTag(out: Array[Byte], at: Int, tag: String): Unit = {
      var i = 0
      while (i < 4) { out(at + i) = tag.charAt(i).toByte; i += 1 }
    }

    /** Encode `n` samples of [[sampleValue]] over the seed as a
      * canonical 16-bit mono PCM WAV (plus the junk chunk for
      * [[fixtureHasJunk]] seeds). */
    def encode(seed: Long, n: Int, sampleRate: Int = SampleRate): Array[Byte] = {
      val junk = if (fixtureHasJunk(seed)) 12 else 0 // 4+4+3+1 pad
      val dataSize = n * 2
      val riffSize = 4 + 24 + junk + 8 + dataSize
      val out = new Array[Byte](8 + riffSize)
      putTag(out, 0, "RIFF"); putU32(out, 4, riffSize); putTag(out, 8, "WAVE")
      putTag(out, 12, "fmt "); putU32(out, 16, 16)
      putU16(out, 20, 1)              // PCM
      putU16(out, 22, 1)              // mono
      putU32(out, 24, sampleRate)
      putU32(out, 28, sampleRate * 2L) // byte rate
      putU16(out, 32, 2)              // block align
      putU16(out, 34, 16)             // bits per sample
      var pos = 36
      if (junk > 0) {
        putTag(out, pos, "LIST"); putU32(out, pos + 4, 3)
        out(pos + 8) = 'j'; out(pos + 9) = 'n'; out(pos + 10) = 'k'
        out(pos + 11) = 0 // RIFF pad byte for the odd-sized chunk
        pos += 12
      }
      putTag(out, pos, "data"); putU32(out, pos + 4, dataSize)
      pos += 8
      var i = 0
      while (i < n) {
        putU16(out, pos, sampleValue(seed, i) & 0xffff)
        pos += 2; i += 1
      }
      out
    }

    /** A decoded clip: rate from the parsed `fmt ` chunk, samples from
      * the parsed `data` chunk (little-endian int16). */
    case class Pcm(sampleRate: Int, samples: Array[Short])

    /** Parse a WAV payload. A REAL chunk walker over the bytes —
      * container magic, fmt validation, unknown-chunk skipping with
      * odd-size padding, data bounds — failing loudly on malformed
      * input rather than emitting garbage statistics. */
    def decode(payload: Array[Byte]): Pcm = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"WAV decode: $msg")
      def tag(at: Int): String = {
        if (at + 4 > payload.length) fail(s"truncated tag at byte $at")
        new String(payload, at, 4, java.nio.charset.StandardCharsets.US_ASCII)
      }
      def u32(at: Int): Long = {
        if (at + 4 > payload.length) fail(s"truncated u32 at byte $at")
        (payload(at) & 0xffL) | ((payload(at + 1) & 0xffL) << 8) |
          ((payload(at + 2) & 0xffL) << 16) | ((payload(at + 3) & 0xffL) << 24)
      }
      def u16(at: Int): Int = {
        if (at + 2 > payload.length) fail(s"truncated u16 at byte $at")
        (payload(at) & 0xff) | ((payload(at + 1) & 0xff) << 8)
      }
      if (tag(0) != "RIFF") fail("bad magic (want RIFF)")
      val riffSize = u32(4)
      if (8 + riffSize > payload.length)
        fail(s"RIFF size $riffSize overruns ${payload.length}-byte payload")
      if (tag(8) != "WAVE") fail("bad form type (want WAVE)")
      var pos = 12L
      val end = 8L + riffSize
      var rate = -1
      var samples: Array[Short] = null
      while (pos + 8 <= end) {
        val id = tag(pos.toInt)
        val size = u32(pos.toInt + 4)
        val body = pos + 8
        if (body + size > end)
          fail(s"chunk '$id' size $size overruns RIFF payload")
        id match {
          case "fmt " =>
            if (size < 16) fail(s"fmt chunk too small ($size)")
            val fmtCode = u16(body.toInt)
            if (fmtCode != 1) fail(s"unsupported format code $fmtCode (want PCM)")
            val channels = u16(body.toInt + 2)
            if (channels != 1) fail(s"unsupported channel count $channels")
            val r = u32(body.toInt + 4)
            if (r <= 0 || r > Int.MaxValue) fail(s"bad sample rate $r")
            val bits = u16(body.toInt + 14)
            if (bits != 16) fail(s"unsupported bits/sample $bits")
            rate = r.toInt
          case "data" =>
            if (rate < 0) fail("data chunk before fmt chunk")
            if (size % 2 != 0) fail(s"odd data size $size for 16-bit PCM")
            val n = (size / 2).toInt
            val out = new Array[Short](n)
            var i = 0
            while (i < n) {
              out(i) = u16(body.toInt + i * 2).toShort
              i += 1
            }
            samples = out
          case _ => // unknown chunk: skip (the walker's whole point)
        }
        // RIFF pads odd-sized chunk bodies to even offsets
        pos = body + size + (size % 2)
      }
      if (samples == null) fail("no data chunk")
      Pcm(rate, samples)
    }
  }

  /** Build an audio table from the documents fixture: one real WAV
    * clip per document, generated deterministically from `doc_id`
    * (encode runs distributed, per partition). */
  def audioFromDocuments(docs: DataFrame): Dataset[AudioRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = Wav.fixtureSamples(id)
        AudioRecord(id, "audio", Wav.encode(id, n), n, Wav.SampleRate,
          "audio/wav")
      }
    }
  }

  /** Batched decode over partitions: walk every payload's RIFF
    * chunks, parse the PCM samples, and emit exact integer features.
    * Sample count and rate come from the PARSED chunks, not the
    * metadata columns — [[requireMetadataConsistent]] gates the two.
    *
    * Zero crossings are STRICT sign products (`s[i-1]*s[i] < 0`): a
    * zero sample ends no crossing, a portable rule with no epsilon. */
  def decodeFeatures(audio: Dataset[AudioRecord]): Dataset[AudioFeatures] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions { it =>
      it.map { r =>
        val pcm = Wav.decode(r.payload)
        var sumAbs = 0L; var sumSq = 0L; var peak = 0L; var zc = 0L
        var i = 0
        while (i < pcm.samples.length) {
          val s = pcm.samples(i).toLong
          val a = math.abs(s)
          sumAbs += a
          sumSq += s * s
          if (a > peak) peak = a
          if (i > 0 && pcm.samples(i - 1).toLong * s < 0) zc += 1
          i += 1
        }
        val n = pcm.samples.length.toLong
        AudioFeatures(r.media_id, n, pcm.sampleRate,
          n * 1000L / pcm.sampleRate, r.payload.length.toLong,
          sumAbs, sumSq, peak, zc)
      }
    }
  }

  /** Gate: every payload's parsed chunks must agree with the record's
    * metadata columns. Returns the number of records checked (0 for
    * an empty table); throws on the first inconsistency. Distributed —
    * only the count reaches the driver. */
  def requireMetadataConsistent(audio: Dataset[AudioRecord]): Long = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions { it =>
      it.map { r =>
        val pcm = Wav.decode(r.payload)
        if (pcm.samples.length != r.n_samples || pcm.sampleRate != r.sample_rate)
          throw new IllegalStateException(
            s"audio ${r.media_id}: parsed ${pcm.samples.length}@${pcm.sampleRate}Hz " +
              s"!= metadata ${r.n_samples}@${r.sample_rate}Hz")
        1L
      }
    }.toDF("checked")
      .agg(coalesce(sum(col("checked")), lit(0L)))
      .head().getLong(0)
  }

  /** Frame sampling over decoded clips: consecutive `frameLen`-sample
    * blocks are "frames" (the last may be short); every `stride`-th
    * frame is sampled and its absolute amplitudes summed exactly so
    * the oracle can replay it. The audio twin of
    * [[Multimodal.frameScanlines]]. */
  def frameSample(audio: Dataset[AudioRecord], frameLen: Int,
                  stride: Int): Dataset[AudioFrames] = {
    require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions { it =>
      it.map { r =>
        val pcm = Wav.decode(r.payload)
        val n = pcm.samples.length
        val nFrames = (n.toLong + frameLen - 1) / frameLen
        var sum = 0L
        var sampled = 0L
        var f = 0L
        while (f < nFrames) {
          var i = (f * frameLen).toInt
          val frameEnd = math.min(i + frameLen, n)
          while (i < frameEnd) {
            sum += math.abs(pcm.samples(i).toLong)
            i += 1
          }
          sampled += 1
          f += stride
        }
        AudioFrames(r.media_id, nFrames, sampled, sum)
      }
    }
  }
}
