package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Video-modality plumbing: the THIRD real codec beside
  * [[Multimodal.Ppm]] (image) and [[Audio.Wav]] (audio), completing
  * the modality triad of `mm_payload_stats`.
  *
  * [[Avi]] encodes and decodes a minimal uncompressed AVI — the
  * public Microsoft RIFF form `RIFF('AVI ' LIST('hdrl' avih)
  * LIST('movi' '00db'...))` with raw 24-bit DIB frames. The DIB
  * conventions are implemented for real and each is pinned by a
  * statistic that a shortcut parser gets wrong:
  *  - rows are BOTTOM-UP in the file (the row-weighted sum flips if a
  *    decoder reads them top-down),
  *  - pixels are B,G,R byte order (the per-channel sums swap if a
  *    decoder assumes RGB),
  *  - every row pads to a 4-byte boundary (sums drift into the pad
  *    bytes if a decoder ignores stride),
  *  - every third fixture embeds a junk odd-sized chunk inside `movi`
  *    (a walker that assumes frames are contiguous fails on it).
  *
  * Fixture clips generate deterministically from `doc_id`, so every
  * decoded statistic is replayable in closed form by the SQL oracle —
  * a wrong parse cannot hash-match. Payloads stay in `binary`
  * columns, decode runs per-partition via `mapPartitions`, and the
  * binary column is never shuffled — the same distributed shape as
  * the image and audio paths. */
object Video {

  /** A video record: opaque payload + typed metadata. */
  case class VideoRecord(media_id: Long, modality: String,
                         payload: Array[Byte], width: Int, height: Int,
                         n_frames: Int, format: String)

  /** Decoded per-clip features — all integer-exact. `sum_rowweighted`
    * is `sum((y+1) * (r+g+b))` over image-space rows: flip-sensitive,
    * so a decoder that forgets DIB bottom-up order cannot match. */
  case class VideoFeatures(media_id: Long, width: Int, height: Int,
                           n_frames: Long, duration_ms: Long,
                           n_bytes: Long, sum_r: Long, sum_g: Long,
                           sum_b: Long, sum_rowweighted: Long)

  /** Strided frame sampling over a decoded clip. */
  case class VideoFrames(media_id: Long, n_frames: Long, n_sampled: Long,
                         sampled_sum: Long)

  /** Minimal uncompressed AVI encoder/decoder (RIFF grammar). */
  object Avi {

    /** 25 fps, exact 40 ms per frame — integer durations. */
    val MicrosPerFrame = 40000L

    /** Fixture geometry/length, mirrored in the SQL oracle. Widths are
      * even but w*3 alternates mod 4, so HALF the corpus has nonzero
      * DIB row padding. */
    def fixtureWidth(id: Long): Int =
      (8 + java.lang.Math.floorMod(id, 5L) * 2).toInt
    def fixtureHeight(id: Long): Int =
      (6 + java.lang.Math.floorMod(id, 4L)).toInt
    def fixtureFrames(id: Long): Int =
      (3 + java.lang.Math.floorMod(id, 4L)).toInt

    /** Channel value for image-space pixel (f, y, x), channel c with
      * 0=R, 1=G, 2=B — the closed form the oracle replays. */
    def channelValue(seed: Long, f: Int, y: Int, x: Int, c: Int): Int =
      java.lang.Math.floorMod(
        seed * 31 + f * 7919L + y * 101L + x * 13L + c * 29L, 256L).toInt

    /** Every third fixture embeds a 3-byte junk chunk (odd size -> pad
      * byte) inside `movi`, between the first and second frame. */
    def fixtureHasJunk(id: Long): Boolean =
      java.lang.Math.floorMod(id, 3L) == 0L

    /** DIB row stride: w*3 padded up to a 4-byte boundary. */
    def rowBytes(w: Int): Int = { val raw = w * 3; raw + (4 - raw % 4) % 4 }

    private def putU32(out: Array[Byte], at: Int, v: Long): Unit = {
      out(at) = (v & 0xff).toByte
      out(at + 1) = ((v >> 8) & 0xff).toByte
      out(at + 2) = ((v >> 16) & 0xff).toByte
      out(at + 3) = ((v >> 24) & 0xff).toByte
    }
    private def putTag(out: Array[Byte], at: Int, tag: String): Unit = {
      var i = 0
      while (i < 4) { out(at + i) = tag.charAt(i).toByte; i += 1 }
    }

    /** Encode the fixture clip for a seed as a canonical minimal AVI:
      * RIFF('AVI ' LIST('hdrl' avih(56)) LIST('movi' ['JUNK'] '00db'
      * frames...)) with bottom-up, BGR, row-padded DIB frames. */
    def encode(seed: Long): Array[Byte] = {
      val w = fixtureWidth(seed); val h = fixtureHeight(seed)
      val nf = fixtureFrames(seed)
      val fb = h * rowBytes(w)
      val junk = if (fixtureHasJunk(seed)) 12 else 0 // 8 hdr + 3 + pad
      val moviContent = 4 + junk + nf * (8 + fb)
      val riffSize = 4 + (8 + 68) + (8 + moviContent)
      val out = new Array[Byte](8 + riffSize)
      putTag(out, 0, "RIFF"); putU32(out, 4, riffSize)
      putTag(out, 8, "AVI ")
      putTag(out, 12, "LIST"); putU32(out, 16, 68); putTag(out, 20, "hdrl")
      putTag(out, 24, "avih"); putU32(out, 28, 56)
      putU32(out, 32, MicrosPerFrame)
      putU32(out, 36, 0); putU32(out, 40, 0); putU32(out, 44, 0)
      putU32(out, 48, nf)          // totalFrames
      putU32(out, 52, 0)
      putU32(out, 56, 1)           // streams
      putU32(out, 60, 0)
      putU32(out, 64, w); putU32(out, 68, h)
      // 16 reserved bytes at 72..87 stay zero
      var pos = 88
      putTag(out, pos, "LIST"); putU32(out, pos + 4, moviContent)
      putTag(out, pos + 8, "movi")
      pos += 12
      var f = 0
      while (f < nf) {
        if (f == 1 && junk > 0) {
          putTag(out, pos, "JUNK"); putU32(out, pos + 4, 3)
          out(pos + 8) = 'j'; out(pos + 9) = 'n'; out(pos + 10) = 'k'
          out(pos + 11) = 0 // RIFF pad for the odd size
          pos += 12
        }
        putTag(out, pos, "00db"); putU32(out, pos + 4, fb)
        pos += 8
        var j = 0
        while (j < h) {
          val y = h - 1 - j // DIB: file rows are bottom-up
          var x = 0
          while (x < w) {
            out(pos + j * rowBytes(w) + x * 3) =
              channelValue(seed, f, y, x, 2).toByte // B
            out(pos + j * rowBytes(w) + x * 3 + 1) =
              channelValue(seed, f, y, x, 1).toByte // G
            out(pos + j * rowBytes(w) + x * 3 + 2) =
              channelValue(seed, f, y, x, 0).toByte // R
            x += 1
          }
          j += 1
        }
        pos += fb
        f += 1
      }
      out
    }

    /** A decoded clip: geometry from the parsed `avih`, frames as raw
      * bottom-up padded DIB byte blocks (interpreted by the feature
      * pass). */
    case class Clip(width: Int, height: Int, microsPerFrame: Long,
                    frames: Array[Array[Byte]])

    /** Parse an AVI payload — a REAL nested-RIFF walker: container
      * magic, LIST recursion, avih validation, unknown-chunk skipping
      * with odd-size padding, per-frame size checks, and a
      * totalFrames-vs-counted gate. Fails loudly on malformed input. */
    def decode(payload: Array[Byte]): Clip = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"AVI decode: $msg")
      def tag(at: Int): String = {
        if (at + 4 > payload.length) fail(s"truncated tag at byte $at")
        new String(payload, at, 4, java.nio.charset.StandardCharsets.US_ASCII)
      }
      def u32(at: Int): Long = {
        if (at + 4 > payload.length) fail(s"truncated u32 at byte $at")
        (payload(at) & 0xffL) | ((payload(at + 1) & 0xffL) << 8) |
          ((payload(at + 2) & 0xffL) << 16) | ((payload(at + 3) & 0xffL) << 24)
      }
      if (tag(0) != "RIFF") fail("bad magic (want RIFF)")
      val riffSize = u32(4)
      if (8 + riffSize > payload.length)
        fail(s"RIFF size $riffSize overruns ${payload.length}-byte payload")
      if (tag(8) != "AVI ") fail("bad form type (want 'AVI ')")
      var w = -1; var h = -1; var micros = -1L; var total = -1L
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(from: Long, to: Long, inMovi: Boolean): Unit = {
        var pos = from
        while (pos + 8 <= to) {
          val id = tag(pos.toInt)
          val size = u32(pos.toInt + 4)
          val body = pos + 8
          if (body + size > to)
            fail(s"chunk '$id' size $size overruns enclosing list")
          id match {
            case "LIST" =>
              if (size < 4) fail(s"LIST too small ($size)")
              val subtype = tag(body.toInt)
              walk(body + 4, body + size, inMovi = subtype == "movi")
            case "avih" =>
              if (size < 56) fail(s"avih too small ($size)")
              micros = u32(body.toInt)
              if (micros <= 0) fail(s"bad microSecPerFrame $micros")
              total = u32(body.toInt + 16)
              val ww = u32(body.toInt + 32); val hh = u32(body.toInt + 36)
              if (ww <= 0 || hh <= 0 || ww > 65535 || hh > 65535)
                fail(s"bad geometry ${ww}x$hh")
              w = ww.toInt; h = hh.toInt
            case "00db" =>
              if (!inMovi) fail("frame chunk outside movi list")
              if (w < 0) fail("frame before avih header")
              val expect = h.toLong * rowBytes(w)
              if (size != expect)
                fail(s"frame size $size != expected $expect for ${w}x$h")
              frames += java.util.Arrays.copyOfRange(
                payload, body.toInt, (body + size).toInt)
            case _ => // unknown chunk: skip (the walker's whole point)
          }
          pos = body + size + (size % 2) // RIFF odd-size padding
        }
      }
      walk(12L, 8L + riffSize, inMovi = false)
      if (w < 0) fail("no avih header")
      if (frames.isEmpty) fail("no frame chunks")
      if (total >= 0 && total != frames.length)
        fail(s"avih totalFrames $total != ${frames.length} parsed frames")
      Clip(w, h, micros, frames.toArray)
    }
  }

  /** Build a video table from the documents fixture: one real AVI
    * clip per document, generated deterministically from `doc_id`
    * (encode runs distributed, per partition). */
  def videoFromDocuments(docs: DataFrame): Dataset[VideoRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        VideoRecord(id, "video", Avi.encode(id), Avi.fixtureWidth(id),
          Avi.fixtureHeight(id), Avi.fixtureFrames(id), "video/avi")
      }
    }
  }

  /** Batched decode over partitions: walk the RIFF tree, undo the DIB
    * conventions (bottom-up rows, BGR order, row padding), and emit
    * exact integer features. */
  def decodeFeatures(video: Dataset[VideoRecord]): Dataset[VideoFeatures] = {
    val spark = video.sparkSession
    import spark.implicits._
    video.mapPartitions { it =>
      it.map { r =>
        val clip = Avi.decode(r.payload)
        val stride = Avi.rowBytes(clip.width)
        var sr = 0L; var sg = 0L; var sb = 0L; var srw = 0L
        var f = 0
        while (f < clip.frames.length) {
          val bytes = clip.frames(f)
          var j = 0
          while (j < clip.height) {
            val y = clip.height - 1 - j // file row j is image row h-1-j
            var x = 0
            while (x < clip.width) {
              val b = bytes(j * stride + x * 3) & 0xff
              val g = bytes(j * stride + x * 3 + 1) & 0xff
              val rr = bytes(j * stride + x * 3 + 2) & 0xff
              sr += rr; sg += g; sb += b
              srw += (y + 1).toLong * (rr + g + b)
              x += 1
            }
            j += 1
          }
          f += 1
        }
        val nf = clip.frames.length.toLong
        VideoFeatures(r.media_id, clip.width, clip.height, nf,
          nf * clip.microsPerFrame / 1000L, r.payload.length.toLong,
          sr, sg, sb, srw)
      }
    }
  }

  /** Strided frame sampling: every `stride`-th frame's total pixel sum
    * (r+g+b over the frame), exactly replayable. */
  def frameSample(video: Dataset[VideoRecord], stride: Int): Dataset[VideoFrames] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = video.sparkSession
    import spark.implicits._
    video.mapPartitions { it =>
      it.map { r =>
        val clip = Avi.decode(r.payload)
        val rb = Avi.rowBytes(clip.width)
        var sum = 0L; var sampled = 0L
        var f = 0
        while (f < clip.frames.length) {
          if (f % stride == 0) {
            val bytes = clip.frames(f)
            var j = 0
            while (j < clip.height) {
              var x = 0
              while (x < clip.width) {
                sum += (bytes(j * rb + x * 3) & 0xff) +
                  (bytes(j * rb + x * 3 + 1) & 0xff) +
                  (bytes(j * rb + x * 3 + 2) & 0xff)
                x += 1
              }
              j += 1
            }
            sampled += 1
          }
          f += 1
        }
        VideoFrames(r.media_id, clip.frames.length.toLong, sampled, sum)
      }
    }
  }
}
