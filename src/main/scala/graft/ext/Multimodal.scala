package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the
  * pipeline as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction runs as batched partition-local
  * processing.
  *
  * The codec is REAL: [[Ppm]] encodes and decodes binary P6 (raw
  * RGB) Netpbm images — a public, self-describing format that needs
  * no native libraries — including the format's whitespace/comment
  * header grammar. Fixture images are generated deterministically
  * from `doc_id` so every decoded pixel statistic is replayable in
  * closed form by the SQL oracle: the Spark side must parse actual
  * header+raster BYTES to produce numbers the oracle recomputes from
  * the generator formula, which is exactly the real-decode contract
  * (a wrong parse cannot hash-match).
  *
  * The distributed shape is the one a production JNI/vectorized codec
  * plugs into: payloads stay in `binary` columns, decode runs
  * per-partition via `mapPartitions` (amortized init, no per-row
  * driver round-trips), and the binary column is never shuffled.
  */
object Multimodal {

  /** A multimodal record: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, modality: String,
                         payload: Array[Byte], width: Int, height: Int,
                         format: String)

  /** Decoded feature record. All sums are exact integers and the
    * brightness is an integer parts-per-million floor-division, so the
    * whole decode surface is bit-portable across engines (no float
    * fold-order hazards in the oracle compare). */
  case class MediaFeatures(media_id: Long, width: Int, height: Int,
                           n_bytes: Long, n_pixels: Long,
                           sum_r: Long, sum_g: Long, sum_b: Long,
                           brightness_ppm: Long)

  /** Scanline ("frame") sampling result over a decoded image. */
  case class FrameSample(media_id: Long, n_frames: Long, n_sampled: Long,
                         sampled_sum: Long)

  /** Binary PPM (Netpbm P6, 8-bit) encoder/decoder.
    *
    * Grammar implemented (the netpbm spec, public): `P6`, then three
    * whitespace-separated decimal tokens (width, height, maxval) where
    * `#` starts a comment running to end-of-line anywhere in the
    * header, then EXACTLY ONE whitespace byte, then `width*height*3`
    * raw sample bytes. Only maxval <= 255 (1 byte/sample) is
    * supported — the fixture corpus never exceeds it and 2-byte
    * samples would double every closed-form oracle below. */
  object Ppm {

    /** Deterministic fixture pixel: channel `c` of pixel (x, y) for a
      * seed (the media id). Mirrors the SQL oracle's closed form —
      * keep the two in sync or nothing hash-matches. */
    def pixelValue(seed: Long, x: Int, y: Int, c: Int): Int =
      java.lang.Math.floorMod(seed * 31 + x * 7 + y * 13 + c * 29, 256L).toInt

    /** Encode a `w x h` P6 image whose raster is [[pixelValue]] over
      * the seed. Header is the canonical `P6\nW H\n255\n`. */
    def encode(seed: Long, w: Int, h: Int): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new Array[Byte](header.length + w * h * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var i = header.length
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) {
            out(i) = pixelValue(seed, x, y, c).toByte
            i += 1; c += 1
          }
          x += 1
        }
        y += 1
      }
      out
    }

    /** [[encode]] with a `#` comment line injected into the header —
      * a DIFFERENT byte stream carrying the IDENTICAL raster (the
      * re-encoded-copy shape: same image, new uploader metadata).
      * The comment must not contain a newline (it would terminate
      * early and leave garbage tokens in the header). */
    def encodeWithComment(seed: Long, w: Int, h: Int,
                          comment: String): Array[Byte] = {
      require(!comment.contains('\n'), "header comment cannot span lines")
      val header = s"P6\n# $comment\n$w $h\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val canonical = encode(seed, w, h)
      val canonicalHeader = s"P6\n$w $h\n255\n".length
      val out = new Array[Byte](header.length +
        canonical.length - canonicalHeader)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(canonical, canonicalHeader, out, header.length,
        canonical.length - canonicalHeader)
      out
    }

    /** A decoded image: dimensions from the parsed header, raster as
      * raw interleaved RGB bytes (exactly `width*height*3`). */
    case class Image(width: Int, height: Int, maxVal: Int,
                     raster: Array[Byte])

    /** Parse a P6 payload. A REAL parser over the bytes — magic,
      * comment-tolerant header, raster bounds — failing loudly on
      * malformed input rather than emitting garbage statistics. */
    def decode(payload: Array[Byte]): Image = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"PPM decode: $msg")
      if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6')
        fail("bad magic (want P6)")
      var pos = 2
      def isWs(b: Byte): Boolean =
        b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f'
      def nextInt(): Int = {
        var scanning = true
        while (scanning) {
          while (pos < payload.length && isWs(payload(pos))) pos += 1
          if (pos < payload.length && payload(pos) == '#') {
            while (pos < payload.length && payload(pos) != '\n') pos += 1
          } else scanning = false
        }
        if (pos >= payload.length ||
          payload(pos) < '0' || payload(pos) > '9')
          fail(s"expected decimal token at byte $pos")
        var v = 0
        while (pos < payload.length &&
          payload(pos) >= '0' && payload(pos) <= '9') {
          v = v * 10 + (payload(pos) - '0')
          if (v > 0xFFFF) fail("header value out of range")
          pos += 1
        }
        v
      }
      val w = nextInt(); val h = nextInt(); val maxVal = nextInt()
      if (w <= 0 || h <= 0) fail(s"degenerate dimensions ${w}x$h")
      if (maxVal <= 0 || maxVal > 255)
        fail(s"unsupported maxval $maxVal (only 1-byte samples)")
      // exactly one whitespace byte separates header from raster
      if (pos >= payload.length || !isWs(payload(pos)))
        fail("missing raster separator")
      pos += 1
      // Long arithmetic: 65535 x 65535 x 3 overflows Int, which would
      // wrap the bound check and turn a malformed header into garbage
      // statistics instead of the loud failure this parser promises
      val need = w.toLong * h * 3
      if (payload.length - pos < need)
        fail(s"truncated raster: need $need bytes, have ${payload.length - pos}")
      Image(w, h, maxVal,
        java.util.Arrays.copyOfRange(payload, pos, pos + need.toInt))
    }
  }

  /** Fixture image dimensions for a media id: small but non-uniform so
    * header parsing sees varied digit counts. Mirrored in the oracle. */
  def fixtureDims(mediaId: Long): (Int, Int) =
    ((4 + java.lang.Math.floorMod(mediaId, 13L)).toInt,
      (3 + java.lang.Math.floorMod(mediaId, 7L)).toInt)

  /** Build a media table from the documents fixture: one real P6 image
    * per document, generated deterministically from `doc_id` (encode
    * runs distributed, per partition — no driver materialization). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val (w, h) = fixtureDims(id)
        MediaRecord(id, "image", Ppm.encode(id, w, h), w, h, "image/ppm")
      }
    }
  }

  /** Batched decode over partitions: parse every payload's header and
    * raster, emit exact per-channel sums and an integer-ppm
    * brightness. Dimensions come from the PARSED HEADER, not the
    * metadata columns — a consistency gate between the two is the
    * caller's [[requireMetadataConsistent]]. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val img = Ppm.decode(r.payload)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < img.raster.length) {
          sr += (img.raster(i) & 0xff)
          sg += (img.raster(i + 1) & 0xff)
          sb += (img.raster(i + 2) & 0xff)
          i += 3
        }
        val nPx = img.width.toLong * img.height
        MediaFeatures(r.media_id, img.width, img.height,
          r.payload.length.toLong, nPx, sr, sg, sb,
          // normalize by the PARSED maxVal, not a hard-coded 255 —
          // a legal maxval-100 image must not report 39% brightness
          // (the fixture corpus is always 255, so its oracle is
          // unchanged)
          (sr + sg + sb) * 1000000L / (nPx * 3L * img.maxVal))
      }
    }
  }

  /** One row of the decode-or-quarantine surface: decoded stats for
    * parseable payloads, a classified error for the rest. */
  case class QuarantineRow(media_id: Long, status: String,
                           err_class: Option[String], width: Option[Long],
                           height: Option[Long],
                           brightness_ppm: Option[Long])

  /** Deterministic corruption of a media fixture — the hostile slice
    * every real crawl contains (truncated fetches, content-type lies,
    * zero-byte bodies). media_id % 11 picks the fate: 0 → payload cut
    * to half (header survives, raster short), 1 → magic byte
    * destroyed, 2 → empty payload; everything else passes through
    * untouched. Closed-form in the id, so an oracle can replay the
    * classification without parsing bytes. */
  def corruptFixture(media: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        java.lang.Math.floorMod(m.media_id, 11L) match {
          case 0L => m.copy(payload =
            java.util.Arrays.copyOf(m.payload, m.payload.length / 2))
          case 1L =>
            val p = m.payload.clone()
            if (p.nonEmpty) p(0) = 'X'.toByte
            m.copy(payload = p)
          case 2L => m.copy(payload = Array.emptyByteArray)
          case _ => m
        }
      }
    }
  }

  /** Decode-or-quarantine: the production form of [[decodeFeatures]].
    * The strict parser's loud failure is the right contract for a
    * gate, but at 100 TB one corrupt payload in a trillion must not
    * kill the job — here every payload decodes inside a per-row
    * try/catch, parse failures become CLASSIFIED quarantine rows
    * (bad_magic / truncated_raster / malformed_header) instead of
    * task deaths, and the quarantine count rides an `observe` metric
    * through [[GuardLog]] so the rot rate is loud in the logs without
    * a second pass. Good rows carry the parsed dimensions and the
    * exact integer brightness; quarantined rows carry NULL stats —
    * nothing downstream can mistake a half-decoded image for data. */
  def decodeQuarantine(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    GuardLog.ensure(spark)
    media.mapPartitions { it =>
      it.map { r =>
        try {
          val img = Ppm.decode(r.payload)
          var s = 0L
          var i = 0
          while (i < img.raster.length) {
            s += (img.raster(i) & 0xff); i += 1
          }
          val nPx = img.width.toLong * img.height
          QuarantineRow(r.media_id, "ok", None, Some(img.width.toLong),
            Some(img.height.toLong),
            Some(s * 1000000L / (nPx * 3L * img.maxVal)))
        } catch {
          case e: IllegalArgumentException =>
            val m = if (e.getMessage == null) "" else e.getMessage
            val cls =
              if (m.contains("bad magic")) "bad_magic"
              else if (m.contains("truncated raster")) "truncated_raster"
              else "malformed_header"
            QuarantineRow(r.media_id, "quarantined", Some(cls),
              None, None, None)
        }
      }
    }.toDF().observe(GuardLog.Prefix + "mm_quarantined",
      sum(when(col("status") === "quarantined", 1L).otherwise(0L))
        .as("n_quarantined"))
  }

  /** Perceptual hash record: 56-bit difference hash. */
  case class MediaHash(media_id: Long, phash: Long)

  /** Difference hash (dHash) over the decoded raster — the standard
    * perceptual image fingerprint (resample to a tiny grid, hash the
    * sign of horizontal luma gradients): near-identical images — same
    * content re-encoded, resized, or slightly color-shifted — land
    * within a few Hamming bits, so the hash feeds the exact same
    * Hamming-band near-dup machinery as [[Dedup]]'s text SimHash
    * (band-bucket join, then bit_count verify). This is the image
    * column's dedup key at 100 TB: 8 bytes per image replace the
    * payload in every comparison, and the banding keeps pair
    * generation inverted-index shaped.
    *
    * Variant notes: 8x8 nearest-neighbor luma grid (integer resample
    * `sx = gx*w/8` — floor division, exact cross-engine), 7 horizontal
    * comparisons per row = 56 bits, deliberately inside the positive
    * signed-64 range (the same reason the library's text hashes are
    * 60-bit: a sign bit ruins integer-exact SQL replay). Luma is the
    * integer BT.601 form `299*R + 587*G + 114*B` (x1000 — comparisons
    * are scale-invariant, so the division is never taken). Strict `>`
    * on the gradient, matching the oracle's CASE.
    *
    * Real-decode contract like [[decodeFeatures]]: the grid reads the
    * PARSED raster bytes; the oracle recomputes the same bits from the
    * fixture generator's closed form. */
  def dhash(media: Dataset[MediaRecord]): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map(r => MediaHash(r.media_id, dhashOf(Ppm.decode(r.payload))))
    }
  }

  /** The 56-bit dHash of one decoded image — shared by [[dhash]] and
    * [[phashDedupReport]] so the fingerprint cannot drift between the
    * per-image and the dedup surface. */
  private def dhashOf(img: Ppm.Image): Long = {
    val w = img.width; val h = img.height
    def luma(gx: Int, gy: Int): Long = {
      val sx = gx * w / 8; val sy = gy * h / 8
      val base = (sy * w + sx) * 3
      299L * (img.raster(base) & 0xff) +
        587L * (img.raster(base + 1) & 0xff) +
        114L * (img.raster(base + 2) & 0xff)
    }
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 7) {
        if (luma(x + 1, y) > luma(x, y)) hash |= 1L << (y * 7 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** One-decode curation profile: [[MediaFeatures]] plus the [[dhash]]
    * fingerprint. */
  case class MediaProfile(media_id: Long, width: Int, height: Int,
                          n_bytes: Long, n_pixels: Long,
                          sum_r: Long, sum_g: Long, sum_b: Long,
                          brightness_ppm: Long, phash: Long)

  /** Decode ONCE, emit everything curation needs: per-channel sums,
    * brightness, byte/pixel counts AND the perceptual hash in a
    * single pass over the payload bytes. The multimodal curation
    * funnel ([[graft.registry]] `corpus_curation_mm`) runs its gates
    * and its dedup off this table — at 100 TB the decode is the
    * expensive pass, so quality gates and the near-dup keeper must
    * share one, never re-decode per stage (the Gopher one-scan
    * discipline applied to the image column). */
  def decodeProfile(media: Dataset[MediaRecord]): Dataset[MediaProfile] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val img = Ppm.decode(r.payload)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < img.raster.length) {
          sr += (img.raster(i) & 0xff)
          sg += (img.raster(i + 1) & 0xff)
          sb += (img.raster(i + 2) & 0xff)
          i += 3
        }
        val nPx = img.width.toLong * img.height
        MediaProfile(r.media_id, img.width, img.height,
          r.payload.length.toLong, nPx, sr, sg, sb,
          (sr + sg + sb) * 1000000L / (nPx * 3L * img.maxVal),
          dhashOf(img))
      }
    }
  }

  /** Duplicate-upload fixture: the same image re-hosted under many
    * doc_ids — seed = doc_id mod `copies`, so every seed's raster
    * recurs ~n/copies times — with every ODD doc_id re-encoded
    * through a distinct header comment ([[Ppm.encodeWithComment]]).
    * The result is the corpus byte-level dedup MISSES: md5(payload)
    * differs on every odd copy while the decoded content is
    * identical. Generation is per-partition like
    * [[mediaFromDocuments]]. */
  def mediaDupFromDocuments(docs: DataFrame,
                            copies: Int = 97): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val seed = java.lang.Math.floorMod(id, copies.toLong)
        val (w, h) = fixtureDims(seed)
        val payload =
          if (java.lang.Math.floorMod(id, 2L) == 1L)
            Ppm.encodeWithComment(seed, w, h, s"upload $id")
          else Ppm.encode(seed, w, h)
        MediaRecord(id, "image", payload, w, h, "image/ppm")
      }
    }
  }

  /** Edited-reupload fixture: [[mediaDupFromDocuments]]' copy
    * structure (seed = doc_id mod `copies`), but every doc_id % 3 == 1
    * copy carries a ONE-BYTE raster edit (first sample bumped by 64
    * mod 256 — a hard retouch of one pixel) instead of a header
    * comment: the slightly-retouched re-upload exact content hashing
    * misses and perceptual hashing must still catch. The edit moves
    * the dHash by at most ceil(8/height) <= 3 bits (only grid rows
    * sampling pixel (0,0) can flip, one boundary comparison each), so
    * edited copies sit within Hamming 3 of their originals at the
    * fixture dims — measured over all 97 seeds: 1-3 bits for 75,
    * 0 for 22, never more. */
  def mediaEditedFromDocuments(docs: DataFrame,
                               copies: Int = 97): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val seed = java.lang.Math.floorMod(id, copies.toLong)
        val (w, h) = fixtureDims(seed)
        val payload = Ppm.encode(seed, w, h)
        if (java.lang.Math.floorMod(id, 3L) == 1L) {
          val headerLen = s"P6\n$w $h\n255\n".length
          payload(headerLen) =
            (((payload(headerLen) & 0xff) + 64) % 256).toByte
        }
        MediaRecord(id, "image", payload, w, h, "image/ppm")
      }
    }
  }

  /** Image near-dup PAIRS via Hamming-banded dHash — the promise in
    * [[dhash]]'s contract made a real operator: the 56-bit hash
    * splits into 4 x 14-bit bands, candidates meet on any equal band
    * (bucket-keyed equi-join — inverted-index shaped, never all
    * pairs), and a codegen'd xor/bit_count verify keeps exactly the
    * pairs within `maxHamming`. Pigeonhole makes the banding LOSSLESS
    * here: maxHamming <= 3 differing bits cannot touch all 4 bands,
    * so recall vs brute force is exactly 1 and a SQL oracle can
    * replay the output. At 100 TB this is the text-SimHash scale
    * story on the image column: 8 bytes/image cross the shuffle,
    * never payloads.
    *
    * Class-collapsed since r16 (see [[graft.ext.BandedPairs]]): a
    * duplicate-heavy corpus previously emitted k²/2 pairs per k-copy
    * image class (97.9 M rows at sf1; one 10⁶-copy viral image is
    * 5·10¹¹ pairs at 100 TB). Identical hashes now group to one
    * representative row before banding, cross-class rows carry class
    * sizes (n_pairs = n_a·n_b), each class of size >= 2 emits one
    * intra-class row (n_pairs = n·(n-1)/2), and hot band buckets are
    * capped loudly (GuardLog `phash_hot_bucket`). */
  def phashHammingPairs(media: Dataset[MediaRecord],
                        maxHamming: Int = 3,
                        maxBucket: Long = 2048L): DataFrame =
    graft.ext.BandedPairs.classPairs(dhash(media).toDF(),
      "media_id", "phash", nBands = 4, bandBits = 14, maxHamming,
      maxBucket, "phash_hot_bucket")

  /** Content-level image dedup: group by the perceptual hash of the
    * DECODED raster, not the payload bytes — the operator that
    * catches re-encoded copies (same pixels, different header/
    * container bytes) byte-level md5 dedup structurally misses.
    * `n_distinct_payloads > 1` inside a group is exactly that catch,
    * made visible: each group reports its copy count, how many
    * distinct byte streams carried the content, and the min-id
    * keeper. One decode pass emitting (id, dhash, payload-md5) —
    * 8 bytes + a digest per image cross the shuffle, never payloads —
    * then a hash-keyed agg with map-side combine. At 100 TB the agg
    * keys are ~distinct-images, the same scale story as text exact
    * dedup ([[graft.ext.Dedup]]). */
  def phashDedupReport(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val keys = media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val h = dhashOf(Ppm.decode(r.payload))
        md.reset()
        val hex = md.digest(r.payload).map("%02x".format(_)).mkString
        (r.media_id, h, hex)
      }
    }.toDF("media_id", "phash", "payload_md5")
    keys.groupBy(col("phash"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("payload_md5")).as("n_distinct_payloads"),
        min(col("media_id")).as("keeper_id"))
  }

  /** Gate: every payload's parsed header must agree with the record's
    * metadata columns. Returns the number of records checked; throws
    * on the first inconsistent partition-local record. Distributed —
    * only the count reaches the driver. */
  def requireMetadataConsistent(media: Dataset[MediaRecord]): Long = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val img = Ppm.decode(r.payload)
        if (img.width != r.width || img.height != r.height)
          throw new IllegalStateException(
            s"media ${r.media_id}: header ${img.width}x${img.height} " +
              s"!= metadata ${r.width}x${r.height}")
        1L
      }
    }.toDF("checked")
      // agg, not reduce: an EMPTY media table is consistent (0
      // records checked), not an 'empty collection' crash
      .agg(coalesce(sum(col("checked")), lit(0L)))
      .head().getLong(0)
  }

  /** REAL nearest-neighbor downscale: decode, keep every `factor`-th
    * pixel in both axes, re-encode as P6 with the reduced dimensions.
    * Batched per partition like [[decodeFeatures]]; output payloads
    * are themselves valid P6 images (decode(resize(x)) works). */
  def resize(media: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val img = Ppm.decode(r.payload)
        val nw = (img.width + factor - 1) / factor
        val nh = (img.height + factor - 1) / factor
        val header = s"P6\n$nw $nh\n${img.maxVal}\n"
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        val out = new Array[Byte](header.length + nw * nh * 3)
        System.arraycopy(header, 0, out, 0, header.length)
        var o = header.length
        var y = 0
        while (y < nh) {
          var x = 0
          while (x < nw) {
            val src = ((y * factor) * img.width + (x * factor)) * 3
            out(o) = img.raster(src)
            out(o + 1) = img.raster(src + 1)
            out(o + 2) = img.raster(src + 2)
            o += 3; x += 1
          }
          y += 1
        }
        r.copy(payload = out, width = nw, height = nh,
          format = s"${r.format};resized/$factor")
      }
    }
  }

  /** Frame sampling over decoded images: every `stride`-th SCANLINE is
    * a "frame" (the video-pipeline shape: decode, stride-sample,
    * aggregate), summed exactly so the oracle can replay it. */
  def frameScanlines(media: Dataset[MediaRecord],
                     stride: Int): Dataset[FrameSample] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val img = Ppm.decode(r.payload)
        val rowBytes = img.width * 3
        var sum = 0L
        var sampled = 0L
        var y = 0
        while (y < img.height) {
          var i = y * rowBytes
          val end = i + rowBytes
          while (i < end) { sum += (img.raster(i) & 0xff); i += 1 }
          sampled += 1
          y += stride
        }
        FrameSample(r.media_id, img.height.toLong, sampled, sum)
      }
    }
  }

  /** Pure-Column variant of the byte-level features that IS
    * SQL-expressible (oracle-checkable): payload size per record. */
  def payloadStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"))

  /** Frame sampling over an opaque TEXT payload: fixed-size chunks
    * ("frames") taken every `stride`-th, fingerprinted. Pure Column
    * algebra — the no-codec fallback shape (chunk, stride-sample,
    * hash); kept alongside [[frameScanlines]], which exercises the
    * real decoded-bytes path. */
  def frameSample(docs: DataFrame, chunkChars: Int, stride: Int): DataFrame = {
    val nChunks = floor((length(col("text")) + (chunkChars - 1))
      / (chunkChars * 1.0)).cast("long")
    docs.select(col("doc_id"), col("text"), nChunks.as("n_chunks"))
      .withColumn("sampled", when(col("n_chunks") >= 1, transform(
        sequence(lit(0L), col("n_chunks") - 1, lit(stride.toLong)),
        i => col("text").substr((i * chunkChars + 1).cast("int"),
          lit(chunkChars))))
        .otherwise(array().cast("array<string>")))
      .select(col("doc_id"), col("n_chunks"),
        size(col("sampled")).cast("long").as("n_sampled"),
        md5(concat_ws("", col("sampled"))).as("sample_md5"))
  }
}
