package graft.ext

import java.nio.charset.StandardCharsets.US_ASCII

import graft.SparkSpec
import graft.ext.Multimodal.Ppm

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("ppm codec round-trips: decode(encode) recovers dims and raster") {
    for (seed <- Seq(0L, 1L, 7L, 123456789L)) {
      val (w, h) = Multimodal.fixtureDims(seed)
      val img = Ppm.decode(Ppm.encode(seed, w, h))
      assert(img.width == w && img.height == h && img.maxVal == 255)
      assert(img.raster.length == w * h * 3)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        assert((img.raster((y * w + x) * 3 + c) & 0xff) ==
          Ppm.pixelValue(seed, x, y, c))
    }
  }

  test("ppm parser implements the real header grammar: comments and whitespace") {
    // the netpbm spec allows comments and arbitrary whitespace between
    // header tokens — a parser that only accepts the canonical layout
    // isn't a PPM parser
    val raster = Array.tabulate[Byte](2 * 1 * 3)(i => (i * 40).toByte)
    val exotic = ("P6 # comment right after magic\n" +
      "# a full comment line\n  2\t# width\n 1 \n255 ").getBytes(US_ASCII) ++
      raster
    val img = Ppm.decode(exotic)
    assert(img.width == 2 && img.height == 1 && img.maxVal == 255)
    assert(img.raster.toSeq == raster.toSeq)
  }

  test("ppm parser fails loudly on malformed payloads") {
    val ok = Ppm.encode(5L, 4, 3)
    intercept[IllegalArgumentException] {
      Ppm.decode("P5\n4 3\n255\n".getBytes(US_ASCII)) // grayscale magic
    }
    intercept[IllegalArgumentException] {
      Ppm.decode(ok.dropRight(1)) // truncated raster
    }
    intercept[IllegalArgumentException] {
      Ppm.decode("P6\n2 2\n65535\n".getBytes(US_ASCII) ++
        new Array[Byte](24)) // 2-byte samples unsupported
    }
    intercept[IllegalArgumentException] {
      Ppm.decode("P6\n0 3\n255\n".getBytes(US_ASCII)) // degenerate dims
    }
  }

  test("parser rejects an overflow-sized header loudly, not with garbage") {
    // 43691 x 32768 x 3 wraps Int32; the bound check must still fire
    val ex = intercept[IllegalArgumentException] {
      Ppm.decode("P6\n43691 32768\n255\n".getBytes(US_ASCII) ++
        new Array[Byte](64))
    }
    assert(ex.getMessage.contains("truncated raster"))
  }

  test("brightness normalizes by the parsed maxval, not a hard-coded 255") {
    // a legal maxval-100 image: all-samples-100 is full brightness
    val raster = Array.fill[Byte](2 * 2 * 3)(100)
    val payload = "P6\n2 2\n100\n".getBytes(US_ASCII) ++ raster
    val media = Seq(Multimodal.MediaRecord(7L, "image", payload,
      2, 2, "image/ppm")).toDS()
    val f = Multimodal.decodeFeatures(media).collect().head
    assert(f.brightness_ppm == 1000000L,
      s"maxval-100 saturated image must be full brightness, got ${f.brightness_ppm}")
  }

  test("metadata gate on an empty media table reports 0, not a crash") {
    val empty = spark.emptyDataset[Multimodal.MediaRecord]
    assert(Multimodal.requireMetadataConsistent(empty) == 0L)
  }

  test("decode features parse real bytes and are deterministic") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(50)
    val media = Multimodal.mediaFromDocuments(docs)
    val f1 = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.nonEmpty)
    f1.foreach { r =>
      // n_bytes = header (9 + digit counts) + raster
      assert(r.n_bytes == 9 + r.width.toString.length +
        r.height.toString.length + 3L * r.width * r.height)
      assert(r.n_pixels == r.width.toLong * r.height)
      // channel sums are bounded by 255 per sample
      assert(r.sum_r >= 0 && r.sum_r <= 255L * r.n_pixels)
      assert(r.brightness_ppm >= 0 && r.brightness_ppm <= 1000000L)
    }
    // header metadata and record metadata agree for the whole corpus
    assert(Multimodal.requireMetadataConsistent(media) == 50L)
  }

  test("metadata-consistency gate catches a header/metadata mismatch") {
    val bad = Seq(Multimodal.MediaRecord(1L, "image",
      Ppm.encode(1L, 4, 3), 99, 3, "image/ppm")).toDS()
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.requireMetadataConsistent(bad)
    }
    assert(ex.getMessage != null)
  }

  test("resize is a real nearest-neighbor downscale over decoded pixels") {
    val media = Seq(Multimodal.MediaRecord(42L, "image",
      Ppm.encode(42L, 10, 7), 10, 7, "image/ppm")).toDS()
    val r = Multimodal.resize(media, 3).collect().head
    // ceil(10/3) x ceil(7/3)
    assert(r.width == 4 && r.height == 3)
    val img = Ppm.decode(r.payload) // output is itself a valid P6
    assert(img.width == 4 && img.height == 3)
    for (y <- 0 until 3; x <- 0 until 4; c <- 0 until 3)
      assert((img.raster((y * 4 + x) * 3 + c) & 0xff) ==
        Ppm.pixelValue(42L, x * 3, y * 3, c),
        s"resized pixel ($x,$y,$c) must be source pixel (${x * 3},${y * 3},$c)")
    assert(r.format.endsWith("resized/3"))
  }

  test("frame scanline sampling matches a brute-force replay") {
    val media = Seq(Multimodal.MediaRecord(9L, "image",
      Ppm.encode(9L, 5, 6), 5, 6, "image/ppm")).toDS()
    val fs = Multimodal.frameScanlines(media, stride = 2).collect().head
    assert(fs.n_frames == 6 && fs.n_sampled == 3) // y = 0, 2, 4
    val expect = (for (y <- 0 until 6 by 2; x <- 0 until 5; c <- 0 until 3)
      yield Ppm.pixelValue(9L, x, y, c).toLong).sum
    assert(fs.sampled_sum == expect)
  }

  private def mediaOf(id: Long, payload: Array[Byte], w: Int, h: Int) =
    Multimodal.MediaRecord(id, "image", payload, w, h, "image/ppm")

  test("dhash: identical payloads hash identically, 56-bit positive range") {
    val (w, h) = Multimodal.fixtureDims(42L)
    val p = Ppm.encode(42L, w, h)
    val hs = Multimodal.dhash(
        Seq(mediaOf(1L, p, w, h), mediaOf(2L, p.clone(), w, h)).toDS())
      .collect().map(m => m.media_id -> m.phash).toMap
    assert(hs(1L) == hs(2L), "same pixels must hash equal")
    assert(hs(1L) >= 0L && hs(1L) < (1L << 56), s"out of range: ${hs(1L)}")
  }

  test("dhash is a PERCEPTUAL hash: tiny perturbation stays near, " +
      "different image lands far") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val w = 16; val h = 16
    val base = Ppm.encode(7L, w, h)
    // flip the low bit of R at pixel (0,0): that pixel backs exactly
    // one grid cell (gx=0, gy=0), which participates in exactly one
    // horizontal comparison — at most 1 hash bit can move
    val headerLen = s"P6\n$w $h\n255\n".length
    val tweaked = base.clone()
    tweaked(headerLen) = ((tweaked(headerLen) & 0xff) ^ 1).toByte
    val other = Ppm.encode(1234567L, w, h)
    val hs = Multimodal.dhash(Seq(
        mediaOf(1L, base, w, h), mediaOf(2L, tweaked, w, h),
        mediaOf(3L, other, w, h)).toDS())
      .collect().map(m => m.media_id -> m.phash).toMap
    assert(hamming(hs(1L), hs(2L)) <= 2,
      s"near-identical images drifted ${hamming(hs(1L), hs(2L))} bits")
    assert(hamming(hs(1L), hs(3L)) >= 10,
      s"unrelated images implausibly close: ${hamming(hs(1L), hs(3L))}")
  }

  test("encodeWithComment: different bytes, identical decoded image") {
    val seed = 42L; val (w, h) = Multimodal.fixtureDims(seed)
    val plain = Multimodal.Ppm.encode(seed, w, h)
    val commented = Multimodal.Ppm.encodeWithComment(seed, w, h,
      "upload 12345")
    assert(!java.util.Arrays.equals(plain, commented),
      "the re-encoded payload must differ byte-wise")
    val a = Multimodal.Ppm.decode(plain)
    val b = Multimodal.Ppm.decode(commented)
    assert(a.width == b.width && a.height == b.height)
    assert(java.util.Arrays.equals(a.raster, b.raster),
      "decoded rasters must be identical")
    intercept[IllegalArgumentException] {
      Multimodal.Ppm.encodeWithComment(seed, w, h, "two\nlines")
    }
  }

  test("phashDedupReport collapses re-encoded copies md5 dedup misses") {
    // ids 0..9 at copies=3: seed 0 <- {0,3,6,9}, 1 <- {1,4,7},
    // 2 <- {2,5,8}. Evens share canonical bytes; odds are unique.
    val docs = (0L until 10L).toSeq.toDF("doc_id")
    val out = Multimodal.phashDedupReport(
        Multimodal.mediaDupFromDocuments(docs, copies = 3))
      .select("n_copies", "n_distinct_payloads", "keeper_id")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._3)
    assert(out == Seq((4L, 3L, 0L), (3L, 3L, 1L), (3L, 2L, 2L)),
      s"got $out")
    // the byte-level count really is bigger than the content count:
    // every group carries >= 2 distinct payloads for ONE image
    assert(out.forall(_._2 >= 2), "re-encoded copies must be visible")
  }

  test("phashHammingPairs: class pairs equal brute force over classes, edits stay near") {
    // ids 0..11 at copies=4 -> seeds {0,1,2,3}, three copies each;
    // ids 1,4,7,10 carry the one-byte raster edit
    val docs = (0L until 12L).toSeq.toDF("doc_id")
    val media = Multimodal.mediaEditedFromDocuments(docs, copies = 4)
    val rows = Multimodal.phashHammingPairs(media, maxHamming = 3)
      .select("doc_a", "doc_b", "hamming", "n_a", "n_b", "n_pairs")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    // brute force over DISTINCT-hash classes built from the same
    // hashes (r16 class semantics): banding must stay lossless
    val hs = Multimodal.dhash(media).collect()
      .map(m => m.media_id -> m.phash).toMap
    val cls = hs.groupBy(_._2).map { case (h, m) =>
      (h, m.keys.min, m.size.toLong)
    }.toSeq
    val cross = (for {
      (ha, ra, na) <- cls; (hb, rb, nb) <- cls if ra < rb
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ra, rb, d.toLong, na, nb, na * nb)).toSet
    val intra = cls.filter(_._3 >= 2).map { case (_, r, n) =>
      (r, r, 0L, n, n, n * (n - 1) / 2)
    }.toSet
    assert(rows == cross ++ intra,
      s"class banding must be lossless at Hamming <= 3: $rows vs ${cross ++ intra}")
    // the implied doc-level pair count is conserved exactly: every
    // same-seed copy pair is representable from the class rows
    val sumPairs = rows.toSeq.map(_._6).sum
    val ids = hs.keys.toSeq
    val brute = (for {
      a <- ids; b <- ids if a < b
      if java.lang.Long.bitCount(hs(a) ^ hs(b)) <= 3
    } yield 1).size.toLong
    assert(sumPairs == brute, s"sum(n_pairs)=$sumPairs brute=$brute")
    // edited copies sit within 3 bits of their seed class but CAN
    // land a nonzero-Hamming cross row — at least one must
    assert(rows.exists(r => r._3 > 0L),
      "at least one edited class should sit at nonzero Hamming")
    // and unedited copies of one seed share a class (intra rows exist)
    assert(rows.exists(r => r._1 == r._2 && r._4 >= 2L))
  }

  test("corruptFixture invariant: header always shorter than half the payload") {
    // ADVICE r16: the 'payload cut to half' fate classifies as
    // truncated_raster ONLY because the P6 header is shorter than
    // half the payload — the oracle replays that classification as a
    // closed form in doc_id % 11, so a fixtureDims change that broke
    // this would silently desynchronize Spark from the oracle. Pin
    // the coupling over one full fixtureDims period (lcm(13,7) = 91
    // ids covers every (w, h) the generator can produce).
    (0L until 91L).foreach { id =>
      val (w, h) = Multimodal.fixtureDims(id)
      val headerLen = s"P6\n$w $h\n255\n".length
      val payloadLen = headerLen + w * h * 3
      assert(headerLen < payloadLen / 2,
        s"id=$id dims=${w}x$h: header $headerLen >= half of $payloadLen — " +
          "the truncated fate would no longer classify as truncated_raster")
    }
  }

  test("decodeQuarantine classifies hostile payloads, never dies, and is loud") {
    import org.apache.spark.sql.functions._
    val (w, h) = Multimodal.fixtureDims(5L)
    val good = Ppm.encode(5L, w, h)
    val rows = Seq(
      Multimodal.MediaRecord(1L, "image", good, w, h, "image/ppm"),
      // raster cut short but header intact
      Multimodal.MediaRecord(2L, "image",
        java.util.Arrays.copyOf(good, good.length / 2), w, h, "image/ppm"),
      // wrong magic
      Multimodal.MediaRecord(3L, "image",
        "P5\n4 3\n255\n".getBytes(US_ASCII), w, h, "image/ppm"),
      // empty body
      Multimodal.MediaRecord(4L, "image", Array.emptyByteArray, w, h,
        "image/ppm"),
      // magic ok, header garbage
      Multimodal.MediaRecord(5L, "image", "P6\nxyz".getBytes(US_ASCII),
        w, h, "image/ppm"),
      // degenerate dimensions
      Multimodal.MediaRecord(6L, "image", "P6\n0 3\n255\n".getBytes(US_ASCII),
        w, h, "image/ppm"))
      .toDS()
    val out = Multimodal.decodeQuarantine(rows)
      .select("media_id", "status", "err_class")
      .as[(Long, String, Option[String])].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3.orNull)).toSeq == Seq(
      (1L, "ok", null),
      (2L, "quarantined", "truncated_raster"),
      (3L, "quarantined", "bad_magic"),
      (4L, "quarantined", "bad_magic"),
      (5L, "quarantined", "malformed_header"),
      (6L, "quarantined", "malformed_header")), s"got ${out.toSeq}")
    // the ok row still carries real decoded stats
    val okRow = Multimodal.decodeQuarantine(rows)
      .filter(col("status") === "ok")
      .select("width", "height", "brightness_ppm")
      .as[(Option[Long], Option[Long], Option[Long])].collect()(0)
    assert(okRow._1.contains(w.toLong) && okRow._2.contains(h.toLong))
    assert(okRow._3.exists(b => b >= 0L && b <= 1000000L))
  }
}
