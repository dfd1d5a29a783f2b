package graft.operators

import graft.SparkSpec
import graft.ops.{BinnedMedian, Relational}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalMedianSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("pngPayloads + decodeImageMeta: REAL PNG round trip recovers the pixel grid") {
    val docs = Seq(1L, 2L, 40L, 77L).toDF("doc_id")
    val meta = Multimodal.decodeImageMeta(
        Multimodal.pngPayloads(docs, "doc_id"), "doc_id", "payload")
      .collect().map(m => m.doc_id -> m).toMap
    // payloads are genuine PNGs: magic bytes + nontrivial size
    val png = Multimodal.pngFor(40L)
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    meta.foreach { case (id, m) =>
      assert(m.width == Multimodal.widthFor(id) && m.height == Multimodal.heightFor(id))
      assert(m.channels == 3)
      assert(m.n_bytes > 50, "a real PNG container, not raw bytes")
      // the checksum must equal the fold over the GENERATOR's pixel formulas
      // — i.e. the decode recovered every pixel value exactly
      var crc = 0L
      def fold(v: Int): Unit = crc = ((crc % (1L << 55)) * 32L + (crc >>> 55)) ^ v.toLong
      for (y <- 0 until m.height; x <- 0 until m.width) {
        val (r, g, b) = Multimodal.rgbFor(id, x, y)
        fold(r); fold(g); fold(b)
      }
      assert(m.checksum == crc, s"pixel checksum mismatch for id=$id")
    }
  }

  test("imageAHash: decoded-pixel hash matches the formula replay; poison rows flagged") {
    val ids = Seq(1L, 2L, 40L, 77L, 91L, 182L) // 91/182: same dims AND same grid residues?
    val got = Multimodal.imageAHash(
        Multimodal.pngPayloads(ids.toDF("doc_id"), "doc_id"), "doc_id", "payload")
      .collect().map(h => h.doc_id -> h.ahash).toMap
    ids.foreach { id =>
      val w = Multimodal.widthFor(id); val h = Multimodal.heightFor(id)
      val grays = for (j <- 0 until 8; i <- 0 until 8) yield {
        val (r, g, b) = Multimodal.rgbFor(id, i * w / 8, j * h / 8)
        (r + g + b) / 3
      }
      val mean = grays.map(_.toLong).sum / 64L
      var want = 0L
      grays.zipWithIndex.foreach { case (g, k) => if (g > mean) want |= (1L << k) }
      assert(got(id) == want, s"id=$id")
    }
    // an undecodable payload is flagged decode_ok = false instead of
    // failing the scan — its ahash 0 is NOT a legitimate hash (0 is also
    // the aHash of any flat image, so the flag is the only poison signal)
    val poison = Multimodal.imageAHash(
        Multimodal.withFakePayload(Seq((9L, "junk")).toDF("doc_id", "text"), "text"),
        "doc_id", "payload").collect()
    assert(poison.head.ahash == 0L && !poison.head.decode_ok)
    // real decodes carry decode_ok = true
    val ok = Multimodal.imageAHash(
        Multimodal.pngPayloads(Seq(1L).toDF("doc_id"), "doc_id"),
        "doc_id", "payload").collect()
    assert(ok.head.decode_ok)
  }

  test("imageNearDupPairs: banded join equals brute-force hamming; planted noisy copies bite") {
    // real PNG round trips: originals plus re-encoded noisy copies
    // (relabeled +10^9) — ids 17/62/187 are measured to drift 2/3/1 aHash
    // bits under the deterministic perturbation, id 2 to drift 0
    val ids = Seq(2L, 17L, 62L, 187L)
    val clean = Multimodal.pngPayloads(ids.toDF("doc_id"), "doc_id")
    val noisy = Multimodal.noisyPngPayloads(ids.toDF("doc_id"), "doc_id")
      .withColumn("doc_id", $"doc_id" + 1000000000L)
    val hashed = Multimodal.imageAHash(
        clean.unionByName(noisy), "doc_id", "payload").toDF()
      .filter($"decode_ok")
    val got = Multimodal.imageNearDupPairs(hashed, "doc_id", "ahash")
      .as[(Long, Long, Int)].collect().toSet
    // brute-force replay over the same hashes: every pair, popcount XOR
    val hs = hashed.as[(Long, Long, Boolean)].collect().map(t => t._1 -> t._2)
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      hd = java.lang.Long.bitCount(ha ^ hb) if hd >= 1 && hd <= 3
    } yield (a, b, hd)).toSet
    assert(got == brute, "banded join must equal brute-force hamming (lossless for d<=3)")
    // the planted drifted copies are exactly what exact grouping misses
    assert(got.contains((17L, 1000000017L, 2)))
    assert(got.contains((62L, 1000000062L, 3)))
    assert(got.contains((187L, 1000000187L, 1)))
    // the hamming-0 copy (id 2) pairs with nothing here: exact duplicates
    // are the q212 groupBy's domain, excluded from the near pass
    assert(!got.exists { case (a, b, _) => a == 2L && b == 1000000002L })
    // the lossless-band precondition is enforced, not assumed
    intercept[IllegalArgumentException] {
      Multimodal.imageNearDupPairs(hashed, "doc_id", "ahash", maxHamming = 4)
    }
  }

  test("videoFrameHashes: DIB round trip matches the formula replay; near-dup pairs via rare shared hash") {
    def replayHash(id: Long, f: Int, noisy: Boolean): Long = {
      val w = Multimodal.vWidthFor(id); val h = Multimodal.vHeightFor(id)
      def clamp(v: Int) = math.max(0, math.min(255, v))
      val grays = for (j <- 0 until 8; i <- 0 until 8) yield {
        val (x, y) = (i * w / 8, j * h / 8)
        val (r, g, b) = Multimodal.vRgbFor(id, f, x, y)
        val d = if (noisy) Multimodal.vNoiseFor(id, f, x, y) else 0
        (clamp(r + d) + clamp(g + d) + clamp(b + d)) / 3
      }
      val mean = grays.map(_.toLong).sum / 64L
      var hsh = 0L
      grays.zipWithIndex.foreach { case (g, k) => if (g > mean) hsh |= (1L << k) }
      hsh
    }
    val ids = Seq(1L, 5L, 9L, 42L)
    val got = Multimodal.videoFrameHashes(
        Multimodal.aviPayloads(ids.toDF("doc_id"), "doc_id"), "doc_id", "payload")
      .collect().map(r => (r.doc_id, r.frame) -> r.fhash).toMap
    ids.foreach { id =>
      (0 until Multimodal.vFrameCountFor(id)).foreach { f =>
        assert(got((id, f)) == replayHash(id, f, noisy = false), s"id=$id f=$f")
      }
    }
    // the NOISY re-encode round-trips to the perturbed replay
    val gotN = Multimodal.videoFrameHashes(
        Multimodal.noisyAviPayloads(Seq(1L).toDF("doc_id"), "doc_id"),
        "doc_id", "payload")
      .collect().map(r => r.frame -> r.fhash).toMap
    (0 until Multimodal.vFrameCountFor(1L)).foreach { f =>
      assert(gotN(f) == replayHash(1L, f, noisy = true), s"noisy f=$f")
    }
    // a non-AVI payload yields zero rows, not a poison hash
    val junk = Multimodal.videoFrameHashes(
      Multimodal.withFakePayload(Seq((7L, "junk")).toDF("doc_id", "text"), "text"),
      "doc_id", "payload")
    assert(junk.count() == 0L)
    // near-dup: a video and its noisy copy pair through an unperturbed
    // frame; a boilerplate hash carried by MORE than the cap is excluded
    import org.apache.spark.sql.Row
    val fhRows = Seq(
      (100L, 0, 7777L), (200L, 0, 7777L),            // rare shared hash
      (100L, 1, 1111L), (200L, 1, 2222L)) ++          // unshared
      (0 until 5).map(v => (300L + v, 0, 9999L))      // boilerplate (5 > cap 4)
    val pairs = Multimodal.videoNearDupPairs(
        fhRows.toDF("doc_id", "frame", "fhash"), "doc_id", "fhash",
        maxVideosPerHash = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((100L, 200L, 1L)),
      "rare shared hash pairs; the over-cap boilerplate hash must not")
  }

  test("decodeImageMeta zeroes metadata for undecodable payloads instead of failing") {
    val docs = Seq((1L, "not an image"), (2L, "")).toDF("doc_id", "text")
    val meta = Multimodal.decodeImageMeta(
        Multimodal.withFakePayload(docs, "text"), "doc_id", "payload")
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).n_bytes == 12 && meta(1L).width == 0 && meta(1L).checksum == 0L)
    assert(meta(2L).n_bytes == 0 && meta(2L).width == 0)
  }

  test("wavPayloads + decodeAudioMeta: REAL WAV round trip recovers the PCM grid") {
    val docs = Seq(0L, 1L, 2L, 3L, 100L).toDF("doc_id")
    val meta = Multimodal.decodeAudioMeta(
        Multimodal.wavPayloads(docs, "doc_id"), "doc_id", "payload")
      .collect().map(m => m.doc_id -> m).toMap
    // payloads are genuine RIFF/WAVE containers
    val wav = Multimodal.wavFor(3L)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    meta.foreach { case (id, m) =>
      assert(m.sample_rate == Multimodal.sampleRateFor(id))
      assert(m.channels == Multimodal.channelsFor(id))
      assert(m.n_frames == Multimodal.frameCountFor(id).toLong)
      assert(m.n_bytes > m.n_frames * m.channels * 2, "a real container, not raw PCM")
      // the checksum must equal the fold over the GENERATOR's sample
      // formula — i.e. the decode recovered every 16-bit sample exactly
      var crc = 0L
      for (f <- 0 until Multimodal.frameCountFor(id); c <- 0 until m.channels) {
        val v = Multimodal.sampleFor(id, f, c)
        crc = ((crc % (1L << 55)) * 32L + (crc >>> 55)) ^ v.toLong
      }
      assert(m.checksum == crc, s"PCM checksum mismatch for id=$id")
    }
  }

  test("decodeAudioMeta zeroes metadata for undecodable payloads instead of failing") {
    val docs = Seq((1L, "not audio at all"), (2L, "")).toDF("doc_id", "text")
    val meta = Multimodal.decodeAudioMeta(
        Multimodal.withFakePayload(docs, "text"), "doc_id", "payload")
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).n_bytes == 16 && meta(1L).sample_rate == 0 && meta(1L).checksum == 0L)
    assert(meta(2L).n_bytes == 0 && meta(2L).sample_rate == 0)
  }

  test("aviPayloads + decodeVideoMeta: REAL AVI round trip recovers sampled frames") {
    val docs = Seq(0L, 1L, 2L, 3L, 4L, 100L).toDF("doc_id")
    val meta = Multimodal.decodeVideoMeta(
        Multimodal.aviPayloads(docs, "doc_id"), "doc_id", "payload")
      .collect().map(m => m.doc_id -> m).toMap
    // payloads are genuine RIFF/AVI containers
    val avi = Multimodal.aviFor(3L)
    assert(new String(avi.take(4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    meta.foreach { case (id, m) =>
      assert(m.width == Multimodal.vWidthFor(id) && m.height == Multimodal.vHeightFor(id))
      assert(m.n_frames == Multimodal.vFrameCountFor(id))
      assert(m.fps == Multimodal.vFpsFor(id))
      assert(m.n_sampled == (m.n_frames + 1) / 2)
      // checksum must equal the fold over the GENERATOR's pixel formulas
      // for every SECOND frame — i.e. the RIFF walk + bottom-up DIB decode
      // recovered each sampled frame exactly
      var crc = 0L
      def fold(v: Int): Unit = crc = ((crc % (1L << 55)) * 32L + (crc >>> 55)) ^ v.toLong
      for (f <- 0 until m.n_frames by 2; y <- 0 until m.height; x <- 0 until m.width) {
        val (r, g, b) = Multimodal.vRgbFor(id, f, x, y)
        fold(r); fold(g); fold(b)
      }
      assert(m.checksum == crc, s"sampled-frame checksum mismatch for id=$id")
    }
  }

  test("decodeVideoMeta zeroes compressed streams and garbage instead of failing") {
    // flip the '00db' (uncompressed) frame tags to '00dc' (compressed):
    // a stream we have no decoder for must zero out, not miscount
    val compressed = Multimodal.aviFor(5L)
    for (i <- 0 until compressed.length - 3
         if compressed(i) == '0' && compressed(i + 1) == '0' &&
           compressed(i + 2) == 'd' && compressed(i + 3) == 'b')
      compressed(i + 3) = 'c'
    val docs = Seq((5L, compressed), (6L, "not a movie".getBytes("UTF-8")),
      (7L, Array.empty[Byte])).toDF("doc_id", "payload")
    val meta = Multimodal.decodeVideoMeta(docs, "doc_id", "payload")
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(5L).width == 0 && meta(5L).checksum == 0L && meta(5L).n_bytes > 0)
    assert(meta(6L).width == 0 && meta(7L).width == 0)
  }

  test("MJPEG AVI: '00dc' JPEG frames decode through ImageIO (real lossy decode)") {
    val ids = Seq(0L, 1L, 5L, 9L)
    val payloads = ids.toDF("doc_id").as[Long]
      .mapPartitions(it => it.map(id => (id, Multimodal.aviMjpgFor(id))))
      .toDF("doc_id", "payload")
    val meta = Multimodal.decodeVideoMeta(payloads, "doc_id", "payload")
      .collect().map(m => m.doc_id -> m).toMap
    ids.foreach { id =>
      val m = meta(id)
      assert(m.width == Multimodal.vWidthFor(id) && m.height == Multimodal.vHeightFor(id))
      assert(m.n_frames == Multimodal.vFrameCountFor(id) && m.fps == Multimodal.vFpsFor(id))
      assert(m.n_sampled == (m.n_frames + 1) / 2)
      // expected checksum: independently re-encode each sampled frame with
      // the same JDK JPEG encoder, read it back with ImageIO, fold pixels —
      // decodeVideoMeta must recover exactly these (lossy) decoded values
      var crc = 0L
      def fold(v: Int): Unit = crc = ((crc % (1L << 55)) * 32L + (crc >>> 55)) ^ v.toLong
      var lossless = 0L
      def foldL(v: Int): Unit =
        lossless = ((lossless % (1L << 55)) * 32L + (lossless >>> 55)) ^ v.toLong
      for (f <- 0 until m.n_frames by 2) {
        val img = new java.awt.image.BufferedImage(
          m.width, m.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until m.height; x <- 0 until m.width) {
          val (r, g, b) = Multimodal.vRgbFor(id, f, x, y)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          foldL(r); foldL(g); foldL(b)
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        val back = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bos.toByteArray))
        for (y <- 0 until m.height; x <- 0 until m.width) {
          val rgb = back.getRGB(x, y)
          fold((rgb >> 16) & 0xff); fold((rgb >> 8) & 0xff); fold(rgb & 0xff)
        }
      }
      assert(m.checksum == crc, s"MJPEG decoded-pixel checksum mismatch for id=$id")
      assert(m.checksum != lossless,
        s"id=$id: JPEG decode should be lossy — equal checksums mean the " +
          "decoder read the generator formulas, not the JPEG frames")
    }
  }

  test("MJPEG AVI with a corrupt frame zeroes out (poison row), not fails") {
    val avi = Multimodal.aviMjpgFor(5L)
    // find the first '00dc' chunk and scramble its JPEG body
    val idx = (0 until avi.length - 3).find(i =>
      avi(i) == '0' && avi(i + 1) == '0' && avi(i + 2) == 'd' && avi(i + 3) == 'c').get
    for (k <- idx + 10 until math.min(idx + 40, avi.length)) avi(k) = 0x55
    val meta = Multimodal.decodeVideoMeta(
        Seq((5L, avi)).toDF("doc_id", "payload"), "doc_id", "payload")
      .collect().head
    assert(meta.width == 0 && meta.checksum == 0L && meta.n_bytes > 0)
  }

  test("frameSample slices evenly spaced frames; short payloads yield fewer") {
    val df = Seq(("x" * 100, 1), ("ab", 2)).toDF("text", "id")
    val out = df.select(col("id"),
        size(Multimodal.frameSample(encode(col("text"), "UTF-8"), 4, 16)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(out(1) == 4)
    assert(out(2) == 2)
  }

  test("BinnedMedian finds the 0.5-crossing bin (+0.5 convention)") {
    // group g: bins 1(x3), 2(x1), 3(x1) → cum shares 0.6 at bin 1 → median 1.5
    // group h: bins 1(x1), 2(x1), 3(x2) → shares .25/.5/1.0 → crossing at bin 2 → 2.5
    val counts = Seq(
      ("g", 1.0, 3L), ("g", 2.0, 1L), ("g", 3.0, 1L),
      ("h", 1.0, 1L), ("h", 2.0, 1L), ("h", 3.0, 2L),
    ).toDF("grp", "bin", "n")
    val m = BinnedMedian.derive(counts, Seq("grp"), "bin", "n")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("g") == 1.5)
    assert(m("h") == 2.5)
  }

  test("dropAllNullCols removes only fully-null columns") {
    val df = Seq((1, None: Option[String], None: Option[Int]),
      (2, Some("x"), None)).toDF("a", "b", "c")
    assert(Relational.dropAllNullCols(df).columns.toSeq == Seq("a", "b"))
  }

  test("swapWhere exchanges values only where the predicate holds") {
    val df = Seq(("a", "z", 1), ("b", "y", 0)).toDF("l", "r", "flip")
    val out = Relational.swapWhere(df, col("flip") === 1, "l", "r")
      .orderBy("flip").collect()
    assert((out(1).getString(0), out(1).getString(1)) == ("z", "a"))
    assert((out(0).getString(0), out(0).getString(1)) == ("b", "y"))
  }
}
