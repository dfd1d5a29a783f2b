package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata (north-star extension, BASELINE.json).
  *
  * The image path is REAL: [[pngPayloads]] encodes genuine PNG bytes with
  * the JDK's built-in `javax.imageio` (no external jars), and
  * [[decodeImageMeta]] decodes any image format ImageIO recognises back to
  * width/height/channels plus an RGB pixel checksum — the full
  * encode→compress→decode round trip runs distributed inside executors.
  * The shape is the batched-UDF contract (`mapPartitions` over a typed
  * Dataset): per-partition setup once (ImageIO cache off — no temp files on
  * executor disks), per-row decode, Tungsten in/out.
  *
  * The audio path is REAL too: [[wavFor]] encodes genuine RIFF/WAVE bytes
  * through `javax.sound.sampled`'s built-in writer and [[decodeAudioMeta]]
  * decodes any format the JDK recognises back to sample rate / channels /
  * frame count plus a PCM sample checksum, under the same poison-row-safe
  * mapPartitions contract.
  *
  * The video path is REAL as well: [[aviFor]] writes genuine RIFF/AVI
  * containers with uncompressed 24-bit DIB frames and [[decodeVideoMeta]]
  * walks the RIFF tree (from scratch — the JDK has no AVI reader),
  * decodes sampled frames, and checksums their pixels. Compressed video
  * codecs stay out of scope (no JDK decoder); [[frameSample]]/
  * [[resizeBytes]] remain as generic byte-level operators for opaque
  * payloads of ANY format.
  */
object Multimodal {

  /** Deterministic fake payload standing in for raw media bytes (used by
    * the binary-plumbing path, which never decodes).
    */
  def withFakePayload(df: DataFrame, textCol: String, out: String = "payload"): DataFrame =
    df.withColumn(out, encode(col(textCol), "UTF-8"))

  /** Deterministic pixel formulas shared by the PNG generator, the decoder
    * test fixtures, and the SQL oracle (which recomputes the checksum from
    * these same expressions — PNG BYTES are not SQL-replicable because the
    * zlib stream is encoder-dependent, but the decoded PIXELS are).
    */
  def widthFor(id: Long): Int = (id % 13 + 1).toInt
  def heightFor(id: Long): Int = (id % 7 + 1).toInt
  def rgbFor(id: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((id + 31L * x + 17L * y) % 256).toInt,
    ((3L * id + 7L * x + 11L * y) % 256).toInt,
    ((5L * id + 13L * x + 3L * y) % 256).toInt)

  /** One REAL (tiny) PNG per id: returns (idCol, payload) with payload the
    * actual `ImageIO.write` PNG encoding of the deterministic pixel grid.
    */
  def pngPayloads(df: DataFrame, idCol: String, out: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map(id => (id, pngFor(id)))
      }
      .toDF(idCol, out)
  }

  /** Encode the deterministic pixel grid for `id` as real PNG bytes. */
  def pngFor(id: Long): Array[Byte] = {
    val w = widthFor(id)
    val h = heightFor(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = rgbFor(id, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                             channels: Int, checksum: Long)

  /** Real image decode: `ImageIO.read` inside executors. `width`/`height`/
    * `channels` come from the decoded image; `checksum` folds the decoded
    * RGB samples (row-major, R then G then B) with the 60-bit
    * rotate-left-5/xor scheme the SQL oracle reproduces without left shifts:
    * `crc' = xor((crc mod 2^55)*32 + (crc div 2^55), sample)`. Undecodable
    * or empty payloads yield zeroed metadata (n_bytes still reports the raw
    * size) rather than failing the scan — at corpus scale a poison row must
    * not kill the job.
    */
  def decodeImageMeta(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition init
        rows.map { case (id, bytes) =>
          val n = if (bytes == null) 0 else bytes.length
          val img =
            if (n == 0) null
            else
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              // NonFatal, not just IOException: ImageIO plugins throw
              // unchecked exceptions on crafted payloads (bad dimension
              // fields etc.), and one poison row must not kill a 100 TB scan
              catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) MediaMeta(id, n.toLong, 0, 0, 0, 0L)
          else {
            val w = img.getWidth
            val h = img.getHeight
            var crc = 0L
            def fold(v: Int): Unit =
              crc = ((crc % (1L << 55)) * 32L + (crc >>> 55)) ^ v.toLong
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = img.getRGB(x, y)
                fold((v >> 16) & 255); fold((v >> 8) & 255); fold(v & 255)
                x += 1
              }
              y += 1
            }
            MediaMeta(id, n.toLong, w, h, img.getRaster.getNumBands, crc)
          }
        }
      }
  }

  final case class ImageHash(doc_id: Long, ahash: Long, decode_ok: Boolean)

  /** Perceptual average-hash (aHash) from REAL decoded pixels — the
    * classic 64-bit image fingerprint (8×8 grid, gray vs own mean) that
    * groups re-encoded/resaved copies of one image where byte hashes
    * cannot (the PNG zlib stream is encoder-dependent; the pixels are
    * not). All integer: grid sample (gx, gy) = (⌊i·w/8⌋, ⌊j·h/8⌋)
    * nearest-neighbor (no resample filter — engines disagree on
    * interpolation), gray = (r+g+b) div 3, threshold at the 64-sample
    * integer-mean, bit k = j·8+i — so the oracle recomputes the hash
    * from the generator's pixel formulas, and any corruption in the
    * real encode→decode round trip flips bits. Undecodable/empty
    * payloads emit `decode_ok = false` (with ahash 0) so consumers can
    * EXCLUDE them from duplicate grouping — 0 is also the legitimate
    * aHash of any flat image (no gray strictly exceeds its own mean), so
    * a bare 0 cannot distinguish "corrupt" from "uniform"; the flag can
    * (the decode_ok analogue of [[decodeImageMeta]]'s zeroed-metadata
    * poison contract). One map-only pass, no shuffle.
    */
  def imageAHash(df: DataFrame, idCol: String, binCol: String): Dataset[ImageHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          val img =
            if (bytes == null || bytes.isEmpty) null
            else
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) ImageHash(id, 0L, decode_ok = false)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val grays = new Array[Long](64)
            var sum = 0L
            var j = 0
            while (j < 8) {
              var i = 0
              while (i < 8) {
                val v = img.getRGB(i * w / 8, j * h / 8)
                val g = (((v >> 16) & 255) + ((v >> 8) & 255) + (v & 255)) / 3
                grays(j * 8 + i) = g.toLong
                sum += g
                i += 1
              }
              j += 1
            }
            val mean = sum / 64L
            var hash = 0L
            var k = 0
            while (k < 64) {
              if (grays(k) > mean) hash |= (1L << k)
              k += 1
            }
            ImageHash(id, hash, decode_ok = true)
          }
        }
      }
  }

  /** Per-pixel perturbation for the NOISY re-encode of `id`'s image: a
    * deterministic delta in [-2, 2] added to all three channels and
    * clamped to [0, 255] — the integer stand-in for "the same photo
    * re-saved with slight processing noise". Shared by [[noisyPngFor]]
    * and the SQL oracle (which replays it with LEAST/GREATEST), exactly
    * as [[rgbFor]] is shared for the clean image.
    */
  def noiseFor(id: Long, x: Int, y: Int): Int =
    ((id + 7L * x + 3L * y) % 5).toInt - 2

  /** One REAL PNG of the NOISY variant of `id`'s pixel grid — re-encoded
    * perturbed pixels, not perturbed bytes, so the aHash of the decoded
    * copy differs from the original's by however many grid grays cross
    * the mean (measured: ~77% land at hamming 0, ~14% at 1–3, the rest
    * beyond — the 1–3 band is what the near-dup pass exists to catch).
    */
  def noisyPngFor(id: Long): Array[Byte] = {
    val w = widthFor(id)
    val h = heightFor(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = rgbFor(id, x, y)
        val d = noiseFor(id, x, y)
        img.setRGB(x, y,
          (clamp(r + d) << 16) | (clamp(g + d) << 8) | clamp(b + d))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** One REAL noisy PNG per id (same mapPartitions contract as
    * [[pngPayloads]]).
    */
  def noisyPngPayloads(df: DataFrame, idCol: String, out: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map(id => (id, noisyPngFor(id)))
      }
      .toDF(idCol, out)
  }

  /** NEAR-duplicate image pairs by aHash hamming distance, banded so no
    * all-pairs join ever forms: each 64-bit hash splits into four 16-bit
    * bands; for `maxHamming` <= 3 at most three bits differ, so by
    * pigeonhole every qualifying pair agrees EXACTLY on at least one
    * band — the banded equi-self-join is lossless, and the SQL oracle
    * replays the same four joins (`require`d, not assumed). Pairs at
    * hamming 0 are EXCLUDED by design: exact-duplicate groups are the
    * groupBy's domain ([[imageAHash]] + group, the q212 shape) where an
    * m-member group costs m rows, not the m² pairs a pair-join would
    * emit (the winnow stop-fingerprint lesson). Candidates within a
    * band bucket verify with one integer XOR+popcount — no per-pair
    * array or pixel work. Input is the (id, ahash) frame from
    * [[imageAHash]] (poison rows already excluded via decode_ok).
    * Returns (id_a, id_b, hamming), id_a < id_b.
    */
  def imageNearDupPairs(hashed: DataFrame, idCol: String, hashCol: String,
                        maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 3,
      s"banded join is lossless only for 1 <= maxHamming <= 3 (4 bands), got $maxHamming")
    val bands = (0 until 4).map(b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col(hashCol), b * 16).bitwiseAND(lit(65535L)).as("key")))
    val fp = hashed.select(col(idCol).cast("long").as("_id"),
        col(hashCol).cast("long").as("_h"),
        explode(array(bands: _*)).as("_bk"))
      .select(col("_id"), col("_h"),
        col("_bk.band").as("_band"), col("_bk.key").as("_key"))
    val a = fp.select(col("_band"), col("_key"),
      col("_id").as("id_a"), col("_h").as("_ha"))
    val b = fp.select(col("_band"), col("_key"),
      col("_id").as("id_b"), col("_h").as("_hb"))
    a.join(b, Seq("_band", "_key"))
      .filter(col("id_a") < col("id_b"))
      // a pair can collide on several bands — one row per pair
      .select(col("id_a"), col("id_b"), col("_ha"), col("_hb")).distinct()
      .withColumn("hamming",
        graft.functions.TextFunctions.hamming64(col("_ha"), col("_hb")))
      .filter(col("hamming") >= 1 && col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Deterministic WAV generation parameters shared by the generator, the
    * decoder test fixtures, and the SQL oracle (which recomputes the PCM
    * checksum from the same formulas — the RIFF container framing is not
    * SQL-replicable, but the decoded SAMPLES are).
    */
  def sampleRateFor(id: Long): Int = (8000 + (id % 4) * 4000).toInt
  def channelsFor(id: Long): Int = (1 + id % 2).toInt
  def frameCountFor(id: Long): Int = (50 + id % 101).toInt
  /** Unsigned 16-bit sample for (id, frame, channel). */
  def sampleFor(id: Long, frame: Int, channel: Int): Int =
    ((id * 31L + frame * 7L + channel * 13L) % 65536L).toInt

  /** Encode the deterministic PCM grid for `id` as a real WAV file:
    * 16-bit signed little-endian PCM through `javax.sound.sampled`'s
    * built-in WAVE writer (zero external jars — the audio twin of
    * [[pngFor]]).
    */
  def wavFor(id: Long): Array[Byte] = {
    val rate = sampleRateFor(id)
    val channels = channelsFor(id)
    val frames = frameCountFor(id)
    val pcm = new Array[Byte](frames * channels * 2)
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < channels) {
        val v = sampleFor(id, f, c) - 32768 // signed 16-bit
        val off = (f * channels + c) * 2
        pcm(off) = (v & 0xff).toByte // little-endian
        pcm(off + 1) = ((v >> 8) & 0xff).toByte
        c += 1
      }
      f += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      rate.toFloat, 16, channels, channels * 2, rate.toFloat, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** One REAL WAV per id (same mapPartitions contract as [[pngPayloads]]). */
  def wavPayloads(df: DataFrame, idCol: String, out: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(ids => ids.map(id => (id, wavFor(id))))
      .toDF(idCol, out)
  }

  final case class AudioMeta(doc_id: Long, n_bytes: Long, sample_rate: Int,
                             channels: Int, n_frames: Long, checksum: Long)

  /** Real audio decode: `AudioSystem.getAudioInputStream` inside executors.
    * `sample_rate`/`channels`/`n_frames` come from the decoded stream;
    * `checksum` folds the decoded 16-bit samples (frame-major, channel
    * within frame, as unsigned 0..65535) with the same rotate-left-5/xor
    * scheme as [[decodeImageMeta]], which the SQL oracle reproduces.
    * Undecodable or empty payloads yield zeroed metadata (n_bytes still
    * reports the raw size) — the same poison-row contract as the image
    * path; non-16-bit or big-endian encodings are treated as undecodable
    * rather than mis-checksummed.
    */
  def decodeAudioMeta(df: DataFrame, idCol: String, binCol: String): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val n = if (bytes == null) 0 else bytes.length
          val decoded =
            if (n == 0) None
            else
              try {
                val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                  new java.io.ByteArrayInputStream(bytes))
                try {
                  val fmt = ais.getFormat
                  if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
                    fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
                    None
                  else {
                    val pcm = ais.readAllBytes()
                    var crc = 0L
                    var i = 0
                    while (i + 1 < pcm.length) {
                      // signed LE 16-bit, shifted to unsigned 0..65535 so the
                      // folded value equals the generator's sampleFor output
                      val v = (((pcm(i) & 0xff) | ((pcm(i + 1) & 0xff) << 8))
                        .toShort.toInt + 32768)
                      crc = ((crc % (1L << 55)) * 32L + (crc >>> 55)) ^ v.toLong
                      i += 2
                    }
                    Some(AudioMeta(id, n.toLong, fmt.getSampleRate.toInt,
                      fmt.getChannels, ais.getFrameLength, crc))
                  }
                } finally ais.close()
              } catch { case scala.util.control.NonFatal(_) => None }
          decoded.getOrElse(AudioMeta(id, n.toLong, 0, 0, 0L, 0L))
        }
      }
  }

  // ---- video: real RIFF/AVI containers, uncompressed DIB and MJPEG ----
  // The container and frame parsing are from scratch (the JDK has no AVI
  // reader — same build-it ethos as the CFB/BIFF8 Excel path). Two frame
  // codecs decode:
  //   - BI_RGB 24-bit bottom-up DIBs ('00db'): LOSSLESS, so the decoded
  //     pixels are deterministic formulas the SQL oracle replays exactly —
  //     this is the gate-visible (q62) family.
  //   - MJPEG ('MJPG' strf + '00dc' chunks): each frame is a standalone
  //     baseline JPEG, decoded with the JDK's own ImageIO JPEG reader —
  //     REAL lossy decode, spec-pinned against an independent ImageIO read
  //     of the same frame bytes (DCT rounding is deterministic within a
  //     JVM but not SQL-replayable, so this family is spec-covered rather
  //     than hash-oracled).
  // Inter-frame codecs (H.26x etc.) have no JDK decoder and stay out of
  // scope; their streams — and a '00dc' chunk under a non-MJPG strf —
  // zero out by the poison-row contract.

  def vWidthFor(id: Long): Int = (4 + id % 5).toInt
  def vHeightFor(id: Long): Int = (3 + id % 3).toInt
  def vFrameCountFor(id: Long): Int = (3 + id % 4).toInt
  def vFpsFor(id: Long): Int = (10 + id % 5).toInt
  /** RGB for (id, frame, x, y) — the video twin of [[rgbFor]]. */
  def vRgbFor(id: Long, f: Int, x: Int, y: Int): (Int, Int, Int) = (
    ((id + 7L * f + 31L * x + 17L * y) % 256).toInt,
    ((3L * id + 11L * f + 7L * x + 11L * y) % 256).toInt,
    ((5L * id + 13L * f + 13L * x + 3L * y) % 256).toInt)

  /** Per-pixel perturbation for the NOISY re-encode of `id`'s video —
    * the [[noiseFor]] pattern with the frame index folded in; shared by
    * [[noisyAviFor]] and the SQL oracle.
    */
  def vNoiseFor(id: Long, f: Int, x: Int, y: Int): Int =
    ((id + 7L * f + 7L * x + 3L * y) % 5).toInt - 2

  /** Encode the deterministic frame sequence for `id` as a real AVI file:
    * RIFF('AVI ') → LIST(hdrl){avih, LIST(strl){strh 'vids'/'DIB ',
    * strf BITMAPINFOHEADER}} → LIST(movi){'00db' DIB frames}.
    */
  def aviFor(id: Long): Array[Byte] = aviDibFor(id, noisy = false)

  /** The NOISY re-encode of `id`'s video: every pixel perturbed by
    * [[vNoiseFor]] (clamped ±2 per channel) before the DIB frames are
    * written — "the same clip re-processed with slight noise".
    */
  def noisyAviFor(id: Long): Array[Byte] = aviDibFor(id, noisy = true)

  private def aviDibFor(id: Long, noisy: Boolean): Array[Byte] = {
    val w = vWidthFor(id); val h = vHeightFor(id)
    val n = vFrameCountFor(id); val fps = vFpsFor(id)
    val stride = ((w * 3 + 3) / 4) * 4
    val frameBytes = stride * h

    val bos = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = { // little-endian
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def fourcc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))

    val strlSize = 4 + (8 + 56) + (8 + 40)        // 'strl' + strh + strf
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)  // 'hdrl' + avih + LIST(strl)
    val moviSize = 4 + n * (8 + frameBytes)       // 'movi' + n frame chunks
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)

    fourcc("RIFF"); u32(riffSize); fourcc("AVI ")
    fourcc("LIST"); u32(hdrlSize); fourcc("hdrl")
    fourcc("avih"); u32(56)
    u32(1000000L / fps); u32(0); u32(0); u32(0) // usec/frame, maxBps, pad, flags
    u32(n); u32(0); u32(1); u32(frameBytes)     // totalFrames, initial, streams, bufSize
    u32(w); u32(h); u32(0); u32(0); u32(0); u32(0)
    fourcc("LIST"); u32(strlSize); fourcc("strl")
    fourcc("strh"); u32(56)
    fourcc("vids"); fourcc("DIB "); u32(0); u16(0); u16(0); u32(0)
    u32(1); u32(fps); u32(0); u32(n)            // scale, rate, start, length
    u32(frameBytes); u32(0); u32(0)             // bufSize, quality, sampleSize
    u16(0); u16(0); u16(w); u16(h)              // rcFrame
    fourcc("strf"); u32(40)
    u32(40); u32(w); u32(h); u16(1); u16(24)    // biSize, w, h, planes, bpp
    u32(0); u32(frameBytes); u32(0); u32(0); u32(0); u32(0) // BI_RGB, size, ...
    fourcc("LIST"); u32(moviSize); fourcc("movi")
    var f = 0
    while (f < n) {
      fourcc("00db"); u32(frameBytes)
      var row = 0
      while (row < h) {
        val y = h - 1 - row // DIB rows are bottom-up
        var x = 0
        while (x < w) {
          val (r0, g0, b0) = vRgbFor(id, f, x, y)
          def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
          val d = if (noisy) vNoiseFor(id, f, x, y) else 0
          val (r, g, b) = (clamp(r0 + d), clamp(g0 + d), clamp(b0 + d))
          bos.write(b); bos.write(g); bos.write(r) // BGR
          x += 1
        }
        var pad = w * 3
        while (pad < stride) { bos.write(0); pad += 1 }
        row += 1
      }
      f += 1
    }
    bos.toByteArray
  }

  /** Encode the same deterministic frame sequence as a real MJPEG AVI:
    * identical container layout to [[aviFor]] but the stream declares
    * 'MJPG' and each '00dc' chunk is a standalone baseline JPEG produced
    * by the JDK encoder (variable-size chunks, word-aligned).
    */
  def aviMjpgFor(id: Long): Array[Byte] = {
    val w = vWidthFor(id); val h = vHeightFor(id)
    val n = vFrameCountFor(id); val fps = vFpsFor(id)
    val jpegs: IndexedSeq[Array[Byte]] = (0 until n).map { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = vRgbFor(id, f, x, y)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val fb = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", fb)
      fb.toByteArray
    }

    val bos = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def fourcc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))

    val bufSize = jpegs.map(_.length).max
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)

    fourcc("RIFF"); u32(riffSize); fourcc("AVI ")
    fourcc("LIST"); u32(hdrlSize); fourcc("hdrl")
    fourcc("avih"); u32(56)
    u32(1000000L / fps); u32(0); u32(0); u32(0)
    u32(n); u32(0); u32(1); u32(bufSize)
    u32(w); u32(h); u32(0); u32(0); u32(0); u32(0)
    fourcc("LIST"); u32(strlSize); fourcc("strl")
    fourcc("strh"); u32(56)
    fourcc("vids"); fourcc("MJPG"); u32(0); u16(0); u16(0); u32(0)
    u32(1); u32(fps); u32(0); u32(n)
    u32(bufSize); u32(0); u32(0)
    u16(0); u16(0); u16(w); u16(h)
    fourcc("strf"); u32(40)
    u32(40); u32(w); u32(h); u16(1); u16(24)
    fourcc("MJPG"); u32(bufSize.toLong); u32(0); u32(0); u32(0); u32(0)
    fourcc("LIST"); u32(moviSize); fourcc("movi")
    jpegs.foreach { j =>
      fourcc("00dc"); u32(j.length.toLong); bos.write(j, 0, j.length)
      if ((j.length & 1) == 1) bos.write(0) // word alignment
    }
    bos.toByteArray
  }

  /** One REAL AVI per id (same mapPartitions contract as [[pngPayloads]]). */
  def aviPayloads(df: DataFrame, idCol: String, out: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(ids => ids.map(id => (id, aviFor(id))))
      .toDF(idCol, out)
  }

  /** One REAL noisy AVI per id (same contract as [[aviPayloads]]). */
  def noisyAviPayloads(df: DataFrame, idCol: String, out: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(ids => ids.map(id => (id, noisyAviFor(id))))
      .toDF(idCol, out)
  }

  final case class FrameHash(doc_id: Long, frame: Int, fhash: Long)

  /** Per-frame perceptual hashes from REAL decoded AVI frames: walk the
    * RIFF tree, decode each BI_RGB '00db' DIB to top-down RGB, and
    * compute [[imageAHash]]'s exact integer aHash per frame (8×8
    * nearest-neighbor grid, gray = (r+g+b) div 3, own-mean threshold,
    * bit k = j·8+i) — so the SQL oracle replays every frame hash from
    * [[vRgbFor]]'s formulas and any round-trip corruption flips bits.
    * One flatMap pass, no shuffle. Poison rows (undecodable, non-DIB
    * codec) yield ZERO rows — per-video decode diagnosis is
    * [[decodeVideoMeta]]'s contract, and a fake hash row would pollute
    * the downstream frame-hash join.
    */
  def videoFrameHashes(df: DataFrame, idCol: String, binCol: String): Dataset[FrameHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        try decodeDibFrameHashes(id, bytes)
        catch { case scala.util.control.NonFatal(_) => Seq.empty }
      }
  }

  private def decodeDibFrameHashes(id: Long, bytes: Array[Byte]): Seq[FrameHash] = {
    if (bytes == null || bytes.length < 12) return Seq.empty
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return Seq.empty
    var width = 0; var height = 0
    var biCompression = -1L; var biBitCount = -1
    val dbFrames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(off: Int, end: Int): Unit = {
      var p = off
      while (p + 8 <= end) {
        val t = tag(p); val sz = u32(p + 4).toInt
        val body = p + 8
        t match {
          case "LIST" => walk(body + 4, body + sz)
          case "avih" =>
            width = u32(body + 32).toInt; height = u32(body + 36).toInt
          case "strf" if biCompression == -1L =>
            biBitCount = (u32(body + 12) >> 16).toInt
            biCompression = u32(body + 16)
          case "00db" => dbFrames += ((body, sz))
          case _ => ()
        }
        p = body + sz + (sz & 1)
      }
    }
    walk(12, bytes.length)
    if (width <= 0 || height <= 0 || biCompression != 0L || biBitCount != 24)
      return Seq.empty
    val stride = ((width * 3 + 3) / 4) * 4
    (0 until dbFrames.length).flatMap { k =>
      val (foff, flen) = dbFrames(k)
      if (flen < stride * height) None
      else {
        val grays = new Array[Long](64)
        var sum = 0L
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            val x = i * width / 8
            val y = j * height / 8
            val rowOff = foff + (height - 1 - y) * stride // bottom-up
            val px = rowOff + x * 3
            val g = (((bytes(px + 2) & 0xff) + (bytes(px + 1) & 0xff) +
              (bytes(px) & 0xff)) / 3).toLong
            grays(j * 8 + i) = g
            sum += g
            i += 1
          }
          j += 1
        }
        val mean = sum / 64L
        var hash = 0L
        var b = 0
        while (b < 64) {
          if (grays(b) > mean) hash |= (1L << b)
          b += 1
        }
        Some(FrameHash(id, k, hash))
      }
    }
  }

  /** Video NEAR-duplicate pairs by SHARED RARE FRAME HASH — the
    * winnowing match shape over [[videoFrameHashes]]: two videos pair
    * when they share at least one frame hash that at most
    * `maxVideosPerHash` videos carry. The cap is the MOSS
    * stop-fingerprint rule and the SCALE contract in one: boilerplate
    * frame hashes (tiny dims ⇒ heavy cross-video repetition — measured
    * 532-video clusters at sf0.1) are excluded before any join, so each
    * surviving hash contributes at most cap·(cap−1)/2 pairs and total
    * pair volume is LINEAR in distinct hashes. A hamming-banded frame
    * join was probed and rejected: 16-bit bands of these structured
    * hashes collide quadratically even after the cap (1.7M+ candidates
    * at sf0.1). A planted ±2-noise re-encode pairs through its
    * unperturbed-hash frames (measured ~half of copies at sf0.1; copies
    * whose every frame drifted or is boilerplate are honest misses at
    * this noise level). Frame multiplicity within one video collapses
    * (set semantics); returns (id_a, id_b, n_shared), id_a < id_b.
    */
  def videoNearDupPairs(frameHashes: DataFrame, idCol: String,
                        hashCol: String,
                        maxVideosPerHash: Int = 8): DataFrame = {
    require(maxVideosPerHash >= 2, s"cap must be >= 2, got $maxVideosPerHash")
    val vh = frameHashes.select(col(idCol).cast("long").as("_vid"),
      col(hashCol).cast("long").as("_h")).distinct()
    val rare = vh.groupBy(col("_h"))
      .agg(count(lit(1)).as("_nv"))
      .filter(col("_nv") <= maxVideosPerHash)
      .select(col("_h"))
    val kept = vh.join(rare, Seq("_h"))
    kept.select(col("_h"), col("_vid").as("id_a"))
      .join(kept.select(col("_h"), col("_vid").as("id_b")), Seq("_h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  final case class VideoMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                             n_frames: Int, fps: Int, n_sampled: Int, checksum: Long)

  /** Real video decode: walk the RIFF tree for avih (dimensions, frame
    * count), the 'vids' strh (rate/scale → fps) and strf, then decode
    * every `sampleEvery`-th frame to top-down RGB and fold the same
    * rotate/xor checksum as the image and audio paths
    * (sampled-frame-major, row-major, R then G then B). BI_RGB 24-bit
    * streams decode their '00db' DIBs in place; 'MJPG' streams decode
    * their '00dc' JPEG frames through ImageIO. Undecodable payloads —
    * garbage, inter-frame codecs, a '00dc' chunk under a non-MJPG strf —
    * yield zeroed metadata (the shared poison-row contract).
    */
  def decodeVideoMeta(df: DataFrame, idCol: String, binCol: String,
                      sampleEvery: Int = 2): Dataset[VideoMeta] = {
    require(sampleEvery >= 1, "sampleEvery must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val n = if (bytes == null) 0 else bytes.length
          (try decodeAviMeta(id, bytes, sampleEvery)
          catch { case scala.util.control.NonFatal(_) => None })
            .getOrElse(VideoMeta(id, n.toLong, 0, 0, 0, 0, 0, 0L))
        }
      }
  }

  private def decodeAviMeta(id: Long, bytes: Array[Byte],
                            sampleEvery: Int): Option[VideoMeta] = {
    if (bytes == null || bytes.length < 12) return None
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return None

    var width = 0; var height = 0; var totalFrames = 0; var fps = 0
    var biCompression = -1L; var biBitCount = -1
    val dbFrames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // '00db' (off, len)
    val dcFrames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // '00dc' (off, len)

    def walk(off: Int, end: Int): Unit = {
      var p = off
      while (p + 8 <= end) {
        val t = tag(p); val sz = u32(p + 4).toInt
        val body = p + 8
        t match {
          case "LIST" => walk(body + 4, body + sz) // skip the list type fourcc
          case "avih" =>
            width = u32(body + 32).toInt; height = u32(body + 36).toInt
            totalFrames = u32(body + 16).toInt
          case "strh" if tag(body) == "vids" =>
            val scale = u32(body + 20); val rate = u32(body + 24)
            if (scale > 0) fps = (rate / scale).toInt
          case "strf" if biCompression == -1L =>
            biBitCount = (u32(body + 12) >> 16).toInt // planes u16 | bpp u16
            biCompression = u32(body + 16)
          case "00db" => dbFrames += ((body, sz))
          case "00dc" => dcFrames += ((body, sz))
          case _ => () // unknown chunks are skipped, not decoded
        }
        p = body + sz + (sz & 1) // chunks are word-aligned
      }
    }
    walk(12, bytes.length)
    if (width <= 0 || height <= 0) return None

    var crc = 0L
    def fold(v: Int): Unit =
      crc = ((crc % (1L << 55)) * 32L + (crc >>> 55)) ^ v.toLong
    var sampled = 0

    val Mjpg = 0x47504A4DL // 'MJPG' as a little-endian fourcc
    if (biCompression == 0L && biBitCount == 24 && dbFrames.nonEmpty) {
      // uncompressed bottom-up DIB frames
      val stride = ((width * 3 + 3) / 4) * 4
      var k = 0
      while (k < dbFrames.length) {
        val (foff, flen) = dbFrames(k)
        if (flen < stride * height) return None
        var y = 0
        while (y < height) {
          val rowOff = foff + (height - 1 - y) * stride // bottom-up → top-down
          var x = 0
          while (x < width) {
            val px = rowOff + x * 3
            fold(bytes(px + 2) & 0xff) // R
            fold(bytes(px + 1) & 0xff) // G
            fold(bytes(px) & 0xff)     // B
            x += 1
          }
          y += 1
        }
        sampled += 1
        k += sampleEvery
      }
      Some(VideoMeta(id, bytes.length.toLong, width, height,
        if (totalFrames > 0) totalFrames else dbFrames.length, fps, sampled, crc))
    } else if (biCompression == Mjpg && dcFrames.nonEmpty) {
      // MJPEG: each '00dc' chunk is a standalone JPEG — JDK ImageIO decode.
      // Wrap the slice in a MemoryCacheImageInputStream: ImageIO.read on a
      // bare InputStream spools through the default DISK-backed cache — a
      // temp file created and deleted per sampled frame inside executors
      // (ADVICE r7). The slice is already in memory; keep it there.
      var k = 0
      while (k < dcFrames.length) {
        val (foff, flen) = dcFrames(k)
        val img = javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes, foff, flen)))
        if (img == null || img.getWidth != width || img.getHeight != height)
          return None
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val rgb = img.getRGB(x, y)
            fold((rgb >> 16) & 0xff) // R
            fold((rgb >> 8) & 0xff)  // G
            fold(rgb & 0xff)         // B
            x += 1
          }
          y += 1
        }
        sampled += 1
        k += sampleEvery
      }
      Some(VideoMeta(id, bytes.length.toLong, width, height,
        if (totalFrames > 0) totalFrames else dcFrames.length, fps, sampled, crc))
    } else None
  }

  /** Evenly-spaced "frame" samples from a binary payload (video-style
    * frame sampling as pure built-ins: sequence → transform → substr).
    */
  def frameSample(bin: org.apache.spark.sql.Column, nFrames: Int,
                  frameBytes: Int): org.apache.spark.sql.Column = {
    val total = length(bin)
    val step = greatest((total / nFrames).cast("int"), lit(1))
    filter(
      transform(
        sequence(lit(0), lit(nFrames - 1)),
        i => substring(bin, (i * step + 1).cast("int"), lit(frameBytes))),
      f => length(f) > 0)
  }

  /** "Resize" stub: byte truncation in place of a real scaler. */
  def resizeBytes(bin: org.apache.spark.sql.Column, maxBytes: Int): org.apache.spark.sql.Column =
    substring(bin, 1, maxBytes)
}
