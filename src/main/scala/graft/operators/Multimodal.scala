package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata (north-star extension, BASELINE.json).
  *
  * The container has no media codecs, so the DECODE step is a clearly-marked
  * deterministic stub — everything around it (schema, batch iteration shape,
  * partition-parallel execution, frame slicing) is the real Spark plumbing a
  * codec-backed implementation would drop into:
  *  - [[decodeImageMeta]] mirrors the batched-UDF shape (`mapPartitions`
  *    over a typed Dataset): per-partition setup (a real codec would init
  *    its native library once per partition here), per-row decode.
  *  - [[frameSample]]/[[resizeBytes]] are pure codegen'd expressions over
  *    binary — no serialization out of Tungsten rows.
  */
object Multimodal {

  /** Deterministic fake payload standing in for raw media bytes. */
  def withFakePayload(df: DataFrame, textCol: String, out: String = "payload"): DataFrame =
    df.withColumn(out, encode(col(textCol), "UTF-8"))

  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                             channels: Int, checksum: Long)

  /** Decode stub: derives metadata a real image decoder would produce.
    * STUB — replace the body marked below with an actual codec call
    * (e.g. javax.imageio / ffmpeg bindings) in a deployment that has one;
    * the Dataset/batching contract stays identical.
    */
  def decodeImageMeta(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init would go here (codec handles, native buffers)
        rows.map { case (id, bytes) =>
          // ---- STUB decode: deterministic fake in place of a codec ----
          // The checksum is a 60-bit rotate/xor fold (left-rotate by 5 via
          // mod/mul + logical right shift) so the driver's SQL oracle can
          // recompute it byte-for-byte from hex(payload).
          val n = if (bytes == null) 0 else bytes.length
          val w = if (n == 0) 0 else ((bytes(0) & 0x7f) % 64) + 1
          val h = if (n < 2) 0 else ((bytes(1) & 0x7f) % 64) + 1
          var crc = 0L
          var i = 0
          while (i < n) {
            crc = ((crc % (1L << 55)) * 32L + (crc >>> 55)) ^ (bytes(i) & 0xffL)
            i += 1
          }
          // ---- end stub ----
          MediaMeta(id, n.toLong, w, h, channels = 3, crc)
        }
      }
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
