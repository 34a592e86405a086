package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata alongside (the builder brief's
  * training-data-pipeline surface). Decoding real media needs codec libraries
  * this container does not ship, so the decode kernel is STUBBED with a
  * deterministic fake — the Spark-side plumbing (binary columns, byte-range
  * frame sampling, schema, partition-preserving batched iteration) is real
  * and is what matters at 100 TB.
  *
  * Scale posture: every operator here is row-local (no shuffle); frame
  * sampling explodes bounded arrays; the decode stub is mapPartitions-shaped
  * exactly like a real batched decoder (model/codec initialized once per
  * partition, streamed row batches, no driver collection).
  */
object Multimodal {

  /** 4-byte ASCII container magics for the synthetic assets (ASCII so the
    * DuckDB oracle can mirror byte math at the string level). */
  val PngMagic: Array[Byte] = "PNG0".getBytes(StandardCharsets.UTF_8)
  val JpgMagic: Array[Byte] = "JPG0".getBytes(StandardCharsets.UTF_8)

  /** Magic-byte format sniff over the leading 4 bytes of a binary column. */
  def sniffFormat(bin: Column): Column =
    when(substring(bin, 1, 4) === lit(PngMagic), "png")
      .when(substring(bin, 1, 4) === lit(JpgMagic), "jpeg")
      .otherwise("unknown")

  /** Per-asset stats: byte size, content hash, sniffed format. One row-local
    * projection — at scale this is a pure scan, no shuffle. */
  def binaryStats(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(binCol)).as("n_bytes"),
      md5(col(binCol)).as("content_md5"),
      sniffFormat(col(binCol)).as("format"))

  /** Deterministic frame sampling: split the payload into fixed-size byte
    * chunks ("frames") and emit one row per frame with its hash — the shape
    * of video keyframe extraction without the codec. Row-local explode of a
    * bounded array. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   frameBytes: Int): DataFrame = {
    val bin = col(binCol)
    val nFrames = greatest(ceil(length(bin).cast("double") / frameBytes), lit(1.0)).cast("int")
    val chunks = transform(sequence(lit(0), nFrames - 1),
      i => call_function("substring", bin, i * frameBytes + 1, lit(frameBytes)))
    df.select(col(idCol), posexplode(chunks))
      .select(
        col(idCol),
        col("pos").as("frame_no"),
        length(col("col")).as("frame_bytes"),
        md5(col("col")).as("frame_md5"))
  }

  /** Decoded-image metadata schema (what a real decoder would emit). */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_pixels", LongType)))

  /** STUB decode kernel — deterministic fake dimensions derived from the
    * payload bytes. A real deployment swaps `fakeDecode` for an actual codec
    * call; everything around it (per-partition batching, schema, laziness)
    * is the production shape. */
  def decodeImageMetaStub(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
    val enc = RowEncoder.encoderFor(imageMetaSchema)
    input.mapPartitions { rows =>
      // real decoder: initialize the codec/model ONCE per partition here
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (fmt, w, h) = fakeDecode(bytes)
        Row(id, fmt, w, h, w.toLong * h.toLong)
      }
    }(enc)
  }

  /** ??? real decode — STUB: derives stable fake dimensions from the first
    * bytes so tests are deterministic. Replace with an image library. */
  private def fakeDecode(bytes: Array[Byte]): (String, Int, Int) = {
    val fmt =
      if (bytes.length >= 4 && bytes.startsWith(PngMagic)) "png"
      else if (bytes.length >= 4 && bytes.startsWith(JpgMagic)) "jpeg"
      else "unknown"
    var acc = 17L
    var i = 0
    val n = math.min(bytes.length, 64)
    while (i < n) { acc = acc * 31 + (bytes(i) & 0xff); i += 1 }
    val w = (math.abs(acc) % 1920 + 1).toInt
    val h = (math.abs(acc / 1920) % 1080 + 1).toInt
    (fmt, w, h)
  }
}
