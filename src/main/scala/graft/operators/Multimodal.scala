package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata alongside (the builder brief's
  * training-data-pipeline surface). The IMAGE path is REAL, pure JDK
  * (`javax.imageio` + `BufferedImage`, no extra dependency):
  * [[decodeImageMeta]] header-only metadata, [[resizeImageReal]] pixel
  * scaling, [[extractFeaturesReal]] decoded-pixel histograms, with
  * [[encodePng]] as the round-trip proof generator. Audio METADATA is
  * real too ([[decodeAudioMeta]]/[[encodeWav]] via `javax.sound.sampled`),
  * and VIDEO frame extraction is real for animated GIF — the one
  * multi-frame container the JDK ships a codec for —
  * ([[decodeGifFrames]]/[[encodeGif]]: container parse, per-frame pixel
  * decode, stride sampling). Compressed-audio sample decode and MP4-class
  * video codecs need libraries this container does not ship, so those
  * kernels (and the *Stub variants kept as test doubles for the synthetic
  * fake-magic assets) are deterministic fakes — the Spark-side plumbing
  * (binary columns, byte-range frame sampling, schema,
  * partition-preserving batched iteration) is identical either way.
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

  /** Real container magics (the first bytes of actual PNG/JPEG/WAV/GIF
    * payloads). WAV is RIFF-framed: "RIFF" at offset 0 AND "WAVE" at offset
    * 8 (a bare RIFF check would also claim AVI/WebP containers). */
  val RealPngMagic: Array[Byte] = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
  val RealJpgMagic: Array[Byte] = Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte)
  val RealRiffMagic: Array[Byte] = "RIFF".getBytes(StandardCharsets.UTF_8)
  val RealWaveMagic: Array[Byte] = "WAVE".getBytes(StandardCharsets.UTF_8)
  val RealGifMagic: Array[Byte] = "GIF8".getBytes(StandardCharsets.UTF_8)

  /** Magic-byte format sniff over the leading bytes of a binary column —
    * recognizes both the synthetic ASCII magics (oracle-mirrorable) and the
    * real PNG/JPEG/WAV/GIF signatures. */
  def sniffFormat(bin: Column): Column =
    when(substring(bin, 1, 4) === lit(PngMagic), "png")
      .when(substring(bin, 1, 4) === lit(JpgMagic), "jpeg")
      .when(substring(bin, 1, 4) === lit(RealPngMagic), "png")
      .when(substring(bin, 1, 3) === lit(RealJpgMagic), "jpeg")
      .when(substring(bin, 1, 4) === lit(RealRiffMagic) &&
            substring(bin, 9, 4) === lit(RealWaveMagic), "wav")
      .when(substring(bin, 1, 4) === lit(RealGifMagic), "gif")
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

  /** Perceptual near-duplicate detection over binary assets by FRAME-SET
    * Jaccard — the video/image dedup shape: two assets are near-dups when
    * they share most of their sampled frames (re-encodes, trims, and
    * re-containered copies keep most frame content). Frames come from
    * [[sampleFrames]] (a real deployment swaps in decoded keyframe pHashes;
    * the candidate/verify machinery is unchanged).
    *
    * Scale design (mirrors the text LSH posture in
    * [[graft.operators.Dedup]]): candidates come from an inverted
    * frame-hash index — ONE equi-join on the 128-bit frame hash, never
    * all-pairs — with a hot-frame cap so a degenerate frame (black/blank
    * frames shared by thousands of videos) cannot go quadratic; the
    * per-asset frame sets are materialized once and feed the index and both
    * verify legs; verification is a row-local sorted-array intersection.
    * Output: (id_a, id_b, jaccard) for pairs at or above `threshold`. */
  def frameNearDup(df: DataFrame, idCol: String, binCol: String,
                   frameBytes: Int, threshold: Double,
                   maxFrameFreq: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sets = sampleFrames(df, idCol, binCol, frameBytes)
      .groupBy(col(idCol))
      .agg(array_sort(array_distinct(collect_list(col("frame_md5")))).as("_fset"))
      .localCheckpoint(false) // feeds the inverted index + both verify legs
    val inv = sets.select(col(idCol), explode(col("_fset")).as("_f"))
    val capped = inv
      .withColumn("_sz", count(lit(1)).over(Window.partitionBy(col("_f"))))
      .filter(col("_sz") <= maxFrameFreq).drop("_sz")
    val pairs = capped.select(col("_f"), col(idCol).as("id_a"))
      .join(capped.select(col("_f"), col(idCol).as("id_b")), "_f")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val inter = size(array_intersect(col("_set_a"), col("_set_b")))
    pairs
      .join(sets.select(col(idCol).as("id_a"), col("_fset").as("_set_a")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("_fset").as("_set_b")), "id_b")
      .withColumn("jaccard", round(inter.cast("double") /
        (size(col("_set_a")) + size(col("_set_b")) - inter), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---- per-partition codec plumbing -------------------------------------
  //
  // The JDK media APIs hide two multi-core killers: AudioSystem's
  // provider lookup takes a JVM-global lock per call (and tries the MIDI
  // soft-synth reader — its own global lock — before the WAV reader), and
  // ImageIO's convenience methods consult a global disk-cache flag that
  // creates+deletes a temp file per image. Every kernel below resolves
  // its providers ONCE per partition (one partition = one thread, so
  // reuse is safe) and does stream I/O through explicit in-memory
  // ImageIO streams — no global state touched, no temp files.

  /** All installed providers of `cls`, resolved once per partition. Empty
    * when provider loading is unavailable (callers fall back to the slow
    * AudioSystem path). */
  private def loadProviders[T](cls: Class[T]): scala.collection.mutable.ArrayBuffer[T] = {
    val it = java.util.ServiceLoader.load(cls).iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[T]
    try while (it.hasNext) buf += it.next()
    catch { case _: java.util.ServiceConfigurationError => () }
    buf
  }

  /** One PNG writer per partition. */
  private def pngWriter(): javax.imageio.ImageWriter =
    javax.imageio.ImageIO.getImageWritersByFormatName("png").next()

  /** Encode through an explicit in-memory stream (never the global
    * disk-cache flag); the writer is reused across rows. */
  private def writeImage(writer: javax.imageio.ImageWriter,
                         img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(img)
    ios.close()
    bos.toByteArray
  }

  /** Full decode through an explicit in-memory stream; null for
    * unreadable/null payloads (the corrupt-payload posture). */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    if (bytes == null) return null
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) null
        else {
          val reader = readers.next()
          try { reader.setInput(iis); reader.read(0) } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => null }
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

  /** Resized-asset schema (what a real resize kernel would emit). */
  val resizeSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("n_bytes_in", IntegerType),
    StructField("n_bytes_out", IntegerType),
    StructField("resized_md5", StringType)))

  /** STUB resize — keeps every `stride`-th byte of the payload (a real
    * deployment swaps the kernel for a codec decode→scale→encode). The
    * plumbing is the production shape: row-local binary→binary inside
    * mapPartitions with per-partition initialization, no shuffle, bounded
    * memory per row. */
  def resizeImageStub(df: DataFrame, idCol: String, binCol: String,
                      stride: Int = 4): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val input = df.select(col(idCol).cast("long"), col(binCol))
    val enc = RowEncoder.encoderFor(resizeSchema)
    input.mapPartitions { rows =>
      // real resizer: initialize the codec ONCE per partition here
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val out = new Array[Byte]((bytes.length + stride - 1) / stride)
        var i = 0
        while (i < out.length) { out(i) = bytes(i * stride); i += 1 }
        md.reset()
        val hex = md.digest(out).map("%02x".format(_)).mkString
        Row(id, bytes.length, out.length, hex)
      }
    }(enc)
  }

  /** Feature-vector schema: a fixed-dim embedding per asset. */
  def featureSchema(dim: Int): StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false))))

  /** STUB feature extraction — a normalized byte-bucket histogram stands in
    * for a model forward pass. The batched-iterator shape is exactly how a
    * real embedding model runs (weights loaded once per partition, rows
    * streamed through), and the output contract (fixed-dim double vector)
    * feeds the similarity suite unchanged. */
  def extractFeaturesStub(df: DataFrame, idCol: String, binCol: String,
                          dim: Int = 16): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val input = df.select(col(idCol).cast("long"), col(binCol))
    val enc = RowEncoder.encoderFor(featureSchema(dim))
    input.mapPartitions { rows =>
      // real extractor: load the model ONCE per partition here
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val counts = new Array[Long](dim)
        var i = 0
        while (i < bytes.length) { counts((bytes(i) & 0xff) % dim) += 1; i += 1 }
        // one IEEE division per bucket — bitwise identical in any engine, so
        // no rounding needed for oracle parity
        val denom = math.max(bytes.length, 1).toDouble
        val feats = counts.map(_ / denom)
        Row(id, feats.toSeq)
      }
    }(enc)
  }

  /** REAL image-metadata decode via `javax.imageio` (public JDK, no extra
    * dependency) — header-only: the ImageReader reads width/height/format
    * from the container without decoding pixel data, so cost per asset is
    * O(header), not O(pixels). Same mapPartitions batching as the stub
    * (reader machinery initialized per partition, rows streamed); payloads
    * no reader claims (or torn headers) come back as format "unknown" with
    * NULL dimensions instead of failing the task — at 100 TB some corrupt
    * assets are a certainty and one bad byte must not kill a 10^5-row
    * partition. [[decodeImageMetaStub]] stays as the deterministic test
    * double for the synthetic (fake-magic) assets. */
  def decodeImageMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
    val enc = RowEncoder.encoderFor(imageMetaSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        decodeImageBytes(r.getAs[Array[Byte]](1)) match {
          case Some((fmt, w, h)) => Row(id, fmt, w, h, w.toLong * h.toLong)
          case None => Row(id, "unknown", null, null, null)
        }
      }
    }(enc)
  }

  /** Header-only decode of one payload: (format, width, height), or None
    * when no installed ImageReader recognizes the bytes. */
  private[operators] def decodeImageBytes(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    if (bytes == null) return None
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          Some((reader.getFormatName.toLowerCase(java.util.Locale.ROOT),
            reader.getWidth(0), reader.getHeight(0)))
        } catch { case _: Exception => None }
        finally reader.dispose()
      }
    } finally if (iis != null) iis.close()
  }

  /** Deterministic REAL-PNG encoder for round-trip testing: one flat-color
    * `w x h` image per row, encoded with the JDK PNG writer. Row-local
    * mapPartitions like every other media kernel. `wCol`/`hCol` must be
    * positive ints. */
  def encodePng(df: DataFrame, idCol: String, wCol: String, hCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val input = df.select(col(idCol).cast("long"), col(wCol).cast("int"), col(hCol).cast("int"))
    val enc = RowEncoder.encoderFor(schema)
    input.mapPartitions { rows =>
      val writer = pngWriter()
      rows.map { r =>
        val id = r.getLong(0)
        val w = r.getInt(1)
        val h = r.getInt(2)
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = ((id * 2654435761L) & 0xFFFFFF).toInt
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        Row(id, writeImage(writer, img))
      }
    }(enc)
  }

  /** Resized-image schema for the REAL resize kernel. */
  val resizeRealSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("w_in", IntegerType),
    StructField("h_in", IntegerType),
    StructField("w_out", IntegerType),
    StructField("h_out", IntegerType),
    StructField("resized", BinaryType)))

  /** REAL image resize via pure-JDK pixel ops (`ImageIO` decode →
    * `Graphics2D` bilinear scale → PNG re-encode): fit inside a
    * `maxDim` square preserving aspect ratio, never upscaling. Target
    * dimensions use INTEGER arithmetic — w_out = max(1, w*maxDim /
    * max(w,h)) with truncating division — so an oracle replays them
    * without float-rounding ambiguity. Per-partition batching as every
    * media kernel; undecodable payloads yield NULL dims + NULL bytes
    * (one corrupt asset must not kill a partition). The byte-stride
    * [[resizeImageStub]] stays as the test double for synthetic assets. */
  def resizeImageReal(df: DataFrame, idCol: String, binCol: String,
                      maxDim: Int): DataFrame = {
    require(maxDim >= 1, s"resizeImageReal: maxDim must be >= 1, got $maxDim")
    val input = df.select(col(idCol).cast("long"), col(binCol))
    val enc = RowEncoder.encoderFor(resizeRealSchema)
    input.mapPartitions { rows =>
      val writer = pngWriter()
      rows.map { r =>
        val id = r.getLong(0)
        val img = readImage(r.getAs[Array[Byte]](1))
        if (img == null) Row(id, null, null, null, null, null)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val m = math.max(w, h)
          val (wOut, hOut) =
            if (m <= maxDim) (w, h)
            else (math.max(1, w * maxDim / m), math.max(1, h * maxDim / m))
          val out = new java.awt.image.BufferedImage(wOut, hOut,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, wOut, hOut, null)
          } finally g.dispose()
          Row(id, w, h, wOut, hOut, writeImage(writer, out))
        }
      }
    }(enc)
  }

  /** REAL feature extraction over DECODED PIXELS (pure JDK): a 16-bucket
    * normalized luminance histogram per asset — the model-forward-pass
    * contract ([[featureSchema]]: fixed-dim double vector feeding the
    * similarity suite) with an actual pixel read behind it. Luminance is
    * integer Rec.601: (77r + 151g + 28b) >> 8, bucket = lum >> 4 —
    * integer math end to end, so an oracle with known pixel colors
    * replays it exactly. Undecodable payloads yield the zero vector
    * (callers exclude zero-norm rows before cosine, as with the stub). */
  def extractFeaturesReal(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val dim = 16
    val input = df.select(col(idCol).cast("long"), col(binCol))
    val enc = RowEncoder.encoderFor(featureSchema(dim))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val img = readImage(r.getAs[Array[Byte]](1))
        if (img == null) Row(id, Seq.fill(dim)(0.0))
        else {
          val counts = new Array[Long](dim)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              val lum = (77 * ((rgb >> 16) & 0xff) + 151 * ((rgb >> 8) & 0xff) +
                28 * (rgb & 0xff)) >> 8
              counts(lum >> 4) += 1
              x += 1
            }
            y += 1
          }
          val n = img.getWidth.toLong * img.getHeight.toLong
          Row(id, counts.map(_.toDouble / n).toSeq)
        }
      }
    }(enc)
  }

  /** Decoded-audio metadata schema (the audio analog of
    * [[imageMetaSchema]]). */
  val audioMetaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("format", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_ms", LongType)))

  /** REAL audio metadata decode via `javax.sound.sampled` (pure JDK):
    * header-only container parse — sample rate, channel count, frame
    * length, integer-exact duration_ms = frames*1000/rate (truncating) —
    * for the formats the JDK ships readers for (WAV/AIFF/AU). Same
    * batching and corrupt-payload posture as [[decodeImageMeta]]:
    * unreadable bytes come back "unknown"/NULL instead of failing the
    * task. */
  def decodeAudioMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
    val enc = RowEncoder.encoderFor(audioMetaSchema)
    input.mapPartitions { rows =>
      // Codec init ONCE PER PARTITION: AudioSystem.getAudioFileFormat takes
      // a JVM-global provider-registry lock per call AND tries readers in
      // registry order — which puts the MIDI soft-synth reader (its own
      // global lock) ahead of the WAV reader. Ten executor threads through
      // that path serialize completely (measured 0.111 ms/row wall vs
      // 0.0014 with the matching reader tried first). Resolve providers
      // here and keep a move-to-front order so a homogeneous partition
      // pays ONE parse attempt per row.
      val readers = loadProviders(classOf[javax.sound.sampled.spi.AudioFileReader])
      def sniff(bytes: Array[Byte]): javax.sound.sampled.AudioFileFormat = {
        if (readers.isEmpty) // provider loading unavailable: correct, slower
          return javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new java.io.ByteArrayInputStream(bytes))
        var i = 0
        while (i < readers.length) {
          try {
            val aff = readers(i).getAudioFileFormat(
              new java.io.ByteArrayInputStream(bytes))
            if (i > 0) { val r = readers.remove(i); readers.insert(0, r) }
            return aff
          } catch { case _: Exception => () }
          i += 1
        }
        throw new javax.sound.sampled.UnsupportedAudioFileException("no reader")
      }
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        try {
          val aff = sniff(bytes)
          val fmt = aff.getType.toString.toLowerCase(java.util.Locale.ROOT)
          val rate = aff.getFormat.getSampleRate.toInt
          val rawCh = aff.getFormat.getChannels
          val ch: Integer = if (rawCh <= 0) null else Integer.valueOf(rawCh)
          val rawFrames = aff.getFrameLength
          // streamed containers report NOT_SPECIFIED (-1) for frame length
          // (and can for channels); a non-positive rate would corrupt the
          // duration — every unspecified field gets the corrupt-payload
          // posture (NULLs), never negatives
          if (rawFrames == javax.sound.sampled.AudioSystem.NOT_SPECIFIED || rate <= 0)
            Row(id, fmt,
              if (rate <= 0) null else Integer.valueOf(rate),
              ch, null, null)
          else {
            val frames = rawFrames.toLong
            Row(id, fmt, rate, ch, frames, frames * 1000L / rate)
          }
        } catch {
          case _: Exception => Row(id, "unknown", null, null, null, null)
        }
      }
    }(enc)
  }

  /** Deterministic REAL-WAV encoder for round-trip testing: `framesCol`
    * frames of 16-bit mono PCM silence at `sampleRate`, written by the JDK
    * WAV writer. Row-local like every media kernel. */
  def encodeWav(df: DataFrame, idCol: String, framesCol: String,
                sampleRate: Int): DataFrame = {
    require(sampleRate >= 1, s"encodeWav: sampleRate must be >= 1")
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val input = df.select(col(idCol).cast("long"), col(framesCol).cast("int"))
    val enc = RowEncoder.encoderFor(schema)
    input.mapPartitions { rows =>
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      // writer resolved ONCE per partition — AudioSystem.write re-runs the
      // JVM-globally-locked provider lookup on every call
      val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
      val writer = loadProviders(classOf[javax.sound.sampled.spi.AudioFileWriter])
        .find(_.isFileTypeSupported(wave))
      rows.map { r =>
        val id = r.getLong(0)
        val frames = r.getInt(1)
        val pcm = new Array[Byte](frames * 2)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        writer match {
          case Some(w) => w.write(ais, wave, bos)
          case None => javax.sound.sampled.AudioSystem.write(ais, wave, bos)
        }
        Row(id, bos.toByteArray)
      }
    }(enc)
  }

  /** [[encodeWav]] writes silence (header-proof only); this twin writes a
    * DETERMINISTIC integer waveform so downstream feature kernels have
    * real signal to prove themselves on: sample k (16-bit signed) is
    * ((id+1)*(k+1)) % 65521 - 32760 — pure integer arithmetic, so an
    * oracle replays the whole encode->decode->feature chain exactly
    * (the audio analog of [[encodePngPattern]]). */
  def encodeWavPattern(df: DataFrame, idCol: String, framesCol: String,
                       sampleRate: Int): DataFrame = {
    require(sampleRate >= 1, s"encodeWavPattern: sampleRate must be >= 1")
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val input = df.select(col(idCol).cast("long"), col(framesCol).cast("int"))
    val enc = RowEncoder.encoderFor(schema)
    input.mapPartitions { rows =>
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
      val writer = loadProviders(classOf[javax.sound.sampled.spi.AudioFileWriter])
        .find(_.isFileTypeSupported(wave))
      rows.map { r =>
        val id = r.getLong(0)
        val frames = r.getInt(1)
        val pcm = new Array[Byte](frames * 2)
        var k = 0
        while (k < frames) {
          val s = (((id + 1) * (k + 1)) % 65521L - 32760L).toInt
          pcm(2 * k) = (s & 0xFF).toByte // little-endian, matching fmt
          pcm(2 * k + 1) = ((s >> 8) & 0xFF).toByte
          k += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        writer match {
          case Some(w) => w.write(ais, wave, bos)
          case None => javax.sound.sampled.AudioSystem.write(ais, wave, bos)
        }
        Row(id, bos.toByteArray)
      }
    }(enc)
  }

  /** Decoded-audio FEATURES over real PCM — the signal-level analog of
    * [[decodeAudioMeta]]'s header read and [[extractFeaturesReal]]'s pixel
    * read: parse the container with the real javax.sound decoder, walk the
    * 16-bit mono samples, and emit integer-exact signal statistics
    * (energy as a sum of squares, zero crossings with sign(0)=+1, peak
    * magnitude). Integer outputs make the kernel hash-exact on any
    * engine. Row-local mapPartitions, one decoder per partition, corrupt
    * payloads degrade to NULL features. */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("n_frames", LongType),
    StructField("sum_sq", LongType),
    StructField("zero_crossings", LongType),
    StructField("peak", IntegerType)))

  def audioFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
    val enc = RowEncoder.encoderFor(audioFeatureSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val fmt = ais.getFormat
            require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
              "audioFeatures: expects 16-bit mono PCM")
            val data = ais.readAllBytes()
            val n = data.length / 2
            var sumSq = 0L; var zc = 0L; var peak = 0
            var prevNonNeg = true
            var k = 0
            while (k < n) {
              val b0 = data(2 * k); val b1 = data(2 * k + 1)
              // the high byte sign-extends (toInt), the low byte is masked
              val s = if (fmt.isBigEndian) (b0.toInt << 8) | (b1 & 0xFF)
                      else (b1.toInt << 8) | (b0 & 0xFF)
              sumSq += s.toLong * s
              val nonNeg = s >= 0
              if (k > 0 && nonNeg != prevNonNeg) zc += 1
              prevNonNeg = nonNeg
              if (math.abs(s) > peak) peak = math.abs(s)
              k += 1
            }
            Row(id, n.toLong, sumSq, zc, peak)
          } finally ais.close()
        } catch {
          case scala.util.control.NonFatal(_) => Row(id, null, null, null, null)
        }
      }
    }(enc)
  }

  val audioSilenceSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("n_frames", LongType),
    StructField("n_silent", LongType),
    StructField("n_runs", LongType),
    StructField("longest_run", LongType)))

  /** Silence segmentation over decoded 16-bit mono PCM — the trim/segment
    * gate an audio-pretraining pipeline runs before feature extraction
    * (drop silent assets, split on long pauses). A sample is silent when
    * `|s| < threshold`; a RUN is a maximal consecutive silent stretch, and
    * only runs of at least `minRun` samples count (micro-dips between
    * speech samples are not pauses). One row in, one row out: the run walk
    * is a single in-order pass over the decoded buffer fused into the same
    * `mapPartitions` decode as [[audioFeatures]] — samples never become
    * rows, so a 10-minute asset costs one buffer scan, not 4.8M exploded
    * rows through a window. Corrupt payloads yield NULL features
    * (quarantine row), never a task failure. */
  def audioSilence(df: DataFrame, idCol: String, binCol: String,
                   threshold: Int, minRun: Int): DataFrame = {
    require(threshold >= 1, s"audioSilence: threshold must be >= 1")
    require(minRun >= 1, s"audioSilence: minRun must be >= 1")
    val input = df.select(col(idCol).cast("long"), col(binCol))
    val enc = RowEncoder.encoderFor(audioSilenceSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val fmt = ais.getFormat
            require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
              "audioSilence: expects 16-bit mono PCM")
            val data = ais.readAllBytes()
            val n = data.length / 2
            var nSilent = 0L; var nRuns = 0L; var longest = 0L; var run = 0L
            var k = 0
            while (k < n) {
              val b0 = data(2 * k); val b1 = data(2 * k + 1)
              val s = if (fmt.isBigEndian) (b0.toInt << 8) | (b1 & 0xFF)
                      else (b1.toInt << 8) | (b0 & 0xFF)
              if (math.abs(s) < threshold) {
                nSilent += 1; run += 1
              } else {
                if (run >= minRun) nRuns += 1
                if (run > longest) longest = run
                run = 0
              }
              k += 1
            }
            if (run >= minRun) nRuns += 1
            if (run > longest) longest = run
            Row(id, n.toLong, nSilent, nRuns, longest)
          } finally ais.close()
        } catch {
          case scala.util.control.NonFatal(_) => Row(id, null, null, null, null)
        }
      }
    }(enc)
  }

  /** Decoded-video-frame schema for the REAL (animated-GIF) frame
    * extractor: one row per sampled frame. */
  val gifFrameSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_no", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("luma_mean", DoubleType)))

  /** Deterministic REAL animated-GIF encoder (pure JDK `ImageIO` sequence
    * writer) for round-trip testing: `framesCol` frames of `w x h`
    * constant gray, frame f of asset id filled with (id*31 + f*17) % 256 —
    * integer arithmetic an oracle replays exactly. Row-local like every
    * media kernel; a constant-color frame is lossless under GIF's palette
    * quantization, so the decode side recovers the formula bit-exactly. */
  def encodeGif(df: DataFrame, idCol: String, framesCol: String,
                w: Int, h: Int): DataFrame = {
    require(w >= 1 && h >= 1, s"encodeGif: dims must be positive, got ${w}x$h")
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val input = df.select(col(idCol).cast("long"), col(framesCol).cast("int"))
    val enc = RowEncoder.encoderFor(schema)
    input.mapPartitions { rows =>
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      rows.map { r =>
        val id = r.getLong(0)
        val n = r.getInt(1)
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < n) {
          val g = ((id * 31L + f * 17L) % 256L).toInt
          val rgb = (g << 16) | (g << 8) | g
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence() // writer reused across rows (one thread)
        ios.close()
        Row(id, bos.toByteArray)
      }
    }(enc)
  }

  /** REAL video frame extraction over animated GIF (the one multi-frame
    * container the JDK ships a codec for): every `stride`-th frame is
    * decoded and reduced to (frame_no, width, height, mean luminance).
    * This is the video-pipeline frame-sample shape — decode a bounded
    * sample of frames per asset, never the whole stream — with real
    * container parsing and real pixel decode; swapping the ImageIO reader
    * for an MP4/H.264 codec changes only the per-partition reader
    * construction. Row-local mapPartitions, bounded memory (one frame at
    * a time); unreadable payloads emit ZERO rows (the filter posture —
    * count them upstream via [[binaryStats]] if loss must be audited). */
  def decodeGifFrames(df: DataFrame, idCol: String, binCol: String,
                      stride: Int = 1): DataFrame = {
    require(stride >= 1, s"decodeGifFrames: stride must be >= 1, got $stride")
    val input = df.select(col(idCol).cast("long"), col(binCol))
    val enc = RowEncoder.encoderFor(gifFrameSchema)
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        try {
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) { iis.close(); Iterator.empty }
          else {
            val reader = readers.next()
            reader.setInput(iis, false, true)
            val out =
              try {
                val n = reader.getNumImages(true)
                (0 until n by stride).map { f =>
                  val img = reader.read(f)
                  val (w, h) = (img.getWidth, img.getHeight)
                  var sum = 0L
                  var y = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) {
                      val rgb = img.getRGB(x, y)
                      sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
                      x += 1
                    }
                    y += 1
                  }
                  Row(id, f, w, h, sum.toDouble / (3.0 * w * h))
                }
              } finally { reader.dispose(); iis.close() }
            out.iterator
          }
        } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
    }(enc)
  }

  val aviFrameSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_no", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("valid_jpeg", BooleanType),
    StructField("luma_mean", DoubleType)))

  private def leInt(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
  }
  private def fourcc(out: java.io.ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes(StandardCharsets.US_ASCII))

  /** Deterministic REAL AVI/MJPEG encoder — the one VIDEO codec composable
    * from pure-JDK parts (RIFF container framing + the shipped JPEG coder):
    * each frame is a constant-gray JPEG (gray = (id*31 + f*17) % 256, the
    * m11 formula) wrapped as a `00dc` chunk in a minimal but
    * standard-layout RIFF AVI (`hdrl` with avih/strh/strf headers, `movi`
    * stream, even-byte chunk padding). Unlike GIF, MJPEG is LOSSY — the
    * container facts (frame inventory, dims, JPEG marker validity) are
    * exact and oracle-checkable; decoded pixel values are codec-dependent
    * and are spec-checked within a tolerance instead. Row-local. */
  def encodeAviMjpeg(df: DataFrame, idCol: String, framesCol: String,
                     w: Int, h: Int): DataFrame = {
    require(w >= 1 && h >= 1, s"encodeAviMjpeg: dims must be positive, got ${w}x$h")
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val input = df.select(col(idCol).cast("long"), col(framesCol).cast("int"))
    val enc = RowEncoder.encoderFor(schema)
    input.mapPartitions { rows =>
      // one reusable JPEG writer + frame buffer per partition; encode goes
      // through the in-memory stream helper, never ImageIO's convenience
      // path (whose default stream cache is a temp FILE per call — at one
      // encode per frame that disk round-trip dominated the whole kernel)
      val jw = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      rows.map { r =>
        val id = r.getLong(0)
        val n = r.getInt(1)
        // one JPEG per frame via the JDK coder
        val jpegs = (0 until n).map { f =>
          val g = ((id * 31L + f * 17L) % 256L).toInt
          val rgb = (g << 16) | (g << 8) | g
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          writeImage(jw, img)
        }
        def pad(len: Int) = len + (len & 1)
        // sizes bottom-up: movi list, strl list, hdrl list, riff total
        val moviBody = 4 + jpegs.map(j => 8 + pad(j.length)).sum
        val strlBody = 4 + (8 + 56) + (8 + 40)
        val hdrlBody = 4 + (8 + 56) + (8 + strlBody)
        val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
        val out = new java.io.ByteArrayOutputStream()
        fourcc(out, "RIFF"); leInt(out, riffBody); fourcc(out, "AVI ")
        fourcc(out, "LIST"); leInt(out, hdrlBody); fourcc(out, "hdrl")
        fourcc(out, "avih"); leInt(out, 56)
        leInt(out, 40000); leInt(out, 0); leInt(out, 0); leInt(out, 0) // usPerFrame..flags
        leInt(out, n); leInt(out, 0); leInt(out, 1); leInt(out, 0)     // totalFrames..bufSize
        leInt(out, w); leInt(out, h)
        (0 until 4).foreach(_ => leInt(out, 0))                        // reserved
        fourcc(out, "LIST"); leInt(out, strlBody); fourcc(out, "strl")
        fourcc(out, "strh"); leInt(out, 56)
        fourcc(out, "vids"); fourcc(out, "MJPG")
        leInt(out, 0); out.write(0); out.write(0); out.write(0); out.write(0) // flags, prio, lang
        leInt(out, 0); leInt(out, 1); leInt(out, 25)                   // initFrames, scale, rate
        leInt(out, 0); leInt(out, n); leInt(out, 0)                    // start, length, bufSize
        leInt(out, 0); leInt(out, 0)                                   // quality, sampleSize
        leInt(out, 0); leInt(out, 0)                                   // rcFrame
        fourcc(out, "strf"); leInt(out, 40)
        leInt(out, 40); leInt(out, w); leInt(out, h)
        out.write(1); out.write(0); out.write(24); out.write(0)        // planes=1, bpp=24
        fourcc(out, "MJPG"); leInt(out, w * h * 3)
        leInt(out, 0); leInt(out, 0); leInt(out, 0); leInt(out, 0)     // ppm, colors
        fourcc(out, "LIST"); leInt(out, moviBody); fourcc(out, "movi")
        jpegs.foreach { j =>
          fourcc(out, "00dc"); leInt(out, j.length); out.write(j)
          if ((j.length & 1) == 1) out.write(0) // RIFF even-byte padding
        }
        Row(id, out.toByteArray)
      }
    }(enc)
  }

  /** REAL AVI/MJPEG frame extraction: walk the RIFF container to the
    * `movi` list, take every `stride`-th `##dc`/`##db` chunk, decode the
    * JPEG with the real JDK codec, and emit (frame_no, dims, JPEG marker
    * validity, mean luminance). The container walk and the lossy decode
    * are both real; swap the JPEG step for an H.264 decoder and the same
    * walk carries an interleaved production AVI. Unreadable payloads emit
    * ZERO rows (the [[decodeGifFrames]] filter posture); a chunk whose
    * JPEG fails to decode emits its row with NULL dims/luma and
    * valid_jpeg=false, so per-frame corruption is visible rather than
    * silently skipped. Row-local, one frame in memory at a time. */
  def decodeAviMjpegFrames(df: DataFrame, idCol: String, binCol: String,
                           stride: Int = 1): DataFrame = {
    require(stride >= 1, s"decodeAviMjpegFrames: stride must be >= 1, got $stride")
    val input = df.select(col(idCol).cast("long"), col(binCol))
    val enc = RowEncoder.encoderFor(aviFrameSchema)
    input.mapPartitions { rows =>
      // one reusable JPEG reader per partition (same posture as the encode
      // half: explicit in-memory streams, never the disk-cached convenience
      // API); decode failures return null so the per-frame corruption row
      // below stays visible
      val jr = javax.imageio.ImageIO.getImageReadersByFormatName("jpg").next()
      def decodeJpeg(jpeg: Array[Byte]): java.awt.image.BufferedImage =
        try {
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(jpeg))
          try { jr.setInput(iis); jr.read(0) } finally iis.close()
        } catch { case scala.util.control.NonFatal(_) => null }
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        def le(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
          ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
        def cc(o: Int) = new String(bytes, o, 4, StandardCharsets.US_ASCII)
        try {
          if (bytes.length < 12 || cc(0) != "RIFF" || cc(8) != "AVI ") Iterator.empty
          else {
            // top-level walk to the movi LIST
            var pos = 12
            var movi = -1
            var moviEnd = -1
            while (movi < 0 && pos + 8 <= bytes.length) {
              val size = le(pos + 4)
              if (cc(pos) == "LIST" && pos + 12 <= bytes.length &&
                  cc(pos + 8) == "movi") {
                movi = pos + 12
                moviEnd = math.min(pos + 8 + size, bytes.length)
              }
              pos += 8 + size + (size & 1)
            }
            if (movi < 0) Iterator.empty
            else {
              val frames = Seq.newBuilder[(Int, Array[Byte])]
              var p = movi
              var f = 0
              while (p + 8 <= moviEnd) {
                val fcc = cc(p)
                val size = le(p + 4)
                if (fcc.endsWith("dc") || fcc.endsWith("db")) {
                  if (f % stride == 0 && p + 8 + size <= moviEnd)
                    frames += ((f, java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + size)))
                  f += 1
                }
                p += 8 + size + (size & 1)
              }
              frames.result().iterator.map { case (frameNo, jpeg) =>
                val valid = jpeg.length >= 4 &&
                  (jpeg(0) & 0xFF) == 0xFF && (jpeg(1) & 0xFF) == 0xD8 &&
                  (jpeg(jpeg.length - 2) & 0xFF) == 0xFF &&
                  (jpeg(jpeg.length - 1) & 0xFF) == 0xD9
                Option(decodeJpeg(jpeg)) match {
                  case Some(im) =>
                    val (w, h) = (im.getWidth, im.getHeight)
                    var sum = 0L
                    var y = 0
                    while (y < h) {
                      var x = 0
                      while (x < w) {
                        val rgb = im.getRGB(x, y)
                        sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
                        x += 1
                      }
                      y += 1
                    }
                    Row(id, frameNo, w, h, valid, sum.toDouble / (3.0 * w * h))
                  case None => Row(id, frameNo, null, null, false, null)
                }
              }
            }
          }
        } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
    }(enc)
  }

  /** Shot/scene segmentation over decoded video frames: a frame whose mean
    * luminance jumps by more than `threshold` against its predecessor opens
    * a new scene; `scene_id` is the running boundary count within the
    * asset (frame 0 is scene 0 and never a boundary). This is the standard
    * luma-delta shot detector a video curation pipeline runs right after
    * frame decode — scene-level keyframe selection composes as a plain
    * `groupBy(id, scene_id).agg(min(frame))` on the output.
    *
    * Entirely declarative window arithmetic (`lag` + running `sum`) over
    * one (asset, frame-order) window, so both steps fuse into a single
    * partitioned Window exec: one hash shuffle on the asset key, then the
    * detector is embarrassingly parallel per asset — the same plan at
    * 100x. No frame pixels ride through this operator, only the per-frame
    * statistics the decoder already produced. */
  def sceneSegments(frames: DataFrame, idCol: String, frameCol: String,
                    lumaCol: String, threshold: Double): DataFrame = {
    require(threshold >= 0.0, s"sceneSegments: threshold must be >= 0, got $threshold")
    val w = Window.partitionBy(col(idCol)).orderBy(col(frameCol))
    frames
      .withColumn("_delta", abs(col(lumaCol) - lag(col(lumaCol), 1).over(w)))
      // first frame of an asset has no predecessor: not a boundary
      .withColumn("is_boundary", coalesce(col("_delta") > threshold, lit(false)))
      .withColumn("scene_id", sum(col("is_boundary").cast("int")).over(w).cast("int"))
      .drop("_delta")
  }

  /** Materialize one raw file per asset row under `dir` — the write half of
    * the object-store ingest round trip ([[readAssetFiles]] is the read
    * half). Runs distributed: each partition opens the directory's Hadoop
    * `FileSystem` once (works against local disk, HDFS, or object stores —
    * the broadcast job configuration carries the store credentials) and
    * streams its rows out as `<id>.bin`, no driver round-trip, no shuffle.
    * Overwrites per file, so re-runs are idempotent. One file per row is
    * the layout real crawled media lands in; the small-files pressure it
    * creates at scale is exactly what [[graft.operators.Layout]]'s
    * compaction planner exists to measure and fix. */
  def writeAssetFiles(assets: DataFrame, idCol: String, payloadCol: String,
                      dir: String): Unit = {
    val sc = assets.sparkSession.sparkContext
    val conf = sc.broadcast(
      new HadoopConfHolder(assets.sparkSession.sessionState.newHadoopConf()))
    assets.select(col(idCol).cast("string"), col(payloadCol))
      .foreachPartition { rows: Iterator[Row] =>
        if (rows.hasNext) {
          val base = new org.apache.hadoop.fs.Path(dir)
          val fs = base.getFileSystem(conf.value.value)
          rows.foreach { r =>
            val out = fs.create(
              new org.apache.hadoop.fs.Path(base, r.getString(0) + ".bin"), true)
            try out.write(r.getAs[Array[Byte]](1)) finally out.close()
          }
        }
      }
  }

  /** Raw-file ingest through Spark's `binaryFile` source: one row per file
    * with the asset id recovered from the file name (`<id>.bin` — the
    * [[writeAssetFiles]] layout), the content as a binary column, and the
    * store-reported length. The source is not splittable (a file never
    * spans tasks — correct for opaque media) and parallelism comes from the
    * file count, which is exactly the multimodal-corpus shape; a
    * `pathGlobFilter` pushes container-type selection into the listing.
    *
    * CAVEAT (spec-pinned): Spark's file-scan planning drops ZERO-length
    * files, so an empty asset written by [[writeAssetFiles]] exists on the
    * store but never surfaces here — audit ingest completeness against the
    * listing (`n_bytes > 0` pre-images), not against row counts. */
  def readAssetFiles(spark: org.apache.spark.sql.SparkSession, dir: String,
                     glob: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
    glob.foreach(g => reader.option("pathGlobFilter", g))
    reader.load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)\\.bin$", 1).cast("long").as("asset_id"),
        col("length").as("n_bytes"),
        col("content"))
  }

  /** Seeded-pattern PNG generator — the proof-image twin of [[encodePng]]
    * for PERCEPTUAL tests: gray(x, y) = min(seed*(x*31 + y*17 + 1) mod 251
    * + patch, 255) with all channels equal (so Rec.601 luminance == gray
    * exactly), where `patch` adds `deltaCol` inside ONE `grid`x`grid` dHash
    * cell (`patchR`, `patchC`). Every term is integer arithmetic on (seed,
    * delta, x, y), so an oracle enumerates the pixels and replays the
    * produced image without decoding anything. Same-seed images are
    * identical; a non-zero delta perturbs exactly one cell — the
    * controlled near-duplicate. */
  def encodePngPattern(df: DataFrame, idCol: String, wCol: String, hCol: String,
                       seedCol: String, deltaCol: String, grid: Int = 8,
                       patchR: Int = 3, patchC: Int = 2): DataFrame = {
    require(grid >= 2, s"encodePngPattern: grid must be >= 2, got $grid")
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val input = df.select(col(idCol).cast("long"), col(wCol).cast("int"),
      col(hCol).cast("int"), col(seedCol).cast("long"), col(deltaCol).cast("int"))
    val enc = RowEncoder.encoderFor(schema)
    input.mapPartitions { rows =>
      val writer = pngWriter()
      rows.map { r =>
        val (id, w, h) = (r.getLong(0), r.getInt(1), r.getInt(2))
        val (seed, delta) = (r.getLong(3), r.getInt(4))
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val patch = if (x * grid / w == patchC && y * grid / h == patchR) delta else 0
            val v = math.min((seed * (x * 31 + y * 17 + 1)) % 251 + patch, 255L).toInt
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        Row(id, writeImage(writer, img))
      }
    }(enc)
  }

  /** Difference hash (dHash) over DECODED PIXELS — the perceptual
    * fingerprint image dedup pipelines run where byte hashes fail (a
    * re-encoded or brightness-shifted copy keeps its dHash): integer
    * Rec.601 luminance per pixel, block means over a `grid`x`grid` cell
    * partition (cell of x = x*grid/w — integral, engine-exact), one bit
    * per horizontal neighbor comparison mean(r,c) < mean(r,c+1), packed
    * LSB-first at index r*(grid-1)+c. grid=8 gives 56 bits — inside a
    * signed 64-bit long on every engine, no sign-bit straddling.
    * Undecodable payloads and images smaller than the grid yield a NULL
    * fingerprint (callers exclude them). Row-local mapPartitions, no
    * shuffle, O(pixels) per row. */
  def dHash(df: DataFrame, idCol: String, binCol: String, grid: Int = 8): DataFrame = {
    require(grid >= 2 && (grid - 1) * grid <= 63,
      s"dHash: need 2 <= grid and (grid-1)*grid <= 63 bits, got $grid")
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("dhash", LongType)))
    val input = df.select(col(idCol).cast("long"), col(binCol))
    val enc = RowEncoder.encoderFor(schema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val img = readImage(r.getAs[Array[Byte]](1))
        if (img == null || img.getWidth < grid || img.getHeight < grid) Row(id, null)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val sum = Array.ofDim[Long](grid, grid)
          val cnt = Array.ofDim[Long](grid, grid)
          var y = 0
          while (y < h) {
            val cr = y * grid / h
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (77 * ((rgb >> 16) & 0xFF) + 151 * ((rgb >> 8) & 0xFF) +
                28 * (rgb & 0xFF)) >> 8
              val cc = x * grid / w
              sum(cr)(cc) += lum
              cnt(cr)(cc) += 1
              x += 1
            }
            y += 1
          }
          var fp = 0L
          var cr = 0
          while (cr < grid) {
            var cc = 0
            while (cc < grid - 1) {
              if (sum(cr)(cc) / cnt(cr)(cc) < sum(cr)(cc + 1) / cnt(cr)(cc + 1))
                fp |= 1L << (cr * (grid - 1) + cc)
              cc += 1
            }
            cr += 1
          }
          Row(id, fp)
        }
      }
    }(enc)
  }

  /** Perceptual near-dup over decoded images: [[dHash]] fingerprints,
    * banded bucketing for candidates (lossless for maxHamming < bands —
    * a pair within the radius shares at least one intact band), exact
    * hamming verify. The same verify-before-distinct economics as
    * `Dedup.simhashNearDup` (xor + popcount is cheaper than a distinct
    * over raw band collisions); the fingerprint frame is localCheckpointed
    * so the decode kernel — the dominant cost — runs ONCE, not once per
    * plan leg. Hot buckets (a constant-background corpus) are capped at
    * `maxBucketSize`, trading recall on degenerate patterns for a bounded
    * join, like every LSH operator here. */
  def dHashNearDup(df: DataFrame, idCol: String, binCol: String, grid: Int = 8,
                   bands: Int = 4, maxHamming: Int = 3,
                   maxBucketSize: Int = 1000): DataFrame = {
    val bits = (grid - 1) * grid
    require(bits % bands == 0, s"dHashNearDup: $bits bits must divide into $bands bands")
    require(maxHamming < bands,
      s"banding is lossless only for maxHamming < bands, got $maxHamming >= $bands")
    val bandBits = bits / bands
    val mask = (1L << bandBits) - 1
    val fp = dHash(df, idCol, binCol, grid)
      .filter(col("dhash").isNotNull).localCheckpoint(false)
    val banded = fp.select(col("asset_id"), posexplode(array((0 until bands).map(b =>
        shiftright(col("dhash"), b * bandBits).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val sized = banded.withColumn("_sz", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))))
    val capped = sized.filter(col("_sz") <= maxBucketSize).drop("_sz")
      .localCheckpoint(false)
    val a = capped.select(col("band"), col("bucket"), col("asset_id").as("id_a"))
    val b = capped.select(col("band"), col("bucket"), col("asset_id").as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .join(fp.select(col("asset_id").as("id_a"), col("dhash").as("_fp_a")), "id_a")
      .join(fp.select(col("asset_id").as("id_b"), col("dhash").as("_fp_b")), "id_b")
      .withColumn("hamming", Dedup.hammingDistance(col("_fp_a"), col("_fp_b"), bits))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .distinct()
  }

  /** Hadoop `Configuration` is not `java.io.Serializable`; this holder
    * ships it to executors via its own Writable round trip (the same trick
    * Spark uses internally, whose helper is `private[spark]`). Carries the
    * session's full Hadoop conf so object-store credentials and FS
    * settings survive the broadcast. */
  private class HadoopConfHolder(@transient private var conf: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    def value: org.apache.hadoop.conf.Configuration = conf
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new org.apache.hadoop.conf.Configuration(false)
      conf.readFields(in)
    }
  }

  /** The full 8-byte PNG file signature (spec §5.2) — [[RealPngMagic]]
    * plus the DOS/Unix line-ending tripwire bytes. */
  val PngSignature: Array[Byte] = Array(0x89.toByte, 'P'.toByte, 'N'.toByte,
    'G'.toByte, 0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte)

  /** PNG integrity-scan result schema ([[pngIntegrity]]). */
  val pngIntegritySchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("bad_chunk", StringType),
    StructField("n_chunks", IntegerType)))

  /** PNG container integrity scan WITHOUT decoding: walk the chunk stream
    * (length, type, data, CRC32 over type+data) and classify each payload —
    * the quarantine gate a 100 TB media ingest runs before any codec sees
    * a byte. Statuses:
    *
    *  - `ok`: signature valid, every chunk's CRC verifies, stream ends at
    *    IEND with no trailing bytes (n_chunks = chunks verified);
    *  - `missing`: null payload;
    *  - `bad_signature`: the 8-byte PNG magic is wrong or short;
    *  - `truncated`: the stream ends mid-chunk or before IEND (bad_chunk =
    *    the chunk type being read when bytes ran out, when readable);
    *  - `crc_mismatch`: a chunk's stored CRC disagrees with the computed
    *    one (bad_chunk = the first such chunk's type);
    *  - `trailing_garbage`: bytes follow the IEND chunk.
    *
    * Row-local `mapPartitions` (one CRC32 instance per partition), bounded
    * memory per row, no shuffle — corrupt assets surface as rows, never as
    * task failures. CRC32 is bit-defined by the PNG spec (java.util.zip
    * implements the same polynomial everywhere), so the verdicts are
    * engine-portable facts about the bytes. */
  def pngIntegrity(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
    val enc = RowEncoder.encoderFor(pngIntegritySchema)
    input.mapPartitions { rows =>
      val crc = new java.util.zip.CRC32()
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null) Row(id, "missing", null, null)
        else if (bytes.length < 8 || !bytes.startsWith(PngSignature))
          Row(id, "bad_signature", null, null)
        else {
          var pos = 8
          var nChunks = 0
          var verdict: Row = null
          var sawIend = false
          while (verdict == null && !sawIend) {
            if (pos + 8 > bytes.length) {
              verdict = Row(id, "truncated", null, nChunks)
            } else {
              val len = ((bytes(pos) & 0xffL) << 24) | ((bytes(pos + 1) & 0xffL) << 16) |
                ((bytes(pos + 2) & 0xffL) << 8) | (bytes(pos + 3) & 0xffL)
              val ctype = new String(bytes, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
              if (pos + 8 + len + 4 > bytes.length) {
                verdict = Row(id, "truncated", ctype, nChunks)
              } else {
                crc.reset()
                crc.update(bytes, pos + 4, 4 + len.toInt)
                val stored = ((bytes(pos + 8 + len.toInt) & 0xffL) << 24) |
                  ((bytes(pos + 9 + len.toInt) & 0xffL) << 16) |
                  ((bytes(pos + 10 + len.toInt) & 0xffL) << 8) |
                  (bytes(pos + 11 + len.toInt) & 0xffL)
                if (crc.getValue != stored) {
                  verdict = Row(id, "crc_mismatch", ctype, nChunks)
                } else {
                  nChunks += 1
                  pos += 12 + len.toInt
                  if (ctype == "IEND") sawIend = true
                }
              }
            }
          }
          if (verdict != null) verdict
          else if (pos < bytes.length) Row(id, "trailing_garbage", null, nChunks)
          else Row(id, "ok", null, nChunks)
        }
      }
    }(enc)
  }

  /** Deterministic damage generator for integrity-scan testing: by
    * asset id, flip one byte inside the first IDAT chunk's data (id % 13
    * == 0 — framing intact, CRC must catch it), else truncate to 20 bytes
    * (id % 17 == 0 — cuts IHDR mid-chunk), else pass through unchanged.
    * Row-local, like [[encodePng]] whose output it damages. */
  def damagePngAssets(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val input = df.select(col(idCol).cast("long"), col(binCol))
    val enc = RowEncoder.encoderFor(schema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null) Row(id, bytes)
        else if (id % 13 == 0) {
          val out = bytes.clone()
          // chunk walk to the first IDAT; flip the middle data byte
          var pos = 8
          var done = false
          while (!done && pos + 8 <= out.length) {
            val len = ((out(pos) & 0xff) << 24) | ((out(pos + 1) & 0xff) << 16) |
              ((out(pos + 2) & 0xff) << 8) | (out(pos + 3) & 0xff)
            val ctype = new String(out, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
            if (ctype == "IDAT" && len > 0) {
              val at = pos + 8 + len / 2
              out(at) = (out(at) ^ 0x55).toByte
              done = true
            } else pos += 12 + len
          }
          Row(id, out)
        } else if (id % 17 == 0) Row(id, bytes.take(20))
        else Row(id, bytes)
      }
    }(enc)
  }

  /** Fake decode used by [[decodeImageMetaStub]]: derives stable fake
    * dimensions from the first bytes so tests are deterministic (the test
    * double for [[decodeImageMeta]]). */
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
