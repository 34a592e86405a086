package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal binary-column plumbing: stats, frame sampling, and the batched
  * decode stub (deterministic fake behind the production mapPartitions
  * shape). */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def bytes(s: String) = s.getBytes(StandardCharsets.UTF_8)

  private lazy val assets = Seq(
    (1L, bytes("PNG0" + "x" * 600)),
    (2L, bytes("JPG0tiny")),
    (3L, bytes("plain payload no magic")),
    (4L, bytes(""))).toDF("asset_id", "payload")

  test("binaryStats: byte length, md5, magic sniff") {
    val got = Multimodal.binaryStats(assets, "asset_id", "payload")
      .orderBy("asset_id").collect()
    assert(got.map(_.getInt(1)).toSeq == Seq(604, 8, 22, 0))
    assert(got.map(_.getString(3)).toSeq == Seq("png", "jpeg", "unknown", "unknown"))
    // md5 of the raw bytes — spot-check against java's digest
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes("JPG0tiny")).map("%02x".format(_)).mkString
    assert(got(1).getString(2) == d)
  }

  test("sampleFrames: fixed-size chunks, short tail, empty payload yields one empty frame") {
    val got = Multimodal.sampleFrames(assets, "asset_id", "payload", frameBytes = 256)
      .orderBy("asset_id", "frame_no").collect()
    val byAsset = got.groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(2)).toSeq).toMap
    assert(byAsset(1L) == Seq(256, 256, 92)) // 604 bytes -> 3 frames
    assert(byAsset(2L) == Seq(8))
    assert(byAsset(4L) == Seq(0)) // empty payload still emits frame 0
    assert(got.filter(_.getLong(0) == 1L).map(_.getInt(1)).toSeq == Seq(0, 1, 2))
  }

  test("frameNearDup: identical assets hit jaccard 1, disjoint assets never pair") {
    // 8-byte frames: a and b share 3 of their 4 distinct frames; c is disjoint
    val block = (c: Char) => c.toString * 8
    val df = Seq(
      (1L, bytes(block('a') + block('b') + block('c') + block('d'))),
      (2L, bytes(block('a') + block('b') + block('c') + block('z'))),
      (3L, bytes(block('a') + block('b') + block('c') + block('d'))), // exact dup of 1
      (4L, bytes(block('p') + block('q')))).toDF("asset_id", "payload")
    val got = Multimodal.frameNearDup(df, "asset_id", "payload",
        frameBytes = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 3L)) == 1.0) // identical frame sets
    assert(got((1L, 2L)) == 0.6) // |A ∩ B| = 3, |A ∪ B| = 5
    assert(got((2L, 3L)) == 0.6)
    assert(!got.keySet.exists { case (a, b) => a == 4L || b == 4L })
    // a frame shared by every asset is capped out of candidate generation,
    // so assets related ONLY through it never pair
    val gotCapped = Multimodal.frameNearDup(df, "asset_id", "payload",
        frameBytes = 8, threshold = 0.0, maxFrameFreq = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!gotCapped.contains((1L, 2L))) // only shared frames a,b,c are all hot
  }

  test("decode stub: deterministic fake dims, schema, n_pixels = w*h") {
    val meta = Multimodal.decodeImageMetaStub(assets, "asset_id", "payload")
    assert(meta.schema == Multimodal.imageMetaSchema)
    val rows = meta.orderBy("asset_id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("png", "jpeg", "unknown", "unknown"))
    rows.foreach { r =>
      val (w, h, px) = (r.getInt(2), r.getInt(3), r.getLong(4))
      assert(w >= 1 && w <= 1920 && h >= 1 && h <= 1080 && px == w.toLong * h)
    }
    // deterministic across runs
    val again = Multimodal.decodeImageMetaStub(assets, "asset_id", "payload")
      .orderBy("asset_id").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("resize stub: stride-4 keeps ceil(n/4) bytes; stride-1 is the identity") {
    val got = Multimodal.resizeImageStub(assets, "asset_id", "payload", stride = 4)
      .orderBy("asset_id").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got(1L) == (604, 151))
    assert(got(2L) == (8, 2))
    assert(got(4L) == (0, 0))
    val id = Multimodal.resizeImageStub(assets, "asset_id", "payload", stride = 1)
      .orderBy("asset_id").collect()
    val orig = Multimodal.binaryStats(assets, "asset_id", "payload")
      .orderBy("asset_id").collect()
    id.zip(orig).foreach { case (r, o) =>
      assert(r.getInt(1) == r.getInt(2)) // in == out
      assert(r.getString(3) == o.getString(2)) // same md5 as the original
    }
  }

  test("feature stub: fixed dim, non-negative, sums to 1 for non-empty payloads") {
    val rows = Multimodal.extractFeaturesStub(assets, "asset_id", "payload", dim = 16)
      .orderBy("asset_id").collect()
    rows.foreach { r =>
      val f = r.getAs[scala.collection.Seq[Double]](1)
      assert(f.length == 16)
      assert(f.forall(_ >= 0.0))
      val sum = f.sum
      if (r.getLong(0) != 4L) assert(math.abs(sum - 1.0) < 1e-9, s"sum=$sum")
      else assert(sum == 0.0) // empty payload: zero vector, no NaN
    }
  }

  // ---- real javax.imageio decode kernel ----------------------------------

  private def encodeJvm(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x336699)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no JDK writer for $fmt")
    bos.toByteArray
  }

  test("decodeImageMeta reads real PNG and JPEG headers, tolerates garbage") {
    import spark.implicits._
    val png = encodeJvm("png", 37, 21)
    val jpg = encodeJvm("jpg", 64, 48)
    val rows = Seq(
      (1L, png), (2L, jpg),
      (3L, "not an image at all".getBytes("UTF-8")),
      (4L, png.take(8).toArray)) // torn header
      .toDF("asset_id", "payload")
    val got = Multimodal.decodeImageMeta(rows, "asset_id", "payload")
      .orderBy("asset_id").collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got(1L) == (("png", Some(37), Some(21))))
    assert(got(2L) == (("jpeg", Some(64), Some(48))))
    assert(got(3L)._1 == "unknown" && got(3L)._2.isEmpty)
    assert(got(4L)._1 == "unknown" || got(4L)._2.isEmpty) // torn: never a lie
    // real magics are sniffed by the column kernel too
    val sniff = Multimodal.binaryStats(rows, "asset_id", "payload")
      .orderBy("asset_id").collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(sniff(1L) == "png" && sniff(2L) == "jpeg" && sniff(3L) == "unknown")
  }

  test("resizeImageReal scales with integer-exact target dims; garbage -> NULLs") {
    import spark.implicits._
    val rows = Seq(
      (1L, encodeJvm("png", 64, 32)),  // downscale: max 64 -> 16, so (16, 8)
      (2L, encodeJvm("png", 10, 7)),   // already fits: untouched
      (3L, encodeJvm("png", 5, 100)),  // tall: h 100 -> 16, w 5*16/100 = 0 -> 1
      (4L, "not an image".getBytes("UTF-8")))
      .toDF("asset_id", "payload")
    val got = Multimodal.resizeImageReal(rows, "asset_id", "payload", maxDim = 16)
      .orderBy("asset_id").collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toMap
    assert(got(1L)._1 == Some(16) && got(1L)._2 == Some(8))
    assert(got(2L)._1 == Some(10) && got(2L)._2 == Some(7))
    assert(got(3L)._1 == Some(1) && got(3L)._2 == Some(16))
    assert(got(4L) == ((None, None, None)))
    // the resized payload is a real decodable PNG of the claimed size
    val bytes = Multimodal.resizeImageReal(rows.filter(col("asset_id") === 1L),
        "asset_id", "payload", maxDim = 16)
      .select("resized").collect()(0).getAs[Array[Byte]](0)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 16 && img.getHeight == 8)
  }

  test("extractFeaturesReal histograms decoded pixel luminance") {
    import spark.implicits._
    // hand-made 2x1 image: one black pixel (bucket 0), one white (bucket 15)
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000)
    img.setRGB(1, 0, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rows = Seq((1L, bos.toByteArray),
      (2L, "garbage".getBytes("UTF-8"))).toDF("asset_id", "payload")
    val got = Multimodal.extractFeaturesReal(rows, "asset_id", "payload")
      .orderBy("asset_id").collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]](1)).toMap
    val f = got(1L)
    assert(f.length == 16 && f(0) == 0.5 && f(15) == 0.5 && f.sum == 1.0)
    assert(got(2L).forall(_ == 0.0)) // undecodable -> zero vector, no NaN
  }

  test("encodeWav -> decodeAudioMeta round-trips frames/rate; garbage -> unknown") {
    import spark.implicits._
    val frames = Seq((1L, 8000), (2L, 1), (3L, 12345)).toDF("asset_id", "_frames")
    val got = Multimodal.decodeAudioMeta(
        Multimodal.encodeWav(frames, "asset_id", "_frames", sampleRate = 8000),
        "asset_id", "payload")
      .orderBy("asset_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, "wave", 8000, 1, 8000L, 1000L),
      (2L, "wave", 8000, 1, 1L, 0L),
      (3L, "wave", 8000, 1, 12345L, 1543L)))
    val bad = Multimodal.decodeAudioMeta(
        Seq((9L, "definitely not audio".getBytes("UTF-8"))).toDF("asset_id", "payload"),
        "asset_id", "payload")
      .collect()(0)
    assert(bad.getString(1) == "unknown" && bad.isNullAt(2))
  }

  test("decodeAudioMeta: NOT_SPECIFIED frame length -> NULL frames/duration, never -1") {
    import spark.implicits._
    // AU header with dataSize = 0xFFFFFFFF (unknown length, the streamed
    // form): the JDK reader reports frameLength = AudioSystem.NOT_SPECIFIED
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBytes(".snd")
    out.writeInt(24)         // data offset
    out.writeInt(-1)         // 0xFFFFFFFF = unknown data size
    out.writeInt(3)          // 16-bit linear PCM
    out.writeInt(8000)       // sample rate
    out.writeInt(1)          // channels
    out.write(new Array[Byte](64)) // some payload
    val got = Multimodal.decodeAudioMeta(
        Seq((1L, bos.toByteArray)).toDF("asset_id", "payload"),
        "asset_id", "payload")
      .collect()(0)
    assert(got.getString(1) == "au")
    assert(got.getInt(2) == 8000 && got.getInt(3) == 1)
    assert(got.isNullAt(4), "n_frames must be NULL, not -1")
    assert(got.isNullAt(5), "duration_ms must be NULL, not negative")
  }

  test("encodeGif -> decodeGifFrames round-trips frame count, dims, and gray formula") {
    import spark.implicits._
    val frames = Seq((0L, 1), (7L, 3), (300L, 5)).toDF("asset_id", "_n")
    val gifs = Multimodal.encodeGif(frames, "asset_id", "_n", w = 6, h = 4)
    // stride 1: every frame comes back with the encoded constant gray
    val all = Multimodal.decodeGifFrames(gifs, "asset_id", "payload")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getDouble(4))).toSet
    val expected = (for {
      (id, n) <- Seq((0L, 1), (7L, 3), (300L, 5))
      f <- 0 until n
    } yield (id, f, 6, 4, ((id * 31 + f * 17) % 256).toDouble)).toSet
    assert(all == expected)
    // stride 2 keeps only even frame numbers
    val sampled = Multimodal.decodeGifFrames(gifs, "asset_id", "payload", stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(sampled == expected.collect { case (id, f, _, _, _) if f % 2 == 0 => (id, f) })
    // garbage payload: zero rows (filter posture), no task failure
    val bad = Multimodal.decodeGifFrames(
      Seq((9L, "not a gif".getBytes("UTF-8"))).toDF("asset_id", "payload"),
      "asset_id", "payload").collect()
    assert(bad.isEmpty)
  }

  test("encodeAviMjpeg -> decodeAviMjpegFrames: container facts exact, pixels within JPEG tolerance") {
    import spark.implicits._
    val frames = Seq((0L, 1), (7L, 3), (300L, 5)).toDF("asset_id", "_n")
    val avis = Multimodal.encodeAviMjpeg(frames, "asset_id", "_n", w = 16, h = 8)
    val all = Multimodal.decodeAviMjpegFrames(avis, "asset_id", "payload")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getBoolean(4), r.getDouble(5)))
    // frame inventory, dims, and marker validity are exact container facts
    assert(all.map(t => (t._1, t._2, t._3, t._4, t._5)).toSet ==
      (for { (id, n) <- Seq((0L, 1), (7L, 3), (300L, 5)); f <- 0 until n }
        yield (id, f, 16, 8, true)).toSet)
    // JPEG is lossy: a constant-gray frame decodes within DC-quantization
    // distance of the encoded gray (chroma stays neutral on gray input)
    all.foreach { case (id, f, _, _, _, lum) =>
      val g = ((id * 31 + f * 17) % 256).toDouble
      assert(math.abs(lum - g) <= 2.0, s"asset $id frame $f: |$lum - $g| > 2")
    }
    // stride sampling keeps even frame numbers only
    val sampled = Multimodal.decodeAviMjpegFrames(avis, "asset_id", "payload",
        stride = 2).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(sampled == all.collect { case (id, f, _, _, _, _) if f % 2 == 0 => (id, f) }.toSet)
    // garbage and truncated payloads: zero rows, no task failure
    val avi0 = avis.filter(col("asset_id") === 300L)
      .select("payload").head().getAs[Array[Byte]](0)
    val bad = Multimodal.decodeAviMjpegFrames(Seq(
        (9L, "not an avi".getBytes("UTF-8")),
        (10L, java.util.Arrays.copyOf(avi0, 16))).toDF("asset_id", "payload"),
      "asset_id", "payload").collect()
    assert(bad.isEmpty)
    // a corrupted FRAME (JPEG body zeroed) still reports its row, flagged
    val corrupt = avi0.clone()
    // find the first 00dc chunk and zero its payload head
    val movi = new String(corrupt, 0, corrupt.length, "ISO-8859-1").indexOf("00dc")
    assert(movi > 0)
    java.util.Arrays.fill(corrupt, movi + 8, movi + 24, 0.toByte)
    val flagged = Multimodal.decodeAviMjpegFrames(
        Seq((11L, corrupt)).toDF("asset_id", "payload"), "asset_id", "payload")
      .filter(col("frame_no") === 0).collect()
    assert(flagged.length == 1 && !flagged(0).getBoolean(4))
  }

  test("writeAssetFiles -> readAssetFiles round-trips bytes, ids, and glob selection") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rawassets").toString
    val assets = Seq(
      (1L, "alpha".getBytes("UTF-8")),
      (2L, Array[Byte]()),                       // empty payload: 0-byte file
      (3L, Array[Byte](0, -1, 127, -128)))       // non-UTF8 bytes survive
      .toDF("doc_id", "payload")
    Multimodal.writeAssetFiles(assets, "doc_id", "payload", dir)
    // a stray non-.bin file must be excluded by the glob
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_stray.txt"),
      "junk".getBytes("UTF-8"))
    val got = Multimodal.readAssetFiles(spark, dir, glob = Some("*.bin"))
      .orderBy("asset_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Array[Byte]](2).toSeq))
    // the 0-byte file is written (on disk) but Spark's file-scan planning
    // drops zero-length files — the pinned caveat in readAssetFiles' doc
    assert(java.nio.file.Files.size(java.nio.file.Paths.get(dir, "2.bin")) == 0)
    assert(got.toSeq == Seq(
      (1L, 5L, "alpha".getBytes("UTF-8").toSeq),
      (3L, 4L, Seq[Byte](0, -1, 127, -128))))
    // re-run overwrites in place: same file set, no duplicates
    Multimodal.writeAssetFiles(assets, "doc_id", "payload", dir)
    assert(Multimodal.readAssetFiles(spark, dir, glob = Some("*.bin")).count() == 2)
  }

  test("encodePng -> decodeImageMeta round-trips the requested dimensions") {
    import spark.implicits._
    val dims = Seq((10L, 5, 3), (11L, 1, 1), (12L, 300, 200))
      .toDF("doc_id", "_w", "_h")
    val got = Multimodal.decodeImageMeta(
        Multimodal.encodePng(dims, "doc_id", "_w", "_h"), "asset_id", "payload")
      .orderBy("asset_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (10L, "png", 5, 3, 15L), (11L, "png", 1, 1, 1L), (12L, "png", 300, 200, 60000L)))
  }

  /** Driver replay of the encodePngPattern -> dHash chain: pixel formula,
    * block means, neighbor bits — the arithmetic the DuckDB oracle uses. */
  private def replayDHash(w: Int, h: Int, seed: Long, delta: Int,
                          grid: Int = 8): Long = {
    val sum = Array.ofDim[Long](grid, grid)
    val cnt = Array.ofDim[Long](grid, grid)
    for (y <- 0 until h; x <- 0 until w) {
      val patch = if (x * grid / w == 2 && y * grid / h == 3) delta else 0
      val v = math.min((seed * (x * 31 + y * 17 + 1)) % 251 + patch, 255L)
      sum(y * grid / h)(x * grid / w) += v
      cnt(y * grid / h)(x * grid / w) += 1
    }
    (for (r <- 0 until grid; c <- 0 until grid - 1
          if sum(r)(c) / cnt(r)(c) < sum(r)(c + 1) / cnt(r)(c + 1))
      yield 1L << (r * (grid - 1) + c)).sum
  }

  test("dHash over real decoded pixels equals the integer-arithmetic replay") {
    val specs = Seq((1L, 40, 24, 7L, 0), (2L, 9, 8, 13L, 0), (3L, 33, 17, 7L, 60))
    val df = specs.toDF("doc_id", "_w", "_h", "_seed", "_delta")
    val got = Multimodal.dHash(
        Multimodal.encodePngPattern(df, "doc_id", "_w", "_h", "_seed", "_delta"),
        "asset_id", "payload")
      .orderBy("asset_id").as[(Long, Long)].collect().toSeq
    val expected = specs.map { case (id, w, h, s, d) => (id, replayDHash(w, h, s, d)) }
    assert(got == expected)
  }

  test("dHash: undecodable payload and sub-grid image yield NULL") {
    val tiny = Multimodal.encodePngPattern(
      Seq((1L, 4, 4, 7L, 0)).toDF("doc_id", "_w", "_h", "_seed", "_delta"),
      "doc_id", "_w", "_h", "_seed", "_delta")
    val garbage = Seq((2L, bytes("not an image"))).toDF("asset_id", "payload")
    val got = Multimodal.dHash(tiny.unionByName(garbage), "asset_id", "payload")
      .orderBy("asset_id").collect()
    assert(got.forall(_.isNullAt(1)))
  }

  test("audioFeatures: real WAV round-trip matches hand-computed signal stats") {
    // id=1, 4 frames: s_k = (2*(k+1)) % 65521 - 32760 = {-32758, -32756,
    // -32754, -32752}: all negative -> 0 crossings, peak 32758
    val in = Seq((1L, 4)).toDF("id", "nf")
    val got = Multimodal.audioFeatures(
        Multimodal.encodeWavPattern(in, "id", "nf", sampleRate = 8000),
        "asset_id", "payload")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Int])]
      .collect().head
    val expSumSq = Seq(-32758L, -32756L, -32754L, -32752L).map(s => s * s).sum
    assert(got == ((1L, Some(4L), Some(expSumSq), Some(0L), Some(32758))))
    // a waveform that crosses zero: multiplier id+1 = 32760 ~ modulus/2,
    // so consecutive samples land on opposite sides of zero
    val in2 = Seq((32759L, 6)).toDF("id", "nf")
    val k2 = Multimodal.audioFeatures(
        Multimodal.encodeWavPattern(in2, "id", "nf", sampleRate = 8000),
        "asset_id", "payload")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Int])]
      .collect().head
    val samples = (0 until 6).map(k => ((32759L + 1) * (k + 1)) % 65521L - 32760L)
    val zc = (1 until 6).count(k => (samples(k) >= 0) != (samples(k - 1) >= 0))
    assert(k2._3 == Some(samples.map(s => s * s).sum))
    assert(k2._4 == Some(zc.toLong) && zc > 0)
  }

  test("audioFeatures: corrupt payload degrades to NULL features") {
    val junk = Seq((9L, Array[Byte](1, 2, 3, 4))).toDF("id", "payload")
    val got = Multimodal.audioFeatures(junk, "id", "payload")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Int])]
      .collect().head
    assert(got == ((9L, None, None, None, None)))
  }

  test("audioSilence: run detection matches a scalar replay of the waveform") {
    val in = Seq((1L, 200), (7L, 64)).toDF("id", "nf")
    val got = Multimodal.audioSilence(
        Multimodal.encodeWavPattern(in, "id", "nf", sampleRate = 8000),
        "asset_id", "payload", threshold = 16384, minRun = 4)
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    for ((id, nf) <- Seq((1L, 200), (7L, 64))) {
      val samples = (0 until nf).map(k => ((id + 1) * (k + 1)) % 65521L - 32760L)
      val silent = samples.map(s => math.abs(s) < 16384)
      var runs = List.empty[Int]; var cur = 0
      silent.foreach { s => if (s) cur += 1 else { if (cur > 0) runs ::= cur; cur = 0 } }
      if (cur > 0) runs ::= cur
      val exp = (Some(nf.toLong), Some(silent.count(identity).toLong),
        Some(runs.count(_ >= 4).toLong),
        Some(if (runs.isEmpty) 0L else runs.max.toLong))
      assert(got(id) == exp, s"id $id: ${got(id)} != $exp")
    }
  }

  test("audioSilence: all-silent and corrupt payloads handle cleanly") {
    // id such that every sample is quiet: id=65520 -> (65521*(k+1)) % 65521
    // = 0 -> s = -32760... that's loud. Use a tiny threshold instead: with
    // threshold above full scale every sample is silent -> one run of nf
    val in = Seq((3L, 10)).toDF("id", "nf")
    val all = Multimodal.audioSilence(
        Multimodal.encodeWavPattern(in, "id", "nf", sampleRate = 8000),
        "asset_id", "payload", threshold = 40000, minRun = 4)
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().head
    assert(all == ((3L, Some(10L), Some(10L), Some(1L), Some(10L))))
    val junk = Seq((9L, Array[Byte](1, 2, 3, 4))).toDF("id", "payload")
    val got = Multimodal.audioSilence(junk, "id", "payload", 16384, 4)
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().head
    assert(got == ((9L, None, None, None, None)))
  }

  test("dHashNearDup: same pattern pairs at 0, one-cell patch stays in radius, distinct patterns do not pair") {
    // ids 1,2 share a seed (identical image); 3 is 1 with a one-cell patch
    // (near-dup); 4 is an unrelated seed; 5 is garbage (excluded)
    val imgs = Multimodal.encodePngPattern(
      Seq((1L, 40, 24, 7L, 0), (2L, 40, 24, 7L, 0), (3L, 40, 24, 7L, 60),
          (4L, 40, 24, 1811L, 0)).toDF("doc_id", "_w", "_h", "_seed", "_delta"),
      "doc_id", "_w", "_h", "_seed", "_delta")
      .unionByName(Seq((5L, bytes("junk"))).toDF("asset_id", "payload"))
    val got = Multimodal.dHashNearDup(imgs, "asset_id", "payload")
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got.head._3 == 0) // identical images: hamming 0
    assert(got.forall(_._3 <= 3))
  }

  test("pngIntegrity: clean JDK-encoded PNGs verify ok with their chunks counted") {
    val assets = Multimodal.encodePng(
      Seq((1L, 16, 12), (2L, 3, 3)).toDF("doc_id", "_w", "_h"), "doc_id", "_w", "_h")
    val got = Multimodal.pngIntegrity(assets, "asset_id", "payload")
      .orderBy("asset_id")
      .as[(Long, String, Option[String], Option[Int])].collect().toSeq
    assert(got.forall(_._2 == "ok"))
    assert(got.forall(_._3.isEmpty))
    assert(got.forall(_._4.exists(_ >= 3))) // at least IHDR, IDAT, IEND
  }

  test("pngIntegrity: damage classes are detected with the right chunk blamed") {
    // ids chosen so 13 | id (flip), 17 | id (truncate), neither (ok)
    val assets = Multimodal.encodePng(
      Seq((13L, 16, 12), (17L, 16, 12), (5L, 16, 12)).toDF("doc_id", "_w", "_h"),
      "doc_id", "_w", "_h")
    val got = Multimodal.pngIntegrity(
        Multimodal.damagePngAssets(assets, "asset_id", "payload"),
        "asset_id", "payload")
      .orderBy("asset_id")
      .select("asset_id", "status", "bad_chunk")
      .as[(Long, String, Option[String])].collect().toSeq
    assert(got == Seq(
      (5L, "ok", None),
      (13L, "crc_mismatch", Some("IDAT")),
      (17L, "truncated", Some("IHDR"))))
  }

  test("pngIntegrity: bad signature, trailing garbage, and null payloads classify") {
    val clean = Multimodal.encodePng(
      Seq((1L, 4, 4)).toDF("doc_id", "_w", "_h"), "doc_id", "_w", "_h")
      .as[(Long, Array[Byte])].collect().head._2
    val cases = Seq(
      (1L, "not a png at all".getBytes(StandardCharsets.UTF_8)),
      (2L, clean ++ Array[Byte](1, 2, 3)),
      (3L, null.asInstanceOf[Array[Byte]]),
      (4L, clean.take(5))) // shorter than the signature itself
    val got = Multimodal.pngIntegrity(cases.toDF("asset_id", "payload"),
        "asset_id", "payload")
      .orderBy("asset_id").select("asset_id", "status")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "bad_signature"), (2L, "trailing_garbage"),
      (3L, "missing"), (4L, "bad_signature")))
  }

  test("sceneSegments: boundaries open new scenes, frame 0 never does") {
    // asset 1: jump at frame 2 and frame 4; asset 2: flat (one scene)
    val frames = Seq(
      (1L, 0, 10.0), (1L, 1, 15.0), (1L, 2, 200.0), (1L, 3, 205.0), (1L, 4, 20.0),
      (2L, 0, 99.0), (2L, 1, 99.0)).toDF("asset_id", "frame_no", "luma_mean")
    val got = Multimodal.sceneSegments(frames, "asset_id", "frame_no",
        "luma_mean", threshold = 100.0)
      .orderBy("asset_id", "frame_no")
      .select("asset_id", "frame_no", "is_boundary", "scene_id")
      .as[(Long, Int, Boolean, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 0, false, 0), (1L, 1, false, 0), (1L, 2, true, 1),
      (1L, 3, false, 1), (1L, 4, true, 2),
      (2L, 0, false, 0), (2L, 1, false, 0)))
    // keyframe selection composes as a plain groupBy on the output
    val keys = Multimodal.sceneSegments(frames, "asset_id", "frame_no",
        "luma_mean", threshold = 100.0)
      .groupBy("asset_id", "scene_id").agg(min("frame_no").as("keyframe"))
      .orderBy("asset_id", "scene_id")
      .as[(Long, Int, Int)].collect().toSeq
    assert(keys == Seq((1L, 0, 0), (1L, 1, 2), (1L, 2, 4), (2L, 0, 0)))
  }

  test("sceneSegments round-trip: GIF decode luma wrap marks the boundary") {
    // gray walks +17 per frame mod 256: start asset at 250 -> frame 1 wraps
    // (250*?) — use the encoder formula directly: id=8 gives gray(0)=248,
    // gray(1)=(248+17)%256=9 -> |delta|=239 > 100 = boundary at frame 1
    val in = Seq((8L, 3)).toDF("doc_id", "_frames")
    val got = Multimodal.sceneSegments(
        Multimodal.decodeGifFrames(
          Multimodal.encodeGif(in, "doc_id", "_frames", w = 8, h = 8),
          "asset_id", "payload", stride = 1),
        "asset_id", "frame_no", "luma_mean", threshold = 100.0)
      .orderBy("frame_no")
      .select("frame_no", "luma_mean", "is_boundary", "scene_id")
      .as[(Int, Double, Boolean, Int)].collect().toSeq
    assert(got == Seq((0, 248.0, false, 0), (1, 9.0, true, 1), (2, 26.0, false, 1)))
  }
}
