package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real-codec multimodal operators: the synthesized media is encoded by
 * the same JVM stacks (ImageIO / RIFF writer) the operators decode, so
 * every value below is an exact golden, not a shape check. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("imageMeta decodes real PNG headers exactly") {
    import spark.implicits._
    // seed → expected dims mirror syntheticPng's construction
    val seeds = Seq(0L, 2L, 40L, 62L, 100L)
    val df = Multimodal.imageMeta(
      Multimodal.syntheticMedia(seeds.toDF("id"), "id"), "media")
    val got = df.select(col("id"), col("meta.format"), col("meta.width"),
      col("meta.height"), col("meta.n_bytes")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    seeds.foreach { s =>
      val (w, h) = (16 + (s % 32).toInt, 16 + ((s * 7 + 3) % 32).toInt)
      assert(got(s) == ("png", w, h), s"seed $s")
    }
    assert(df.select(col("meta.n_bytes")).as[Long].collect().forall(_ > 50))
  }

  test("resizeImage really resamples: re-decoding the output confirms the dims") {
    import spark.implicits._
    val df = Multimodal.resizeImage(
      Multimodal.syntheticMedia(Seq(30L, 8L).toDF("id"), "id"), "media", 24)
    // decode the RESIZED bytes with the independent header reader
    val rows = df.select(col("id"), col("resized.bytes"), col("resized.width"),
      col("resized.height")).collect()
    rows.foreach { r =>
      val redecoded = Multimodal.imageHeader(r.getAs[Array[Byte]](1)).get
      assert((redecoded._2, redecoded._3) == (r.getInt(2), r.getInt(3)))
      assert(math.max(r.getInt(2), r.getInt(3)) <= 24)
    }
    // seed 30: 46x37 → longest side 46 → scale 24/46 → 24x19 (floor, aspect kept)
    val s30 = rows.find(_.getLong(0) == 30L).get
    assert((s30.getInt(2), s30.getInt(3)) == (24, 19))
    // small images are never upscaled
    val small = Multimodal.resizeImage(
      Multimodal.syntheticMedia(Seq(0L).toDF("id"), "id"), "media", 500)
      .select(col("resized.width"), col("resized.height")).collect()(0)
    assert((small.getInt(0), small.getInt(1)) == (16, 19))
  }

  test("imageFeatures: normalized luminance histogram + mean") {
    import spark.implicits._
    val feats = Multimodal.imageFeatures(
      Multimodal.syntheticMedia(Seq(4L, 4L, 6L).toDF("id"), "id"), "media", bins = 16)
      .select(col("id"), col("features")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    feats.foreach { case (_, f) =>
      assert(f.length == 17) // 16 bins + mean
      assert(math.abs(f.take(16).sum - 1.0) < 1e-9, "histogram is L1-normalized")
      val mean = f.last
      assert(mean > 0.0 && mean < 1.0)
    }
    // deterministic: equal seeds → identical vectors; different seeds differ
    val bySeed = feats.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(bySeed(4L).distinct.size == 1)
    assert(bySeed(4L).head != bySeed(6L).head)
  }

  test("audioMeta + audioSample parse real WAV PCM") {
    import spark.implicits._
    val seeds = Seq(1L, 7L, 255L)
    val df = Multimodal.audioSample(
      Multimodal.audioMeta(
        Multimodal.syntheticMedia(seeds.toDF("id"), "id"), "media"),
      "media", everyK = 10)
    val rows = df.select(col("id"), col("audio_meta.sample_rate"),
      col("audio_meta.channels"), col("audio_meta.bits"),
      col("audio_meta.n_frames"), col("audio_meta.duration_ms"),
      col("samples")).collect()
    rows.foreach { r =>
      val seed = r.getLong(0)
      val nFrames = 256 + (seed % 256).toInt
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) == (8000, 1, 16))
      assert(r.getLong(4) == nFrames)
      assert(r.getLong(5) == nFrames * 1000L / 8000)
      val samples = r.getSeq[Double](6)
      assert(samples.length == nFrames / 10 + (if (nFrames % 10 > 0) 1 else 0))
      // golden: sample i equals the synthesized sine at frame i*10
      val freq = 200.0 + (seed * 13) % 1800
      samples.zipWithIndex.foreach { case (v, i) =>
        val want = (math.sin(2 * math.Pi * freq * (i * 10) / 8000) * 12000).toShort / 32768.0
        assert(math.abs(v - want) < 1e-12, s"seed $seed sample $i")
      }
    }
  }

  test("videoMeta decodes real MJPEG-AVI headers exactly") {
    import spark.implicits._
    val seeds = Seq(2L, 5L, 11L, 23L)
    val df = Multimodal.videoMeta(
      seeds.toDF("id").withColumn("media",
        udf((s: Long) => Multimodal.syntheticAvi(s)).apply(col("id"))), "media")
    val got = df.select(col("id"), col("video_meta.format"),
      col("video_meta.width"), col("video_meta.height"),
      col("video_meta.n_frames"), col("video_meta.duration_ms")).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5))).toMap
    seeds.foreach { s =>
      val (w, h) = (16 + Math.floorMod(s * 3, 24L).toInt,
        16 + Math.floorMod(s * 5 + 1, 24L).toInt)
      val n = 3 + Math.floorMod(s, 5L).toInt
      // 25 fps → 40 ms per frame
      assert(got(s) == ("avi", w, h, n.toLong, n * 40L), s"seed $s")
    }
  }

  test("videoFrameSample really decodes every k-th JPEG frame") {
    import spark.implicits._
    val seeds = Seq(2L, 8L, 14L) // 5, 6, 4 frames respectively... computed below
    val df = Multimodal.videoFrameSample(
      seeds.toDF("id").withColumn("media",
        udf((s: Long) => Multimodal.syntheticAvi(s)).apply(col("id"))),
      "media", everyK = 2)
    val rows = df.select(col("id"), col("frames")).collect()
    rows.foreach { r =>
      val s = r.getLong(0)
      val n = 3 + Math.floorMod(s, 5L).toInt
      val (w, h) = (16 + Math.floorMod(s * 3, 24L).toInt,
        16 + Math.floorMod(s * 5 + 1, 24L).toInt)
      val frames = r.getSeq[org.apache.spark.sql.Row](1)
      // every 2nd frame, 0-indexed: ceil(n / 2)
      assert(frames.length == (n + 1) / 2, s"seed $s")
      frames.zipWithIndex.foreach { case (f, i) =>
        assert(f.getInt(0) == i * 2) // sampled frame indices
        assert((f.getInt(1), f.getInt(2)) == (w, h)) // true decoded dims
        val luma = f.getDouble(3)
        assert(luma > 0.0 && luma < 1.0)
      }
    }
    // determinism: identical seeds produce identical decoded features
    val twice = Multimodal.videoFrameSample(
      Seq(2L, 2L).toDF("id").withColumn("media",
        udf((s: Long) => Multimodal.syntheticAvi(s)).apply(col("id"))),
      "media", everyK = 2).select("frames").collect()
    assert(twice(0) == twice(1))
  }

  test("adversarial AVI chunk sizes and LIST nesting: None, never a hang") {
    // hostile top-level chunk whose 32-bit size would be negative as Int
    def hostile(size: Long): Array[Byte] = {
      val b = new Array[Byte](64)
      def put(i: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(b, i)
      put(0, "RIFF"); b(4) = 60; put(8, "AVI "); put(12, "junk")
      var v = size
      (0 until 4).foreach { i => b(16 + i) = (v & 0xFF).toByte; v >>= 8 }
      b
    }
    for (sz <- Seq(0xFFFFFFF8L, 0xFFFFFFFFL, 0x80000000L, 0x7FFFFFFFL))
      assert(Multimodal.aviInfo(hostile(sz)).isEmpty, f"size 0x$sz%x")
    // a deep chain of nested LISTs must terminate (bounded sub-regions)
    val bomb = new java.io.ByteArrayOutputStream()
    bomb.write("RIFF".getBytes("US-ASCII"))
    val inner = 12 * 200
    bomb.write(Array[Byte]((inner & 0xFF).toByte, ((inner >> 8) & 0xFF).toByte, 0, 0))
    bomb.write("AVI ".getBytes("US-ASCII"))
    (0 until 200).foreach { i =>
      bomb.write("LIST".getBytes("US-ASCII"))
      val rest = inner - 12 * i - 8
      bomb.write(Array[Byte]((rest & 0xFF).toByte, ((rest >> 8) & 0xFF).toByte, 0, 0))
      bomb.write("recl".getBytes("US-ASCII"))
    }
    assert(Multimodal.aviInfo(bomb.toByteArray).isEmpty)
    // truncated movi: declared frame length past the payload is clamped
    val avi = Multimodal.syntheticAvi(7L)
    val cut = java.util.Arrays.copyOf(avi, avi.length - 40)
    Multimodal.aviInfo(cut).foreach { v =>
      v.frames.foreach { case (off, len) => assert(off + len <= cut.length) }
    }
  }

  test("undecodable and cross-type payloads yield null, never a crash") {
    import spark.implicits._
    val junk = Seq(Array[Byte](1, 2, 3), "not media".getBytes, Array.empty[Byte])
      .toDF("media")
    assert(Multimodal.imageMeta(junk, "media")
      .where(col("meta").isNotNull).count() == 0)
    assert(Multimodal.audioMeta(junk, "media")
      .where(col("audio_meta").isNotNull).count() == 0)
    // a WAV is not an image and vice versa
    val wav = Seq(1L).toDF("id")
    val mixed = Multimodal.syntheticMedia(wav, "id")
    assert(Multimodal.imageMeta(mixed, "media")
      .where(col("meta").isNotNull).count() == 0)
  }

  test("adversarial WAV chunk sizes: None, never a hang or a crash") {
    // valid RIFF/WAVE magic followed by a chunk whose 32-bit size would be
    // negative as an Int (0xFFFFFFF8 → -8, word-aligned): a signed walk
    // would stop advancing (infinite executor loop) or run backwards —
    // the unsigned long cursor must just skip past the end and give up
    def hostile(size: Long): Array[Byte] = {
      val b = new Array[Byte](64)
      def put(i: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(b, i)
      put(0, "RIFF"); put(8, "WAVE"); put(12, "junk")
      var v = size
      (0 until 4).foreach { i => b(16 + i) = (v & 0xFF).toByte; v >>= 8 }
      b
    }
    for (sz <- Seq(0xFFFFFFF8L, 0xFFFFFFFFL, 0x80000000L, 0x7FFFFFFFL))
      assert(Multimodal.wavInfo(hostile(sz)).isEmpty, f"size 0x$sz%x")
    // truncated data chunk: declared length past the payload is clamped,
    // frame math stays within the bytes actually present
    val tr = Multimodal.syntheticWav(3L)
    val cut = java.util.Arrays.copyOf(tr, tr.length - 100)
    val info = Multimodal.wavInfo(cut)
    assert(info.nonEmpty && info.get.dataOffset + info.get.dataLen <= cut.length)
    // a zero sample rate must not divide-by-zero in duration math
    val zr = tr.clone()
    (0 until 4).foreach(i => zr(24 + i) = 0) // fmt sample-rate field
    assert(Multimodal.wavInfo(zr).isEmpty)
  }
}
