package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.io.ByteArrayInputStream

/**
 * Multimodal-column operators: media payloads ride as opaque `binary`
 * columns with typed metadata structs, partitioned/batched like any other
 * column (SURVEY.md §2 training-data additions).
 *
 * The codecs are REAL and pure-JVM — `javax.imageio` (PNG/JPEG/BMP/GIF
 * readers ship with the JDK) for images, a RIFF/fmt/data chunk parser
 * for WAV audio, `Graphics2D` for resampling — so decode, resize,
 * feature-extract and PCM sampling produce true values, golden-tested
 * against synthesized media in MultimodalSpec. VIDEO is covered on real
 * bytes too, within the same pure-JVM constraint: AVI is RIFF (the same
 * container walk as WAV) and an MJPEG stream's frames are plain JPEGs,
 * which ImageIO decodes — so [[videoMeta]]/[[videoFrameSample]] carry
 * the frame-sampling contract on an actual video container instead of
 * an audio stand-in. (General codecs — H.264 etc. — stay out of scope:
 * no JVM decoder exists offline.)
 *
 * Why Scala UDFs and not Catalyst expressions: codec work is per-row
 * imperative byte-stream decoding over an opaque payload — there is
 * nothing for codegen to fuse or for the optimizer to push down, and
 * the UDF boundary keeps the (CPU-heavy) codec outside the row-format
 * hot path exactly like the reference pipelines run their decoders.
 * All UDFs are null-safe: undecodable bytes yield null, never a crash.
 */
object Multimodal {

  // ---- real codecs (executor-side helpers) --------------------------------

  /** Image header decode via ImageIO: (format, width, height) without a
   * full pixel decode (readers parse only the header for dimensions). */
  private[graft] def imageHeader(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    if (bytes == null || bytes.length == 0) return None
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          Some((r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0)))
        } finally r.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally in.close()
  }

  private[graft] def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Parsed WAV header + location of the PCM payload. */
  private[graft] case class WavInfo(sampleRate: Int, channels: Int,
      bitsPerSample: Int, nFrames: Long, dataOffset: Int, dataLen: Int)

  /** RIFF/WAVE chunk walk (PCM only — format tag 1). Pure arithmetic over
   * UNTRUSTED bytes: chunk sizes stay unsigned longs (a 32-bit size read
   * as Int could go negative and stall or reverse the walk), the cursor is
   * a strictly-increasing long so a hostile size can neither loop nor
   * overflow it, the data length is clamped to the payload actually
   * present, and any residual decode surprise is caught — undecodable
   * bytes yield None, never a crash or a hung task. */
  private[graft] def wavInfo(b: Array[Byte]): Option[WavInfo] = try {
    def u16(i: Int) = ((b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8))
    def u32(i: Int) = ((b(i) & 0xFF).toLong | ((b(i + 1) & 0xFF).toLong << 8) |
      ((b(i + 2) & 0xFF).toLong << 16) | ((b(i + 3) & 0xFF).toLong << 24))
    def tag(i: Int) = new String(b, i, 4, "US-ASCII")
    if (b == null || b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12L // long cursor: advances by >= 8 per chunk, can't wrap
    var fmt: Option[(Int, Int, Int)] = None // rate, channels, bits
    var data: Option[(Int, Int)] = None     // offset, len
    while (pos + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val p = pos.toInt // safe: pos + 8 <= b.length <= Int.MaxValue
      val id = tag(p)
      val sz = u32(p + 4) // unsigned: [0, 2^32)
      if (id == "fmt " && p + 24 <= b.length && u16(p + 8) == 1)
        fmt = Some((u32(p + 12).toInt, u16(p + 10), u16(p + 22)))
      else if (id == "data")
        data = Some((p + 8, math.max(0L, math.min(sz, b.length.toLong - p - 8)).toInt))
      pos += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    for ((rate, ch, bits) <- fmt; (off, len) <- data
         if ch > 0 && bits > 0 && ch * bits / 8 > 0 && rate > 0)
      yield WavInfo(rate, ch, bits, len.toLong / (ch * bits / 8), off, len)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Parsed AVI (MJPEG) header + movi-chunk locations of the frames. */
  private[graft] case class AviInfo(width: Int, height: Int, usPerFrame: Long,
      frames: Seq[(Int, Int)]) // (offset, len) of each '00dc' JPEG payload

  /** RIFF/AVI container walk (MJPEG video). Same hardening discipline as
   * [[wavInfo]] — it IS the same RIFF grammar, just with nested LISTs:
   * chunk sizes stay unsigned longs, every region cursor is strictly
   * increasing (so hostile sizes can neither loop nor reverse the walk),
   * payload lengths are clamped to the bytes actually present, nested
   * LIST regions are bounded by their parent, and any residual surprise
   * is caught — undecodable bytes yield None, never a crash or a hang. */
  private[graft] def aviInfo(b: Array[Byte]): Option[AviInfo] = try {
    def u32(i: Int) = ((b(i) & 0xFF).toLong | ((b(i + 1) & 0xFF).toLong << 8) |
      ((b(i + 2) & 0xFF).toLong << 16) | ((b(i + 3) & 0xFF).toLong << 24))
    def tag(i: Int) = new String(b, i, 4, "US-ASCII")
    if (b == null || b.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var width = 0
    var height = 0
    var usPerFrame = 0L
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    // (pos, limit) region stack: a LIST pushes its payload as a sub-region
    var stack = List((12L, math.min(b.length.toLong, 8L + u32(4))))
    while (stack.nonEmpty) {
      val (pos, limit) = stack.head
      if (pos + 8 > limit) stack = stack.tail
      else {
        val p = pos.toInt // safe: pos + 8 <= limit <= b.length <= Int.MaxValue
        val id = tag(p)
        val sz = u32(p + 4) // unsigned: [0, 2^32)
        stack = (pos + 8 + sz + (sz & 1), limit) :: stack.tail // advance, word-aligned
        if (id == "LIST" && pos + 12 <= limit)
          stack = (pos + 12, math.min(limit, pos + 8 + sz)) :: stack // descend
        else if (id == "avih" && p + 48 <= b.length) {
          usPerFrame = u32(p + 8) // dwMicroSecPerFrame
          width = u32(p + 40).toInt // dwWidth / dwHeight of the main header
          height = u32(p + 44).toInt
        } else if ((id == "00dc" || id == "00db") && sz > 0) {
          val len = math.max(0L, math.min(sz, b.length.toLong - p - 8)).toInt
          if (len > 0) frames += ((p + 8, len))
        }
      }
    }
    if (width > 0 && height > 0 && frames.nonEmpty)
      Some(AviInfo(width, height, math.max(usPerFrame, 1L), frames.toSeq))
    else None
  } catch { case scala.util.control.NonFatal(_) => None }

  // ---- image operators ----------------------------------------------------

  /** DECODE: binary → struct(format, width, height, n_bytes) from the real
   * image header; null for undecodable payloads. */
  def imageMeta(df: DataFrame, binCol: String, out: String = "meta"): DataFrame = {
    val u = udf((b: Array[Byte]) =>
      imageHeader(b).map { case (f, w, h) => (f, w, h, b.length.toLong) })
    df.withColumn(out, u(col(binCol)))
      .withColumn(out, col(out).cast(
        "struct<format:string,width:int,height:int,n_bytes:bigint>"))
  }

  /** RESIZE: full decode → Graphics2D bilinear resample so the longest
   * side is ≤ maxSide (never upscales) → PNG re-encode. Returns
   * struct(bytes, width, height); null when the payload doesn't decode. */
  def resizeImage(df: DataFrame, binCol: String, maxSide: Int,
                  out: String = "resized"): DataFrame = {
    val u = udf((b: Array[Byte]) => readImage(b).map { img =>
      val scale = math.min(1.0, maxSide.toDouble / math.max(img.getWidth, img.getHeight))
      val (w, h) = (math.max(1, math.floor(img.getWidth * scale).toInt),
        math.max(1, math.floor(img.getHeight * scale).toInt))
      val dst = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", bos)
      (bos.toByteArray, w, h)
    })
    df.withColumn(out, u(col(binCol)))
      .withColumn(out, col(out).cast("struct<bytes:binary,width:int,height:int>"))
  }

  /** FEATURE-EXTRACT: full decode → `bins`-bucket luminance histogram
   * (L1-normalized) + mean luminance appended — a real array<double>
   * feature vector for the similarity/dedup operators downstream. */
  def imageFeatures(df: DataFrame, binCol: String, bins: Int = 16,
                    out: String = "features"): DataFrame = {
    val u = udf((b: Array[Byte]) => readImage(b).map { img =>
      val hist = new Array[Double](bins)
      var sum = 0.0
      val n = img.getWidth * img.getHeight
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = (0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
            0.114 * (rgb & 0xFF)) / 255.0
          hist(math.min(bins - 1, (lum * bins).toInt)) += 1.0
          sum += lum
          x += 1
        }
        y += 1
      }
      hist.map(_ / n) :+ (sum / n)
    })
    df.withColumn(out, u(col(binCol)))
  }

  // ---- audio operators ----------------------------------------------------

  /** AUDIO DECODE: binary → struct(format, sample_rate, channels, bits,
   * n_frames, duration_ms) from the real RIFF header. */
  def audioMeta(df: DataFrame, binCol: String, out: String = "audio_meta"): DataFrame = {
    val u = udf((b: Array[Byte]) => wavInfo(b).map(w =>
      ("wav", w.sampleRate, w.channels, w.bitsPerSample, w.nFrames,
        w.nFrames * 1000L / w.sampleRate)))
    df.withColumn(out, u(col(binCol)))
      .withColumn(out, col(out).cast("struct<format:string,sample_rate:int," +
        "channels:int,bits:int,n_frames:bigint,duration_ms:bigint>"))
  }

  /** FRAME-SAMPLE: every k-th PCM frame's first-channel amplitude,
   * normalized to [-1, 1] — the real form of the video-frame-sampling
   * contract (array<double>, explode-ready), on the one media type the
   * JVM can decode without external codecs. */
  def audioSample(df: DataFrame, binCol: String, everyK: Int,
                  out: String = "samples"): DataFrame = {
    require(everyK > 0)
    val u = udf((b: Array[Byte]) => wavInfo(b).filter(_.bitsPerSample == 16).map { w =>
      val frameBytes = w.channels * 2
      val n = (w.nFrames / everyK).toInt + (if (w.nFrames % everyK > 0) 1 else 0)
      val res = new Array[Double](n)
      var i = 0
      while (i < n) {
        val off = w.dataOffset + i * everyK * frameBytes
        val s = ((b(off) & 0xFF) | (b(off + 1) << 8)).toShort
        res(i) = s / 32768.0
        i += 1
      }
      res
    })
    df.withColumn(out, u(col(binCol)))
  }

  // ---- video operators (AVI/MJPEG — pure JVM: RIFF walk + ImageIO) --------

  /** VIDEO DECODE: binary → struct(format, width, height, n_frames,
   * duration_ms) from the real AVI main header + movi chunk walk. */
  def videoMeta(df: DataFrame, binCol: String, out: String = "video_meta"): DataFrame = {
    val u = udf((b: Array[Byte]) => aviInfo(b).map(v =>
      ("avi", v.width, v.height, v.frames.length.toLong,
        v.frames.length * v.usPerFrame / 1000L)))
    df.withColumn(out, u(col(binCol)))
      .withColumn(out, col(out).cast("struct<format:string,width:int,height:int," +
        "n_frames:bigint,duration_ms:bigint>"))
  }

  /** FRAME-SAMPLE on real video: every k-th MJPEG frame is genuinely
   * decoded (ImageIO) and summarized as (idx, width, height, mean_luma) —
   * the video form of the frame-sampling contract, explode-ready. Frames
   * whose bytes don't decode are skipped, never a crash. */
  def videoFrameSample(df: DataFrame, binCol: String, everyK: Int,
                       out: String = "frames"): DataFrame = {
    require(everyK > 0)
    val u = udf((b: Array[Byte]) => aviInfo(b).map { v =>
      v.frames.zipWithIndex.collect { case ((off, len), idx) if idx % everyK == 0 =>
        readImage(java.util.Arrays.copyOfRange(b, off, off + len)).map { img =>
          var sum = 0.0
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sum += (0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
                0.114 * (rgb & 0xFF)) / 255.0
              x += 1
            }
            y += 1
          }
          (idx, img.getWidth, img.getHeight, sum / (img.getWidth * img.getHeight))
        }
      }.flatten
    })
    df.withColumn(out, u(col(binCol)))
      .withColumn(out, col(out).cast(
        "array<struct<idx:int,width:int,height:int,mean_luma:double>>"))
  }

  // ---- deterministic real-media synthesis (fixtures + q_media_pipeline) ---

  /** A real PNG with deterministic dimensions and pixel content derived
   * from the seed (encoded by the same ImageIO stack that decodes it). */
  def syntheticPng(seed: Long): Array[Byte] = {
    val w = 16 + (Math.floorMod(seed, 32L)).toInt
    val h = 16 + (Math.floorMod(seed * 7 + 3, 32L)).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var v = seed * 6364136223846793005L + (x * 31 + y) * 1442695040888963407L
        v ^= (v >>> 29)
        img.setRGB(x, y, (v & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A real 16-bit mono PCM WAV (8 kHz) carrying a seed-determined sine
   * tone; length varies with the seed. */
  def syntheticWav(seed: Long): Array[Byte] = {
    val rate = 8000
    val nFrames = 256 + Math.floorMod(seed, 256L).toInt
    val freq = 200.0 + Math.floorMod(seed * 13, 1800L)
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = (math.sin(2 * math.Pi * freq * i / rate) * 12000).toShort
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    def le32(v: Int): Unit = { o.write(v & 0xFF); o.write((v >> 8) & 0xFF)
      o.write((v >> 16) & 0xFF); o.write((v >> 24) & 0xFF) }
    def le16(v: Int): Unit = { o.write(v & 0xFF); o.write((v >> 8) & 0xFF) }
    o.writeBytes("RIFF"); le32(36 + data.length); o.writeBytes("WAVE")
    o.writeBytes("fmt "); le32(16); le16(1); le16(1); le32(rate)
    le32(rate * 2); le16(2); le16(16)
    o.writeBytes("data"); le32(data.length); o.write(data)
    bos.toByteArray
  }

  /** A real MJPEG-in-AVI video: RIFF(hdrl(avih, strl(strh 'vids'/'MJPG',
   * strf BITMAPINFOHEADER)), movi('00dc' JPEG frames)) at 25 fps, frame
   * pixels seed- and frame-index-determined, JPEG-encoded by the same
   * ImageIO stack that decodes them. */
  def syntheticAvi(seed: Long): Array[Byte] = {
    val w = 16 + Math.floorMod(seed * 3, 24L).toInt
    val h = 16 + Math.floorMod(seed * 5 + 1, 24L).toInt
    val nFrames = 3 + Math.floorMod(seed, 5L).toInt
    val usPerFrame = 40000 // 25 fps
    val jpegs = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var v = (seed * 31 + f) * 6364136223846793005L +
            (x * 31 + y) * 1442695040888963407L
          v ^= (v >>> 29)
          img.setRGB(x, y, (v & 0xFFFFFF).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def le16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def ascii(s: String) = s.getBytes("US-ASCII")
    def chunk(id: String, payload: Array[Byte]): Array[Byte] =
      ascii(id) ++ le32(payload.length) ++ payload ++
        (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(kind: String, payload: Array[Byte]): Array[Byte] =
      ascii("LIST") ++ le32(payload.length + 4) ++ ascii(kind) ++ payload
    val avih = chunk("avih", le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(nFrames) ++ le32(0) ++ le32(1) ++ le32(0) ++ le32(w) ++ le32(h) ++
      new Array[Byte](16))
    val strh = chunk("strh", ascii("vids") ++ ascii("MJPG") ++ le32(0) ++
      le32(0) ++ le32(0) ++ le32(1) ++ le32(25) ++ le32(0) ++ le32(nFrames) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = chunk("strf", le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++
      le16(24) ++ ascii("MJPG") ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", jpegs.flatMap(j => chunk("00dc", j)).toArray)
    val body = ascii("AVI ") ++ hdrl ++ movi
    ascii("RIFF") ++ le32(body.length) ++ body
  }

  /** Attach deterministic REAL media bytes (PNG for even seeds, WAV for
   * odd) derived from an id column — the fixture generator used by
   * q_media_pipeline and the specs. */
  def syntheticMedia(df: DataFrame, id: String, out: String = "media"): DataFrame = {
    val u = udf((seed: Long) =>
      if (seed % 2 == 0) syntheticPng(seed) else syntheticWav(seed))
    df.withColumn(out, u(col(id).cast("long")))
  }

  /** Three-way fixture: PNG / WAV / MJPEG-AVI round-robin by id — the
   * full-modality generator behind q_media_pipeline. */
  def syntheticMedia3(df: DataFrame, id: String, out: String = "media"): DataFrame = {
    val u = udf((seed: Long) => Math.floorMod(seed, 3L) match {
      case 0L => syntheticPng(seed)
      case 1L => syntheticWav(seed)
      case _ => syntheticAvi(seed)
    })
    df.withColumn(out, u(col(id).cast("long")))
  }
}
