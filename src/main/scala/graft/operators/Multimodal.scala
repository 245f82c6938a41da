package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media payloads ride as opaque `binary`
 * columns with typed metadata structs, partitioned/batched like any other
 * column; decode / feature-extract / resize / frame-sample are expressed
 * as per-row transforms over the binary payload.
 *
 * STUB NOTE: no image/audio codecs exist in this container, so the decode
 * step is a clearly-marked deterministic fake — it derives metadata from
 * the byte stream itself (magic prefix + length + byte checksums) instead
 * of a real codec. The Spark-side contract (schema, nullability, batch
 * shape, partition behavior) is real and tested; swapping in a real codec
 * means replacing only the arithmetic inside `decodeMeta`/`frameSample`.
 */
object Multimodal {

  /** Synthesize a deterministic binary media column from a seed column —
   * stands in for real image/audio bytes in fixtures and benches. */
  def fakeMediaBytes(df: DataFrame, id: String): DataFrame =
    df.withColumn("media", to_binary(
      concat(lit("89504e47"), // PNG magic, hex
        lpad(hex(xxhash64(col(id))), 16, "0"),
        repeat(lpad(hex(pmod(xxhash64(col(id), lit(7)), lit(256))), 2, "0"),
          pmod(col(id).cast("long"), lit(64)).cast("int") + 8)), lit("hex")))

  /** DECODE (STUB): binary → struct(format, width, height, n_bytes).
   * A real build decodes headers; the fake derives the same struct shape
   * deterministically from the bytes. */
  def decodeMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("meta", struct(
      when(hex(substring(col(binCol), 1, 4)) === "3839353034453437", lit("png"))
        .otherwise(lit("bin")).as("format"),
      (pmod(xxhash64(col(binCol)), lit(512)) + 16).cast("int").as("width"),
      (pmod(xxhash64(col(binCol), lit(1)), lit(512)) + 16).cast("int").as("height"),
      length(col(binCol)).cast("long").as("n_bytes")))

  /** RESIZE (STUB): scales the fake metadata, keeping aspect ratio —
   * exercises the nested-struct rewrite path. */
  def resize(df: DataFrame, metaCol: String, maxSide: Int): DataFrame = {
    val m = col(metaCol)
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(m("width"), m("height")).cast("double"))
    df.withColumn("resized", struct(
      m("format").as("format"),
      floor(m("width") * scale).cast("int").as("width"),
      floor(m("height") * scale).cast("int").as("height"),
      m("n_bytes").as("n_bytes")))
  }

  /** FRAME-SAMPLE (STUB): every k-th "frame offset" of a fake video
   * payload as array<long> — the explode-ready shape a real sampler has. */
  def frameSample(df: DataFrame, binCol: String, everyK: Int): DataFrame =
    df.withColumn("frame_offsets",
      transform(
        sequence(lit(0L), greatest((length(col(binCol)) / everyK - 1).cast("long"), lit(0L))),
        i => i * everyK))
}
