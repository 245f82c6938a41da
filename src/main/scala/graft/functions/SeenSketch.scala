package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.util.sketch.BloomFilter
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/**
 * The URL-seen prefilter (SURVEY.md §2.3 D1 at 10^10 scale): a broadcast
 * approximate-membership sketch over canonical URLs that lets the
 * candidate→seen anti-join skip sketch-negative candidates entirely.
 * Sketch-positive candidates are ALWAYS exactly re-checked against the
 * seen table, so false positives can never drop URLs; false negatives
 * must never occur (both impls guarantee it — a SATURATED sketch keeps
 * answering correctly, it just stops being allowed to serve as the
 * admission prefilter until rebuilt: Crawler checks `saturated` before
 * engaging it and rebuilds at growing capacity until healthy).
 *
 * Maintained INCREMENTALLY and DISTRIBUTED: each round builds a compatible
 * delta sketch from that round's admitted URLs as per-partition shards
 * (executor-side), merges the shards into the running sketch on the driver
 * ([[SeenSketch.addAll]]) — O(adds) work spread over the cluster, never a
 * driver-side per-row loop — and checkpoints the serialized sketch with the
 * round snapshot ("seen-filter shards" in BASELINE.json:north_star), so a
 * resume reloads it instead of rebuilding.
 *
 *  - [[BloomSeen]]: default; smallest per-key footprint.
 *  - [[CuckooSeen]]: deletable (reset-failures "forget" flow, SURVEY §2.3
 *    D4); slightly larger, supports exact removal of admitted entries.
 */
sealed trait SeenSketch extends Serializable {
  def mightContain(url: String): Boolean
  /** UTF8String-native probe for the codegen'd admission prefilter
   * (SketchContains): hash-identical to the String form — both hash the
   * key's UTF-8 bytes — but skips the per-row decode to String (the probe
   * runs 10^7+ times per scheduling round). */
  def mightContain(url: org.apache.spark.unsafe.types.UTF8String): Boolean
  /** Add one URL. Returns false when saturated (caller must rebuild). */
  def add(url: String): Boolean
  /** Remove a previously-added URL; false if unsupported (Bloom). */
  def delete(url: String): Boolean
  /** Fold a same-shape delta sketch into this one. Returns !saturated. */
  def merge(other: SeenSketch): Boolean
  def cardinality: Long
  def capacity: Long
  def saturated: Boolean = cardinality >= capacity
  def kind: String
  def serialize: Array[Byte]
}

final class BloomSeen(val filter: BloomFilter, val capacity: Long,
                      private var count: Long) extends SeenSketch {
  def mightContain(url: String): Boolean = filter.mightContainString(url)
  // mightContainString == mightContainBinary(utf8 bytes) in Spark's
  // BloomFilterImpl, so probing the UTF8String's own bytes is exact
  def mightContain(url: org.apache.spark.unsafe.types.UTF8String): Boolean =
    filter.mightContainBinary(url.getBytes)
  def add(url: String): Boolean = { filter.putString(url); count += 1; count <= capacity }
  def delete(url: String): Boolean = false
  def merge(other: SeenSketch): Boolean = other match {
    case b: BloomSeen =>
      filter.mergeInPlace(b.filter) // throws on shape mismatch — addAll builds compatible deltas
      count += b.cardinality
      !saturated
    case _ => throw new IllegalArgumentException("cannot merge cuckoo into bloom")
  }
  def cardinality: Long = count
  def kind: String = "bloom"
  def serialize: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(capacity)
    out.writeLong(count)
    filter.writeTo(out)
    out.flush()
    bos.toByteArray
  }
}

final class CuckooSeen(val filter: CuckooFilter) extends SeenSketch {
  private var ok = true
  def mightContain(url: String): Boolean = filter.mightContain(url)
  def mightContain(url: org.apache.spark.unsafe.types.UTF8String): Boolean =
    filter.mightContain(url)
  def add(url: String): Boolean = { ok &= filter.insert(url); ok }
  def delete(url: String): Boolean = filter.delete(url)
  def merge(other: SeenSketch): Boolean = other match {
    case c: CuckooSeen =>
      ok &= filter.mergeInPlace(c.filter) && !c.saturated
      ok
    case _ => throw new IllegalArgumentException("cannot merge bloom into cuckoo")
  }
  def cardinality: Long = filter.cardinality
  def capacity: Long = filter.capacity
  override def saturated: Boolean = !ok || filter.hasOrphans || super.saturated
  private[functions] def markSaturated(): Unit = ok = false
  def kind: String = "cuckoo"
  def serialize: Array[Byte] = filter.serialize
}

object SeenSketch {

  def empty(kind: String, capacity: Long): SeenSketch = kind match {
    case "cuckoo" => new CuckooSeen(CuckooFilter.create(capacity))
    case _ => new BloomSeen(BloomFilter.create(capacity, 0.01), capacity, 0L)
  }

  /** Outer-encoding magic + version ("GSK" + version byte). Version 2 =
   * kind byte + saturation byte + payload. Bump on ANY layout change: a
   * pre-versioning blob deserialized at the wrong offset yields garbage
   * capacity/count values with no error, which is strictly worse than
   * failing fast. Old snapshots are NOT supported at the blob level;
   * resume from them still works — Crawler's restore paths treat an
   * unreadable blob exactly like a missing one and rebuild the sketch
   * from the seen table (the sketch is reconstructible state). */
  private val Magic: Array[Byte] = Array('G', 'S', 'K', 2)

  /** magic/version + kind byte + saturation byte + payload, so a snapshot
   * blob self-describes AND a saturated sketch stays saturated across a
   * serialize/deserialize round-trip (a reloaded saturated sketch must not
   * be re-trusted as an admission prefilter). */
  def serialize(s: SeenSketch): Array[Byte] = {
    val payload = s.serialize
    val out = new Array[Byte](payload.length + 6)
    System.arraycopy(Magic, 0, out, 0, 4)
    out(4) = if (s.kind == "cuckoo") 1 else 0
    out(5) = if (s.saturated) 1 else 0
    System.arraycopy(payload, 0, out, 6, payload.length)
    out
  }

  def deserialize(bytes: Array[Byte]): SeenSketch = {
    require(bytes.length > 6 && bytes(0) == 'G' && bytes(1) == 'S' &&
      bytes(2) == 'K' && bytes(3) == Magic(3),
      "unsupported seen_sketch blob (missing/old GSK version header): " +
        "snapshots from pre-v2 builds are not readable — delete the blob " +
        "to force a rebuild from the seen table, or re-crawl")
    val payload = java.util.Arrays.copyOfRange(bytes, 6, bytes.length)
    val sat = bytes(5) == 1
    if (bytes(4) == 1) {
      val c = new CuckooSeen(CuckooFilter.deserialize(payload))
      if (sat) c.markSaturated()
      c
    } else {
      val in = new java.io.DataInputStream(new ByteArrayInputStream(payload))
      val capacity = in.readLong()
      val count = in.readLong()
      // bloom saturation is count-derived, so the flag needs no extra state
      new BloomSeen(BloomFilter.readFrom(in), capacity, count)
    }
  }

  /** Distributed full (re)build from a one-string-column DataFrame:
   * per-partition shards built executor-side, merged on the driver, ready
   * to broadcast (the north rule's "broadcast-merged" pattern). Bloom
   * shards merge via mergeInPlace; cuckoo shards fold fingerprints
   * bucket-wise (orphans preserved, so an overflowed shard never drops
   * keys — the merged sketch just reports saturated). */
  def build(urls: DataFrame, column: String, kind: String, capacity: Long): SeenSketch = {
    kind match {
      case "cuckoo" =>
        val out = new CuckooSeen(CuckooFilter.create(capacity))
        mergeCuckooShards(out, urls, column)
        out
      case _ =>
        // stat.bloomFilter NPEs on zero rows (null aggregate buffer) — a
        // seedless/fully-seen input must yield an empty sketch, not a crash
        val n = urls.count()
        if (n == 0) empty("bloom", capacity)
        else new BloomSeen(urls.stat.bloomFilter(column, capacity, 0.01), capacity, n)
    }
  }

  /** Incremental distributed add (the per-round hot path): build a delta
   * sketch from `urls` with the SAME shape as `sketch` — per-partition
   * shards on the executors — and fold it into `sketch` on the driver.
   * O(count) total work, parallel across the cluster; the driver touches
   * only fixed-size shard blobs, never rows. `count` is the (already
   * known) row count, so no extra counting job runs. Returns !saturated. */
  def addAll(sketch: SeenSketch, urls: DataFrame, column: String, count: Long): Boolean =
    sketch match {
      case b: BloomSeen =>
        // spark's stat.bloomFilter is itself a treeAggregate shard build;
        // same (expectedNumItems, fpp) ⇒ mergeInPlace-compatible layout.
        // Zero-row delta: stat.bloomFilter NPEs on an empty frame, and an
        // empty round (seedless submit, all candidates already seen) is
        // a legal no-op — skip the delta build entirely.
        if (count == 0) !b.saturated
        else {
          val delta = urls.stat.bloomFilter(column, b.capacity, 0.01)
          b.merge(new BloomSeen(delta, b.capacity, count))
        }
      case c: CuckooSeen =>
        mergeCuckooShards(c, urls, column)
        !c.saturated
    }

  /** Distributed delete (the reset-failures "forget" flow at scale):
   * shard-build a same-layout cuckoo filter from the URLs to remove —
   * per-partition, executor-side — and subtract each shard from `sketch`
   * on the driver (one shard in memory at a time). The exact mirror of
   * [[addAll]]; retires the last per-row driver loop the engine had.
   * Returns false when unsupported (Bloom — not deletable) or when any
   * entry was absent (caller should rebuild from the shrunken seen set). */
  def deleteAll(sketch: SeenSketch, urls: DataFrame, column: String): Boolean =
    sketch match {
      case c: CuckooSeen =>
        val shards = cuckooShards(urls, column, c.filter.numBuckets)
        var ok = true
        while (shards.hasNext)
          ok &= c.filter.deleteAllFrom(CuckooFilter.deserialize(shards.next()))
        ok
      case _ => false
    }

  /** Executor-side same-layout cuckoo shards over a URL column, streamed
   * to the driver one blob at a time. Input is coalesced to
   * [[MaxCuckooShards]] partitions first — each shard is a full twin
   * layout of the main filter, so unbounded partition counts would ship
   * O(partitions × filter_size) bytes for what is a small delta. */
  private def cuckooShards(urls: DataFrame, column: String, nb: Int): Iterator[Array[Byte]] = {
    val spark = urls.sparkSession
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    urls.select(column).coalesce(MaxCuckooShards).as[String].mapPartitions { it =>
      val f = CuckooFilter.createWithBuckets(nb)
      it.foreach(f.insert)
      // empty shards carry no information — skip the blob
      if (f.cardinality > 0) Iterator.single(f.serialize) else Iterator.empty
    }.toLocalIterator().asScala
  }

  /** Ceiling on per-call cuckoo shard count: each shard is a full-capacity
   * twin layout of the main filter (mergeable layouts must match), so with
   * P input partitions a round would ship P × filter_size bytes regardless
   * of how few URLs were added. Per-round adds are small relative to the
   * filter, so a handful of build tasks is plenty of parallelism. */
  val MaxCuckooShards = 8

  /** Shard-build cuckoo filters per partition (layout-compatible with
   * `into`) and fold them into `into` on the driver — via toLocalIterator,
   * so the driver holds ONE shard blob at a time, never all of them. */
  private def mergeCuckooShards(into: CuckooSeen, urls: DataFrame, column: String): Unit = {
    val shards = cuckooShards(urls, column, into.filter.numBuckets)
    while (shards.hasNext)
      into.merge(new CuckooSeen(CuckooFilter.deserialize(shards.next())))
  }
}
