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
 * must never occur (both impls guarantee it).
 *
 * Maintained INCREMENTALLY: each round adds only that round's admitted
 * URLs — O(adds), never an O(seen) rebuild — and the serialized sketch is
 * checkpointed with the round snapshot ("seen-filter shards" in
 * BASELINE.json:north_star), so a resume reloads it instead of rebuilding.
 * When a sketch saturates (Bloom past its sized capacity / cuckoo insert
 * failure) the crawler rebuilds at 4× from the seen table — amortized
 * O(seen) over the whole crawl, like a growable array.
 *
 *  - [[BloomSeen]]: default; smallest per-key footprint.
 *  - [[CuckooSeen]]: deletable (reset-failures "forget" flow, SURVEY §2.3
 *    D4); slightly larger, supports exact removal of admitted entries.
 */
sealed trait SeenSketch extends Serializable {
  def mightContain(url: String): Boolean
  /** Add one URL. Returns false when saturated (caller must rebuild). */
  def add(url: String): Boolean
  /** Remove a previously-added URL; false if unsupported (Bloom). */
  def delete(url: String): Boolean
  def cardinality: Long
  def capacity: Long
  def saturated: Boolean = cardinality >= capacity
  def kind: String
  def serialize: Array[Byte]
}

final class BloomSeen(val filter: BloomFilter, val capacity: Long,
                      private var count: Long) extends SeenSketch {
  def mightContain(url: String): Boolean = filter.mightContainString(url)
  def add(url: String): Boolean = { filter.putString(url); count += 1; count <= capacity }
  def delete(url: String): Boolean = false
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
  def add(url: String): Boolean = { ok &= filter.insert(url); ok }
  def delete(url: String): Boolean = filter.delete(url)
  def cardinality: Long = filter.cardinality
  def capacity: Long = filter.capacity
  override def saturated: Boolean = !ok || super.saturated
  private[functions] def markSaturated(): Unit = ok = false
  def kind: String = "cuckoo"
  def serialize: Array[Byte] = filter.serialize
}

object SeenSketch {

  def empty(kind: String, capacity: Long): SeenSketch = kind match {
    case "cuckoo" => new CuckooSeen(CuckooFilter.create(capacity))
    case _ => new BloomSeen(BloomFilter.create(capacity, 0.01), capacity, 0L)
  }

  /** kind byte + payload, so a snapshot blob self-describes. */
  def serialize(s: SeenSketch): Array[Byte] = {
    val payload = s.serialize
    val out = new Array[Byte](payload.length + 1)
    out(0) = if (s.kind == "cuckoo") 1 else 0
    System.arraycopy(payload, 0, out, 1, payload.length)
    out
  }

  def deserialize(bytes: Array[Byte]): SeenSketch = {
    val payload = java.util.Arrays.copyOfRange(bytes, 1, bytes.length)
    if (bytes(0) == 1) new CuckooSeen(CuckooFilter.deserialize(payload))
    else {
      val in = new java.io.DataInputStream(new ByteArrayInputStream(payload))
      val capacity = in.readLong()
      val count = in.readLong()
      new BloomSeen(BloomFilter.readFrom(in), capacity, count)
    }
  }

  /** Distributed full (re)build from a one-string-column DataFrame:
   * per-partition shards, merged on the driver, ready to broadcast
   * (the north rule's "broadcast-merged" pattern). Bloom shards merge via
   * mergeInPlace; cuckoo shards fold fingerprints bucket-wise. */
  def build(urls: DataFrame, column: String, kind: String, capacity: Long): SeenSketch = {
    val spark = urls.sparkSession
    import spark.implicits._
    val ds = urls.select(column).as[String]
    kind match {
      case "cuckoo" =>
        val shards = ds.mapPartitions { it =>
          val f = CuckooFilter.create(capacity)
          var full = true
          it.foreach(u => full &= f.insert(u))
          if (full) Iterator.single(f.serialize) else Iterator.single(Array.empty[Byte])
        }.collect()
        val merged = CuckooFilter.create(capacity)
        var ok = true
        shards.foreach { b =>
          if (b.isEmpty) ok = false
          else ok &= merged.mergeInPlace(CuckooFilter.deserialize(b))
        }
        val out = new CuckooSeen(merged)
        if (!ok) out.markSaturated() // caller rebuilds bigger
        out
      case _ =>
        val bf = urls.stat.bloomFilter(column, capacity, 0.01)
        new BloomSeen(bf, capacity, urls.count())
    }
  }
}
