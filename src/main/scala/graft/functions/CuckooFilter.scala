package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/**
 * A deletable approximate-membership filter (cuckoo filter, Fan/Andersen/
 * Kaminsky/Mitzenmacher, CoNEXT 2014 — public algorithm), the engine's
 * fallback to the Bloom filter when seen-set entries must be removable
 * (SURVEY.md §2.9 U4: the reference's reset-failures flow, cli.py:194-231,
 * re-opens previously-terminal URLs; a Bloom filter would need an O(seen)
 * rebuild, a cuckoo filter deletes the exact entries).
 *
 * Layout: `numBuckets` buckets × 4 slots × 16-bit fingerprints (fp 0 =
 * empty slot; real fingerprints are remapped to 1..65535). A key hashes to
 * bucket i1 = H(key) and alternate i2 = i1 ^ H(fp) — the XOR form lets any
 * stored (bucket, fp) pair recover its alternate without the key, which is
 * what makes both deletion and shard-merging possible.
 *
 * No false negatives EVER for inserted-and-not-deleted keys: `insert`
 * returns false instead of silently dropping when the kick chain exhausts
 * (caller must rebuild bigger — Crawler treats a failed insert as
 * "saturated" and rebuilds at 4× capacity).
 */
final class CuckooFilter private (val numBuckets: Int, private val slots: Array[Short])
    extends Serializable {

  import CuckooFilter._

  private var count: Long = 0L
  def cardinality: Long = count
  /** Nominal capacity at the design load factor (0.84 for 4-way buckets). */
  def capacity: Long = (numBuckets.toLong * SlotsPerBucket * 84L) / 100L

  @inline private def fingerprintOf(key: String): Int = {
    val h = SketchCodegen.hash64(org.apache.spark.unsafe.types.UTF8String.fromString(key))
    val fp = ((h >>> 48) & 0xFFFFL).toInt
    if (fp == 0) 1 else fp
  }
  @inline private def bucketOf(key: String): Int = {
    val h = SketchCodegen.hash64(org.apache.spark.unsafe.types.UTF8String.fromString(key))
    (h & (numBuckets - 1)).toInt
  }
  @inline private def altBucket(i: Int, fp: Int): Int = {
    // H(fp): any fixed avalanche of the fingerprint works; must only depend on fp
    val h = SketchCodegen.hash64(org.apache.spark.unsafe.types.UTF8String.fromString(fp.toString))
    (i ^ (h & (numBuckets - 1))).toInt
  }

  @inline private def slot(b: Int, s: Int): Int = slots(b * SlotsPerBucket + s) & 0xFFFF
  @inline private def setSlot(b: Int, s: Int, fp: Int): Unit =
    slots(b * SlotsPerBucket + s) = fp.toShort

  private def tryPlace(b: Int, fp: Int): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (slot(b, s) == 0) { setSlot(b, s, fp); return true }
      s += 1
    }
    false
  }

  private def bucketHas(b: Int, fp: Int): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (slot(b, s) == fp) return true
      s += 1
    }
    false
  }

  private def removeFrom(b: Int, fp: Int): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (slot(b, s) == fp) { setSlot(b, s, 0); return true }
      s += 1
    }
    false
  }

  /** Insert a raw (bucket, fingerprint) pair — the merge/kick primitive.
   * Deterministic kick victim choice (rotating slot by attempt) keeps the
   * filter state a pure function of the insertion sequence. */
  def insertFingerprint(i1: Int, fp0: Int): Boolean = {
    var b = i1
    var fp = fp0
    if (tryPlace(b, fp) || tryPlace(altBucket(b, fp), fp)) { count += 1; return true }
    var attempt = 0
    b = altBucket(b, fp)
    while (attempt < MaxKicks) {
      val victim = attempt % SlotsPerBucket
      val evicted = slot(b, victim)
      setSlot(b, victim, fp)
      fp = evicted
      b = altBucket(b, fp)
      if (tryPlace(b, fp)) { count += 1; return true }
      attempt += 1
    }
    // the exhausted kick chain leaves exactly one homeless fingerprint;
    // buffering it (with the bucket it was last evicted from — always one
    // of its two legal homes, the XOR pairing keeps that invariant along
    // the chain) preserves the no-false-negative contract for ANY number
    // of failed inserts until the caller rebuilds.
    orphanList += ((b, fp))
    count += 1
    false
  }

  // failed kick chains park their homeless fingerprints here; probed by
  // mightContain/delete and folded by mergeInPlace, so the filter NEVER
  // false-negatives an inserted key even past saturation. Non-empty ⇒
  // saturated (callers should rebuild bigger; Crawler does).
  private val orphanList = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
  def hasOrphans: Boolean = orphanList.nonEmpty

  def insert(key: String): Boolean = {
    val fp = fingerprintOf(key)
    val i1 = bucketOf(key)
    // MULTISET semantics (standard cuckoo-filter contract): every insert
    // stores a copy, even when an equal fingerprint is already present —
    // two DIFFERENT keys that collide must own one copy each, or deleting
    // one would false-negative the other. The seen-set use inserts each
    // key at most once (admission dedups), so copies stay bounded.
    insertFingerprint(i1, fp)
  }

  /** UTF8String-native probe (admission hot path): hashes the UTF-8 bytes
   * directly — hash-identical to the String form, which wraps the key in a
   * UTF8String anyway, but without the decode/encode round trip. */
  def mightContain(key: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    val h = SketchCodegen.hash64(key)
    val fp0 = ((h >>> 48) & 0xFFFFL).toInt
    val fp = if (fp0 == 0) 1 else fp0
    val i1 = (h & (numBuckets - 1)).toInt
    bucketHas(i1, fp) || bucketHas(altBucket(i1, fp), fp) || {
      orphanList.nonEmpty && {
        val i2 = altBucket(i1, fp)
        orphanList.exists { case (ob, ofp) => ofp == fp && (ob == i1 || ob == i2) }
      }
    }
  }

  def mightContain(key: String): Boolean = {
    val fp = fingerprintOf(key)
    val i1 = bucketOf(key)
    bucketHas(i1, fp) || bucketHas(altBucket(i1, fp), fp) || {
      // orphan bucket is always one of the fingerprint's two legal homes
      // (the XOR pairing is closed under kicking), so equality against the
      // key's own pair {i1, alt} is exact
      orphanList.nonEmpty && {
        val i2 = altBucket(i1, fp)
        orphanList.exists { case (ob, ofp) => ofp == fp && (ob == i1 || ob == i2) }
      }
    }
  }

  /** Remove one copy of the key's fingerprint. Returns false if absent.
   * Only delete keys known to have been inserted (standard cuckoo-filter
   * contract; deleting a never-inserted key could erase a colliding one). */
  def delete(key: String): Boolean =
    deleteFingerprint(bucketOf(key), fingerprintOf(key))

  /** Remove one copy of a raw (bucket, fingerprint) pair, probing both of
   * its legal homes and the orphan list — the shard-delete primitive.
   * `b` may be EITHER of the pair's two buckets (the XOR pairing is
   * closed, so {b, alt(b, fp)} is always the key's own pair). */
  def deleteFingerprint(b: Int, fp: Int): Boolean = {
    val b2 = altBucket(b, fp)
    val ok = removeFrom(b, fp) || removeFrom(b2, fp) || {
      val idx = orphanList.indexWhere { case (ob, ofp) => ofp == fp && (ob == b || ob == b2) }
      if (idx >= 0) { orphanList.remove(idx); true } else false
    }
    if (ok) count -= 1
    ok
  }

  /** Remove every fingerprint stored in `other` (a same-layout shard built
   * from the keys to delete) from this filter — the delete mirror of
   * [[mergeInPlace]]. Each shard slot holds its key's fingerprint in one
   * of the key's two legal buckets, which is exactly what
   * [[deleteFingerprint]] needs. Returns false if any fingerprint was
   * absent (deleting a never-inserted key — caller should rebuild). */
  def deleteAllFrom(other: CuckooFilter): Boolean = {
    require(other.numBuckets == numBuckets, "cuckoo shards must be same-sized")
    var b = 0
    var ok = true
    while (b < other.numBuckets) {
      var s = 0
      while (s < SlotsPerBucket) {
        val fp = other.slot(b, s)
        if (fp != 0) ok &= deleteFingerprint(b, fp)
        s += 1
      }
      b += 1
    }
    other.orphanList.foreach { case (ob, ofp) => ok &= deleteFingerprint(ob, ofp) }
    ok
  }

  /** Fold another same-sized filter's fingerprints (orphans included) into
   * this one (shard merge: per-partition shards → one broadcastable
   * filter). Overflow during the fold parks fingerprints on the orphan
   * list, so the merged filter still never false-negatives; it just
   * reports saturation via the return / hasOrphans. */
  def mergeInPlace(other: CuckooFilter): Boolean = {
    require(other.numBuckets == numBuckets, "cuckoo shards must be same-sized")
    var b = 0
    var ok = true
    while (b < other.numBuckets) {
      var s = 0
      while (s < SlotsPerBucket) {
        val fp = other.slot(b, s)
        if (fp != 0) ok &= insertFingerprint(b, fp)
        s += 1
      }
      b += 1
    }
    other.orphanList.foreach { case (ob, ofp) => ok &= insertFingerprint(ob, ofp) }
    ok
  }

  def serialize: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeInt(numBuckets)
    out.writeLong(count)
    out.writeInt(orphanList.size)
    orphanList.foreach { case (b, fp) => out.writeInt(b); out.writeInt(fp) }
    slots.foreach(out.writeShort(_))
    out.flush()
    bos.toByteArray
  }
}

object CuckooFilter {
  val SlotsPerBucket = 4
  val MaxKicks = 500
  private val Magic = 0x43554B32 // "CUK2" (v2: orphan list)

  /** Hard bucket ceiling: 2^28 buckets × 4 slots = 2^30 slots (the largest
   * power-of-two Short array that still leaves Int indexing headroom),
   * ≈ 901 M keys at the 0.84 design load. Beyond that a single-JVM
   * broadcast filter is the wrong tool anyway — shard the key space. */
  val MaxBuckets: Long = 1L << 28

  /** Smallest power-of-two bucket count whose 0.84-load capacity ≥ n. */
  def create(expectedInsertions: Long): CuckooFilter = {
    val needed = math.max(64L, (expectedInsertions * 100L) / (84L * SlotsPerBucket) + 1)
    var buckets = java.lang.Long.highestOneBit(needed)
    if (buckets < needed) buckets <<= 1
    require(buckets <= MaxBuckets,
      s"cuckoo filter too large: $expectedInsertions keys (ceiling ≈ 901M — shard instead)")
    new CuckooFilter(buckets.toInt, new Array[Short](buckets.toInt * SlotsPerBucket))
  }

  /** Exact-layout twin of an existing filter — delta shards built with this
   * are mergeInPlace-compatible with it. */
  def createWithBuckets(numBuckets: Int): CuckooFilter = {
    require(numBuckets > 0 && (numBuckets & (numBuckets - 1)) == 0 &&
      numBuckets <= MaxBuckets, s"bad bucket count $numBuckets")
    new CuckooFilter(numBuckets, new Array[Short](numBuckets * SlotsPerBucket))
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == Magic, "not a serialized cuckoo filter")
    val numBuckets = in.readInt()
    val count = in.readLong()
    val nOrphans = in.readInt()
    val orphans = (0 until nOrphans).map(_ => (in.readInt(), in.readInt()))
    val slots = new Array[Short](numBuckets * SlotsPerBucket)
    var i = 0
    while (i < slots.length) { slots(i) = in.readShort(); i += 1 }
    val f = new CuckooFilter(numBuckets, slots)
    f.count = count
    f.orphanList ++= orphans
    f
  }
}
