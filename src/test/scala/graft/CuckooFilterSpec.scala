package graft

import graft.functions.{CuckooFilter, SeenSketch}
import org.scalatest.funsuite.AnyFunSuite

/**
 * U4 (SURVEY.md §2.9): the deletable seen-filter. Contract under test:
 * NO false negatives ever for live (inserted-and-not-deleted) keys —
 * a false negative would silently drop a URL from the crawl; false
 * positives are fine (the engine exactly re-checks against the seen
 * table). Deletion must restore "unseen" for the deleted key without
 * evicting any other live key.
 */
class CuckooFilterSpec extends AnyFunSuite {

  private def keys(n: Int, tag: String): Seq[String] =
    (0 until n).map(i => s"https://h-$tag.example.test/p/$i")

  test("inserted keys are always found (no false negatives)") {
    val f = CuckooFilter.create(10000)
    val ks = keys(8000, "a")
    ks.foreach(k => assert(f.insert(k), s"insert failed below capacity: $k"))
    ks.foreach(k => assert(f.mightContain(k), s"false negative: $k"))
  }

  test("false positive rate is small on disjoint keys") {
    val f = CuckooFilter.create(10000)
    keys(8000, "a").foreach(f.insert)
    val fps = keys(10000, "b").count(f.mightContain)
    // 16-bit fingerprints, 2 buckets x 4 slots: expected fpr ~ 8/2^16 ≈ 0.012%
    assert(fps < 40, s"fp count $fps out of 10000")
  }

  test("delete removes the key and never evicts other live keys") {
    val f = CuckooFilter.create(4096)
    val live = keys(1500, "a")
    val dead = keys(1500, "b")
    (live ++ dead).foreach(f.insert)
    dead.foreach(k => assert(f.delete(k)))
    live.foreach(k => assert(f.mightContain(k), s"delete evicted live key $k"))
    // deleted keys read as absent (fingerprint collisions aside)
    val stillThere = dead.count(f.mightContain)
    assert(stillThere < 10, s"$stillThere of 1500 deleted keys still positive")
  }

  test("multiset semantics: n inserts need n deletes; colliding keys stay safe") {
    val f = CuckooFilter.create(256)
    assert(f.insert("u1")); assert(f.insert("u1")) // stores two copies
    assert(f.delete("u1"))
    assert(f.mightContain("u1")) // one copy left
    assert(f.delete("u1"))
    assert(!f.mightContain("u1"))
  }

  test("saturation reports false instead of silently dropping") {
    val f = CuckooFilter.create(64)
    var inserted = 0
    var failed = false
    keys(5000, "x").foreach { k =>
      if (!failed) { if (f.insert(k)) inserted += 1 else failed = true }
    }
    assert(failed, "tiny filter must eventually refuse inserts")
    assert(inserted >= 64, s"should hold at least nominal capacity, got $inserted")
  }

  test("serialization round-trips exactly") {
    val f = CuckooFilter.create(2048)
    val ks = keys(1000, "a")
    ks.foreach(f.insert)
    val g = CuckooFilter.deserialize(f.serialize)
    assert(g.cardinality == f.cardinality)
    ks.foreach(k => assert(g.mightContain(k)))
    assert(g.delete(ks.head) && !g.mightContain(ks.head))
  }

  test("shard merge preserves every key (distributed build primitive)") {
    val a = CuckooFilter.create(4096)
    val b = CuckooFilter.create(4096)
    val ka = keys(1000, "a")
    val kb = keys(1000, "b")
    ka.foreach(a.insert)
    kb.foreach(b.insert)
    assert(a.mergeInPlace(b))
    (ka ++ kb).foreach(k => assert(a.mightContain(k), s"merge lost $k"))
  }

  test("property: random insert/delete interleavings keep live keys visible") {
    (0 until 20).foreach { trial =>
      val rng = new scala.util.Random(42 + trial)
      val ks = Seq.fill(300)(rng.alphanumeric.take(1 + rng.nextInt(24)).mkString).distinct
      val f = CuckooFilter.create(2048)
      ks.foreach(f.insert)
      val (del, keep) = ks.zipWithIndex.partition(_._2 % 3 == 0)
      del.foreach { case (k, _) => f.delete(k) }
      keep.foreach { case (k, _) =>
        assert(f.mightContain(k), s"trial $trial lost live key $k") }
    }
  }

  test("no false negatives even past saturation (orphan list holds them all)") {
    val f = CuckooFilter.create(64)
    val ks = keys(600, "sat") // ~5x nominal capacity: many failed kick chains
    ks.foreach(f.insert)
    ks.foreach(k => assert(f.mightContain(k), s"lost key past saturation: $k"))
    // the overflow state must survive serialization too
    val g = CuckooFilter.deserialize(f.serialize)
    assert(g.hasOrphans)
    ks.foreach(k => assert(g.mightContain(k), s"serialize dropped orphan key: $k"))
  }

  test("merge folds the other side's orphans (no keys lost)") {
    val a = CuckooFilter.create(64)
    val b = CuckooFilter.create(64) // same layout — shards must match
    val ka = keys(10, "a")
    val kb = keys(400, "ovf")
    ka.foreach(a.insert)
    kb.foreach(b.insert)
    assert(b.hasOrphans, "test needs an overflowed shard")
    a.mergeInPlace(b)
    (ka ++ kb).foreach(k => assert(a.mightContain(k), s"merge dropped key: $k"))
  }

  test("orphaned keys can still be deleted") {
    val f = CuckooFilter.create(64)
    val ks = keys(500, "del")
    ks.foreach(f.insert)
    assert(f.hasOrphans)
    ks.foreach(k => assert(f.delete(k), s"delete failed for $k"))
    assert(!f.hasOrphans, "deletes should drain the orphan list")
  }

  test("saturated flag survives the SeenSketch blob round-trip") {
    val s = SeenSketch.empty("cuckoo", 64).asInstanceOf[graft.functions.CuckooSeen]
    keys(600, "sat").foreach(s.add)
    assert(s.saturated)
    val t = SeenSketch.deserialize(SeenSketch.serialize(s))
    assert(t.saturated, "reloaded sketch lost its saturation state")
    // bloom: count-derived saturation also survives
    val b = SeenSketch.empty("bloom", 10)
    keys(50, "b").foreach(b.add)
    assert(b.saturated &&
      SeenSketch.deserialize(SeenSketch.serialize(b)).saturated)
  }

  test("SeenSketch.merge folds a compatible delta (both kinds)") {
    Seq("bloom", "cuckoo").foreach { kind =>
      val base = SeenSketch.empty(kind, 10000)
      val delta = SeenSketch.empty(kind, 10000)
      val k1 = keys(300, "base"); val k2 = keys(300, "delta")
      k1.foreach(base.add); k2.foreach(delta.add)
      assert(base.merge(delta), s"$kind merge reported saturation")
      (k1 ++ k2).foreach(k => assert(base.mightContain(k), s"$kind merge lost $k"))
      assert(base.cardinality == 600L)
    }
  }

  test("SeenSketch bloom/cuckoo round-trip through the blob encoding") {
    Seq("bloom", "cuckoo").foreach { kind =>
      val s = SeenSketch.empty(kind, 10000)
      val ks = keys(500, kind)
      ks.foreach(s.add)
      val t = SeenSketch.deserialize(SeenSketch.serialize(s))
      assert(t.kind == kind)
      ks.foreach(k => assert(t.mightContain(k)))
      if (kind == "cuckoo") {
        assert(t.delete(ks.head))
        assert(!t.mightContain(ks.head))
      } else assert(!t.delete(ks.head))
    }
  }

  test("blob encoding rejects unversioned bytes with a clear error") {
    val s = SeenSketch.empty("bloom", 1000)
    val good = SeenSketch.serialize(s)
    // a pre-versioning blob (no GSK header) must fail fast, not
    // deserialize misaligned into garbage capacity/count values
    val old = good.drop(4)
    val e = intercept[IllegalArgumentException](SeenSketch.deserialize(old))
    assert(e.getMessage.contains("GSK"))
  }

  test("deleteAllFrom subtracts a shard's keys (distributed forget primitive)") {
    val main = CuckooFilter.create(4000)
    val all = keys(1500, "m")
    all.foreach(main.insert)
    // delete-shard: same layout, holds the keys to remove
    val shard = CuckooFilter.createWithBuckets(main.numBuckets)
    val gone = all.take(700)
    gone.foreach(shard.insert)
    assert(main.deleteAllFrom(shard))
    // exactly the shard's copies were removed (a deleted key may still FP
    // against a surviving key's colliding fingerprint, so the exact checks
    // are the count and the live keys — same contract as delete())
    assert(main.cardinality == 800L)
    all.drop(700).foreach(k => assert(main.mightContain(k), s"lost live key $k"))
  }

  test("deleteAllFrom handles shards whose kick chains overflowed (orphans)") {
    // overfill a tiny layout so BOTH main and the delete-shard carry
    // orphaned fingerprints; the subtraction must still remove every copy
    val main = CuckooFilter.create(100)
    val all = keys(300, "o")
    all.foreach(main.insert)
    val shard = CuckooFilter.createWithBuckets(main.numBuckets)
    all.foreach(shard.insert)
    assert(shard.hasOrphans, "fixture must actually orphan shard keys")
    assert(main.deleteAllFrom(shard))
    assert(main.cardinality == 0L)
  }
}
