package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic mini-corpus: 40 base docs + near-duplicates of the first
  // 10 (one word in ~12 changed ⇒ 3-gram jaccard well above 0.6) + 2 exact
  // duplicates
  def word(i: Long): String = sources.CorpusGen.Words((math.abs(i) % 32).toInt)
  lazy val base: Seq[(Long, String)] = (0L until 40L).map { i =>
    i -> (0 until 40).map(k => word(sources.CorpusGen.mix(i, k))).mkString(" ")
  }
  lazy val nearDups: Seq[(Long, String)] = (0L until 10L).map { i =>
    val toks = base(i.toInt)._2.split(" ")
    toks(5) = "zzz" // single-token perturbation
    (100L + i) -> toks.mkString(" ")
  }
  lazy val exactDups: Seq[(Long, String)] =
    Seq(200L -> base(3)._2, 201L -> base(7)._2)
  lazy val corpus = (base ++ nearDups ++ exactDups).toDF("doc_id", "text")

  test("minhashLSH finds exactly the brute-force jaccard pairs at 0.6") {
    val brute = Dedup.jaccardBrute(corpus, "doc_id", "text", n = 3, threshold = 0.6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLSH(corpus, "doc_id", "text",
      n = 3, bands = 32, rows = 4, threshold = 0.6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size >= 12, s"fixture should contain near-dups, got $brute")
    assert(lsh == brute)
  }

  test("minhash jaccard estimate tracks true jaccard") {
    val rows = Dedup.minhashLSH(corpus, "doc_id", "text",
      n = 3, bands = 32, rows = 4, threshold = 0.6).collect()
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.6 && r.getDouble(2) <= 1.0)
    }
  }

  test("simhashPairs is exact for hamming <= tables-1 (pigeonhole)") {
    import graft.functions.sketch
    val fps = corpus.select(col("doc_id"),
      sketch.simhash64(functions.gf.tokenize(col("text"))).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (ia, ib, h)).toSet
    val got = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3, blocks = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(expected.nonEmpty, "fixture should produce close simhashes")
    assert(got == expected)
  }

  test("exact dedup groups identical texts, keeps min id") {
    val d = Dedup.exact(corpus, "doc_id", "text")
      .where(col("dupes") > 1).collect()
    assert(d.length == 2)
    assert(d.map(_.getLong(2)).toSet == Set(2L)) // both groups have 2 members
    assert(d.map(_.getLong(1)).toSet == Set(3L, 7L)) // min doc_id kept
  }

  test("embeddingDupes finds perturbed-vector pairs via LSH buckets") {
    def vecOf(i: Long): Array[Float] =
      (0 until 16).map(d => (sources.CorpusGen.mix(i, d).toFloat / Long.MaxValue)).toArray
    val vs = (0L until 30L).map(i => (i, vecOf(i))) ++
      (0L until 5L).map { i =>
        val v = vecOf(i); v(0) = v(0) + 0.01f; (300L + i, v)
      }
    val df = vs.toDF("vec_id", "embedding")
    val got = Dedup.embeddingDupes(df, "vec_id", "embedding", threshold = 0.99, bits = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // all 5 injected pairs must surface (tiny perturbation ⇒ same bucket whp;
    // fixed data makes this deterministic)
    (0L until 5L).foreach(i => assert(got.contains((i, 300L + i)), s"pair $i"))
  }
}
