package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  lazy val queries = emb.orderBy("vec_id").limit(3)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  def localCos(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  test("bruteTopK matches a local exact computation") {
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val qs = queries.collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    val got = Similarity.bruteTopK(emb, "vec_id", "embedding", queries, "qid", "qv", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = qs.flatMap { case (qid, qv) =>
      vecs.toSeq.map { case (id, v) => (id, localCos(v, qv)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).zipWithIndex
        .map { case ((id, _), rk) => (qid, (rk + 1).toLong, id) }
    }.toSet
    assert(got == want)
  }

  test("map-only ivfAssign matches a local exact argmax (ties to lowest cell)") {
    // centroids: 16 corpus vectors; assignment must equal the local
    // argmax-cosine with ties broken toward the lowest cell id — the
    // contract of the codegen'd nearest_cell scalar that replaced the
    // crossJoin+groupBy(vec_id) shuffle (r3 shape).
    val cents = emb.orderBy("vec_id").limit(16)
      .select(col("vec_id").cast("long").as("cell"), col("embedding").as("cv"))
    val localCents = cents.collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    val vecs = emb.select(col("vec_id"), col("embedding").as("v"))
    val got = Similarity.ivfAssign(vecs, cents)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val localVecs = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    localVecs.foreach { case (id, v) =>
      val want = localCents.map { case (cell, cv) => (cell, localCos(cv, v)) }
        .sortBy { case (cell, c) => (-c, cell) }.head._1
      assert(got(id) == want, s"vec $id: got cell ${got(id)}, want $want")
    }
    assert(got.size == localVecs.length)
  }

  test("ivfTopK achieves high recall vs brute force (kmeans-refined cells)") {
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding", queries, "qid", "qv", 10)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", queries, "qid", "qv",
      k = 10, nCells = 16, nProbe = 6, iters = 2)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("partial topk_by_cos == row_number window under ties and many partitions") {
    // r6: bruteTopK/ivfTopK replaced the per-qid row_number window (which
    // funnels every scored row into one partition per query) with the
    // partially-aggregating topk_by_cos buffer. Equivalence must hold under
    // (a) duplicate cos values — ties break by vec_id asc, (b) ties ACROSS
    // the k boundary, (c) arbitrary partial/merge splits. Adversarial
    // input: cos quantized to 4 distinct values over 1000 ids, 32
    // partitions so map-side partials genuinely merge.
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(1000).repartition(32)
      .select(lit(7L).as("qid"), col("id").as("vec_id"),
        (pmod(col("id") * 37, lit(4)).cast("double") / 4.0).as("cos"))
      .unionAll(spark.range(500).repartition(16)
        .select(lit(8L).as("qid"), (col("id") * 3 + 1).as("vec_id"),
          (pmod(col("id") * 11, lit(4)).cast("double") / 4.0).as("cos")))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("vec_id"))
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 9).select("qid", "rank", "vec_id", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val got = df.groupBy(col("qid"))
      .agg(graft.functions.vec.topk_by_cos(col("vec_id"), col("cos"), 9).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("p.vec_id"), col("p.cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want)
  }

  test("persisted IVF index: partition-pruned probe, same results as in-plan IVF") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.buildIndex(emb, "vec_id", "embedding", dir, nCells = 16, iters = 2)
    // the cells store is physically partitioned by cell
    val cellDirs = new java.io.File(s"$dir/cells").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName)
    assert(cellDirs.length > 1, "index must be partitioned by cell")
    val got = Similarity.searchIndex(spark, dir, queries, "qid", "qv", k = 10, nProbe = 6)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding", queries, "qid", "qv", 10)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(got).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall")
    // probing must READ less than the whole store: the isin(cell ids)
    // predicate prunes directory partitions before any file is opened
    val pruned = spark.read.parquet(s"$dir/cells").where(col("cell").isin(0L))
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters: [") &&
      !planStr.replaceAll("(?s).*PartitionFilters: \\[", "").startsWith("]"),
      s"cell predicate must be a partition filter:\n$planStr")
  }
}
