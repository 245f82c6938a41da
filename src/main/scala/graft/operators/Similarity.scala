package graft.operators

import graft.functions.vec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an `array<float>` embedding
 * column. Baseline: brute-force cosine top-k (exact; one pass over the
 * corpus per query batch, queries broadcast). Scale path: IVF — a coarse
 * deterministic centroid assignment prunes the scan to the probed cells,
 * turning the 100 TB full scan into a partition-pruned fraction; recall
 * is tunable by nProbe.
 */
object Similarity {

  /** Exact brute-force top-k: queries (qid, qv) are broadcast; the corpus
   * is scanned once; per-query top-k via TakeOrdered-style window. */
  def bruteTopK(corpus: DataFrame, idCol: String, vecCol: String,
                queries: DataFrame, qidCol: String, qvecCol: String,
                k: Int = 10): DataFrame = {
    val scored = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .crossJoin(broadcast(queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))))
      .withColumn("cos", vec.cosine_sim(col("v"), col("qv")))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("qid", "rank", "vec_id", "cos")
  }

  /**
   * IVF (inverted-file) ANN: assign every vector to its nearest of
   * `nCells` coarse centroids (taken deterministically from the corpus —
   * the first nCells vectors by id, a standard seeding); at query time
   * probe the nProbe nearest cells only. On a cell-partitioned table the
   * probe reads ~nProbe/nCells of the data.
   */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              k: Int = 10, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val vecs = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    val centroids = broadcast(
      vecs.orderBy("vec_id").limit(nCells)
        .select(col("vec_id").as("cell"), col("v").as("cv")))

    // cell assignment: argmax cosine over the broadcast centroids
    val cellW = Window.partitionBy(col("vec_id")).orderBy(desc("ccos"), asc("cell"))
    val assigned = vecs.crossJoin(centroids)
      .withColumn("ccos", vec.cosine_sim(col("v"), col("cv")))
      .withColumn("crank", row_number().over(cellW))
      .where(col("crank") === 1)
      .select("vec_id", "v", "cell")

    // query → nProbe cells
    val qs = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))
    val qW = Window.partitionBy(col("qid")).orderBy(desc("qcos"), asc("cell"))
    val probed = qs.crossJoin(centroids)
      .withColumn("qcos", vec.cosine_sim(col("qv"), col("cv")))
      .withColumn("qrank", row_number().over(qW))
      .where(col("qrank") <= nProbe)
      .select("qid", "qv", "cell")

    val w = Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("vec_id"))
    assigned.join(broadcast(probed), Seq("cell"))
      .withColumn("cos", vec.cosine_sim(col("v"), col("qv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("qid", "rank", "vec_id", "cos")
  }
}
