package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Optimization-round side benchmarks (guide §1.4): noop-sink isolation and
 * sub-stage decompositions for the expensive queries, so OPTIMIZATION_r06.md
 * can cite where the seconds actually go. NOT part of the graded bench —
 * Bench.scala is frozen; this main exists so its numbers are reproducible.
 *
 * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_PARTITIONS.
 */
object BenchExtra {
  private def env(k: String, d: String) = sys.env.getOrElse(k, d)

  private def timed(tag: String, runs: Int = 3)(body: => Unit): Unit = {
    val ts = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[extra] $tag%-42s median=${ts.sorted.apply(runs / 2)}%.3f  runs=" +
      ts.map(t => f"$t%.3f").mkString("/"))
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = env("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = env("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions",
        env("SPARK_GRAFT_BENCH_PARTITIONS", (cpus * 4).toString))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.local.dir",
        if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
          "/dev/shm/graft-bench-local" else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{gf, sketch}

    val only = env("SPARK_GRAFT_EXTRA_ONLY", "").split(',').map(_.trim)
      .filter(_.nonEmpty).toSet
    def want(s: String) = only.isEmpty || only(s)

    // warm: session init + parquet footers + codegen for the shapes below
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    SparkEntry.queries("q_dedup_minhash")(spark, sfDir).count()
    SparkEntry.queries("q_dedup_simhash")(spark, sfDir).count()
    SparkEntry.queries("q_ann_ivf")(spark, sfDir).count()

    if (want("minhash")) {
      spark.sparkContext.setJobDescription("minhash: full query")
      timed("minhash full (count)") {
        SparkEntry.queries("q_dedup_minhash")(spark, sfDir).count()
      }
      // sub-stage: shingle+bandhash+checkpoint only
      import graft.operators.Dedup
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .where(size(gf.tokenize(col("text"))) >= 3)
      spark.sparkContext.setJobDescription("minhash: sig+checkpoint only")
      timed("minhash sig+checkpoint only") {
        val cp = docs.select(col("doc_id").as("doc"), col("text").as("txt"))
          .repartition(cpus)
          .select(col("doc"), sketch.shingle_hash64(gf.tokenize(col("txt")), 3).as("hs"))
          .withColumn("bh", sketch.minhash_band_hashes(col("hs"), 64, 2))
          .localCheckpoint(true)
        cp.unpersist(true)
      }
    }

    if (want("simhash")) {
      spark.sparkContext.setJobDescription("simhash: full query")
      timed("simhash full (count)") {
        SparkEntry.queries("q_dedup_simhash")(spark, sfDir).count()
      }
      spark.sparkContext.setJobDescription("simhash: fingerprint map only")
      timed("simhash fingerprint map only (noop)") {
        noop(spark.read.parquet(s"$sfDir/documents.parquet")
          .repartition(cpus)
          .select(col("doc_id"), sketch.simhash64(gf.tokenize(col("text"))).as("sim")))
      }
    }

    if (want("ivf")) {
      spark.sparkContext.setJobDescription("ivf: full query")
      timed("ivf full (count)") {
        SparkEntry.queries("q_ann_ivf")(spark, sfDir).count()
      }
      spark.sparkContext.setJobDescription("ivf: centroids only")
      timed("ivf centroids only") {
        import graft.operators.Similarity
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        Similarity.ivfCentroids(emb, "vec_id", "embedding", 16, 2).count()
      }
    }

    if (want("logparse")) {
      spark.sparkContext.setJobDescription("logparse: full query")
      timed("logparse full (count)") {
        SparkEntry.queries("q_log_parse")(spark, sfDir).count()
      }
      spark.sparkContext.setJobDescription("logparse: line synth only")
      timed("logparse line synth only (noop)") {
        noop(spark.read.parquet(s"$sfDir/events.parquet")
          .select(col("event_id"), col("ts"), (col("event_id") % 3).as("form"))
          .select(when(col("form") === 0,
            concat(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
              lit(",123 - Master - INFO - evt "), col("event_id")))
            .when(col("form") === 1,
              concat(lit("["), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
                lit("] crawler msg "), col("event_id")))
            .otherwise(concat(lit("no timestamp line "), col("event_id"))).as("line")))
      }
    }

    if (want("scans")) {
      Seq("documents", "events", "orders", "lineitem", "embeddings").foreach { t =>
        spark.sparkContext.setJobDescription(s"scan $t")
        timed(s"bare scan $t (noop)") {
          noop(spark.read.parquet(s"$sfDir/$t.parquet"))
        }
      }
    }

    spark.stop()
  }
}
