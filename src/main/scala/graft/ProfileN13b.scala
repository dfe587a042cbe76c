package graft

import org.apache.spark.sql.SparkSession

/** Throwaway bisect harness for n13b_knn_recall_ivf (the suite's
  * slowest query): split its wall time into (a) the exact-truth
  * artifact first-build, (b) the kmeans codebook/labels, (c) the IVF
  * probe scoring join, (d) the final recall join+agg — each timed cold
  * (fresh artifact root) and warm. */
object ProfileN13b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_prof").toString
    spark.conf.set("spark.graft.artifactDir", root)
    def timed(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // JVM warm
    noop(SparkEntry.queries("p2_select_star")(spark, sfDir))

    import graft.store.Artifacts
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def fpE = Artifacts.dataFingerprint(spark, s"$sfDir/embeddings.parquet")
    def exactTruth() = Artifacts.table(spark, "knn_truth",
        s"$sfDir|$fpE|cos|k=5", keys = Seq("id")) {
      graft.ops.Similarity.knnDirected(e, "vec_id", "embedding", 5)
    }
    def kmLabels() = {
      val cents = Artifacts.codebook(spark, "kmeans",
          s"$sfDir|$fpE|k=32|iters=5") {
        graft.ops.Similarity.kmeansCentroids(e, "vec_id", "embedding", 32, 5)
      }
      graft.ops.Similarity.assignClusters(e, "vec_id", "embedding", cents)
        .withColumnRenamed("id", "vec_id")
    }
    timed("exact_truth_cold") { noop(exactTruth()) }
    timed("exact_truth_warm") { noop(exactTruth()) }
    timed("kmeans_labels_cold") { noop(kmLabels()) }
    timed("kmeans_labels_warm") { noop(kmLabels()) }
    val km = kmLabels()
    timed("ivf_scoring_join") {
      noop(graft.ops.Similarity.ivfTopK(e.join(km, Seq("vec_id")), e,
        "vec_id", "embedding", "cluster", k = 5, nprobe = 14))
    }
    timed("ivf_scoring_join_2nd") {
      noop(graft.ops.Similarity.ivfTopK(e.join(km, Seq("vec_id")), e,
        "vec_id", "embedding", "cluster", k = 5, nprobe = 14))
    }
    timed("full_n13b_warm_artifacts") {
      noop(SparkEntry.queries("n13b_knn_recall_ivf")(spark, sfDir))
    }
    timed("full_n13b_again") {
      noop(SparkEntry.queries("n13b_knn_recall_ivf")(spark, sfDir))
    }
    // cold end-to-end: fresh root, everything first-build
    val root2 = java.nio.file.Files.createTempDirectory("graft_prof2").toString
    spark.conf.set("spark.graft.artifactDir", root2)
    timed("full_n13b_cold") {
      noop(SparkEntry.queries("n13b_knn_recall_ivf")(spark, sfDir))
    }
    spark.stop()
  }
}
