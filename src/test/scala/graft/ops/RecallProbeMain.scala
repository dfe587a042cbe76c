package graft.ops

import org.apache.spark.sql.functions._
import graft.TestSpark

/** Blocked-kNN tuning sweep: measures recall@5 and the scored-pair cost
  * of the SRP-multiprobe family (planes × Hamming ring × tables) and
  * the kmeans-IVF family (cells × nprobe) against the exact directed
  * top-5 — the measurement loop behind SCALE.md's recall-vs-cost table
  * and the n13b operating point.
  *
  * Usage: `Test/runMain graft.ops.RecallProbeMain [sfDir]`. */
object RecallProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = TestSpark.spark
    val e = graft.Tables.load(spark, dir, "embeddings")
    val exact = Similarity.knnDirected(e, "vec_id", "embedding", k = 5)
      .select("id", "nbr").localCheckpoint(true)
    val nExact = exact.count().toDouble
    def recallOf(blocked: org.apache.spark.sql.DataFrame): Double =
      exact.join(blocked, Seq("id", "nbr"), "left_semi").count() / nExact
    for ((cells, nprobe) <- Seq((16, 8), (32, 14), (32, 16))) {
      val t0 = System.nanoTime()
      val assigned = e.join(
        Similarity.kmeans(e, "vec_id", "embedding", k = cells, iters = 5)
          .withColumnRenamed("id", "vec_id"), "vec_id")
      val r = recallOf(Similarity.ivfTopK(assigned, e, "vec_id", "embedding",
          "cluster", k = 5, nprobe = nprobe)
        .select(col("query_id").as("id"), col("neighbor_id").as("nbr")))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"RECALL ivf cells=$cells nprobe=$nprobe frac=${nprobe.toDouble / cells}%.2f recall@5=$r%.3f wall=$sec%.2fs")
    }
    for ((planes, h, tb) <- Seq((4, 1, 1), (4, 2, 1), (4, 2, 2), (8, 2, 3))) {
      val t0 = System.nanoTime()
      val r = recallOf(Similarity
        .knnDirectedBlocked(e, "vec_id", "embedding", k = 5,
          planes = planes, hamming = h, tables = tb)
        .select("id", "nbr"))
      val sec = (System.nanoTime() - t0) / 1e9
      val probes = 1 + planes + (if (h >= 2) planes * (planes - 1) / 2 else 0)
      val frac = tb.toDouble * probes / (1 << planes)
      println(f"RECALL srp planes=$planes h=$h tables=$tb probes=$tb x $probes/${1 << planes} frac=$frac%.2f recall@5=$r%.3f wall=$sec%.2fs")
    }
    spark.stop()
  }
}
