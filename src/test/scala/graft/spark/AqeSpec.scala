package graft.spark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Adaptive-execution posture: every graft session runs with AQE + skew
  * join handling ON (the runtime re-plan layer that complements the
  * manual salting in [[graft.ops.SkewJoin]] — AQE splits oversized
  * shuffle partitions at runtime without a code change, which is the
  * first line of defense for unexpected key skew at 100 TB). */
class AqeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("session enables adaptive execution and skew-join handling") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
  }

  test("a deliberately skewed sort-merge join gets AQE skew-split at runtime") {
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // force SMJ (no broadcast) and make the skew detector fire at test
      // scale: one key holds ~100k rows, the rest hold one each
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val left = spark.range(100000)
        .select(when(col("id") < 99000, lit(7L)).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val right = spark.range(200).select(col("id").as("k"), lit("dim").as("attr"))
      val joined = left.join(right, "k")
      // run THIS QueryExecution's own adaptive plan (df.write/count/foreach
      // all build a fresh QueryExecution whose finalized plan we could not
      // inspect afterwards)
      val qe = joined.queryExecution
      qe.executedPlan.execute().count()
      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE to mark the skewed join (skew=true), plan:\n$finalPlan")
    } finally restore.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
