package graft.ops

/** A/B probe for the funnel rewrite (run manually:
  * `sbt "Test/runMain graft.ops.FunnelProbeMain <sfDir>"`): times the
  * single-pass fold vs the k−1-join chain on a 5-step funnel over the
  * events table and asserts identical output. Results recorded in
  * SCALE.md. */
object FunnelProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.Tables.events(spark, dir)
    val steps = Seq("signup", "view", "click", "purchase", "error")
    def time(fn: => org.apache.spark.sql.DataFrame): (Double, Seq[String]) = {
      var rows: Seq[String] = Nil
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        rows = fn.orderBy("step").collect().map(_.toString).toSeq
        (System.nanoTime() - t0) / 1e9
      }
      (ts.min, rows)
    }
    for (gap <- Seq(None, Some(86400000000L))) {
      val (t1, r1) = time(EventAnalytics.funnelSteps(ev, "user_id",
        "event_type", "ts", steps, gap))
      val (t2, r2) = time(EventAnalytics.funnelStepsJoinChain(ev, "user_id",
        "event_type", "ts", steps, gap))
      require(r1 == r2, s"MISMATCH gap=$gap:\n$r1\n$r2")
      println(f"gap=$gap%-18s single-pass $t1%.2f s   join-chain $t2%.2f s   rows ok")
    }
    spark.stop()
  }
}
