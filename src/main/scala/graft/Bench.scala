package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // min-of-3 by default: at 0.2–1 s query scale, min-of-2 showed ±8%
    // swings on untouched queries between rounds (r7→r8), which can mask
    // a real regression; a third sample cuts the drift to <3%.
    val iterations = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true") // explicit AQE posture
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: forces FULL materialization of every output column —
    // count() would let Catalyst prune the aggregate/projection work and
    // understate timings
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // warm up the JVM/codegen/file-listing paths so per-query timings
    // reflect steady state rather than first-query startup cost
    try SparkEntry.queries.get("p2_select_star").foreach(run)
    catch { case _: Throwable => () }
    // Each query runs `iterations` times; we report the min so one-off
    // JIT/codegen warm-up for a query's unique operators doesn't get
    // attributed to the query itself. A failure is reported, not swallowed:
    // the failing query times as the wall cost of the attempt and its error
    // message lands in the "errors" map (and errCount > 0 flags the run).
    // optional subset (scale-proof runs): comma-separated query names.
    // Unknown names fail loudly — a typo'd filter must not produce a
    // vacuously clean zero-query "pass".
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .map { names =>
          val unknown = names.diff(SparkEntry.queries.keySet)
          require(names.nonEmpty && unknown.isEmpty,
            s"SPARK_GRAFT_BENCH_ONLY: empty or unknown queries ${unknown.mkString(",")}")
          names
        }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to iterations).map { _ =>
        val t0 = System.nanoTime()
        try run(fn)
        catch {
          case e: Throwable =>
            if (!errors.contains(name))
              errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
                .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200)
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    def jstr(s: String) = "\"" + s + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errCount":${errors.size},"errors":$errs,"iters":$iterations,"sf":"$sfDir"}""")
    spark.stop()
  }
}
