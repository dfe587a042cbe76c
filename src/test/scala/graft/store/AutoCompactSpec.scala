package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.ChangeStream
import graft.orchestrate.Orchestrator

/** Auto-compaction (TableStore.autoCompact + the append-hook conf +
  * Orchestrator.createCompactionTask): continuous micro-batch ingestion
  * accretes one batch dir per append — the policy must bound the file
  * count WITHOUT breaking time travel (old versions stay readable) or
  * CDC (compaction commits no change batch, so streams see exactly the
  * ingested rows and nothing else). */
class AutoCompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def freshStore() =
    new TableStore(spark, Files.createTempDirectory("graft_autocompact").toString,
      numBuckets = 2)

  test("write-time auto-compaction bounds batch count; time travel + streams survive") {
    val st = freshStore()
    st.createTable("t", schema, keys = Seq("id"))
    val stream = ChangeStream.create(st, "t", "s1")
    spark.conf.set("spark.graft.store.autoCompactBatches", "4")
    try {
      (0 until 10).foreach { i =>
        st.append("t", Seq((i.toLong, s"v$i")).toDF("id", "v"))
        assert(st.batchCount("t") < 5,
          s"append $i: accretion must stay under the threshold+1, got ${st.batchCount("t")}")
      }
    } finally spark.conf.unset("spark.graft.store.autoCompactBatches")
    assert(st.read("t").count() == 10)
    assert(st.read("t").select("id").distinct().count() == 10)

    // CDC: the stream sees exactly the ten inserted rows — compaction
    // commits with NO change batch, so no phantom changes ride along
    var change = Seq.empty[(Long, String)]
    stream.consume { ch =>
      change = ch.collect().map(r => (r.getLong(0), r.getAs[String]("__action"))).toSeq
    }
    assert(change.size == 10 && change.forall(_._2 == "insert"),
      s"stream must see exactly the 10 inserts: $change")

    // time travel: an early pre-compaction version still reconstructs
    assert(st.readVersion("t", 2L).count() == 2)
    // and the version chain carries the compaction commits (10 appends
    // + at least one compact → current version > 10)
    assert(st.currentVersion("t") > 10L)
  }

  test("table-level AUTO_COMPACT rebuilds lookup blooms and keeps clustering_info current") {
    val st = freshStore()
    st.createTable("t", StructType(Seq(
      StructField("id", LongType), StructField("probe", LongType))),
      keys = Seq("id"), clusterBy = Seq("id"), lookup = Seq("probe"))
    st.setAutoCompact("t", Some(3)) // the TABLE property, no session conf
    // multiplicative-hash scatter: every file spans ~the full probe
    // range, so intervals keep 100% and only the bloom can prune
    def scatter(x: Long): Long = (x * 2654435761L) & 0x7fffffffL
    (0 until 6).foreach { b =>
      st.append("t", (0 until 50)
        .map(i => (b * 50L + i, scatter(b * 50L + i)))
        .toDF("id", "probe"))
    }
    assert(st.batchCount("t") <= 3,
      s"the table policy must bound accretion: ${st.batchCount("t")}")
    assert(st.currentVersion("t") > 6L, "compaction commits must be present")
    // blooms SURVIVE the compaction rewrite: a point probe on the
    // hash-scattered column (intervals keep everything) still prunes
    val probeV = scatter(125L)
    val hit = st.scanWhere("t", col("probe") === probeV)
    assert(hit.collect().map(_.getLong(0)).toSeq == Seq(125L))
    val all = st.read("t").inputFiles.length
    assert(hit.inputFiles.length < all,
      s"post-compaction blooms must prune the point probe: ${hit.inputFiles.length} of $all")
    // clustering_info reads the CURRENT manifest: post-compaction layout
    val ci = st.clusteringInfo("t")
      .agg(countDistinct(col("bucket"), col("file")), sum(col("n_rows"))).head()
    assert(ci.getLong(0) == all,
      s"clustering_info must report the post-compaction files: ${ci.getLong(0)} vs $all")
    assert(ci.getLong(1) == 300L, s"rows conserved: ${ci.getLong(1)}")
  }

  test("orchestrator compaction task: WHEN-gated, compacts once accreted") {
    val st = freshStore()
    st.createTable("t", schema, keys = Seq("id"))
    val orch = new Orchestrator(spark, st)
    val tn = orch.createCompactionTask("t", minBatches = 4)
    orch.resume(tn)

    // under the threshold: the gate skips (manifest read only)
    (0 until 2).foreach(i => st.append("t", Seq((i.toLong, "x")).toDF("id", "v")))
    val s1 = orch.runCycle(tn)
    assert(s1(tn) == "SKIPPED", s"under-threshold cycle must skip: $s1")
    assert(st.batchCount("t") == 2)

    // accreted past the threshold: the task compacts to one batch
    (2 until 6).foreach(i => st.append("t", Seq((i.toLong, "x")).toDF("id", "v")))
    assert(st.batchCount("t") == 6)
    val s2 = orch.runCycle(tn)
    assert(s2(tn) == "SUCCEEDED", s"accreted cycle must compact: $s2")
    assert(st.batchCount("t") == 1, s"compaction must fold to one batch")
    assert(st.read("t").count() == 6)

    // next cycle: nothing accreted, gate skips again (no version churn)
    val vAfter = st.currentVersion("t")
    val s3 = orch.runCycle(tn)
    assert(s3(tn) == "SKIPPED" && st.currentVersion("t") == vAfter)
  }
}
