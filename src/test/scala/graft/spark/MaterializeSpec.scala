package graft.spark

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The reliable-checkpoint opt-in: with `spark.graft.reliableCheckpoint`
  * set (and a context checkpoint dir), every `.materialized` lineage cut
  * in the iterative ops routes through a RELIABLE checkpoint — files in
  * the checkpoint dir that survive executor loss — and produces the same
  * results as the local-mode default. */
class MaterializeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("reliable mode checkpoints to the dir and preserves clusterPairs results") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    // session-scoped opt-in: sibling sessions (every other suite) keep
    // the local default even though the checkpoint dir is context-global
    val s = spark.newSession()
    s.sparkContext.setCheckpointDir(ckpt)
    s.conf.set(Materialize.CONF, "true")
    val sp = s; import sp.implicits._
    // two components: {1,2,3} via chained pairs, {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = graft.ops.Dedup.clusterPairs(pairs)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(labels == Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
    // the contraction rounds must have left reliable checkpoint files
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(files > 0, "expected reliable checkpoint files under the dir")
  }

  test("reliable mode without a checkpoint dir fails fast with the config hint") {
    val s = spark.newSession()
    s.conf.set(Materialize.CONF, "true")
    val sp = s; import sp.implicits._
    val df = Seq((1L, 2L)).toDF("id_a", "id_b")
    // the context-global checkpoint dir may already be set by the sibling
    // test; only assert the failure mode when it is genuinely absent
    if (s.sparkContext.getCheckpointDir.isEmpty) {
      val e = intercept[IllegalArgumentException] {
        graft.ops.Dedup.clusterPairs(df).collect()
      }
      assert(e.getMessage.contains("setCheckpointDir"))
    }
  }
}
