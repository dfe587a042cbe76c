package graft.spark

import org.apache.spark.sql.DataFrame

/** Eager materialization with a lineage cut — the primitive behind every
  * iterative contraction (clusterPairs' large-star/small-star rounds,
  * BPE's merge rounds, pagerank's pair-list root) and every
  * bounded-intermediate reuse site in the ops layer.
  *
  * Default mode: `localCheckpoint(eager = true)` — blocks live on
  * executors, zero extra I/O; the right call on `local[n]` (and what the
  * bench measures). Its honest cluster-scale caveat: the blocks are NOT
  * fault-tolerant — lineage is truncated, so losing ONE executor makes
  * every downstream consumer unrecomputable.
  *
  * Cluster mode (opt-in): set session conf
  * `spark.graft.reliableCheckpoint=true` and give the context a
  * checkpoint dir (`sparkContext.setCheckpointDir("hdfs://…")`). Every
  * materialization then goes through RELIABLE `checkpoint(eager = true)`
  * — files in the checkpoint dir, re-readable after executor loss, so an
  * O(log n) contraction survives failures mid-round. Opt-in because each
  * materialization writes a full copy to storage; per-corpus-version
  * artifacts that outlive a job belong in [[graft.store.Artifacts]]
  * instead (versioned, SQL-queryable, durable across sessions).
  */
object Materialize {
  /** Session conf key switching materializations to reliable checkpoints. */
  val CONF = "spark.graft.reliableCheckpoint"

  implicit class MaterializeOps(private val df: DataFrame) extends AnyVal {
    /** Eagerly materialize and cut lineage; reliable iff the session
      * opted in (see object doc). */
    def materialized: DataFrame = {
      val s = df.sparkSession
      if (s.conf.get(CONF, "false").toBoolean) {
        require(s.sparkContext.getCheckpointDir.isDefined,
          s"$CONF=true requires sparkContext.setCheckpointDir(...)")
        df.checkpoint(eager = true)
      } else df.localCheckpoint(eager = true)
    }

    /** LAZY variant (r21, guide §1.2 — fewer driver round-trips): same
      * lineage cut, but materialization happens inside the NEXT action
      * that consumes the frame instead of paying a dedicated job here.
      * For a driver-synced loop (the BPE rounds: ~13 rounds × [count
      * job + checkpoint job]) this halves the per-round job count —
      * the next round's pair-count action computes AND persists the
      * checkpoint blocks in one submission. Use only where the frame
      * is guaranteed to be consumed exactly once before the next cut
      * (otherwise the first consumer pays the materialization and the
      * guarantee of "computed once" still holds — blocks are reused —
      * but the latency lands unpredictably). */
    def materializedLazy: DataFrame = {
      val s = df.sparkSession
      if (s.conf.get(CONF, "false").toBoolean) {
        require(s.sparkContext.getCheckpointDir.isDefined,
          s"$CONF=true requires sparkContext.setCheckpointDir(...)")
        df.checkpoint(eager = false)
      } else df.localCheckpoint(eager = false)
    }
  }
}
