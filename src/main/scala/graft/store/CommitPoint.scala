package graft.store

import java.util.concurrent.atomic.AtomicReference

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE cross-JVM commit point both graft coordination protocols
  * reduce to: atomically publish `content` at `path` iff nothing exists
  * there, then READ IT BACK — the caller won iff its exact bytes
  * survived verbatim. Used by [[TableStore]]'s versioned-manifest
  * commit (`_versions/v<n>` — the winner OWNS that version) and by
  * [[Artifacts]]' claim lock (`_claims/<table>.claim` — the winner
  * holds the build lease).
  *
  * Layered guarantee, per store (the same split Delta Lake documents
  * for its `_delta_log` protocol):
  *
  *  - '''HDFS / local POSIX''': `FileSystem.create(overwrite=false)`
  *    is atomic (`O_EXCL` semantics) — the create alone decides, and
  *    the read-back is a cheap invariant check.
  *  - '''Object stores (S3A and friends)''': plain `create(false)` is
  *    check-then-create (a HEAD then a PUT), NOT atomic. The token
  *    read-back closes most of the window — two interleaved creators
  *    each verify against the LAST content written, so at most one
  *    (possibly zero) sees its own bytes and wins; a zero-winner
  *    version is an mtime-quiet corpse both protocols already break
  *    ([[TableStore.awaitBaseAdvance]], [[Artifacts.publish]]'s
  *    stale-claim break). The residual — reader A read-back-verifies
  *    BEFORE writer B's overwriting PUT lands, then B's content
  *    replaces the "committed" file — needs a store-side fence to
  *    close fully: a conditional PUT (`If-None-Match: *`, native on
  *    S3 since 2024 and on GCS/ABFS), or an external coordinator
  *    (DynamoDB-style, as S3-era Delta used). Plug that in as a
  *    [[CommitPoint.Creator]]; everything above this seam is
  *    store-agnostic.
  *
  * The `creator` seam is also how the protocol is TESTED: specs inject
  * a deliberately non-atomic check-then-create ([[withCreator]]) and
  * prove that even then the manifest protocol never yields two winners
  * for one version.
  */
object CommitPoint {

  /** The pluggable atomic-create seam. `createIfAbsent` returns true
    * iff THIS caller materialized `p` (best effort — the read-back in
    * [[publish]] is the final arbiter, so a lying creator degrades to
    * lost races, never to two winners... provided its lie converges to
    * one final content, which any real store's PUT does). */
  trait Creator {
    def createIfAbsent(fs: FileSystem, p: Path, bytes: Array[Byte]): Boolean
  }

  /** Production creator: `create(overwrite = false)` — atomic on
    * HDFS/POSIX, check-then-create on S3A (see the object scaladoc for
    * why the read-back still bounds that). */
  object AtomicCreate extends Creator {
    override def createIfAbsent(fs: FileSystem, p: Path,
        bytes: Array[Byte]): Boolean =
      try {
        val out = fs.create(p, false) // throws if the path is taken
        try out.write(bytes) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
  }

  private val creator = new AtomicReference[Creator](AtomicCreate)

  /** Swap the creator for the duration of `body` — test-only seam for
    * injecting non-atomic creates. Global (both protocols see it),
    * which is the point: one shim exercises every commit path. */
  private[graft] def withCreator[T](c: Creator)(body: => T): T = {
    val prev = creator.getAndSet(c)
    try body finally creator.set(prev)
  }

  /** One commit attempt: create-if-absent `content` at `p`, then read
    * it back — true iff OUR bytes are what the path now serves. False
    * means a lost race (someone else's content, or a torn/vanished
    * write): the caller must treat the path as foreign and rebase or
    * wait, never retry-overwrite. */
  def publish(fs: FileSystem, p: Path, content: String): Boolean = {
    val bytes = content.getBytes("UTF-8")
    val created = creator.get().createIfAbsent(fs, p, bytes)
    created && (try readBack(fs, p) == content
      catch { case _: java.io.IOException => false })
  }

  private def readBack(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }
}
