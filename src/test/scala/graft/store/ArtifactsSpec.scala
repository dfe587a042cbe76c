package graft.store

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The durable-artifact contract: an artifact builds ONCE per (root,
  * name, key) and every later consumer — including a FRESH session
  * pointed at the same root — reads the committed store table instead of
  * re-running the build. */
class ArtifactsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("artifact builds once and re-reads from the store, across sessions") {
    val root = Files.createTempDirectory("graft_artifacts_spec").toString
    val builds = new AtomicInteger(0)
    val s1 = spark.newSession()
    s1.conf.set("spark.graft.artifactDir", root)
    def build(s: org.apache.spark.sql.SparkSession) = {
      val sp = s; import sp.implicits._
      builds.incrementAndGet()
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    }
    val first = Artifacts.table(s1, "spec_art", "corpus1|p=1", Seq("id"))(build(s1))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(builds.get() == 1)
    assert(first == Seq((1L, "a"), (2L, "b"), (3L, "c")))

    // same session, same key: served from the store, build NOT re-run
    Artifacts.table(s1, "spec_art", "corpus1|p=1", Seq("id"))(build(s1)).count()
    assert(builds.get() == 1)

    // FRESH session on the same root: still served from the store
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.artifactDir", root)
    val again = Artifacts.table(s2, "spec_art", "corpus1|p=1", Seq("id"))(build(s2))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(builds.get() == 1, "a fresh session must read, not rebuild")
    assert(again == first)

    // a DIFFERENT key (new corpus version / new params) rebuilds
    Artifacts.table(s2, "spec_art", "corpus2|p=1", Seq("id"))(build(s2)).count()
    assert(builds.get() == 2)

    // the artifact is an ordinary store table: SQL-queryable by name
    val st = new TableStore(s2, root)
    val names = st.listTables()
    assert(names.exists(_.startsWith("artifact_spec_art_")), s"got $names")

    // the listing catalogs both keyed builds; every listed table is a
    // registered temp view queryable with plain SQL in the session
    val listed = Artifacts.listing(s2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(listed.count(_._1.startsWith("artifact_spec_art_")) == 2, s"got $listed")
    val viewName = listed.map(_._1).find(_.startsWith("artifact_spec_art_")).get
    assert(s2.sql(s"SELECT count(1) FROM $viewName").head().getLong(0) == 3L)
  }

  test("codebook artifact round-trips doubles exactly across sessions") {
    val root = Files.createTempDirectory("graft_artifacts_spec").toString
    val builds = new AtomicInteger(0)
    val book: Array[Seq[Double]] = Array(
      Seq(0.1, -2.5e-17, 3.0), Seq(1.0 / 3.0, Double.MinPositiveValue, -0.0))
    val s1 = spark.newSession()
    s1.conf.set("spark.graft.artifactDir", root)
    val got1 = Artifacts.codebook(s1, "spec_km", "c1|k=2") {
      builds.incrementAndGet(); book
    }
    assert(builds.get() == 1)
    assert(got1.length == 2 && got1(0) == book(0) && got1(1) == book(1))
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.artifactDir", root)
    val got2 = Artifacts.codebook(s2, "spec_km", "c1|k=2") {
      builds.incrementAndGet(); book
    }
    assert(builds.get() == 1, "codebook must be read back, not retrained")
    // parquet round-trip must be BIT-exact (the assignment argmin and the
    // oracle replay both depend on it)
    assert(got2(0) == book(0) && got2(1) == book(1))
    assert(java.lang.Double.doubleToRawLongBits(got2(1)(2)) ==
      java.lang.Double.doubleToRawLongBits(-0.0))
  }

  test("empty artifacts round-trip with schema intact") {
    val root = Files.createTempDirectory("graft_artifacts_spec").toString
    val s = spark.newSession()
    s.conf.set("spark.graft.artifactDir", root)
    val sp = s; import sp.implicits._
    val out = Artifacts.table(s, "spec_empty", "k", Seq("id")) {
      Seq.empty[(Long, String)].toDF("id", "v")
    }
    assert(out.count() == 0)
    assert(out.schema.fieldNames.toSeq == Seq("id", "v"))
    // and a fresh session still reads the committed empty table
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.artifactDir", root)
    assert(Artifacts.table(s2, "spec_empty", "k", Seq("id")) {
      fail("must not rebuild"); null
    }.count() == 0)
  }

  test("appendDelta maintenance equals a full rebuild for row-local builders") {
    val root = Files.createTempDirectory("graft_artifacts_spec").toString
    val s = spark.newSession()
    s.conf.set("spark.graft.artifactDir", root)
    val sp = s; import sp.implicits._
    val v1 = Seq((1L, "the quick brown fox"), (2L, "jumps over the dog"),
      (3L, "spark engines at scale")).toDF("doc_id", "text")
    val delta = Seq((4L, "the quick red fox"), (5L, "entirely new content here"))
      .toDF("doc_id", "text")
    def shingles(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Dedup.shingleRows(df, "doc_id", "text", shingleN = 2)
    Artifacts.table(s, "spec_sh", "corpusA", Seq("id"))(shingles(v1))
    Artifacts.appendDelta(s, "spec_sh", "corpusA", shingles(delta))
    val maintained = Artifacts.table(s, "spec_sh", "corpusA", Seq("id")) {
      fail("must not rebuild"); null
    }.collect().map(_.toString).sorted.toSeq
    val rebuilt = shingles(v1.unionAll(delta))
      .collect().map(_.toString).sorted.toSeq
    assert(maintained == rebuilt,
      "incrementally-maintained artifact must equal the full rebuild")
    // appending to a never-built artifact fails fast
    val e = intercept[IllegalArgumentException] {
      Artifacts.appendDelta(s, "spec_sh", "nosuch", shingles(delta))
    }
    assert(e.getMessage.contains("does not exist"))
  }

  test("concurrent consumers of one key build exactly once") {
    val root = Files.createTempDirectory("graft_artifacts_spec").toString
    val builds = new AtomicInteger(0)
    val s = spark.newSession()
    s.conf.set("spark.graft.artifactDir", root)
    val sp = s; import sp.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val counts = Await.result(Future.sequence((1 to 6).map { _ =>
      Future {
        Artifacts.table(s, "spec_conc", "k|p=1", Seq("id")) {
          builds.incrementAndGet()
          Thread.sleep(50) // widen the race window
          Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        }.count()
      }
    }), 120.seconds)
    assert(builds.get() == 1, s"racing consumers built ${builds.get()} times")
    assert(counts.forall(_ == 2L))
  }

  test("pq codebooks preserve subspace and cluster order") {
    val root = Files.createTempDirectory("graft_artifacts_spec").toString
    val books: IndexedSeq[Array[Seq[Double]]] = IndexedSeq(
      Array(Seq(1.0, 2.0), Seq(3.0, 4.0), Seq(5.0, 6.0)),
      Array(Seq(-1.0, 0.5), Seq(7.25, -8.0), Seq(0.0, 9.0)))
    val s1 = spark.newSession()
    s1.conf.set("spark.graft.artifactDir", root)
    Artifacts.pqCodebooks(s1, "spec_pq", "c1|m=2")(books)
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.artifactDir", root)
    val got = Artifacts.pqCodebooks(s2, "spec_pq", "c1|m=2") {
      fail("must not rebuild"); books
    }
    assert(got.length == 2)
    assert(got(0).toSeq == books(0).toSeq && got(1).toSeq == books(1).toSeq)
  }
}
