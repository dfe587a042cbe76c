package graft.ingest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.store.TableStore

/** Continuous auto-ingest pipe: landing-path → COPY INTO stage table
  * (SURVEY.md §2.1 S3/S4, §2.9 ST1/ST6; reference: README.md:3 SQS→pipe,
  * customer-end-to-end-pipeline-script.sql:51-56, pause/resume
  * customer-...sql:68,179).
  *
  * Implementation: a Structured Streaming `binaryFile` source watches the
  * landing dir — the file-source checkpoint log is the exactly-once
  * ledger the reference gets from Snowpipe's per-file dedup (ST6). Each
  * micro-batch parses its files with the reference CSV semantics
  * ([[CsvIngest]]) and appends to the stage table, which feeds the stage
  * stream.
  *
  * Lifecycle: `start` (auto_ingest=true), `pause` (stop the query —
  * in-flight batch completes, checkpoint preserved), `resume` (restart
  * from checkpoint; system$pipe_force_resume), `runOnce`
  * (Trigger.AvailableNow — drain pending files and stop; what the
  * orchestrated tests use for deterministic cycles).
  *
  * Scale: binaryFile is right for pipe micro-files (Snowpipe's own sweet
  * spot); a 100 TB historical backfill goes through CsvIngest.bulkRead +
  * store.append instead — one distributed scan, no per-file string
  * handling.
  */
class Pipe(
    spark: SparkSession,
    val name: String,
    landingDir: String,
    stageTable: String,
    schema: StructType,
    store: TableStore,
    checkpointDir: String,
    fmt: CsvFormat = CsvFormat(),
    format: String = "csv") {

  require(format == "csv" || format == "jsonl", s"unsupported pipe format $format")

  import spark.implicits._

  @volatile private var query: Option[StreamingQuery] = None

  private def buildStream(trigger: Trigger): StreamingQuery =
    spark.readStream
      .format("binaryFile")
      .option("pathGlobFilter", if (format == "jsonl") "*.jsonl" else "*.csv")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType))))
      .load(landingDir)
      .writeStream
      .queryName(s"pipe_$name")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val contents = batch
          .select(col("path"), col("content").cast("string"))
          .as[(String, String)]
        val parsed =
          if (format == "jsonl") {
            // JSONL: one JSON object per line; schema-projected permissive
            // parse (missing fields null, as with the CSV path)
            val lines = contents.flatMap { case (_, text) =>
              text.split("\n", -1).iterator.map(_.trim).filter(_.nonEmpty)
            }
            spark.read.schema(schema).option("mode", "PERMISSIVE").json(lines)
          } else CsvIngest.parseFileContents(spark, contents, schema, fmt)
        if (!parsed.isEmpty) store.append(stageTable, parsed)
        ()
      }
      .start()

  /** auto_ingest: continuous micro-batches. */
  def start(intervalMs: Long = 1000L): Unit = synchronized {
    require(query.forall(!_.isActive), s"pipe $name already running")
    query = Some(buildStream(Trigger.ProcessingTime(intervalMs)))
  }

  /** Drain currently-landed files exactly once, then stop (AvailableNow). */
  def runOnce(): Unit = synchronized {
    require(query.forall(!_.isActive), s"pipe $name already running")
    val q = buildStream(Trigger.AvailableNow())
    q.awaitTermination()
    query = None
  }

  /** alter pipe ... set pipe_execution_paused = true */
  def pause(): Unit = synchronized {
    query.foreach(_.stop())
    query = None
  }

  /** system$pipe_force_resume */
  def resume(intervalMs: Long = 1000L): Unit = start(intervalMs)

  /** system$pipe_status (F5). */
  def status: String = query match {
    case Some(q) if q.isActive => s"RUNNING ${q.status.message}"
    case _                     => "PAUSED"
  }

  def isRunning: Boolean = query.exists(_.isActive)
}
