package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** The reference's CSV file format (SURVEY.md §2.1 S1; reference:
  * README.md:38-45 + pipe COPY options customer-end-to-end-pipeline-
  * script.sql:55-56):
  *   delimiter ',', record '\n', skip_header=1, fields optionally quoted
  *   with '"', `\N` → NULL, error_on_column_count_mismatch=false
  *   (short rows null-padded to the schema), blank lines tolerated.
  *
  * Snowflake's skip_header skips N *physical* lines per file — including a
  * blank first line and regardless of whether a header is present (the
  * customer_delta_1.csv fixture has a leading blank line, no header, and
  * only 9 of 10 columns; FIXTURES.md §A). Spark's csv header option
  * instead consumes the first *parsed* row, which silently eats a data
  * row on headerless files — so we implement skip-lines semantics
  * ourselves and feed the remaining lines to Spark's native CSV parser
  * via `csv(Dataset[String])` (keeps univocity parsing + PERMISSIVE
  * null-padding).
  *
  * Scale: landing files are pipe micro-batches (small by construction);
  * parsing is distributed one-file-per-task. For bulk historical loads of
  * huge single CSVs, use `bulkRead` (native distributed scan, header=true).
  */
final case class CsvFormat(
    skipHeaderLines: Int = 1,
    delimiter: String = ",",
    quote: String = "\"",
    nullValue: String = "\\N",
    emptyFieldAsNull: Boolean = true) // Snowflake COPY default EMPTY_FIELD_AS_NULL

object CsvIngest {

  /** Parse whole CSV file contents (one string per file) with skip-line
    * semantics. Used by the Pipe's binaryFile micro-batches. */
  def parseFileContents(spark: SparkSession, contents: Dataset[(String, String)],
      schema: StructType, fmt: CsvFormat = CsvFormat()): DataFrame = {
    import spark.implicits._
    val skip = fmt.skipHeaderLines
    val lines: Dataset[String] = contents.flatMap { case (_, text) =>
      text.split("\n", -1).iterator.drop(skip)
        .map(_.stripSuffix("\r")).filter(_.trim.nonEmpty)
    }
    parseLines(spark, lines, schema, fmt)
  }

  /** Read CSV files under `paths` with reference semantics. */
  def read(spark: SparkSession, paths: Seq[String], schema: StructType,
      fmt: CsvFormat = CsvFormat()): DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext
    val perFile = paths.map { p =>
      sc.textFile(p).mapPartitionsWithIndex { (i, it) =>
        if (i == 0) it.drop(fmt.skipHeaderLines) else it
      }
    }
    val lines = spark.createDataset(
      if (perFile.isEmpty) sc.emptyRDD[String] else sc.union(perFile))
      .filter((l: String) => l.trim.nonEmpty)
    parseLines(spark, lines, schema, fmt)
  }

  private def parseLines(spark: SparkSession, lines: Dataset[String],
      schema: StructType, fmt: CsvFormat): DataFrame = {
    val parsed = spark.read
      .schema(schema)
      .option("delimiter", fmt.delimiter)
      .option("quote", fmt.quote)
      .option("nullValue", fmt.nullValue)
      .option("mode", "PERMISSIVE")
      .option("header", "false")
      .csv(lines)
    emptyToNull(parsed, fmt)
  }

  /** EMPTY_FIELD_AS_NULL (Snowflake COPY default): empty string fields →
    * NULL. Matters downstream: a varchar stage column holding '' would
    * blow up a later CAST('' AS DATE) that NULL sails through. */
  private def emptyToNull(df: DataFrame, fmt: CsvFormat): DataFrame =
    if (!fmt.emptyFieldAsNull) df
    else {
      import org.apache.spark.sql.functions.{col, lit, when}
      df.select(df.schema.fields.map { f =>
        if (f.dataType == org.apache.spark.sql.types.StringType)
          when(col(f.name) === "", lit(null)).otherwise(col(f.name)).as(f.name)
        else col(f.name)
      }.toIndexedSeq: _*)
    }

  /** Bulk path for big well-formed CSVs: native distributed scan (the
    * skip-header quirk only matters for tiny landing files). */
  def bulkRead(spark: SparkSession, path: String, schema: StructType,
      fmt: CsvFormat = CsvFormat()): DataFrame =
    emptyToNull(
      spark.read
        .schema(schema)
        .option("delimiter", fmt.delimiter)
        .option("quote", fmt.quote)
        .option("nullValue", fmt.nullValue)
        .option("mode", "PERMISSIVE")
        .option("header", fmt.skipHeaderLines > 0)
        .csv(path),
      fmt)
}
