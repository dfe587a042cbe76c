package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextAnalytics => TA}

/** Per-document token statistics as explode + codegen'd aggregates.
  *
  * The column-function forms (size(filter(tokens, …)) etc.) are array
  * HOFs — interpreted, and after projection collapse each reference
  * re-tokenizes the text. This plan tokenizes ONCE (the explode
  * generator), then computes every statistic as a hash-aggregate with
  * map-side partials — all codegen'd, one shuffle on the doc id.
  * Counts are exact integers, so results are identical to the HOF forms
  * (and the DuckDB oracles). Documents with zero tokens emit no row.
  */
object TextStats {

  /** (id, n_tokens, n_distinct, sum_token_len, n_subwords_est,
    * c_<lang> per [[TA.stopwords]] list).
    *
    * Two-stage aggregation: groupBy (id, token) with a multiplicity
    * count, then groupBy id — this yields the distinct-token count
    * WITHOUT a count(distinct) Expand (which would double the exploded
    * rows), and every other statistic folds through the multiplicity
    * exactly. */
  def perDoc(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"), explode(TA.tokens(col(textCol))).as("tok"))
    val perTok = toks.groupBy("id", "tok").agg(count(lit(1)).as("m"))
    val langCounts = TA.stopwords.map { case (lang, words) =>
      sum(when(col("tok").isin(words.map(lit(_)): _*), col("m")).otherwise(lit(0L)))
        .as(s"c_$lang")
    }
    val aggs = Seq(
      sum(col("m")).as("n_tokens"),
      count(lit(1)).as("n_distinct"),
      sum(length(col("tok")).cast("long") * col("m")).as("sum_token_len"),
      sum(greatest(ceil(length(col("tok")) / lit(4.0)).cast("long"), lit(1L)) * col("m"))
        .as("n_subwords_est")) ++ langCounts
    perTok.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }
}
