package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (scale utility; SURVEY.md §4 — AQE's
  * skew-join handles sort-merge skew automatically, but salting is still
  * needed when a hot key overwhelms a single task in aggregations or
  * when AQE is unavailable, e.g. inside streaming micro-batches).
  *
  * `salted(left, right, keys, saltFactor)`:
  *  - left side: each row gets a random salt in [0, saltFactor)
  *  - right side: replicated saltFactor× (one copy per salt value)
  *  - join on keys + salt → the hot key's rows spread over saltFactor
  *    tasks instead of one.
  * Replication cost is saltFactor× the right side, so pass the SMALLER
  * table as `right` (classic skew recipe: broadcast if it fits, salt if
  * it doesn't).
  */
object SkewJoin {

  def salted(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    val l = left.withColumn("__salt", (rand(42) * saltFactor).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * pre-aggregate on (keys + salt), then merge the partials. Spark's
    * HashAggregate already does map-side partials; this helper spreads a
    * hot REDUCE key across saltFactor reducers — use when one group key
    * holds a large share of all rows. `partials` and `finals` express
    * the decomposition (e.g. count → sum of counts). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFactor: Int,
      partials: Seq[org.apache.spark.sql.Column],
      finals: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val salted = df.withColumn("__salt", (rand(42) * saltFactor).cast("int"))
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }
}
