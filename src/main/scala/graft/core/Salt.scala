package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation for skewed grouping keys (SURVEY §4 skew
  * note; the Synapse HASH-distribution analog for hot keys): phase 1
  * groups on (keys, salt) so one hot key spreads across `buckets` reduce
  * tasks; phase 2 combines the partials on the true keys — a shuffle of
  * only keys x buckets rows.
  *
  * Only decomposable aggregates (sum/count/min/max — avg as sum/count)
  * can be salted this way; the result is exactly the unsalted aggregate. */
object Salt {

  /** Salted sum/count/min/max of `valueCol` by `keys`; `saltFrom` is any
    * roughly-uniform column (a unique id) hashed into the salt. */
  def saltedStats(df: DataFrame, keys: Seq[String], valueCol: String,
      saltFrom: Column, buckets: Int = 32): DataFrame = {
    val partial = df
      .withColumn("_salt", pmod(xxhash64(saltFrom), lit(buckets)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_s"), count(col(valueCol)).as("_c"),
        min(col(valueCol)).as("_mn"), max(col(valueCol)).as("_mx"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("_s")).as("sum_val"), sum(col("_c")).as("n"),
        min(col("_mn")).as("min_val"), max(col("_mx")).as("max_val"))
  }
}
