package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once co-located layout: persist fact tables bucketed (and
  * bucket-sorted) by their join key, so every later join on that key is
  * EXCHANGE-FREE — each task zips bucket i with bucket i.
  *
  * This is the 100 TB strategy for the reference's hottest join family
  * (claim line/dx/procedure tables joining claim_header on claim id, and
  * everything joining elig tables on person id — SURVEY §4): the monthly
  * build pays one bucketed write, and the dozens of downstream
  * joins/aggregations on the same key skip both the shuffle and (with
  * sortBy) the sort. Bucket metadata lives in the session catalog, which is
  * Spark's unit of bucketing discovery (a bare parquet path has nowhere to
  * carry it).
  */
object Bucketing {

  /** Persist `df` bucketed by `key` into `nBuckets`, as catalog table
    * `name` stored at `path`. Sorted within buckets on the same key. */
  def writeBucketed(df: DataFrame, name: String, path: String,
      key: String, nBuckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $name")
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(name)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
