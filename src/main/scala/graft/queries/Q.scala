package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared helpers for the driver-facing query catalog. */
object Q {
  /** Load a driver testdata table (TESTDATA.md) from an sf dir.
    *
    * The `events` table carries TIMESTAMP(NANOS) — Spark's vectorized
    * parquet reader rejects nanos outright (PARQUET_TYPE_ILLEGAL), so we
    * read nanos as raw longs and truncate to microsecond timestamps
    * (integer div — no double round-trip, which would lose precision at
    * 1e18 ns magnitudes). */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (df.schema.fieldNames.contains("ts") &&
        df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
