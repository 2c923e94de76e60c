package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Shared helpers for the driver-facing query catalog. */
object Q {
  /** Load a driver testdata table (TESTDATA.md) from an sf dir,
    * normalizing the event-time column to TIMESTAMP across the physical
    * encodings the driver's testdata has shipped — see [[normalizeTs]]. */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(s.read.parquet(s"$dir/$name.parquet"))
  }

  /** Normalize a `ts` column to plain TIMESTAMP. Three encodings exist in
    * the wild for `events.parquet`:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects nanos outright
    *    (PARQUET_TYPE_ILLEGAL), so we read nanos as raw longs
    *    (`nanosAsLong`) and truncate to micros with integer div — no
    *    double round-trip, which would lose precision at 1e18 ns.
    *  - timestamp[us] without timezone: Spark 4 infers TIMESTAMP_NTZ,
    *    which `withWatermark` rejects (EVENT_TIME_IS_NOT_ON_TIMESTAMP_
    *    TYPE). Cast to TIMESTAMP; sessions run UTC, so the wall clock is
    *    preserved and matches the DuckDB oracle's naive reading.
    *  - plain TIMESTAMP: pass through. */
  def normalizeTs(df: DataFrame): DataFrame =
    if (!df.schema.fieldNames.contains("ts")) df
    else df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
}
