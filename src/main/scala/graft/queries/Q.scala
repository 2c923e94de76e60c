package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared helpers for the driver-facing query catalog. */
object Q {
  /** Load a driver testdata table (TESTDATA.md) from an sf dir. */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
