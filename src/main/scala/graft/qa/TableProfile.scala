package graft.qa

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-profiling — the reference's metadata sprocs
  * (create_metadata.sp_min_max_value.sql, sp_profile_table.sql) emit one
  * (object_name, ordinal_position, column_name, description) row per
  * column, each sproc call running its own full-table SELECT MIN/MAX —
  * a scan PER COLUMN per statistic.
  *
  * Here: ONE fused aggregation pass computes min / max / null-count /
  * distinct-count for every column simultaneously (partial-aggregated
  * map-side, one scan regardless of column count), then a single
  * explode-of-structs unpivots the 1-row aggregate to the per-column
  * profile. Values are stringified so the profile schema is uniform, as
  * the reference's VARCHAR column_description is.
  *
  * Distinct counts default to approx_count_distinct (HLL++ partial
  * aggregates — the 100-TB path: no shuffle-expand, fixed-size sketches).
  * `exactDistinct = true` switches to exact COUNT(DISTINCT): precise and
  * oracle-comparable, but Spark plans k distinct aggregates via Expand
  * (k copies of every row pre-shuffle) — fine at QA-sample scale, not for
  * a full 100-TB sweep.
  */
object TableProfile {

  /** The sp_comma_separated_list analog: one row per requested column with
    * its sorted distinct values as a comma-joined string ("Values: a, b"),
    * for low-cardinality reference/categorical columns; columns over
    * `maxValues` report a count instead of an unbounded string, because a
    * million-value list in a metadata table is an accident, not a profile.
    *
    * Two phases so the cap bounds MEMORY, not just the output string: a
    * cheap HLL pass classifies each column, then the main pass runs
    * collect_set ONLY for columns plausibly under the cap (20% slack on
    * the ~5%-rsd sketch — a column the sketch overshoots past the slack is
    * far above the cap for certain) and exact COUNT(DISTINCT) for the
    * rest. Listable columns still apply the EXACT size check on output, so
    * the sketch can never flip which branch a boundary column reports. */
  def valueList(df: DataFrame, tableName: String, columns: Seq[String],
      maxValues: Int = 1000, rsd: Double = 0.05): DataFrame = {
    require(columns.nonEmpty, "at least one column to list")
    val approxAggs = columns.map(c => approx_count_distinct(col(c), rsd).as(c))
    val approxRow = df.agg(approxAggs.head, approxAggs.tail: _*).collect().head
    // classification slack derived from the sketch's configured relative
    // stddev: 10 sigma of headroom makes a sketch overshooting a truly
    // under-cap column past the slack band implausible at any maxValues,
    // instead of the previous uncalibrated flat 20%
    val slack = 1.0 + 10.0 * rsd
    val listable = columns.zipWithIndex
      .filter { case (_, i) => approxRow.getLong(i) <= maxValues * slack }
      .map(_._1).toSet
    val aggs = columns.map { c =>
      if (listable(c)) sort_array(collect_set(col(c).cast("string"))).as(s"_v_$c")
      else countDistinct(col(c)).as(s"_n_$c")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(columns.zipWithIndex.map { case (c, i) =>
        struct(lit(i + 1).as("ordinal_position"), lit(c).as("column_name"),
          (if (listable(c)) col(s"_v_$c")
           else lit(null).cast("array<string>")).as("vals"),
          (if (listable(c)) lit(null).cast("long")
           else col(s"_n_$c").cast("long")).as("n_over_cap"))
      }: _*)).as("_p"))
      .select(lit(tableName).as("object_name"),
        col("_p.ordinal_position").as("ordinal_position"),
        col("_p.column_name").as("column_name"),
        when(col("_p.vals").isNotNull && size(col("_p.vals")) <= maxValues,
          concat(lit("Values: "), array_join(col("_p.vals"), ", ")))
          .otherwise(concat(lit("Distinct values: "),
            coalesce(col("_p.n_over_cap"), size(col("_p.vals")).cast("long"))
              .cast("string")))
          .as("column_description"))
  }

  def profile(df: DataFrame, tableName: String,
      exactDistinct: Boolean = false): DataFrame = {
    val fields = df.schema.fields.toSeq
    require(fields.nonEmpty, "cannot profile a zero-column frame")
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        min(c).cast("string").as(s"_min_${f.name}"),
        max(c).cast("string").as(s"_max_${f.name}"),
        sum(when(c.isNull, 1).otherwise(0)).as(s"_null_${f.name}"),
        (if (exactDistinct) countDistinct(c) else approx_count_distinct(c))
          .as(s"_nd_${f.name}"))
    } :+ count(lit(1)).as("_n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(col("_n"),
        explode(array(fields.zipWithIndex.map { case (f, i) =>
          struct(lit(i + 1).as("ordinal_position"),
            lit(f.name).as("column_name"),
            col(s"_min_${f.name}").as("min_value"),
            col(s"_max_${f.name}").as("max_value"),
            coalesce(col(s"_null_${f.name}").cast("long"), lit(0L))
              .as("n_null"),
            col(s"_nd_${f.name}").cast("long").as("n_distinct"))
        }: _*)).as("_p"))
      .select(lit(tableName).as("object_name"),
        col("_p.ordinal_position").as("ordinal_position"),
        col("_p.column_name").as("column_name"),
        col("_p.min_value").as("min_value"),
        col("_p.max_value").as("max_value"),
        col("_p.n_null").as("n_null"),
        col("_p.n_distinct").as("n_distinct"),
        col("_n").as("n_rows"))
  }
}
